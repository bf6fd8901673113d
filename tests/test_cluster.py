"""Clustering: driver union-find vs distributed min-label propagation."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data
    return ray.data


def _edges_ds(rd, edges):
    return rd.from_arrow(pa.table({
        "doc_a": pa.array([a for a, _ in edges], type=pa.uint64()),
        "doc_b": pa.array([b for _, b in edges], type=pa.uint64()),
    }))


EDGES = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23), (3, 4)]


def test_driver_connected_components(rd):
    from lsh_ray.stages.cluster import connected_components
    out = connected_components(_edges_ds(rd, EDGES))
    comp = dict(zip(out.doc_id, out.cluster_id))
    assert comp[1] == comp[2] == comp[3] == comp[4] == 1
    assert comp[10] == comp[11] == 10
    assert comp[20] == comp[21] == comp[22] == comp[23] == 20


def test_distributed_matches_driver(rd):
    from lsh_ray.stages.cluster import (connected_components,
                                        connected_components_distributed)
    drv = connected_components(_edges_ds(rd, EDGES))
    dist = connected_components_distributed(
        _edges_ds(rd, EDGES), num_partitions=4).to_pandas()
    a = drv.sort_values("doc_id").reset_index(drop=True)
    b = dist.sort_values("doc_id").reset_index(drop=True)
    assert a.doc_id.astype("uint64").tolist() == \
        b.doc_id.astype("uint64").tolist()
    assert a.cluster_id.astype("uint64").tolist() == \
        b.cluster_id.astype("uint64").tolist()


def test_distributed_long_chain_converges(rd):
    from lsh_ray.stages.cluster import connected_components_distributed
    chain = [(i, i + 1) for i in range(30)]
    out = connected_components_distributed(
        _edges_ds(rd, chain), num_partitions=4).to_pandas()
    assert set(out.cluster_id.astype("uint64")) == {0}
    assert len(out) == 31


def test_distributed_random_graph_matches_driver(rd):
    from lsh_ray.stages.cluster import (connected_components,
                                        connected_components_distributed)
    rng = np.random.default_rng(9)
    edges = [(int(a), int(b)) for a, b in
             rng.integers(0, 200, size=(300, 2)) if a != b]
    drv = connected_components(_edges_ds(rd, edges))
    dist = connected_components_distributed(
        _edges_ds(rd, edges), num_partitions=8).to_pandas()
    a = drv.sort_values("doc_id").reset_index(drop=True)
    b = dist.sort_values("doc_id").reset_index(drop=True)
    assert a.doc_id.astype("uint64").tolist() == \
        b.doc_id.astype("uint64").tolist()
    assert a.cluster_id.astype("uint64").tolist() == \
        b.cluster_id.astype("uint64").tolist()
