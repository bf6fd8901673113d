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


def test_clusters_table_auto_falls_back_to_distributed(rd, monkeypatch):
    """The default clusters_table path must AUTO-switch to the
    distributed large/small-star implementation when the streamed edge
    count exceeds the driver cap — exercised by shrinking the cap so a
    large random graph (vectorized star rounds) takes the fallback."""
    import lsh_ray.stages.cluster as cl
    rng = np.random.default_rng(3)
    edges = [(int(a), int(b)) for a, b in
             rng.integers(0, 2000, size=(5000, 2)) if a != b]
    drv = cl.connected_components(_edges_ds(rd, edges))
    monkeypatch.setattr(cl, "DRIVER_EDGE_CAP", 100)
    out = cl.clusters_table(_edges_ds(rd, edges)).to_pandas()
    a = drv.sort_values("doc_id").reset_index(drop=True)
    b = out.sort_values("doc_id").reset_index(drop=True)
    assert a.doc_id.astype("uint64").tolist() == \
        b.doc_id.astype("uint64").tolist()
    assert a.cluster_id.astype("uint64").tolist() == \
        b.cluster_id.astype("uint64").tolist()


def test_hot_cluster_stays_connected_through_salt_and_chain(rd):
    """A real dup cluster LARGER than group_size_cap must survive as ONE
    connected component: hot band groups emit salted pairs + chains, and
    because the docs are genuine near-dups those edges pass verification
    (the round-1 audit caveat: prove connectivity above the cap)."""
    import numpy as np
    import pyarrow as pa
    import dataclasses

    from lsh_ray.config import PipelineConfig
    from lsh_ray.pipelines.dedup_pipeline import run_dedup
    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(500)]
    base = " ".join(rng.choice(vocab, size=200).tolist())
    texts, urls = [], []
    # 80-doc exact-dup cluster: with cap=16, salt=4 the band groups are
    # size 80 > cap*salt=64 -> the extreme-chain path; sub-groups also
    # exercise the salted path
    for i in range(80):
        texts.append(base)
        urls.append(f"hot://{i}")
    for i in range(120):  # background noise docs
        texts.append(" ".join(rng.choice(vocab, size=150).tolist()))
        urls.append(f"noise://{i}")
    docs = rd.from_arrow(pa.table({
        "url": urls, "text": texts, "lang": ["en"] * len(urls)}))
    cfg = dataclasses.replace(PipelineConfig(), group_size_cap=16,
                              salt_buckets=4)
    res = run_dedup(docs, cfg)
    cl = res.clusters.to_pandas()
    from lsh_ray.functions.hashing import hash_strings
    hot_ids = set(hash_strings(np.array(
        [f"hot://{i}" for i in range(80)], dtype=object)).tolist())
    hot = cl[cl.doc_id.isin(hot_ids)]
    assert len(hot) == 80, "every hot doc must be clustered"
    assert hot.cluster_id.nunique() == 1, "hot cluster fragmented"


def test_cluster_representatives_keep_longest_policy(rd):
    """Quality-aware keep: per cluster the member with the most
    shingles wins (ties -> min url). Cluster A's richest member is NOT
    its min-url member, so the policy is observably different from
    keep-min-url; cluster B ties on shingle count and falls back to
    min url."""
    import numpy as np
    import pyarrow as pa

    from lsh_ray.config import PipelineConfig
    from lsh_ray.pipelines.dedup_pipeline import run_dedup
    from lsh_ray.stages.cluster import cluster_representatives
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(800)]
    base = rng.choice(vocab, size=200, replace=False).tolist()
    extra = rng.choice([f"x{i}" for i in range(100)], size=20,
                       replace=False).tolist()
    tie = " ".join(rng.choice(vocab, size=150, replace=False).tolist())
    urls = ["a://short", "z://long", "m://t1", "n://t2"]
    texts = [" ".join(base), " ".join(base + extra), tie, tie]
    for i in range(40):  # noise
        urls.append(f"noise://{i}")
        texts.append(" ".join(rng.choice(vocab, size=120).tolist()))
    docs = rd.from_arrow(pa.table({
        "url": urls, "text": texts, "lang": ["en"] * len(urls)}))
    res = run_dedup(docs, PipelineConfig())
    reps = cluster_representatives(res).to_pandas()
    by_cluster = dict(zip(reps.cluster_url, reps.url))
    # cluster A: min url is a://short, but z://long has more shingles
    assert by_cluster["a://short"] == "z://long"
    # cluster B: equal shingle counts -> min url wins the tie
    assert by_cluster["m://t1"] == "m://t1"
    # exactly one representative per cluster
    assert reps.cluster_url.is_unique
