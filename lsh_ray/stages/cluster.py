"""Clustering stage: verified duplicate edges -> connected components.

Cluster id = MIN doc_id of the component: deterministic, content-derived,
stable across resumes and input orderings (fixes the reference's
positional-identity coupling, ``lsh.py:263``, ``lsh.py:462-463``).

Two implementations:

- ``connected_components``: streams the (sparse) verified edge list to the
  driver through ``iter_batches`` and runs union-find. Verified dup edges
  are O(dup pairs) — orders of magnitude smaller than the corpus — and 16
  bytes each; this is the right default up to ~10^8 edges.
- ``connected_components_distributed``: iterated min-label propagation
  expressed entirely in Ray Data (join + groupby-min per round, converging
  in O(diameter) rounds) for edge sets too large for any single node.
  Duplicate clusters are near-cliques, so diameter (and round count) is
  tiny in practice.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Min

from lsh_ray.functions.unionfind import UnionFind


def connected_components(edges_ds) -> pd.DataFrame:
    """Edge Dataset (doc_a, doc_b) -> DataFrame (doc_id, cluster_id).

    Streams edges; only union-find state (O(nodes-in-any-edge)) is held.
    """
    uf = UnionFind()
    for batch in edges_ds.select_columns(["doc_a", "doc_b"]).iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        a = batch["doc_a"].to_numpy(zero_copy_only=False)
        b = batch["doc_b"].to_numpy(zero_copy_only=False)
        for x, y in zip(a.tolist(), b.tolist()):
            uf.union(x, y)
    comp = uf.components()
    if not comp:
        return pd.DataFrame({"doc_id": pd.array([], dtype="uint64"),
                             "cluster_id": pd.array([], dtype="uint64")})
    nodes = np.fromiter(comp.keys(), dtype=np.uint64, count=len(comp))
    labels = np.fromiter((comp[k] for k in comp), dtype=np.uint64,
                         count=len(comp))
    order = np.argsort(nodes)
    return pd.DataFrame({"doc_id": nodes[order], "cluster_id": labels[order]})


def connected_components_distributed(edges_ds, num_partitions: int = 32,
                                     max_rounds: int = 16):
    """Edge Dataset -> Dataset (doc_id, cluster_id) via min-label propagation.

    Each round: every node adopts min(own label, labels of neighbors).
    Implemented with hash joins + groupby-min only — no driver state.
    """
    def both_dirs(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array(np.concatenate([a, b]), type=pa.uint64()),
            "dst": pa.array(np.concatenate([b, a]), type=pa.uint64()),
        })

    edges = edges_ds.select_columns(["doc_a", "doc_b"]).map_batches(
        both_dirs, batch_format="pyarrow", zero_copy_batch=True).materialize()

    labels = edges.groupby("src").aggregate(Min("dst", alias_name="nbr_min"))
    labels = labels.map_batches(
        lambda t: pa.table({
            "doc_id": t["src"],
            "cluster_id": pa.array(
                np.minimum(t["src"].to_numpy(zero_copy_only=False),
                           t["nbr_min"].to_numpy(zero_copy_only=False)),
                type=pa.uint64())}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    for _ in range(max_rounds):
        # propagate: each edge carries src's label to dst
        msgs = edges.join(labels, join_type="inner",
                          num_partitions=num_partitions,
                          on=("src",), right_on=("doc_id",))
        msgs = msgs.map_batches(
            lambda t: pa.table({"doc_id": t["dst"],
                                "cluster_id": t["cluster_id"]}),
            batch_format="pyarrow", zero_copy_batch=True)
        new_labels = (labels.union(msgs)
                      .groupby("doc_id")
                      .aggregate(Min("cluster_id", alias_name="cluster_id"))
                      ).materialize()
        # converged when total label sum stops decreasing (labels only shrink)
        old_sum = labels.map_batches(
            lambda t: pa.table({"s": pa.array(
                [t["cluster_id"].to_numpy(zero_copy_only=False)
                 .astype(np.float64).sum()])}),
            batch_format="pyarrow").sum("s")
        new_sum = new_labels.map_batches(
            lambda t: pa.table({"s": pa.array(
                [t["cluster_id"].to_numpy(zero_copy_only=False)
                 .astype(np.float64).sum()])}),
            batch_format="pyarrow").sum("s")
        labels = new_labels
        if old_sum == new_sum:
            break
    return labels


def clusters_table(edges_ds, distributed: bool = False):
    """Edges -> cluster assignment as a Ray Dataset (doc_id, cluster_id)."""
    if distributed:
        return connected_components_distributed(edges_ds)
    pdf = connected_components(edges_ds)
    return ray.data.from_pandas(pdf) if len(pdf) else ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], pa.uint64()),
                  "cluster_id": pa.array([], pa.uint64())}))
