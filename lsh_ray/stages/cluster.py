"""Clustering stage: verified duplicate edges -> connected components.

Cluster id = MIN doc_id of the component: deterministic, content-derived,
stable across resumes and input orderings (fixes the reference's
positional-identity coupling, ``lsh.py:263``, ``lsh.py:462-463``).

Two implementations, auto-selected by edge count (``clusters_table``):

- ``connected_components``: streams the (sparse) verified edge list to the
  driver through ``iter_batches`` and labels components with a fully
  vectorized numpy min-label propagation + pointer jumping (no per-edge
  Python). Verified dup edges are O(dup pairs) — orders of magnitude
  smaller than the corpus — and 16 bytes each; right up to ~10^7-10^8
  edges on one node.
- ``connected_components_distributed``: alternating large-star/small-star
  rounds expressed entirely in Ray Data (one bucketed groupby per round,
  O(log^2 n) rounds) for edge sets too large for any single node. The
  DEFAULT path switches to this automatically when the streamed edge
  count exceeds ``DRIVER_EDGE_CAP``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

# above this many edges the driver-side path refuses and clusters_table
# falls back to the distributed large/small-star implementation
DRIVER_EDGE_CAP = 20_000_000


def _label_components(a: np.ndarray, b: np.ndarray
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized connected components over edge arrays.

    Min-label propagation across edges (``np.minimum.at``) alternated with
    pointer jumping (``label = label[label]``) until fixpoint — O(E) numpy
    work per round, O(log n) rounds; dup clusters are near-cliques so 2-3
    rounds typical. Labels are indices into the ascending-sorted node
    array, so the converged label IS the component's minimum member id
    (the stable content-derived cluster id contract).
    """
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia = inv[:len(a)].astype(np.int64)
    ib = inv[len(a):].astype(np.int64)
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        old = label.copy()
        mn = np.minimum(label[ia], label[ib])
        np.minimum.at(label, ia, mn)
        np.minimum.at(label, ib, mn)
        while True:
            nxt = label[label]
            if np.array_equal(nxt, label):
                break
            label = nxt
        if np.array_equal(label, old):
            break
    return nodes, nodes[label]


def connected_components(edges_ds, max_edges: int | None = None
                         ) -> pd.DataFrame | None:
    """Edge Dataset (doc_a, doc_b) -> DataFrame (doc_id, cluster_id).

    Streams edges into flat arrays; all labeling is vectorized numpy.
    Returns ``None`` if ``max_edges`` is set and exceeded (caller falls
    back to the distributed path).
    """
    chunks_a: list[np.ndarray] = []
    chunks_b: list[np.ndarray] = []
    total = 0
    for batch in edges_ds.select_columns(["doc_a", "doc_b"]).iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        a = batch["doc_a"].to_numpy(zero_copy_only=False).astype(
            np.uint64, copy=True)
        b = batch["doc_b"].to_numpy(zero_copy_only=False).astype(
            np.uint64, copy=True)
        total += len(a)
        if max_edges is not None and total > max_edges:
            return None
        chunks_a.append(a)
        chunks_b.append(b)
    if total == 0:
        return pd.DataFrame({"doc_id": pd.array([], dtype="uint64"),
                             "cluster_id": pd.array([], dtype="uint64")})
    nodes, labels = _label_components(np.concatenate(chunks_a),
                                      np.concatenate(chunks_b))
    return pd.DataFrame({"doc_id": nodes, "cluster_id": labels})


def _star_round(edges_ds, large: bool, num_buckets: int):
    """One large-star or small-star round (Kiveris et al., "Connected
    Components in MapReduce and Beyond"). Edges are undirected (a, b);
    each round is ONE bucketed groupby; per-bucket work is vectorized.

    large-star(u): for m = min(N(u) + {u}), emit (v, m) for v in N(u), v > u
    small-star(u): emit (v, m) for v in N(u), v <= u, plus (u, m)
    """
    nb = np.uint64(num_buckets)

    def emit_directed(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["doc_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        return pa.table({
            "src": pa.array(src, type=pa.uint64()),
            "dst": pa.array(dst, type=pa.uint64()),
            "bucket": pa.array((src % nb).astype(np.int32)),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        """Fully vectorized star round over every source-node group in the
        bucket: one lexsort, segment arithmetic for per-group minima, mask
        selection for the star direction, lexsort-mask pair dedup — no
        per-node Python loop (the cumsum/repeat pattern of
        candidates._expand_small_groups; the old per-node loop dominated
        wall time exactly when the distributed path matters)."""
        src = g["src"].to_numpy(zero_copy_only=False)
        dst = g["dst"].to_numpy(zero_copy_only=False)
        if len(src) == 0:
            return pa.table({"doc_a": pa.array([], pa.uint64()),
                             "doc_b": pa.array([], pa.uint64())})
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        new = np.concatenate(([True], src[1:] != src[:-1]))
        gid = np.cumsum(new) - 1
        firsts = np.flatnonzero(new)
        u = src[firsts]                       # group key
        m = np.minimum(u, dst[firsts])        # dst sorted => first = min nbr
        m_row = m[gid]
        sel = dst > src if large else dst <= src
        v = dst[sel]
        mr = m_row[sel]
        if not large:  # small-star also emits (u, m) per group
            v = np.concatenate([v, u])
            mr = np.concatenate([mr, m])
        keep = v != mr
        a = np.minimum(v, mr)[keep]
        b = np.maximum(v, mr)[keep]
        if len(a) == 0:
            return pa.table({"doc_a": pa.array([], pa.uint64()),
                             "doc_b": pa.array([], pa.uint64())})
        order2 = np.lexsort((b, a))
        a, b = a[order2], b[order2]
        uniq = np.concatenate(
            ([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
        return pa.table({
            "doc_a": pa.array(a[uniq], type=pa.uint64()),
            "doc_b": pa.array(b[uniq], type=pa.uint64()),
        })

    from lsh_ray.stages.exchange import colocate_map, exchange_mode
    directed = edges_ds.map_batches(emit_directed, batch_format="pyarrow",
                                    zero_copy_batch=True)
    if exchange_mode() == "sort":
        return directed.groupby("bucket").map_groups(
            per_bucket, batch_format="pyarrow")
    return colocate_map(directed, ["src"], num_buckets, per_bucket)


def _edge_fingerprint(edges_ds) -> tuple[int, float]:
    """Cheap order-insensitive fingerprint of an edge set."""
    from lsh_ray.functions.hashing import hash_pair
    total = 0
    acc = 0.0
    for b in edges_ds.iter_batches(batch_size=65536,
                                   batch_format="pyarrow"):
        a = b["doc_a"].to_numpy(zero_copy_only=False)
        d = b["doc_b"].to_numpy(zero_copy_only=False)
        total += len(a)
        acc += float(hash_pair(a, d).astype(np.float64).sum())
    return total, acc


def connected_components_distributed(edges_ds, num_partitions: int = 32,
                                     max_rounds: int = 64):
    """Edge Dataset -> Dataset (doc_id, cluster_id) with NO driver state:
    alternating large-star / small-star rounds (each ONE bucketed groupby
    shuffle) until the edge set stabilizes as stars, then one final
    min-neighbor pass labels every node. Converges in O(log^2 n) rounds
    even on pathological chains (hot-band chain pairs)."""
    edges = edges_ds.select_columns(["doc_a", "doc_b"]).materialize()
    prev_cnt = None
    prev_fp = None
    for r in range(max_rounds):
        large = (r % 2 == 0)
        edges = _star_round(edges, large, num_partitions).materialize()
        if large:
            continue
        # convergence check after each small-star round. The edge COUNT
        # comes free from the materialized metadata; the full
        # fingerprint read (one extra pass over the edge set per round)
        # only runs once counts stop changing — counts still moving
        # proves non-convergence without touching the data
        cnt = edges.count()
        if cnt == prev_cnt:
            fp = _edge_fingerprint(edges)
            if fp == prev_fp:
                break
            prev_fp = fp
        else:
            prev_fp = None
        prev_cnt = cnt

    # stars: label(u) = min(u, neighbors). Bucketed vectorized min — NOT
    # ray.data's Min aggregate, which converts uint64 values > 2^63
    # through Python ints and falls back to pickled-object columns
    # (observed on 2.49; real doc_ids are full-range siphash64, so the
    # aggregate path corrupts the labels exactly at production scale)
    nb = np.uint64(1024)

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["doc_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        return pa.table({
            "src": pa.array(src, type=pa.uint64()),
            "dst": pa.array(dst, type=pa.uint64()),
            "bucket": pa.array((src % nb).astype(np.int32)),
        })

    def label_bucket(g: pa.Table) -> pa.Table:
        src = g["src"].to_numpy(zero_copy_only=False)
        dst = g["dst"].to_numpy(zero_copy_only=False)
        if len(src) == 0:
            return pa.table({"doc_id": pa.array([], pa.uint64()),
                             "cluster_id": pa.array([], pa.uint64())})
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        new = np.concatenate(([True], src[1:] != src[:-1]))
        firsts = np.flatnonzero(new)
        u = src[firsts]
        m = np.minimum(u, dst[firsts])  # dst sorted within group
        return pa.table({"doc_id": pa.array(u, type=pa.uint64()),
                         "cluster_id": pa.array(m, type=pa.uint64())})

    from lsh_ray.stages.exchange import colocate_map, exchange_mode
    directed = edges.map_batches(both_dirs, batch_format="pyarrow",
                                 zero_copy_batch=True)
    if exchange_mode() == "sort":
        return directed.groupby("bucket").map_groups(
            label_bucket, batch_format="pyarrow")
    return colocate_map(directed, ["src"], num_partitions, label_bucket)


from lsh_ray.stages.exchange import _lazy_remote


@_lazy_remote
def _edge_extract_task(tab: pa.Table, dup_only: bool):
    """One verified/substring block -> (doc_a, doc_b) uint64 edge arrays
    (filtered to is_dup rows when asked). Copies so the result doesn't
    pin the whole source block."""
    if dup_only:
        tab = tab.filter(tab["is_dup"])
    return (tab["doc_a"].to_numpy(zero_copy_only=False).astype(
                np.uint64, copy=True),
            tab["doc_b"].to_numpy(zero_copy_only=False).astype(
                np.uint64, copy=True))


def clusters_from_stage_outputs(verified_ds, substring_ds,
                                distributed: bool | None = None):
    """verified + substring stage outputs -> cluster table, skipping the
    Ray Data union/filter job when the driver path applies.

    ``clusters_table`` pulls edges by EXECUTING a dataset pipeline (two
    filter maps + a union + iter_batches) — ~0.7-1.3 s of per-job
    executor floor at bench scale, paid even though both inputs are
    already materialized at this boundary (run_dedup forks them). Here
    one raw task per pinned block extracts its edge arrays directly.
    The pre-filter row total (free, from block metadata) bounds the
    edge count: above ``DRIVER_EDGE_CAP`` — or with ``distributed``
    forced — the dataset-based path takes over unchanged.
    """
    import ray

    if distributed:
        return clusters_table(_edge_union(verified_ds, substring_ds),
                              distributed=True)
    try:
        work = []  # (ref, dup_only)
        total = 0
        for ds, dup_only in ((verified_ds, True), (substring_ds, False)):
            for bundle in ds.iter_internal_ref_bundles():
                for ref, meta in zip(bundle.block_refs, bundle.metadata):
                    if meta.num_rows is None:
                        raise ValueError("unknown block size")
                    total += meta.num_rows
                    # check the cap as soon as it is crossed: stop
                    # consuming ref bundles (and pinning refs) the
                    # moment the driver path is ruled out
                    if distributed is None and total > DRIVER_EDGE_CAP:
                        raise ValueError("edge bound above driver cap")
                    if meta.num_rows:
                        work.append((ref, dup_only))
    except Exception:
        return clusters_table(_edge_union(verified_ds, substring_ds),
                              distributed=distributed)
    if not work:
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.uint64()),
                      "cluster_id": pa.array([], pa.uint64())}))
    parts = ray.get([_edge_extract_task.remote(r, d) for r, d in work])
    a = np.concatenate([p[0] for p in parts])
    b = np.concatenate([p[1] for p in parts])
    if len(a) == 0:
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.uint64()),
                      "cluster_id": pa.array([], pa.uint64())}))
    nodes, labels = _label_components(a, b)
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(nodes, type=pa.uint64()),
                  "cluster_id": pa.array(labels, type=pa.uint64())}))


def _edge_union(verified_ds, substring_ds):
    """The dataset-expressed edge union (fallback / distributed path)."""
    dup_edges = verified_ds.map_batches(
        lambda t: t.filter(t["is_dup"]).select(["doc_a", "doc_b"]),
        batch_format="pyarrow", zero_copy_batch=True)
    sub_edges = substring_ds.map_batches(
        lambda t: t.select(["doc_a", "doc_b"]),
        batch_format="pyarrow", zero_copy_batch=True)
    return dup_edges.union(sub_edges)


def clusters_table(edges_ds, distributed: bool | None = None):
    """Edges -> cluster assignment as a Ray Dataset (doc_id, cluster_id).

    ``distributed=None`` (the default) auto-selects: the driver-side
    vectorized path up to ``DRIVER_EDGE_CAP`` streamed edges, the
    shuffle-based large/small-star path beyond it — no flag needed for
    the scale-safe behavior.
    """
    if distributed:
        return connected_components_distributed(edges_ds)
    cap = DRIVER_EDGE_CAP if distributed is None else None
    pdf = connected_components(edges_ds, max_edges=cap)
    if pdf is None:  # edge set too large for one node: re-run distributed
        return connected_components_distributed(edges_ds)
    if not len(pdf):
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.uint64()),
                      "cluster_id": pa.array([], pa.uint64())}))
    return ray.data.from_arrow(
        pa.Table.from_pandas(pdf, preserve_index=False)
        .replace_schema_metadata(None))


def relabel_clusters_by_min_url(clusters_ds, signatures_ds,
                                num_buckets: int = 1024):
    """(doc_id, cluster_id) + signatures(doc_id, url) -> (url,
    cluster_url = MIN url of the component): the content-derived cluster
    id re-expressed in the stable key space. One bucketed pass — every
    row of a cluster shares bucket = cluster_id % NB, so the per-bucket
    kernel computes min-url per cluster with an Arrow C++ sort (NOT
    ray.data's Min aggregate, which returns uint64 keys > 2^63 as
    pickled objects on 2.49)."""
    import pyarrow as pa

    from lsh_ray.stages.join import bucket_join

    urls = signatures_ds.select_columns(["doc_id", "url"])
    withurl = bucket_join(clusters_ds, urls, "doc_id", "doc_id", ["url"])
    nbu = np.uint64(num_buckets)

    def add_bucket(t: pa.Table) -> pa.Table:
        cid = t["cluster_id"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array((cid % nbu).astype(np.int32)))

    def relabel(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_
        order = pc_.sort_indices(
            t, sort_keys=[("cluster_id", "ascending"),
                          ("url", "ascending")])
        cid_s = t["cluster_id"].take(order).to_numpy(zero_copy_only=False)
        url_s = t["url"].take(order).combine_chunks()
        new = np.concatenate(([True], cid_s[1:] != cid_s[:-1]))
        gid = np.cumsum(new) - 1
        first_idx = np.flatnonzero(new)
        return pa.table({
            "url": url_s,
            "cluster_url": url_s.take(
                pa.array(first_idx[gid], type=pa.int64())),
        })

    return (withurl.map_batches(add_bucket, batch_format="pyarrow",
                                zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(relabel, batch_format="pyarrow"))


def cluster_representatives(res, order_col: str = "n_shingles"):
    """DedupResult -> (cluster_url, n_shingles, url): per near-dup
    cluster the member to KEEP under the content-richness policy — the
    most shingles, ties broken by MIN url. The classic alternative to
    keep-min-key: near-dup groups in crawl data mix truncated and full
    captures, and the kept representative should be the richest one
    (the NeMo-Curator-style quality-aware keep).

    Plan: one bucketed join ships (url, n_shingles) onto the cluster
    rows (clusters ≪ corpus), then grouped_top_k's combiner-pruned
    argmax — exchange volume is bounded by clusters x blocks, never by
    corpus rows."""
    from lsh_ray.stages.join import bucket_join
    from lsh_ray.stages.sampling import grouped_top_k

    clusters = relabel_clusters_by_min_url(res.clusters, res.signatures)
    sizes = res.signatures.select_columns(["url", order_col])
    j = bucket_join(clusters, sizes, "url", "url", [order_col])
    return grouped_top_k(j, "cluster_url", order_col, "url", k=1)


def kept_after_dedup(res):
    """DedupResult -> (url,) of every signed doc EXCEPT non-representative
    cluster members (MIN-url representative wins) — the 'apply' step
    producing the cleaned corpus, as a bucketed anti-join (the dropped
    set is the small right side; survivors are the null-marker rows)."""
    import pyarrow as pa

    from lsh_ray.stages.join import bucket_join

    clusters = relabel_clusters_by_min_url(res.clusters, res.signatures)

    def dropped_only(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = t.filter(pc.not_equal(t["url"], t["cluster_url"]))
        return pa.table({
            "url": keep["url"],
            "dropped": pa.array(np.ones(keep.num_rows, dtype=np.int8)),
        })

    dropped = clusters.map_batches(dropped_only, batch_format="pyarrow",
                                   zero_copy_batch=True)
    urls = res.signatures.select_columns(["url"])
    j = bucket_join(urls, dropped, "url", "url", ["dropped"],
                    suffix="_r", how="left")

    def anti(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.is_null(t["dropped_r"])).select(["url"])

    return j.map_batches(anti, batch_format="pyarrow",
                         zero_copy_batch=True)
