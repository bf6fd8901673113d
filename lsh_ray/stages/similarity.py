"""Similarity search over an embedding column (list<float>).

- ``knn_brute_force``: exact cosine top-k. The query matrix is broadcast
  ONCE via ``ray.put`` (never re-shipped per batch); each batch computes a
  vectorized float64 matmul and emits only its local top-k per query
  (partial top-k pre-aggregation), so the shuffle carries
  O(n_batches * k * n_queries) rows, not O(n * n_queries).
- ``knn_lsh``: a scale path — SRP-bucketed candidates, exact rerank.
  Recall < 1 by construction; the brute-force path is the oracle.
- ``knn_ivf``: the other scale path — IVF (inverted-file) coarse
  quantization: spherical k-means centroids trained once on a BOUNDED
  driver sample, broadcast via ``ray.put``; each batch assigns its
  vectors to cells and only vectors in a query's ``nprobe`` closest
  cells are scored. At ``nprobe == n_cells`` the probe set is
  exhaustive and the result equals brute force exactly (the oracle
  configuration); partial-probe recall is measured in tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from lsh_ray.functions.num import round_half_away


def _topk_merge(group: pa.Table, k: int) -> pa.Table:
    """Arrow-native top-k of one query's merged partials (sort by
    -cosine then neighbor_id, head k) — the input is only the partial
    top-k rows (O(batches * k)), so the kernel is tiny; staying Arrow
    avoids a per-group pandas round-trip in an otherwise Arrow-native
    stage."""
    sims = group["cosine"].to_numpy(zero_copy_only=False)
    ids = group["neighbor_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -sims))[:k]
    return group.take(pa.array(order, type=pa.int64()))


def knn_brute_force(embeddings_ds, query_vectors: np.ndarray,
                    query_ids: np.ndarray, k: int = 10,
                    exclude_self: bool = True):
    """Exact cosine top-k of each query vector against the corpus.

    Returns (query_id, neighbor_id, cosine) with cosine rounded to 6
    decimals; ties broken by neighbor_id ascending (deterministic,
    oracle-reproducible ordering).
    """
    q = query_vectors.astype(np.float64)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-300)
    q_ref = ray.put((qn, np.asarray(query_ids)))

    def per_batch(t: pa.Table) -> pa.Table:
        qn_, qids = ray.get(q_ref)
        n = t.num_rows
        emb = t["embedding"].combine_chunks()
        vecs = emb.values.to_numpy(zero_copy_only=False).reshape(
            n, -1).astype(np.float64)
        vn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True),
                               1e-300)
        sims = vn @ qn_.T  # (n, n_queries)
        vec_ids = t["vec_id"].to_numpy(zero_copy_only=False)
        rows_q, rows_n, rows_s = [], [], []
        for j, qid in enumerate(qids):
            s = sims[:, j]
            mask = (vec_ids != qid) if exclude_self else np.ones(n, bool)
            idx = np.flatnonzero(mask)
            if len(idx) == 0:
                continue
            # local top-k (order by -sim, then id for determinism)
            order = np.lexsort((vec_ids[idx], -s[idx]))[:k]
            sel = idx[order]
            rows_q.append(np.full(len(sel), qid, dtype=np.int64))
            rows_n.append(vec_ids[sel].astype(np.int64))
            rows_s.append(s[sel])
        if not rows_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(rows_q)),
            "neighbor_id": pa.array(np.concatenate(rows_n)),
            "cosine": pa.array(np.concatenate(rows_s), type=pa.float64()),
        })

    partial = embeddings_ds.map_batches(per_batch, batch_format="pyarrow",
                                        zero_copy_batch=True)
    merged = partial.groupby("query_id").map_groups(
        lambda g: _topk_merge(g, k), batch_format="pyarrow")

    def round_out(t: pa.Table) -> pa.Table:
        return pa.table({
            "query_id": t["query_id"],
            "neighbor_id": t["neighbor_id"],
            "cosine": pa.array(
                round_half_away(t["cosine"].to_numpy(zero_copy_only=False), 6),
                type=pa.float64()),
        })
    return merged.map_batches(round_out, batch_format="pyarrow",
                              zero_copy_batch=True)


def knn_lsh(embeddings_ds, query_vectors: np.ndarray,
            query_ids: np.ndarray, dim: int, k: int = 10,
            seed: int = 42, n_pieces: int = 4, projection: str = "srp",
            round_to: int | None = None):
    """Approximate top-k: SRP signature pieces bucket the corpus; only
    vectors sharing >=1 signature piece with a query are reranked exactly.

    The partitioning assumption: similar vectors (cosine ~> 0.7) collide in
    at least one 16-bit SRP piece with high probability; recall is
    measured against ``knn_brute_force`` in tests.

    ``projection="identity"`` uses bit-sampling hyperplanes (bit i = sign
    of raw component i) so the bucket structure — and therefore the exact
    result set — is reproducible by a SQL oracle from the raw vectors.
    """
    from lsh_ray.stages.dedup import SRPSignatureStage

    stage = SRPSignatureStage(dim, 64, seed, projection=projection)
    q = query_vectors.astype(np.float64)
    q_sig_tbl = stage(pa.table({
        "vec_id": pa.array(np.asarray(query_ids), type=pa.int64()),
        "embedding": pa.array(list(q), type=pa.list_(pa.float32())),
    }))
    q_sigs = q_sig_tbl["simhash"].to_numpy(zero_copy_only=False)
    width = 64 // n_pieces
    mask = np.uint64((1 << width) - 1)
    shifts = (np.arange(n_pieces, dtype=np.uint64) * np.uint64(width))
    # per piece: the SORTED query piece values + aligned query-row indices
    # (duplicates kept — two queries may share a piece value)
    q_piece_vals = [np.sort((q_sigs >> s) & mask) for s in shifts]
    q_piece_cols = [np.argsort((q_sigs >> s) & mask, kind="stable")
                    for s in shifts]
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-300)
    bcast = ray.put((q_piece_vals, q_piece_cols, qn,
                     np.asarray(query_ids)))

    def per_batch(t: pa.Table) -> pa.Table:
        """Vectorized candidate matching: per piece, searchsorted the
        batch's piece values against the (tiny, sorted) query piece
        arrays; expand matches with cumsum/repeat arithmetic — no
        per-row Python loop over the corpus."""
        qpv, qpc, qn_, qids = ray.get(bcast)
        n = t.num_rows
        if n == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        emb = t["embedding"].combine_chunks()
        vecs = emb.values.to_numpy(zero_copy_only=False).reshape(
            n, -1).astype(np.float64)
        sigs = stage(t)["simhash"].to_numpy(zero_copy_only=False)
        vec_ids = t["vec_id"].to_numpy(zero_copy_only=False)
        row_parts, col_parts = [], []
        for p in range(n_pieces):
            cv = (sigs >> shifts[p]) & mask
            lo = np.searchsorted(qpv[p], cv, side="left")
            hi = np.searchsorted(qpv[p], cv, side="right")
            cnt = hi - lo
            if not cnt.any():
                continue
            rows = np.repeat(np.arange(n), cnt)
            ends = np.cumsum(cnt)
            flat = (np.arange(ends[-1]) - np.repeat(ends - cnt, cnt)
                    + np.repeat(lo, cnt))
            row_parts.append(rows)
            col_parts.append(qpc[p][flat])
        if not row_parts:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        rows = np.concatenate(row_parts)
        cols = np.concatenate(col_parts)
        # dedup (corpus row, query) pairs colliding in several pieces
        key = np.unique(cols.astype(np.int64) * n + rows)
        cols, rows = key // n, key % n
        # drop self-matches
        keep = vec_ids[rows] != qids[cols]
        rows, cols = rows[keep], cols[keep]
        if len(rows) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        vn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True),
                               1e-300)
        sims = np.einsum("ij,ij->i", vn[rows], qn_[cols])
        # per-query local top-k: sort (query, -sim, id), rank within segment
        order = np.lexsort((vec_ids[rows], -sims, cols))
        cols_s = cols[order]
        seg_start = np.flatnonzero(
            np.concatenate(([True], cols_s[1:] != cols_s[:-1])))
        rank = np.arange(len(order)) - np.repeat(
            seg_start, np.diff(np.concatenate((seg_start, [len(order)]))))
        sel = order[rank < k]
        return pa.table({
            "query_id": pa.array(qids[cols[sel]].astype(np.int64)),
            "neighbor_id": pa.array(vec_ids[rows[sel]].astype(np.int64)),
            "cosine": pa.array(sims[sel], type=pa.float64()),
        })

    partial = embeddings_ds.map_batches(per_batch, batch_format="pyarrow",
                                        zero_copy_batch=True)
    merged = partial.groupby("query_id").map_groups(
        lambda g: _topk_merge(g, k), batch_format="pyarrow")
    if round_to is None:
        return merged

    def round_out(t: pa.Table) -> pa.Table:
        return pa.table({
            "query_id": t["query_id"],
            "neighbor_id": t["neighbor_id"],
            "cosine": pa.array(
                round_half_away(
                    t["cosine"].to_numpy(zero_copy_only=False), round_to),
                type=pa.float64()),
        })
    return merged.map_batches(round_out, batch_format="pyarrow",
                              zero_copy_batch=True)


def train_ivf_centroids(sample: np.ndarray, n_cells: int, seed: int = 42,
                        n_iters: int = 10) -> np.ndarray:
    """Spherical k-means on a driver-side sample -> unit-norm centroids.

    Deterministic in (sample, seed). The sample is BOUNDED (caller pulls
    at most ``sample_n`` rows) — at 10^12 vectors the training set is
    still a few 10^4 rows, the standard IVF recipe: centroid quality
    needs a representative sample, not the corpus.
    """
    x = sample.astype(np.float64)
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-300)
    rng = np.random.default_rng(seed)
    n_cells = min(n_cells, len(xn))
    cents = xn[rng.choice(len(xn), size=n_cells, replace=False)]
    for _ in range(n_iters):
        assign = np.argmax(xn @ cents.T, axis=1)          # (n,)
        # vectorized mean per cell: scatter-add rows with bincount weights
        sums = np.zeros_like(cents)
        np.add.at(sums, assign, xn)
        counts = np.bincount(assign, minlength=n_cells)[:, None]
        empty = counts[:, 0] == 0
        # re-seed empty cells from the sample so every cell stays live
        sums[empty] = xn[rng.choice(len(xn), size=int(empty.sum()))]
        counts[empty] = 1
        cents = sums / counts
        cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True),
                            1e-300)
    return cents


def knn_ivf(embeddings_ds, query_vectors: np.ndarray,
            query_ids: np.ndarray, k: int = 10, n_cells: int = 16,
            nprobe: int = 4, seed: int = 42, sample_n: int = 65536,
            exclude_self: bool = True, round_to: int | None = None):
    """IVF approximate cosine top-k (query-side analog of a FAISS
    IndexIVFFlat): centroids broadcast once, per-batch cell assignment,
    only vectors landing in a query's ``nprobe`` nearest cells are
    scored, local top-k per batch, one tiny groupby merge.

    Partitioning assumption: near neighbors share a coarse cell with
    the query with high probability; recall rises with ``nprobe`` and
    equals 1 exactly at ``nprobe == n_cells`` (exhaustive probe — the
    SQL-oracle configuration, which still exercises train/assign/probe/
    rerank end-to-end). The scan cost per batch is one (n, n_cells)
    matmul + the matmul over the probed subset, vs brute force's full
    (n, n_queries) matmul — the win grows with corpus size and query
    count at fixed nprobe/n_cells.
    """
    sample_tbl = embeddings_ds.limit(sample_n).take_batch(
        sample_n, batch_format="pyarrow")
    emb = sample_tbl["embedding"].combine_chunks()
    sample = emb.values.to_numpy(zero_copy_only=False).reshape(
        sample_tbl.num_rows, -1)
    cents = train_ivf_centroids(sample, n_cells=n_cells, seed=seed)
    n_cells = len(cents)
    nprobe = min(nprobe, n_cells)

    q = query_vectors.astype(np.float64)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-300)
    # (n_queries, nprobe) probed cells -> dense bool lookup (n_cells,
    # n_queries) so a batch masks by probe[assign] with pure indexing
    probed = np.argsort(-(qn @ cents.T), axis=1, kind="stable")[:, :nprobe]
    probe_lut = np.zeros((n_cells, len(qn)), dtype=bool)
    probe_lut[probed, np.arange(len(qn))[:, None]] = True
    bcast = ray.put((cents, probe_lut, qn, np.asarray(query_ids)))

    def per_batch(t: pa.Table) -> pa.Table:
        cents_, lut, qn_, qids = ray.get(bcast)
        n = t.num_rows
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "neighbor_id": pa.array([], pa.int64()),
                          "cosine": pa.array([], pa.float64())})
        if n == 0:
            return empty
        emb_ = t["embedding"].combine_chunks()
        vecs = emb_.values.to_numpy(zero_copy_only=False).reshape(
            n, -1).astype(np.float64)
        vn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True),
                               1e-300)
        assign = np.argmax(vn @ cents_.T, axis=1)          # (n,)
        hit = lut[assign]                                   # (n, n_queries)
        vec_ids = t["vec_id"].to_numpy(zero_copy_only=False)
        rows_q, rows_n, rows_s = [], [], []
        for j, qid in enumerate(qids):
            idx = np.flatnonzero(hit[:, j])
            if exclude_self:
                idx = idx[vec_ids[idx] != qid]
            if len(idx) == 0:
                continue
            s = vn[idx] @ qn_[j]
            order = np.lexsort((vec_ids[idx], -s))[:k]
            sel = idx[order]
            rows_q.append(np.full(len(sel), qid, dtype=np.int64))
            rows_n.append(vec_ids[sel].astype(np.int64))
            rows_s.append(s[order])
        if not rows_q:
            return empty
        return pa.table({
            "query_id": pa.array(np.concatenate(rows_q)),
            "neighbor_id": pa.array(np.concatenate(rows_n)),
            "cosine": pa.array(np.concatenate(rows_s), type=pa.float64()),
        })

    partial = embeddings_ds.map_batches(per_batch, batch_format="pyarrow",
                                        zero_copy_batch=True)
    merged = partial.groupby("query_id").map_groups(
        lambda g: _topk_merge(g, k), batch_format="pyarrow")
    if round_to is None:
        return merged

    def round_out(t: pa.Table) -> pa.Table:
        return pa.table({
            "query_id": t["query_id"],
            "neighbor_id": t["neighbor_id"],
            "cosine": pa.array(
                round_half_away(
                    t["cosine"].to_numpy(zero_copy_only=False), round_to),
                type=pa.float64()),
        })
    return merged.map_batches(round_out, batch_format="pyarrow",
                              zero_copy_batch=True)
