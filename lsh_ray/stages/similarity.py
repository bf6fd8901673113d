"""Similarity search over an embedding column (list<float>).

- ``knn_brute_force``: exact cosine top-k. The query matrix is broadcast
  ONCE via ``ray.put`` (never re-shipped per batch); each batch computes a
  vectorized float64 matmul and emits only its local top-k per query
  (partial top-k pre-aggregation), so the shuffle carries
  O(n_batches * k * n_queries) rows, not O(n * n_queries).
- ``knn_lsh``: the scale path — SRP-bucketed candidates, exact rerank.
  Recall < 1 by construction; the brute-force path is the oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from lsh_ray.functions.num import round_half_away


def _topk_merge(group: pd.DataFrame, k: int) -> pd.DataFrame:
    g = group.sort_values(["cosine", "neighbor_id"],
                          ascending=[False, True]).head(k)
    return g.reset_index(drop=True)


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
        lambda g: _topk_merge(g, k), batch_format="pandas")

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
            seed: int = 42, n_pieces: int = 4):
    """Approximate top-k: SRP signature pieces bucket the corpus; only
    vectors sharing >=1 signature piece with a query are reranked exactly.

    The partitioning assumption: similar vectors (cosine ~> 0.7) collide in
    at least one 16-bit SRP piece with high probability; recall is
    measured against ``knn_brute_force`` in tests.
    """
    from lsh_ray.stages.dedup import SRPSignatureStage

    stage = SRPSignatureStage(dim, 64, seed)
    q = query_vectors.astype(np.float64)
    q_sig_tbl = stage(pa.table({
        "vec_id": pa.array(np.asarray(query_ids), type=pa.int64()),
        "embedding": pa.array(list(q), type=pa.list_(pa.float32())),
    }))
    q_sigs = q_sig_tbl["simhash"].to_numpy(zero_copy_only=False)
    width = 64 // n_pieces
    mask = np.uint64((1 << width) - 1)
    q_pieces = {}  # (piece_idx, piece_value) -> [query ids]
    for qid, sig in zip(np.asarray(query_ids), q_sigs):
        for p in range(n_pieces):
            key = (p, int((sig >> np.uint64(p * width)) & mask))
            q_pieces.setdefault(key, []).append(int(qid))
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-300)
    bcast = ray.put((q_pieces, qn, np.asarray(query_ids)))

    def per_batch(t: pa.Table) -> pa.Table:
        qp, qn_, qids = ray.get(bcast)
        n = t.num_rows
        emb = t["embedding"].combine_chunks()
        vecs = emb.values.to_numpy(zero_copy_only=False).reshape(
            n, -1).astype(np.float64)
        sigs = stage(t)["simhash"].to_numpy(zero_copy_only=False)
        qid_to_col = {int(qq): i for i, qq in enumerate(qids)}
        vec_ids = t["vec_id"].to_numpy(zero_copy_only=False)
        cand: dict[int, list[int]] = {}
        for i in range(n):
            for p in range(n_pieces):
                key = (p, int((sigs[i] >> np.uint64(p * width)) & mask))
                for qq in qp.get(key, ()):
                    cand.setdefault(qq, []).append(i)
        rows_q, rows_n, rows_s = [], [], []
        for qq, idxs in cand.items():
            idxs = np.unique(np.array(idxs))
            idxs = idxs[vec_ids[idxs] != qq]
            if len(idxs) == 0:
                continue
            v = vecs[idxs]
            vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True),
                                1e-300)
            s = vn @ qn_[qid_to_col[qq]]
            order = np.lexsort((vec_ids[idxs], -s))[:k]
            sel = idxs[order]
            rows_q.append(np.full(len(sel), qq, dtype=np.int64))
            rows_n.append(vec_ids[sel].astype(np.int64))
            rows_s.append(s[order])
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
    return partial.groupby("query_id").map_groups(
        lambda g: _topk_merge(g, k), batch_format="pandas")
