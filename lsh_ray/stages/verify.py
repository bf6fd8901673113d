"""Verification stage: candidate pairs -> exact similarity measures.

Rebuild of the reference's verification kernels (``matching_algorithms.py``):

- exact Jaccard over shingle sets  (ref: ``matching_algorithms.py:55-72``,
  np.intersect1d/np.union1d; here computed on the already-materialized
  ``shingles`` column — the reference re-extracts windows on the fly,
  ``matching_algorithms.py:75-108``, which the rebuild avoids)
- SimHash Hamming distance          (popcount of XOR, vectorized)
- shingle containment |A∩B|/min     (gates the suffix-array substring pass —
  the rebuild analog of the alignment kernels RA/KTRA,
  ``matching_algorithms.py:238-316``)

The pair -> shingle-set lookup is a hash-partitioned join on ``doc_id``
(reference analog: positional candidate lookup ``lsh.py:462-463``, made
content-keyed). Threshold gating mirrors ``clip_false_candidates``
(``lsh.py:385-412``): pairs below every gate are dropped between stages.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lsh_ray.config import PipelineConfig


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array."""
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8),
                         axis=1).sum(axis=1)


def jaccard_and_containment(
    values_a: np.ndarray, offsets_a: np.ndarray,
    values_b: np.ndarray, offsets_b: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-pair exact Jaccard + containment over sorted-unique shingle sets.

    Each row's sets are sorted unique uint64 (shingle stage guarantees this);
    intersection size via binary search (searchsorted) per pair.
    """
    n = len(offsets_a) - 1
    jac = np.zeros(n, dtype=np.float32)
    cont = np.zeros(n, dtype=np.float32)
    for i in range(n):
        a = values_a[offsets_a[i]:offsets_a[i + 1]]
        b = values_b[offsets_b[i]:offsets_b[i + 1]]
        la, lb = len(a), len(b)
        if la == 0 or lb == 0:
            continue
        if la > lb:
            a, b, la, lb = b, a, lb, la
        idx = np.searchsorted(b, a)
        idx[idx == lb] = lb - 1
        inter = int((b[idx] == a).sum())
        jac[i] = inter / (la + lb - inter)
        cont[i] = inter / la
    return jac, cont


def _verify_batch(batch: pa.Table, config: PipelineConfig) -> pa.Table:
    n = batch.num_rows
    if n == 0:
        return batch.append_column(
            "jaccard", pa.array([], pa.float32())).append_column(
            "containment", pa.array([], pa.float32())).append_column(
            "hamming", pa.array([], pa.int32())).append_column(
            "is_dup", pa.array([], pa.bool_())).append_column(
            "is_substring_candidate", pa.array([], pa.bool_()))
    sh_a = batch["shingles_a"].combine_chunks()
    sh_b = batch["shingles_b"].combine_chunks()
    off_a = sh_a.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    off_b = sh_b.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    va = sh_a.values.to_numpy(zero_copy_only=False)
    vb = sh_b.values.to_numpy(zero_copy_only=False)
    jac, cont = jaccard_and_containment(va, off_a - off_a[0],
                                        vb, off_b - off_b[0])
    ham = _popcount64(
        batch["simhash_a"].to_numpy(zero_copy_only=False)
        ^ batch["simhash_b"].to_numpy(zero_copy_only=False)).astype(np.int32)
    is_dup = jac >= config.jaccard_threshold
    is_sub = (~is_dup) & (cont >= config.containment_threshold)
    out = pa.table({
        "doc_a": batch["doc_a"],
        "doc_b": batch["doc_b"],
        "n_band_hits": batch["n_band_hits"],
        "jaccard": pa.array(jac, type=pa.float32()),
        "containment": pa.array(cont, type=pa.float32()),
        "hamming": pa.array(ham, type=pa.int32()),
        "is_dup": pa.array(is_dup),
        "is_substring_candidate": pa.array(is_sub),
    })
    # clip_false_candidates analog: drop pairs that pass no gate
    return out.filter(pa.array(is_dup | is_sub))


def attach_signatures(pairs_ds, signatures_ds, config: PipelineConfig,
                      columns=("shingles", "simhash")):
    """Hash-join pair endpoints to their signature rows (doc_a then doc_b).

    Uses the bucketed partitioned join (lsh_ray.stages.join) because the
    payload carries list<uint64> shingle sets, which Acero-based
    ``Dataset.join`` cannot ship as non-key columns.
    """
    from lsh_ray.stages.join import bucket_join
    cols = list(columns)
    joined = bucket_join(pairs_ds, signatures_ds, "doc_a", "doc_id",
                         cols, suffix="_a",
                         num_buckets=config.join_num_partitions)
    return bucket_join(joined, signatures_ds, "doc_b", "doc_id",
                       cols, suffix="_b",
                       num_buckets=config.join_num_partitions)


def verify(pairs_ds, signatures_ds, config: PipelineConfig):
    """cand_pairs + signatures -> verified pairs with similarity columns."""
    joined = attach_signatures(pairs_ds, signatures_ds, config)
    return joined.map_batches(lambda t: _verify_batch(t, config),
                              batch_format="pyarrow", zero_copy_batch=True)
