"""Signature stage: per-document 128-perm MinHash + 64-bit SimHash.

Rebuild of the reference's permutation sketch (``lsh.py:213-255``): the
reference seeds ``np.random.shuffle`` with the permutation number
(``lsh.py:215-216``) and takes min/max of the permuted fingerprints of a
document's terms. Here each "permutation" is the standard universal-hash
family ``h_i(x) = (a_i * x + b_i) mod 2^64`` (then mixed); ``min`` over a
document's shingle hashes per ``h_i`` is the MinHash signature. Determinism
matches the reference's seed discipline: all ``(a_i, b_i)`` derive from one
pinned config seed, so same seed => same signatures, across processes and
cluster sizes.

This is a STATEFUL stage: the permutation parameter arrays are built once
per actor in ``__init__`` (reference analog: module-level extractor state,
``loader.py:26``) and reused for every batch — run it with
``map_batches(SignatureStage, concurrency=N)`` so Ray provisions an actor
pool.

The per-batch kernel is fully vectorized: all documents' shingles are
flattened into one uint64 array; the 128 hash applications run in
perm-chunks (bounded memory) with ``np.minimum.reduceat`` over document
offsets; SimHash bit sums use ``np.add.reduceat``. No Python loop over
documents.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lsh_ray.config import PipelineConfig
from lsh_ray.functions.hashing import splitmix64

_U64 = np.uint64
_PERM_CHUNK = 16  # perms processed at once: bounds temp to n_values*16*8 bytes


def make_perm_params(num_perms: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Seed-derived (a, b) arrays of the hash-permutation family (odd a)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63, size=num_perms, dtype=np.uint64) * _U64(2) + _U64(1)
    b = rng.integers(0, 2**63, size=num_perms, dtype=np.uint64)
    return a, b


def minhash_of_values(values: np.ndarray, offsets: np.ndarray,
                      a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signatures for concatenated shingle sets.

    values: flat uint64 shingle hashes; offsets: int per-doc start offsets
    (len = n_docs + 1, strictly increasing — empty docs must be filtered
    upstream). Returns (n_docs, num_perms) uint64.

    Per-perm 1-D kernel: ``min((a_i*x + b_i) mod 2^64)`` per segment. No
    extra finalizer — the inputs are already splitmix-mixed shingle hashes,
    and an affine map of a well-mixed value is a valid permutation
    approximation (the multiply-shift universal family). ~6x faster than
    the 2-D chunked variant.
    """
    n_docs = len(offsets) - 1
    num_perms = a.shape[0]
    out = np.empty((num_perms, n_docs), dtype=np.uint64)
    starts = offsets[:-1]
    v = values.astype(np.uint64)  # 32-bit stored fingerprints widen here
    with np.errstate(over="ignore"):
        for i in range(num_perms):
            hv = v * a[i]
            hv += b[i]
            out[i] = np.minimum.reduceat(hv, starts)
    return np.ascontiguousarray(out.T)


def simhash_of_values(values: np.ndarray, offsets: np.ndarray,
                      bits: int = 64) -> np.ndarray:
    """64-bit SimHash per doc: majority vote over shingle-hash bits."""
    n_docs = len(offsets) - 1
    starts = offsets[:-1]
    counts = (offsets[1:] - offsets[:-1]).astype(np.int64)
    # re-mix so all 64 sketch bits carry signal even for 32-bit inputs
    v = splitmix64(values.astype(np.uint64))
    out = np.zeros(n_docs, dtype=np.uint64)
    # per-bit 1-D segmented sums (2-D reduceat is far slower)
    for bit in range(bits):
        col = ((v >> _U64(bit)) & _U64(1)).astype(np.int64)
        ones = np.add.reduceat(col, starts)
        out |= (ones * 2 > counts).astype(np.uint64) << _U64(bit)
    return out


class SignatureStage:
    """Actor-pool callable: shingled batch -> signatures batch."""

    def __init__(self, config: PipelineConfig):
        self.config = config
        self.a, self.b = make_perm_params(config.num_perms, config.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        shingles = batch["shingles"].combine_chunks()
        offsets = shingles.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = offsets - offsets[0]
        values = shingles.values.to_numpy(zero_copy_only=False)
        n = batch.num_rows
        if n == 0 or len(values) == 0:
            return pa.table({
                "doc_id": batch["doc_id"], "url": batch["url"],
                "shingles": batch["shingles"], "n_shingles": batch["n_shingles"],
                "minhash": pa.array([], pa.list_(pa.uint64(), self.config.num_perms)),
                "simhash": pa.array([], pa.uint64()),
            }) if n == 0 else self._empty_guard(batch)
        mh = minhash_of_values(values, offsets, self.a, self.b)
        sh = simhash_of_values(values, offsets, self.config.simhash_bits)
        minhash = pa.FixedSizeListArray.from_arrays(
            pa.array(mh.reshape(-1), type=pa.uint64()), self.config.num_perms)
        cols = {
            "doc_id": batch["doc_id"],
            "url": batch["url"],
            "shingles": batch["shingles"],
            "n_shingles": batch["n_shingles"],
            "minhash": minhash,
            "simhash": pa.array(sh, type=pa.uint64()),
        }
        if "chunk_keys" in batch.column_names:
            cols["chunk_keys"] = batch["chunk_keys"]
        return pa.table(cols)

    def _empty_guard(self, batch: pa.Table) -> pa.Table:
        raise ValueError("signature stage received docs with empty shingle sets; "
                         "shingle stage must filter n_shingles == 0")


_STAGE_CACHE: dict[tuple, SignatureStage] = {}


def _signature_fn(batch: pa.Table, config: PipelineConfig) -> pa.Table:
    """Stateless-task wrapper: the 'state' (two 128-element permutation
    parameter arrays) is microseconds to build, so it is cached per worker
    process instead of pinning an actor pool — plain tasks stay fully
    elastic and never starve the read/shuffle stages. (The actor-pool
    pattern is used where state is genuinely heavy: language-ID, SRP
    projections, binary decoding.)"""
    key = (config.num_perms, config.seed, config.simhash_bits)
    stage = _STAGE_CACHE.get(key)
    if stage is None:
        stage = _STAGE_CACHE[key] = SignatureStage(config)
    return stage(batch)


def signatures(ds, config: PipelineConfig):
    """shingled Dataset -> signatures Dataset (adds minhash + simhash columns)."""
    # no explicit batch_size: one batch per block keeps task fan-out equal
    # to the block count (a fixed batch_size coalesces blocks and caps
    # parallelism at n_rows/batch_size tasks)
    return ds.map_batches(
        lambda t: _signature_fn(t, config),
        batch_format="pyarrow", zero_copy_batch=True)
