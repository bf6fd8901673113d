"""LSH banding: signatures -> (band_key, doc_id) rows.

Rebuild of the reference's inverted-index rows (``lsh.py:222-269``): the
reference's postings structure is indexed by ``(permutation, selector)`` row
and fingerprint value (``lsh.py:124-128``). Here the 128-slot MinHash
signature is split into ``b`` bands of ``r`` rows; each band's r values are
polynomial-combined (salted with the band index) into ONE uint64
``band_key``. The global mutable inverted index (driver-resident in the
reference, its scaling wall) is never materialized: a later
``groupby(band_key)`` shuffle IS the postings list, transient inside the
exchange.

Emission is a vectorized flat_map implemented as ``map_batches`` (1 row ->
b rows via numpy repeat/reshape — no per-row Python).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lsh_ray.config import PipelineConfig
from lsh_ray.functions.hashing import _P1, splitmix64

_U64 = np.uint64


def band_keys_from_minhash(mh: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """(n_docs, perms) minhash -> (n_docs, bands) uint64 band keys.

    The band index is mixed into the key so identical row-values in
    different bands never collide (reference analog: row index arithmetic
    ``perm*2 + selector``, lsh.py:124-128).
    """
    n = mh.shape[0]
    grouped = mh.reshape(n, bands, rows)
    out = np.repeat(
        splitmix64(np.arange(bands, dtype=np.uint64))[None, :], n, axis=0)
    with np.errstate(over="ignore"):
        for j in range(rows):
            out = out * _P1 + grouped[:, :, j]
    return splitmix64(out)


def banding_batch(batch: pa.Table, config: PipelineConfig) -> pa.Table:
    n = batch.num_rows
    if n == 0:
        return pa.table({"band_key": pa.array([], pa.uint64()),
                         "doc_id": pa.array([], pa.uint64())})
    mh = (batch["minhash"].combine_chunks().values
          .to_numpy(zero_copy_only=False)
          .reshape(n, config.num_perms))
    keys = band_keys_from_minhash(mh, config.bands, config.rows_per_band)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    return pa.table({
        "band_key": pa.array(keys.reshape(-1), type=pa.uint64()),
        "doc_id": pa.array(np.repeat(doc_ids, config.bands), type=pa.uint64()),
    })


def band_rows(ds, config: PipelineConfig):
    """signatures Dataset -> (band_key, doc_id) Dataset, b rows per doc."""
    return ds.map_batches(
        lambda t: banding_batch(t, config),
        batch_format="pyarrow", zero_copy_batch=True)
