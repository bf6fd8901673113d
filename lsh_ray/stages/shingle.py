"""Shingle stage: text -> per-document set of hashed k-shingles.

Rebuild of the reference's window extraction + vocabulary encoding
(``lsh.py:40-65`` PLSH windows, ``lsh.py:131-142`` `_dump_piece`/`_vocab_index`,
``lsh.py:164-206`` `tokenize`): a document's token sequence is slid over with
a width-k window; each window is hashed to ``uint64`` (stateless — replaces
the global vocabulary dict); the per-document **set** of shingle hashes is
the sparse equivalent of one column of the reference's dense binary
term-document matrix (``lsh.py:196-206``), which is never materialized.

Fully vectorized per batch: one pandas C-level split over the batch's texts,
one SipHash pass over the flattened token array, a k-step polynomial roll
over the concatenated hashes with cross-document windows masked out, and a
single lexsort-based per-document dedup. No Python loop over rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from lsh_ray.config import PipelineConfig
from lsh_ray.functions.hashing import _P1, hash_strings, splitmix64

_U64 = np.uint64


def tokenize_text_series(texts: pd.Series) -> pd.Series:
    """Deterministic tokenizer: lowercase + whitespace split (vectorized)."""
    return texts.fillna("").str.lower().str.split()


def shingle_sets_from_token_lists(
    token_lists: list[list[str]], k: int, stride: int = 1,
    hash_bits: int = 32
) -> tuple[np.ndarray, np.ndarray]:
    """Token lists -> (flat sorted-unique shingle hashes, list offsets).

    Returns values + int32 offsets suitable for
    ``pa.ListArray.from_arrays(offsets, values)``.
    """
    from lsh_ray.functions.bytetokens import hash_token_array
    lens = np.fromiter((len(t) for t in token_lists), dtype=np.int64,
                       count=len(token_lists))
    total = int(lens.sum())
    flat = np.empty(total, dtype=object)
    pos = 0
    for t in token_lists:
        flat[pos:pos + len(t)] = t
        pos += len(t)
    # same token-hash definition as the production byte path
    tok_h = hash_token_array(flat) if total else np.empty(0, dtype=np.uint64)
    return _shingles_from_hashes(tok_h, lens, k, stride, hash_bits)


def _shingles_from_hashes(tok_h: np.ndarray, lens: np.ndarray, k: int,
                          stride: int = 1,
                          hash_bits: int = 32) -> tuple[np.ndarray, np.ndarray]:
    """Concatenated token hashes + per-doc lengths -> per-doc shingle sets."""
    # k-step polynomial roll over the concatenated token hashes
    n = len(tok_h)
    n_win = max(0, n - k + 1)
    if n_win:
        roll = np.zeros(n_win, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(k):
                roll = roll * _P1 + tok_h[j : n_win + j]
        roll = splitmix64(roll)
        if hash_bits == 32:
            roll = (roll >> _U64(32)).astype(np.uint32)
    else:
        roll = np.empty(0, dtype=np.uint64 if hash_bits == 64 else np.uint32)

    # valid window starts: within one document, honoring stride
    doc_starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    n_sh_per_doc = np.maximum(0, (np.maximum(lens - k + 1, 0) + stride - 1) // stride)
    total_sh = int(n_sh_per_doc.sum())
    # window index array: for each doc, doc_start + stride*[0..n_sh)
    win_doc = np.repeat(np.arange(len(lens)), n_sh_per_doc)
    within = np.arange(total_sh) - np.repeat(
        np.concatenate(([0], np.cumsum(n_sh_per_doc)))[:-1], n_sh_per_doc)
    win_idx = doc_starts[win_doc] + within * stride
    vals = roll[win_idx] if total_sh else np.empty(0, dtype=np.uint64)

    # per-document sorted dedup (set semantics, like the binary td_matrix)
    if total_sh:
        if hash_bits == 32:
            # pack (doc, value) into one uint64: single sort beats lexsort
            packed = (win_doc.astype(np.uint64) << _U64(32)) | vals.astype(np.uint64)
            packed = np.sort(packed)
            keep = np.ones(total_sh, dtype=bool)
            keep[1:] = packed[1:] != packed[:-1]
            packed = packed[keep]
            sv = (packed & _U64(0xFFFFFFFF)).astype(np.uint32)
            sd = (packed >> _U64(32)).astype(np.int64)
        else:
            order = np.lexsort((vals, win_doc))
            sv, sd = vals[order], win_doc[order]
            keep = np.ones(total_sh, dtype=bool)
            keep[1:] = (sv[1:] != sv[:-1]) | (sd[1:] != sd[:-1])
            sv, sd = sv[keep], sd[keep]
        counts = np.bincount(sd, minlength=len(lens))
    else:
        sv = np.empty(0, dtype=roll.dtype)
        counts = np.zeros(len(lens), dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
    return sv, offsets


def shingle_batch(batch: pa.Table, config: PipelineConfig) -> pa.Table:
    """Emits per-doc shingle SET plus per-doc content-defined CHUNK KEYS.

    ``chunk_keys`` (substring-candidate fingerprints) ride along so the
    chunk stage derives from the same single tokenization pass instead of
    re-tokenizing the corpus — at 100 TB the second tokenization is the
    cost of a full extra read. Chunk keys are ~tokens/chunk_divisor per
    doc, an order of magnitude smaller than carrying raw token hashes.
    """
    from lsh_ray.functions.bytetokens import token_hashes_from_arrow
    tok_h, lens = token_hashes_from_arrow(batch["text"])
    vals, offsets = _shingles_from_hashes(
        tok_h, lens, config.shingle_k, config.shingle_stride,
        config.shingle_hash_bits)
    sh_type = pa.uint64() if config.shingle_hash_bits == 64 else pa.uint32()
    shingles = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(vals, type=sh_type))
    from lsh_ray.stages.chunking import chunk_keys_for_batch
    tok_offsets = np.concatenate(([0], np.cumsum(lens)))
    ck_vals, ck_doc = chunk_keys_for_batch(
        tok_h, tok_offsets, config.chunk_divisor, config.chunk_min_tokens)
    ck_counts = np.bincount(ck_doc, minlength=len(lens)) if len(ck_doc) \
        else np.zeros(len(lens), dtype=np.int64)
    ck_offsets = np.concatenate(([0], np.cumsum(ck_counts))).astype(np.int32)
    chunk_keys = pa.ListArray.from_arrays(
        pa.array(ck_offsets, type=pa.int32()),
        pa.array(ck_vals, type=pa.uint64()))
    n_shingles = (offsets[1:] - offsets[:-1]).astype(np.int32)
    out = pa.table({
        "doc_id": batch["doc_id"],
        "url": batch["url"],
        "shingles": shingles,
        "n_shingles": pa.array(n_shingles, type=pa.int32()),
        "chunk_keys": chunk_keys,
    })
    # docs too short to produce a single shingle can never match: drop here
    return out.filter(pa.array(n_shingles > 0))


def shingle(ds, config: PipelineConfig):
    """normalized Dataset -> shingled Dataset (doc_id, url, shingles,
    n_shingles, chunk_keys).

    No explicit ``batch_size``: one batch per input block, so task
    parallelism follows the block count (an explicit batch_size makes Ray
    coalesce blocks into n_rows/batch_size tasks and strangles fan-out).
    """
    return ds.map_batches(
        lambda t: shingle_batch(t, config),
        batch_format="pyarrow", zero_copy_batch=True)
