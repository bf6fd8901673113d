"""Content-defined chunk keys: position-independent exact-run detection.

LSH bands catch high-Jaccard near-duplicates, but a short document embedded
verbatim inside a much longer one (substring containment) has LOW Jaccard
with its container and can evade every band. This stage emits a second key
family into the same candidate shuffle: token streams are split at
content-defined boundaries (token-bigram-hash & mask == 0, expected chunk
length = ``chunk_divisor``), and each BIGRAM of consecutive internal
chunks' polynomial hashes becomes a candidate key. Because boundaries
depend only on content, a verbatim shared run of ~3x the expected chunk
length yields at least one identical chunk bigram in both documents
wherever it sits — so substring pairs reach the suffix-array verification
pass with recall ~1, while a single shared phrase (boilerplate, the noise
mass that dominated the pair exchange) emits no candidate at all.

Reference analog: the alignment kernels' role of finding sub-sequence
matches between query and candidate (``matching_algorithms.py:238-316``),
made shuffle-friendly. Fully vectorized: prefix polynomial hashes give any
span's hash in O(1) via ``H[r] - H[l]*P^(r-l)`` (uint64 wraparound; P odd
=> invertible).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lsh_ray.config import PipelineConfig
from lsh_ray.functions.hashing import _P1, splitmix64

_U64 = np.uint64
_CHUNK_TAG = np.uint64(0xC0FFEE0DD)  # separates chunk-key space from band keys


def _prefix_hashes(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Prefix polynomial hashes H (len n+1) and powers of P (len n+1).

    H[i] = sum_{j<i} h[j] * P^(i-1-j)  (mod 2^64), computed without a scan:
    H[i] = P^(i-1) * cumsum(h * P^-j)[i-1].
    """
    n = len(h)
    with np.errstate(over="ignore"):
        pw = np.ones(n + 1, dtype=np.uint64)
        if n:
            pw[1:] = np.cumprod(np.full(n, _P1, dtype=np.uint64))
        pinv = _modinv_u64(_P1)
        pwinv = np.ones(n, dtype=np.uint64)
        if n > 1:
            pwinv[1:] = np.cumprod(np.full(n - 1, pinv, dtype=np.uint64))
        acc = np.zeros(n + 1, dtype=np.uint64)
        if n:
            acc[1:] = np.cumsum(h * pwinv, dtype=np.uint64)
            acc[1:] = acc[1:] * pw[:n]
    return acc, pw


def _modinv_u64(a: np.uint64) -> np.uint64:
    """Inverse of odd a mod 2^64 (Newton iteration)."""
    x = int(a)
    inv = x  # 3 bits correct
    for _ in range(5):
        inv = (inv * (2 - x * inv)) % (1 << 64)
    return np.uint64(inv)


def chunk_keys_for_batch(token_hashes: np.ndarray, doc_offsets: np.ndarray,
                         divisor: int, min_tokens: int
                         ) -> tuple[np.ndarray, np.ndarray]:
    """(chunk_key, doc_index) arrays for a batch of concatenated token hashes.

    ``doc_offsets``: int64, len n_docs+1. Only spans between two INTERNAL
    content-defined boundaries of the same doc are emitted (position
    independence); spans shorter than ``min_tokens`` are skipped.
    """
    h = token_hashes
    n = len(h)
    if n < 2:
        return (np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64))
    mask = _U64(divisor - 1)
    # boundary condition on token BIGRAMS, not single tokens: Zipf-skewed
    # text can have so few distinct tokens that none is a boundary token,
    # leaving whole documents chunk-less; distinct bigrams are plentiful.
    # Still purely content-defined => position independent.
    with np.errstate(over="ignore"):
        bigram = splitmix64(h[:-1] * _P1 + h[1:])
    is_boundary = np.zeros(n, dtype=bool)
    is_boundary[1:] = (bigram & mask) == 0
    # a bigram spanning two documents is not content-local: mask doc starts
    is_boundary[doc_offsets[:-1]] = False
    pos = np.flatnonzero(is_boundary)
    if len(pos) < 2:
        return (np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64))
    doc_of_pos = np.searchsorted(doc_offsets, pos, side="right") - 1
    same_doc = doc_of_pos[1:] == doc_of_pos[:-1]
    l, r = pos[:-1][same_doc], pos[1:][same_doc]
    docs = doc_of_pos[:-1][same_doc]
    long_enough = (r - l) >= min_tokens
    l, r, docs = l[long_enough], r[long_enough], docs[long_enough]
    if len(l) == 0:
        return (np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64))
    H, pw = _prefix_hashes(h)
    with np.errstate(over="ignore"):
        span = H[r] - H[l] * pw[r - l]
        keys = splitmix64(span * _P1 + _CHUNK_TAG)
        # emit BIGRAMS of consecutive kept chunks, not single chunks.
        # Boundaries are content-local, so inside a verbatim shared run
        # BOTH documents keep the same chunk sequence — two consecutive
        # internal chunks pair identically in both. A single ~divisor-
        # token phrase shared by many documents (boilerplate) no longer
        # creates a candidate key at all: measured at 200k docs, single-
        # chunk keys emitted 17.8M partial pair rows of which 15.2M were
        # the chunk_hits==1 noise mass the downstream gate existed to
        # drop; bigram keys remove that mass BEFORE the pair exchange.
        # Recall bound is unchanged: a shared run with >= 2 internal
        # chunks produced >= 2 shared keys before (the old gate's
        # requirement) and produces >= 1 shared bigram now.
        same = docs[1:] == docs[:-1]
        bigrams = splitmix64(keys[:-1] * _P1 + keys[1:])[same]
        bdocs = docs[:-1][same]
    if len(bigrams) == 0:
        return (np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64))
    # dedupe (doc, key) so repeated runs in one doc emit once
    uniq = np.unique(np.stack([bdocs.astype(np.uint64), bigrams], axis=1),
                     axis=0)
    return uniq[:, 1], uniq[:, 0].astype(np.int64)


class ChunkKeyStage:
    """shingled/normalized batch -> (band_key, doc_id) chunk rows.

    Operates on the token stream, so it re-tokenizes from ``text``; stateless
    apart from config (plain tasks are fine, class kept for symmetry).
    """

    def __init__(self, config: PipelineConfig):
        self.config = config

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        from lsh_ray.functions.hashing import hash_strings
        from lsh_ray.stages.shingle import tokenize_text_series

        texts = pd.Series(batch["text"].to_pylist())
        tok_lists = tokenize_text_series(texts).tolist()
        lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64,
                           count=len(tok_lists))
        flat = np.empty(int(lens.sum()), dtype=object)
        p = 0
        for t in tok_lists:
            flat[p:p + len(t)] = t
            p += len(t)
        tok_h = hash_strings(flat)
        offsets = np.concatenate(([0], np.cumsum(lens)))
        keys, doc_idx = chunk_keys_for_batch(
            tok_h, offsets, self.config.chunk_divisor,
            self.config.chunk_min_tokens)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "band_key": pa.array(keys, type=pa.uint64()),
            "doc_id": pa.array(doc_ids[doc_idx], type=pa.uint64()),
        })


def chunk_rows(normalized_ds, config: PipelineConfig):
    """normalized Dataset -> (band_key, doc_id) chunk-key rows."""
    return normalized_ds.map_batches(
        ChunkKeyStage(config), batch_format="pyarrow", zero_copy_batch=True,
        batch_size=config.batch_size)


def _chunk_rows_batch(batch: pa.Table) -> pa.Table:
    ck = batch["chunk_keys"].combine_chunks()
    offsets = ck.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = offsets[1:] - offsets[:-1]
    keys = ck.values.to_numpy(zero_copy_only=False)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    return pa.table({
        "band_key": pa.array(keys, type=pa.uint64()),
        "doc_id": pa.array(np.repeat(doc_ids, counts), type=pa.uint64()),
    })


def chunk_rows_from_signatures(sigs_ds, config: PipelineConfig):
    """signatures Dataset (carries per-doc ``chunk_keys``) -> chunk rows.

    The keys were computed in the shingle stage's single tokenization
    pass — this is a pure explode, no re-read, no re-tokenize.
    """
    return sigs_ds.map_batches(_chunk_rows_batch, batch_format="pyarrow",
                               zero_copy_batch=True)
