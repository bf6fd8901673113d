"""Fully-vectorized byte-level tokenization + token hashing.

The hot path of the shingle stage. Tokenizing with pandas ``str.split``
materializes millions of Python string objects per batch and SipHash over
an object array is pointer-chasing-bound; this module never creates a
Python object per token. Text bytes are concatenated into one uint8 array,
ASCII-lowercased with a 256-entry lookup table, token spans are found with
a vectorized whitespace mask, and each token's hash is a polynomial hash
of its bytes computed in O(1) per token from prefix hashes
(``H[r] - H[l] * P^(r-l)``, uint64 wraparound).

Tokenizer semantics (pinned; identical for the pipeline and the
brute-force test oracle): split on ASCII whitespace, ASCII-only casefold.
(`str.lower().split()` additionally folds non-ASCII case and splits on
unicode whitespace — the SQL-parity operators in text_stats/tfidf keep
those exact semantics; the dedup engine uses this byte path on both sides
of every comparison, so results are self-consistent.)
"""

from __future__ import annotations

import numpy as np

from lsh_ray.functions.hashing import _P1, splitmix64

_U64 = np.uint64

_LOWER = np.arange(256, dtype=np.uint8)
_LOWER[65:91] += 32  # A-Z -> a-z

_WS = np.zeros(256, dtype=bool)
for _b in (9, 10, 11, 12, 13, 32):
    _WS[_b] = True

# modular inverse of _P1 mod 2^64 (odd -> invertible), Newton iteration
_x = int(_P1)
_inv = _x
for _ in range(5):
    _inv = (_inv * (2 - _x * _inv)) % (1 << 64)
_P1_INV = np.uint64(_inv)

_CHUNK_DOCS = 256  # docs per inner chunk: bounds temp arrays


_PW_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}
# largest table worth RETAINING: 2^22 entries x 8 B x 2 tables = 64 MB per
# worker process. A single document bigger than this becomes one
# tokenization chunk of its full length; computing its tables transiently
# (the pre-cache behavior) is fine — pinning gigabytes per worker is not.
_PW_CACHE_MAX = 1 << 22


def _power_tables(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(P^i for i<=n, P^-i for i<n) — cached and grown geometrically:
    they are pure constants, and recomputing two uint64 cumprods per
    chunk was two of the five full-width passes of the hot loop.
    Oversized requests (one huge document = one chunk) are computed
    transiently, never retained."""
    for size, tabs in _PW_CACHE.items():
        if size >= n:
            return tabs
    size = max(1 << 19, 1 << (int(n - 1).bit_length()))
    with np.errstate(over="ignore"):
        pw = np.ones(size + 1, dtype=np.uint64)
        pw[1:] = np.cumprod(np.full(size, _P1, dtype=np.uint64))
        pwinv = np.ones(size, dtype=np.uint64)
        pwinv[1:] = np.cumprod(np.full(size - 1, _P1_INV, dtype=np.uint64))
    if size <= _PW_CACHE_MAX:
        _PW_CACHE.clear()
        _PW_CACHE[size] = (pw, pwinv)
    return pw, pwinv


def _span_hashes(data: np.ndarray, starts: np.ndarray,
                 ends: np.ndarray) -> np.ndarray:
    """Polynomial hash of byte spans [start, end) of ``data``, O(1)/span."""
    n = len(data)
    with np.errstate(over="ignore"):
        pw, pwinv = _power_tables(n)
        H = np.zeros(n + 1, dtype=np.uint64)
        if n:
            # H[i] = sum_{j<i} (data[j]+1) * P^(i-1-j)
            H[1:] = np.cumsum((data.astype(np.uint64) + _U64(1))
                              * pwinv[:n], dtype=np.uint64) * pw[:n]
        span = H[ends] - H[starts] * pw[ends - starts]
    return splitmix64(span)


def token_hashes_from_texts(texts: list,
                            ) -> tuple[np.ndarray, np.ndarray]:
    """List of strings -> (flat token hashes uint64, per-doc token counts).

    Vectorized in chunks of ``_CHUNK_DOCS`` documents (bounds temporary
    array memory at ~tens of MB regardless of batch size).
    """
    n_docs = len(texts)
    counts = np.zeros(n_docs, dtype=np.int64)
    out_parts: list[np.ndarray] = []
    for c0 in range(0, n_docs, _CHUNK_DOCS):
        chunk = texts[c0:c0 + _CHUNK_DOCS]
        bufs = [(t or "").encode("utf-8", "replace") for t in chunk]
        doc_lens = np.fromiter((len(b) + 1 for b in bufs), dtype=np.int64,
                               count=len(bufs))
        data = np.frombuffer(b" ".join(bufs) + b" ", dtype=np.uint8)
        data = _LOWER[data]
        ws = _WS[data]
        # token starts: non-ws whose predecessor is ws (or position 0)
        nonws = ~ws
        starts = np.flatnonzero(nonws & np.concatenate(([True], ws[:-1])))
        ends_all = np.flatnonzero(ws & np.concatenate(([False], nonws[:-1])))
        # every token ends before the trailing sentinel space, so
        # len(starts) == len(ends_all) and they align 1:1
        tok_h = _span_hashes(data, starts, ends_all)
        # assign tokens to docs by start position
        doc_bounds = np.cumsum(doc_lens)
        doc_of_tok = np.searchsorted(doc_bounds, starts, side="right")
        counts[c0:c0 + len(chunk)] = np.bincount(
            doc_of_tok, minlength=len(chunk))
        out_parts.append(tok_h)
    flat = (np.concatenate(out_parts) if out_parts
            else np.empty(0, dtype=np.uint64))
    return flat, counts


def token_hashes_from_arrow(arr) -> tuple[np.ndarray, np.ndarray]:
    """Arrow string column -> (flat token hashes uint64, per-doc counts).

    Zero-Python-object path: reads the Arrow string column's byte buffer
    directly (the data buffer IS the concatenated utf-8), lowercases with
    the LUT, finds token spans with vectorized masks, and hashes spans in
    O(1) from prefix hashes. Produces hashes IDENTICAL to
    ``token_hashes_from_texts`` (a span's polynomial hash depends only on
    its own bytes). Documents are contiguous with no separators in the
    buffer, so doc boundaries are injected as explicit break positions.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    arr = arr.cast(pa.large_string())
    n_docs = len(arr)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset:arr.offset + n_docs + 1]
    counts = np.zeros(n_docs, dtype=np.int64)
    if n_docs == 0 or offs[-1] == offs[0]:
        return np.empty(0, dtype=np.uint64), counts
    raw = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    out_parts: list[np.ndarray] = []
    # ~256 KB of text per inner chunk: the prefix-hash pass allocates
    # ~40 B of uint64 temps per text byte, so this keeps the working set
    # ~10 MB-per-task -> cache-resident (13x faster than one 5 MB pass)
    target = 1 << 18
    d0 = 0
    while d0 < n_docs:
        d1 = int(np.searchsorted(offs, offs[d0] + target))
        d1 = min(max(d1, d0 + 1), n_docs)
        base = offs[d0]
        data = _LOWER[raw[base:offs[d1]]]
        local = (offs[d0:d1 + 1] - base).astype(np.int64)
        ws = _WS[data]
        nonws = ~ws
        prev_break = np.concatenate(([True], ws[:-1]))
        # doc starts break tokens; an EMPTY trailing doc has start ==
        # chunk byte length (one past the data) — mask those out
        ds_idx = local[:-1]
        prev_break[ds_idx[ds_idx < len(data)]] = True
        next_break = np.concatenate((ws[1:], [True]))
        # doc ends break tokens; an empty LEADING doc has end-1 == -1
        de_idx = local[1:] - 1
        next_break[de_idx[de_idx >= 0]] = True
        starts = np.flatnonzero(nonws & prev_break)
        ends = np.flatnonzero(nonws & next_break) + 1
        out_parts.append(_span_hashes(data, starts, ends))
        doc_of_tok = np.searchsorted(local[1:], starts, side="right")
        counts[d0:d1] = np.bincount(doc_of_tok, minlength=d1 - d0)
        d0 = d1
    flat = (np.concatenate(out_parts) if out_parts
            else np.empty(0, dtype=np.uint64))
    return flat, counts


def hash_token_array(tokens: np.ndarray | list) -> np.ndarray:
    """Token strings -> uint64 hashes, identical to the byte path.

    Used by the test oracle so oracle and pipeline share one definition.
    """
    toks = list(tokens)
    if not toks:
        return np.empty(0, dtype=np.uint64)
    bufs = [t.encode("utf-8", "replace") for t in toks]
    lens = np.fromiter((len(b) + 1 for b in bufs), dtype=np.int64,
                       count=len(bufs))
    data = np.frombuffer(b" ".join(bufs) + b" ", dtype=np.uint8)
    data = _LOWER[data]
    bounds = np.cumsum(lens)
    starts = np.concatenate(([0], bounds[:-1]))
    ends = bounds - 1
    return _span_hashes(data, starts, ends)
