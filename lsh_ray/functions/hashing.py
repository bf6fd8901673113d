"""Deterministic vectorized 64-bit hashing.

Replaces the reference's global vocabulary dictionary (``lsh.py:135-142``):
instead of dictionary-encoding each shingle into an insertion-ordered id (a
cross-partition mutable state and a scalability dead-end), every shingle is
hashed statelessly to ``uint64``. The semantics the reference relies on —
"same shingle => same fingerprint" — are preserved without any shared state.

All functions are pure numpy (wrapping uint64 arithmetic) or pandas' C
SipHash (``pd.util.hash_array`` with a pinned key), so results are identical
across processes, nodes and runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# SipHash key pinned for cross-process determinism (pd default, made explicit).
_HASH_KEY = "0123456789123456"

# odd multipliers for polynomial combining (splitmix64 / Murmur3 constants)
_P1 = np.uint64(0x9E3779B97F4A7C15)
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)

_U64 = np.uint64


def hash_strings(values: np.ndarray | pd.Series | list) -> np.ndarray:
    """Vectorized deterministic string -> uint64 (C SipHash, pinned key)."""
    arr = np.asarray(values, dtype=object)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(arr, hash_key=_HASH_KEY, categorize=True)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — a strong uint64 -> uint64 mixer."""
    with np.errstate(over="ignore"):
        z = (x.astype(np.uint64) + _P1)
        z = (z ^ (z >> _U64(30))) * _M1
        z = (z ^ (z >> _U64(27))) * _M2
        return z ^ (z >> _U64(31))


def rolling_hash(token_hashes: np.ndarray, k: int, stride: int = 1) -> np.ndarray:
    """k-gram polynomial hash over a 1-D uint64 array, vectorized.

    Returns one uint64 per window start (``len - k + 1`` windows, subsampled
    by ``stride``). This is the rebuild of the reference's shingle key
    (``lsh.py:131-132`` stringified window) as a fixed-width hash: the k-step
    loop is over the (small) window width, never over documents or windows.
    """
    h = np.asarray(token_hashes, dtype=np.uint64)
    n = h.shape[0]
    if n < k:
        return np.empty(0, dtype=np.uint64)
    out = np.zeros(n - k + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            out = out * _P1 + h[j : n - k + 1 + j]
    out = splitmix64(out)
    if stride > 1:
        out = out[::stride]
    return out


def combine_columns(columns: list[np.ndarray], salt: int = 0) -> np.ndarray:
    """Polynomial-combine equal-length uint64 arrays row-wise into one uint64.

    Used for LSH band hashes (r MinHash rows -> one band key; analog of the
    reference's (permutation, selector) index row arithmetic, ``lsh.py:124-128``).
    """
    out = np.full(columns[0].shape[0], np.uint64(salt), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for col in columns:
            out = out * _P1 + col.astype(np.uint64)
    return splitmix64(out)


def hash_pair(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Order-sensitive combine of two uint64 arrays into one key."""
    with np.errstate(over="ignore"):
        return splitmix64(a.astype(np.uint64) * _P1 + b.astype(np.uint64))
