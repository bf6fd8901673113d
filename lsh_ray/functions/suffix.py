"""Suffix array / LCP utilities for exact substring-duplicate verification.

Rebuild analog of the reference's alignment kernels (recursive alignment and
KTRA, ``matching_algorithms.py:238-316``): where the reference searches for
the best sub-alignment between two pitch vectors by recursive splitting,
the rebuild finds exact shared substrings between two texts with a suffix
array + Kasai LCP pass — run only INSIDE candidate groups (bounded size),
never globally.

Suffix array: numpy prefix-doubling (O(n log^2 n), fully vectorized).
"""

from __future__ import annotations

import numpy as np


def build_suffix_array(seq: np.ndarray) -> np.ndarray:
    """Suffix array of an integer sequence (values >= 0), prefix doubling."""
    s = np.asarray(seq, dtype=np.int64)
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    # initial ranks = dense rank of symbols
    rank = np.unique(s, return_inverse=True)[1].astype(np.int64)
    idx = np.arange(n)
    k = 1
    while True:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        r_ord, k_ord = rank[order], key2[order]
        changed = np.ones(n, dtype=np.int64)
        changed[0] = 0
        changed[1:] = (r_ord[1:] != r_ord[:-1]) | (k_ord[1:] != k_ord[:-1])
        new_rank = np.cumsum(changed)
        rank = np.empty(n, dtype=np.int64)
        rank[order] = new_rank
        if new_rank[-1] == n - 1:
            return order
        k *= 2
        if k >= n:
            return order


def kasai_lcp(seq: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """LCP array: lcp[i] = common prefix length of suffixes sa[i-1], sa[i]."""
    s = np.asarray(seq, dtype=np.int64)
    n = len(s)
    lcp = np.zeros(n, dtype=np.int64)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            while i + h < n and j + h < n and s[i + h] == s[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def longest_common_substring_len(a: bytes, b: bytes) -> int:
    """Length (bytes) of the longest exact common substring of a and b."""
    if not a or not b:
        return 0
    sa_seq = np.concatenate([
        np.frombuffer(a, dtype=np.uint8).astype(np.int64) + 2,
        np.array([1], dtype=np.int64),  # sentinel < any symbol, > terminator
        np.frombuffer(b, dtype=np.uint8).astype(np.int64) + 2,
    ])
    n_a = len(a)
    sa = build_suffix_array(sa_seq)
    lcp = kasai_lcp(sa_seq, sa)
    # adjacent suffixes from different source strings
    from_a = sa < n_a
    cross = from_a[1:] != from_a[:-1]
    if not cross.any():
        return 0
    return int(lcp[1:][cross].max())


def is_exact_substring(shorter: str, longer: str) -> bool:
    """Exact containment check (C-speed scan; definitive)."""
    return shorter in longer
