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


def _build_suffix_array_with_levels(
        s: np.ndarray) -> tuple[np.ndarray, list[np.ndarray], list[int]]:
    """Prefix-doubling suffix array, keeping every doubling level's rank
    array (``levels[t][i]`` = dense rank of the first ``widths[t]``
    characters of the suffix at ``i``) for binary-lifting LCP queries."""
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64), [], []
    rank = np.unique(s, return_inverse=True)[1].astype(np.int64)
    levels = [rank]
    widths = [1]
    k = 1
    order = np.argsort(rank, kind="stable")
    while rank[order[-1]] != n - 1 and k < n:
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
        k *= 2
        levels.append(rank)
        widths.append(k)
    return order, levels, widths


def build_suffix_array(seq: np.ndarray) -> np.ndarray:
    """Suffix array of an integer sequence (values >= 0), prefix doubling
    (O(n log^2 n), fully vectorized)."""
    s = np.asarray(seq, dtype=np.int64)
    return _build_suffix_array_with_levels(s)[0]


def _pairwise_lcp(i: np.ndarray, j: np.ndarray, n: int,
                  levels: list[np.ndarray],
                  widths: list[int]) -> np.ndarray:
    """Vectorized LCP of suffix pairs (i[k], j[k]) by binary lifting over
    the doubling ranks: if the rank-at-width-w of two (sub)suffixes is
    equal, their first w characters match — descend widths high to low,
    advancing both cursors on a match. O(log n) vectorized passes; no
    per-character Python (the old Kasai loop was the one O(n)-Python
    kernel left on the substring hot path)."""
    h = np.zeros(len(i), dtype=np.int64)
    ii = i.astype(np.int64).copy()
    jj = j.astype(np.int64).copy()
    for t in range(len(levels) - 1, -1, -1):
        w = widths[t]
        r = levels[t]
        ok = (ii + h + w <= n) & (jj + h + w <= n)
        if not ok.any():
            continue
        eq = np.zeros(len(ii), dtype=bool)
        a_idx = (ii + h)[ok]
        b_idx = (jj + h)[ok]
        eq[ok] = r[a_idx] == r[b_idx]
        h[eq] += w
    return h


def kasai_lcp(seq: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """LCP array: lcp[i] = common prefix length of suffixes sa[i-1], sa[i].

    (Name kept for API compatibility; the implementation is binary-lifting
    over prefix-doubling ranks rather than Kasai's sequential scan — same
    output, vectorized.)"""
    s = np.asarray(seq, dtype=np.int64)
    n = len(s)
    lcp = np.zeros(n, dtype=np.int64)
    if n < 2:
        return lcp
    _, levels, widths = _build_suffix_array_with_levels(s)
    lcp[1:] = _pairwise_lcp(sa[:-1], sa[1:], n, levels, widths)
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
    sa, levels, widths = _build_suffix_array_with_levels(sa_seq)
    # adjacent suffixes from different source strings: only their LCPs
    # matter, so compute exactly those (binary lifting, vectorized)
    from_a = sa < n_a
    cross = np.flatnonzero(from_a[1:] != from_a[:-1])
    if len(cross) == 0:
        return 0
    lcps = _pairwise_lcp(sa[cross], sa[cross + 1], len(sa_seq),
                         levels, widths)
    return int(lcps.max())


def is_exact_substring(shorter: str, longer: str) -> bool:
    """Exact containment check (C-speed scan; definitive)."""
    return shorter in longer
