"""Matching / verification kernel library (the reference's "UDF library").

Re-implements, from the published formulas, every matching algorithm the
reference dispatches (``matching_algorithms.py``; SURVEY.md §2.8 V1-V9),
over numeric sequences:

- V1 cosine similarity over aligned sparse vectors
- V2 Manhattan distance with zero-pad alignment
- V3 linear scaling (LS): min distance over tempo-rescaled query variants
- V4/V5 BALS: LS over a shifted/edge-padded candidate neighbourhood
- V6 recursive alignment (RA): best of whole vs 40/50/60% splits, bounded
  depth
- V7 KTRA: key-transposition-invariant RA (mean-subtract + +-k shifts)

``KERNELS`` is the plugin registry (reference analog: the name->callable
dispatch dict, ``matching_algorithms.py:327-333``): every kernel has the
uniform ``(query, candidate) -> float`` distance contract (cosine/jaccard
return similarities; see ``reverse_order`` handling in ranking).
"""

from __future__ import annotations

import numpy as np

MAX_RA_DEPTH = 3       # reference constants.py:119
MAX_KTRA_DEPTH = 2     # reference constants.py:121
INITIAL_KTRA_K = 1     # reference constants.py:123
BALS_SHIFT_SIZE = 15   # reference constants.py:116
RESCALE_FACTORS = (0.5, 0.75, 1.0, 1.25, 1.5)  # matching_algorithms.py:111-134


def cosine_similarity(a: np.ndarray, b: np.ndarray) -> float:
    """V1: dot/(|a||b|); 0 on zero norm (matching_algorithms.py:34-52)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    n = min(len(a), len(b))
    if n == 0:
        return 0.0
    num = float(np.dot(a[:n], b[:n]))
    den = float(np.linalg.norm(a) * np.linalg.norm(b))
    return num / den if den else 0.0


def _pad_align(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Zero-pad the shorter sequence (matching_algorithms.py:137-150)."""
    la, lb = len(a), len(b)
    if la < lb:
        a = np.concatenate([a, np.zeros(lb - la)])
    elif lb < la:
        b = np.concatenate([b, np.zeros(la - lb)])
    return a, b


def manhattan_distance(a: np.ndarray, b: np.ndarray) -> float:
    """V2: L1 distance after zero-pad alignment."""
    a, b = _pad_align(np.asarray(a, dtype=np.float64),
                      np.asarray(b, dtype=np.float64))
    return float(np.abs(a - b).sum())


def rescale(seq: np.ndarray, factor: float) -> np.ndarray:
    """Tempo rescale by linear index resampling (matching_algorithms.py:111-134)."""
    seq = np.asarray(seq, dtype=np.float64)
    n_out = max(1, int(round(len(seq) * factor)))
    idx = np.minimum((np.arange(n_out) / factor).astype(np.int64),
                     len(seq) - 1)
    return seq[idx]


def linear_scaling(query: np.ndarray, cand: np.ndarray) -> float:
    """V3: min Manhattan over the 5 rescaled query variants."""
    return min(manhattan_distance(rescale(query, f), cand)
               for f in RESCALE_FACTORS)


def _candidate_neighbourhood(cand: np.ndarray,
                             shift: int = BALS_SHIFT_SIZE) -> list[np.ndarray]:
    """V4: +-shift and nearest-edge-padded variants
    (matching_algorithms.py:179-207)."""
    c = np.asarray(cand, dtype=np.float64)
    variants = [c]
    if len(c) > shift:
        variants.append(c[shift:])                                  # left shift
        variants.append(c[:-shift])                                 # right trim
    if len(c) > 0:
        variants.append(np.concatenate([np.full(shift, c[0]), c]))  # pad front
        variants.append(np.concatenate([c, np.full(shift, c[-1])]))  # pad back
    return variants


def bals(query: np.ndarray, cand: np.ndarray) -> float:
    """V5: LS over the candidate and its neighbourhood variants, keep min."""
    return min(linear_scaling(query, v)
               for v in _candidate_neighbourhood(cand))


def recursive_alignment(query: np.ndarray, cand: np.ndarray,
                        depth: int = MAX_RA_DEPTH) -> float:
    """V6: LS on the whole, then best of 40/50/60% split alignments,
    recursing on matched halves (matching_algorithms.py:238-285)."""
    query = np.asarray(query, dtype=np.float64)
    cand = np.asarray(cand, dtype=np.float64)
    best = linear_scaling(query, cand)
    if depth <= 0 or len(query) < 4 or len(cand) < 4:
        return best
    for frac in (0.4, 0.5, 0.6):
        qs = max(1, int(len(query) * frac))
        cs = max(1, int(len(cand) * frac))
        left = recursive_alignment(query[:qs], cand[:cs], depth - 1)
        right = recursive_alignment(query[qs:], cand[cs:], depth - 1)
        best = min(best, left + right)
    return best


def ktra(query: np.ndarray, cand: np.ndarray, k: float = INITIAL_KTRA_K,
         depth: int = MAX_KTRA_DEPTH) -> float:
    """V7: mean-subtract both (M11), try key shifts -k/0/+k with RA, recurse
    with FLOAT k/2 (matching_algorithms.py:288-316 halves a float:
    1 -> 0.5 -> 0.25, so the fine transposition search survives)."""
    q = np.asarray(query, dtype=np.float64)
    c = np.asarray(cand, dtype=np.float64)
    q = q - q.mean() if len(q) else q
    c = c - c.mean() if len(c) else c
    k = float(k)
    best = min(recursive_alignment(q + s, c, 1) for s in (-k, 0.0, k))
    if depth > 0 and k > 1e-9:
        best = min(best, ktra(query, cand, k / 2.0, depth - 1))
    return best


def jaccard_sets(a: np.ndarray, b: np.ndarray) -> float:
    """D1: exact Jaccard x100 over value sets (matching_algorithms.py:65-72
    scales to percent)."""
    a = np.unique(np.asarray(a))
    b = np.unique(np.asarray(b))
    union = len(np.union1d(a, b))
    if union == 0:
        return 0.0
    return 100.0 * len(np.intersect1d(a, b)) / union


KERNELS = {
    "cosine": cosine_similarity,
    "manhattan": manhattan_distance,
    "ls": linear_scaling,
    "bals": bals,
    "ra": recursive_alignment,
    "ktra": ktra,
    "jaccard": jaccard_sets,
}

# kernels whose score is a similarity (rank descending), not a distance
SIMILARITY_KERNELS = {"cosine", "jaccard"}


def rank_candidates(query: np.ndarray, candidates: list[tuple],
                    kernel: str = "ls") -> list[tuple]:
    """V8: score query x candidates with the named kernel, sort
    (matching_algorithms.py:319-386: distances ascending, similarities
    descending — ``reverse_order``)."""
    fn = KERNELS[kernel]
    scored = [(name, float(fn(query, seq))) for name, seq in candidates]
    reverse = kernel in SIMILARITY_KERNELS
    return sorted(scored, key=lambda x: -x[1] if reverse else x[1])
