"""Evaluation metrics — reference-parity formulas.

Each function re-implements (from the published formula, not the code) a
metric the reference computes, and is used by the test suite as a
conformance oracle:

- ``mean_reciprocal_rank``   (ref: ``lsh.py:320-350``)
- ``confidence_measurement`` (ref: ``lsh.py:353-382``: for the candidate at
  rank i within the top-k, conf = (k-1)*d_i / sum_{j != i} d_j — a
  relative-margin score; the trained threshold gates candidates,
  ``utils.py:154-171``)
- ``mean_absolute_error`` / ``root_mean_squared_error``
  (ref: ``scripts/evaluation_metrics.py:80-111``)
- ``normalize_distance_to_similarity`` (ref:
  ``matching_algorithms.py:431-447``: min(100, e^(1/d) - 1))
"""

from __future__ import annotations

import numpy as np


def mean_reciprocal_rank(ranks: np.ndarray) -> float:
    """Mean of 1/rank; rank <= 0 means 'not found' and contributes 0."""
    r = np.asarray(ranks, dtype=np.float64)
    rr = np.where(r > 0, 1.0 / np.maximum(r, 1), 0.0)
    return float(rr.mean()) if len(rr) else 0.0


def confidence_measurement(distances: np.ndarray, index: int = 0) -> float:
    """Relative-margin confidence of the candidate at ``index`` among the
    top-k distances: (k-1) * d_i / sum_{j != i} d_j."""
    d = np.asarray(distances, dtype=np.float64)
    k = len(d)
    if k < 2:
        return 1.0
    others = d.sum() - d[index]
    if others == 0:
        return 1.0
    return float((k - 1) * d[index] / others)


def mean_absolute_error(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.abs(np.asarray(a, dtype=np.float64)
                        - np.asarray(b, dtype=np.float64)).mean())


def root_mean_squared_error(a: np.ndarray, b: np.ndarray) -> float:
    d = np.asarray(a, dtype=np.float64) - np.asarray(b, dtype=np.float64)
    return float(np.sqrt((d * d).mean()))


def normalize_distance_to_similarity(d: np.ndarray) -> np.ndarray:
    """distance -> similarity, capped at 100 (exp(1/d) - 1)."""
    d = np.asarray(d, dtype=np.float64)
    with np.errstate(divide="ignore", over="ignore"):
        s = np.exp(1.0 / d) - 1.0
    s = np.where(d == 0, 100.0, s)
    return np.minimum(s, 100.0)


def pair_recall(emitted: set, truth: set) -> float:
    """Recall of emitted pairs against a truth pair set."""
    return len(emitted & truth) / len(truth) if truth else 1.0
