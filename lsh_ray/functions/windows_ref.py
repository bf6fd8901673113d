"""Reference-conformant sequence windowing (PLSH / NLSH shinglers).

Re-implements, from the reference's published formulas, the two window
extractions the reference applies to pitch sequences — the engine's proof
that it supports multiple shingle configurations per corpus (SURVEY.md
§2.2 M1/M2):

- **PLSH** (``lsh.py:40-65``): windows of ``WINDOW_LENGTH=60`` starting
  every ``WINDOW_SHIFT=15``, each window subsampled at
  ``EXTRACTING_INTERVAL=2`` (30-d vectors).
- **NLSH** (``lsh.py:68-121``): values longer than ``MAX_LENGTH=10`` are
  split into ceil(len/10) equal-ish repeats first, then dense windows of
  ``WINDOW_LENGTH=10`` with shift 1.

Windows are hashed with the same polynomial/splitmix fingerprint as text
shingles, so the downstream MinHash/banding machinery is identical — a
``sequences`` table (doc_id, values list<float>) runs through the same
pipeline as text documents.
"""

from __future__ import annotations

import numpy as np

from lsh_ray.functions.hashing import _P1, splitmix64

PLSH_WINDOW = 60
PLSH_SHIFT = 15
PLSH_INTERVAL = 2
NLSH_WINDOW = 10
NLSH_SHIFT = 1
NLSH_MAX_LEN = 10


def plsh_windows(values: np.ndarray,
                 window: int = PLSH_WINDOW,
                 shift: int = PLSH_SHIFT,
                 interval: int = PLSH_INTERVAL) -> list[np.ndarray]:
    """Overlapping subsampled windows (reference lsh.py:46-65 semantics):
    floor(len/shift) windows starting every ``shift``, INCLUDING truncated
    tail windows — e.g. len=120 yields 8 windows, the last 3 shorter."""
    v = np.asarray(values)
    out = []
    start = 0
    for _ in range(len(v) // shift):
        w = v[start:start + window:interval]
        if len(w):
            out.append(w)
        start += shift
    return out


def nlsh_expand(values: np.ndarray, durations: np.ndarray | None,
                max_len: int = NLSH_MAX_LEN) -> np.ndarray:
    """Duration-aware expansion: long notes split (reference lsh.py:87-105
    semantics — a value with duration d contributes ceil(d) <= max_len
    repeats)."""
    v = np.asarray(values)
    if durations is None:
        return v
    reps = np.clip(np.ceil(np.nan_to_num(
        np.asarray(durations, dtype=np.float64), nan=1.0)), 1,
        max_len).astype(np.int64)
    return np.repeat(v, reps)


def nlsh_windows(values: np.ndarray, durations: np.ndarray | None = None,
                 window: int = NLSH_WINDOW,
                 shift: int = NLSH_SHIFT) -> list[np.ndarray]:
    """Dense fine-grained windows (reference lsh.py:77-79, 111-116)."""
    v = nlsh_expand(values, durations)
    return [v[s:s + window] for s in range(0, len(v) - window + 1, shift)]


def hash_windows(windows: list[np.ndarray]) -> np.ndarray:
    """Windows -> sorted-unique uint64 fingerprints (set semantics, like
    the binary term-document matrix, lsh.py:196-206)."""
    if not windows:
        return np.empty(0, dtype=np.uint64)
    out = np.empty(len(windows), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, w in enumerate(windows):
            h = np.uint64(0)
            # quantize floats to centi-units so float noise cannot split keys
            q = np.round(np.asarray(w, dtype=np.float64) * 100).astype(np.int64)
            for x in q.astype(np.uint64):
                h = h * _P1 + x
            out[i] = h
    return np.unique(splitmix64(out))


def sequence_shingles(values, durations=None, scheme: str = "plsh"
                      ) -> np.ndarray:
    """One sequence -> shingle-hash set under the named scheme.

    The scheme registry mirrors the reference's index-type dispatch
    (``lsh.py:171-174``).
    """
    if scheme == "plsh":
        return hash_windows(plsh_windows(values))
    if scheme == "nlsh":
        return hash_windows(nlsh_windows(values, durations))
    raise ValueError(f"unknown scheme {scheme!r}")
