"""Numeric helpers for oracle parity.

``numpy.round`` rounds half-to-even (banker's); DuckDB's ``ROUND`` rounds
half away from zero. Every column compared against a SQL oracle must use
the SQL semantics.
"""

from __future__ import annotations

import numpy as np


def round_half_away(x: np.ndarray, decimals: int) -> np.ndarray:
    """Round half away from zero (DuckDB ROUND semantics)."""
    x = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** decimals
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale


def string_pair_min_max(a, b):
    """Element-wise (min, max) of two string columns, entirely in Arrow
    C++ (``pc.if_else`` on a ``less_equal`` mask) — no ``to_pylist``
    round-trip through numpy object arrays. Matches DuckDB
    LEAST/GREATEST string ordering; used to canonicalize pair-surface
    url columns on every pair query."""
    import pyarrow.compute as pc
    le = pc.less_equal(a, b)
    return pc.if_else(le, a, b), pc.if_else(le, b, a)
