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
