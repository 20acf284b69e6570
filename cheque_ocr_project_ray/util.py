"""Small shared utilities."""

from __future__ import annotations

import numpy as np


def round_half_up(x, digits: int = 4):
    """Round half AWAY from zero — DuckDB's round() semantics.

    numpy/pandas round half-to-even (banker's), which disagrees with
    SQL on exact halves (e.g. 1/32 = 0.03125 → 0.0312 vs 0.0313).
    Ratio columns with power-of-two denominators hit this constantly,
    so every Ray-side division that is compared against a DuckDB
    oracle goes through this helper.
    """
    arr = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** digits
    return np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale
