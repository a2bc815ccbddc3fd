"""Shared HALF_UP rounding for the NumPy-vectorized parity paths.

Every Arrow-batched reimplementation of an expression that the oracle
checks must round EXACTLY like ``F.round`` / DuckDB ``round`` — which,
for the non-negative distances/similarities these paths round, is
``floor(x·10^d + 0.5) / 10^d`` (np.round is half-even and WRONG here).
One helper pair instead of per-closure copies, so the convention cannot
drift between modules; the hash gates exist to catch exactly that
drift. Both are import-by-reference safe inside pandas_udf closures
(the package root rides the workers' PYTHONPATH).
"""

from __future__ import annotations

import math


def half_up(x: float, digits: int = 6) -> float:
    """Scalar HALF_UP: matches F.round/DuckDB round for x >= 0."""
    s = 10.0 ** digits
    return math.floor(x * s + 0.5) / s


def half_up_np(arr, digits: int = 6):
    """ndarray HALF_UP (elementwise), same convention as half_up."""
    import numpy as np

    s = 10.0 ** digits
    return np.floor(arr * s + 0.5) / s
