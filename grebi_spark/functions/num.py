"""Shared HALF_UP rounding for the NumPy-vectorized parity paths.

Every Arrow-batched reimplementation of an expression that the oracle
checks must round EXACTLY like ``F.round`` / DuckDB ``round`` — which is
round-half-AWAY-FROM-ZERO: ``floor(x·10^d + 0.5) / 10^d`` for x >= 0 and
the mirrored ``-floor(-x·10^d + 0.5) / 10^d`` for x < 0 (np.round is
half-even and WRONG here). The sign branch matters for negative-capable
call sites (coarse centroid means in kmeans_assign_twolevel, cosines in
_cell_pairs): an exact negative tie must round away from zero like the
oracle, not toward +inf. One helper pair instead of per-closure copies,
so the convention cannot drift between modules; the hash gates exist to
catch exactly that drift. Both are import-by-reference safe inside
pandas_udf closures (the package root rides the workers' PYTHONPATH).
"""

from __future__ import annotations

import math


def half_up(x: float, digits: int = 6) -> float:
    """Scalar half-away-from-zero: matches F.round/DuckDB round for all
    signs (ties on negatives go toward -inf, i.e. away from zero)."""
    s = 10.0 ** digits
    if x >= 0:
        return math.floor(x * s + 0.5) / s
    return -math.floor(-x * s + 0.5) / s


def half_up_np(arr, digits: int = 6):
    """ndarray half-away-from-zero (elementwise), same convention as
    half_up — np.where keeps it a single vectorized pass."""
    import numpy as np

    s = 10.0 ** digits
    scaled = arr * s
    return (
        np.where(scaled >= 0, np.floor(scaled + 0.5), -np.floor(0.5 - scaled))
        / s
    )
