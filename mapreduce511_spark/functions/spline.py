"""Pure-numpy not-a-knot cubic spline (P7 parity, no scipy).

The reference smooths chart series with
``scipy.interpolate.make_interp_spline(x, y, k=3)`` then resamples to
300 points and clips (``analyze/analyze_cpu_slowstart.py:84-94``).
``make_interp_spline``'s default boundary condition for k=3 is
**not-a-knot** (third derivative continuous across the second and
penultimate knots), and the not-a-knot C² piecewise-cubic interpolant
of a data set is unique — so solving the classic second-derivative
("moment") system with not-a-knot end rows reproduces scipy's values
to float round-off without importing scipy.

tests/test_spline.py pins the implementation to that uniqueness
argument: knot interpolation, C⁰/C¹/C² continuity, third-derivative
continuity at the not-a-knot joints, and exact reproduction of an
arbitrary cubic polynomial (which a natural-BC spline fails).
"""

from __future__ import annotations

import numpy as np


def notaknot_moments(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Second derivatives M_i of the not-a-knot cubic interpolant.

    Interior rows are the standard tridiagonal moment equations; the
    first/last rows encode S'''-continuity at x_1 and x_{n-2}. The
    system is dense-solved — chart series are O(100..1000) points, far
    below where a banded solver matters."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = len(x)
    if n < 4:
        raise ValueError("not-a-knot cubic needs >= 4 points")
    h = np.diff(x)
    if np.any(h <= 0):
        raise ValueError("x must be strictly increasing")
    A = np.zeros((n, n))
    rhs = np.zeros(n)
    for i in range(1, n - 1):
        A[i, i - 1] = h[i - 1]
        A[i, i] = 2.0 * (h[i - 1] + h[i])
        A[i, i + 1] = h[i]
        rhs[i] = 6.0 * ((y[i + 1] - y[i]) / h[i] - (y[i] - y[i - 1]) / h[i - 1])
    # not-a-knot: (M_1 - M_0)/h_0 == (M_2 - M_1)/h_1 and mirrored
    A[0, 0] = h[1]
    A[0, 1] = -(h[0] + h[1])
    A[0, 2] = h[0]
    A[-1, -3] = h[-1]
    A[-1, -2] = -(h[-2] + h[-1])
    A[-1, -1] = h[-2]
    return np.linalg.solve(A, rhs)


def spline_eval(
    x: np.ndarray, y: np.ndarray, t: np.ndarray, moments: np.ndarray | None = None
) -> np.ndarray:
    """Evaluate the not-a-knot cubic interpolant of (x, y) at t
    (vectorized; t outside [x0, xn] extrapolates the end cubics, same
    as scipy's default)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    t = np.asarray(t, dtype=np.float64)
    M = notaknot_moments(x, y) if moments is None else moments
    h = np.diff(x)
    i = np.clip(np.searchsorted(x, t, side="right") - 1, 0, len(x) - 2)
    hi = h[i]
    dl = x[i + 1] - t  # distance to right knot
    dr = t - x[i]  # distance to left knot
    return (
        M[i] * dl**3 / (6.0 * hi)
        + M[i + 1] * dr**3 / (6.0 * hi)
        + (y[i] - M[i] * hi**2 / 6.0) * dl / hi
        + (y[i + 1] - M[i + 1] * hi**2 / 6.0) * dr / hi
    )


def smooth_resample(
    xs: np.ndarray,
    ys: np.ndarray,
    n_points: int = 300,
    lo: float = 0.0,
    hi: float = 100.0,
) -> tuple[np.ndarray, np.ndarray]:
    """The reference's exact chart-smoothing recipe: cubic spline →
    linspace(min, max, 300) resample → clip to [lo, hi]."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    x_s = np.linspace(xs.min(), xs.max(), n_points)
    y_s = np.clip(spline_eval(xs, ys, x_s), lo, hi)
    return x_s, y_s
