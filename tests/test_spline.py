"""Pins functions/spline.py to scipy's make_interp_spline(k=3).

scipy is absent in this environment, so instead of numeric goldens the
suite asserts the mathematical characterization that makes the
not-a-knot interpolant UNIQUE — any C² piecewise cubic through the
knots with third-derivative continuity at x_1 and x_{n-2} IS the
spline make_interp_spline(k=3) builds. Cubic-polynomial reproduction
is the discriminating case: a natural-BC spline (the plausible wrong
implementation) fails it badly at the boundaries.
"""

from __future__ import annotations

import numpy as np
import pytest

from mapreduce511_spark.functions.spline import (
    notaknot_moments,
    smooth_resample,
    spline_eval,
)


def _series(n=17, seed=7):
    rng = np.random.RandomState(seed)
    x = np.cumsum(rng.uniform(0.5, 2.0, n))
    y = rng.uniform(0, 100, n)
    return x, y


def test_interpolates_knots_exactly():
    x, y = _series()
    np.testing.assert_allclose(spline_eval(x, y, x), y, rtol=0, atol=1e-9)


def test_reproduces_arbitrary_cubic_polynomial():
    """The not-a-knot spline of samples from ANY cubic equals that
    cubic everywhere — scipy's make_interp_spline(k=3) has this
    property; a natural spline does not (its second derivative is
    forced to 0 at the ends)."""
    x, _ = _series(13, seed=3)

    def p(t):
        return 0.3 * t**3 - 2.0 * t**2 + 4.5 * t - 7.0

    t = np.linspace(x.min() - 1.0, x.max() + 1.0, 500)  # incl. extrapolation
    np.testing.assert_allclose(spline_eval(x, p(x), t), p(t), rtol=1e-9, atol=1e-6)


def test_c2_continuity_at_knots():
    x, y = _series()
    M = notaknot_moments(x, y)
    eps = 1e-7
    for xi in x[1:-1]:
        left = spline_eval(x, y, np.array([xi - eps]), M)[0]
        right = spline_eval(x, y, np.array([xi + eps]), M)[0]
        assert abs(left - right) < 1e-4  # C0
        dl = (spline_eval(x, y, np.array([xi]), M)[0] - left) / eps
        dr = (right - spline_eval(x, y, np.array([xi]), M)[0]) / eps
        assert abs(dl - dr) < 1e-2  # C1 (finite-diff tolerance)
    # C2 is what the moment formulation guarantees by construction:
    # both adjacent cubics share M_i as their second derivative at x_i.


def test_third_derivative_continuous_at_notaknot_joints():
    """S''' jump across x_1 and x_{n-2} must vanish: (M_{i+1}-M_i)/h_i
    is the (constant) third derivative of piece i."""
    x, y = _series()
    M = notaknot_moments(x, y)
    h = np.diff(x)
    d3 = np.diff(M) / h
    assert abs(d3[0] - d3[1]) < 1e-8 * max(1.0, abs(d3[0]))
    assert abs(d3[-1] - d3[-2]) < 1e-8 * max(1.0, abs(d3[-1]))


def test_smooth_resample_recipe():
    """300 points, endpoints preserved, clipped to [0, 100]."""
    x, y = _series(25, seed=11)
    y[3] = 99.9  # force possible overshoot near a spike
    xs, ys = smooth_resample(x, y)
    assert len(xs) == len(ys) == 300
    assert xs[0] == pytest.approx(x.min()) and xs[-1] == pytest.approx(x.max())
    assert ys.min() >= 0.0 and ys.max() <= 100.0
    assert ys[0] == pytest.approx(np.clip(y[0], 0, 100), abs=1e-9)
    assert ys[-1] == pytest.approx(np.clip(y[-1], 0, 100), abs=1e-9)


def test_rejects_degenerate_inputs():
    with pytest.raises(ValueError):
        notaknot_moments(np.array([0.0, 1.0, 2.0]), np.array([1.0, 2.0, 3.0]))
    with pytest.raises(ValueError):
        notaknot_moments(np.array([0.0, 0.0, 1.0, 2.0]), np.zeros(4))


def test_driver_and_distributed_paths_agree(spark):
    """plans.charts._smooth (driver) and smooth_series_distributed
    (applyInPandas) produce identical smoothed values for the same
    series."""
    import pandas as pd

    from mapreduce511_spark.plans.charts import _smooth, smooth_series_distributed

    x, y = _series(20, seed=5)
    x = np.round(x, 3)
    pdf = pd.DataFrame(
        {
            "dataset": "1G",
            "slowstart": 0.5,
            "time_step": x,
            "avg_cpu": y,
        }
    )
    sdf = spark.createDataFrame(pdf)
    dist = (
        smooth_series_distributed(sdf, "cpu")
        .orderBy("x")
        .toPandas()
    )
    drv = _smooth("1G", 0.5, list(x), list(y))
    assert drv.smoothed and dist["smoothed"].all()
    np.testing.assert_allclose(dist["x"].to_numpy(), np.array(drv.x), atol=1e-9)
    np.testing.assert_allclose(dist["y"].to_numpy(), np.array(drv.y), atol=1e-9)
