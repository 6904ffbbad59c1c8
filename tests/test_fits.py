"""Parametric fit kernels: parameter recovery on synthetic curves with known
truth (the reference's own BazinFit test strategy —
tests/test_w_bench.py:303-340 generates a noisy Bazin curve and asserts
recovered params at rtol 1e-3)."""

import numpy as np
import pytest

import light_curve_python_spark.functions.fits as FT
from light_curve_python_spark.functions.kernels import (
    evaluate_kernel,
    make_kernel,
)


def _noisy(model, params, n=300, noise=0.02, seed=0, t_range=(0, 100)):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(*t_range, n))
    clean = model(t, *params)
    amp = clean.max() - clean.min()
    sigma = np.full(n, noise * amp)
    m = clean + sigma * rng.normal(size=n)
    return t, m, sigma


def test_bazin_fit_recovers_params():
    truth = (100.0, 100.0, 50.0, 10.0, 20.0)  # a, b, t0, rise, fall
    t, m, s = _noisy(FT.bazin_model, truth)
    k = make_kernel("bazin_fit")
    out = evaluate_kernel(k, t, m, s, fill_value=None)
    got = dict(zip(k.names, out))
    for name, want in zip(("a", "b", "t0", "rise", "fall"), truth):
        assert got[f"bazin_fit_{name}"] == pytest.approx(want, rel=0.05), name
    # good fit: reduced chi2 ~ 1
    assert 0.5 < got["bazin_fit_reduced_chi2"] < 2.0


def test_bazin_fit_with_explicit_init():
    truth = (50.0, 10.0, 40.0, 5.0, 15.0)
    t, m, s = _noisy(FT.bazin_model, truth, seed=3)
    k = make_kernel("bazin_fit", init=[60.0, 5.0, 45.0, 8.0, 10.0])
    out = evaluate_kernel(k, t, m, s, fill_value=None)
    assert out[0] == pytest.approx(50.0, rel=0.05)


def test_villar_fit_recovers_params():
    # a, b, t0, gamma, beta, tau_rise, tau_fall
    truth = (80.0, 20.0, 30.0, 25.0, 0.01, 3.0, 15.0)
    t, m, s = _noisy(FT.villar_model, truth, n=500, noise=0.01)
    k = make_kernel("villar_fit")
    out = evaluate_kernel(k, t, m, s, fill_value=None)
    got = dict(zip(k.names, out))
    assert got["villar_fit_a"] == pytest.approx(80.0, rel=0.1)
    assert got["villar_fit_t0"] == pytest.approx(30.0, abs=2.0)
    assert got["villar_fit_gamma"] == pytest.approx(25.0, rel=0.2)
    assert got["villar_fit_reduced_chi2"] < 3.0


def test_linexp_fit_recovers_params():
    truth = (5.0, 10.0, 10.0, 20.0)  # a, b, t0, fall
    t, m, s = _noisy(FT.linexp_model, truth, n=400, noise=0.01,
                     t_range=(10, 150))
    k = make_kernel("linexp_fit")
    out = evaluate_kernel(k, t, m, s, fill_value=None)
    got = dict(zip(k.names, out))
    assert got["linexp_fit_a"] == pytest.approx(5.0, rel=0.1)
    assert got["linexp_fit_fall"] == pytest.approx(20.0, rel=0.1)
    assert got["linexp_fit_reduced_chi2"] < 3.0


def test_fit_fill_value_on_insufficient_points():
    k = make_kernel("bazin_fit")
    t = np.arange(4, dtype=float)
    out = evaluate_kernel(k, t, t, np.ones(4), fill_value=-1.0)
    assert (out == -1.0).all()


def test_lm_on_linear_problem_exact():
    """LM must solve an exactly-linear least squares to machine precision."""
    rng = np.random.default_rng(1)
    t = np.sort(rng.uniform(0, 10, 50))
    m = 3.0 * t + 7.0
    w = np.ones(50)

    def lin(t, a, b):
        return a * t + b

    p, chi2 = FT.levenberg_marquardt(
        lin, t, m, w, np.array([1.0, 0.0]),
        np.array([-1e9, -1e9]), np.array([1e9, 1e9]))
    np.testing.assert_allclose(p, [3.0, 7.0], rtol=1e-6)
    assert chi2 < 1e-10


def test_spark_extract_with_fit(spark):
    """Fit kernels run through the grouped extractor."""
    import pandas as pd
    truth = (100.0, 100.0, 50.0, 10.0, 20.0)
    frames = []
    for e in range(4):
        t, m, s = _noisy(FT.bazin_model, truth, seed=e)
        frames.append(pd.DataFrame(
            {"doc_id": f"e{e}", "t": t, "m": m, "sigma": s}))
    df = spark.createDataFrame(pd.concat(frames, ignore_index=True))
    from light_curve_python_spark.operators.extract import FeatureExtractor
    ex = FeatureExtractor(["bazin_fit"])
    got = ex.extract(df, band_col=None).toPandas()
    assert len(got) == 4
    np.testing.assert_allclose(got["bazin_fit_t0"].to_numpy(),
                               [50.0] * 4, rtol=0.05)
