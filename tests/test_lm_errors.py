"""HESSE-style parameter errors (fits.lm_errors): exact on linear
problems, statistically calibrated (unit pulls) on the Rainbow fixture —
the reference's Migrad/HESSE error-output contract re-derived as the
Gauss-Newton inverse Hessian at the LM optimum."""

import numpy as np
import pytest

from light_curve_python_spark.functions.fits import (
    LnPrior,
    levenberg_marquardt,
    lm_errors,
)
from light_curve_python_spark.functions.rainbow import (
    RAINBOW_PARAM_NAMES,
    rainbow_fit_arrays,
    rainbow_model,
)

WAVES = {"g": 4770e-8, "r": 6231e-8}


def test_lm_errors_exact_on_linear_problem():
    """Weighted straight line: the Gauss-Newton Hessian is the exact
    Hessian, so the errors must equal the closed-form normal-equation
    covariance."""
    rng = np.random.default_rng(2)
    t = np.sort(rng.uniform(0, 10, 80))
    sigma = rng.uniform(0.05, 0.3, 80)
    w = sigma ** -2.0
    m = 3.0 * t + 7.0 + sigma * rng.normal(size=80)

    def lin(t, a, b):
        return a * t + b

    p, _ = levenberg_marquardt(lin, t, m, w, np.array([1.0, 0.0]),
                               np.array([-1e9, -1e9]),
                               np.array([1e9, 1e9]))
    got = lm_errors(lin, t, m, w, p)
    H = np.array([[np.sum(w * t * t), np.sum(w * t)],
                  [np.sum(w * t), np.sum(w)]])
    want = np.sqrt(np.diag(np.linalg.inv(H)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_lm_errors_prior_curvature_shrinks():
    """A tight Gaussian prior adds curvature: the error on that parameter
    must shrink to ~the prior sigma, others stay data-dominated."""
    rng = np.random.default_rng(3)
    t = np.sort(rng.uniform(0, 10, 60))
    w = np.full(60, 1.0 / 0.2 ** 2)
    m = 2.0 * t + 1.0 + 0.2 * rng.normal(size=60)

    def lin(t, a, b):
        return a * t + b

    p = np.array([2.0, 1.0])
    free = lm_errors(lin, t, m, w, p)
    tight = [LnPrior.none(), LnPrior.normal(1.0, 1e-3)]
    pinned = lm_errors(lin, t, m, w, p, ln_priors=tight)
    assert pinned[1] == pytest.approx(1e-3, rel=0.05)
    assert pinned[0] <= free[0]          # never worse with information
    assert free[1] > 10 * pinned[1]


def test_lm_errors_flat_direction_is_inf():
    def flatmodel(t, a, b):
        return a * t + 0.0 * b

    t = np.linspace(0, 1, 20)
    got = lm_errors(flatmodel, t, t, np.ones(20), np.array([1.0, 5.0]))
    assert np.isfinite(got[0]) and np.isinf(got[1])


def test_rainbow_error_pulls_are_calibrated():
    """Over noise realizations of the convergent fixture, the pull
    (fit - truth)/err must be ~N(0,1) per parameter: std in [0.5, 2],
    |mean| < 0.75 (16 realizations; the r2/r3 experiment over 24 measured
    stds 0.94-1.40)."""
    avg_nu = 2.99792458e10 / float(np.mean(list(WAVES.values())))
    tv = [60.0, 8.0, 5.0, 20.0, 8000.0, 0.3, 10.0, 0.5, 0.2]
    names = list(RAINBOW_PARAM_NAMES) + ["baseline_g", "baseline_r"]
    pulls = {n: [] for n in names}
    for rep in range(16):
        rng = np.random.default_rng(1000 + rep)
        n = 160
        t = np.sort(rng.uniform(0, 200, n))
        band = rng.choice(["g", "r"], n)
        wave_cm = np.array([WAVES[b] for b in band])
        flux = rainbow_model(t, wave_cm, avg_nu, *tv[:7]) \
            + np.where(band == "g", 0.5, 0.2)
        sigma = np.full(n, 0.02 * flux.max())
        m = flux + sigma * rng.normal(size=n)
        out = rainbow_fit_arrays(t, m, sigma, band, WAVES,
                                 with_errors=True)
        npar = len(names)
        vals, errs = out[:npar], out[npar:2 * npar]
        assert np.all(np.isfinite(errs)) and np.all(errs > 0)
        for i, nm in enumerate(names):
            pulls[nm].append((vals[i] - tv[i]) / errs[i])
    for nm, ps in pulls.items():
        ps = np.asarray(ps)
        assert 0.5 < ps.std(ddof=1) < 2.0, (nm, ps.std(ddof=1))
        assert abs(ps.mean()) < 0.75, (nm, ps.mean())


def test_rainbow_errors_through_spark_operator(spark):
    import pandas as pd
    avg_nu = 2.99792458e10 / float(np.mean(list(WAVES.values())))
    rng = np.random.default_rng(5)
    n = 160
    t = np.sort(rng.uniform(0, 200, n))
    band = rng.choice(["g", "r"], n)
    wave_cm = np.array([WAVES[b] for b in band])
    flux = rainbow_model(t, wave_cm, avg_nu, 60.0, 8.0, 5.0, 20.0,
                         8000.0, 0.3, 10.0) + 0.3
    sigma = np.full(n, 0.02 * flux.max())
    m = flux + sigma * rng.normal(size=n)
    from light_curve_python_spark.operators.spectral import rainbow_fit
    df = spark.createDataFrame(pd.DataFrame(
        {"doc_id": "d0", "t": t, "m": m, "sigma": sigma, "band": band}))
    got = rainbow_fit(df, WAVES, with_errors=True).toPandas()
    for nm in list(RAINBOW_PARAM_NAMES) + ["baseline_g", "baseline_r"]:
        assert f"{nm}_err" in got.columns
        assert got[f"{nm}_err"].iloc[0] > 0
    # errors come BEFORE r_chisq, matching the array contract
    assert list(got.columns)[-1] == "r_chisq"
    # sanity: T error is a small fraction of T on this well-sampled curve
    assert got["T_err"].iloc[0] < 0.2 * got["T"].iloc[0]


def test_missing_band_keeps_row_with_inf_error(spark):
    """An entity observed in only one configured band: the fit converges
    (the absent band's baseline is pinned), its error is legitimately
    +inf — the row must survive, not fall to fill_value (round-3 review
    finding)."""
    import pandas as pd
    from light_curve_python_spark.operators.spectral import rainbow_fit
    avg_nu = 2.99792458e10 / float(np.mean(list(WAVES.values())))
    rng = np.random.default_rng(6)
    n = 160
    t = np.sort(rng.uniform(0, 200, n))
    band = np.full(n, "g")
    wave_cm = np.full(n, WAVES["g"])
    flux = rainbow_model(t, wave_cm, avg_nu, 60.0, 8.0, 5.0, 20.0,
                         8000.0, 0.3, 10.0) + 0.3
    sigma = np.full(n, 0.02 * flux.max())
    m = flux + sigma * rng.normal(size=n)
    df = spark.createDataFrame(pd.DataFrame(
        {"doc_id": "d0", "t": t, "m": m, "sigma": sigma, "band": band}))
    got = rainbow_fit(df, WAVES, with_errors=True).toPandas()
    assert np.isfinite(got["amplitude"].iloc[0])       # fit survived
    assert got["r_chisq"].iloc[0] < 2.0
    assert np.isinf(got["baseline_r_err"].iloc[0])     # unconstrained
    assert np.isfinite(got["baseline_g_err"].iloc[0])
