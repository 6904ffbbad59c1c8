"""Tobit upper-limit maximum-likelihood cost (reference minuit_ml.py:
114-191): non-detections enter the Rainbow fit as censored points
-ln Phi((limit - model)/sigma) instead of fake Gaussian measurements.
The headline test injects upper limits into a synthetic curve and shows
the parameters the least-squares treatment provably biases are recovered
by the ML cost."""

import math

import numpy as np
import pytest

from light_curve_python_spark.functions.fits import norm_logcdf
from light_curve_python_spark.functions.rainbow import (
    RAINBOW_PARAM_NAMES,
    rainbow_fit_arrays,
    rainbow_model,
)
from light_curve_python_spark.functions.special import ndtr

WAVES = {"g": 4770e-8, "r": 6231e-8}


def test_norm_logcdf_matches_normal_cdf():
    """Both branches of the reference's piecewise logcdf
    (minuit_ml.py:180-191): erf-based in the body, asymptotic series past
    x < -5 where direct log(Phi) would lose precision."""
    body = np.array([-4.9, -1.0, 0.0, 2.0, 6.0])
    np.testing.assert_allclose(norm_logcdf(body), np.log(ndtr(body)),
                               rtol=1e-8, atol=1e-15)
    tail = np.array([-6.0, -8.0, -12.0])
    # asymptotic branch: agree with the exact value to the series' own
    # accuracy (the reference uses the identical truncation)
    np.testing.assert_allclose(norm_logcdf(tail), np.log(ndtr(tail)),
                               rtol=1e-4)
    # far tail where ndtr underflows to 0: the series must stay finite
    assert np.isfinite(norm_logcdf(np.array([-100.0]))).all()
    # monotone increasing, -> 0 from below on the right
    x = np.linspace(-20, 8, 200)
    v = norm_logcdf(x)
    assert (np.diff(v) > 0).all() and (v < 1e-15).all()


def _censored_curve(seed=3, n=200):
    avg_nu = 2.99792458e10 / float(np.mean(list(WAVES.values())))
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 240, n))
    band = rng.choice(["g", "r"], n)
    wave_cm = np.array([WAVES[b] for b in band])
    flux = rainbow_model(t, wave_cm, avg_nu, 140.0, 8.0, 6.0, 22.0,
                         8000.0, 0.3, 10.0) + 0.2
    sigma = np.full(n, 0.02 * 8.0)
    m = flux + sigma * rng.normal(size=n)
    # survey-like censoring: every epoch below the detection threshold is
    # reported as an upper limit (limit flux 2.0 at 5 sigma)
    mask = flux < 1.0
    m[mask] = 2.0
    sigma[mask] = 0.4
    return t, m, sigma, band, mask


def test_tobit_recovers_params_lsq_biases():
    t, m, s, band, mask = _censored_curve()
    assert 50 < mask.sum() < len(t) - 30  # both row kinds well populated
    names = list(RAINBOW_PARAM_NAMES) + ["baseline_g", "baseline_r",
                                         "r_chisq"]
    lsq = dict(zip(names, rainbow_fit_arrays(t, m, s, band, WAVES)))
    ml = dict(zip(names, rainbow_fit_arrays(t, m, s, band, WAVES,
                                            upper_mask=mask)))
    # least squares treats the limit rows as real flux-2.0 measurements:
    # the baseline is provably pulled toward the limit value...
    assert lsq["baseline_g"] > 1.0 and lsq["baseline_r"] > 1.0
    # ...while the censored likelihood keeps it near the true 0.2
    assert abs(ml["baseline_g"] - 0.2) < 0.4
    assert abs(ml["baseline_r"] - 0.2) < 0.4
    # shape parameters the bias propagates into are recovered by ML
    assert ml["amplitude"] == pytest.approx(8.0, rel=0.15)
    assert abs(lsq["amplitude"] - 8.0) > 0.15 * 8.0
    assert ml["rise_time"] == pytest.approx(6.0, rel=0.25)
    assert ml["reference_time"] == pytest.approx(140.0, abs=3.0)
    # r_chisq keeps the Minuit FCN convention (NLL/dof): censored rows far
    # below their limit contribute ~0, so the ML cost is small
    assert ml["r_chisq"] < 0.5


def test_tobit_noop_without_censoring():
    """An all-False mask must reproduce the plain LSQ fit bit-exactly."""
    t, m, s, band, _ = _censored_curve()
    a = rainbow_fit_arrays(t, m, s, band, WAVES)
    b = rainbow_fit_arrays(t, m, s, band, WAVES,
                           upper_mask=np.zeros(len(t), bool))
    np.testing.assert_array_equal(a, b)


def test_tobit_mask_shape_check():
    t, m, s, band, _ = _censored_curve()
    with pytest.raises(ValueError, match="upper_mask"):
        rainbow_fit_arrays(t, m, s, band, WAVES,
                           upper_mask=np.zeros(3, bool))


def test_tobit_through_spark_operator(spark):
    import pandas as pd
    from light_curve_python_spark.operators.spectral import rainbow_fit
    t, m, s, band, mask = _censored_curve()
    df = spark.createDataFrame(pd.DataFrame(
        {"doc_id": "d0", "t": t, "m": m, "sigma": s, "band": band,
         "is_limit": mask}))
    got = rainbow_fit(df, WAVES, upper_limit_col="is_limit").toPandas()
    assert got["amplitude"].iloc[0] == pytest.approx(8.0, rel=0.15)
    assert abs(got["baseline_r"].iloc[0] - 0.2) < 0.4
    # without the column the same data gives the biased LSQ answer
    biased = rainbow_fit(df, WAVES).toPandas()
    assert biased["baseline_r"].iloc[0] > 1.0
