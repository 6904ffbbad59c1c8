"""Reference-shaped single-curve API façade (light_curve_python_spark.compat):
call contract, normalization, bands, fills, meta-features, Spark bridge."""

import numpy as np
import pytest

from light_curve_python_spark import compat as lc
from light_curve_python_spark.functions.kernels import (evaluate_kernel,
                                                        make_kernel)

REFERENCE_NAMES = """Amplitude AndersonDarlingNormal BazinFit BeyondNStd
Chi2Pvar Cusum Duration Eta EtaE ExcessVariance InterPercentileRange
Kurtosis LaflerKinmanStringLength LinearFit LinearTrend LinexpFit
MagnitudePercentageRatio MaximumSlope MaximumTimeInterval Mean MeanVariance
Median MedianAbsoluteDeviation MedianBufferRangePercentage
MinimumTimeInterval ObservationCount OtsuSplit PercentAmplitude
PercentDifferenceMagnitudePercentile Periodogram ReducedChi2 Roms Skew
StandardDeviation StetsonK TimeMean TimeStandardDeviation VillarFit
WeightedMean FluxNNotDetBeforeFd MagnitudeNNotDetBeforeFd PeakToPeakVar
Extractor DmDt Bins RainbowFit ColorOfMaximum ColorOfMedian
ColorOfMinimum ColorSpread""".split()


@pytest.fixture()
def curve():
    rng = np.random.default_rng(11)
    t = np.sort(rng.uniform(0, 10, 80))
    m = np.sin(t) + 0.05 * rng.normal(size=80)
    sigma = np.full(80, 0.05)
    return t, m, sigma


def test_every_reference_name_exists():
    missing = [n for n in REFERENCE_NAMES if not hasattr(lc, n)]
    assert not missing, missing


def test_call_matches_kernel(curve):
    t, m, sigma = curve
    cases = [(lc.Amplitude(), "amplitude", {}),
             (lc.BeyondNStd(2.0), "beyond_n_std", {"nstd": 2.0}),
             (lc.InterPercentileRange(0.1), "inter_percentile_range",
              {"quantile": 0.1}),
             (lc.StetsonK(), "stetson_k", {})]
    for feat, key, params in cases:
        want = evaluate_kernel(make_kernel(key, **params), t, m, sigma)
        got = feat(t, m, sigma)
        np.testing.assert_allclose(np.atleast_1d(got), want)


def test_scalar_for_size_one(curve):
    t, m, sigma = curve
    assert isinstance(lc.Mean()(t, m), float)
    out = lc.OtsuSplit()(t, m)          # 4 outputs -> array
    assert isinstance(out, np.ndarray) and out.shape == (4,)


def test_normalization_contract(curve):
    t, m, sigma = curve
    # sorted=None on unsorted input raises (the reference contract)
    rt = t[::-1].copy()
    with pytest.raises(ValueError, match="sorted"):
        lc.Mean()(rt, m)
    # duplicate t raises
    tt = t.copy()
    tt[1] = tt[0]
    with pytest.raises(ValueError, match="unique"):
        lc.Mean()(tt, m)
    # sorted=False argsorts — order-sensitive feature agrees under an
    # arbitrary permutation, not just reversal
    rng = np.random.default_rng(0)
    perm = rng.permutation(len(t))
    assert lc.Eta()(t[perm], m[perm], sorted=False) == \
        pytest.approx(lc.Eta()(t, m))
    # check=True rejects non-finite
    bad = m.copy()
    bad[3] = np.nan
    with pytest.raises(ValueError, match="finite"):
        lc.Mean()(t, bad)


def test_fill_value_contract(curve):
    t, m, sigma = curve
    # two observations: kurtosis (min_obs 4) fills instead of raising
    f = lc.Kurtosis()
    with pytest.raises(Exception):
        f(t[:2], m[:2])
    assert f(t[:2], m[:2], fill_value=-1.0) == -1.0


def test_bands_evaluation(curve):
    t, m, sigma = curve
    band = np.where(np.arange(len(t)) % 2 == 0, "g", "r")
    f = lc.Mean(bands=["g", "r"])
    assert f.names == ("mean_g", "mean_r")
    out = f(t, m, sigma, band)
    np.testing.assert_allclose(
        out, [m[band == "g"].mean(), m[band == "r"].mean()])
    with pytest.raises(ValueError, match="band is required"):
        f(t, m, sigma)


def test_extractor_and_many(curve):
    t, m, sigma = curve
    ex = lc.Extractor(lc.Amplitude(), lc.BeyondNStd(1.5), lc.OtsuSplit())
    out = ex(t, m, sigma)
    assert out.shape == (ex.size,) == (6,)
    stacked = ex.many([(t, m, sigma), (t, 2 * m, sigma)])
    assert stacked.shape == (2, 6)
    np.testing.assert_allclose(stacked[0], out)


def test_to_spark_bridge(spark, curve):
    from light_curve_python_spark.operators.extract import FeatureExtractor
    t, m, sigma = curve
    ex = lc.Extractor(lc.Amplitude(), lc.BeyondNStd(1.5))
    fe = FeatureExtractor(ex.to_spark())
    import pandas as pd
    df = spark.createDataFrame(pd.DataFrame(
        {"doc_id": "x", "t": t, "m": m, "sigma": sigma}))
    row = fe.extract(df).toPandas().iloc[0]
    want = ex(t, m, sigma)
    np.testing.assert_allclose(
        [row["amplitude"], row["beyond_1.5_std"]], want, rtol=1e-12)


def test_dmdt_compat(curve):
    t, m, sigma = curve
    from light_curve_python_spark.operators.dmdt import (count_dt_kernel,
                                                         dmdt_points_kernel,
                                                         normalize_dmdt)
    d = lc.DmDt.from_borders(-1.0, 1.0, 6, 2.0, 8, norm=("dt",))
    raw = dmdt_points_kernel(t, m, d.dt_edges, d.dm_edges)
    want = normalize_dmdt(raw, ("dt",),
                          dt_counts=count_dt_kernel(t, d.dt_edges))
    np.testing.assert_allclose(d.points(t, m), want)
    g = d.gausses(t, m, sigma)
    assert g.shape == (6, 8)
    assert d.points_many([(t, m), (t, m)]).shape == (2, 6, 8)


def test_bins_compat(curve):
    t, m, sigma = curve
    b = lc.Bins([lc.Mean(), lc.ObservationCount()], window=2.0)
    out = b(t, m, sigma)
    # manual rebin of the first window [0, 2)
    mask = t < 2.0
    w = sigma[mask] ** -2.0
    # mean of binned m values: recompute all bins
    k = np.floor(t / 2.0).astype(int)
    bm = [np.average(m[k == i], weights=sigma[k == i] ** -2.0)
          for i in np.unique(k)]
    assert out[0] == pytest.approx(np.mean(bm))
    assert out[1] == len(np.unique(k))


def test_repr_and_params():
    f = lc.BeyondNStd(2.0)
    assert "2.0" in repr(f)
    assert f.to_spark() == ("beyond_n_std", {"nstd": 2.0})
    assert lc.Amplitude().to_spark() == "amplitude"


def test_fit_class_reference_ctor_shape():
    # reference shape: Fit(algorithm, *, kwargs) — features.rs:3096-3110
    f = lc.BazinFit("mcmc-lmsder", mcmc_niter=64, lmsder_niter=10)
    assert f.algorithm == "mcmc-lmsder"
    assert f.names[-1] == "bazin_fit_reduced_chi2"
    with pytest.raises(ValueError, match="transform"):
        lc.BazinFit("mcmc", transform="arcsinh")
    with pytest.raises(ValueError, match="algorithm"):
        lc.BazinFit("")


def test_fit_recovers_truth():
    from light_curve_python_spark.functions.fits import bazin_model
    t = np.linspace(-20.0, 60.0, 120)
    truth = dict(a=120.0, b=10.0, t0=5.0, rise=5.0, fall=20.0)
    m = bazin_model(t, **truth)
    rng = np.random.default_rng(4)
    sigma = np.full_like(t, 0.5)
    f = lc.BazinFit("lmsder")
    out = f(t, m + rng.normal(0, 0.5, len(t)), sigma)
    got = dict(zip(("a", "b", "t0", "rise", "fall"), out[:5]))
    assert got["a"] == pytest.approx(truth["a"], rel=0.1)
    assert got["t0"] == pytest.approx(truth["t0"], abs=1.0)


def test_transform_argument(curve):
    t, m, sigma = curve
    base = lc.Kurtosis()(t, m)
    # explicit name
    assert lc.Kurtosis(transform="arcsinh")(t, m) == \
        pytest.approx(np.arcsinh(base))
    # True / 'default' pick the stock transformer (arcsinh for kurtosis,
    # identity for mean — transforms.py DEFAULT_TRANSFORMS)
    assert lc.Kurtosis(transform=True)(t, m) == \
        pytest.approx(np.arcsinh(base))
    assert lc.Mean(transform="default")(t, m) == \
        pytest.approx(lc.Mean()(t, m))
    with pytest.raises(ValueError, match="Unknown transformation"):
        lc.Mean(transform="nope")
    # fill value is NOT transformed (fill wraps the transformed
    # evaluator in the reference)
    assert lc.Kurtosis(transform="arcsinh")(
        t[:2], m[:2], fill_value=-7.0) == -7.0


def test_dmdt_batches(curve):
    t, m, sigma = curve
    d = lc.DmDt.from_borders(-1.0, 1.0, 4, 2.0, 4)
    lcs = [(t, m), (t, 2 * m), (t[:40], m[:40])]
    batches = list(d.points_batches(lcs, batch_size=2))
    assert [b.shape for b in batches] == [(2, 4, 4), (1, 4, 4)]
    np.testing.assert_array_equal(batches[0][0], d.points(t, m))
    # seeded shuffle + yield_index are deterministic
    a = list(d.points_batches(lcs, batch_size=3, shuffle=True,
                              yield_index=True, random_seed=5))
    b = list(d.points_batches(lcs, batch_size=3, shuffle=True,
                              yield_index=True, random_seed=5))
    np.testing.assert_array_equal(a[0][0], b[0][0])
    assert sorted(a[0][0]) == [0, 1, 2]
    # erosion: fewer pairs than the full map, deterministic under seed
    full = d.points(t, m).sum()
    e1 = list(d.points_batches([(t, m)], drop_nobs=0.5, random_seed=1))
    e2 = list(d.points_batches([(t, m)], drop_nobs=0.5, random_seed=1))
    np.testing.assert_array_equal(e1[0], e2[0])
    assert e1[0].sum() < full
    # validation mirrors the reference (dmdt.rs:476-520)
    with pytest.raises(ValueError, match=r"\[0\.0, 1\.0\)"):
        list(d.points_batches(lcs, drop_nobs=1.5))
    with pytest.raises(ValueError, match="cannot drop"):
        list(d.points_batches([(t[:3], m[:3])], drop_nobs=3))
    # gausses variant
    g = list(d.gausses_batches([(t, m, sigma)], batch_size=1))
    np.testing.assert_array_equal(g[0][0], d.gausses(t, m, sigma))
    # reference defaults: batch_size=1, and the return value is a
    # REUSABLE iterable (dmdt.rs:851-854) — a second epoch re-yields
    it = d.points_batches(lcs)
    assert [b.shape for b in it] == [(1, 4, 4)] * 3
    assert len(list(it)) == 3
    # numpy ints count observations (not fractions); negatives rejected
    a = list(d.points_batches([(t, m)], drop_nobs=2, random_seed=3))
    b = list(d.points_batches([(t, m)], drop_nobs=np.int64(2),
                              random_seed=3))
    np.testing.assert_array_equal(a[0], b[0])
    with pytest.raises(ValueError, match="non-negative"):
        d.points_batches(lcs, drop_nobs=-1)


def test_review_fixes_compat(curve):
    t, m, sigma = curve
    # extra positional args raise instead of being silently dropped
    with pytest.raises(TypeError, match="positional"):
        lc.BeyondNStd(2.0, 99.0)
    with pytest.raises(TypeError, match="positional"):
        lc.Amplitude(123)
    # fit iteration knobs steer the LM budget
    f = lc.BazinFit("mcmc-lmsder", mcmc_niter=7, lmsder_niter=12)
    assert f._params["max_iter"] == 12
    # DmDt.count_dt validates/normalizes like points
    d = lc.DmDt.from_borders(-1.0, 1.0, 4, 2.0, 4)
    np.testing.assert_array_equal(
        d.count_dt(t[::-1], sorted=False), d.count_dt(t))
    with pytest.raises(ValueError, match="sorted"):
        d.count_dt(t[::-1])
    # unknown norm values rejected
    with pytest.raises(ValueError, match="unknown norm"):
        lc.DmDt.from_borders(-1.0, 1.0, 4, 2.0, 4, norm=("lgdt",))
    # drop_nobs range validated at the call, not first iteration
    with pytest.raises(ValueError, match=r"\[0\.0, 1\.0\)"):
        d.points_batches([(t, m)], drop_nobs=1.5)
    # Bins inside Extractor: many works, to_spark errors with guidance
    ex = lc.Extractor(lc.Mean(), lc.Bins([lc.Mean()], window=2.0))
    assert ex.many([(t, m, sigma)]).shape == (1, 2)
    with pytest.raises(NotImplementedError, match="bin_series"):
        ex.to_spark()


def test_rainbow_fill_length_matches_success():
    from light_curve_python_spark.functions.fits import bazin_model
    waves = {"g": 4.8e-5, "r": 6.2e-5}
    rf = lc.RainbowFit(waves)
    rng = np.random.default_rng(2)
    t = np.sort(rng.uniform(0, 60, 120))
    band = np.where(np.arange(120) % 2 == 0, "g", "r")
    m = bazin_model(t, 100.0, 5.0, 25.0, 4.0, 18.0) + \
        rng.normal(0, 0.5, 120)
    sigma = np.full(120, 0.5)
    ok = rf(t, m, sigma, band)
    filled = rf(t[:3], m[:3], sigma[:3], band[:3], fill_value=np.nan)
    assert len(ok) == len(filled) == rf.size
    rf_err = lc.RainbowFit(waves, with_errors=True)
    filled_e = rf_err(t[:3], m[:3], sigma[:3], band[:3],
                      fill_value=np.nan)
    assert len(filled_e) == rf_err.size == 2 * (len(ok) - 1) + 1


def test_rainbow_upper_mask_call_arg():
    """upper_mask at call time (the reference's censored-point contract):
    censoring the faint tail must change the fit relative to treating
    the limits as detections."""
    from light_curve_python_spark.functions.fits import bazin_model
    waves = {"g": 4.8e-5, "r": 6.2e-5}
    rng = np.random.default_rng(7)
    t = np.sort(rng.uniform(0, 60, 100))
    band = np.where(np.arange(100) % 2 == 0, "g", "r")
    m = bazin_model(t, 100.0, 5.0, 25.0, 4.0, 18.0) + \
        rng.normal(0, 0.5, 100)
    sigma = np.full(100, 0.5)
    mask = m < 10.0
    m_cens = np.where(mask, 10.0, m)  # upper limits at the detection floor
    rf = lc.RainbowFit(waves)
    det = rf(t, m_cens, sigma, band)
    cens = rf(t, m_cens, sigma, band, upper_mask=mask)
    assert len(det) == len(cens) == rf.size
    assert not np.allclose(det, cens)


def test_color_features(curve):
    t, m, sigma = curve
    band = np.where(np.arange(len(t)) % 2 == 0, "g", "r")
    g, r = m[band == "g"], m[band == "r"]
    assert lc.ColorOfMaximum(["g", "r"])(t, m, sigma, band) == \
        pytest.approx(g.max() - r.max())
    assert lc.ColorOfMedian(["g", "r"])(t, m, sigma, band) == \
        pytest.approx(np.median(g) - np.median(r))
    assert lc.ColorOfMinimum(["r", "g"])(t, m, sigma, band) == \
        pytest.approx(r.min() - g.min())
    # spread: population std of the per-band inverse-variance means
    wg = np.average(g, weights=sigma[band == "g"] ** -2.0)
    wr = np.average(r, weights=sigma[band == "r"] ** -2.0)
    assert lc.ColorSpread(["g", "r"])(t, m, sigma, band) == \
        pytest.approx(np.std([wg, wr]))
    # contract guards mirror the reference ctor (features.rs:3768-3771)
    with pytest.raises(ValueError, match="2 passbands"):
        lc.ColorOfMaximum(["g"])
    with pytest.raises(ValueError, match="at least 2"):
        lc.ColorSpread(["g"])
    with pytest.raises(ValueError, match="band is required"):
        lc.ColorOfMaximum(["g", "r"])(t, m, sigma)
    # a band absent from the data fills instead of raising
    assert lc.ColorOfMaximum(["g", "z"])(t, m, sigma, band,
                                         fill_value=-9.0) == -9.0
    # transform rejected like the reference (features.rs __new__)
    with pytest.raises(NotImplementedError, match="transform"):
        lc.ColorOfMaximum(["g", "r"], transform="arcsinh")
    # missing sigma is a usage error, not a fillable evaluation failure
    with pytest.raises(ValueError, match="requires sigma"):
        lc.ColorSpread(["g", "r"])(t, m, None, band, fill_value=-9.0)
    # to_spark errors with guidance instead of AttributeError
    with pytest.raises(NotImplementedError, match="color_features_sql"):
        lc.Extractor(lc.ColorOfMaximum(["g", "r"])).to_spark()


def test_pickle_and_json_roundtrip(curve):
    import pickle
    t, m, sigma = curve
    feats = [lc.Amplitude(), lc.BeyondNStd(2.0, transform="arcsinh"),
             lc.Mean(bands=["g", "r"]), lc.BazinFit("mcmc", max_iter=50)]
    band = np.where(np.arange(len(t)) % 2 == 0, "g", "r")
    for f in feats:
        g = pickle.loads(pickle.dumps(f))
        kw = {"band": band} if f.is_band_required else {}
        np.testing.assert_array_equal(
            np.atleast_1d(f(t, m, sigma, fill_value=np.nan, **kw)),
            np.atleast_1d(g(t, m, sigma, fill_value=np.nan, **kw)))
    assert pickle.loads(pickle.dumps(lc.BazinFit("mcmc"))).algorithm == \
        "mcmc"
    ex = pickle.loads(pickle.dumps(lc.Extractor(lc.Mean(), lc.Skew())))
    assert ex.names == ("mean", "skew")
    # JSON spec round trip (engine format, feature_from_json inverse)
    f = lc.BeyondNStd(1.5, transform="lg")
    g = lc.feature_from_json(f.to_json())
    assert g(t, np.abs(m) + 1.0) == pytest.approx(
        f(t, np.abs(m) + 1.0))


def test_many_spark_equals_serial(spark, curve):
    t, m, sigma = curve
    ex = lc.Extractor(lc.Amplitude(), lc.Kurtosis(transform="arcsinh"),
                      lc.OtsuSplit())
    # mixed lengths, incl. a 2-obs curve that fills (kurtosis min_obs)
    lcs = [(t, m, sigma), (t[:30], 2 * m[:30], sigma[:30]),
           (t[:2], m[:2], sigma[:2])]
    serial = ex.many(lcs, fill_value=np.nan)
    dist = ex.many(lcs, fill_value=np.nan, spark=spark)
    np.testing.assert_allclose(dist, serial, rtol=1e-12, atol=0)
    # single feature too
    f = lc.BeyondNStd(1.5)
    np.testing.assert_allclose(
        f.many(lcs, fill_value=np.nan, spark=spark),
        f.many(lcs, fill_value=np.nan), rtol=1e-12)
    # guards: banded features and finite fill + transform are rejected
    with pytest.raises(ValueError, match="band-less"):
        lc.Mean(bands=["g"]).many(lcs, spark=spark)
    with pytest.raises(ValueError, match="NaN"):
        lc.Kurtosis(transform="arcsinh").many(lcs, fill_value=-1.0,
                                              spark=spark)


def test_periodogram_freq_power(curve):
    t, m, _ = curve
    from light_curve_python_spark.functions.kernels import periodogram_power
    p = lc.Periodogram(resolution=5.0, fast=False)
    freqs, power = p.freq_power(t, m)
    wf, wp = periodogram_power(t, m, resolution=5.0, fast=False)
    np.testing.assert_array_equal(freqs, wf)
    np.testing.assert_array_equal(power, wp)
    assert len(freqs) == len(power) > 10


def test_bands_with_transform(curve):
    t, m, sigma = curve
    band = np.where(np.arange(len(t)) % 2 == 0, "g", "r")
    f = lc.Kurtosis(bands=["g", "r"], transform="arcsinh")
    out = f(t, m, sigma, band)
    want = [np.arcsinh(lc.Kurtosis()(t[band == b], m[band == b],
                                     sigma[band == b]))
            for b in ("g", "r")]
    np.testing.assert_allclose(out, want, rtol=1e-12)
    assert f.names == ("kurtosis_g", "kurtosis_r")


def test_bandless_feature_rejects_band(curve):
    """Reference parity (_base.py:58-63): a band-less feature instance
    must raise on band= input rather than silently evaluating over the
    mixed multi-band magnitudes (r5 ADVICE finding)."""
    t, m, sigma = curve
    band = np.where(np.arange(len(t)) % 2 == 0, "g", "r")
    with pytest.raises(ValueError, match="band"):
        lc.Mean()(t, m, band=band)
    # banded instances keep accepting band input
    assert len(lc.Mean(bands=["g", "r"])(t, m, sigma, band)) == 2


def test_fit_accepts_transform_false(curve):
    """transform=False requests identity — exactly what the facade does;
    only a genuine transformer request raises (r5 ADVICE finding)."""
    t, m, sigma = curve
    f = lc.BazinFit("mcmc-lmsder", transform=False)
    assert lc.BazinFit("mcmc-lmsder", transform=None).names == f.names
    with pytest.raises(ValueError, match="transform"):
        lc.BazinFit("mcmc-lmsder", transform="default")
