"""Property-based metamorphic tests (hypothesis), mirroring the reference's
invariance suite (SURVEY.md §5.5): battery ≡ per-window kernels on arbitrary
inputs, shift/scale equivariances, degenerate windows."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from light_curve_python_spark.functions.battery import PrefixBattery
from light_curve_python_spark.functions.kernels import (
    evaluate_kernel,
    evaluate_many,
    make_kernel,
)

KEYS = ["amplitude", "mean", "median", "standard_deviation",
        "median_absolute_deviation", "weighted_mean", "kurtosis", "skew",
        "percent_amplitude", "inter_percentile_range", "beyond_n_std",
        "stetson_k", "reduced_chi2", "roms", "cusum", "eta", "eta_e",
        "maximum_slope", "linear_fit", "linear_trend", "otsu_split",
        "anderson_darling_normal", "lafler_kinman_string_length"]


@st.composite
def curves(draw, max_n=60):
    n = draw(st.integers(min_value=0, max_value=max_n))
    rng = np.random.default_rng(draw(st.integers(0, 2**32 - 1)))
    t = np.sort(rng.uniform(0, 100, n))
    # occasionally constant m (zero variance) to hit fill paths
    if draw(st.booleans()) and n > 0:
        m = np.full(n, 17.0)
    else:
        m = rng.uniform(15, 21, n)
    sigma = rng.uniform(0.01, 0.2, n)
    return t, m, sigma


@settings(max_examples=40, deadline=None)
@given(curves(), st.integers(0, 2**31 - 1))
def test_battery_equals_per_window_everywhere(curve, seed):
    t, m, s = curve
    n = len(t)
    rng = np.random.default_rng(seed)
    ends = rng.integers(0, n + 1, size=6)
    kernels = [make_kernel(k) for k in KEYS]
    battery = PrefixBattery(kernels, fill_value=np.nan)
    names = battery.names
    got = battery.evaluate_prefixes(t, m, s, ends)
    for i, e in enumerate(ends):
        want = evaluate_many(kernels, t[:e], m[:e], s[:e], np.nan)
        g, w = got[i].copy(), want.copy()
        if e > 0 and np.std(m[:e]) == 0:
            # stetson_k on an exactly-constant window is a 0/0: the
            # per-window path returns eps-noise garbage, the battery fills —
            # neither value is meaningful, so exclude it here
            j = names.index("stetson_k")
            g[j] = w[j] = 0.0
        # atol 1e-8: quantities that are exactly 0 mathematically (e.g.
        # linear_fit chi2 on constant m) carry ~1e-10 cancellation residue
        # that differs between summation orders
        np.testing.assert_allclose(g, w, rtol=1e-7, atol=1e-8,
                                   equal_nan=True)


@settings(max_examples=30, deadline=None)
@given(curves(max_n=50))
def test_time_shift_invariance(curve):
    """m-features must not change when t is globally shifted."""
    t, m, s = curve
    if len(t) < 5:
        return
    shift_invariant = ["amplitude", "mean", "median", "standard_deviation",
                       "eta", "maximum_slope", "otsu_split", "duration",
                       "eta_e", "linear_trend"]
    ks = [make_kernel(k) for k in shift_invariant]
    a = evaluate_many(ks, t, m, s, np.nan)
    b = evaluate_many(ks, t + 1234.5, m, s, np.nan)
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-9, equal_nan=True)


@settings(max_examples=30, deadline=None)
@given(curves(max_n=50))
def test_magnitude_shift_equivariance(curve):
    """Adding a constant to m: amplitude/std/eta/cusum invariant; mean and
    median shift by exactly that constant."""
    t, m, s = curve
    if len(t) < 5 or np.std(m) == 0:
        return
    c = 7.25
    inv = [make_kernel(k) for k in
           ["amplitude", "standard_deviation", "eta", "cusum",
            "median_absolute_deviation", "inter_percentile_range"]]
    a = evaluate_many(inv, t, m, s, np.nan)
    b = evaluate_many(inv, t, m + c, s, np.nan)
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-9, equal_nan=True)
    assert evaluate_kernel(make_kernel("mean"), t, m + c, s)[0] == \
        pytest.approx(evaluate_kernel(make_kernel("mean"), t, m, s)[0] + c)


@settings(max_examples=20, deadline=None)
@given(curves(max_n=40))
def test_fill_on_constant_m(curve):
    """Zero variance must yield fill_value (not inf/nan leakage) in every
    variance-normalized feature, identically in both evaluation paths."""
    t, _, s = curve
    n = len(t)
    if n < 4:
        return
    m = np.full(n, 17.0)
    # variance-normalized features are undefined => fill; beyond_n_std and
    # mean_variance stay finite on constant m (0.0, matching the reference)
    must_fill = [make_kernel(k) for k in
                 ["eta", "cusum", "anderson_darling_normal", "skew",
                  "kurtosis"]]
    finite = [make_kernel(k) for k in ["beyond_n_std", "mean_variance"]]
    per = evaluate_many(must_fill, t, m, s, fill_value=-9.0)
    bat = PrefixBattery(must_fill, fill_value=-9.0).evaluate_prefixes(
        t, m, s, np.array([n]))[0]
    assert (per == -9.0).all()
    np.testing.assert_array_equal(per, bat)
    perf = evaluate_many(finite, t, m, s, fill_value=-9.0)
    batf = PrefixBattery(finite, fill_value=-9.0).evaluate_prefixes(
        t, m, s, np.array([n]))[0]
    assert perf[0] == 0.0  # beyond: count(|0|>0)/n
    np.testing.assert_allclose(perf, batf, rtol=1e-12, atol=1e-12)


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(10, 300),
       st.floats(3.0, 20.0), st.floats(0.5, 2.0))
def test_fast_periodogram_tracks_direct(seed, n, resolution, mff):
    """Press-Rybicki FFT vs direct Lomb on arbitrary curves and grid
    parameters: relative error bounded everywhere."""
    from light_curve_python_spark.functions.fastperiodogram import (
        lomb_scargle_power_fast)
    from light_curve_python_spark.functions.kernels import (
        lomb_scargle_power,
        periodogram_freq_grid,
    )
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 100, n))
    if t[-1] - t[0] <= 0:
        return
    m = rng.uniform(15, 21, n)
    y = (m - m.mean()) / (m.std(ddof=1) or 1.0)
    freqs = periodogram_freq_grid(t, resolution, mff)
    p_fast = lomb_scargle_power_fast(t, y, freqs[0], len(freqs))
    p_direct = lomb_scargle_power(t, y, freqs)
    np.testing.assert_allclose(p_fast, p_direct, rtol=2e-4,
                               atol=1e-6 * max(p_direct.max(), 1.0))


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(1, 200),
       st.integers(64, 2048), st.integers(2, 8))
def test_extirpolate_preserves_trig_sums(seed, npts, n, macc):
    """Extirpolation invariant: sum_k wk[k] e^{-2 pi i k j / n} must
    approximate sum_p y_p e^{-2 pi i x_p j / n} for low harmonics j."""
    from light_curve_python_spark.functions.fastperiodogram import extirpolate
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, n, npts)
    y = rng.normal(size=npts)
    wk = extirpolate(x, y, n, macc)
    # exact total mass
    assert np.isclose(wk.sum(), y.sum(), rtol=1e-9, atol=1e-9)
    j = max(1, n // 64)  # a low harmonic relative to the grid
    want = np.sum(y * np.exp(-2 * np.pi * 1j * x * j / n))
    got = np.sum(wk * np.exp(-2 * np.pi * 1j * np.arange(n) * j / n))
    scale = max(np.abs(y).sum(), 1.0)
    assert abs(got - want) / scale < 5e-3


@settings(max_examples=8, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(2, 17))
def test_pack_spans_partition_invariants(spark, seed, block):
    """Concat-then-chunk laws on arbitrary corpora (zeros included): per
    source the spans tile the token stream exactly — every block full
    except the last, per-doc spans contiguous over [0, n_tok)."""
    from light_curve_python_spark.operators.packing import pack_spans
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 25))
    rows = [(int(i), ["s0", "s1"][int(rng.integers(0, 2))],
             int(rng.integers(0, 4 * block))) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
    spans = pack_spans(df, block).toPandas()
    tok = {(r[0], r[1]): r[2] for r in rows}
    for src, g in spans.groupby("source"):
        total = sum(v for (i, s), v in tok.items() if s == src)
        per_block = g.groupby("block_id").apply(
            lambda b: (b.tok_end - b.tok_start).sum(), include_groups=False)
        assert per_block.sum() == total
        if len(per_block):
            assert sorted(per_block.index) == list(range(len(per_block)))
            assert (per_block.iloc[:-1] == block).all()
            assert 0 < per_block.iloc[-1] <= block
    for (i, src), nt in tok.items():
        g = spans[spans.doc_id == i].sort_values("block_id")
        if nt == 0:
            assert g.empty
            continue
        assert g.tok_start.iloc[0] == 0 and g.tok_end.iloc[-1] == nt
        assert (g.tok_start.iloc[1:].to_numpy()
                == g.tok_end.iloc[:-1].to_numpy()).all()


@settings(max_examples=8, deadline=None)
@given(st.integers(0, 2**31 - 1),
       st.floats(0.0, 0.99, allow_nan=False))
def test_erode_count_law(spark, seed, frac):
    """round(frac*n) observations dropped per entity, survivors a
    time-ordered subsequence — for arbitrary curve lengths/fractions."""
    from light_curve_python_spark.operators.dmdt import erode_observations
    rng = np.random.default_rng(seed)
    sizes = {int(e): int(rng.integers(1, 30)) for e in range(4)}
    rows = [(e, float(i), float(rng.normal()))
            for e, n in sizes.items() for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, t double, m double")
    # half-AWAY rounding (f64::round / Spark round), NOT Python's
    # banker's round — at frac*n == x.5 they differ
    rnd = lambda x: int(np.floor(x + 0.5))
    # skip entities the reference contract would refuse (drop >= n)
    if any(rnd(frac * n) >= n for n in sizes.values()):
        out = erode_observations(df, "doc_id", drop_nobs=frac, seed=seed,
                                 on_short="skip").toPandas()
    else:
        out = erode_observations(df, "doc_id", drop_nobs=frac,
                                 seed=seed).toPandas()
    for e, n in sizes.items():
        drop = rnd(frac * n)
        g = out[out.doc_id == e]
        if drop >= n:
            assert g.empty
            continue
        assert len(g) == n - drop
        ts = g.t.sort_values().to_numpy()
        assert set(ts) <= set(np.arange(float(n)))
