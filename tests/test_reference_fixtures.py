"""The reference's own feature-correctness fixtures, ported.

Every case below is an input + expected value taken from the reference's
unit-test suite (/root/reference/light-curve/tests/light_curve_py/features/
test_*.py — the north star asks for the reference's pytest
feature-correctness suite to run against this engine).  The table form is
ours; the (input, desired) pairs are the reference's published facts, cited
per row.
"""

import math

import numpy as np
import pytest

from light_curve_python_spark.functions.kernels import (
    evaluate_kernel,
    make_kernel,
)


def _lin(n):
    return np.linspace(0, 1, n)


# (id, kernel key, params, t, m, sigma, expected vector, rtol)
CASES = [
    # test_cusum.py:7-12
    ("cusum", "cusum", {}, _lin(6), [1, 2, 3, 4, 5, 5], None,
     [0.408248290463863], 1e-7),
    # test_eta.py:7-12
    ("eta", "eta", {}, _lin(7), [1, 2, 3, 3, 3, 4, 4], None,
     [0.43750000000000006], 1e-7),
    # test_etae.py:18-23
    ("eta_e", "eta_e", {}, [1, 2, 7, 9, 10], [1, 2, 3, 8, 11], None,
     [1.114434], 1e-6),
    # test_excvar.py:7-13
    ("excess_variance", "excess_variance", {}, _lin(6), [1, 1, 2, 3, 4, 5],
     [0.5, 0.5, 0.5, 0.5, 0.5, 0.2], [0.344765625], 1e-7),
    # test_kurtosis.py:7-24
    ("kurtosis", "kurtosis", {}, _lin(10),
     [1.52403507, -0.47585435, 1.30247288, -0.26769695, -1.89584998,
      0.30886293, -1.08824993, 1.17991399, -0.61845487, 0.12171829], None,
     [-0.704411], 1e-6),
    # test_skew.py:7-12
    ("skew", "skew", {}, _lin(5), [1.0, 2.0, 3.0, 50.0, 25.0], None,
     [1.307253786], 1e-7),
    # test_magnpratio.py:7-15
    ("magnpratio_default", "magnitude_percentage_ratio", {},
     np.arange(1.0, 11.0), np.arange(1.0, 11.0), None,
     [0.222222222], 1e-7),
    # test_magnpratio.py:18-23
    ("magnpratio_05", "magnitude_percentage_ratio",
     {"quantile_numerator": 0.5, "quantile_denominator": 0.05},
     np.arange(1.0, 11.0), np.arange(1.0, 11.0), None, [0.0], 1e-7),
    # test_medbufrperc.py:7-12
    ("medbufrperc", "median_buffer_range_percentage", {},
     np.arange(1.0, 8.0), np.arange(1.0, 8.0), None, [1 / 7], 1e-7),
    # test_pdiffmperc.py:7-12
    ("pdiffmperc", "percent_difference_magnitude_percentile",
     {"quantile": 0.25}, np.arange(1.0, 7.0), np.arange(1.0, 7.0), None,
     [3.0 / 3.5], 1e-7),
    # test_percampl.py:7-12
    ("percent_amplitude", "percent_amplitude", {}, _lin(5),
     [1.0, 1.0, 3.0, 4.0, 7.0], None, [4.0], 1e-7),
    # test_medabsdev.py:7-12
    ("medabsdev", "median_absolute_deviation", {}, _lin(5),
     [1.0, 1.0, 3.0, 4.0, 7.0], None, [2.0], 1e-7),
    # test_redchi2.py:7-13
    ("redchi2_equal_sigma", "reduced_chi2", {}, _lin(6),
     [1.0, 1.0, 2.0, 3.0, 4.0, 5.0], [0.5] * 6, [10.666667], 1e-6),
    # test_redchi2.py:16-22
    ("redchi2_diff_sigma", "reduced_chi2", {}, _lin(6),
     np.arange(6.0), [0.5, 1.0, 0.5, 1.0, 0.5, 1.0], [8.48], 1e-6),
    # test_weightmean.py:7-12
    ("weighted_mean", "weighted_mean", {}, _lin(5),
     [2.0, 3.0, 1.0, 9.0, 5.0], [0.3, 0.4, 0.5, 1.0, 1.0],
     [2.52437574316], 1e-7),
    # test_beyondnstd.py:6-13
    ("beyond_1_std", "beyond_n_std", {"nstd": 1.0},
     [1.0, 2.0, 3.0, 4.0, 5.0, 10.0], [1.0, 2.0, 3.0, 4.0, 5.0, 10.0],
     None, [1 / 6], 1e-7),
    # test_beyondnstd.py:16-21
    ("beyond_3_std", "beyond_n_std", {"nstd": 3.0},
     [1.0, 18.0, 45.0, 100.0], [1.0, 18.0, 45.0, 100.0], None, [0.0], 1e-7),
    # test_amplitude.py:7-13
    ("amplitude", "amplitude", {}, np.arange(11.0), np.arange(11.0), None,
     [5.0], 1e-7),
    # test_meanvar.py:7-12
    ("mean_variance", "mean_variance", {}, _lin(8),
     [1, 1, 2, 2, 3, 3, 4, 4], None, [0.47809144373375745], 1e-7),
    # test_median.py:7-14 (odd n -> exact middle element)
    ("median_odd", "median", {}, np.arange(9.0), np.arange(9.0), None,
     [4.0], 1e-12),
    # test_intpercrange.py:7-12
    ("intpercrange", "inter_percentile_range", {}, np.arange(1.0, 7.0),
     np.arange(1.0, 7.0), None, [3.0], 1e-7),
    # test_intpercrange.py:15-20
    ("intpercrange_05", "inter_percentile_range", {"quantile": 0.5},
     np.arange(1.0, 10.0), np.arange(1.0, 10.0), None, [0.0], 1e-7),
    # test_otsusplit.py:7-14
    ("otsu_1", "otsu_split", {}, np.linspace(0, 1.7, 4),
     [0.5, 1.5, 1.5, 1.5], None, [1.0, 0.0, 0.0, 0.25], 1e-7),
    # test_otsusplit.py:17-24
    ("otsu_2", "otsu_split", {}, np.linspace(0, 1.7, 3),
     [0.45, 0.5, 0.52], None,
     [0.06, 0.0, float(np.std([0.5, 0.52], ddof=1)), 0.33333], 1e-4),
]


@pytest.mark.parametrize(
    "case", CASES, ids=[c[0] for c in CASES])
def test_reference_fixture(case):
    _, key, params, t, m, sigma, expected, rtol = case
    t = np.asarray(t, dtype=np.float64)
    m = np.asarray(m, dtype=np.float64)
    s = None if sigma is None else np.asarray(sigma, dtype=np.float64)
    got = evaluate_kernel(make_kernel(key, **params), t, m, s,
                          fill_value=None)
    np.testing.assert_allclose(got, expected, rtol=rtol, atol=1e-12)


def test_roms_analytic_fixtures():
    """test_roms.py:7-39 — constant data -> 0; sine amplitude 2 -> 4/pi;
    standard normal -> 2/sqrt(2 pi) (both at rtol 3/sqrt(n))."""
    k = make_kernel("roms")
    n = 100
    t = np.arange(n, dtype=np.float64)
    assert evaluate_kernel(k, t, np.ones(n), np.ones(n),
                           fill_value=None)[0] == 0.0
    t2 = np.linspace(0, 2 * math.pi, n)
    got = evaluate_kernel(k, t2, 2 * np.sin(t2), np.ones(n),
                          fill_value=None)[0]
    assert got == pytest.approx(4 / math.pi, rel=3 / math.sqrt(n))
    rng = np.random.default_rng(0)
    got = evaluate_kernel(k, _lin(n), rng.normal(0, 1, n), np.ones(n),
                          fill_value=None)[0]
    assert got == pytest.approx(2 / math.sqrt(2 * math.pi),
                                rel=3 / math.sqrt(n))


def test_etae_equals_eta_on_uniform_grid():
    """test_etae.py:8-15 — EtaE == Eta when sampling is uniform."""
    t = np.array([1.0, 3.0, 5.0, 7.0])
    m = np.array([1.0, 2.0, 3.0, 8.0])
    eta = evaluate_kernel(make_kernel("eta"), t, m, None, fill_value=None)
    eta_e = evaluate_kernel(make_kernel("eta_e"), t, m, None,
                            fill_value=None)
    np.testing.assert_allclose(eta_e, eta, rtol=1e-12)


def test_otsu_threshold_sort_invariance():
    """test_otsusplit.py:27-40 — the Otsu threshold is order-invariant and
    equals 0.5 on [0.45, 0.5, 0.52] (the split keeps 0.45 below)."""
    k = make_kernel("otsu_split")
    t = np.linspace(0, 1.7, 3)
    a = evaluate_kernel(k, t, np.array([0.45, 0.5, 0.52]), None,
                        fill_value=None)
    b = evaluate_kernel(k, t, np.array([0.52, 0.45, 0.5]), None,
                        fill_value=None)
    np.testing.assert_allclose(a, b, rtol=1e-12)
    assert a[3] == pytest.approx(1 / 3, rel=1e-4)  # one point below thr 0.5


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_reference_fixture_through_compat(case):
    """The same reference (input, desired) pairs routed through the
    class-style compat facade — ties the reference-shaped API surface
    directly to the reference's published facts, not just the kernels."""
    from light_curve_python_spark import compat
    _, key, params, t, m, sigma, want, rtol = case
    cls = getattr(compat, compat._camel(key))
    got = cls(**params)(np.asarray(t, float), np.asarray(m, float),
                        None if sigma is None else np.asarray(sigma, float))
    np.testing.assert_allclose(np.atleast_1d(got), want, rtol=rtol)
