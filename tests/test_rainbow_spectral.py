"""Rainbow spectral-term registry: the three deviation terms beyond
planck/blanketed (GenWien, ModifiedBlackBody, LogParabola — reference
spectral.py:236-471, registry :472-478), each verified by formula
transcription pins + truth recovery on synthetic data generated FROM the
composed model (the reference's own Rainbow test strategy)."""

import math

import numpy as np
import pytest

from light_curve_python_spark.functions.rainbow import (
    BOLOMETRIC_TERMS,
    SPECTRAL_TERMS,
    TEMPERATURE_TERMS,
    _planck_nu,
    rainbow_fit_arrays,
    rainbow_param_names,
)

WAVES = {"u": 3600e-8, "g": 4770e-8, "r": 6231e-8, "i": 7625e-8,
         "z": 9134e-8}
AVG_NU = 2.99792458e10 / float(np.mean(list(WAVES.values())))
SIGMA_SB = 5.6703744191844314e-05


def test_registry_parity_with_reference():
    """Key set ⊇ the reference's spectral_terms registry
    (spectral.py:472-478) and per-term parameter names match."""
    assert {"planck", "blanketed", "genwien", "modified_bb",
            "logparabola"} <= set(SPECTRAL_TERMS)
    assert SPECTRAL_TERMS["planck"].names == ()
    assert SPECTRAL_TERMS["blanketed"].names == ("T", "lambda_scale")
    # alias and canonical key are the same term object
    assert SPECTRAL_TERMS["blanketed"] is SPECTRAL_TERMS["blanketed_planck"]
    assert SPECTRAL_TERMS["genwien"].names == ("spec_k",)
    assert SPECTRAL_TERMS["modified_bb"].names == ("beta",)
    assert SPECTRAL_TERMS["logparabola"].names == ("sp_a", "sp_b")
    # priors anchor the deviation parameters (spectral.py parameter_priors)
    assert SPECTRAL_TERMS["genwien"].priors == {"spec_k": (1.0, 0.5)}
    assert SPECTRAL_TERMS["modified_bb"].priors == {"beta": (0.0, 1.0)}
    assert SPECTRAL_TERMS["logparabola"].priors == {
        "sp_a": (0.0, 0.5), "sp_b": (0.0, 0.5)}


def test_spectral_formula_pins():
    """Transcription pins: each term's value() against an independently
    written formula at fixed inputs (h, c, k_B from CODATA 2018 as in
    spectral.py:18-20)."""
    h, c, kb = 6.62607004e-27, 2.99792458e10, 1.380649e-16
    wave = np.array([3600e-8, 6000e-8, 9134e-8])
    T = 7500.0
    nu = c / wave
    x = h * nu / (kb * T)
    planck = (2 * h / c ** 2) * nu ** 3 * np.exp(-x) / (-np.expm1(-x))
    np.testing.assert_allclose(
        SPECTRAL_TERMS["planck"].value(wave, T), planck, rtol=1e-12)
    # genwien: nu^3 exp(-x^k)
    k = 1.7
    want = (2 * h / c ** 2) * nu ** 3 * np.exp(-x ** k)
    np.testing.assert_allclose(
        SPECTRAL_TERMS["genwien"].value(wave, T, k), want, rtol=1e-12)
    # modified_bb: planck * (lambda/6000A)^beta  (so ==planck at beta=0 and
    # at the reference wavelength for any beta)
    beta = 1.3
    want = planck * (wave / 6000e-8) ** beta
    np.testing.assert_allclose(
        SPECTRAL_TERMS["modified_bb"].value(wave, T, beta), want,
        rtol=1e-12)
    assert SPECTRAL_TERMS["modified_bb"].value(
        np.array([6000e-8]), T, 5.0)[0] == pytest.approx(
        planck[1], rel=1e-12)
    np.testing.assert_allclose(
        SPECTRAL_TERMS["modified_bb"].value(wave, T, 0.0), planck,
        rtol=1e-12)
    # logparabola: planck * exp(a L + b L^2), L = ln(lambda/6000A)
    a, b = 0.7, -0.4
    ell = np.log(wave / 6000e-8)
    want = planck * np.exp(a * ell + b * ell ** 2)
    np.testing.assert_allclose(
        SPECTRAL_TERMS["logparabola"].value(wave, T, a, b), want,
        rtol=1e-12)
    np.testing.assert_allclose(
        SPECTRAL_TERMS["logparabola"].value(wave, T, 0.0, 0.0), planck,
        rtol=1e-12)


def _synth(spectral, spec_params, T=8000.0, seed=13, n=400, noise=0.01):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 200, n))
    band = rng.choice(list(WAVES), n)
    wave_cm = np.array([WAVES[b] for b in band])
    bol = BOLOMETRIC_TERMS["bazin"].value(t, 80.0, 10.0, 6.0, 22.0)
    tempv = TEMPERATURE_TERMS["constant"].value(t, T)
    norm = SIGMA_SB * tempv ** 4 / math.pi / AVG_NU
    spec = SPECTRAL_TERMS[spectral].value(wave_cm, tempv, *spec_params)
    flux = spec / norm * bol + 0.2
    sigma = np.full(n, noise * flux.max())
    m = flux + sigma * rng.normal(size=n)
    return t, m, sigma, band, wave_cm, flux


def _fit(spectral, t, m, sigma, band):
    names = rainbow_param_names("bazin", "constant", spectral)
    out = rainbow_fit_arrays(t, m, sigma, band, WAVES,
                             bolometric="bazin", temperature="constant",
                             spectral=spectral)
    cols = list(names) + [f"baseline_{b}" for b in sorted(WAVES)] \
        + ["r_chisq"]
    return dict(zip(cols, out))


def test_genwien_truth_recovery():
    t, m, s, band, _, _ = _synth("genwien", (1.8,))
    got = _fit("genwien", t, m, s, band)
    assert got["r_chisq"] < 1.0
    assert got["spec_k"] == pytest.approx(1.8, rel=0.1)
    assert got["T"] == pytest.approx(8000.0, rel=0.1)
    # Wien-like data: the N(1, 0.5) prior + data keep spec_k pinned at 1
    t, m, s, band, _, _ = _synth("genwien", (1.0,), seed=21)
    got = _fit("genwien", t, m, s, band)
    assert got["spec_k"] == pytest.approx(1.0, abs=0.05)


def test_genwien_beats_planck_on_suppressed_sed():
    """A sharp blue cutoff (spec_k = 2.4 at 15 kK) is inexpressible for the
    plain Planck term — the genwien fit must be decisively better."""
    t, m, s, band, _, _ = _synth("genwien", (2.4,), T=15000.0, seed=4)
    got = _fit("genwien", t, m, s, band)
    plain = _fit("planck", t, m, s, band)
    assert got["r_chisq"] < 1.0
    assert got["spec_k"] == pytest.approx(2.4, rel=0.1)
    assert plain["r_chisq"] > 2.0 * got["r_chisq"]


def test_modified_bb_truth_recovery():
    # beta = 0 is EXACTLY Planck: physical T recovered, beta pinned at 0
    t, m, s, band, _, _ = _synth("modified_bb", (0.0,))
    got = _fit("modified_bb", t, m, s, band)
    assert got["beta"] == pytest.approx(0.0, abs=0.05)
    assert got["T"] == pytest.approx(8000.0, rel=0.05)
    assert got["r_chisq"] < 1.0
    # a real tilt overrides the weak N(0,1) prior
    t, m, s, band, _, _ = _synth("modified_bb", (1.2,))
    got = _fit("modified_bb", t, m, s, band)
    assert got["beta"] == pytest.approx(1.2, abs=0.15)
    assert got["T"] == pytest.approx(8000.0, rel=0.05)


def test_logparabola_fit_quality_and_sed_shape():
    """(T, sp_a, sp_b) over-parameterize a smooth SED (documented in
    spectral.py:412-418), so the identifiable object is the composed
    band-flux ratio, not the raw parameters: assert fit quality plus the
    reconstructed u/r and z/r spectral ratios."""
    t, m, s, band, _, _ = _synth("logparabola", (0.8, 0.6))
    got = _fit("logparabola", t, m, s, band)
    assert got["r_chisq"] < 1.0

    def ratio(T, a, b, num="u", den="r"):
        w = np.array([WAVES[num], WAVES[den]])
        v = SPECTRAL_TERMS["logparabola"].value(w, T, a, b) / T ** 4
        return v[0] / v[1]

    want_ur = ratio(8000.0, 0.8, 0.6)
    got_ur = ratio(got["T"], got["sp_a"], got["sp_b"])
    assert got_ur == pytest.approx(want_ur, rel=0.1)
    want_zr = ratio(8000.0, 0.8, 0.6, num="z")
    got_zr = ratio(got["T"], got["sp_a"], got["sp_b"], num="z")
    assert got_zr == pytest.approx(want_zr, rel=0.1)
    # pure-Planck data: priors anchor both deviation params near 0 and the
    # temperature stays near-physical
    t, m, s, band, _, _ = _synth("logparabola", (0.0, 0.0), seed=21)
    got = _fit("logparabola", t, m, s, band)
    assert abs(got["sp_a"]) < 0.4 and abs(got["sp_b"]) < 0.4
    assert got["T"] == pytest.approx(8000.0, rel=0.15)


def test_spectral_terms_through_spark_operator(spark):
    """The new terms ride the same operators.spectral.rainbow_fit surface:
    column names extend with the term's parameters."""
    import pandas as pd
    from light_curve_python_spark.operators.spectral import rainbow_fit
    t, m, s, band, _, _ = _synth("modified_bb", (1.2,), n=300)
    df = spark.createDataFrame(pd.DataFrame(
        {"doc_id": "d0", "t": t, "m": m, "sigma": s, "band": band}))
    got = rainbow_fit(df, WAVES, bolometric="bazin",
                      temperature="constant",
                      spectral="modified_bb").toPandas()
    assert "beta" in got.columns
    assert got["beta"].iloc[0] == pytest.approx(1.2, abs=0.2)
