"""VillarFit 'hosseinzadeh2020' named prior preset (reference
src/features.rs:4885-4901; published values from Hosseinzadeh et al. 2020,
ApJ 905, 93): data-adaptive per-curve priors with the signature bimodal
plateau-duration term."""

import math

import numpy as np
import pytest

import light_curve_python_spark.functions.fits as FT
from light_curve_python_spark.functions.kernels import (
    evaluate_kernel,
    make_kernel,
)


def test_preset_prior_shapes():
    t = np.linspace(0.0, 100.0, 50)
    m = np.linspace(5.0, 80.0, 50)
    pr = FT.villar_hosseinzadeh2020_priors(t, m)
    assert len(pr) == 7
    a, b, t0, gamma, beta, tau_rise, tau_fall = pr
    # amplitude: log-uniform up to 100x max flux
    assert a.kind == "log_uniform" and a.kw == {"left": 1.0,
                                                "right": 8000.0}
    assert b.kind == "none"
    assert t0.support() == (-50.0, 150.0)
    # gamma: bimodal 2/3 N(5, 5) + 1/3 N(60, 30) — density higher at each
    # mode than between them, and short mode dominates
    g = np.array([gamma(x) for x in (5.0, 30.0, 60.0)])
    assert g[0] > g[2] > g[1]
    want5 = math.log(2 / 3 / (5 * math.sqrt(2 * math.pi))
                     + 1 / 3 * math.exp(-0.5 * ((5 - 60) / 30) ** 2)
                     / (30 * math.sqrt(2 * math.pi)))
    assert gamma(5.0) == pytest.approx(want5, rel=1e-12)
    # beta: hard support [0, 0.01] (declining plateau only)
    assert beta(-1e-4) == -math.inf and beta(0.011) == -math.inf
    assert beta(0.005) == pytest.approx(math.log(100.0))
    assert tau_rise.support() == (0.01, 50.0)
    assert tau_fall.support() == (1.0, 300.0)


def test_preset_name_resolution():
    k = make_kernel("villar_fit", ln_prior="hosseinzadeh2020")
    # the name string is the JSON-stable spec (data-adaptive priors are
    # rebuilt per curve, not serialized)
    assert k.params["ln_prior"] == "hosseinzadeh2020"
    assert make_kernel("villar_fit",
                       ln_prior="no").params["ln_prior"] is None
    with pytest.raises(ValueError, match="unsupported ln_prior name"):
        make_kernel("bazin_fit", ln_prior="hosseinzadeh2020")
    with pytest.raises(ValueError, match="unsupported ln_prior name"):
        make_kernel("villar_fit", ln_prior="nosuchpreset")
    # FeatureSpec round-trips the name
    from light_curve_python_spark.plans.spec import FeatureSpec
    sp = FeatureSpec.of(("villar_fit", {"ln_prior": "hosseinzadeh2020"}))
    rt = FeatureSpec.from_json(sp.to_json())
    assert rt.features[0]["params"]["ln_prior"] == "hosseinzadeh2020"


def test_preset_pins_degenerate_plateau():
    """Observation window ends DURING the plateau (the break is never
    seen), so gamma is unidentified: the free fit parks at an arbitrary
    likelihood-flat value while the bimodal prior pins it at the
    short-plateau mode — at the same data chi2."""
    rng = np.random.default_rng(1)
    t = np.sort(rng.uniform(0, 60, 150))
    truth = (80.0, 10.0, 10.0, 60.0, 0.004, 3.0, 15.0)
    rng2 = np.random.default_rng(8)
    m = FT.villar_model(t, *truth)
    amp = m.max() - m.min()
    s = np.full(len(t), 0.02 * amp)
    m = m + s * rng2.normal(size=len(t))
    free = evaluate_kernel(make_kernel("villar_fit"), t, m, s,
                           fill_value=None)
    pinned = evaluate_kernel(
        make_kernel("villar_fit", ln_prior="hosseinzadeh2020"),
        t, m, s, fill_value=None)
    g_free, g_pin = free[3], pinned[3]
    assert g_free > 12.0                  # parked away from the mode
    assert g_pin == pytest.approx(5.0, abs=3.0)   # pulled to N(5, 5)
    # the pin is free on the data: chi2 unchanged within 5%
    assert pinned[-1] <= free[-1] * 1.05
    # hard beta support honored
    assert 0.0 <= pinned[4] <= 0.01


def test_map_warm_start_respects_support():
    """When the ML optimum violates a prior's hard support (here beta >
    0.01 on sparse noisy data), the MAP fit must still return a feasible,
    sane solution — the warm start is projected into the support."""
    rng = np.random.default_rng(1)
    rng.uniform(0, 60, 150)  # advance the stream to match the pin above
    t = np.sort(rng.uniform(0, 60, 40))
    truth = (80.0, 10.0, 10.0, 60.0, 0.004, 3.0, 15.0)
    rng2 = np.random.default_rng(8)
    m = FT.villar_model(t, *truth)
    amp = m.max() - m.min()
    s = np.full(len(t), 0.1 * amp)
    m = m + s * rng2.normal(size=len(t))
    free = evaluate_kernel(make_kernel("villar_fit"), t, m, s,
                           fill_value=None)
    assert free[4] > 0.01                 # ML beta outside the support
    pinned = evaluate_kernel(
        make_kernel("villar_fit", ln_prior="hosseinzadeh2020"),
        t, m, s, fill_value=None)
    assert 0.0 <= pinned[4] <= 0.01
    assert pinned[-1] < 5.0               # still a reasonable data fit
