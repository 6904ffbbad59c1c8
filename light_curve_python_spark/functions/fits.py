"""Parametric curve-fit features: BazinFit, VillarFit, LinexpFit.

scipy is unavailable here, so the optimizer is a self-contained weighted
Levenberg–Marquardt (numerical Jacobian, box bounds by clipping) — per-curve
problem sizes are tiny (4-7 params, 10^2-10^3 points), so the pure-numpy loop
is adequate executor-side.

Model semantics:
- Bazin: ``b + a * exp(-dt/fall) / (1 + exp(-dt/rise))``, dt = t - t0 —
  pinned verbatim by the reference's own test
  (/root/reference/light-curve/tests/test_w_bench.py:312-315); binding class
  /root/reference/light-curve/src/features.rs:3493-3506.
- Villar: the SN plateau model of Villar et al. 2019 (ApJ 884, 83), eq. 1,
  plus a baseline: rise sigmoid × (linear plateau | exponential decline after
  t0 + gamma); 7 params (features.rs:4885-4901).
- Linexp: linear rise × exponential decay ``a·dt·exp(-dt/fall) + b``
  (features.rs:3912-3925).

Outputs per fit: fitted params + reduced chi2, names ``{prefix}_{param}`` /
``{prefix}_reduced_chi2``.  Fill semantics as all kernels: non-convergence /
non-finite => fill_value.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple

import numpy as np

from .kernels import Kernel, _register

__all__ = ["levenberg_marquardt", "bazin_model", "villar_model",
           "linexp_model"]


def levenberg_marquardt(model: Callable, t: np.ndarray, m: np.ndarray,
                        w: np.ndarray, p0: np.ndarray,
                        lower: np.ndarray, upper: np.ndarray,
                        max_iter: int = 100, ftol: float = 1e-10,
                        ptol: float = 1e-10) -> Tuple[np.ndarray, float]:
    """Minimize sum(w * (model(t, p) - m)^2); returns (params, chi2)."""
    p = np.clip(np.asarray(p0, dtype=np.float64), lower, upper)
    sw = np.sqrt(w)

    def residuals(params):
        return sw * (model(t, *params) - m)

    r = residuals(p)
    cost = float(r @ r)
    lam = 1e-3
    n_par = len(p)
    eye = np.eye(n_par)

    for _ in range(max_iter):
        # numerical Jacobian (forward differences, relative step)
        J = np.empty((len(t), n_par))
        for k in range(n_par):
            # absolute floor keeps the step sane when p[k] == 0
            step = 1e-6 * max(abs(p[k]), 1.0)
            pk = p.copy()
            pk[k] += step
            J[:, k] = (residuals(pk) - r) / step
        g = J.T @ r
        H = J.T @ J
        improved = False
        for _try in range(12):
            try:
                delta = np.linalg.solve(H + lam * np.diag(np.diag(H))
                                        + 1e-300 * eye, -g)
            except np.linalg.LinAlgError:
                lam *= 10
                continue
            p_new = np.clip(p + delta, lower, upper)
            r_new = residuals(p_new)
            cost_new = float(r_new @ r_new)
            if np.isfinite(cost_new) and cost_new < cost:
                rel_f = (cost - cost_new) / max(cost, 1e-300)
                rel_p = np.max(np.abs(p_new - p)
                               / np.maximum(np.abs(p), 1e-12))
                p, r, cost = p_new, r_new, cost_new
                lam = max(lam / 10, 1e-12)
                improved = True
                if rel_f < ftol or rel_p < ptol:
                    return p, cost
                break
            lam *= 10
        if not improved:
            break
    return p, cost


# --- models ------------------------------------------------------------------

def bazin_model(t, a, b, t0, rise, fall):
    dt = t - t0
    with np.errstate(over="ignore"):
        return b + a * np.exp(-dt / fall) / (1.0 + np.exp(-dt / rise))


def villar_model(t, a, b, t0, gamma, beta, tau_rise, tau_fall):
    dt = t - t0
    with np.errstate(over="ignore"):
        sigmoid = 1.0 / (1.0 + np.exp(-dt / tau_rise))
        plateau = a * (1.0 - beta * dt) * sigmoid
        decline = (a * (1.0 - beta * gamma)
                   * np.exp(-(dt - gamma) / tau_fall) * sigmoid)
        return b + np.where(dt < gamma, plateau, decline)


def linexp_model(t, a, b, t0, fall):
    dt = t - t0
    with np.errstate(over="ignore"):
        return b + a * dt * np.exp(-dt / fall)


# --- kernel factories ---------------------------------------------------------

def _fit_kernel(key: str, model: Callable, param_names: Sequence[str],
                init_fn: Callable, bounds_fn: Callable):
    @_register(key)
    def factory(init: Optional[Sequence[float]] = None,
                bounds: Optional[Sequence[Tuple[float, float]]] = None,
                max_iter: int = 100) -> Kernel:
        names = tuple(f"{key}_{p}" for p in param_names) \
            + (f"{key}_reduced_chi2",)
        n_par = len(param_names)

        def fn(t, m, s):
            if len(t) <= n_par + 1:
                raise ValueError("not enough points")
            w = s ** -2.0
            p0 = np.asarray(init if init is not None else init_fn(t, m),
                            dtype=np.float64)
            if bounds is not None:
                lower = np.array([lo for lo, _ in bounds], dtype=np.float64)
                upper = np.array([hi for _, hi in bounds], dtype=np.float64)
            else:
                lower, upper = bounds_fn(t, m)
            p, chi2 = levenberg_marquardt(model, t, m, w, p0, lower, upper,
                                          max_iter=max_iter)
            return np.concatenate([p, [chi2 / (len(t) - n_par)]])

        return Kernel(key=key, names=names, func=fn, min_obs=n_par + 2,
                      needs_sigma=True,
                      params={"init": init, "bounds": bounds,
                              "max_iter": max_iter})
    return factory


def _bazin_init(t, m):
    span = t[-1] - t[0]
    return [np.max(m) - np.min(m), np.min(m), t[int(np.argmax(m))],
            0.1 * span, 0.1 * span]


def _bazin_bounds(t, m):
    span = t[-1] - t[0]
    amp = np.max(m) - np.min(m)
    lower = np.array([0.0, np.min(m) - 10 * amp, t[0] - span,
                      1e-4 * span, 1e-4 * span])
    upper = np.array([100 * amp, np.max(m) + 10 * amp, t[-1] + span,
                      10 * span, 10 * span])
    return lower, upper


_fit_kernel("bazin_fit", bazin_model, ("a", "b", "t0", "rise", "fall"),
            _bazin_init, _bazin_bounds)


def _villar_init(t, m):
    span = t[-1] - t[0]
    return [np.max(m) - np.min(m), np.min(m), t[int(np.argmax(m))],
            0.1 * span, 0.0, 0.05 * span, 0.1 * span]


def _villar_bounds(t, m):
    span = t[-1] - t[0]
    amp = np.max(m) - np.min(m)
    lower = np.array([0.0, np.min(m) - 10 * amp, t[0] - span, 0.0,
                      -1.0 / max(span, 1e-9), 1e-4 * span, 1e-4 * span])
    upper = np.array([100 * amp, np.max(m) + 10 * amp, t[-1] + span,
                      span, 1.0 / max(span, 1e-9), 10 * span, 10 * span])
    return lower, upper


_fit_kernel("villar_fit", villar_model,
            ("a", "b", "t0", "gamma", "beta", "tau_rise", "tau_fall"),
            _villar_init, _villar_bounds)


def _linexp_init(t, m):
    span = t[-1] - t[0]
    i_max = int(np.argmax(m))
    fall0 = max(t[i_max] - t[0], 0.05 * span)
    a0 = (np.max(m) - np.min(m)) / (fall0 * math.exp(-1.0))
    return [a0, np.min(m), t[0] - 0.01 * span, fall0]


def _linexp_bounds(t, m):
    span = t[-1] - t[0]
    amp = np.max(m) - np.min(m)
    big_a = 1e3 * amp / max(1e-4 * span, 1e-12)
    lower = np.array([-big_a, np.min(m) - 10 * amp, t[0] - 2 * span,
                      1e-4 * span])
    upper = np.array([big_a, np.max(m) + 10 * amp, t[-1] + span, 10 * span])
    return lower, upper


_fit_kernel("linexp_fit", linexp_model, ("a", "b", "t0", "fall"),
            _linexp_init, _linexp_bounds)
