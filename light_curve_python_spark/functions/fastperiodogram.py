"""Press–Rybicki FFT Lomb–Scargle — the reference's ``fast=True`` default.

The reference selects ``PeriodogramPowerFft`` when ``Periodogram(fast=True)``
(/root/reference/light-curve/src/features.rs:4298-4345, default ``fast=True``
at :4557).  This module re-derives the same O(N log N) algorithm from the
published source (Press & Rybicki 1989, ApJ 338 277; Numerical Recipes
``fasper``): extirpolate the data onto a fine regular grid with Lagrange
weights, FFT once, and assemble the tau-shifted Lomb normal equations for
every frequency from the transform bins.

Semantics: identical quantity as :func:`kernels.lomb_scargle_power` (classic
Lomb power of the precentered series, 'psd' normalization), evaluated on the
linear angular-frequency grid ``step * arange(1, nf + 1)`` — the engine's
auto grid — to a relative accuracy set by the extirpolation order ``macc``
and the grid oversampling (defaults hold ~1e-6 relative on the reference's
grid classes; asserted ≤1e-4 in tests/test_kernels.py).
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["extirpolate", "lomb_scargle_power_fast"]


def extirpolate(x: np.ndarray, y: np.ndarray, n: int,
                macc: int = 4) -> np.ndarray:
    """Spread weights ``y`` at real grid coordinates ``x`` (periodic in
    ``[0, n)``) onto an ``n``-point integer grid with order-``macc`` Lagrange
    extirpolation, so that ``sum_k wk[k] * f(k) ≈ sum_j y[j] * f(x[j])`` for
    any smooth periodic ``f`` (Press & Rybicki 1989 eq. 5; NR ``spread``).
    Indices wrap mod n, so near-boundary points keep exact phase."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    wk = np.zeros(n, dtype=np.float64)
    ix = np.floor(x).astype(np.int64)
    exact = x == ix
    if exact.any():
        np.add.at(wk, ix[exact] % n, y[exact])
    x, y = x[~exact], y[~exact]
    if len(x) == 0:
        return wk
    # nodes ilo .. ilo+macc-1 centred on x; dx never 0 (x not integer here)
    ilo = np.floor(x - 0.5 * macc + 1.0).astype(np.int64)
    nodes = ilo[:, None] + np.arange(macc)[None, :]
    dx = x[:, None] - nodes
    # Lagrange weight_j = prod_{k != j} dx_k / (node_j - node_k)
    #                   = prod_all(dx) / (dx_j * denom_j),
    # denom_j = prod_{k != j} (j - k) = (-1)^(macc-1-j) j! (macc-1-j)!
    denom = np.array(
        [(-1) ** (macc - 1 - j)
         * math.factorial(j) * math.factorial(macc - 1 - j)
         for j in range(macc)], dtype=np.float64)
    w = np.prod(dx, axis=1)[:, None] / (dx * denom[None, :])
    np.add.at(wk, (nodes % n).ravel(), (w * y[:, None]).ravel())
    return wk


def lomb_scargle_power_fast(t: np.ndarray, y: np.ndarray, step: float,
                            nf: int, macc: int = 6,
                            grid_factor: int = 16) -> np.ndarray:
    """Lomb power at angular frequencies ``step * arange(1, nf + 1)`` in
    O((nf·grid_factor)·log + N·macc) — numerically the same estimator as
    :func:`kernels.lomb_scargle_power` (y must already be centered).

    grid_factor: FFT grid cells per output frequency (NR uses 2·MACC);
    larger = more accurate extirpolation, still O(n log n).
    """
    t = np.asarray(t, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = len(t)
    # FFT bins k=1..nf must exist and the extirpolation needs headroom:
    # rfft yields ndim//2 + 1 bins, so ndim >= 2*nf; oversample by
    # grid_factor for accuracy
    ndim = 1 << max(int(math.ceil(math.log2(max(grid_factor * nf, 2 * nf)))),
                    4)
    df = step / (2.0 * math.pi)       # ordinary-frequency spacing
    fac = ndim * df                   # grid cells per unit time
    ck = ((t - t[0]) * fac) % ndim
    ckk = (2.0 * ck) % ndim           # doubled angle for the 2w sums
    wk1 = extirpolate(ck, y, ndim, macc)
    wk2 = extirpolate(ckk, np.ones(n), ndim, macc)
    f1 = np.fft.rfft(wk1)
    f2 = np.fft.rfft(wk2)
    k = np.arange(1, nf + 1)
    # numpy rfft uses e^{-i...}: conjugate to get sums of e^{+i w t}
    re1, im1 = f1.real[k], -f1.imag[k]    # sum y cos(wt), sum y sin(wt)
    re2, im2 = f2.real[k], -f2.imag[k]    # sum cos(2wt),  sum sin(2wt)
    with np.errstate(all="ignore"):
        hypo = np.hypot(re2, im2)
        hc2wt = 0.5 * re2 / hypo          # 0.5 cos(2 w tau)
        hs2wt = 0.5 * im2 / hypo          # 0.5 sin(2 w tau)
        cwt = np.sqrt(0.5 + hc2wt)        # cos(w tau)
        swt = np.copysign(np.sqrt(0.5 - hc2wt), hs2wt)   # sin(w tau)
        den = 0.5 * n + hc2wt * re2 + hs2wt * im2        # sum cos^2(w(t-tau))
        cterm = (cwt * re1 + swt * im1) ** 2 / den
        sterm = (cwt * im1 - swt * re1) ** 2 / (n - den)
        return 0.5 * (cterm + sterm)
