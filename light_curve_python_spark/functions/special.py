"""Pure-numpy special functions (scipy is not available in this environment).

Provides vectorized double-precision ``erf``/``erfc`` (W. J. Cody's rational
approximations, max rel. error ~1e-16), the regularized incomplete gamma
functions (series + Lentz continued fraction, Numerical-Recipes style) used for
the chi-squared survival function, and the Hazen quantile that reproduces
``scipy.stats.mstats.mquantiles(..., alphap=0.5, betap=0.5)`` exactly
(reference usage: /root/reference/light-curve/light_curve/light_curve_py/
features/intpercrange.py:17-19).
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "erf",
    "erfc",
    "log_ndtr",
    "ndtr",
    "gammainc_upper_regularized",
    "chi2_sf",
    "hazen_quantile",
]

# --- Cody (1969) rational approximations for erf/erfc -----------------------

_ERF_A = np.array(
    [3.16112374387056560e00, 1.13864154151050156e02, 3.77485237685302021e02,
     3.20937758913846947e03, 1.85777706184603153e-1]
)
_ERF_B = np.array(
    [2.36012909523441209e01, 2.44024637934444173e02, 1.28261652607737228e03,
     2.84423683343917062e03]
)
_ERF_C = np.array(
    [5.64188496988670089e-1, 8.88314979438837594e00, 6.61191906371416295e01,
     2.98635138197400131e02, 8.81952221241769090e02, 1.71204761263407058e03,
     2.05107837782607147e03, 1.23033935479799725e03, 2.15311535474403846e-8]
)
_ERF_D = np.array(
    [1.57449261107098347e01, 1.17693950891312499e02, 5.37181101862009858e02,
     1.62138957456669019e03, 3.29079923573345963e03, 4.36261909014324716e03,
     3.43936767414372164e03, 1.23033935480374942e03]
)
_ERF_P = np.array(
    [3.05326634961232344e-1, 3.60344899949804439e-1, 1.25781726111229246e-1,
     1.60837851487422766e-2, 6.58749161529837803e-4, 1.63153871373020978e-2]
)
_ERF_Q = np.array(
    [2.56852019228982242e00, 1.87295284992346047e00, 5.27905102951428412e-1,
     6.05183413124413191e-2, 2.33520497626869185e-3]
)


def _erf_small(x: np.ndarray) -> np.ndarray:
    """erf for |x| <= 0.5."""
    z = x * x
    num = _ERF_A[4] * z
    den = z
    for i in range(3):
        num = (num + _ERF_A[i]) * z
        den = (den + _ERF_B[i]) * z
    return x * (num + _ERF_A[3]) / (den + _ERF_B[3])


def _erfc_mid(x: np.ndarray) -> np.ndarray:
    """erfc for 0.46875 <= x <= 4."""
    num = _ERF_C[8] * x
    den = x
    for i in range(7):
        num = (num + _ERF_C[i]) * x
        den = (den + _ERF_D[i]) * x
    result = (num + _ERF_C[7]) / (den + _ERF_D[7])
    z = np.floor(x * 16.0) / 16.0
    return np.exp(-z * z) * np.exp(-(x - z) * (x + z)) * result


def _erfc_large(x: np.ndarray) -> np.ndarray:
    """erfc for x > 4."""
    z = 1.0 / (x * x)
    num = _ERF_P[5] * z
    den = z
    for i in range(4):
        num = (num + _ERF_P[i]) * z
        den = (den + _ERF_Q[i]) * z
    poly = z * (num + _ERF_P[4]) / (den + _ERF_Q[4])
    poly = (1.0 / math.sqrt(math.pi) - poly) / x
    zz = np.floor(x * 16.0) / 16.0
    return np.exp(-zz * zz) * np.exp(-(x - zz) * (x + zz)) * poly


def erfc(x):
    x = np.asarray(x, dtype=np.float64)
    scalar = x.ndim == 0
    x = np.atleast_1d(x)
    ax = np.abs(x)
    # NaN-initialized (NOT np.empty): every mask below excludes NaN, so
    # an uninitialized buffer would return arbitrary memory for NaN
    # inputs; infinities get their exact limits (the large branch's
    # inf*inf - inf arithmetic would produce NaN)
    out = np.full_like(x, np.nan)
    out[x == np.inf] = 0.0
    out[x == -np.inf] = 2.0

    finite = np.isfinite(x)
    small = finite & (ax <= 0.46875)
    mid = finite & (ax > 0.46875) & (ax <= 4.0)
    large = finite & (ax > 4.0)

    if small.any():
        out[small] = 1.0 - _erf_small(x[small])
    if mid.any():
        v = _erfc_mid(ax[mid])
        xs = x[mid]
        out[mid] = np.where(xs < 0, 2.0 - v, v)
    if large.any():
        v = _erfc_large(ax[large])
        xs = x[large]
        out[large] = np.where(xs < 0, 2.0 - v, v)
    return out[0] if scalar else out


def erf(x):
    x = np.asarray(x, dtype=np.float64)
    scalar = x.ndim == 0
    x = np.atleast_1d(x)
    ax = np.abs(x)
    # NaN-initialized for the same reason as erfc; erf(+/-inf) = +/-1
    out = np.full_like(x, np.nan)
    finite = np.isfinite(x)
    out[x == np.inf] = 1.0
    out[x == -np.inf] = -1.0
    small = finite & (ax <= 0.46875)
    if small.any():
        out[small] = _erf_small(x[small])
    rest = finite & ~small
    if rest.any():
        out[rest] = 1.0 - erfc(ax[rest])
        out[rest] = np.where(x[rest] < 0, -out[rest], out[rest])
    return out[0] if scalar else out


def ndtr(x):
    """Standard normal CDF."""
    x = np.asarray(x, dtype=np.float64)
    return 0.5 * erfc(-x / math.sqrt(2.0))


def log_ndtr(x):
    """log of the standard normal CDF, stable in the left tail."""
    x = np.asarray(x, dtype=np.float64)
    # For moderately negative x, erfc is accurate; for x < -1e5 we would need
    # an asymptotic series, irrelevant for feature data.
    return np.log(ndtr(x))


# --- regularized incomplete gamma -------------------------------------------

def _gammainc_lower_series(a: float, x: float) -> float:
    """P(a, x) by series, x < a + 1."""
    gln = math.lgamma(a)
    ap = a
    summ = 1.0 / a
    delta = summ
    for _ in range(500):
        ap += 1.0
        delta *= x / ap
        summ += delta
        if abs(delta) < abs(summ) * 1e-15:
            break
    return summ * math.exp(-x + a * math.log(x) - gln)


def _gammainc_upper_cf(a: float, x: float) -> float:
    """Q(a, x) by Lentz continued fraction, x >= a + 1."""
    gln = math.lgamma(a)
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-15:
            break
    return math.exp(-x + a * math.log(x) - gln) * h


def _gammaincc_scalar(a: float, x: float) -> float:
    if x < 0 or a <= 0:
        raise ValueError("invalid arguments for gammaincc")
    if x == 0:
        return 1.0
    if x < a + 1.0:
        return 1.0 - _gammainc_lower_series(a, x)
    return _gammainc_upper_cf(a, x)


_gammaincc_vec = np.frompyfunc(_gammaincc_scalar, 2, 1)


def gammainc_upper_regularized(a, x):
    """Q(a, x) = Γ(a, x) / Γ(a)."""
    return np.asarray(_gammaincc_vec(a, x), dtype=np.float64)


def chi2_sf(x, df):
    """Chi-squared survival function, == scipy.stats.chi2.sf(x, df)."""
    return gammainc_upper_regularized(np.asarray(df, dtype=np.float64) / 2.0,
                                      np.asarray(x, dtype=np.float64) / 2.0)


# --- Hazen quantile ----------------------------------------------------------

def hazen_quantile(values: np.ndarray, q) -> np.ndarray:
    """Quantile with Hazen plotting positions (alphap=betap=0.5).

    Identical to ``scipy.stats.mstats.mquantiles(values, q, alphap=0.5,
    betap=0.5)`` and ``np.quantile(values, q, method="hazen")``; kept as an
    explicit implementation so kernels do not depend on the numpy version.
    """
    v = np.sort(np.asarray(values, dtype=np.float64))
    n = v.size
    q = np.atleast_1d(np.asarray(q, dtype=np.float64))
    pos = np.clip(q * n + 0.5 - 1.0, 0.0, n - 1.0)  # 0-based
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, n - 1)
    g = pos - lo
    return (1.0 - g) * v[lo] + g * v[hi]
