"""Reference-shaped single-curve API — drop-in class façade over the
kernel registry.

A user of light-curve/light-curve-python writes::

    import light_curve as lc
    amplitude = lc.Amplitude()
    amplitude(t, m)                       # one curve, numpy in/out
    ext = lc.Extractor(lc.Amplitude(), lc.BeyondNStd(2.0))
    ext.many(lcs)

This module lets that code run against this engine by swapping the
import (``from light_curve_python_spark import compat as lc``): every
registry kernel is exposed as a class named like the reference's
(``Amplitude``, ``BeyondNStd``, ``LaflerKinmanStringLength``,
``Chi2Pvar``, ``BazinFit``, …) with the reference call contract
(``feature(t, m, sigma=None, band=None, *, sorted=None, check=True,
fill_value=None)`` — _base.py:93-95 — including the per-band ``bands=``
evaluation of BaseSingleBandFeature, _base.py:108-166, and the
sorted/check normalization of _base.py:49-91).  ``many`` is a serial
loop like the reference's pure-Python features (_base.py:97-105); the
PARALLEL path in this engine is Spark — every feature exposes
``to_spark()`` returning the ``(key, params)`` spec that
``FeatureExtractor`` consumes, so the scale-up is::

    ex = FeatureExtractor([f.to_spark() for f in features])
    ex.extract(obs_df)                    # distributed

``DmDt`` mirrors the reference's map constructor + points/gausses/
count_dt (src/dmdt.rs), ``Bins`` the rebinning meta-feature
(light_curve_py/features/bins.py), and ``RainbowFit`` wraps
``rainbow_fit_arrays``.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from .functions.kernels import (ensure_lazy_factories, evaluate_kernel,
                                make_kernel)

__all__ = ["Extractor", "DmDt", "Bins", "RainbowFit",
           "feature_from_json"]  # + generated below


def _normalize_input(t, m, sigma, band, sorted, check):
    """The reference's _normalize_input (_base.py:49-91): finite checks,
    unique/sorted validation when ``sorted=None``, argsort when
    ``sorted=False``."""
    t = np.asarray(t, dtype=np.float64)
    m = np.asarray(m, dtype=np.float64)
    if sigma is not None:
        sigma = np.asarray(sigma, dtype=np.float64)
    if band is not None:
        band = np.asarray(band)
        if band.ndim != 1:
            raise ValueError("band must be None or 1D array-like")
    if check:
        if np.any(~np.isfinite(t)):
            raise ValueError("t values must be finite")
        if np.any(~np.isfinite(m)):
            raise ValueError("m values must be finite")
        if sigma is not None and np.any(np.isnan(sigma)):
            raise ValueError("sigma must have no NaNs")
    if sorted is None:
        diff = np.diff(t)
        if np.any(diff == 0):
            raise ValueError("t must be unique")
        if np.any(diff < 0):
            raise ValueError("t must be sorted")
    elif not sorted:
        idx = np.argsort(t, kind="stable")
        t, m = t[idx], m[idx]
        if sigma is not None:
            sigma = sigma[idx]
        if band is not None:
            band = band[idx]
    return t, m, sigma, band


def _resolve_transform(key: str, transform) -> Optional[str]:
    """The reference's transform argument (src/transform.rs:106-140):
    None/False → identity; True/'default' → the feature's stock
    transformer; a name string → that transformer.  Transformed outputs
    keep their column names (the engine-wide convention, matching
    FeatureExtractor(transforms=...))."""
    if transform is None or transform is False:
        return None
    from .functions.transforms import DEFAULT_TRANSFORMS, TRANSFORMS
    if transform is True or transform == "default":
        name = DEFAULT_TRANSFORMS.get(key, "identity")
    elif isinstance(transform, str):
        name = transform
    else:
        raise ValueError(
            f"transform must be None, a bool or a str, "
            f"not {type(transform).__name__}")
    if name not in TRANSFORMS:
        raise ValueError(f"Unknown transformation: {name}")
    return None if name == "identity" else name


class _FeatureBase:
    """Shared call/many contract; subclasses set ``_key`` and params."""

    _key: str = ""

    def __init__(self, *args, bands: Optional[Sequence[str]] = None,
                 transform=None, **kwargs):
        if len(args) > len(self._param_names):
            raise TypeError(
                f"{type(self).__name__} takes at most "
                f"{len(self._param_names)} positional arguments "
                f"({len(args)} given)")
        params = dict(zip(self._param_names, args))
        overlap = set(params) & set(kwargs)
        if overlap:
            raise TypeError(f"duplicate arguments: {sorted(overlap)}")
        params.update(kwargs)
        self._params = params
        self._bands = list(bands) if bands is not None else None
        self._transform = _resolve_transform(self._key, transform)
        self._kernel = make_kernel(self._key, **params)

    # -- reference property surface ---------------------------------
    @property
    def names(self):
        base = self._kernel.names
        if self._bands is None:
            return base
        return tuple(f"{n}_{b}" for b in self._bands for n in base)

    @property
    def size(self):
        return len(self.names)

    @property
    def is_band_required(self):
        return self._bands is not None

    # -- evaluation --------------------------------------------------
    def _eval_arrays(self, t, m, sigma, fill_value):
        from .functions.kernels import EVAL_ERRORS
        try:
            out = evaluate_kernel(self._kernel, t, m, sigma,
                                  fill_value=None)
        except EVAL_ERRORS as e:
            # the reference propagates the error when fill_value is None
            # and fills UNTRANSFORMED otherwise (fill wraps the
            # transformed evaluator, features.rs:1374-1379)
            if fill_value is None:
                raise e
            return np.full(self._kernel.size, float(fill_value))
        if self._transform is not None:
            from .functions.transforms import apply_transform_numpy
            out = apply_transform_numpy(self._transform, out)
        return out

    def __call__(self, t, m, sigma=None, band=None, *, sorted=None,
                 check=True, fill_value=None):
        t, m, sigma, band = _normalize_input(t, m, sigma, band, sorted,
                                             check)
        if self._bands is None:
            if band is not None:
                # reference parity (_base.py:58-63): a band-less feature
                # instance must REJECT band input, not silently evaluate
                # over the mixed multi-band magnitudes
                raise ValueError(
                    "(band != None) is not supported by this feature "
                    "instance; construct it with bands=[...]")
            out = self._eval_arrays(t, m, sigma, fill_value)
            # size-1 single-band returns a scalar, like the reference's
            # pure-Python features
            return float(out[0]) if len(out) == 1 else out
        if band is None:
            raise ValueError("band is required")
        parts = []
        for b in self._bands:
            mask = band == b
            sb = None if sigma is None else sigma[mask]
            parts.append(np.atleast_1d(
                self._eval_arrays(t[mask], m[mask], sb, fill_value)))
        return np.concatenate(parts)

    def many(self, lcs, *, sorted=None, check=True, fill_value=None,
             n_jobs=1, spark=None):
        """Bulk evaluation.  Without ``spark``: a serial loop (the
        reference's pure-Python ``many``, _base.py:97-105; ``n_jobs`` is
        accepted for source compatibility and ignored).  With a
        SparkSession: the curves are normalized driver-side, shipped as
        ONE long-format DataFrame, and evaluated by FeatureExtractor's
        grouped Arrow path — the reference's rayon fan-out, on Spark."""
        if spark is not None:
            return _many_spark(spark, [self], lcs, sorted, check,
                               fill_value)
        return np.stack([
            np.atleast_1d(self(*lc, sorted=sorted, check=check,
                               fill_value=fill_value)) for lc in lcs])

    # -- spark bridge ------------------------------------------------
    def to_spark(self):
        """The ``(key, params)`` spec ``FeatureExtractor`` consumes."""
        return (self._key, dict(self._params)) if self._params \
            else self._key

    # -- serialization (the reference's pickle + JSON surface) --------
    def _spec(self):
        return {"name": type(self).__name__, "params": dict(self._params),
                "bands": self._bands, "transform": self._transform,
                "extra": {k: getattr(self, k)
                          for k in getattr(self, "_extra_state", ())}}

    def __reduce__(self):
        # kernels close over lambdas, so pickle ships the SPEC and
        # rebuilds the kernel on load (the same device as plans/spec.py)
        return (_feature_from_spec, (self._spec(),))

    def to_json(self) -> str:
        """Engine-format JSON spec (NOT the reference's serde format —
        cross-engine JSON was never portable); load with
        ``feature_from_json``."""
        import json

        def _default(o):
            # numpy scalars/arrays in params (init, bounds, freqs, ...)
            if isinstance(o, np.generic):
                return o.item()
            if isinstance(o, np.ndarray):
                return o.tolist()
            raise TypeError(f"{type(o).__name__} is not JSON serializable")

        return json.dumps(self._spec(), default=_default)

    def __repr__(self):
        args = ", ".join(f"{k}={v!r}" for k, v in self._params.items())
        return f"{type(self).__name__}({args})"


def _camel(key: str) -> str:
    return "".join(p.capitalize() for p in key.split("_"))


def _feature_from_spec(spec: dict):
    """Rebuild a facade feature from its serialized spec (pickle/JSON)."""
    import sys
    cls = getattr(sys.modules[__name__], spec["name"])
    obj = object.__new__(cls)
    obj._params = dict(spec["params"])
    obj._bands = spec["bands"]
    obj._transform = spec["transform"]
    obj._kernel = make_kernel(cls._key, **obj._params)
    for k, v in spec.get("extra", {}).items():
        setattr(obj, k, v)
    return obj


def feature_from_json(s: str):
    """Inverse of ``Feature.to_json`` (the reference's
    JsonDeserializedFeature role, for THIS engine's spec format)."""
    import json
    return _feature_from_spec(json.loads(s))


def _make_class(key: str):
    import inspect

    from .functions.kernels import KERNEL_FACTORIES
    factory = KERNEL_FACTORIES[key]
    param_names = [p for p in inspect.signature(factory).parameters]
    cls = type(_camel(key), (_FeatureBase,),
               {"_key": key, "_param_names": tuple(param_names),
                "__doc__": f"Reference-compat façade for the "
                           f"'{key}' kernel."})
    return cls


class _FitBase(_FeatureBase):
    """Reference fit-class ctor shape (features.rs:3096-3110):
    ``Fit(algorithm, *, mcmc_niter=..., lmsder_niter=..., init=None,
    bounds=None, ln_prior=None, ...)``.  Every algorithm maps onto this
    engine's pure-numpy LM multi-start (the documented optimizer
    divergence — see SURVEY §9); the per-algorithm iteration knobs are
    accepted for source compatibility and folded into ``max_iter``."""

    _FIT_PARAMS = ("init", "bounds", "max_iter", "ln_prior")
    _extra_state = ("algorithm",)

    def __init__(self, algorithm: str = "mcmc-lmsder", *,
                 init=None, bounds=None, ln_prior=None, max_iter=100,
                 mcmc_niter=None, lmsder_niter=None, ceres_niter=None,
                 ceres_loss_reg=None, nuts_ntune=None, nuts_niter=None,
                 transform=None, bands=None):
        if not isinstance(algorithm, str) or not algorithm:
            raise ValueError("algorithm must be a non-empty string")
        # transform=False (and None) request identity — exactly what the
        # facade does anyway; only a GENUINE transformer request is the
        # unsupported divergence
        if transform not in (None, False):
            raise ValueError(
                "transform is not supported by the compat façade; use "
                "FeatureExtractor(..., transforms=...) on the Spark path")
        self.algorithm = algorithm
        # the reference's fit transformers are a documented divergence
        # (transforms.py DEFAULT_TRANSFORMS note) — identity here
        self._transform = None
        # the per-algorithm iteration knobs steer the single LM budget:
        # the largest explicitly-passed knob wins over the default
        knobs = [k for k in (mcmc_niter, lmsder_niter, ceres_niter,
                             nuts_niter) if k is not None]
        if knobs:
            max_iter = max(int(k) for k in knobs)
        params = {"max_iter": max_iter}
        if init is not None:
            params["init"] = init
        if bounds is not None:
            params["bounds"] = bounds
        if ln_prior is not None:
            params["ln_prior"] = ln_prior
        self._params = params
        self._bands = list(bands) if bands is not None else None
        self._kernel = make_kernel(self._key, **params)


_FIT_KEYS = ("bazin_fit", "villar_fit", "linexp_fit")

# generate one class per registry kernel (incl. the lazily registered
# fit kernels) under the reference's names
for _k in _FIT_KEYS:
    ensure_lazy_factories(_k)
from .functions.kernels import KERNEL_FACTORIES as _KF  # noqa: E402

for _key in sorted(_KF):
    if _key == "rainbow_fit":
        continue  # multiband; wrapped explicitly below
    if _key in _FIT_KEYS:
        _cls = type(_camel(_key), (_FitBase,), {"_key": _key})
    else:
        _cls = _make_class(_key)
    globals()[_cls.__name__] = _cls
    __all__.append(_cls.__name__)


def _many_spark(spark, features, lcs, sorted, check, fill_value):
    """Distributed ``many``: one long-format DataFrame over all curves,
    FeatureExtractor's grouped Arrow evaluation, results re-assembled in
    input order.  Restricted to band-less features (the per-band facade
    evaluation would need a band column per member); per-feature
    transforms are carried through FeatureExtractor's transforms dict."""
    from .operators.extract import FeatureExtractor
    import pandas as pd
    # build the specs FIRST: Bins / color features (which inherit this
    # ``many``) raise their to_spark() guidance NotImplementedError here
    # instead of an AttributeError on ``_bands`` below
    specs = [f.to_spark() for f in features]
    if any(f._bands is not None for f in features):
        raise ValueError("many(spark=...) supports band-less features; "
                         "use FeatureExtractor(bands=...) directly")
    # FeatureExtractor applies transforms PER KERNEL KEY and emits one
    # column per output NAME — two features sharing a key must agree on
    # the transform (incl. None), and output names must be distinct, or
    # the distributed result silently diverges from the serial loop
    transforms = {}
    seen_transform = {}
    for f in features:
        if f._key in seen_transform and \
                seen_transform[f._key] != f._transform:
            raise ValueError(
                f"conflicting transforms for kernel '{f._key}'")
        seen_transform[f._key] = f._transform
        if f._transform is not None:
            transforms[f._key] = f._transform
    out_names = [n for f in features for n in f.names]
    if len(set(out_names)) != len(out_names):
        dup = sorted({n for n in out_names if out_names.count(n) > 1})
        raise ValueError(
            f"duplicate feature output names {dup}: many(spark=...) "
            "needs distinct columns; deduplicate the features")
    if not lcs:
        raise ValueError("many(spark=...) needs at least one light curve")
    norm = [_normalize_input(*(list(lc) + [None] * (3 - len(lc))),
                             band=None, sorted=sorted, check=check)
            for lc in lcs]
    has_sigma = all(s is not None for _, _, s, _ in norm)
    if not has_sigma and any(s is not None for _, _, s, _ in norm):
        # the serial loop uses sigma per-curve; the long-format frame is
        # all-or-nothing — dropping it silently would diverge
        raise ValueError("many(spark=...) requires sigma for all curves "
                         "or for none (mixed sigma would be dropped)")
    sizes = [len(t) for t, _, _, _ in norm]
    pdf = pd.DataFrame({
        "_lc_id": np.repeat(np.arange(len(norm)), sizes),
        "t": np.concatenate([t for t, _, _, _ in norm]) if norm else [],
        "m": np.concatenate([m for _, m, _, _ in norm]) if norm else [],
    })
    if has_sigma:
        pdf["sigma"] = np.concatenate([s for _, _, s, _ in norm])
    if transforms and fill_value is not None and \
            not (isinstance(fill_value, float) and np.isnan(fill_value)):
        # the Spark path applies transforms column-wise AFTER the fill,
        # the serial facade fills UNTRANSFORMED — identical for NaN
        # fills, divergent for finite ones
        raise ValueError("many(spark=...) with transformed features "
                         "supports only fill_value=None/NaN")
    fe = FeatureExtractor(specs, fill_value=fill_value,
                          transforms=transforms or None)
    out = fe.extract(spark.createDataFrame(pdf), entity_col="_lc_id",
                     sigma_col="sigma" if has_sigma else None)         .toPandas().sort_values("_lc_id")
    if list(out["_lc_id"]) != list(range(len(norm))):
        raise RuntimeError("curves lost in the distributed many() "
                           "(empty inputs produce no group)")
    return out[fe.names].to_numpy(dtype=np.float64)


def _periodogram_freq_power(self, t, m, *, sorted=None, check=True):
    """The reference's ``Periodogram.freq_power(t, m)``
    (src/features.rs:4493-4512): the raw (freqs, power) grid for one
    curve, honoring the instance's grid/normalization parameters.  The
    distributed form is ``operators.spectral.periodogram_freq_power``."""
    from .functions.kernels import periodogram_power
    t, m, _, _ = _normalize_input(t, m, None, None, sorted, check)
    # the kernel's params dict carries the EFFECTIVE values — self._params
    # holds only explicitly-passed kwargs, and periodogram_power's own
    # defaults differ from the factory's (fast=False vs fast=True)
    kw = {k: v for k, v in self._kernel.params.items()
          if k in ("resolution", "max_freq_factor", "nyquist",
                   "normalization", "freqs", "fast")}
    return periodogram_power(t, m, **kw)


Periodogram.freq_power = _periodogram_freq_power  # noqa: F821


class Extractor:
    """Reference Extractor (light_curve_py/features/extractor.py):
    evaluates each member feature and concatenates outputs."""

    def __init__(self, *features):
        self.features = features

    @property
    def names(self):
        return tuple(n for f in self.features for n in f.names)

    @property
    def size(self):
        return sum(f.size for f in self.features)

    def __call__(self, t, m, sigma=None, band=None, *, sorted=None,
                 check=True, fill_value=None):
        return np.concatenate([
            np.atleast_1d(f(t, m, sigma, band, sorted=sorted, check=check,
                            fill_value=fill_value))
            for f in self.features])

    def many(self, lcs, *, sorted=None, check=True, fill_value=None,
             n_jobs=1, spark=None):
        if spark is not None:
            return _many_spark(spark, list(self.features), lcs, sorted,
                               check, fill_value)
        return np.stack([self(*lc, sorted=sorted, check=check,
                              fill_value=fill_value) for lc in lcs])

    def to_spark(self):
        return [f.to_spark() for f in self.features]

    def __reduce__(self):
        return (Extractor, tuple(self.features))


class Bins:
    """The reference Bins meta-feature (light_curve_py/features/bins.py;
    same semantics as operators/bins.py `bin_series`): rebin into
    ``window``-wide bins anchored at ``offset`` — m = inverse-variance
    weighted mean, sigma = sqrt(count / sum w), t = bin center — then
    evaluate the inner features on the binned curve."""

    def __init__(self, features, window: float = 1.0,
                 offset: float = 0.0):
        if window <= 0:
            raise ValueError("window must be positive")
        self.extractor = features if isinstance(features, Extractor) \
            else Extractor(*features)
        self.window = float(window)
        self.offset = float(offset)

    @property
    def names(self):
        return tuple(f"bins_window{self.window}_offset{self.offset}_{n}"
                     for n in self.extractor.names)

    @property
    def size(self):
        return self.extractor.size

    def _rebin(self, t, m, sigma):
        k = np.floor((t - self.offset) / self.window).astype(np.int64)
        uk = np.unique(k)
        w = sigma ** -2.0
        bt = self.offset + self.window * (uk + 0.5)
        bm = np.empty(len(uk))
        bs = np.empty(len(uk))
        for i, b in enumerate(uk):
            mask = k == b
            sw = w[mask].sum()
            bm[i] = (m[mask] * w[mask]).sum() / sw
            bs[i] = np.sqrt(np.count_nonzero(mask) / sw)
        return bt, bm, bs

    def __call__(self, t, m, sigma=None, band=None, *, sorted=None,
                 check=True, fill_value=None):
        if sigma is None:
            raise ValueError("Bins requires sigma")
        t, m, sigma, _ = _normalize_input(t, m, sigma, None, sorted, check)
        bt, bm, bs = self._rebin(t, m, sigma)
        return self.extractor(bt, bm, bs, sorted=True, check=False,
                              fill_value=fill_value)

    many = _FeatureBase.many

    def to_spark(self):
        raise NotImplementedError(
            "Bins is a rebinning meta-feature; on the Spark path compose "
            "operators.bins.bin_series(df, window=..., offset=...) with "
            "FeatureExtractor(inner.to_spark()) instead of a spec tuple")


class _ReusableBatches:
    """Reusable iterable, like the reference's ``*Batches`` objects
    ("Gives a reusable iterable", dmdt.rs:851-854): every ``iter()``
    yields one fresh epoch.  The RNG lives on the object and its stream
    continues across epochs, as the reference's shared Xoshiro does —
    re-iterating with ``shuffle``/``drop_nobs`` draws new permutations."""

    def __init__(self, gen_fn, random_seed):
        self._gen_fn = gen_fn
        self._rng = np.random.default_rng(random_seed)

    def __iter__(self):
        return self._gen_fn(self._rng)


class DmDt:
    """Reference DmDt map (src/dmdt.rs) over this engine's kernels:
    ``from_borders`` constructor, ``points`` / ``gausses`` /
    ``count_dt`` (+ ``*_many`` serial loops).  ``norm`` accepts the
    reference's ('dt', 'max') subsets."""

    def __init__(self, dt_edges, dm_edges, norm=()):
        from .operators.dmdt import grid_edges
        self.dt_edges = grid_edges(dt_edges, "asis")
        self.dm_edges = grid_edges(dm_edges, "asis")
        self.norm = tuple(norm)
        unknown = set(self.norm) - {"dt", "max"}
        if unknown:
            raise ValueError(f"unknown norm values {sorted(unknown)}; "
                             f"supported: 'dt', 'max'")

    # reference getters (src/dmdt.rs:1083-1133)
    shape = property(lambda self: (len(self.dt_edges) - 1,
                                   len(self.dm_edges) - 1))
    dt_grid = property(lambda self: self.dt_edges)
    dm_grid = property(lambda self: self.dm_edges)
    min_dt = property(lambda self: float(self.dt_edges[0]))
    max_dt = property(lambda self: float(self.dt_edges[-1]))
    min_dm = property(lambda self: float(self.dm_edges[0]))
    max_dm = property(lambda self: float(self.dm_edges[-1]))

    @classmethod
    def from_borders(cls, min_lgdt, max_lgdt, lgdt_size, max_abs_dm,
                     dm_size, norm=()):
        from .operators.dmdt import from_borders
        dt, dm = from_borders(min_lgdt, max_lgdt, lgdt_size, max_abs_dm,
                              dm_size)
        return cls(dt, dm, norm)

    def _normed(self, hist, t):
        from .operators.dmdt import count_dt_kernel, normalize_dmdt
        if not self.norm:
            return hist
        dtc = count_dt_kernel(t, self.dt_edges) if "dt" in self.norm \
            else None
        return normalize_dmdt(hist, self.norm, dt_counts=dtc)

    def points(self, t, m, sorted=None):
        from .operators.dmdt import dmdt_points_kernel
        t, m, _, _ = _normalize_input(t, m, None, None, sorted, True)
        return self._normed(
            dmdt_points_kernel(t, m, self.dt_edges, self.dm_edges), t)

    def gausses(self, t, m, sigma, sorted=None):
        from .operators.dmdt import dmdt_gausses_kernel
        t, m, sigma, _ = _normalize_input(t, m, sigma, None, sorted, True)
        return self._normed(
            dmdt_gausses_kernel(t, m, sigma, self.dt_edges,
                                self.dm_edges), t)

    def count_dt(self, t, sorted=None):
        from .operators.dmdt import count_dt_kernel
        t, _, _, _ = _normalize_input(t, np.zeros(len(t)), None, None,
                                      sorted, True)
        return count_dt_kernel(t, self.dt_edges)

    def points_many(self, lcs, sorted=None):
        return np.stack([self.points(t, m, sorted) for t, m in lcs])

    def gausses_many(self, lcs, sorted=None):
        return np.stack([self.gausses(t, m, s, sorted)
                         for t, m, s in lcs])

    def count_dt_many(self, ts, sorted=None):
        return np.stack([self.count_dt(t, sorted) for t in ts])

    # -- batch iterators (src/dmdt.rs:244-283 GenericDmDtBatches) -----
    def _batches(self, lcs, eval_one, batch_size, yield_index, shuffle,
                 drop_nobs, random_seed):
        # validate at CALL time (the reference rejects the argument up
        # front, dmdt.rs:476-481); accept numpy scalars like the
        # reference's pyo3 extraction does
        if isinstance(drop_nobs, (bool, np.bool_)) or not isinstance(
                drop_nobs, (int, float, np.integer, np.floating)):
            raise TypeError("drop_nobs must be an int or a float")
        if isinstance(drop_nobs, (float, np.floating)):
            drop_nobs = float(drop_nobs)
            if not 0.0 <= drop_nobs < 1.0:
                raise ValueError(
                    "if drop_nobs is float, it must be in [0.0, 1.0)")
        else:
            drop_nobs = int(drop_nobs)
            if drop_nobs < 0:
                raise ValueError("drop_nobs must be non-negative")
        return _ReusableBatches(
            lambda rng: self._batches_gen(lcs, eval_one, batch_size,
                                          yield_index, shuffle, drop_nobs,
                                          rng), random_seed)

    def _batches_gen(self, lcs, eval_one, batch_size, yield_index,
                     shuffle, drop_nobs, rng):
        """The reference's batches contract: iterate the curves once (one
        epoch) in ``batch_size`` groups, optionally shuffled, each curve
        eroded by ``drop_nobs`` observations (int count or
        ``round(frac*n)``, uniform without replacement, survivors in time
        order; dropping >= n raises — dmdt.rs:495-520).  RNG is numpy's
        seeded Generator rather than Xoshiro256++: same distributional
        contract, different stream.  At scale the same erosion is
        ``operators.dmdt.erode_observations`` (deterministic md5-rank)."""
        order = rng.permutation(len(lcs)) if shuffle \
            else np.arange(len(lcs))
        for lo in range(0, len(lcs), batch_size):
            idx = order[lo:lo + batch_size]
            maps = []
            for i in idx:
                arrays = [np.asarray(a, dtype=np.float64)
                          for a in lcs[i]]
                n = len(arrays[0])
                # half-AWAY rounding (the reference's f64::round and
                # erode_observations' Spark round), NOT Python's
                # banker's round — at frac*n == x.5 they differ
                drop = drop_nobs if isinstance(drop_nobs, int) \
                    else int(np.floor(drop_nobs * n + 0.5))
                if drop >= n:
                    raise ValueError(
                        f"cannot drop {drop} observations from light "
                        f"curve containing {n} points")
                if drop > 0:
                    keep = np.sort(rng.choice(n, n - drop, replace=False))
                    arrays = [a[keep] for a in arrays]
                maps.append(eval_one(*arrays))
            batch = np.stack(maps)
            yield (idx, batch) if yield_index else batch

    def points_batches(self, lcs, *, sorted=None, batch_size=1,
                       yield_index=False, shuffle=False, drop_nobs=0,
                       random_seed=None):
        return self._batches(
            lcs, lambda t, m: self.points(t, m, sorted), batch_size,
            yield_index, shuffle, drop_nobs, random_seed)

    def gausses_batches(self, lcs, *, sorted=None, batch_size=1,
                        yield_index=False, shuffle=False, drop_nobs=0,
                        random_seed=None):
        return self._batches(
            lcs, lambda t, m, s: self.gausses(t, m, s, sorted),
            batch_size, yield_index, shuffle, drop_nobs, random_seed)


class _ColorBase:
    """Reference multiband color features (features.rs:3676-3782):
    ``ColorOf*(bands)`` with exactly two passbands, output
    ``agg(m[bands[0]]) - agg(m[bands[1]])``; ``ColorSpread(bands)`` with
    >= 2 passbands, population std of the per-band weighted means.
    Backed by functions/multiband.py's numpy forms (the Spark twins are
    color_features_sql / color_spread_sql)."""

    _agg: Optional[str] = None  # None => spread

    def __init__(self, bands, *, transform=None):
        bands = list(bands)
        if self._agg is not None and len(bands) != 2:
            raise ValueError(f"bands must contain exactly 2 passbands, "
                             f"got {len(bands)}")
        if self._agg is None and len(bands) < 2:
            raise ValueError(f"bands must contain at least 2 passbands, "
                             f"got {len(bands)}")
        if transform is not None:
            # the reference rejects transform for color features
            # (features.rs color_two_band_feature! / ColorSpread __new__)
            raise NotImplementedError(
                f"{type(self).__name__} does not support transform")
        self.bands = bands

    @property
    def names(self):
        if self._agg is not None:
            return (f"color_{self._agg}_{self.bands[0]}_{self.bands[1]}",)
        return ("color_spread_" + "_".join(self.bands),)

    size = property(lambda self: 1)

    def __call__(self, t, m, sigma=None, band=None, *, sorted=None,
                 check=True, fill_value=None):
        from .functions.kernels import EVAL_ERRORS
        from .functions.multiband import color_of, color_spread
        t, m, sigma, band = _normalize_input(t, m, sigma, band, sorted,
                                             check)
        if band is None:
            raise ValueError("band is required")
        if self._agg is None and sigma is None:
            # usage error — raise even under fill_value (only data-shaped
            # evaluation failures fill)
            raise ValueError("ColorSpread requires sigma")
        codes = np.full(len(band), -1, dtype=np.int8)
        for i, b in enumerate(self.bands):
            codes[band == b] = i
        try:
            if self._agg is not None:
                out = color_of(self._agg, m, codes, 0, 1)
            else:
                out = color_spread(m, sigma, codes, len(self.bands))
            if not np.isfinite(out):
                raise ValueError("non-finite output")
        except EVAL_ERRORS:
            if fill_value is None:
                raise
            return float(fill_value)
        return out

    many = _FeatureBase.many

    def to_spark(self):
        raise NotImplementedError(
            "color features are DataFrame-level multiband ops on the "
            "Spark path; use functions.multiband.color_features_sql / "
            "color_spread_sql instead of a spec tuple")


class ColorOfMaximum(_ColorBase):
    _agg = "max"


class ColorOfMedian(_ColorBase):
    _agg = "median"


class ColorOfMinimum(_ColorBase):
    _agg = "min"


class ColorSpread(_ColorBase):
    _agg = None


__all__ += ["ColorOfMaximum", "ColorOfMedian", "ColorOfMinimum",
            "ColorSpread"]


class RainbowFit:
    """Reference RainbowFit façade over ``rainbow_fit_arrays``
    (functions/rainbow.py): multiband MAP fit of the Bazin × sigmoid-T ×
    Planck model."""

    def __init__(self, band_wave_cm: Dict[str, float], **opts):
        self.band_wave_cm = dict(band_wave_cm)
        self.opts = opts

    @classmethod
    def from_angstrom(cls, band_wave_aa: Dict[str, float], **opts):
        return cls({b: w * 1e-8 for b, w in band_wave_aa.items()}, **opts)

    @property
    def size(self):
        """Output length = params (+ per-band baselines) (+ one error per
        parameter when with_errors) + r_chisq — the exact layout of
        rainbow_fit_arrays (rainbow.py:578)."""
        from .functions.rainbow import rainbow_param_names
        n_par = len(rainbow_param_names(
            self.opts.get("bolometric", "bazin"),
            self.opts.get("temperature", "sigmoid"),
            self.opts.get("spectral", "planck")))
        if self.opts.get("with_baseline", True):
            n_par += len(self.band_wave_cm)
        return n_par * (2 if self.opts.get("with_errors") else 1) + 1

    def __call__(self, t, m, sigma, band, *, sorted=None, check=True,
                 fill_value=None, upper_mask=None):
        from .functions.kernels import EVAL_ERRORS
        from .functions.rainbow import rainbow_fit_arrays
        if upper_mask is not None and (sorted is not None and not sorted):
            # _normalize_input argsorts t/m/sigma/band below; permute the
            # mask by the same stable order so it stays aligned (validate
            # the length first — a too-long mask would otherwise be
            # silently truncated by the fancy index and slip past
            # rainbow_fit_arrays' shape check)
            upper_mask = np.asarray(upper_mask, bool)
            tt = np.asarray(t, dtype=np.float64)
            if upper_mask.shape != tt.shape:
                raise ValueError("upper_mask must align with t/m/sigma")
            upper_mask = upper_mask[np.argsort(tt, kind="stable")]
        t, m, sigma, band = _normalize_input(t, m, sigma, band, sorted,
                                             check)
        try:
            return rainbow_fit_arrays(t, m, sigma, band,
                                      self.band_wave_cm,
                                      upper_mask=upper_mask, **self.opts)
        except EVAL_ERRORS:
            if fill_value is None:
                raise
            return np.full(self.size, float(fill_value))
