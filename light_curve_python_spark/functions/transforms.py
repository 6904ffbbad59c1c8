"""Value transforms applied to feature outputs.

Mirrors the reference's six transformers (/root/reference/light-curve/src/
transform.rs:11-143): arcsinh, clipped_lg, identity, lg, ln1p, sqrt.  In the
engine these are plain Spark column expressions (JVM-side, codegen'd), plus
numpy twins for kernel-side use and tests.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["TRANSFORMS", "apply_transform_column", "apply_transform_numpy"]

_LG10_EPS = 1e-30  # clipped_lg floor, mirrors transform.rs ClippedLg epsilon


TRANSFORMS = {
    "identity": (lambda c: c, lambda x: x),
    "arcsinh": (lambda c: F.asinh(c), np.arcsinh),
    "lg": (lambda c: F.log10(c), np.log10),
    "ln1p": (lambda c: F.log1p(c), np.log1p),
    "sqrt": (lambda c: F.sqrt(c), np.sqrt),
    "clipped_lg": (
        lambda c: F.log10(F.greatest(c, F.lit(_LG10_EPS))),
        lambda x: np.log10(np.maximum(x, _LG10_EPS)),
    ),
}


# per-feature default transforms, exactly as declared in the reference's
# evaluator! registrations (transform=True picks these); all other features
# default to identity:
DEFAULT_TRANSFORMS = {
    "anderson_darling_normal": "lg",      # src/features.rs:3420-3424
    "eta_e": "lg",                        # src/features.rs:3825
    "kurtosis": "arcsinh",                # src/features.rs:3900
    "maximum_slope": "clipped_lg",        # src/features.rs:4020
    "percent_difference_magnitude_percentile": "clipped_lg",  # :4108-4113
    "reduced_chi2": "ln1p",               # src/features.rs:4871
    "skew": "arcsinh",                    # src/features.rs:4875
}


def apply_transform_column(name: str, col: Column) -> Column:
    return TRANSFORMS[name][0](col)


def apply_transform_numpy(name: str, x):
    return TRANSFORMS[name][1](np.asarray(x, dtype=np.float64))
