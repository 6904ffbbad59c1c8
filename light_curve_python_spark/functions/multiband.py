"""Cross-band (multicolor) features.

Reference semantics (/root/reference/light-curve/src/features.rs:3665-3820):
- ColorOfMaximum/Median/Minimum(bands=[b0, b1]): ``agg(m | band==b0) -
  agg(m | band==b1)`` with agg in {max, median, min};
- ColorSpread(bands): population std-dev of the per-band inverse-variance
  weighted means.

Both shapes here: pure DataFrame (conditional aggregation / two-level agg,
single shuffle — for the SQL oracle and the zero-UDF path) and numpy kernels
registered as ``color_of_maximum`` etc. for the banded extractor path.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["color_features_sql", "color_spread_sql", "color_of",
           "color_spread"]


def color_features_sql(obs: DataFrame, band0: str, band1: str,
                       entity: str = "doc_id", m: str = "m",
                       band: str = "band") -> DataFrame:
    """color_of_{maximum,median,minimum} = agg(m|b0) - agg(m|b1), one
    conditional-aggregation pass."""
    def agg_for(b):
        cond = F.when(F.col(band) == b, F.col(m))
        return (F.max(cond), F.percentile(cond, F.lit(0.5)), F.min(cond))
    mx0, md0, mn0 = agg_for(band0)
    mx1, md1, mn1 = agg_for(band1)
    return obs.groupBy(entity).agg(
        (mx0 - mx1).alias("color_of_maximum"),
        (md0 - md1).alias("color_of_median"),
        (mn0 - mn1).alias("color_of_minimum"))


def color_spread_sql(obs: DataFrame, bands: Sequence[str],
                     entity: str = "doc_id", m: str = "m",
                     sigma: str = "sigma", band: str = "band") -> DataFrame:
    """Population std of per-band weighted means (two-level aggregation,
    both levels keyed by entity => one shuffle + a cheap regroup).

    Entities missing ANY of the requested bands emit NULL — the numpy
    twin (``color_spread``) raises/fills on an empty band, so a silent
    stddev over the present bands only (0.0 for a single band) would
    break the kernel≡SQL parity this module pairs."""
    w = F.pow(F.col(sigma), F.lit(-2.0))
    per_band = (obs.filter(F.col(band).isin(*list(bands)))
                .withColumn("_w", w)
                .groupBy(entity, band)
                .agg((F.sum(F.col(m) * F.col("_w")) / F.sum("_w"))
                     .alias("_wmean")))
    return per_band.groupBy(entity).agg(
        F.when(F.count("*") == len(bands),
               F.stddev_pop("_wmean")).alias("color_spread"))


# --- numpy forms (used by tests and custom per-group pipelines) -----------

def color_of(agg: str, m: np.ndarray, codes: np.ndarray,
             band0: int, band1: int) -> float:
    """Numpy form used by tests and custom pipelines."""
    fn = {"max": np.max, "median": np.median, "min": np.min}[agg]
    a = m[codes == band0]
    b = m[codes == band1]
    if len(a) == 0 or len(b) == 0:
        raise ValueError("empty band")
    return float(fn(a) - fn(b))


def color_spread(m: np.ndarray, sigma: np.ndarray, codes: np.ndarray,
                 n_bands: int) -> float:
    wmeans = []
    for b in range(n_bands):
        mask = codes == b
        if not mask.any():
            raise ValueError("empty band")
        w = sigma[mask] ** -2.0
        wmeans.append(float(np.dot(m[mask], w) / np.sum(w)))
    return float(np.std(wmeans))  # population std (ddof=0)
