"""Time-binning (the reference's ``Bins`` meta-feature as a DataFrame op).

Reference semantics (/root/reference/light-curve/light_curve/light_curve_py/
features/bins.py:14-40): tumbling windows of width ``window`` anchored at
``offset``; per bin, inverse-variance weighted magnitude
``new_m = Σ(m/σ²)/Σ(1/σ²)``, error ``new_σ = sqrt(count/Σ(1/σ²))``, and bin
center time ``offset + window·(k + ½)`` where ``k = floor((t-offset)/window)``
(closed form of the reference's digitize/delta arithmetic — derivation in
tests).  Output composes directly with FeatureExtractor, reproducing the
``Bins(features, window, offset)`` meta-feature as ``bin_series ∘ extract``.

Pure groupBy aggregate: map-side partial aggregation, one shuffle, exactly
SQL-expressible (DuckDB oracle in __spark_entry__).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bin_series"]


def bin_series(obs: DataFrame, entity_col: str = "doc_id", t_col: str = "t",
               m_col: str = "m", sigma_col: str = "sigma",
               window: float = 1.0, offset: float = 0.0,
               extra_keys: Optional[Sequence[str]] = None) -> DataFrame:
    """Returns (entity, t, m, sigma) re-binned; one row per non-empty bin."""
    if window <= 0:
        raise ValueError("window must be positive")
    k = F.floor((F.col(t_col) - F.lit(offset)) / F.lit(window))
    w = F.pow(F.col(sigma_col), F.lit(-2.0))
    keys = [entity_col] + list(extra_keys or [])
    return (
        obs.withColumn("_bin", k)
        .withColumn("_w", w)
        .groupBy(*keys, "_bin")
        .agg(
            (F.sum(F.col(m_col) * F.col("_w")) / F.sum("_w")).alias(m_col),
            # count only rows whose (m, w) actually entered the sums — a
            # null sigma/m row would inflate new_sigma (count(*) counts
            # it, the null-skipping sums do not)
            F.sqrt(F.count(F.when(F.col(m_col).isNotNull()
                                  & F.col("_w").isNotNull(), 1))
                   / F.sum("_w")).alias(sigma_col),
        )
        .withColumn(
            t_col,
            F.lit(offset) + F.lit(window) * (F.col("_bin") + F.lit(0.5)))
        .select(*keys, t_col, m_col, sigma_col)
    )
