"""Sources: validated long-format readers.

The reference validates inputs at call time (finite t/m, non-NaN sigma,
sorted unique t — /root/reference/light-curve/src/check.rs:7-60); the engine
makes those batch-level guarantees at ingest so kernels can assume them
(SURVEY.md §2.1 "validation" rows).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["read_observations_parquet", "read_curves_csv",
           "validate_observations", "mag_to_flux"]

CSV_MAG_SCHEMA = T.StructType([
    T.StructField("time", T.DoubleType(), False),
    T.StructField("mag", T.DoubleType(), False),
    T.StructField("magerr", T.DoubleType(), False),
])


def validate_observations(obs: DataFrame, entity_col: str = "doc_id",
                          t_col: str = "t", m_col: str = "m",
                          sigma_col: Optional[str] = "sigma",
                          drop_duplicate_times: bool = True) -> DataFrame:
    """Finite t/m, non-NaN sigma, per-entity unique t (first row kept per
    duplicate time, matching the reference test loader's dedup —
    tests/test_w_bench.py:61-63)."""
    out = obs.filter(~F.isnan(t_col) & ~F.isnan(m_col)
                     & (F.abs(F.col(t_col)) != float("inf"))
                     & (F.abs(F.col(m_col)) != float("inf")))
    if sigma_col is not None and sigma_col in obs.columns:
        out = out.filter(~F.isnan(sigma_col))
    if drop_duplicate_times:
        w = Window.partitionBy(entity_col, t_col).orderBy(F.col(m_col).asc())
        out = (out.withColumn("_rn", F.row_number().over(w))
               .filter(F.col("_rn") == 1).drop("_rn"))
    return out


def read_observations_parquet(spark: SparkSession, path: str,
                              **validate_kwargs) -> DataFrame:
    return validate_observations(spark.read.parquet(path), **validate_kwargs)


def read_curves_csv(spark: SparkSession, path: str,
                    entity_from_filename: bool = True) -> DataFrame:
    """Per-object CSVs '(time, mag, magerr)' — the reference's test corpus
    format (tests/test_w_bench.py:51-81); entity id from the file name."""
    df = spark.read.csv(path, header=True, schema=CSV_MAG_SCHEMA)
    if entity_from_filename:
        df = df.withColumn(
            "doc_id",
            F.regexp_extract(F.input_file_name(), r"([^/]+)\.csv$", 1))
    return validate_observations(
        df.select("doc_id", F.col("time").alias("t"),
                  F.col("mag").alias("m"), F.col("magerr").alias("sigma")))


def mag_to_flux(obs: DataFrame, m_col: str = "m",
                sigma_col: str = "sigma") -> DataFrame:
    """Magnitude -> flux: flux = 10^(-0.4 m), fluxerr = 0.4 ln(10) σ flux
    (tests/test_w_bench.py:69-71)."""
    flux = F.pow(F.lit(10.0), F.lit(-0.4) * F.col(m_col))
    return (obs.withColumn("_flux", flux)
            .withColumn(sigma_col, F.lit(0.4 * 2.302585092994046)
                        * F.col(sigma_col) * F.col("_flux"))
            .withColumn(m_col, F.col("_flux")).drop("_flux"))
