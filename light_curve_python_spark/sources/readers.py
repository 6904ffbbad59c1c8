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

# the entity_from_filename=False form: id carried as a column
CSV_MAG_SCHEMA_ID = T.StructType(
    [T.StructField("doc_id", T.StringType(), False)]
    + CSV_MAG_SCHEMA.fields)


def validate_observations(obs: DataFrame, entity_col: str = "doc_id",
                          t_col: str = "t", m_col: str = "m",
                          sigma_col: Optional[str] = "sigma",
                          drop_duplicate_times: bool = True) -> DataFrame:
    """Finite t/m, non-NaN sigma, per-entity unique t.

    DOCUMENTED DIVERGENCE from the reference test loader
    (tests/test_w_bench.py:61-63, np.unique first-occurrence): "first row
    in file order" is not a distributable notion (row order is not
    preserved across partitioned reads/shuffles), so duplicate times keep
    the row with the MINIMUM (m, sigma...) — a deterministic total order,
    stable across partitioning, task retries, and repeated runs, which
    is the property the engine's bit-exactness tests rely on."""
    out = obs.filter(~F.isnan(t_col) & ~F.isnan(m_col)
                     & (F.abs(F.col(t_col)) != float("inf"))
                     & (F.abs(F.col(m_col)) != float("inf")))
    if sigma_col is not None and sigma_col in obs.columns:
        out = out.filter(~F.isnan(sigma_col))
    if drop_duplicate_times:
        # total ordering over every non-key column: row_number over a
        # partial order would pick an arbitrary row among full ties
        tie_cols = [F.col(m_col).asc()] + [
            F.col(c).asc() for c in obs.columns
            if c not in (entity_col, t_col, m_col)]
        w = Window.partitionBy(entity_col, t_col).orderBy(*tie_cols)
        out = (out.withColumn("_rn", F.row_number().over(w))
               .filter(F.col("_rn") == 1).drop("_rn"))
    return out


def read_observations_parquet(spark: SparkSession, path: str,
                              **validate_kwargs) -> DataFrame:
    return validate_observations(spark.read.parquet(path), **validate_kwargs)


def read_curves_csv(spark: SparkSession, path: str,
                    entity_from_filename: bool = True) -> DataFrame:
    """Per-object CSVs '(time, mag, magerr)' — the reference's test corpus
    format (tests/test_w_bench.py:51-81); entity id from the file name
    (case-insensitive .csv/.csv.gz), or from a ``doc_id`` column when
    ``entity_from_filename=False``."""
    if entity_from_filename:
        df = spark.read.csv(path, header=True, schema=CSV_MAG_SCHEMA)
        df = df.withColumn(
            "doc_id",
            F.regexp_extract(F.input_file_name(),
                             r"([^/]+?)\.[cC][sS][vV](?:\.[gG][zZ])?$", 1))
        # a non-matching file name extracts '' — every such file's rows
        # would silently merge into one doc_id='' entity
        if df.filter(F.col("doc_id") == "").limit(1).count():
            raise ValueError(
                "file name does not end in .csv[.gz] — cannot derive "
                "doc_id; pass entity_from_filename=False with a doc_id "
                "column instead")
    else:
        df = spark.read.csv(path, header=True, schema=CSV_MAG_SCHEMA_ID)
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
