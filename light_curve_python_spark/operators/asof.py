"""Point-in-time (as-of) join — DataFrame-native, single shuffle.

The reference never joins (its API receives pre-sliced arrays); this operator
supplies the slicing contract the reference assumes: for each probe
``(entity, ts)`` the matched observation is the latest row with ``t <= ts``
(zero temporal leakage; sortedness contract per
/root/reference/light-curve/src/check.rs:14-33).

Implementation: tagged union of probes and observations, one
``repartition(entity)`` shuffle, a running ``last(..., ignorenulls)`` window —
no join explosion, no per-row Python.  Semantics match DuckDB's
``ASOF JOIN`` (backward, inclusive), which is exactly the oracle the driver
runs against it.

At 100 TB: the union+window plan shuffles each side once on the entity key and
sorts within partitions — the same cost profile as a sort-merge join but
without the O(probes×obs) candidate blowup of a range-condition theta join.
AQE skew-join cannot split an ordered window, so heavily skewed keys should be
pre-bucketed by time range if one entity dominates (see
``FeatureExtractor._salt`` for the kernel path, which can).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(probes: DataFrame, obs: DataFrame, on: Sequence[str] | str,
              left_ts: str = "ts", right_ts: str = "t",
              value_cols: Optional[Sequence[str]] = None,
              tolerance: Optional[float] = None,
              suffix: str = "_asof") -> DataFrame:
    """For each probe row, attach the latest observation at or before its
    timestamp (per key).  Returns all probe columns plus
    ``{value_col}{suffix}`` columns and ``{right_ts}{suffix}`` (the matched
    observation time, null when no match).

    tolerance: maximum allowed ``ts - t`` (match older than that -> null),
    mirroring ``pandas.merge_asof(tolerance=...)``.

    NULL handling mirrors DuckDB ASOF / pandas merge_asof: observations
    with a NULL ``right_ts`` or NULL key never match; probes with NULL
    keys are kept with no-match (NULL) asof columns.  Among observations
    TIED on ``right_ts``, the matched row is arrival-order-dependent
    (same as both oracles) — dedupe or pre-aggregate tied observation
    timestamps if reproducibility across retries matters.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [c for c in obs.columns
                      if c not in keys and c != right_ts]
    value_cols = list(value_cols)

    overlap = set(value_cols) & set(probes.columns)
    if overlap:
        raise ValueError(f"value_cols collide with probe columns: {overlap}")
    suffixed = {f"{c}{suffix}" for c in value_cols} | {f"{right_ts}{suffix}"}
    dup_out = suffixed & set(probes.columns)
    if dup_out:
        # e.g. chaining two asof_joins with the same suffix: the rename
        # at the end would silently produce duplicate column names
        raise ValueError(
            f"output names collide with probe columns: {sorted(dup_out)} "
            f"— pass a different suffix")
    reserved = {"__asof_t", "_t", "_is_probe", "_matched_t", "_obs_row"}
    taken = reserved & (set(value_cols) | set(probes.columns))
    if taken:
        # probe columns ride through the tagged union unprefixed, so an
        # input column with an internal name would make the window /
        # drop operate on an ambiguous reference
        raise ValueError(f"column names reserved by asof_join: {taken}")

    # ASOF semantics drop rows that can never match: a NULL observation
    # time has no position on the axis (it would sort FIRST and its
    # non-null struct would fill every no-match probe), and NULL join
    # keys never equal anything in DuckDB ASOF / pandas merge_asof —
    # but Window.partitionBy groups NULLs together, so null-key obs must
    # not enter the union (null-key PROBES stay and get no-match rows)
    obs_matchable = obs.filter(F.col(right_ts).isNotNull())
    for kcol in keys:
        obs_matchable = obs_matchable.filter(F.col(kcol).isNotNull())
    tagged_obs = obs_matchable.select(
        *keys,
        F.col(right_ts).cast("double").alias("_t"),
        F.col(right_ts).cast("double").alias("_matched_t"),
        F.lit(0).alias("_is_probe"),
        *[F.col(c) for c in value_cols],
    )
    tagged_probes = probes.select(
        "*",
        F.col(left_ts).cast("double").alias("_t"),
        F.lit(None).cast("double").alias("_matched_t"),
        F.lit(1).alias("_is_probe"),
    )
    unioned = tagged_probes.unionByName(tagged_obs, allowMissingColumns=True)

    # obs (_is_probe=0) sorts before probes at equal time => t <= ts inclusive
    w = (Window.partitionBy(*keys)
         .orderBy(F.col("_t").asc(), F.col("_is_probe").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    # fill from ONE struct of the whole observation row, then extract: the
    # matched row's genuinely-NULL values are preserved (a per-column
    # last(ignorenulls) would skip them and surface an older non-null value,
    # diverging from pandas merge_asof / DuckDB ASOF JOIN semantics)
    obs_row = F.when(
        F.col("_is_probe") == 0,
        F.struct(F.col("_matched_t").alias("__asof_t"),
                 *[F.col(c).alias(c) for c in value_cols]))
    filled = unioned.withColumn(
        "_obs_row", F.last(obs_row, ignorenulls=True).over(w))
    for c in value_cols:
        filled = filled.withColumn(c, F.col("_obs_row").getField(c))
    filled = (filled
              .withColumn("_matched_t", F.col("_obs_row.__asof_t"))
              .drop("_obs_row"))

    result = filled.filter(F.col("_is_probe") == 1)
    if tolerance is not None:
        in_tol = F.col("_matched_t") >= F.col("_t") - F.lit(float(tolerance))
        for c in value_cols:
            result = result.withColumn(
                c, F.when(in_tol, F.col(c)))
        result = result.withColumn(
            "_matched_t", F.when(in_tol, F.col("_matched_t")))

    renames = {c: f"{c}{suffix}" for c in value_cols}
    renames["_matched_t"] = f"{right_ts}{suffix}"
    for old, new in renames.items():
        result = result.withColumnRenamed(old, new)
    return result.drop("_t", "_is_probe")
