"""Gap-based sessionization (north-rule operator, no reference counterpart —
semantics defined here and pinned by the DuckDB oracle).

A new session starts when the gap to the previous event (per key, time-ordered)
exceeds ``gap``.  ``session_seq`` is the 1-based session counter per key:
flag + running sum over an ordered window — one shuffle, JVM-side.
Streaming twin: ``F.session_window`` (see streaming/sessions.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize", "session_stats"]


from .windows import _keys  # shared key normalizer  # noqa: E402


def sessionize(df: DataFrame, on, ts_col: str, gap: float,
               session_col: str = "session_seq") -> DataFrame:
    """Adds ``session_col``: 1-based session index per key.  ``ts_col`` must
    be numeric (seconds, or any monotone unit ``gap`` shares)."""
    keys = _keys(on)
    if "_new_session" in df.columns:
        raise ValueError("sessionize reserves the '_new_session' column "
                         "name; rename it first")
    # a NULL timestamp cannot be sessionized: it sorts first, starts its
    # own phantom session, and shifts every real session's index — drop
    # such rows (documented contract; validate ts upstream to keep them)
    df = df.filter(F.col(ts_col).isNotNull())
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc())
    prev = F.lag(ts_col, 1).over(w)
    new_flag = F.when(
        prev.isNull() | (F.col(ts_col) - prev > F.lit(float(gap))),
        F.lit(1)).otherwise(F.lit(0))
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("_new_session", new_flag) \
             .withColumn(session_col, F.sum("_new_session").over(running)) \
             .drop("_new_session")


def session_stats(df: DataFrame, on, ts_col: str, gap: float,
                  value_col: str | None = None) -> DataFrame:
    """Per-session aggregate: start/end/duration/event count (+ value sum)."""
    keys = _keys(on)
    s = sessionize(df, on, ts_col, gap)
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(ts_col) - F.min(ts_col)).alias("session_duration"),
        F.count("*").alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("value_sum"))
    return s.groupBy(*keys, "session_seq").agg(*aggs)
