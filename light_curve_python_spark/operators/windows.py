"""Ordered window operators: lag/lead, backfill, rolling range aggregates.

These are the Spark-native counterparts of the reference's consecutive-pair
and cumulative constructions (Eta/EtaE/MaximumSlope use ``m[1:]-m[:-1]``,
Cusum uses ``cumsum`` — /root/reference/light-curve/light_curve/
light_curve_py/features/{eta,etae,maxslope,cusum}.py), generalized into
reusable point-in-time operators (north rule: lag/lead + backfill).

All of them are single-shuffle ordered windows (JVM-side, whole-stage
codegen) — no Python in the hot path.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["with_lag_lead", "backfill", "rolling_range_agg", "with_diffs"]


def _keys(on) -> list:
    """Normalize a key spec to a list — shared with sessionize.py."""
    return [on] if isinstance(on, str) else list(on)


def _order(order_by, tiebreak_cols) -> list:
    """Window ordering with an optional deterministic tiebreak: with
    duplicate ``order_by`` values and no tiebreak, lag/lead/fill results
    depend on shuffle arrival order — different runs (and task retries)
    may disagree.  Callers whose order key can tie should pass a
    unique(-enough) column."""
    return [F.col(order_by).asc()] + [F.col(c).asc()
                                      for c in (tiebreak_cols or ())]


def with_lag_lead(df: DataFrame, on, order_by: str,
                  cols: Sequence[str], offsets: Sequence[int] = (1,),
                  tiebreak_cols: Sequence[str] = ()) -> DataFrame:
    """Adds ``{col}_lag_{k}`` and ``{col}_lead_{k}`` per offset."""
    w = Window.partitionBy(*_keys(on)).orderBy(
        *_order(order_by, tiebreak_cols))
    for c in cols:
        for k in offsets:
            df = df.withColumn(f"{c}_lag_{k}", F.lag(c, k).over(w))
            df = df.withColumn(f"{c}_lead_{k}", F.lead(c, k).over(w))
    return df


def with_diffs(df: DataFrame, on, order_by: str,
               cols: Sequence[str],
               tiebreak_cols: Sequence[str] = ()) -> DataFrame:
    """Adds ``{col}_diff`` = value − previous value (consecutive-pair op)."""
    w = Window.partitionBy(*_keys(on)).orderBy(
        *_order(order_by, tiebreak_cols))
    for c in cols:
        df = df.withColumn(f"{c}_diff", F.col(c) - F.lag(c, 1).over(w))
    return df


def backfill(df: DataFrame, on, order_by: str, cols: Sequence[str],
             direction: str = "ffill",
             tiebreak_cols: Sequence[str] = ()) -> DataFrame:
    """Fill nulls from the latest prior non-null ('ffill') or the next
    non-null ('bfill') within each key, ordered by ``order_by``.

    ffill is the leakage-safe direction for training features (only past
    values flow forward); bfill is provided for label alignment.
    """
    base = Window.partitionBy(*_keys(on)).orderBy(
        *_order(order_by, tiebreak_cols))
    if direction == "ffill":
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        fill = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    elif direction == "bfill":
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        fill = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        raise ValueError("direction must be 'ffill' or 'bfill'")
    for c in cols:
        df = df.withColumn(c, fill(c))
    return df


def _bound(v: Optional[float], preceding: bool) -> str:
    if v is None:
        return "UNBOUNDED PRECEDING" if preceding else "UNBOUNDED FOLLOWING"
    if v == 0:
        return "CURRENT ROW"
    return f"{abs(v)} {'PRECEDING' if v < 0 else 'FOLLOWING'}"


def rolling_range_agg(df: DataFrame, on, order_by: str,
                      aggs: Dict[str, str],
                      window_range: Tuple[Optional[float], Optional[float]] = (None, 0),
                      ) -> DataFrame:
    """Range-window aggregates per row over ``order_by`` (numeric): for each
    output name, a SQL aggregate expression evaluated over
    ``RANGE BETWEEN lo AND hi``.  ``lo=None`` => unbounded preceding.
    Fractional bounds are supported (the DataFrame ``rangeBetween`` API only
    takes integers, so the frame is emitted as a SQL window expression —
    still JVM-side codegen).

    Example::

        rolling_range_agg(ev, "user_id", "t",
                          {"cnt_1h": "count(*)", "sum_1h": "sum(value)"},
                          window_range=(-3600, 0))
    """
    lo, hi = window_range
    # backtick-quote identifiers: raw interpolation fails on reserved
    # words or names with spaces, unlike the Column-API operators above
    keys = ", ".join(f"`{k}`" for k in _keys(on))
    frame = (f"PARTITION BY {keys} ORDER BY `{order_by}` ASC "
             f"RANGE BETWEEN {_bound(lo, True)} AND {_bound(hi, False)}")
    for name, agg_sql in aggs.items():
        df = df.withColumn(name, F.expr(f"{agg_sql} OVER ({frame})"))
    return df
