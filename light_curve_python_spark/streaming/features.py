"""Streaming point-in-time feature extraction (the north rule's PIT
features as a live stream): per entity, emit the feature vector over all
observations with t <= the arriving row's t — exactly what the batch
engine computes per probe — by carrying running sufficient statistics in
``applyInPandasWithState`` state.

Features maintained from O(1) state (n, Σm, Σm², Σw, Σwm, Σt, min, max,
last_t): observation_count, mean, standard_deviation (ddof=1), amplitude,
weighted_mean, duration, maximum_time_interval — the moment family whose
sufficient statistics fold associatively (quantile-family features need
the full window and stay batch-side).  Within a micro-batch rows are
processed in event-time order; state carries across micro-batches and
restarts (checkpointed by Spark).  Zero temporal leakage by construction:
a row's output is computed BEFORE folding any later row.
"""

from __future__ import annotations

import math
from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_pit_features", "STREAM_FEATURE_NAMES"]

STREAM_FEATURE_NAMES = ("observation_count", "mean", "standard_deviation",
                        "amplitude", "weighted_mean", "duration",
                        "maximum_time_interval")


def _output_schema(key_field: T.StructField, ts_col: str) -> T.StructType:
    return T.StructType(
        [key_field, T.StructField(ts_col, T.DoubleType())]
        + [T.StructField(n, T.DoubleType()) for n in STREAM_FEATURE_NAMES])


STATE_SCHEMA = T.StructType([
    T.StructField(n, T.DoubleType())
    for n in ("n", "sm", "sm2", "sw", "swm", "mn", "mx",
              "t0", "last_t", "max_dt")])


def streaming_pit_features(obs: DataFrame, key_col: str = "doc_id",
                           t_col: str = "t", m_col: str = "m",
                           sigma_col: str = "sigma",
                           late_policy: str = "drop") -> DataFrame:
    """One output row per observation: the moment-family feature vector of
    the entity's history INCLUDING that observation (emit-after-fold; use
    lag semantics downstream if strictly-before is needed).

    Rows within a micro-batch are processed in event-time order, but a
    row arriving in a LATER micro-batch with t below the state's last
    folded t cannot be served leakage-free from O(1) state (its history
    already contains future points).  ``late_policy``:

    - ``'drop'`` (default): late rows emit nothing and are not folded —
      every emitted vector is a LEAK-FREE feature vector computed over
      the entity's on-time history only.  Batch equivalence holds
      exactly until the first cross-batch late row; after a drop, later
      vectors for that entity are missing the dropped observation that
      a batch PIT extractor would include (zero leakage is preserved,
      batch equality is not).  Pair with source-side watermarking if
      late data must be quantified or reprocessed.
    - ``'fold'``: fold and emit anyway — the vector is over ARRIVAL
      order, leaking the already-folded future rows (duration/max_dt can
      go negative); only for pipelines that explicitly want running
      arrival-order stats."""
    if late_policy not in ("drop", "fold"):
        raise ValueError("late_policy must be 'drop' or 'fold'")
    out_schema = _output_schema(obs.schema[key_col], t_col)

    def fn(key: Tuple, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            (n, sm, sm2, sw, swm, mn, mx, t0, last_t, max_dt) = state.get
        else:
            n = sm = sm2 = sw = swm = 0.0
            mn = math.inf
            mx = -math.inf
            t0 = last_t = math.nan
            max_dt = math.nan
        rows = pd.concat(list(pdfs), ignore_index=True) \
            .sort_values(t_col, kind="mergesort")
        out = {c: [] for c in (t_col,) + STREAM_FEATURE_NAMES}
        for t, m, s in zip(rows[t_col], rows[m_col], rows[sigma_col]):
            if late_policy == "drop" and not math.isnan(last_t) \
                    and t < last_t:
                continue      # late cross-batch row: unservable leak-free
            n += 1.0
            sm += m
            sm2 += m * m
            w = s ** -2.0
            sw += w
            swm += w * m
            mn = min(mn, m)
            mx = max(mx, m)
            if math.isnan(t0):
                t0 = t
            else:
                dt = t - last_t
                max_dt = dt if math.isnan(max_dt) else max(max_dt, dt)
            last_t = t
            var = (sm2 - sm * sm / n) / (n - 1.0) if n > 1 else math.nan
            out[t_col].append(t)
            out["observation_count"].append(n)
            out["mean"].append(sm / n)
            out["standard_deviation"].append(
                math.sqrt(max(var, 0.0)) if n > 1 else math.nan)
            out["amplitude"].append(0.5 * (mx - mn))
            out["weighted_mean"].append(swm / sw)
            out["duration"].append(t - t0)
            out["maximum_time_interval"].append(max_dt)
        state.update((n, sm, sm2, sw, swm, mn, mx, t0, last_t, max_dt))
        res = pd.DataFrame(out)
        res.insert(0, key_col, key[0])
        yield res

    return (obs.groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, STATE_SCHEMA,
                                    "append", GroupStateTimeout.NoTimeout))
