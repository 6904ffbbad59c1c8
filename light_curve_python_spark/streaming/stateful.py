"""Custom stateful streaming operator via applyInPandasWithState.

The reference's detection counters are "count rows until the first event"
folds (features/flux_n_not_det_before_fd.py:35-49) — batch form in
sqlfeatures.detection_counts_sql; this is the streaming form (SURVEY.md
§2.9): per key, persist (seen_first_detection, n_non_detections_before) in
state and emit the running answer as events arrive.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_n_not_det_before_fd"]

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_non_detections_before_fd", T.LongType()),
    T.StructField("first_detection_seen", T.BooleanType()),
])
STATE_SCHEMA = T.StructType([
    T.StructField("n_before", T.LongType()),
    T.StructField("seen", T.BooleanType()),
])


def streaming_n_not_det_before_fd(events: DataFrame,
                                  key_col: str = "user_id",
                                  ts_col: str = "ts", m_col: str = "value",
                                  sigma_threshold: float = 250.0) -> DataFrame:
    """Streaming count of non-detections (m <= threshold) before the first
    detection per key.  Rows within a batch are processed in event-time
    order; state carries across micro-batches."""

    def fn(key: Tuple, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            n_before, seen = state.get
        else:
            n_before, seen = 0, False
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(ts_col)
        for v in rows[m_col]:
            if seen:
                break
            if v > sigma_threshold:
                seen = True
            else:
                n_before += 1
        state.update((n_before, seen))
        yield pd.DataFrame({
            "user_id": [key[0]],
            "n_non_detections_before_fd": [n_before],
            "first_detection_seen": [seen],
        })

    return (events.groupBy(key_col)
            .applyInPandasWithState(fn, OUTPUT_SCHEMA, STATE_SCHEMA,
                                    "update",
                                    GroupStateTimeout.NoTimeout))
