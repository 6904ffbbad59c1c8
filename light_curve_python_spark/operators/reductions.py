"""Fixed-length sequence reductions over array columns.

Re-expression of the reference's embedding ``Reduction`` strategies
(/root/reference/light-curve/light_curve/embed/reduction.py:15-498) as pure
array expressions over a column like ``tokens array<int32>`` — zero-pad to
``seq_size`` plus a boolean mask, exactly the window+mask contract the
reference feeds its ONNX encoders:

- beginning: first seq_size elements (reduction.py:174-192)
- end: last seq_size (:195-203)
- middle: window centred on len//2, shifted at the edges (:327-341)
- random_subsample: seq_size positions chosen pseudo-randomly, sorted so
  original order is preserved (:305-325).  The reference uses a numpy RNG;
  here selection is a deterministic rank over xxhash64(id, pos, seed) so the
  result is reproducible under any partitioning — same invariants (subset,
  order-preserving, exact size), different stream.
- non_overlapping_windows: ceil(len/seq_size) rows per input row, last one
  padded (:343-365)

All JVM-side (slice/sequence/transform HOFs) — no Python workers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["reduce_sequence", "non_overlapping_windows"]

def _pad_and_mask(df: DataFrame, arr_col: str, seq_size: int,
                  out_col: str, mask_col: str) -> DataFrame:
    # NULL arrays behave as empty: F.size(NULL) = -1 would otherwise make
    # the mask seq_size+1 long and the padded sequence NULL, crashing the
    # downstream Arrow/numpy stack mid-task
    n = F.greatest(F.coalesce(F.size(arr_col), F.lit(0)), F.lit(0))
    elem_type = df.schema[arr_col].dataType.elementType.simpleString()
    zero = F.lit(0).cast(elem_type)
    padded = F.concat(
        F.coalesce(F.col(arr_col), F.array().cast(f"array<{elem_type}>")),
        F.array_repeat(zero, F.greatest(F.lit(seq_size) - n, F.lit(0))))
    mask = F.concat(
        F.array_repeat(F.lit(True), F.least(n, F.lit(seq_size))),
        F.array_repeat(F.lit(False),
                       F.greatest(F.lit(seq_size) - n, F.lit(0))))
    return (df.withColumn(out_col, F.slice(padded, 1, seq_size))
            .withColumn(mask_col, mask))


def reduce_sequence(df: DataFrame, arr_col: str = "tokens",
                    seq_size: int = 128, strategy: str = "beginning",
                    id_col: str = "doc_id", seed: int = 42,
                    out_col: str = "sequence",
                    mask_col: str = "mask") -> DataFrame:
    """One (sequence, mask) row per input row; sequence has exactly
    ``seq_size`` elements, mask marks real vs padded positions."""
    n = F.size(arr_col)
    if strategy == "beginning":
        window = F.slice(F.col(arr_col), 1, seq_size)
    elif strategy == "end":
        start = F.greatest(n - F.lit(seq_size) + 1, F.lit(1))
        window = F.slice(F.col(arr_col), start, seq_size)
    elif strategy == "middle":
        # start = max(0, min(len//2 - seq//2, len - seq)) (0-based)
        cut = F.floor(n / 2)
        start0 = F.greatest(
            F.lit(0), F.least(cut - seq_size // 2, n - F.lit(seq_size)))
        window = F.slice(F.col(arr_col), start0.cast("int") + 1, seq_size)
    elif strategy == "random_subsample":
        idx = F.sequence(F.lit(0), n - 1)
        ranked = F.array_sort(F.transform(
            idx, lambda i: F.struct(
                F.xxhash64(F.col(id_col), i, F.lit(seed)).alias("h"),
                i.alias("i"))))
        keep = F.array_sort(F.transform(
            F.slice(ranked, 1, seq_size), lambda s: s.getField("i")))
        window = F.when(n <= seq_size, F.col(arr_col)).otherwise(
            F.transform(keep,
                        lambda i: F.element_at(F.col(arr_col),
                                               i.cast("int") + 1)))
    else:
        raise ValueError(f"unknown strategy: {strategy}")
    out = df.withColumn("_win", window)
    return _pad_and_mask(out, "_win", seq_size, out_col, mask_col) \
        .drop("_win")


def non_overlapping_windows(df: DataFrame, arr_col: str = "tokens",
                            seq_size: int = 128,
                            out_col: str = "sequence",
                            mask_col: str = "mask",
                            window_idx_col: str = "window_idx") -> DataFrame:
    """ceil(len/seq_size) output rows per input row (reduction.py:343-365)
    — ZERO rows for an empty array (the reference's range(0, 0, n) yields
    no windows; emitting an all-padding row would inject fake empty
    training blocks downstream)."""
    n = F.size(arr_col)
    n_windows = F.ceil(n / F.lit(seq_size)).cast("int")
    exploded = (df.filter(n_windows >= 1)
                .withColumn(window_idx_col,
                            F.explode(F.sequence(F.lit(0),
                                                 n_windows - 1))))
    win = F.slice(F.col(arr_col),
                  F.col(window_idx_col) * seq_size + 1, seq_size)
    out = exploded.withColumn("_win", win)
    return _pad_and_mask(out, "_win", seq_size, out_col, mask_col) \
        .drop("_win")
