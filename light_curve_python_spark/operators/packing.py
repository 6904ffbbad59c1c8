"""Sequence packing — fixed-size training blocks from a tokenized corpus.

The engine's north-rule input is a table ``(doc_id, tokens array<int32>,
n_tok, source)``; the step every LLM training pipeline runs on it is
PACKING: concatenate documents in a deterministic order and cut the stream
into fixed ``block_tokens`` windows, letting documents span block
boundaries (the standard "concat-then-chunk" scheme — exact, no padding
waste; bin-packing variants trade determinism for boundary purity).

Shapes at scale: one window cumsum per packing partition (``source``), an
explode bounded by spans-per-doc (n_tok/block + 2), and for the
materialized variant one groupBy(block) whose width is block_tokens —
nothing quadratic, nothing driver-side.  Packing order inside a partition
is ``order_col`` (default the id), so output is reproducible run to run.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_spans", "pack_tokens"]


def pack_spans(df: DataFrame, block_tokens: int,
               n_tok_col: str = "n_tok", id_col: str = "doc_id",
               partition_col: Optional[str] = "source",
               order_col: Optional[str] = None) -> DataFrame:
    """Span assignment only (no token materialization): one row per
    (document, block) intersection with the within-document token range
    [tok_start, tok_end) that lands in that block.

    ``partition_col`` scopes the token stream (and the window sort) per
    partition — REQUIRED for scale: packing is per-source, so the global
    order the cumsum needs never leaves a partition.  Pass ``None`` only
    for small/demo data (a single global sort).  Docs with 0 tokens emit
    no span."""
    order_col = order_col or id_col
    # explicit ROWS frame + id tiebreak: the default frame with orderBy is
    # RANGE ... CURRENT ROW, which lumps rows TIED on order_col into one
    # cumulative sum — two docs sharing a timestamp would then get
    # overlapping spans; ROWS with a deterministic total order (order_col,
    # id) gives each doc its own exclusive prefix
    order = [order_col] if order_col == id_col else [order_col, id_col]
    if partition_col is not None:
        w = Window.partitionBy(partition_col).orderBy(*order)
        part_cols = [partition_col]
    else:
        w = Window.orderBy(*order)
        part_cols = []
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    n = F.col(n_tok_col)
    prev = (F.sum(n_tok_col).over(w) - n).alias("_prev")
    b = F.lit(block_tokens)
    sel = [*part_cols, id_col, n_tok_col]
    if order_col != id_col:
        sel.append(order_col)
    d = (df.select(*sel)
         .withColumn("_prev", prev)
         .filter(n > 0)
         .withColumn("block_id",
                     F.explode(F.sequence(
                         F.floor(F.col("_prev") / b),
                         F.floor((F.col("_prev") + n - 1) / b)))))
    return d.select(
        *part_cols, id_col,
        F.col("block_id").cast("long").alias("block_id"),
        F.greatest(F.col("block_id") * b - F.col("_prev"), F.lit(0))
        .cast("long").alias("tok_start"),
        F.least((F.col("block_id") + 1) * b - F.col("_prev"), n)
        .cast("long").alias("tok_end"))


def pack_tokens(df: DataFrame, block_tokens: int,
                tokens_col: str = "tokens", id_col: str = "doc_id",
                partition_col: Optional[str] = "source",
                order_col: Optional[str] = None,
                with_segments: bool = False) -> DataFrame:
    """Materialized packed blocks: ``(partition, block_id, tokens,
    n_docs)`` where ``tokens`` is the exact concatenation of the block's
    document slices in packing order (every block is full except each
    partition's last).  Token arrays ride JVM slice/flatten only — no
    Python, byte-identical payload.

    ``with_segments=True`` adds the training-ready boundary columns a
    packed-attention loader needs (all built with the same JVM HOFs, no
    Python):

    - ``segment_ids``: per-token 0-based index of the document slice it
      came from within the block (len == len(tokens)) — the
      block-diagonal attention-mask key;
    - ``doc_ids``: the source document of each segment, in order;
    - ``doc_lens``: each segment's token count (prefix-summing gives the
      segment offsets).  A document spanning a block boundary appears as
      the last segment of one block and segment 0 of the next."""
    order_col = order_col or id_col
    # NULL token arrays count as 0 tokens (F.size(NULL) = -1 would
    # decrement the packing cumsum and shift EVERY later block by one)
    n_tok = F.greatest(F.coalesce(F.size(tokens_col), F.lit(0)), F.lit(0))
    base = df.withColumn("_n_tok", n_tok)
    spans = pack_spans(base, block_tokens, n_tok_col="_n_tok",
                       id_col=id_col, partition_col=partition_col,
                       order_col=order_col)
    part_cols = [partition_col] if partition_col is not None else []
    # join back on (partition, id): a doc_id appearing under two
    # partitions would otherwise match BOTH token rows and duplicate its
    # slices into both partitions' blocks
    lookup_cols = part_cols + ([id_col, order_col, tokens_col]
                               if order_col != id_col
                               else [id_col, tokens_col])
    lookup = df.select(*lookup_cols)
    joined = spans.join(lookup, part_cols + [id_col])
    piece = F.slice(F.col(tokens_col),
                    (F.col("tok_start") + 1).cast("int"),
                    (F.col("tok_end") - F.col("tok_start")).cast("int"))
    # sort key mirrors the span window's total order (order_col, id):
    # with ties on order_col the id tiebreak keeps the concatenation
    # order identical to the span assignment
    keyed = joined.select(
        *part_cols, "block_id",
        F.struct(F.col(order_col).alias("o"),
                 F.col(id_col).alias("i"),
                 piece.alias("p")).alias("_kp"))
    grouped = keyed.groupBy(*part_cols, "block_id").agg(
        F.array_sort(F.collect_list("_kp")).alias("_sorted"),
        F.count("*").alias("n_docs"))
    pieces = F.col("_sorted")
    out_cols = [
        *part_cols, "block_id",
        F.flatten(F.transform(pieces, lambda s: s.getField("p")))
        .alias("tokens"), F.col("n_docs")]
    if with_segments:
        out_cols += [
            # genuine 2-arg (element, index) HOF form — a closure-captured
            # default-arg lambda would be misparsed as this form, but here
            # the index IS the segment id
            F.flatten(F.transform(
                pieces,
                lambda s, i: F.array_repeat(i, F.size(s.getField("p")))))
            .alias("segment_ids"),
            F.transform(pieces, lambda s: s.getField("i")).alias("doc_ids"),
            F.transform(pieces, lambda s: F.size(s.getField("p")))
            .alias("doc_lens")]
    return grouped.select(*out_cols)
