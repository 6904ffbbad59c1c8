"""Sequence packing (operators/packing.py): concat-then-chunk spans and
materialized fixed-size training blocks, checked against a straight numpy
reference and for byte-exact token payloads."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from light_curve_python_spark.operators.packing import (
    pack_spans,
    pack_tokens,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(3)
    rows = []
    for i in range(60):
        n = int(rng.integers(0, 40))
        rows.append((i, f"src{i % 3}",
                     [int(x) for x in rng.integers(0, 1000, n)]))
    pdf = pd.DataFrame(rows, columns=["doc_id", "source", "tokens"])
    return spark.createDataFrame(pdf), pdf


def test_pack_spans_match_numpy(spark, corpus):
    df, pdf = corpus
    B = 32
    pdf = pdf.assign(n_tok=pdf.tokens.map(len))
    got = pack_spans(df.withColumn("n_tok", F.size("tokens")), B).toPandas()
    for src, grp in pdf.groupby("source"):
        grp = grp.sort_values("doc_id")
        offset = 0
        want = []
        for _, r in grp.iterrows():
            n = r.n_tok
            if n == 0:
                offset += 0
                continue
            first, last = offset // B, (offset + n - 1) // B
            for b in range(first, last + 1):
                s = max(b * B - offset, 0)
                e = min((b + 1) * B - offset, n)
                want.append((r.doc_id, b, s, e))
            offset += n
        g = got[got.source == src].sort_values(
            ["doc_id", "block_id"]).reset_index(drop=True)
        assert [tuple(x) for x in
                g[["doc_id", "block_id", "tok_start", "tok_end"]
                  ].to_numpy()] == sorted(want)


def test_pack_tokens_byte_exact(spark, corpus):
    df, pdf = corpus
    B = 32
    got = pack_tokens(df, B).toPandas()
    for src, grp in pdf.groupby("source"):
        stream = [t for _, r in grp.sort_values("doc_id").iterrows()
                  for t in r.tokens]
        g = got[got.source == src].sort_values("block_id")
        # block ids dense from 0; every block full except the last
        assert list(g.block_id) == list(range(len(g)))
        sizes = g.tokens.map(len).tolist()
        assert all(s == B for s in sizes[:-1])
        if stream:
            assert 1 <= sizes[-1] <= B
        # byte-exact concatenation in packing order
        assert [t for blk in g.tokens for t in blk] == stream


def test_pack_spans_global_order(spark, corpus):
    df, _ = corpus
    out = pack_spans(
        df.withColumn("n_tok", F.size("tokens")),
        64, partition_col=None).toPandas()
    # single global stream: block 0 exists and spans are contiguous
    assert out.block_id.min() == 0
    assert (out.tok_end > out.tok_start).all()


def test_pack_spans_ties_on_order_col(spark):
    """Rows tied on order_col must still get exclusive prefixes (ROWS
    frame + id tiebreak), not the RANGE-frame lumped cumsum."""
    rows = [(0, "s", 5.0, 10), (1, "s", 5.0, 10), (2, "s", 5.0, 10),
            (3, "s", 7.0, 10)]
    df = spark.createDataFrame(
        rows, ["doc_id", "source", "ts", "n_tok"])
    out = pack_spans(df, 16, order_col="ts").toPandas() \
        .sort_values(["doc_id", "block_id"]).reset_index(drop=True)
    # stream = doc0[0:10) doc1[10:20) doc2[20:30) doc3[30:40), blocks of 16
    got = [tuple(x) for x in
           out[["doc_id", "block_id", "tok_start", "tok_end"]].to_numpy()]
    assert got == [(0, 0, 0, 10), (1, 0, 0, 6), (1, 1, 6, 10),
                   (2, 1, 0, 10), (3, 1, 0, 2), (3, 2, 2, 10)]


def test_pack_tokens_ties_byte_exact(spark):
    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "source": ["s"] * 3,
        "ts": [3.0, 3.0, 3.0],
        "tokens": [list(range(0, 7)), list(range(10, 15)),
                   list(range(20, 29))]})
    df = spark.createDataFrame(pdf)
    got = pack_tokens(df, 8, order_col="ts").toPandas() \
        .sort_values("block_id")
    stream = [t for toks in pdf.tokens for t in toks]
    assert [t for blk in got.tokens for t in blk] == stream
    assert got.tokens.map(len).tolist()[:-1] == [8, 8]


def test_pack_tokens_segments(spark):
    """with_segments: per-token segment ids + per-segment doc ids/lens,
    consistent with the token concatenation and with cross-block spans."""
    from light_curve_python_spark.operators.packing import pack_tokens
    rows = [("s", 1, list(range(0, 5))),      # 5 tokens
            ("s", 2, list(range(10, 16))),    # 6 tokens -> crosses block 1
            ("s", 3, list(range(20, 27)))]    # 7 tokens
    df = spark.createDataFrame(rows, "source string, doc_id long, "
                                     "tokens array<int>")
    out = {r.block_id: r for r in
           pack_tokens(df, 8, with_segments=True).collect()}
    b0, b1, b2 = out[0], out[1], out[2]
    # block 0: all of doc1 (5) + first 3 of doc2
    assert b0.tokens == list(range(0, 5)) + [10, 11, 12]
    assert b0.segment_ids == [0] * 5 + [1] * 3
    assert b0.doc_ids == [1, 2] and b0.doc_lens == [5, 3]
    # block 1: doc2's tail (3) + doc3's first 5 — continuation is seg 0
    assert b1.tokens == [13, 14, 15] + list(range(20, 25))
    assert b1.segment_ids == [0] * 3 + [1] * 5
    assert b1.doc_ids == [2, 3] and b1.doc_lens == [3, 5]
    # final partial block
    assert b2.tokens == [25, 26] and b2.segment_ids == [0, 0]
    assert b2.doc_ids == [3] and b2.doc_lens == [2]
    for b in (b0, b1, b2):
        assert len(b.segment_ids) == len(b.tokens)
        assert sum(b.doc_lens) == len(b.tokens)
        assert len(b.doc_ids) == len(b.doc_lens) == b.n_docs
