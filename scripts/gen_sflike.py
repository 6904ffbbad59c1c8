#!/usr/bin/env python
"""Generate a driver-scale-LIKE synthetic mirror of the testdata tables
(documents/events/embeddings) for PROFILING ONLY.

The driver measures BENCH at sf=1.0 (BENCH_r05.json: "sf": 1.0) but the
sandbox only ships sf<=0.1, so optimization work needs a local corpus with
the same *distributions* at 10x scale: 31-word uniform vocabulary with a
rare 'dup' word, doc lengths uniform 10..100 words, 5 uniform event types
over a 30-day window, 64-dim embeddings in 10 loose clusters.  Absolute
numbers from this mirror are approximate; round-over-round driver numbers
are the ground truth.  Usage:

    python scripts/gen_sflike.py [sf] [outdir]
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
OUT = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".bench_cache", f"sflike{SF}")

VOCAB = ["spark", "window", "merge", "table", "column", "vector", "stream",
         "value", "data", "small", "join", "filter", "big", "group", "hash",
         "customer", "sort", "order", "slow", "line", "part", "fast", "the",
         "row", "agg", "key", "query", "a", "scan", "batch"]


def documents(rng, n_docs):
    lens = rng.integers(10, 101, n_docs)
    texts = []
    for n in lens:
        ws = rng.integers(0, len(VOCAB), n)
        words = [VOCAB[i] for i in ws]
        # ~5% of docs get one rare 'dup' marker word (matches sf0.1's
        # 255 occurrences over 5000 docs)
        if rng.random() < 0.05:
            words[rng.integers(0, n)] = "dup"
        texts.append(" ".join(words) + " ")
    return pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n_docs),
        "source": pa.array([f"src{i % 20}" for i in range(n_docs)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def events(rng, n_events, n_users):
    ts0 = np.datetime64("2024-01-01T00:00:00.000000")
    span_us = 30 * 86400 * 1_000_000
    offs = np.sort(rng.integers(0, span_us, n_events))
    types = np.array(["signup", "purchase", "view", "click", "error"])
    return pa.table({
        "event_id": pa.array(np.arange(n_events), pa.int64()),
        "ts": pa.array(ts0 + offs.astype("timedelta64[us]")),
        "user_id": pa.array(rng.integers(0, n_users, n_events), pa.int64()),
        "event_type": pa.array(types[rng.integers(0, 5, n_events)]),
        "value": pa.array(np.round(rng.uniform(0, 560, n_events), 2)),
        "props": pa.array([f'{{"k": {k}}}'
                           for k in rng.integers(0, 100, n_events)]),
    })


def embeddings(rng, n_vecs, dim=64, n_labels=10):
    centers = rng.standard_normal((n_labels, dim)) * 0.5
    labels = rng.integers(0, n_labels, n_vecs)
    vecs = (centers[labels]
            + rng.standard_normal((n_vecs, dim))).astype(np.float32)
    return pa.table({
        "vec_id": pa.array(np.arange(n_vecs), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })


def main():
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(42)
    pq.write_table(documents(rng, int(50000 * SF)),
                   f"{OUT}/documents.parquet")
    pq.write_table(events(rng, int(1_000_000 * SF), int(15000 * SF)),
                   f"{OUT}/events.parquet")
    pq.write_table(embeddings(rng, int(20000 * SF)),
                   f"{OUT}/embeddings.parquet")
    print(OUT)


if __name__ == "__main__":
    main()
