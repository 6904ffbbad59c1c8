"""Structured Streaming twins: session_window + tumbling bins, driven with an
availableNow file-source trigger and cross-checked against the batch
operators on the same data."""

import datetime as dt
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from light_curve_python_spark.operators.sessionize import session_stats
from light_curve_python_spark.streaming.sessions import (
    streaming_bins,
    streaming_session_stats,
)


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    base = dt.datetime(2024, 1, 1)
    rows = []
    for uid in range(4):
        t = base
        for i in range(30):
            gap = dt.timedelta(minutes=5 if i % 10 else 90)
            t = t + gap
            rows.append((uid, t, float(i)))
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    d = str(tmp_path_factory.mktemp("events_stream"))
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(d)
    return d


def _run_stream(spark, df, tmp):
    q = (df.writeStream.format("memory").queryName(os.path.basename(tmp))
         .outputMode("complete")
         .option("checkpointLocation", tmp + "/ckpt")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {os.path.basename(tmp)}")


def test_streaming_sessions_match_batch(spark, event_dir, tmp_path):
    schema = spark.read.parquet(event_dir).schema
    stream = spark.readStream.schema(schema).parquet(event_dir)
    out = _run_stream(
        spark, streaming_session_stats(stream, gap="30 minutes"),
        str(tmp_path / "s1")).toPandas()

    batch_src = spark.read.parquet(event_dir).withColumn(
        "t", F.col("ts").cast("timestamp").cast("double"))
    batch = session_stats(batch_src, "user_id", "t", gap=1800.0,
                          value_col="value").toPandas()
    # same number of sessions per user and same event totals
    a = out.groupby("user_id").size().sort_index()
    b = batch.groupby("user_id").size().sort_index()
    assert (a == b).all()
    assert out.n_events.sum() == batch.n_events.sum() == 120
    assert out.value_sum.sum() == batch.value_sum.sum()


def test_streaming_bins(spark, event_dir, tmp_path):
    schema = spark.read.parquet(event_dir).schema
    stream = spark.readStream.schema(schema).parquet(event_dir)
    out = _run_stream(
        spark, streaming_bins(stream, window="1 hour"),
        str(tmp_path / "s2")).toPandas()
    assert out.n_obs.sum() == 120
    assert (out.groupby("user_id").n_obs.sum() == 30).all()
