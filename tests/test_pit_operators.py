"""Tests for asof join, lag/lead/backfill, sessionize, bins — each checked
against an independent pandas/numpy implementation (merge_asof, the
reference's own Bins arithmetic, a brute-force sessionizer)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from light_curve_python_spark.operators.asof import asof_join
from light_curve_python_spark.operators.bins import bin_series
from light_curve_python_spark.operators.sessionize import (
    session_stats,
    sessionize,
)
from light_curve_python_spark.operators.windows import (
    backfill,
    rolling_range_agg,
    with_diffs,
    with_lag_lead,
)


@pytest.fixture(scope="module")
def frames(spark):
    rng = np.random.default_rng(3)
    n_keys, n_obs, n_probes = 8, 300, 60
    obs = pd.DataFrame({
        "key": rng.integers(0, n_keys, n_obs),
        "t": np.round(rng.uniform(0, 1000, n_obs), 3),
        "v": rng.normal(size=n_obs),
        "q": rng.integers(0, 100, n_obs).astype(float),
    }).drop_duplicates(["key", "t"])
    probes = pd.DataFrame({
        "key": rng.integers(0, n_keys, n_probes),
        "ts": np.round(rng.uniform(-50, 1100, n_probes), 3),
        "payload": [f"p{i}" for i in range(n_probes)],
    })
    return spark.createDataFrame(obs).cache(), \
        spark.createDataFrame(probes).cache(), obs, probes


def test_asof_join_vs_merge_asof(spark, frames):
    obs_df, probes_df, obs, probes = frames
    got = asof_join(probes_df, obs_df, on="key", left_ts="ts", right_ts="t",
                    value_cols=["v", "q"]).toPandas() \
        .sort_values(["key", "ts", "payload"]).reset_index(drop=True)
    want = pd.merge_asof(
        probes.sort_values("ts"), obs.sort_values("t"),
        left_on="ts", right_on="t", by="key", direction="backward") \
        .sort_values(["key", "ts", "payload"]).reset_index(drop=True)
    assert len(got) == len(probes)
    np.testing.assert_allclose(got["v_asof"].to_numpy(),
                               want["v"].to_numpy(), rtol=1e-12)
    np.testing.assert_allclose(got["t_asof"].to_numpy(),
                               want["t"].to_numpy(), rtol=1e-12)
    assert (got["payload"] == want["payload"]).all()


def test_asof_join_inclusive_and_tolerance(spark):
    obs = spark.createDataFrame(
        pd.DataFrame({"key": [1, 1, 1], "t": [1.0, 5.0, 9.0],
                      "v": [10.0, 50.0, 90.0]}))
    probes = spark.createDataFrame(
        pd.DataFrame({"key": [1, 1, 1, 1], "ts": [0.5, 5.0, 6.0, 100.0]}))
    got = asof_join(probes, obs, on="key").toPandas().sort_values("ts")
    # exact-time match is inclusive (t <= ts)
    assert got["v_asof"].tolist()[1] == 50.0
    assert np.isnan(got["v_asof"].tolist()[0])
    assert got["v_asof"].tolist()[2] == 50.0
    assert got["v_asof"].tolist()[3] == 90.0
    tol = asof_join(probes, obs, on="key", tolerance=2.0).toPandas() \
        .sort_values("ts")
    assert tol["v_asof"].tolist()[1] == 50.0
    assert tol["v_asof"].tolist()[2] == 50.0
    assert np.isnan(tol["v_asof"].tolist()[3])  # 100-9 > 2


def test_lag_lead_and_diffs(spark, frames):
    obs_df, _, obs, _ = frames
    got = with_lag_lead(obs_df, "key", "t", ["v"], offsets=(1, 2)).toPandas()
    want = obs.sort_values(["key", "t"]).copy()
    for k in (1, 2):
        want[f"v_lag_{k}"] = want.groupby("key")["v"].shift(k)
        want[f"v_lead_{k}"] = want.groupby("key")["v"].shift(-k)
    got = got.sort_values(["key", "t"]).reset_index(drop=True)
    want = want.reset_index(drop=True)
    for c in ["v_lag_1", "v_lead_1", "v_lag_2", "v_lead_2"]:
        np.testing.assert_allclose(got[c].to_numpy(), want[c].to_numpy(),
                                   rtol=1e-12)
    d = with_diffs(obs_df, "key", "t", ["v"]).toPandas() \
        .sort_values(["key", "t"]).reset_index(drop=True)
    np.testing.assert_allclose(
        d["v_diff"].to_numpy(),
        want.groupby("key")["v"].diff().to_numpy(), rtol=1e-12)


def test_backfill(spark):
    pdf = pd.DataFrame({
        "key": [1] * 6 + [2] * 3,
        "t": [1.0, 2, 3, 4, 5, 6, 1, 2, 3],
        "v": [None, 10.0, None, None, 20.0, None, None, None, 5.0],
    })
    df = spark.createDataFrame(pdf)
    ff = backfill(df, "key", "t", ["v"], "ffill").toPandas() \
        .sort_values(["key", "t"])
    want_ff = pdf.sort_values(["key", "t"]).groupby("key")["v"].ffill()
    np.testing.assert_array_equal(ff["v"].to_numpy(), want_ff.to_numpy())
    bf = backfill(df, "key", "t", ["v"], "bfill").toPandas() \
        .sort_values(["key", "t"])
    want_bf = pdf.sort_values(["key", "t"]).groupby("key")["v"].bfill()
    np.testing.assert_array_equal(bf["v"].to_numpy(), want_bf.to_numpy())


def test_rolling_range_agg(spark, frames):
    obs_df, _, obs, _ = frames
    h = 100.0
    got = rolling_range_agg(
        obs_df, "key", "t",
        {"cnt_h": "count(*)", "sum_h": "sum(v)"},
        window_range=(-h, 0)).toPandas().sort_values(["key", "t"]) \
        .reset_index(drop=True)
    want = obs.sort_values(["key", "t"]).reset_index(drop=True)
    cnt, sm = [], []
    for _, r in want.iterrows():
        g = want[(want.key == r.key) & (want.t <= r.t) & (want.t >= r.t - h)]
        cnt.append(len(g))
        sm.append(g.v.sum())
    np.testing.assert_array_equal(got["cnt_h"].to_numpy(), np.array(cnt))
    np.testing.assert_allclose(got["sum_h"].to_numpy(), np.array(sm),
                               rtol=1e-12)


def naive_sessions(ts: np.ndarray, gap: float) -> np.ndarray:
    out, sid = [], 0
    prev = None
    for x in np.sort(ts):
        if prev is None or x - prev > gap:
            sid += 1
        out.append(sid)
        prev = x
    return np.array(out)


def test_sessionize_vs_naive(spark, frames):
    obs_df, _, obs, _ = frames
    gap = 30.0
    got = sessionize(obs_df, "key", "t", gap).toPandas() \
        .sort_values(["key", "t"])
    for key, g in got.groupby("key"):
        want = naive_sessions(g["t"].to_numpy(), gap)
        np.testing.assert_array_equal(g["session_seq"].to_numpy(), want)
    stats = session_stats(obs_df, "key", "t", gap, value_col="v").toPandas()
    # row counts must add up and durations be consistent
    assert stats["n_events"].sum() == len(obs)
    assert (stats["session_end"] >= stats["session_start"]).all()


def reference_bins(t, m, sigma, window, offset):
    """Verbatim reference arithmetic (features/bins.py:14-40), scipy.ndimage
    replaced with np.bincount."""
    n = int(np.ceil((t[-1] - t[0]) / window) + 1)
    bins = np.arange(0, n) * window
    delta = window * np.floor((t[0] - offset) / window)
    time = t - offset - delta
    idx = np.digitize(time, bins)
    uniq_idx, nums = np.unique(idx, return_counts=True)
    new_time = uniq_idx * window + offset - window / 2 + delta
    weights = sigma ** -2.0
    s = np.array([weights[idx == i].sum() for i in uniq_idx])
    new_m = np.array([(m * weights)[idx == i].sum() for i in uniq_idx]) / s
    new_sigma = np.sqrt(nums / s)
    return new_time, new_m, new_sigma


def test_bins_matches_reference_formula(spark):
    rng = np.random.default_rng(11)
    frames = []
    for e in range(5):
        n = 200
        t = np.sort(rng.uniform(0, 100, n))
        frames.append(pd.DataFrame({
            "doc_id": f"e{e}", "t": t,
            "m": rng.uniform(15, 21, n),
            "sigma": rng.uniform(0.01, 0.2, n)}))
    pdf = pd.concat(frames, ignore_index=True)
    df = spark.createDataFrame(pdf)
    window, offset = 7.0, 1.0
    got = bin_series(df, window=window, offset=offset).toPandas() \
        .sort_values(["doc_id", "t"])
    for e, g in got.groupby("doc_id"):
        src = pdf[pdf.doc_id == e]
        wt, wm, ws = reference_bins(src.t.to_numpy(), src.m.to_numpy(),
                                    src.sigma.to_numpy(), window, offset)
        np.testing.assert_allclose(g["t"].to_numpy(), wt, rtol=1e-12)
        np.testing.assert_allclose(g["m"].to_numpy(), wm, rtol=1e-9)
        np.testing.assert_allclose(g["sigma"].to_numpy(), ws, rtol=1e-9)


def test_asof_join_preserves_matched_null(spark):
    # a probe matched to an observation whose value is genuinely NULL must
    # get NULL, not an older non-null value (pandas merge_asof / DuckDB
    # ASOF JOIN semantics)
    obs = spark.createDataFrame(
        [("a", 1.0, 10.0), ("a", 2.0, None), ("a", 4.0, 7.0)],
        "k string, t double, v double")
    probes = spark.createDataFrame(
        [("a", 2.5), ("a", 5.0), ("a", 0.5)], "k string, ts double")
    out = asof_join(probes, obs, on="k", left_ts="ts", right_ts="t",
                    value_cols=["v"]).toPandas().set_index("ts")
    assert pd.isna(out.loc[2.5, "v_asof"])       # matched row t=2.0, v NULL
    assert out.loc[2.5, "t_asof"] == 2.0         # ...but the match itself real
    assert out.loc[5.0, "v_asof"] == 7.0
    assert pd.isna(out.loc[0.5, "v_asof"])       # no match at all
    assert pd.isna(out.loc[0.5, "t_asof"])


def test_asof_null_semantics(spark):
    """DuckDB ASOF / merge_asof parity on degenerate inputs: NULL-t
    observations never match (they used to sort first and fill every
    no-match probe), NULL keys never equal each other (window
    partitioning grouped them), and chained suffixes are rejected."""
    from light_curve_python_spark.operators.asof import asof_join
    obs = spark.createDataFrame(
        [("k", None, 99.0), ("k", 3.0, 7.0), (None, 1.0, 55.0)],
        "key string, t double, v double")
    probes = spark.createDataFrame(
        [("k", 0.5), ("k", 4.0), (None, 5.0)],
        "key string, ts double")
    out = asof_join(probes, obs, "key").toPandas() \
        .sort_values(["key", "ts"], na_position="first") \
        .reset_index(drop=True)
    # null-key probe: no match (null != null)
    assert pd.isna(out.loc[0, "v_asof"]) and pd.isna(out.loc[0, "t_asof"])
    # probe before any real obs: no match (the NULL-t obs must not fill)
    assert pd.isna(out.loc[1, "v_asof"])
    # real match unaffected
    assert out.loc[2, "v_asof"] == 7.0 and out.loc[2, "t_asof"] == 3.0
    # chaining with the same suffix raises instead of duplicating names
    import pytest as _pt
    with _pt.raises(ValueError, match="suffix"):
        asof_join(out_sp := asof_join(probes, obs, "key"), obs, "key")


def test_sessionize_null_ts_dropped(spark):
    """NULL-ts rows started phantom sessions and shifted every real
    session index; they are now dropped (documented contract)."""
    from light_curve_python_spark.operators.sessionize import sessionize
    df = spark.createDataFrame(
        [("k", None), ("k", None), ("k", 1.0), ("k", 2.0), ("k", 100.0)],
        "key string, ts double")
    out = sessionize(df, "key", "ts", gap=10.0).toPandas() \
        .sort_values("ts").reset_index(drop=True)
    assert len(out) == 3
    assert list(out.session_seq) == [1, 1, 2]   # was [3, 3, 4]
    import pytest as _pt
    with _pt.raises(ValueError, match="_new_session"):
        sessionize(df.withColumn("_new_session", F.lit(1)),
                   "key", "ts", gap=10.0)
