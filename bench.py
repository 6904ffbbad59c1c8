#!/usr/bin/env python
"""Benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS], prints ONE JSON line:
  {"metric": "bench_total", "value": <sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <float>, ...extras}

Extras: "feature_vectors_per_sec" (flagship PIT throughput) and "scaling"
(the north rule's N->4N evidence: the identical PIT job at local[8] and
local[32] on the same deterministic synthetic input, efficiency =
(rps_32/rps_8)/4).

Synthetic observations/probes (the tokenized-sequence schema) are generated
deterministically per sf into .bench_cache/ — no external data.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# empty-string env means unset (same convention as session.py)
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS") or "32")
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_cache")

FULL_BATTERY = [
    "amplitude", "mean", "median", "standard_deviation", "mean_variance",
    "median_absolute_deviation", "weighted_mean", "kurtosis", "skew",
    "percent_amplitude", "observation_count", "duration", "time_mean",
    "time_standard_deviation", "maximum_time_interval",
    "minimum_time_interval", "inter_percentile_range",
    "percent_difference_magnitude_percentile", "magnitude_percentage_ratio",
    "median_buffer_range_percentage", "beyond_n_std", "stetson_k",
    "excess_variance", "reduced_chi2", "roms", "cusum", "eta", "eta_e",
    "maximum_slope", "anderson_darling_normal",
    "lafler_kinman_string_length", "linear_fit", "linear_trend", "otsu_split",
]


def _sf_from_dir(d: str) -> float:
    m = re.search(r"sf([0-9.]+)", d)
    return float(m.group(1)) if m else 0.0


SF = _sf_from_dir(SF_DIR)
N_ENTITIES = max(200, int(20000 * SF))
PROBES_PER_ENTITY = 48  # sized so kernel compute dominates fixed overhead
N_ANN_PROBES = 100      # ANN probe set for the lsh headline + recall
ANN_K = 10
# ONE operating point for both the timed lsh headline and the published
# recall@k — 4 planes x 8 tables, sized for this corpus's weakly-similar
# top-k regime (exact top-10 cosines ~0.26-0.37 => per-plane collision
# ~0.59; 8 planes would prune recall to ~3%)
LSH_PARAMS = dict(dim=64, n_planes=4, seed=42, n_tables=8)


def _force(df):
    df.write.mode("overwrite").format("noop").save()


def _control_worker(args):
    """Pure-numpy battery work for the host-ceiling control: NO Spark.
    Each process evaluates the full 34-feature battery on synthetic
    550-obs curves, 192 probes each."""
    seed, n_entities = args
    import numpy as np
    np.seterr(all="ignore")
    from light_curve_python_spark.functions.battery import PrefixBattery
    from light_curve_python_spark.functions.kernels import make_kernel
    battery = PrefixBattery([make_kernel(k) for k in FULL_BATTERY])
    rng = np.random.default_rng(seed)
    total = 0
    for _ in range(n_entities):
        n = 550
        t = np.sort(rng.uniform(0, 1000, n))
        m = rng.uniform(15, 21, n)
        s = rng.uniform(0.01, 0.2, n)
        ends = np.sort(rng.integers(0, n + 1, 192))
        battery.evaluate_prefixes(t, m, s, ends)
        total += 192
    return total


def _host_ceiling_control() -> dict:
    """Aggregate battery throughput with 8 vs 32 INDEPENDENT processes —
    no Spark, no IPC, no shuffle.  This measures what the container's CPUs
    can physically deliver: on this host (32 KVM vCPUs, noisy neighbors,
    one memory bus) the kernel itself scales at ~0.70-0.75 from 8 to 32
    procs, so no honest same-box measurement of the Spark job can exceed
    that.  On a real N -> 4N EXECUTOR scale-up (separate hosts, separate
    memory buses) this ceiling does not exist, and the flagship plan has
    no cross-executor coupling (zero-exchange bucketed cogroup) to add
    one."""
    import multiprocessing as mp
    import numpy as np  # noqa: F401
    out = {}
    for procs in (8, 32):
        # best-of-3, mirroring the Spark side's min-of-5: a noisy-neighbor
        # burst during ONE control phase otherwise skews the ceiling ratio
        # in either direction (observed 0.71-1.11 single-shot); the
        # per-run draws are recorded so the artifact itself shows the
        # spread the best-of is taken over
        runs = []
        with mp.Pool(procs) as pool:
            pool.map(_control_worker, [(i, 2) for i in range(procs)])
            for _ in range(3):
                t0 = time.perf_counter()
                rows = sum(pool.map(_control_worker,
                                    [(i, 40) for i in range(procs)]))
                runs.append(rows / (time.perf_counter() - t0))
        out[f"procs{procs}_rows_per_sec"] = round(max(runs), 1)
        out[f"procs{procs}_runs"] = [round(r, 1) for r in runs]
    out["efficiency_8_to_32"] = round(
        out["procs32_rows_per_sec"] / out["procs8_rows_per_sec"] / 4.0, 3)
    return out


def _trivial_cogroup_sec(spark) -> float:
    """Fixed Spark orchestration floor: the SAME bucketed cogroup shape as
    the flagship but with an identity Arrow function — measures scan +
    schedule + Arrow round-trip with zero kernel compute."""
    import pyarrow as pa
    obs, probes = _register_bucketed(spark)

    def fn(obs_t: "pa.Table", probes_t: "pa.Table") -> "pa.Table":
        return probes_t.select(["doc_id", "ts"])

    schema = "doc_id string, ts double"
    grouped = obs.groupby("doc_id").cogroup(probes.groupby("doc_id"))
    t0 = time.perf_counter()
    _force(grouped.applyInArrow(fn, schema))
    return round(time.perf_counter() - t0, 3)


# 128, not 256: the trivial-cogroup floor is task machinery (~13 ms/task
# pair), so halving the task count halves the floor (measured 3.1 s -> 1.7 s
# at sf0.1 local[32]) and lifts the flagship ~25%; 64 measures the same as
# 128 but leaves only 2 task waves at 32 cores — one hot bucket then costs a
# whole straggler wave, so 128 keeps the balance margin.  On a real cluster
# size this as ~4x total executor cores.
N_BUCKETS = 128


def _ensure_synth(spark):
    """Deterministic synthetic observations/probes for this sf (cached),
    plus doc_id-bucketed copies (the Iceberg bucket(N, doc_id) analog):
    the cogroup then needs ZERO exchanges — the same plan a production
    bucketed/Iceberg table gives on a cluster."""
    from light_curve_python_spark.datagen import (
        generate_observations,
        generate_probes,
    )
    obs_path = f"{CACHE}/sf{SF}/observations.parquet"
    probes_path = f"{CACHE}/sf{SF}/probes.parquet"

    def _complete(p):
        # a run killed mid-write leaves a dir without _SUCCESS; treating
        # it as cached would time garbage (or crash) on every later run
        return os.path.exists(os.path.join(p, "_SUCCESS"))

    if not _complete(obs_path):
        generate_observations(
            spark, N_ENTITIES, seed=42, n_obs_choices=(100, 1000),
            n_hot=max(2, N_ENTITIES // 500), hot_factor=20,
        ).write.mode("overwrite").parquet(obs_path)
    if not _complete(probes_path):
        generate_probes(spark, N_ENTITIES, PROBES_PER_ENTITY, seed=42) \
            .write.mode("overwrite").parquet(probes_path)
    wh = f"{CACHE}/sf{SF}/wh{N_BUCKETS}"
    if not (_complete(f"{wh}/obs_b") and _complete(f"{wh}/probes_b")):
        spark.sql(f"CREATE DATABASE IF NOT EXISTS bench LOCATION "
                  f"'{CACHE}/sf{SF}/wh{N_BUCKETS}'")
        spark.read.parquet(obs_path).write.mode("overwrite") \
            .format("parquet").bucketBy(N_BUCKETS, "doc_id") \
            .sortBy("doc_id", "t").saveAsTable("bench.obs_b")
        spark.read.parquet(probes_path).write.mode("overwrite") \
            .format("parquet").bucketBy(N_BUCKETS, "doc_id") \
            .saveAsTable("bench.probes_b")
    return obs_path, probes_path


def _register_bucketed(spark):
    """Attach the pre-bucketed files as external tables (in-memory catalog
    => re-register per session)."""
    wh = f"{CACHE}/sf{SF}/wh{N_BUCKETS}"  # bucket count in path: stale-cache-proof
    spark.sql("CREATE DATABASE IF NOT EXISTS bench LOCATION "
              f"'{wh}'")
    spark.sql(f"""
        CREATE TABLE IF NOT EXISTS bench.obs_b
        (doc_id STRING, t DOUBLE, m DOUBLE, sigma DOUBLE, band STRING)
        USING parquet CLUSTERED BY (doc_id) SORTED BY (doc_id, t)
        INTO {N_BUCKETS} BUCKETS LOCATION '{wh}/obs_b'""")
    spark.sql(f"""
        CREATE TABLE IF NOT EXISTS bench.probes_b
        (doc_id STRING, ts DOUBLE, tokens ARRAY<INT>, n_tok INT,
         source STRING)
        USING parquet CLUSTERED BY (doc_id)
        INTO {N_BUCKETS} BUCKETS LOCATION '{wh}/probes_b'""")
    return spark.table("bench.obs_b"), spark.table("bench.probes_b")


def _pit_flagship(spark, obs_path, probes_path):
    """Bucketed-table path: zero exchanges into the cogroup.  Salting is off
    here — bucket co-location already pins each entity to one task and the
    PrefixBattery evaluates its whole probe set in one pass; the salted path
    stays exercised by tests and the non-bucketed API."""
    from light_curve_python_spark.operators.extract import FeatureExtractor
    obs, probes = _register_bucketed(spark)
    ex = FeatureExtractor(FULL_BATTERY)
    return ex.extract_point_in_time(obs, probes)


def _headline_queries(spark, obs_path, probes_path):
    import __spark_entry__ as E
    from light_curve_python_spark.operators.extract import FeatureExtractor

    def pit_full(s):
        return _pit_flagship(s, obs_path, probes_path)

    def periodogram_all_curves(s):
        # Press-Rybicki FFT path (the kernel default, mirroring the
        # reference's fast=True): ALL curves including the 1000-obs and
        # 20x-hot ones — O(n log n) per curve, no population filtering
        obs = s.read.parquet(obs_path)
        ex = FeatureExtractor([("periodogram", {"peaks": 1})])
        return ex.extract(obs)

    def multiband_periodogram_all(s):
        # joint two-band LS on the shared auto grid — the per-band powers
        # now ride the same Press-Rybicki fast evaluator as the
        # single-band kernel (r2 verdict: the direct per-band sums were
        # the remaining O(n*n_f) scale-killer)
        from light_curve_python_spark.operators.spectral import (
            multiband_periodogram)
        obs = s.read.parquet(obs_path)
        return multiband_periodogram(obs, ["g", "r"], peaks=1)

    def minhash_production(s):
        from light_curve_python_spark.operators.dedup import (
            minhash_signatures)
        docs = s.read.parquet(f"{SF_DIR}/documents.parquet")
        return minhash_signatures(docs, n_hashes=16, k=3)

    def feat_quantiles_kernel(s):
        # Hazen quantile family via the fused kernel path (single pass per
        # entity, no row_number sort-join); the row_number SQL twin stays
        # oracle-only in __spark_entry__
        ex = FeatureExtractor([
            "inter_percentile_range",
            "percent_difference_magnitude_percentile",
            "magnitude_percentage_ratio",
            "median_buffer_range_percentage"])
        return ex.extract(E._ev(s, SF_DIR), entity_col="user_id",
                          sigma_col=None)

    def lsh_topk_embeddings(s):
        from pyspark.sql import functions as F

        from light_curve_python_spark.operators.similarity import lsh_topk
        emb = s.read.parquet(f"{SF_DIR}/embeddings.parquet") \
            .select("vec_id", "embedding")
        probes = emb.filter(F.col("vec_id") < N_ANN_PROBES)
        return lsh_topk(emb, probes, k=ANN_K, **LSH_PARAMS)

    return {
        "pit_extract_full_battery": pit_full,
        "periodogram_all_curves": periodogram_all_curves,
        "multiband_periodogram": multiband_periodogram_all,
        "sql_feat_dispersion": lambda s: E.q_feat_dispersion(s, SF_DIR),
        "feat_quantiles_kernel": feat_quantiles_kernel,
        "asof_join_events": lambda s: E.q_asof_join(s, SF_DIR),
        "sessionize_events": lambda s: E.q_sessionize(s, SF_DIR),
        "rolling_range_events": lambda s: E.q_rolling_1h(s, SF_DIR),
        # production minhash (xxhash64 shingle perms, no global word-dict
        # window) — the oracle's dictionary variant stays in __spark_entry__
        # where integer-exact DuckDB parity needs it
        "minhash_documents": minhash_production,
        "nn_jaccard_documents":
            lambda s: E.q_nearest_neighbor_jaccard(s, SF_DIR),
        "cosine_topk_embeddings": lambda s: E.q_cosine_topk(s, SF_DIR),
        "lsh_topk_embeddings": lsh_topk_embeddings,
    }


def _jaccard_skew_bench(spark) -> dict:
    """Default-cap evidence for ngram_jaccard_pairs on a SKEWED corpus:
    every doc shares a hot 12-word template (10 shingles with df = n_docs),
    the regime where the exact inverted index is quadratic in the hot df.
    Times the bounded default (max_shingle_df=256) against exact opt-out
    (None) on the same corpus; both must find the planted near-dup pair,
    which survives the prune through its rare shingles with its EXACT
    full-set jaccard (the recount path)."""
    from pyspark.sql import functions as F

    from light_curve_python_spark.operators.dedup import ngram_jaccard_pairs
    n = 6000
    tpl = " ".join(f"tpl{i}" for i in range(12))
    rows = [(i, f"{tpl} u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f u{i}g u{i}h")
            for i in range(n)]
    dup = "dupa dupb dupc dupd dupe dupf dupg duph"
    rows += [(n, f"{tpl} {dup}"), (n + 1, f"{tpl} {dup}")]
    docs = spark.createDataFrame(rows, "doc_id long, text string") \
        .repartition(32).cache()
    docs.count()

    def run(cap, cutoff=None):
        # cutoff keeps the first `cutoff` template docs + the planted pair
        d = docs if cutoff is None else docs.filter(
            (F.col("doc_id") < cutoff) | (F.col("doc_id") >= n))
        t0 = time.perf_counter()
        out = ngram_jaccard_pairs(d, k=3, threshold=0.8,
                                  max_shingle_df=cap).collect()
        return time.perf_counter() - t0, out

    run(256, 100), run(None, 100)            # codegen/worker warmup
    bounded_sec, bounded = run(256)          # the default, full corpus
    # exact opt-out at HALF the hot df only: it is quadratic in hot df
    # (measured once at full size: 112 s vs bounded 2.6 s) and would
    # dominate the whole bench run; half-df already shows the blow-up
    exact_sec, exact = run(None, n // 2)
    planted = {(n, n + 1)}
    assert {(r.id_a, r.id_b) for r in bounded} == planted, bounded
    assert {(r.id_a, r.id_b) for r in exact} == planted, exact
    assert abs(bounded[0].jaccard - 1.0) < 1e-12  # full-set, via recount
    return {"n_docs": n + 2, "hot_shingle_df": n,
            "bounded_sec": round(bounded_sec, 3),
            "exact_opt_out": {"hot_shingle_df": n // 2,
                              "sec": round(exact_sec, 3)}}


def _lsh_recall(spark) -> dict:
    """recall@k of both approximate ANN paths vs the exact baseline.
    The synthetic corpus's true top-k lives at cosine ~0.26-0.37 (weakly
    clustered), the hardest regime for hyperplane LSH — parameters below
    are sized for it and recorded alongside the number."""
    from pyspark.sql import functions as F

    from light_curve_python_spark.operators.similarity import (cosine_topk,
                                                               ivf_topk,
                                                               lsh_topk)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet") \
        .select("vec_id", "embedding")
    probes = emb.filter(F.col("vec_id") < N_ANN_PROBES)

    def topk_sets(df):
        out = {}
        for r in df.select("probe_id", "neighbor_id").collect():
            out.setdefault(r.probe_id, set()).add(r.neighbor_id)
        return out

    def recall_of(approx, exact):
        vals = [len(exact[p] & approx.get(p, set())) / len(exact[p])
                for p in exact]
        return round(sum(vals) / max(len(vals), 1), 4)

    exact = topk_sets(cosine_topk(emb, probes, k=ANN_K, id_col="vec_id"))
    lsh = topk_sets(lsh_topk(emb, probes, k=ANN_K, id_col="vec_id",
                             **LSH_PARAMS))
    ivf = topk_sets(ivf_topk(emb, probes, k=ANN_K, n_cells=16,
                             n_probe_cells=4, seed=42, id_col="vec_id"))
    return {"k": ANN_K, "n_probes": len(exact),
            "lsh": {"recall": recall_of(lsh, exact),
                    "n_planes": LSH_PARAMS["n_planes"],
                    "n_tables": LSH_PARAMS["n_tables"]},
            "ivf": {"recall": recall_of(ivf, exact),
                    "n_cells": 16, "n_probe_cells": 4}}


def _session(cores: int):
    from light_curve_python_spark.session import get_spark
    import __spark_entry__ as E
    # 8 tasks/core: fine enough that the 10x group-cost variance (100 vs
    # 1000-obs entities) doesn't leave straggler tails
    s = get_spark(master=f"local[{cores}]", shuffle_partitions=cores * 8,
                  app_name=f"lcps-bench-{cores}")
    E._ensure_pyfiles(s)  # executors import the package from any cwd
    return s


def _warmup(spark, obs_path, probes_path):
    from light_curve_python_spark.operators.extract import FeatureExtractor
    obs = spark.read.parquet(obs_path)
    probes = spark.read.parquet(probes_path).sample(0.05, seed=1)
    ex = FeatureExtractor(["mean", "amplitude"])
    _force(ex.extract_point_in_time(obs, probes))
    # warm the BUCKETED flagship path too (first touch of the bucketed
    # files + battery codegen), so the timed headline measures throughput
    obs_b, probes_b = _register_bucketed(spark)
    exb = FeatureExtractor(FULL_BATTERY)
    _force(exb.extract_point_in_time(obs_b, probes_b.sample(0.05, seed=1)))


def _time_one(spark, fn) -> float:
    t0 = time.perf_counter()
    _force(fn(spark))
    return time.perf_counter() - t0


def main():
    results, extras = {}, {}

    spark = _session(CPUS)
    obs_path, probes_path = _ensure_synth(spark)
    n_probe_rows = spark.read.parquet(probes_path).count()

    # warm up Python workers + codegen with the actual UDF job on a probe
    # sample, so timed numbers measure throughput, not process spawn
    _warmup(spark, obs_path, probes_path)

    # min-of-3 per headline, runs published: the host has noisy-neighbor
    # swings of 2-3x on identical code (r4's "regressions" were all draws
    # of this), so single-shot headline numbers are not comparable
    # round-to-round; min approximates unloaded capability
    runs_log = {}
    for name, fn in _headline_queries(spark, obs_path, probes_path).items():
        runs = [_time_one(spark, fn) for _ in range(3)]
        runs_log[name] = [round(r, 3) for r in runs]
        results[name] = round(min(runs), 3)
    extras["queries_runs"] = runs_log

    # recall@k of the approximate ANN path vs the exact brute-force
    # baseline on the same probes (driver-side set compare over k*probes
    # rows — measurement harness only, not a pipeline collect)
    extras["lsh_recall_at_k"] = _lsh_recall(spark)
    # default-bounded ngram-jaccard on a synthetic skewed corpus (hot
    # template shingles) — the scale contract behind the 256 default
    extras["ngram_jaccard_bounded"] = _jaccard_skew_bench(spark)
    # auto-tuned ANN operating point for target recall 0.9, measured on a
    # 50-probe sample vs the exact baseline; `ladder` is the whole
    # measured operating curve.  On this weakly-clustered corpus (top-k
    # cosine ~0.3) hitting 0.9 honestly costs ~1 exact-scan equivalent —
    # the tuner reports that rather than shipping silent quality loss
    from light_curve_python_spark.operators.similarity import tune_ann
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet") \
        .select("vec_id", "embedding").cache()
    extras["ann_autotune"] = tune_ann(emb, emb, k=ANN_K,
                                      target_recall=0.9,
                                      n_sample_probes=50, dim=64)
    emb.unpersist()
    spark.stop()

    extras["feature_vectors_per_sec"] = round(
        n_probe_rows / results["pit_extract_full_battery"], 1)
    # steady-state variant (same job, min-of-5 warm runs in the scaling
    # block below) is appended after the scaling measurement

    # scaling evidence: identical flagship PIT job at local[8] vs local[32]
    scaling = {}
    # min of 5: the sandbox host has heavy noisy-neighbor variance (same job
    # measured 9.8-27.6s); min approximates unloaded capability on both sides
    for cores in (8, 32):
        s = _session(cores)
        _warmup(s, obs_path, probes_path)
        runs = [
            _time_one(s, lambda sp: _pit_flagship(sp, obs_path, probes_path))
            for _ in range(5)]
        dt = min(runs)
        scaling[f"local{cores}"] = {
            "sec": round(dt, 3),
            "runs_sec": [round(r, 2) for r in runs],
            "rows_per_sec": round(n_probe_rows / dt, 1),
            "trivial_cogroup_sec": min(_trivial_cogroup_sec(s)
                                       for _ in range(3)),
        }
        s.stop()
    scaling["efficiency_8_to_32"] = round(
        (scaling["local32"]["rows_per_sec"]
         / scaling["local8"]["rows_per_sec"]) / 4.0, 3)
    # the DECOMPOSITION the ratio needs to be read with: the trivial
    # cogroup (zero kernel work) isolates the Spark task/scan machinery,
    # which on this single-JVM host shares ONE driver/DAGScheduler across
    # all cores — its own 8->32 efficiency bounds what any same-plan job
    # can show here; a real N->4N executor scale-up multiplies executors
    # (and their schedulers/disks), which local mode cannot emulate
    scaling["floor_efficiency_8_to_32"] = round(
        (scaling["local8"]["trivial_cogroup_sec"]
         / scaling["local32"]["trivial_cogroup_sec"]) / 4.0, 3)
    # host-ceiling control: what 8 vs 32 INDEPENDENT numpy processes (no
    # Spark) deliver on this box; the Spark job cannot exceed this, so the
    # honest scaling score is efficiency relative to the host ceiling
    scaling["control_numpy_no_spark"] = _host_ceiling_control()
    scaling["efficiency_vs_host_ceiling"] = round(
        scaling["efficiency_8_to_32"]
        / scaling["control_numpy_no_spark"]["efficiency_8_to_32"], 3)
    extras["scaling"] = scaling
    # the flagship's warm steady state (min-of-5) — only meaningful when
    # the headline queries above also ran at 32 cores; at other
    # SPARK_GRAFT_CPUS the scaling leg's core count differs from the
    # headline session's and the two are not comparable
    if CPUS == 32:
        extras["feature_vectors_per_sec_steady"] = \
            scaling["local32"]["rows_per_sec"]
    extras["n_probe_rows"] = n_probe_rows
    extras["n_entities"] = N_ENTITIES

    out = {
        "metric": "bench_total",
        "value": round(sum(results.values()), 3),
        "unit": "sec",
        "queries": results,
        "sf": SF,
        **extras,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
