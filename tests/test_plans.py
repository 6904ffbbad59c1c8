"""Physical-plan assertions: the scale claims in the docstrings are checked
against .explain output, not taken on faith.

- single-shuffle operators really have exactly one Exchange;
- multi-stage features reuse the entity partitioning (no extra Exchange);
- small dimension joins broadcast;
- parquet filters reach the scan (PushedFilters);
- bucketed tables feed the cogroup with zero Exchanges.
"""

import re

import pytest
from pyspark.sql import functions as F

from light_curve_python_spark.datagen import (
    generate_observations,
    generate_probes,
)
from light_curve_python_spark.functions import sqlfeatures as SQ
from light_curve_python_spark.operators.asof import asof_join
from light_curve_python_spark.operators.bins import bin_series
from light_curve_python_spark.operators.sessionize import sessionize


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _n_exchanges(df) -> int:
    # count shuffle exchanges only (not BroadcastExchange)
    return len(re.findall(r"(?<!Broadcast)Exchange (?:hashpartitioning|"
                          r"rangepartitioning|SinglePartition)", _plan(df)))


@pytest.fixture(scope="module")
def obs(spark):
    return generate_observations(spark, 10, seed=1, n_obs_choices=(20,))


def test_asof_join_single_shuffle(spark, obs):
    probes = generate_probes(spark, 10, 4, seed=1).select("doc_id", "ts")
    out = asof_join(probes, obs.select("doc_id", "t", "m"), on="doc_id",
                    value_cols=["m"])
    assert _n_exchanges(out) == 1, _plan(out)


def test_sessionize_single_shuffle(spark, obs):
    out = sessionize(obs, "doc_id", "t", gap=10.0)
    assert _n_exchanges(out) == 1, _plan(out)


def test_bins_single_shuffle(spark, obs):
    out = bin_series(obs, window=10.0)
    assert _n_exchanges(out) == 1, _plan(out)


def test_multistage_features_reuse_partitioning(spark, obs):
    """dispersion = lag/cumsum windows THEN aggregate, all on the entity key:
    Catalyst must plan ONE exchange, not one per stage."""
    out = SQ.dispersion_stats(obs, "doc_id", "t", "m")
    assert _n_exchanges(out) == 1, _plan(out)
    out2 = SQ.weighted_stats(obs, "doc_id", "m", "sigma")
    assert _n_exchanges(out2) <= 2, _plan(out2)


def test_filter_pushdown_to_parquet(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .filter(F.col("event_type") == "purchase").select("user_id", "value")
    plan = _plan(ev)
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)" \
        in plan, plan
    # column pruning: scan must not read props/ts
    m = re.search(r"ReadSchema: ([^\n]+)", plan)
    assert m and "props" not in m.group(1), plan


def test_small_dim_join_broadcasts(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dim = docs.select("lang").distinct().withColumn("flag", F.lit(1))
    out = docs.join(F.broadcast(dim), "lang")
    assert "BroadcastHashJoin" in _plan(out)


def test_bucketed_cogroup_zero_exchange(spark, tmp_path_factory, obs):
    import pandas as pd
    wh = str(tmp_path_factory.mktemp("wh"))
    spark.sql(f"CREATE DATABASE IF NOT EXISTS pt LOCATION '{wh}'")
    obs.write.mode("overwrite").format("parquet") \
        .bucketBy(4, "doc_id").sortBy("doc_id", "t").saveAsTable("pt.o")
    generate_probes(spark, 10, 4, seed=1).select("doc_id", "ts") \
        .write.mode("overwrite").format("parquet") \
        .bucketBy(4, "doc_id").saveAsTable("pt.p")

    def fn(a, b):
        if len(b) == 0:
            return pd.DataFrame({"doc_id": [], "x": []})
        return pd.DataFrame({"doc_id": [b.doc_id.iloc[0]],
                             "x": [float(len(a))]})

    g = spark.table("pt.o").groupby("doc_id").cogroup(
        spark.table("pt.p").groupby("doc_id")) \
        .applyInPandas(fn, "doc_id string, x double")
    assert _n_exchanges(g) == 0, _plan(g)


def test_feature_spec_roundtrips_priors_and_rainbow():
    """ln_prior-carrying fit params and the rainbow_fit facade must survive
    the JSON round trip (plans resume from disk)."""
    from light_curve_python_spark.functions.fits import LnPrior
    from light_curve_python_spark.plans.spec import FeatureSpec
    priors = [LnPrior.none().spec, LnPrior.normal(2.0, 0.1).spec,
              LnPrior.none().spec, LnPrior.uniform(1.0, 9.0).spec,
              LnPrior.none().spec]
    spec = FeatureSpec.of(
        ("bazin_fit", {"ln_prior": priors, "max_iter": 50}),
        ("rainbow_fit", {"band_wave_cm": {"g": 4.77e-5, "r": 6.231e-5}}),
    )
    rt = FeatureSpec.from_json(spec.to_json())
    assert rt.features == spec.features  # (fill NaN != NaN by design)
    names = rt.names
    assert "bazin_fit_a" in names and "r_chisq" in names
    # compiled kernels carry the prior specs
    ex = rt.to_extractor()
    bazin = ex.kernels[0]
    assert bazin.params["ln_prior"][1][0] == "normal"


def test_submit_entrypoint_end_to_end(spark, tmp_path):
    """scripts/submit_extract.py: the spark-submit CLI runs the
    checkpointed PIT extraction end-to-end and resumes idempotently."""
    import sys
    sys.path.insert(0, "scripts")
    import submit_extract

    from light_curve_python_spark.datagen import (
        generate_observations,
        generate_probes,
    )
    obs_dir = str(tmp_path / "obs")
    probes_dir = str(tmp_path / "probes")
    out_dir = str(tmp_path / "features")
    generate_observations(spark, 8, seed=3, n_obs_choices=(40,)) \
        .write.parquet(obs_dir)
    generate_probes(spark, 8, probes_per_entity=3, seed=3) \
        .select("doc_id", "ts").write.parquet(probes_dir)
    argv = ["--obs", obs_dir, "--probes", probes_dir, "--output", out_dir,
            "--features", "mean", "amplitude", "--n-buckets", "4",
            "--master", "local[4]"]
    assert submit_extract.main(argv) == 0
    got = spark.read.parquet(*[f"{out_dir}/bucket={b}" for b in range(4)])
    assert got.count() == 24
    assert {"mean", "amplitude"} <= set(got.columns)
    # resume: nothing recomputed
    assert submit_extract.main(argv + ["--resume"]) == 0
    import json
    with open(f"{out_dir}/_manifest.jsonl") as f:
        entries = [json.loads(x) for x in f]
    assert len(entries) == 4  # no duplicate commits after resume


def test_checkpoint_resume_guards(spark, tmp_path):
    """Resuming with a different bucket count or feature spec must refuse
    (silently dropping/duplicating probes otherwise); object-store output
    paths are rejected up front."""
    from light_curve_python_spark.datagen import generate_probes
    from light_curve_python_spark.plans.checkpoint import CheckpointedRun
    probes = generate_probes(spark, 6, probes_per_entity=2, seed=2) \
        .select("doc_id", "ts")
    out = str(tmp_path / "run2")
    run = CheckpointedRun(out, "doc_id", n_buckets=4, spec_json='{"v":1}')
    run.run(probes, lambda s: s.withColumn("f", F.col("ts")))
    with pytest.raises(ValueError, match="n_buckets"):
        CheckpointedRun(out, "doc_id", n_buckets=8, spec_json='{"v":1}') \
            .run(probes, lambda s: s)
    with pytest.raises(ValueError, match="different feature spec"):
        CheckpointedRun(out, "doc_id", n_buckets=4, spec_json='{"v":2}') \
            .run(probes, lambda s: s)
    with pytest.raises(ValueError, match="scheme"):
        CheckpointedRun("s3://bucket/features", "doc_id")
    # 'file://home/x' parses as netloc='home' — silently using the path
    # would drop the first component; must refuse
    with pytest.raises(ValueError, match="authority"):
        CheckpointedRun("file://home/user/out", "doc_id")
    # well-formed file:/// works and round-trips through run/read
    out3 = str(tmp_path / "run3")
    run3 = CheckpointedRun("file://" + out3, "doc_id", n_buckets=2)
    run3.run(probes, lambda s: s.withColumn("f", F.col("ts")))
    assert run3.read(spark).count() == probes.count()
