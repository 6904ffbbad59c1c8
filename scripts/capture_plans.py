#!/usr/bin/env python
"""Capture .explain("formatted") for every bench headline query into
plans/r06/<query>_<tag>.txt.  Usage:

    python scripts/capture_plans.py <tag> [query ...]

Runs against $SPARK_GRAFT_SF_DIR (plans are scale-independent; the default
sf0.1 is fine).  Mostly explain-only; queries containing an eager
localCheckpoint (nn_jaccard) run their checkpointed prefix at DataFrame
construction.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

tag = sys.argv[1] if len(sys.argv) > 1 else "before"
only = set(sys.argv[2:])

import bench  # noqa: E402

spark = bench._session(int(os.environ.get("SPARK_GRAFT_CPUS") or "32"))
import __spark_entry__ as E  # noqa: E402

E._ensure_pyfiles(spark)
obs_path, probes_path = bench._ensure_synth(spark)

out_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", "r06")
os.makedirs(out_dir, exist_ok=True)

for name, fn in bench._headline_queries(spark, obs_path, probes_path).items():
    if only and name not in only:
        continue
    df = fn(spark)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    path = os.path.join(out_dir, f"{name}_{tag}.txt")
    with open(path, "w") as f:
        f.write(plan)
    print(f"{path}: {plan.count('Exchange')} Exchange, "
          f"{plan.count('ArrowEvalPython') + plan.count('BatchEvalPython')} "
          f"PythonEval, {plan.count('SortMergeJoin')} SMJ, "
          f"{plan.count('BroadcastHashJoin')} BHJ")
spark.stop()
