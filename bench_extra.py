#!/usr/bin/env python
"""Per-query isolation harness (guide §1.4) — times individual bench
headlines with the noop sink, min-of-N, without touching the FROZEN
bench.py.  Usage:

    SPARK_GRAFT_SF_DIR=... python bench_extra.py [query ...] [--n 3]

With no query names, runs all 12 headlines.  Prints one JSON line
{"queries": {...}, "sf": ...} (plus per-run draws) for OPTIMIZATION_r06.md
evidence.  Shares bench.py's session/warmup/datagen so numbers are
comparable with the frozen harness.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # noqa: E402


def main():
    args = [a for a in sys.argv[1:]]
    n_runs = 3
    if "--n" in args:
        i = args.index("--n")
        if i + 1 >= len(args):
            sys.exit("--n needs a value")
        n_runs = int(args[i + 1])
        del args[i:i + 2]
    only = set(args)

    spark = bench._session(bench.CPUS)
    obs_path, probes_path = bench._ensure_synth(spark)
    bench._warmup(spark, obs_path, probes_path)
    queries = bench._headline_queries(spark, obs_path, probes_path)
    unknown = only - set(queries)
    if unknown:
        sys.exit(f"unknown queries: {sorted(unknown)}; "
                 f"choose from {sorted(queries)}")
    results, runs_log = {}, {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        runs = [bench._time_one(spark, fn) for _ in range(n_runs)]
        spark.sparkContext.setJobDescription(None)
        runs_log[name] = [round(r, 3) for r in runs]
        results[name] = round(min(runs), 3)
    spark.stop()
    print(json.dumps({"queries": results, "sf": bench.SF,
                      "queries_runs": runs_log,
                      "value": round(sum(results.values()), 3)}))


if __name__ == "__main__":
    main()
