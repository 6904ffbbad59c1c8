"""SparkSession factory with the engine's required configuration.

Arrow transfer on (all kernels run as Arrow-batched pandas UDFs), AQE on with
skew-join handling (hot-entity mitigation for the as-of merge), and sane
shuffle-partition defaults for local testing.  On a real cluster these settings
ride along unchanged; only master/partitions scale up.
"""

from __future__ import annotations

import os
import re
from typing import Optional

from pyspark.sql import SparkSession

__all__ = ["get_spark", "DEFAULT_SHUFFLE_PARTITIONS"]

# empty-string env (e.g. `SPARK_GRAFT_CPUS= spark-submit ...`) means unset
DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS") or "32")


def _defaults_conf_has_master() -> bool:
    """True when a spark-defaults.conf visible to this process pins
    spark.master — the builder must then leave master unset so the conf
    file wins (a local[*] fallback would silently run cluster-configured
    jobs locally)."""
    conf_dir = os.environ.get("SPARK_CONF_DIR")
    if not conf_dir and os.environ.get("SPARK_HOME"):
        conf_dir = os.path.join(os.environ["SPARK_HOME"], "conf")
    if not conf_dir:
        return False
    path = os.path.join(conf_dir, "spark-defaults.conf")
    try:
        with open(path) as f:
            for line in f:
                # java.util.Properties accepts whitespace, '=' and ':'
                # as key separators — recognize all three, with exact
                # key match (spark.master.rest.enabled must NOT pin)
                key = re.split(r"[\s=:]", line.strip(), 1)[0]
                if key == "spark.master":
                    return True
    except OSError:
        return False
    return False


def _local_dirs() -> Optional[str]:
    """Fast local storage for shuffle files.  The container's overlay fs is
    pathologically slow for shuffle I/O (7x slowdown measured); /dev/shm
    stands in for the local SSDs a real cluster would use."""
    if os.path.isdir("/dev/shm"):
        d = "/dev/shm/spark-local"
        os.makedirs(d, exist_ok=True)
        return d
    return None


def get_spark(master: Optional[str] = None,
              app_name: str = "light-curve-python-spark",
              shuffle_partitions: Optional[int] = None,
              extra_conf: Optional[dict] = None) -> SparkSession:
    # numpy kernels are parallelized by Spark tasks; per-worker BLAS
    # threading would oversubscribe the cores
    for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(v, "1")
    if master is None:
        # under spark-submit/cluster managers spark.master is already set;
        # only default to local[...] when the env pins a local run
        # (tests/bench set SPARK_GRAFT_CPUS) so the CLI entrypoint never
        # silently overrides the cluster master
        under_cluster = ("PYSPARK_GATEWAY_PORT" in os.environ
                         or "SPARK_MASTER" in os.environ
                         or "MASTER" in os.environ
                         or _defaults_conf_has_master())
        cpus = os.environ.get("SPARK_GRAFT_CPUS") or None
        if cpus and not under_cluster:
            # a leftover test/bench env var must NOT override a real
            # cluster master under spark-submit
            master = f"local[{cpus}]"
        elif not under_cluster:
            # plain `python script.py` (no spark-submit gateway, no master
            # env, no spark-defaults.conf master): getOrCreate would fail
            # with "master URL must be set" — keep the interactive default
            master = "local[*]"
    shuffle_partitions = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    builder = SparkSession.builder
    if master is not None:
        builder = builder.master(master)
    builder = (
        builder.appName(app_name)
        # Arrow batches between JVM and Python workers — the zero-copy path
        # that replaces the reference's PyO3 boundary (SURVEY.md §3.4)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Spark 4 byte-based bound: the aggregate-then-map operators ship
        # whole curves as list<struct> rows, so a records-only cap would
        # let a few million-point entities put GBs into one Python batch
        # (guide §4.2); 64m splits such batches with no effect on the
        # common case
        .config("spark.sql.execution.arrow.maxBytesPerBatch",
                str(64 * 1024 * 1024))
        # runtime re-planning: partition coalescing + skew-join splitting
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # default-true, pinned: forked Python workers persist across tasks,
        # so kernel import/jit costs are paid once per core, not per task
        .config("spark.python.worker.reuse", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    local_dirs = _local_dirs()
    if local_dirs:
        builder = builder.config("spark.local.dir", local_dirs)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
