"""Deterministic sampling / data-mixing operators.

Training-data pipelines need REPRODUCIBLE sampling: the same document must
make the same keep/drop decision on every run, on every cluster size, and
in the backfill job — so the decision is a pure hash of the row key, never
``rand()`` (whose draw depends on partitioning and task retries).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hash_sample"]

_BUCKETS = 1_000_000


def hash_sample(df: DataFrame, rates: Dict[str, float],
                stratify_col: str = "source", key_col: str = "doc_id",
                seed: int = 0, default_rate: float = 0.0,
                hash_fn: Optional[Callable[[Column], Column]] = None
                ) -> DataFrame:
    """Stratified deterministic sampling: keep a row iff
    ``hash(key, seed) mod 1e6 < rate[stratum] * 1e6``.

    This is the data-mixing primitive: ``rates`` carries the per-source
    mixing ratios (e.g. ``{"web": 0.1, "books": 1.0}``); missing strata
    fall back to ``default_rate``.  Decisions are a pure function of
    ``(key, seed)`` — stable under repartitioning, task retries, cluster
    size, and incremental re-runs, unlike ``df.sample``/``sampleBy``
    whose draws are per-partition.  Changing ``seed`` redraws everything
    independently.

    ``hash_fn`` swaps the hash (default: JVM ``xxhash64`` of the key and
    seed — shuffle-free, whole-stage-codegen'd).  NB: rows with a NULL
    key all hash identically (xxhash64 skips null arguments), so the
    entire null-key population is kept or dropped EN BLOC, not at the
    stratum rate — validate key completeness upstream.  The DuckDB oracle twin
    passes a modular-arithmetic hash both engines compute integer-exactly
    (the same oracle-only device as the minhash queries)."""
    if hash_fn is None:
        def hash_fn(c):
            return F.xxhash64(c, F.lit(seed))
    bucket = F.pmod(hash_fn(F.col(key_col)), F.lit(_BUCKETS))
    rate = F.lit(int(round(default_rate * _BUCKETS)))
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(stratify_col) == stratum,
                      F.lit(int(round(r * _BUCKETS)))).otherwise(rate)
    return df.filter(bucket < rate)
