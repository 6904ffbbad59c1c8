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

__all__ = ["hash_sample", "temperature_rates", "temperature_sample"]

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


def temperature_rates(df: DataFrame, stratify_col: str = "source",
                      alpha: float = 0.5,
                      budget: Optional[int] = None) -> Dict[str, float]:
    """Per-stratum keep rates for TEMPERATURE data mixing: sample so the
    mixed distribution follows p_s^alpha (renormalized) instead of the
    corpus's natural p_s — the standard multilingual/multi-source
    rebalancing device (alpha=1 keeps natural proportions, alpha=0 targets
    uniform, alpha~0.3 is the usual low-resource boost).

    With ``budget=None`` the total is the LARGEST achievable under
    downsampling only: T = min_s n_s / q_s, which pins the most
    oversampled-relative-to-natural stratum at rate 1.0 (this engine
    never duplicates rows; upsampling beyond 1.0 is a training-loop
    concern, so rates are capped and the cap is the documented contract).
    With an explicit ``budget`` (total rows), rates are T*q_s/n_s capped
    at 1.0 — strata hitting the cap deliver less than their target share.

    The per-stratum counts are ONE tiny groupBy().count() collected to
    the driver (one row per stratum — a dimension-scale collect); the
    returned dict feeds ``hash_sample`` for the deterministic keep
    decision."""
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    rows = df.groupBy(stratify_col).count().collect()
    if not rows:
        return {}
    counts = {r[0]: r[1] for r in rows}
    if None in counts:
        raise ValueError(f"NULL {stratify_col} stratum: temperature "
                         "rates need a total stratum key")
    w = {s: float(n) ** alpha for s, n in counts.items()}
    sw = sum(w[s] for s in sorted(w))
    q = {s: w[s] / sw for s in w}
    t = budget if budget is not None else \
        min(counts[s] / q[s] for s in counts)
    return {s: min(1.0, t * q[s] / counts[s]) for s in counts}


def temperature_sample(df: DataFrame, stratify_col: str = "source",
                       alpha: float = 0.5, budget: Optional[int] = None,
                       key_col: str = "doc_id", seed: int = 0,
                       hash_fn: Optional[Callable[[Column], Column]] = None
                       ) -> DataFrame:
    """``temperature_rates`` composed with ``hash_sample``: deterministic
    temperature-mixed subsample of ``df``."""
    rates = temperature_rates(df, stratify_col, alpha, budget)
    return hash_sample(df, rates, stratify_col, key_col, seed,
                       default_rate=0.0, hash_fn=hash_fn)
