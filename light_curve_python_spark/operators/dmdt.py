"""dm-dt maps — the reference's 2-D pair-histogram operator
(/root/reference/light-curve/src/dmdt.rs, see SURVEY.md §2.11).

For every observation pair (i < j) of one entity: a 2-D histogram of
(lg Δt, Δm).  Two execution shapes:

- ``dmdt_points_sql``: sparse DataFrame form — per-entity self-join on
  ``t2 > t1`` + width_bucket bucketing, one shuffle, exactly SQL-expressible
  (the DuckDB oracle runs the same query).  O(pairs) rows but pairs live only
  inside the join, the output is per-bucket counts.
- ``dmdt_points_kernel`` / ``dmdt_gausses_kernel``: dense numpy per-curve
  maps (reference ``points``/``gausses``, dmdt.rs:156-242 / :287-420) for
  the grouped-extraction path; ``gausses`` smears each pair over the dm bins
  with the Gaussian CDF (erf), per-pair normalized.

Normalizations (dmdt.rs:68-86): 'dt' divides each lg-dt row by that dt
bin's TOTAL pair count — ``count_dt`` over all pairs, including pairs whose
dm falls outside the dm grid (and, for gausses, mass outside the span);
zero-count rows divide by 1.  'max' divides by the global maximum.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.special import erf

__all__ = ["log_dt_edges", "linear_edges", "dmdt_points_kernel",
           "dmdt_gausses_kernel", "count_dt_kernel", "normalize_dmdt",
           "dmdt_points_sql", "count_dt_sql"]


def log_dt_edges(min_lgdt: float, max_lgdt: float, n: int) -> np.ndarray:
    return np.logspace(min_lgdt, max_lgdt, n + 1)


def linear_edges(lo: float, hi: float, n: int) -> np.ndarray:
    return np.linspace(lo, hi, n + 1)


def _pairs(t: np.ndarray, m: np.ndarray):
    i, j = np.triu_indices(len(t), k=1)
    return t[j] - t[i], m[j] - m[i]


def _bin_exclusive(x: np.ndarray, edges: np.ndarray) -> np.ndarray:
    """Half-open binning [edge_i, edge_{i+1}) including the grid contract's
    exclusive TOP edge (dmdt.rs:779 documents the plane as limited by
    [min; max)) — np.histogram would include the last bin's right edge."""
    idx = np.searchsorted(edges, x, side="right") - 1
    idx[x == edges[0]] = 0  # left edge inclusive
    out_of_range = (idx < 0) | (idx >= len(edges) - 1) | (x >= edges[-1])
    idx[out_of_range] = -1
    return idx


def dmdt_points_kernel(t: np.ndarray, m: np.ndarray,
                       dt_edges: np.ndarray,
                       dm_edges: np.ndarray) -> np.ndarray:
    """Dense (n_dt, n_dm) pair-count map (dmdt.rs:156-242); all intervals
    half-open per the reference's [min; max) grid contract."""
    dt, dm = _pairs(np.asarray(t, float), np.asarray(m, float))
    i = _bin_exclusive(dt, np.asarray(dt_edges, float))
    j = _bin_exclusive(dm, np.asarray(dm_edges, float))
    ok = (i >= 0) & (j >= 0)
    hist = np.zeros((len(dt_edges) - 1, len(dm_edges) - 1))
    np.add.at(hist, (i[ok], j[ok]), 1.0)
    return hist


def dmdt_gausses_kernel(t: np.ndarray, m: np.ndarray, sigma: np.ndarray,
                        dt_edges: np.ndarray,
                        dm_edges: np.ndarray) -> np.ndarray:
    """Gaussian-smeared map (dmdt.rs:287-420): each pair contributes to its
    dt row the probability mass of N(dm_pair, sigma_i^2 + sigma_j^2) within
    each dm bin: 0.5*(erf((edge_hi - dm)/(sqrt(2) s)) - erf((edge_lo - dm)/..))."""
    t = np.asarray(t, float)
    m = np.asarray(m, float)
    sigma = np.asarray(sigma, float)
    i, j = np.triu_indices(len(t), k=1)
    dt = t[j] - t[i]
    dm = m[j] - m[i]
    s = np.sqrt(sigma[i] ** 2 + sigma[j] ** 2)
    out = np.zeros((len(dt_edges) - 1, len(dm_edges) - 1))
    row = np.searchsorted(dt_edges, dt, side="right") - 1
    ok = (row >= 0) & (row < out.shape[0])
    z = (dm_edges[None, :] - dm[ok, None]) / (math.sqrt(2.0) * s[ok, None])
    cdf = 0.5 * (1.0 + erf(z))
    mass = np.diff(cdf, axis=1)
    np.add.at(out, row[ok], mass)
    return out


def count_dt_kernel(t: np.ndarray,
                    dt_edges: np.ndarray) -> np.ndarray:
    """1-D Δt pair histogram — the reference's ``count_dt``
    (src/dmdt.rs:88-154: ``dt_points`` over ALL pairs, no dm filtering)."""
    t = np.asarray(t, float)
    i, j = np.triu_indices(len(t), k=1)
    b = _bin_exclusive(t[j] - t[i], np.asarray(dt_edges, float))
    hist = np.zeros(len(dt_edges) - 1)
    np.add.at(hist, b[b >= 0], 1.0)
    return hist


def normalize_dmdt(hist: np.ndarray, norm: Sequence[str] = (),
                   dt_counts: Optional[np.ndarray] = None) -> np.ndarray:
    """Reference normalize (src/dmdt.rs:68-86): 'dt' divides each lg-dt row
    by ``dt_counts`` — the count_dt histogram over ALL pairs (zeros -> 1),
    NOT the in-dm-range row sum; 'max' divides by the global maximum."""
    out = hist.astype(np.float64)
    if "dt" in norm:
        if dt_counts is None:
            raise ValueError(
                "'dt' normalization needs dt_counts = count_dt_kernel(t, "
                "dt_edges): the reference divides by the total pair count "
                "of each dt bin, including pairs outside the dm grid")
        counts = np.where(np.asarray(dt_counts, float) == 0, 1.0,
                          np.asarray(dt_counts, float))
        out /= counts[:, None]
    if "max" in norm:
        mx = out.max()
        if mx > 0:
            out /= mx
    return out


def dmdt_points_sql(obs: DataFrame, entity: str = "doc_id", t: str = "t",
                    m: str = "m", lgdt_min: float = -1.0,
                    lgdt_max: float = 2.0, n_dt: int = 16,
                    dm_min: float = -2.0, dm_max: float = 2.0,
                    n_dm: int = 16) -> DataFrame:
    """Sparse per-entity map: (entity, dt_bin, dm_bin, pair_count), 0-based
    bins, uniform in lg(dt) × dm (the reference's default lg/linear grids).

    Self-join on the entity key (co-partitioned, no broadcast needed) with
    ``t2 > t1``; arithmetic bin indices so DuckDB computes the identical
    thing.  At scale the O(n²)-per-entity pair growth is bounded by
    windowing the observations first (compose with bin_series).
    """
    a = obs.select(F.col(entity).alias("_e"), F.col(t).alias("_t1"),
                   F.col(m).alias("_m1"))
    b = obs.select(F.col(entity).alias("_e"), F.col(t).alias("_t2"),
                   F.col(m).alias("_m2"))
    pairs = a.join(b, "_e").filter(F.col("_t2") > F.col("_t1"))
    lg_step = (lgdt_max - lgdt_min) / n_dt
    dm_step = (dm_max - dm_min) / n_dm
    dt_bin = F.floor((F.log10(F.col("_t2") - F.col("_t1")) - F.lit(lgdt_min))
                     / F.lit(lg_step))
    dm_bin = F.floor((F.col("_m2") - F.col("_m1") - F.lit(dm_min))
                     / F.lit(dm_step))
    return (pairs
            .withColumn("dt_bin", dt_bin)
            .withColumn("dm_bin", dm_bin)
            .filter((F.col("dt_bin") >= 0) & (F.col("dt_bin") < n_dt)
                    & (F.col("dm_bin") >= 0) & (F.col("dm_bin") < n_dm))
            .groupBy(F.col("_e").alias(entity), "dt_bin", "dm_bin")
            .agg(F.count("*").alias("pair_count")))


def count_dt_sql(obs: DataFrame, entity: str = "doc_id", t: str = "t",
                 lgdt_min: float = -1.0, lgdt_max: float = 2.0,
                 n_dt: int = 16) -> DataFrame:
    """Sparse count_dt: (entity, dt_bin, pair_count) — 1-D variant of
    dmdt_points_sql (ref src/dmdt.rs:88-154), same arithmetic bin indices so
    DuckDB computes the identical thing."""
    a = obs.select(F.col(entity).alias("_e"), F.col(t).alias("_t1"))
    b = obs.select(F.col(entity).alias("_e"), F.col(t).alias("_t2"))
    pairs = a.join(b, "_e").filter(F.col("_t2") > F.col("_t1"))
    lg_step = (lgdt_max - lgdt_min) / n_dt
    dt_bin = F.floor((F.log10(F.col("_t2") - F.col("_t1")) - F.lit(lgdt_min))
                     / F.lit(lg_step))
    return (pairs
            .withColumn("dt_bin", dt_bin)
            .filter((F.col("dt_bin") >= 0) & (F.col("dt_bin") < n_dt))
            .groupBy(F.col("_e").alias(entity), "dt_bin")
            .agg(F.count("*").alias("pair_count")))
