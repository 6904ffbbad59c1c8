"""Similarity search over embedding columns (array<float>).

- cosine_topk: brute-force exact baseline.  The probe side is broadcast, the
  corpus side streams — at 100 TB the corpus never shuffles; cost is one scan
  per probe batch.  Dot products stay JVM-side via zip_with/aggregate HOFs.
- lsh_topk: random-hyperplane LSH scale path — hyperplanes are derived
  deterministically from a seed (driver-side numpy, broadcast in the plan as
  literals), signatures computed with a vectorized pandas UDF (one matmul per
  Arrow batch), candidates restricted to matching buckets, then exact cosine
  re-rank.  Recall is tunable via n_planes/n_tables.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

__all__ = ["cosine_topk", "lsh_topk", "ivf_topk", "with_l2_norm"]


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def with_l2_norm(df: DataFrame, vec_col: str = "embedding",
                 out_col: str = "_norm") -> DataFrame:
    v = F.col(vec_col).cast("array<double>")
    return df.withColumn(out_col, F.sqrt(_dot(v, v)))


def cosine_topk(corpus: DataFrame, probes: DataFrame, k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact top-k cosine neighbors for each probe row.  Returns
    (probe_id, rank, neighbor_id, cosine)."""
    c = with_l2_norm(
        corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("_cv")),
        "_cv", "_cn")
    p = with_l2_norm(
        probes.select(F.col(id_col).alias("probe_id"),
                      F.col(vec_col).cast("array<double>").alias("_pv")),
        "_pv", "_pn")
    pairs = (c.crossJoin(F.broadcast(p))
             .filter(F.col("neighbor_id") != F.col("probe_id"))
             .withColumn("cosine", _dot(F.col("_cv"), F.col("_pv"))
                         / (F.col("_cn") * F.col("_pn"))))
    pick = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (pairs.withColumn("rank", F.row_number().over(pick))
            .filter(F.col("rank") <= k)
            .select("probe_id", "rank", "neighbor_id", "cosine"))


def ivf_topk(corpus: DataFrame, probes: DataFrame, k: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id",
             n_cells: int = 16, n_probe_cells: int = 3,
             seed: int = 42, sample_fraction: float = 1.0) -> DataFrame:
    """IVF (inverted-file) approximate top-k: KMeans coarse quantizer
    (pyspark.ml, trained on a corpus sample), corpus rows assigned to their
    nearest cell, probe rows search only their ``n_probe_cells`` nearest
    cells, exact cosine re-rank inside.

    Scale shape: the quantizer is tiny (n_cells centroids broadcast in the
    assignment join); the search join hits ~n_probe_cells/n_cells of the
    corpus instead of all of it.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("_fv"))
    if sample_fraction < 1.0:
        train = train.sample(sample_fraction, seed=seed)
    model = KMeans(k=n_cells, seed=seed, featuresCol="_fv").fit(train)
    centers = np.vstack([np.asarray(c) for c in model.clusterCenters()])

    def _cells(df, vec_alias, n_keep):
        """attach the n_keep nearest cell ids per row (tiny centroid matrix
        lives in the plan as a literal via pandas UDF)."""
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        @pandas_udf(T.ArrayType(T.IntegerType()))
        def nearest_cells(vecs: pd.Series) -> pd.Series:
            mat = np.vstack(vecs.to_numpy())
            d = ((mat[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
            order = np.argsort(d, axis=1)[:, :n_keep].astype(np.int32)
            return pd.Series(list(order))

        return df.withColumn("_cells", nearest_cells(vec_alias))

    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("_cv"))
    c = _cells(c, "_cv", 1).withColumn("_cell", F.col("_cells")[0]) \
        .drop("_cells")
    p = probes.select(F.col(id_col).alias("probe_id"),
                      F.col(vec_col).cast("array<double>").alias("_pv"))
    p = _cells(p, "_pv", n_probe_cells) \
        .withColumn("_cell", F.explode("_cells")).drop("_cells")

    cands = (c.join(F.broadcast(p), "_cell")
             .filter(F.col("neighbor_id") != F.col("probe_id"))
             .dropDuplicates(["probe_id", "neighbor_id"]))
    cands = with_l2_norm(cands, "_cv", "_cn")
    cands = with_l2_norm(cands, "_pv", "_pn")
    scored = cands.withColumn(
        "cosine", _dot(F.col("_cv"), F.col("_pv"))
        / (F.col("_cn") * F.col("_pn")))
    pick = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(pick))
            .filter(F.col("rank") <= k)
            .select("probe_id", "rank", "neighbor_id", "cosine"))


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((dim, n_planes))


def _buckets_udf(dim: int, n_planes: int, seed: int, n_tables: int):
    """All tables' bucket ids in ONE vectorized pass: the per-table plane
    matrices (same seeds as before: seed + 1000*t) are stacked into one
    (dim, n_tables*n_planes) matrix — one matmul per Arrow batch total,
    instead of one UDF invocation per table per batch."""
    planes = np.concatenate(
        [_hyperplanes(dim, n_planes, seed + 1000 * t)
         for t in range(n_tables)], axis=1)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy())
        signs = (mat @ planes) > 0
        bks = signs.reshape(len(mat), n_tables,
                            n_planes).astype(np.int64) @ weights
        return pd.Series(list(bks))

    return buckets


def lsh_topk(corpus: DataFrame, probes: DataFrame, k: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id",
             dim: int = 64, n_planes: int = 8, seed: int = 42,
             n_tables: int = 2) -> DataFrame:
    """Approximate top-k: random-hyperplane buckets (n_tables independent
    tables), exact cosine re-rank within the candidate union.

    Plan shape: one bucket-UDF pass over each side (all tables at once),
    candidates generated as SCALAR (probe_id, neighbor_id) pairs — the
    dedup across tables shuffles ids only, never embedding arrays — and
    vectors re-attached per-side for the exact re-rank (corpus-side hash
    join on its own id, probe side broadcast)."""
    udf = _buckets_udf(dim, n_planes, seed, n_tables)
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("_cv"))
    p = probes.select(F.col(id_col).alias("probe_id"),
                      F.col(vec_col).cast("array<double>").alias("_pv"))
    cb = c.select("neighbor_id",
                  F.posexplode(udf("_cv")).alias("_tbl", "_bk"))
    pb = p.select("probe_id",
                  F.posexplode(udf("_pv")).alias("_tbl", "_bk"))
    cand = (cb.join(F.broadcast(pb), ["_tbl", "_bk"])
            .filter(F.col("neighbor_id") != F.col("probe_id"))
            .select("probe_id", "neighbor_id")
            .dropDuplicates(["probe_id", "neighbor_id"]))
    cands = cand.join(c, "neighbor_id").join(F.broadcast(p), "probe_id")
    cands = with_l2_norm(cands, "_cv", "_cn")
    cands = with_l2_norm(cands, "_pv", "_pn")
    scored = cands.withColumn(
        "cosine", _dot(F.col("_cv"), F.col("_pv"))
        / (F.col("_cn") * F.col("_pn")))
    pick = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(pick))
            .filter(F.col("rank") <= k)
            .select("probe_id", "rank", "neighbor_id", "cosine"))
