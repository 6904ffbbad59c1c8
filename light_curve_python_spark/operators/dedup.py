"""Deduplication operators for large-scale training-data pipelines.

Production path uses Spark's built-in ``xxhash64`` (JVM-side, shuffle-free
signatures); the oracle-checkable dictionary-id variants live in
``__spark_entry__`` (integer-exact across engines).  Scale notes per op:

- exact_dedup: one hash-groupBy shuffle on the digest.
- minhash_lsh: shingle explode -> per-doc signature agg (map-side combine) ->
  band-bucket self-join.  Candidate pairs are verified with exact Jaccard so
  LSH is a pure candidate generator (no false positives escape).
- simhash64: one pass, 64 conditional sums per doc.
- ngram_jaccard_pairs: inverted-index join (pairs must share a shingle) —
  the standard superset-of-true-pairs candidate generation; a 100 TB corpus
  additionally prunes by document frequency (drop shingles seen in > df_max
  docs) which is exposed as ``max_shingle_df``.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.balance import rebalance_scan, spread

__all__ = ["content_digest",
           "exact_dedup", "shingle", "minhash_signatures", "lsh_candidates",
           "simhash64", "ngram_jaccard_pairs", "connected_components",
           "dedup_groups", "minhash_dedup", "ngram_contamination"]


def content_digest(cols: Sequence[str]):
    """THE row-content digest for exact dedup — one definition shared by
    the batch operator and the streaming twin so backfill and live
    streams agree on identity.  md5(to_json(struct(...))): column
    boundaries AND nulls are encoded explicitly (xxhash64 treats a NULL
    column as a no-op on its seed, so ("ab", NULL) and (NULL, "ab")
    would collide), and 128 bits keeps the any-pair birthday collision
    probability negligible at 10^12 rows (64 bits would not)."""
    return F.md5(F.to_json(F.struct(*[F.col(c) for c in cols])))


def exact_dedup(df: DataFrame, cols: Sequence[str],
                keep_col: str = "doc_id") -> DataFrame:
    """Keep one representative row (min keep_col, nulls last) per exact
    duplicate group over ``cols``; adds ``dup_count``.

    row_number, not a min()-equality join: window min() skips NULLs, so
    an all-null-id duplicate group had NO row matching the min and the
    whole group silently vanished from the output (and a null-id row in
    a mixed group could never be kept).  One row per group survives even
    when ids are null; ties on keep_col pick one row arbitrarily-but-
    deterministically per partition layout only when rows are otherwise
    identical duplicates."""
    digest = content_digest(cols)
    w = Window.partitionBy("_digest")
    rn = F.row_number().over(
        Window.partitionBy("_digest")
        .orderBy(F.col(keep_col).asc_nulls_last()))
    return (df.withColumn("_digest", digest)
            .withColumn("dup_count", F.count("*").over(w))
            .withColumn("_rn", rn)
            .filter(F.col("_rn") == 1)
            .drop("_digest", "_rn"))


def _shingle_stream(df: DataFrame, text_col: str, k: int, id_col: str,
                    distinct: bool) -> DataFrame:
    """(id, sh) word k-gram stream — THE one tokenize/window pipeline
    behind shingle() and minhash_signatures (the only intended
    difference is the in-row dedup).  element_at, not slice(): the
    per-element slice allocated a k-array per shingle inside the
    interpreted HOF (3x the whole stage at sf1: 1.73 s -> 0.59 s for
    2.6M shingles).  ``rebalance_scan`` spreads the explode across the
    cluster when the corpus scan has fewer splits than cores (no-op at
    production scale)."""
    base = rebalance_scan(df.select(id_col, text_col))
    ws = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    arrs = base.select(id_col, ws.alias("_ws"))
    n = F.size("_ws") - (k - 1)
    sh_arr = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat_ws(" ", *[F.element_at("_ws", i + j)
                                     for j in range(k)]))
    if distinct:
        sh_arr = F.array_distinct(sh_arr)
    return (arrs.filter(n >= 1)
            .select(id_col, F.explode(sh_arr).alias("sh")))


def shingle(df: DataFrame, text_col: str = "text", k: int = 3,
            id_col: str = "doc_id") -> DataFrame:
    """(id, sh) distinct word k-gram shingles.

    Distinctness is per-doc, so it is computed IN-ROW (``array_distinct``
    on each row's shingle array) instead of with a cross-row
    ``.distinct()`` — same rows, one exchange fewer (the former distinct
    shuffled every (id, shingle-string) pair).  Assumes ``id_col``
    identifies its row, the corpus contract every operator here shares
    (duplicate-id input no longer has its shingle sets unioned across
    rows — pre-aggregate such input first; jaccard/simhash/contamination
    consumers would otherwise silently over-count shared shingles)."""
    return _shingle_stream(df, text_col, k, id_col, distinct=True)


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", n_hashes: int = 16,
                       k: int = 3) -> DataFrame:
    """Per-doc minhash signature columns mh0..mh{n-1} from xxhash64'd word
    k-gram shingles (seeded hash per row => n independent permutations).

    Generates the shingle stream WITHOUT ``shingle()``'s array_distinct:
    min over the shingle multiset equals min over the distinct set, so
    the dedup pass is pure cost here — signatures are identical."""
    sh = _shingle_stream(df, text_col, k, id_col, distinct=False)
    aggs = [F.min(F.xxhash64(F.col("sh"), F.lit(i))).alias(f"mh{i}")
            for i in range(n_hashes)]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidates(signatures: DataFrame, id_col: str = "doc_id",
                   n_hashes: int = 16, bands: int = 4) -> DataFrame:
    """Candidate near-dup pairs: docs agreeing on ALL rows of >= 1 band.
    Returns (id_a, id_b) with id_a < id_b, distinct."""
    if bands <= 0 or n_hashes % bands != 0:
        # a remainder would silently leave the last n_hashes % bands
        # signature columns out of every band, lowering recall below
        # what the caller configured (bands <= 0 checked FIRST — the
        # modulo itself would raise a bare ZeroDivisionError)
        raise ValueError(
            f"n_hashes ({n_hashes}) must be divisible by bands ({bands})")
    rows = n_hashes // bands
    # ONE pass over the signatures: band keys stacked into an array and
    # exploded, then a single self-join on (band, key).  The former
    # per-band join loop re-read the signatures lineage 2*bands times
    # (column pruning gave each branch a distinct plan, defeating
    # exchange reuse — the expensive shingle explode upstream ran up to
    # 8x for the defaults).
    band_arr = F.array(*[
        F.struct(F.lit(b).alias("b"), F.xxhash64(
            *[F.col(f"mh{b * rows + r}") for r in range(rows)],
            F.lit(b)).alias("h"))
        for b in range(bands)])
    bd = (signatures.select(id_col, F.explode(band_arr).alias("_z"))
          .select(id_col, F.col("_z.b").alias("_b"),
                  F.col("_z.h").alias("_h")))
    a = bd.select(F.col(id_col).alias("id_a"), "_b", "_h")
    c = bd.select(F.col(id_col).alias("id_b"), "_b", "_h")
    return (a.join(c, ["_b", "_h"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())


def simhash64(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id", k: int = 1) -> DataFrame:
    """64-bit SimHash over word k-gram shingles (xxhash64 bit votes)."""
    sh = shingle(df, text_col, k, id_col)
    h = F.xxhash64(F.col("sh"))
    acc = None
    for bit in range(64):
        vote = F.sum(F.when(F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1,
                            F.lit(1)).otherwise(F.lit(-1)))
        term = F.when(vote > 0,
                      F.lit(1).cast("long") * F.lit(2 ** bit if bit < 63
                                                    else -(2 ** 63))) \
            .otherwise(F.lit(0).cast("long"))
        acc = term if acc is None else acc + term
    return sh.groupBy(id_col).agg(acc.alias("simhash"))


def ngram_contamination(train: DataFrame, eval_df: DataFrame,
                        k: int = 13, text_col: str = "text",
                        id_col: str = "doc_id",
                        max_shingle_df: Optional[int] = 256,
                        min_shared: int = 1) -> DataFrame:
    """Eval-set decontamination: word ``k``-gram overlap between a train
    corpus and an eval set (the standard 13-gram contamination check).
    Returns ``(eval_id, train_id, n_shared, frac_of_eval)`` — distinct
    shared shingles per pair and the fraction of the eval doc's shingles
    found in that train doc; filter ``frac_of_eval`` at your
    contamination threshold.

    Scale shape: inverted-index equi-join on the shingle (eval side is
    small — benchmarks, not the corpus), broadcast when it fits;
    ``max_shingle_df`` prunes train-side stop-shingles so one boilerplate
    k-gram cannot fan out quadratically.  The eval doc's total shingle
    count (the ``frac_of_eval`` denominator) is computed on the UNPRUNED
    set, so pruning only loses candidates, never inflates scores."""
    tr = shingle(train, text_col, k, id_col) \
        .select(F.col(id_col).alias("train_id"), "sh")
    ev = shingle(eval_df, text_col, k, id_col) \
        .select(F.col(id_col).alias("eval_id"), "sh")
    if max_shingle_df is not None:
        tr = (tr.withColumn("_df",
                            F.count("*").over(Window.partitionBy("sh")))
              .filter(F.col("_df") <= max_shingle_df).drop("_df"))
    totals = ev.groupBy("eval_id").agg(F.count("*").alias("_n_ev"))
    return (ev.join(tr, "sh")
            .groupBy("eval_id", "train_id")
            .agg(F.count("*").alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared)
            .join(totals, "eval_id")
            .withColumn("frac_of_eval",
                        F.col("n_shared") / F.col("_n_ev"))
            .drop("_n_ev"))


def minhash_dedup(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", k: int = 3, n_hashes: int = 16,
                  n_bands: int = 4,
                  threshold: float = 0.8) -> DataFrame:
    """End-to-end MinHash near-duplicate dedup — the full pipeline a
    training-data run needs, composed from the verified pieces:

    1. xxhash64 MinHash signatures + banded LSH candidates
       (``minhash_signatures`` / ``lsh_candidates``): candidate pairs
       must collide in >=1 of ``n_bands`` bands;
    2. exact Jaccard verification on the FULL shingle sets (LSH stays a
       pure candidate generator — no false positive survives; unlike the
       inverted-index candidate path, LSH bounds the pair fan-out by
       construction, so no df pruning is needed — or sound — here:
       pruning the verify sets would INFLATE scores for docs sharing hot
       boilerplate and merge non-duplicates);
    3. connected components over verified pairs, min-id canonical per
       group (``connected_components``).

    Returns ``(id, component, is_canonical)`` covering EVERY input doc
    (singletons are their own canonical).

    Scale shape: signatures are one explode + map-side-combined min agg;
    LSH candidates a band-bucket equi-join; verification touches only
    candidate pairs; grouping is O(log n) bounded hash-join rounds.  No
    all-pairs stage anywhere."""
    # one explode + one per-doc shuffle TOTAL: collect the shingle set
    # once, then derive the minhash columns from the set column JVM-side
    # (min over per-seed hashes of a doc's distinct shingles == the
    # explode-side min agg) — lazily recomputing the shingle explode for
    # the signature AND the verify would double the most expensive stage
    sh = shingle(df, text_col, k, id_col)
    # persist: `sets` is referenced three times below (signature
    # derivation + both verify joins) — relying on Spark exchange reuse
    # alone lets column pruning or a plan split recompute the explode
    sets = sh.groupBy(id_col).agg(F.collect_set("sh").alias("_set")) \
        .persist()
    try:
        return _minhash_dedup_body(sets, df, id_col, n_hashes, n_bands,
                                   threshold)
    finally:
        # unpersist even when a guard below raises (e.g. lsh_candidates'
        # divisibility ValueError) — the cached shingle sets otherwise
        # stay pinned for the application's lifetime
        sets.unpersist()


def _minhash_dedup_body(sets, df, id_col, n_hashes, n_bands, threshold):
    def _mh(i):
        # closure factory: a default-arg lambda would be misparsed as the
        # two-parameter (element, index) HOF form
        return F.array_min(F.transform(
            "_set", lambda s: F.xxhash64(s, F.lit(i)))).alias(f"mh{i}")

    sig = sets.select(id_col, *[_mh(i) for i in range(n_hashes)])
    cand = lsh_candidates(sig, id_col, n_hashes=n_hashes, bands=n_bands)
    inter = F.size(F.array_intersect("_sa", "_sb"))
    verified = (cand
                .join(sets.select(F.col(id_col).alias("id_a"),
                                  F.col("_set").alias("_sa")), "id_a")
                .join(sets.select(F.col(id_col).alias("id_b"),
                                  F.col("_set").alias("_sb")), "id_b")
                .withColumn("_inter", inter)
                .withColumn("_j", F.col("_inter")
                            / (F.size("_sa") + F.size("_sb")
                               - F.col("_inter")))
                .filter(F.col("_j") >= threshold)
                .select("id_a", "id_b")
                # verified pairs are tiny (candidates only) — materialize
                # them eagerly so `sets` can be unpersisted before the
                # lazy grouping stage evaluates
                .localCheckpoint(eager=True))
    return dedup_groups(verified, df, id_col)


def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b",
                         nodes: Optional[DataFrame] = None,
                         node_col: Optional[str] = None,
                         max_iter: int = 25) -> DataFrame:
    """Connected components over a near-duplicate pair list:
    ``(id, component)`` with component = the MINIMUM id in each group —
    the step that turns pairwise dedup output (LSH / jaccard / cosine
    pairs) into keep-one-per-group decisions.

    Algorithm: min-label propagation with POINTER JUMPING.  Each round
    does (1) a one-hop neighbor-min join and (2) a label-shortcut join
    ``label <- label(label)`` (labels are always node ids, so the jump is
    well-defined); the shortcut halves the remaining label-tree depth, so
    convergence is O(log n) rounds — each a bounded pair of hash joins,
    the Spark-shaped equivalent of the alternating-star MapReduce
    algorithm.  Terminates when a round changes no label; raises if
    ``max_iter`` rounds were not enough (2^25-deep chains do not occur in
    dedup graphs).

    ``nodes`` (with ``node_col``, default the pair id column name) adds
    isolated documents as their own singleton components so the output
    covers the whole corpus, not just paired docs."""
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (e.unionByName(e.select(F.col("dst").alias("src"),
                                    F.col("src").alias("dst")))
             .distinct())
    labels = edges.select(F.col("src").alias("id")).distinct() \
        .withColumn("lbl", F.col("id"))
    if nodes is not None:
        nc = node_col or id_a
        labels = (nodes.select(F.col(nc).alias("id")).distinct()
                  .withColumn("lbl", F.col("id"))
                  .unionByName(labels)
                  .groupBy("id").agg(F.min("lbl").alias("lbl")))
    edges = edges.persist()
    # localCheckpoint truncates the lineage each round — the iterated
    # self-joins otherwise stack O(rounds) plans deep and overflow the
    # planner (on a cluster with a checkpoint dir, reliable checkpoints
    # swap in transparently)
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iter):
        # (1) one-hop: min label over the neighborhood
        nb = (edges.join(labels.select(F.col("id").alias("dst"),
                                       F.col("lbl").alias("_dl")), "dst")
              .groupBy("src").agg(F.min("_dl").alias("_nl")))
        hop = (labels.join(nb, labels["id"] == nb["src"], "left")
               .select(labels["id"],
                       F.least("lbl", F.coalesce("_nl", "lbl"))
                       .alias("lbl")))
        # (2) pointer jump: follow the label's own label
        jump_src = hop.select(F.col("id").alias("lbl"),
                              F.col("lbl").alias("_ll"))
        new_labels = (hop.join(jump_src, "lbl", "left")
                      .select("id", F.least(
                          "lbl", F.coalesce("_ll", "lbl")).alias("lbl"))
                      .localCheckpoint(eager=True))
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "id")
                   .filter(F.col("n.lbl") != F.col("o.lbl")).count())
        labels = new_labels
        if changed == 0:
            edges.unpersist()
            return labels.select(F.col("id"),
                                 F.col("lbl").alias("component"))
    edges.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds")


def dedup_groups(pairs: DataFrame, nodes: DataFrame, node_col: str,
                 id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """(id, component, is_canonical): full-corpus dedup decision from a
    near-dup pair list — every document labeled with its group's min id;
    keep rows where ``is_canonical``."""
    cc = connected_components(pairs, id_a, id_b, nodes=nodes,
                              node_col=node_col)
    return cc.withColumn("is_canonical", F.col("id") == F.col("component"))


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 3,
                        threshold: float = 0.8,
                        max_shingle_df: Optional[int] = 256) -> DataFrame:
    """Jaccard >= threshold pairs via an inverted shingle index, df-PRUNED
    BY DEFAULT: surviving pairs carry their EXACT full-set Jaccard (the
    recount path below), but a pair whose every shared shingle is hotter
    than ``max_shingle_df`` generates no candidate and is missed — notably
    >cap near-identical copies of one template (exact copies of it are
    still caught by ``exact_dedup``).

    The default cap of 256 is the scale-safe contract: without it the
    candidate join is quadratic in the hottest shingle's document
    frequency, which is a cluster-killer on any real corpus (one stopword
    k-gram is enough).  Pass ``max_shingle_df=None`` to opt out and get
    the exact-superset candidate set — only safe on small/clean corpora
    whose df distribution you have checked.  A shingle shared by d documents
    contributes d*(d-1)/2 candidate pairs, so one stopword shingle in a real
    corpus makes the join quadratic.  Dropping shingles with document
    frequency > cap bounds the per-shingle fan-out at cap^2 while candidates
    for genuinely similar pairs survive through their rarer shingles (the
    standard inverted-index prefix/df-pruning argument)."""
    sh = shingle(df, text_col, k, id_col)
    # ONE inverted-index pass: posting lists per shingle (the df-prune is
    # a size() filter on the list), candidate pairs generated by a nested
    # explode of each list — no self-join, so the shingle relation is
    # neither shuffled twice nor recomputed per join side, and the
    # per-shingle fan-out stays the same d*(d-1)/2 the join produced
    # (bounded by cap^2 under the default).  groupBy(pair).count() over
    # the generated pairs IS |A ∩ B| over the index, exactly as before.
    posts = sh.groupBy("sh").agg(F.collect_list(F.col(id_col)).alias("_ds"))
    kept = posts if max_shingle_df is None else \
        posts.filter(F.size("_ds") <= max_shingle_df)
    # spread(): AQE would coalesce the small posting-list aggregate to a
    # handful of tasks (it sizes reducers by input bytes) and serialize
    # the multiplicative pair explosion there
    pair_stream = (spread(kept)
                   .select(F.explode("_ds").alias("id_a"), "_ds")
                   .select("id_a",
                           F.explode(F.filter(
                               "_ds",
                               lambda x: x > F.col("id_a"))).alias("id_b")))
    if max_shingle_df is None:
        # EXACT mode only: the fan-out is unbounded (quadratic in the
        # hottest df), and the count's reduce cost is hash-map CPU over
        # near-unique keys — map-side partial aggregation is overhead and
        # AQE's byte-based coalescing of the bare exchange serializes the
        # stage onto a few fat partitions.  An explicit-count repartition
        # (the session's configured shuffle partitions, exempt from
        # coalescing) + post-shuffle-only aggregation measured 17.3 ->
        # 9.8 s min-of-2 on the skew probe's half-df exact leg.  The
        # BOUNDED default keeps the partial-agg shape: its fan-out is
        # capped at cap^2 per shingle and the same repartition measured
        # 27% SLOWER there (1.94 -> 2.47 s on the probe's bounded leg).
        try:
            _np = int(df.sparkSession.conf.get(
                "spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):
            # AQE-managed deployments may set a non-numeric value
            # (e.g. "auto"); the session parallelism is the safe floor
            _np = df.sparkSession.sparkContext.defaultParallelism
        pair_stream = pair_stream.repartition(_np, "id_a", "id_b")
    shared = (pair_stream
              .groupBy("id_a", "id_b")
              .agg(F.count("*").alias("_inter")))
    if max_shingle_df is not None:
        # the pruned-index count undercounts pairs that also share hot
        # shingles: recount each surviving candidate against the FULL
        # index (a semi-bounded join — only candidate pairs fan out), so
        # a surviving pair's jaccard is exact per the API contract
        cand = shared.select("id_a", "id_b")
        shared = (cand
                  .join(sh.select(F.col(id_col).alias("id_a"), "sh"),
                        "id_a")
                  .join(sh.select(F.col(id_col).alias("id_b"), "sh"),
                        ["id_b", "sh"])
                  .groupBy("id_a", "id_b")
                  .agg(F.count("*").alias("_inter")))
    # |A| and |B| as per-doc scalars from the UNPRUNED shingle relation:
    # jaccard = n/(|A|+|B|-n) — identical to the former full-set
    # array_intersect verify, without shipping a single array.  The sizes
    # side is dimension-scale (one row per doc) and hinted broadcast:
    # Catalyst's size estimate for the exploded pair aggregate is
    # unreliable and may otherwise broadcast the PAIR side.
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("_n"))
    return (shared
            .join(F.broadcast(sizes.select(F.col(id_col).alias("id_a"),
                                           F.col("_n").alias("_na"))), "id_a")
            .join(F.broadcast(sizes.select(F.col(id_col).alias("id_b"),
                                           F.col("_n").alias("_nb"))), "id_b")
            .withColumn("jaccard", F.col("_inter")
                        / (F.col("_na") + F.col("_nb") - F.col("_inter")))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))
