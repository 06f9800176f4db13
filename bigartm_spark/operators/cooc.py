"""D14: sliding-window co-occurrence gathering + PPMI.

Reference: /root/reference/src/artm/core/cooccurrence_collector.cc (per-chunk
sorted "cooc batches" + external k-way merge, ~950 LoC). On Spark the whole
external sort-merge machinery is replaced by one self-join + hash aggregate
shuffle; PPMI = two broadcast joins against marginals
(cooccurrence_collector.cc:414-477,745-790).

Scale note: the position self-join is |doc| x |window| sized — the join key
is doc_id so it co-partitions both sides in a single shuffle; skewed giant
documents are handled by AQE skew-join splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Same tracked-cache discipline as operators/dedup.py: cooc_ppmi caches
# the gathered pair relation (read three times by ppmi: two marginal
# scans + the join); callers release once their consuming action ran.
_TRACKED_CACHES: list[DataFrame] = []


def _tracked_cache(df: DataFrame) -> DataFrame:
    out = df.cache()
    _TRACKED_CACHES.append(out)
    return out


def release_cooc_caches() -> None:
    """Unpersist every pair relation cached by cooc_ppmi. Safe at any
    time: a consumer whose plan still references one recomputes it
    uncached."""
    while _TRACKED_CACHES:
        try:
            _TRACKED_CACHES.pop().unpersist()
        except Exception:
            pass


def _pair_cols():
    return [
        F.least("_tok_i", "_tok_j").alias("token_a"),
        F.greatest("_tok_i", "_tok_j").alias("token_b"),
    ]


def cooc_gather(
    docs: DataFrame,
    window: int = 5,
    min_tf: float | None = None,
    min_df: float | None = None,
    symmetric: bool = True,
    dense_pos: bool = True,
) -> DataFrame:
    """cooc(token_a, token_b, cooc_tf, cooc_df) — pairs of tokens whose
    positions within a doc are at most ``window`` apart. Counting is always
    over unordered pairs (the window relation is symmetric); symmetric=True
    (default) stores each pair once, canonicalized token_a < token_b.
    symmetric=False mirrors every cell into both orientations — the
    reference's storage default, where --store-symmetric-cooc merely
    suppresses the repeated (b, a) rows (srcmain.cc:1788).

    Plan note (dense_pos=True, the default — every parser here emits pos
    as a per-doc row_number, so positions are dense 1..n): the forward
    neighbors of each occurrence are lead(token, i) over the per-doc
    position order, so the whole pair relation falls out of ONE shuffle
    (window by doc_id) with no join at all. For a relation whose pos has
    gaps (externally produced), dense_pos=False keeps the
    offset-explode + equi-join on (doc_id, pos): w*nnz join rows, no
    quadratic blowup, AQE-friendly. A naive doc_id self-join with an
    |pos_a - pos_b| <= w filter is never used — it materializes nnz_d^2
    intermediates per doc."""
    if dense_pos:
        from pyspark.sql import Window

        w = Window.partitionBy("doc_id").orderBy("pos")
        nbrs = F.array(
            *[F.lead("token", i).over(w) for i in range(1, window + 1)]
        )
        # window exprs evaluated in their own projection: a generator
        # cannot share a select with window functions
        stepped = docs.select(
            "doc_id", F.col("token").alias("_tok_i"), nbrs.alias("_nbrs")
        )
        pairs = (
            stepped.select(
                "doc_id", "_tok_i", F.explode("_nbrs").alias("_tok_j")
            )
            .filter(F.col("_tok_j").isNotNull())
            .filter(F.col("_tok_i") != F.col("_tok_j"))
            .select("doc_id", *_pair_cols())
        )
    else:
        offsets = F.array(
            *[F.col("pos") + F.lit(i) for i in range(1, window + 1)]
        )
        left = docs.select(
            "doc_id",
            F.col("token").alias("_tok_i"),
            F.explode(offsets).alias("_pos_j"),
        )
        right = docs.select(
            "doc_id",
            F.col("token").alias("_tok_j"),
            F.col("pos").alias("_pos_j"),
        )
        pairs = (
            left.join(right, ["doc_id", "_pos_j"])
            .filter(F.col("_tok_i") != F.col("_tok_j"))
            .select("doc_id", *_pair_cols())
        )
    # two-stage agg instead of count(distinct doc_id): the Expand that
    # implements countDistinct doubles the shuffled rows; pre-aggregating
    # per (pair, doc) gets map-side combine on within-doc repeats, then
    # df is a plain count of the per-doc rows
    per_doc = pairs.groupBy("token_a", "token_b", "doc_id").agg(
        F.count(F.lit(1)).alias("_c")
    )
    out = per_doc.groupBy("token_a", "token_b").agg(
        F.sum("_c").cast("double").alias("cooc_tf"),
        F.count(F.lit(1)).cast("double").alias("cooc_df"),
    )
    if min_tf is not None:
        out = out.filter(F.col("cooc_tf") >= min_tf)
    if min_df is not None:
        out = out.filter(F.col("cooc_df") >= min_df)
    if not symmetric:
        out = out.unionAll(
            out.select(
                F.col("token_b").alias("token_a"),
                F.col("token_a").alias("token_b"),
                "cooc_tf",
                "cooc_df",
            )
        )
    return out


def ppmi(cooc: DataFrame) -> DataFrame:
    """PPMI = max(0, ln(n * n_uv / (n_u * n_v))) with n_u = token pair-mass
    marginals, n = total pair mass (both directions)."""
    # single read of the cooc relation: explode each pair into its two
    # endpoint contributions (a union would scan it twice); n falls out
    # of the same marginals (sum_u n_u == 2 * sum(tf))
    marg = (
        cooc.select(
            F.explode(
                F.array(F.col("token_a"), F.col("token_b"))
            ).alias("token"),
            "cooc_tf",
        )
        .groupBy("token")
        .agg(F.sum("cooc_tf").alias("n_u"))
    )
    n = marg.agg(F.sum("n_u").alias("n"))
    out = (
        cooc.join(F.broadcast(marg.withColumnRenamed("token", "token_a")
                  .withColumnRenamed("n_u", "_na")), "token_a")
        .join(
            F.broadcast(
                marg.withColumnRenamed("token", "token_b").withColumnRenamed(
                    "n_u", "_nb"
                )
            ),
            "token_b",
        )
        .crossJoin(F.broadcast(n))
        .withColumn(
            "ppmi",
            F.greatest(
                F.lit(0.0),
                F.log(F.col("n") * F.col("cooc_tf") / (F.col("_na") * F.col("_nb"))),
            ),
        )
        .select("token_a", "token_b", "cooc_tf", "cooc_df", "ppmi")
    )
    return out


def cooc_ppmi(docs: DataFrame, window: int = 5, **kw) -> DataFrame:
    # ppmi reads the cooc relation three times (marginals x2 + join);
    # materialize it once. Strategy chosen by measurement on the r4
    # testdata (sf0.1, min-of-3): with the lead-window pair plan,
    # localCheckpoint(eager) 1.28s < bare/ReusedExchange 1.50s <
    # tracked cache 1.86s — the in-memory columnar cache costs more
    # than the checkpoint's serialized blocks here, and checkpoint
    # blocks are reclaimed by the ContextCleaner once the returned
    # plan is unreferenced (no explicit release needed). r3's old-data
    # measurement favored cache; the regenerated heavier pair relation
    # flipped it. release_cooc_caches() remains for callers composing
    # cooc_gather with _tracked_cache directly.
    return ppmi(
        cooc_gather(docs, window=window, **kw).localCheckpoint(eager=True)
    )
