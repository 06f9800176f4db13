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


def cooc_gather(
    docs: DataFrame,
    window: int = 5,
    min_tf: float | None = None,
    min_df: float | None = None,
    symmetric: bool = True,
) -> DataFrame:
    """cooc(token_a, token_b, cooc_tf, cooc_df) — pairs of tokens whose
    positions within a doc are at most ``window`` apart. token_a < token_b
    canonicalizes symmetric pairs."""
    a = docs.select("doc_id", F.col("token").alias("token_a"), F.col("pos").alias("_pa"))
    b = docs.select("doc_id", F.col("token").alias("token_b"), F.col("pos").alias("_pb"))
    pairs = a.join(b, "doc_id").filter(
        (F.abs(F.col("_pa") - F.col("_pb")) <= window)
        & (F.col("token_a") < F.col("token_b"))
    )
    out = pairs.groupBy("token_a", "token_b").agg(
        F.count(F.lit(1)).cast("double").alias("cooc_tf"),
        F.countDistinct("doc_id").cast("double").alias("cooc_df"),
    )
    if min_tf is not None:
        out = out.filter(F.col("cooc_tf") >= min_tf)
    if min_df is not None:
        out = out.filter(F.col("cooc_df") >= min_df)
    return out


def ppmi(cooc: DataFrame) -> DataFrame:
    """PPMI = max(0, ln(n * n_uv / (n_u * n_v))) with n_u = token pair-mass
    marginals, n = total pair mass (both directions)."""
    marg = (
        cooc.select(F.col("token_a").alias("token"), "cooc_tf")
        .unionAll(cooc.select(F.col("token_b").alias("token"), "cooc_tf"))
        .groupBy("token")
        .agg(F.sum("cooc_tf").alias("n_u"))
    )
    n = cooc.agg((F.sum("cooc_tf") * 2).alias("n"))
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
    return ppmi(cooc_gather(docs, window=window, **kw))
