"""Top-k / ranking operators (SURVEY.md §2.E).

- top_tokens (E1/I5): top-k tokens per topic by p_wt, optional coherence.
  /root/reference/src/artm/score/top_tokens.cc:18-121
- specified_sparse (E4/H5): keep the largest entries per token row (or per
  topic column) subject to a count and optional cumulative-probability
  threshold; zero the rest.
  /root/reference/src/artm/regularizer/specified_sparse_phi.cc:23-156
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_tokens(
    phi_long: DataFrame, k: int = 10, cooc: DataFrame | None = None
) -> DataFrame:
    """E1: (topic, token, value, rank). Deterministic tiebreak on token."""
    w = Window.partitionBy("class_id", "topic").orderBy(
        F.desc("value"), F.asc("token")
    )
    out = (
        phi_long.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("topic", "token", "value", "rank")
    )
    return out


def top_tokens_coherence(top: DataFrame, cooc: DataFrame, k: int) -> DataFrame:
    """E1 coherence: C_t = 2/(k(k-1)) * sum_{i<j} cooc(w_i, w_j) over the
    top-k token pairs of each topic (scores_descr.txt:55-70)."""
    a = top.select("topic", F.col("token").alias("token_a"))
    b = top.select("topic", F.col("token").alias("token_b"))
    pairs = a.join(b, "topic").filter(F.col("token_a") < F.col("token_b"))
    joined = pairs.join(cooc, ["token_a", "token_b"], "left")
    return joined.groupBy("topic").agg(
        (F.sum(F.coalesce(F.col("value"), F.lit(0.0))) * 2.0 / (k * (k - 1))).alias(
            "coherence"
        )
    )


def specified_sparse(
    phi_long: DataFrame,
    topics: list[str],
    max_elements: int = 2,
    probability_threshold: float | None = None,
    by_column: bool = False,
) -> DataFrame:
    """E4: per row (token) — or per column (topic) — keep the
    ``max_elements`` largest entries; if probability_threshold is given,
    also stop once the kept cumulative share reaches it. Returns kept
    entries (the zeroed complement is implicit in COO form)."""
    if by_column:
        part = ["class_id", "topic"]
        tiebreak = F.asc("token")
    else:
        part = ["class_id", "token"]
        tiebreak = F.asc("topic")
    w = Window.partitionBy(*part).orderBy(F.desc("value"), tiebreak)
    ranked = phi_long.withColumn("_rn", F.row_number().over(w))
    cond = F.col("_rn") <= max_elements
    if probability_threshold is not None:
        wsum = Window.partitionBy(*part)
        wcum = w.rowsBetween(Window.unboundedPreceding, -1)
        cum_before = F.coalesce(F.sum("value").over(wcum), F.lit(0.0))
        total = F.sum("value").over(wsum)
        cond = cond & (cum_before < probability_threshold * total)
    return ranked.filter(cond).drop("_rn")
