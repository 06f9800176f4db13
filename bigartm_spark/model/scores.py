"""I1-I11: the full score set (SURVEY.md §2.I).

Two kinds, mirroring score_calculator_interface.h:
- *cumulative* scores accumulate inside the E-step kernel and merge
  associatively (perplexity I1, sparsity-theta I3, items I4, theta
  snippet I6, class precision I9) — see model/estep.py;
- *final* scores are aggregations over the current Phi, computed here as
  plain DataFrame plans.

Extension point: a score is any callable (phi_long | theta | docs) ->
DataFrame/dict with an associative combiner — no enum registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bigartm_spark.model.phi import PhiMatrix

PHI_EPS = 1e-37  # retrieval/sparsity epsilon, messages.proto:610


def sparsity_phi(
    phi: PhiMatrix, eps: float = PHI_EPS, class_id: str | None = None
) -> DataFrame:
    """I2/D8: share of p_wt < eps (per class_id).
    Reference: score/sparsity_phi.cc:15-61."""
    long = phi.to_long()
    if class_id is not None:
        long = long.filter(F.col("class_id") == class_id)
    return long.groupBy("class_id").agg(
        F.avg(F.when(F.col("value") < eps, 1.0).otherwise(0.0)).alias(
            "sparsity"
        ),
        F.sum(F.when(F.col("value") < eps, 1).otherwise(0))
        .cast("long")
        .alias("zero_count"),
        F.count(F.lit(1)).alias("total_count"),
    )


def topic_mass_phi(nwt: PhiMatrix) -> DataFrame:
    """I8/D11: n_t per topic + ratio. score/topic_mass_phi.cc:1-80."""
    long = nwt.to_long()
    per_topic = long.groupBy("class_id", "topic").agg(
        F.sum(F.greatest(F.col("value"), F.lit(0.0))).alias("topic_mass")
    )
    w = Window.partitionBy("class_id")
    return per_topic.withColumn(
        "topic_ratio",
        F.when(
            F.sum("topic_mass").over(w) > 0,
            F.col("topic_mass") / F.sum("topic_mass").over(w),
        ).otherwise(F.lit(0.0)),
    )


def background_tokens_ratio(
    phi: PhiMatrix, delta_threshold: float = 0.5, direct_kl: bool = True
) -> DataFrame:
    """I11/D13: per-token KL divergence between p(t) and p(t|w); tokens
    with KL > delta_threshold are "background".
    Reference: score/background_tokens_ratio.cc:15-95 — p(t) from n_t
    normalized, p(t|w) the token-row posterior."""
    long = phi.to_long()
    wtok = Window.partitionBy("class_id", "token")
    wcls = Window.partitionBy("class_id")
    wtop = Window.partitionBy("class_id", "topic")
    # p(t|w) = value / row-sum; p(t) = topic-mass / class-mass
    enriched = (
        long.withColumn("_p_tw", F.col("value") / F.sum("value").over(wtok))
        .withColumn("_nt", F.sum("value").over(wtop))
        .withColumn("_p_t", F.col("_nt") / F.sum("value").over(wcls))
    )
    if direct_kl:  # KL(p(t) || p(t|w))
        term = F.when(
            (F.col("_p_t") > 0) & (F.col("_p_tw") > 0),
            F.col("_p_t") * F.log(F.col("_p_t") / F.col("_p_tw")),
        ).otherwise(F.lit(0.0))
    else:  # KL(p(t|w) || p(t))
        term = F.when(
            (F.col("_p_t") > 0) & (F.col("_p_tw") > 0),
            F.col("_p_tw") * F.log(F.col("_p_tw") / F.col("_p_t")),
        ).otherwise(F.lit(0.0))
    kl = enriched.groupBy("class_id", "token").agg(F.sum(term).alias("kl"))
    return kl.withColumn(
        "is_background", (F.col("kl") > delta_threshold).cast("boolean")
    )


def topic_kernel(
    phi: PhiMatrix, threshold: float = 0.1, cooc: DataFrame | None = None
) -> DataFrame:
    """I7/E2: kernel W_t = {w : p(t|w) > threshold}; purity = sum of p_wt
    over the kernel, contrast = avg p(t|w), size.
    Reference: score/topic_kernel.cc:19-174."""
    long = phi.to_long()
    wtok = Window.partitionBy("class_id", "token")
    ptw = long.withColumn(
        "_p_tw", F.col("value") / F.sum("value").over(wtok)
    )
    kernel = ptw.filter(F.col("_p_tw") > threshold)
    out = kernel.groupBy("class_id", "topic").agg(
        F.count(F.lit(1)).alias("kernel_size"),
        F.sum("value").alias("purity"),
        F.avg("_p_tw").alias("contrast"),
    )
    if cooc is not None:
        from bigartm_spark.operators.topk import top_tokens_coherence

        pairs = kernel.select("topic", "token")
        a = pairs.withColumnRenamed("token", "token_a")
        b = pairs.withColumnRenamed("token", "token_b")
        joined = (
            a.join(b, "topic")
            .filter(F.col("token_a") < F.col("token_b"))
            .join(cooc, ["token_a", "token_b"], "left")
        )
        coh = joined.groupBy("topic").agg(
            F.avg(F.coalesce(F.col("value"), F.lit(0.0))).alias(
                "kernel_coherence"
            )
        )
        out = out.join(coh, "topic", "left")
    return out


def theta_snippet(theta: DataFrame, num_items: int = 10) -> DataFrame:
    """I6/E3: theta rows of the first num_items docs (by doc_id)."""
    first_docs = (
        theta.select("doc_id").distinct().orderBy("doc_id").limit(num_items)
    )
    return theta.join(F.broadcast(first_docs), "doc_id")


def class_precision(
    predictions: DataFrame, truth: DataFrame, label_col: str = "label"
) -> DataFrame:
    """I9/D12: accuracy of predict_class_id argmax vs true labels.
    predictions(doc_id, predicted), truth(doc_id, label)."""
    joined = predictions.join(truth, "doc_id")
    return joined.agg(
        F.avg(
            F.when(F.col("predicted") == F.col(label_col), 1.0).otherwise(0.0)
        ).alias("precision"),
        F.count(F.lit(1)).alias("n_items"),
    )


def doc_perplexity(docs: DataFrame, phi: PhiMatrix) -> DataFrame:
    """Per-document perplexity under uniform theta — the model-based
    document quality score (D7's corpus perplexity disaggregated to one
    row per doc; perplexity_score.cc computes the same sum before the
    global rollup). High-ppl docs are the corpus outliers a training
    pipeline drops or routes for review.

    Returns (doc_id, token_weight, doc_ppl).

    Scale: phi collapses to one p_w row per token (|vocab|, broadcast-
    sized after the topic sum); the docs join then aggregates per doc —
    map-side partial agg, no state beyond the doc.
    """
    pw = (
        phi.to_long()
        .groupBy("class_id", "token")
        .agg(
            # sum of value/T (not sum/T): the exact add-chain the oracle
            # replays, so doubles match bit-for-bit before rounding
            F.sum(F.col("value") / F.lit(float(phi.num_topics))).alias("_pwd")
        )
    )
    j = docs.join(pw, ["class_id", "token"])
    log_ppl = -F.sum(F.col("weight") * F.log(F.col("_pwd"))) / F.sum("weight")
    # doc_log_ppl rides along for oracle comparison: exp() amplifies
    # summation-order double noise ~1e4x, so a 6-decimal rounding of
    # doc_ppl can flip between engines on borderline values (observed
    # once in 147k docs at sf0.1); the log-space value is O(10) with
    # O(1e-12) noise and rounds stably
    return j.groupBy("doc_id").agg(
        F.sum("weight").alias("token_weight"),
        F.exp(log_ppl).alias("doc_ppl"),
        log_ppl.alias("doc_log_ppl"),
    )


def peak_memory_mb(spark) -> float:
    """I10: semantic substitute — peak executor/driver JVM memory from the
    Spark metrics API (reference reads process RSS,
    score/peak_memory.cc:27-57)."""
    try:
        status = spark.sparkContext.statusTracker()
        _ = status  # local mode: report driver JVM heap used
        rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
        return float(rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
    except Exception:
        return -1.0
