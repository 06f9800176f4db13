"""Physical-plan audits: the properties that make the operators scale
are asserted, not assumed — filter/projection pushdown into the parquet
scan, broadcast joins for bounded dimensions, distributed top-k instead
of global sorts, and shuffle counts on the dedup hot path.

(If Spark ever regresses one of these — an optimizer conf change, a
refactor that breaks pushdown — these tests fail before the bench does.)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _explain(df, mode: str = "simple") -> str:
    jqe = df._jdf.queryExecution()
    spark = df.sparkSession
    return spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        jqe, mode
    )


def test_parquet_filter_and_projection_pushdown(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    q = docs.filter(F.col("doc_id") < 10).select("doc_id")
    plan = _explain(q, "formatted")
    assert "LessThan(doc_id,10)" in plan  # filter reaches the scan
    assert "ReadSchema: struct<doc_id:bigint>" in plan  # pruned columns


def test_minhash_has_two_shuffles_only(spark):
    """explode -> k-min groupBy: exactly the deliberate spread
    repartition + ONE agg shuffle; the r1 distinct (a third, full shuffle
    of the exploded relation) must never come back."""
    from bigartm_spark.operators import dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _explain(dedup.minhash_signatures(docs))
    assert plan.count("Exchange") <= 2


def test_brute_force_topk_is_distributed_topk(spark):
    """orderBy+limit compiles to TakeOrderedAndProject (per-partition
    top-k, no global sort, no shuffle before the take)."""
    from bigartm_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = _explain(similarity.brute_force_topk(emb, 0, 5))
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange") == 0


def test_ivf_assign_has_no_shuffle(spark):
    """numpy assignment kernel: one mapInPandas pass, zero exchanges
    (the r1 crossJoin+window version shuffled per vector)."""
    from bigartm_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = similarity.seed_centroids(emb, 4)
    plan = _explain(similarity.ivf_assign(emb, cents))
    assert plan.count("Exchange") == 0
    assert "MapInPandas" in plan


def test_ppmi_marginals_are_broadcast(spark):
    """ppmi joins cooc against its marginals via broadcast — the big
    relation never shuffles for the join."""
    from bigartm_spark.operators.cooc import cooc_ppmi
    from bigartm_spark.corpus import docs_from_lineitem

    docs = docs_from_lineitem(spark, SF).limit(5000)
    plan = _explain(cooc_ppmi(docs, window=2))
    assert "BroadcastHashJoin" in plan


def test_estep_join_path_uses_plan_join(spark, docs):
    """broadcast_phi=False: the token->phi lookup is a plan-level join
    Catalyst can broadcast or shuffle; nothing driver-side."""
    from bigartm_spark.model import estep
    from bigartm_spark.model.init import initialize_phi
    from bigartm_spark.operators.dictionary import gather_dictionary

    phi = initialize_phi(gather_dictionary(docs), ["t0", "t1"], seed=0)
    out = estep.process_batches(
        docs, phi, num_document_passes=1, broadcast_phi=False,
        compute_scores=False,
    )
    plan = _explain(out)
    assert "FlatMapGroupsInPandas" in plan
    assert "Join" in plan  # the C1 join is in the plan, not a collect


def test_dedup_clusters_one_job_per_round(spark):
    """The CC fixpoint probe rides an Observation on the round's own
    materialization action — one Spark action per propagation round, not
    two (r2 VERDICT "What's wrong" #4). AQE is disabled for the
    measurement window so one action maps to a stable job count."""
    from bigartm_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(0, 1), (2, 3)], "doc_a long, doc_b long"
    )
    tracker = spark.sparkContext.statusTracker()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        before = set(tracker.getJobIdsForGroup(None) or [])
        dedup.dedup_clusters(pairs)
        after = set(tracker.getJobIdsForGroup(None) or [])
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    n_jobs = len(after - before)
    # two rounds to converge (round 1 relabels, round 2 observes zero
    # change); each round = 1 action -> 2 jobs (broadcast build + main).
    # The old separate probe-join design added its own action per round
    # (>= 6 jobs here) — this bound catches that regression.
    assert n_jobs <= 4, f"expected <=4 jobs (2 rounds x 1 action), got {n_jobs}"
