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
    top-k, no global sort); the only exchange is the 1-row query-vector
    broadcast (r8: the scoring join replaced the driver collect so the
    whole query is one action), never a shuffle."""
    from bigartm_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = _explain(similarity.brute_force_topk(emb, 0, 5))
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange") == plan.count("BroadcastExchange")
    assert "MapInPandas" not in plan  # scoring is JVM codegen now


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


def test_hash_split_is_shuffle_free_scan(spark):
    """hash_split + split filter: one codegen'd scan — no Exchange, and
    the coin predicate lands in the scan's DataFilters. Splitting 100 TB
    must cost one pass, nothing else."""
    from bigartm_spark.operators import sampling

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source"
    )
    q = sampling.hash_split(docs).filter(F.col("split") == "train")
    plan = _explain(q)
    assert plan.count("Exchange") == 0
    assert "FileScan" in plan


def test_stratified_sample_is_shuffle_free(spark):
    from bigartm_spark.operators import sampling

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _explain(sampling.stratified_sample(docs, 0.25))
    assert plan.count("Exchange") == 0


def test_mixture_resample_corpus_side_never_shuffles(spark):
    """domain_mixture_resample: the corpus joins the K-row rates via
    BroadcastHashJoin with the stratum IN-list pushed into the parquet
    scan; every Exchange in the plan belongs to the tiny rates subtree
    (K-row count agg + single-partition window), never the corpus."""
    from bigartm_spark.operators import sampling

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source"
    )
    out = sampling.domain_mixture_resample(
        docs, {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    )
    plan = _explain(out)
    assert "BroadcastHashJoin" in plan
    assert "In(source, [src0,src1,src2])" in plan  # pushed to the scan
    # corpus side: scan -> broadcast join, no exchange above it; the
    # rates subtree owns <= 2 exchanges (partial-count agg + the 1-row
    # window) + broadcast exchanges
    non_broadcast = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert non_broadcast <= 2


def test_semantic_dedup_blocks_by_cell(spark):
    """semantic_dedup pairs are generated inside groupBy(cell_id)
    (sum(|cell|^2) compute behind ONE payload exchange — r8's blocked
    scorer), the scorer is the Arrow-batched kernel, and there is no
    pair self-join, no second scan of the vectors, and no join-back of
    the payload by vec_id."""
    from bigartm_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = similarity.seed_centroids(emb, 4)
    plan = _explain(similarity.semantic_dedup(emb, cents, threshold=0.5))
    assert "MapInPandas" in plan  # ivf_assign kernel
    assert "FlatMapGroupsInPandas" in plan  # blocked pair scorer
    assert "cell_id" in plan  # the grouping key, not a cross join
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # two scans of the embeddings (assigned feeds both the drops branch
    # and the survivors left side; the old join-back shape had 5), and
    # no shuffle join anywhere below the drops branch — the only join
    # left in the whole plan is the survivors anti-join
    assert plan.count("Scan parquet") == 2


def test_near_dup_lsh_is_joinless(spark):
    """near_dup_pairs_lsh: one groupBy(bucket) exchange of the vectors,
    pairs never exist as join rows (r8 blocked scorer)."""
    from bigartm_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = _explain(similarity.near_dup_pairs_lsh(emb, threshold=0.5))
    assert "FlatMapGroupsInPandas" in plan
    for join in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                 "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert join not in plan, join
    assert plan.count("Exchange") == 1


def test_bucketed_corpus_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed on doc_id with equal bucket counts join with
    ZERO Exchange (broadcast disabled to prove the co-location, not the
    small-table escape hatch) — the repeated-join store for 100 TB."""
    from bigartm_spark.sources.io import load_bucketed, save_bucketed

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    meta = docs.select("doc_id", "source")
    txt = docs.select("doc_id", "n_chars")
    save_bucketed(meta, "t_meta_b", num_buckets=8, path=str(tmp_path / "m"))
    save_bucketed(txt, "t_txt_b", num_buckets=8, path=str(tmp_path / "t"))
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = load_bucketed(spark, "t_meta_b").join(
            load_bucketed(spark, "t_txt_b"), "doc_id"
        )
        plan = _explain(j)
        assert plan.count("Exchange") == 0, plan
        assert j.count() == docs.count()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS t_meta_b")
        spark.sql("DROP TABLE IF EXISTS t_txt_b")


def test_bucketed_estep_join_no_shuffle(spark, tmp_path):
    """The shuffle-regime E-step join (docs ⋈ phi on (class_id, token),
    used when phi exceeds the broadcast budget) goes shuffle-free when
    corpus and model are stored bucketed on those keys — the composite
    key variant of the co-located store. This is the cluster deployment
    documented in SCALE.md: pre-bucket once, every EM pass reads
    co-partitioned buckets with ZERO Exchange."""
    from bigartm_spark.corpus import docs_from_lineitem
    from bigartm_spark.model.init import initialize_phi
    from bigartm_spark.operators.dictionary import gather_dictionary
    from bigartm_spark.sources.io import load_bucketed, save_bucketed

    docs = docs_from_lineitem(spark, SF).limit(20000)
    phi = initialize_phi(gather_dictionary(docs), ["t0", "t1"], seed=1)
    save_bucketed(
        docs,
        "t_corpus_b",
        bucket_col=["class_id", "token"],
        num_buckets=8,
        path=str(tmp_path / "c"),
    )
    save_bucketed(
        phi.compact,
        "t_phi_b",
        bucket_col=["class_id", "token"],
        num_buckets=8,
        path=str(tmp_path / "p"),
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = load_bucketed(spark, "t_corpus_b").join(
            load_bucketed(spark, "t_phi_b"), ["class_id", "token"]
        )
        plan = _explain(j)
        assert plan.count("Exchange") == 0, plan
        assert j.count() > 0
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS t_corpus_b")
        spark.sql("DROP TABLE IF EXISTS t_phi_b")


def test_corpus_stats_plan(spark):
    """corpus_stats: scan pruned to (text, group), ONE corpus-wide
    exchange (the groupBy); the token-share window runs over the K-row
    aggregate, never the corpus."""
    from bigartm_spark.operators.sampling import corpus_stats

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _explain(corpus_stats(docs))
    # column pruning reaches the parquet scan
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "text" in read and "source" in read
    assert "n_chars" not in read and "lang" not in read
    # exactly 2 exchanges: corpus groupBy + the K-row window's single
    # partition (bounded by the number of groups)
    assert plan.count("Exchange") <= 2, plan
    # the window sits ABOVE the aggregate in the plan (operates on its
    # output), not over the scan
    agg_pos = plan.find("HashAggregate")
    win_pos = plan.find("Window")
    assert win_pos != -1 and agg_pos != -1 and win_pos < agg_pos


def test_small_input_fast_path_plans(spark):
    """Estimate-gated small-input path (session.coalesce_if_small):
    tiny exact_dedup compiles to a NO-exchange single-stage plan; a
    big-estimate input keeps the parallel one-shuffle plan. The gate is
    plan statistics — asserting here that it never runs a job."""
    import re

    from bigartm_spark.operators.dedup import exact_dedup
    from bigartm_spark.session import coalesce_if_small, estimated_plan_bytes

    import tempfile

    src = tempfile.mkdtemp() + "/docs"
    spark.createDataFrame(
        [(i, f"text {i % 3}") for i in range(50)], "doc_id long, text string"
    ).write.parquet(src)
    docs = spark.read.parquet(src)  # scan stats = file sizes, no job
    sz = estimated_plan_bytes(docs)
    assert sz is not None and 0 < sz < 1 << 20
    # a driver-local relation has NO stats -> gate must say "assume big"
    local = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    assert estimated_plan_bytes(local) is None
    assert coalesce_if_small(local) is local
    before = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    plan = exact_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    after = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    assert len(after) == len(before), "size gate must not run a job"
    assert not re.search(r"Exchange (hash|range|SinglePartition)", plan), plan
    # big estimate (forced low threshold) -> untouched plan
    big = coalesce_if_small(docs, target=1, max_bytes=1)
    assert big is docs
