"""Physical-plan regression tests: the properties that make the engine
scale are pinned here so a refactor can't silently lose them."""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_corpus_scan_prunes_columns(spark, sf_dir):
    from bigartm_spark.corpus import docs_from_lineitem

    docs = docs_from_lineitem(spark, sf_dir).select("doc_id", "token", "weight")
    plan = _plan(docs)
    # only the three source columns should reach the parquet scan
    assert "l_orderkey" in plan and "l_partkey" in plan and "l_quantity" in plan
    assert "l_extendedprice" not in plan and "l_shipdate" not in plan


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.filter(F.col("l_orderkey") == 7).select("l_partkey")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,7)]" in plan


def test_estep_aggregate_is_partial_final(spark, docs):
    from bigartm_spark.model import estep
    from bigartm_spark.model.init import initialize_phi
    from bigartm_spark.operators.dictionary import gather_dictionary

    phi = initialize_phi(gather_dictionary(docs), ["t0", "t1"], seed=0)
    out = estep.process_batches(docs, phi, num_document_passes=1)
    nwt = estep.aggregate_nwt(out, 2)
    plan = _plan(nwt)
    assert "partial_sum" in plan  # map-side combine before the shuffle
    # exactly one exchange between kernel output and final aggregate
    post_kernel = plan.split("FlatMapGroupsInPandas")[0]
    assert post_kernel.count("Exchange") == 1


def test_estep_join_path_uses_broadcast_hash_join(spark, docs):
    from bigartm_spark.model import estep
    from bigartm_spark.model.init import initialize_phi
    from bigartm_spark.operators.dictionary import gather_dictionary

    phi = initialize_phi(gather_dictionary(docs), ["t0", "t1"], seed=0)
    # force the plan-level join path (the big-model fallback)
    out = estep.process_batches(
        docs, phi, num_document_passes=1, broadcast_phi=False
    )
    plan = _plan(estep.aggregate_nwt(out, 2))
    assert "FlatMapGroupsInPandas" in plan


def test_dictionary_small_dim_joins_broadcast(spark, docs):
    from bigartm_spark.operators.dictionary import gather_dictionary

    d = gather_dictionary(docs)
    plan = _plan(d)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_cooc_is_equi_join_no_cartesian(spark, docs):
    from bigartm_spark.operators.cooc import cooc_gather

    plan = _plan(cooc_gather(docs, window=2))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # default (dense pos) plan: pairs from a lead() window — ONE shuffle,
    # no join operator at all
    assert "Join" not in _plan(cooc_gather(docs, window=2, dense_pos=True))


def test_cooc_dense_and_sparse_pos_paths_agree(spark, docs):
    """The lead-window pair plan (dense_pos=True, default) and the
    offset-explode equi-join (dense_pos=False, gap-tolerant) are exactly
    the same relation on row_number-positioned corpora."""
    from bigartm_spark.operators.cooc import cooc_gather

    a = cooc_gather(docs, window=3, dense_pos=True)
    b = cooc_gather(docs, window=3, dense_pos=False)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_wide_topic_count_arrays(spark, docs):
    """T=64: array-wide aggregates still plan and execute."""
    from bigartm_spark.model import estep
    from bigartm_spark.model.init import initialize_phi
    from bigartm_spark.operators.dictionary import gather_dictionary

    topics = [f"t{i}" for i in range(64)]
    phi = initialize_phi(gather_dictionary(docs), topics, seed=0)
    out = estep.process_batches(
        docs.limit(2000), phi, num_document_passes=1, compute_scores=False
    )
    nwt = estep.aggregate_nwt(out, 64)
    row = nwt.limit(1).collect()
    assert len(row[0]["values"]) == 64
