"""E-step kernel modes: ptdw emission/agents, transactions."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from bigartm_spark.model import estep
from bigartm_spark.model.init import initialize_phi
from bigartm_spark.model.regularizers import SmoothPtdw, TopicSegmentationPtdw
from bigartm_spark.operators.dictionary import gather_dictionary

TOPICS = ["t0", "t1", "t2"]


def _phi(docs):
    return initialize_phi(gather_dictionary(docs), TOPICS, seed=3)


def test_emit_ptdw_rows_normalized(spark, docs):
    sub = docs.filter(F.col("doc_id") < 100)
    out = estep.process_batches(
        sub,
        _phi(docs),
        num_document_passes=2,
        emit_nwt=False,
        emit_ptdw=True,
        compute_scores=False,
    )
    ptdw = estep.extract_ptdw(out, TOPICS)
    sums = (
        ptdw.groupBy("doc_id", "pos").agg(F.sum("value").alias("s")).collect()
    )
    assert len(sums) > 0
    for r in sums:
        assert abs(r["s"] - 1.0) < 1e-9


def test_ptdw_agents_run(spark, docs):
    sub = docs.filter(F.col("doc_id") < 100)
    out = estep.process_batches(
        sub,
        _phi(docs),
        num_document_passes=2,
        emit_nwt=False,
        emit_ptdw=True,
        compute_scores=False,
        ptdw_agents=[SmoothPtdw(tau=0.5, window=4), TopicSegmentationPtdw()],
    )
    ptdw = estep.extract_ptdw(out, TOPICS)
    sums = ptdw.groupBy("doc_id", "pos").agg(F.sum("value").alias("s")).collect()
    for r in sums:
        assert abs(r["s"] - 1.0) < 1e-9


def test_smooth_ptdw_numpy_semantics():
    ptdw = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0], [0.5, 0.5]])
    starts = np.array([0, 2])  # two docs: rows 0-1, rows 2-3
    seg = np.array([0, 0, 1, 1])
    out = SmoothPtdw(tau=1.0, window=2).apply_ptdw(ptdw, starts, seg)
    # doc0 row0 window = rows {0, 1} -> [0.5, 0.5]
    np.testing.assert_allclose(out[0], [0.5, 0.5])
    # doc1 row2 window = rows {2, 3} -> [0.75, 0.25] (no bleed from doc0)
    np.testing.assert_allclose(out[2], [0.75, 0.25])


def test_transaction_mode_vs_plain_on_singletons(spark, docs):
    """With singleton transactions the transaction E-step must equal the
    plain path (product over one token = that token's phi)."""
    sub = docs.filter(F.col("doc_id") < 200)
    phi = _phi(docs)
    plain = estep.process_batches(
        sub, phi, num_document_passes=1, emit_nwt=True, emit_theta=False,
        compute_scores=False,
    )
    plain_nwt = {
        (r["class_id"], r["token"]): r["values"]
        for r in estep.aggregate_nwt(plain, 3).collect()
    }
    # transaction path runs num_document_passes + 1 inner iterations
    # (reference off-by-one), so compare with 0 passes vs 1 pass... the
    # iteration counts must line up: plain p passes == tx (p-1)+1.
    tx = estep.process_batches(
        sub, phi, num_document_passes=0, emit_nwt=True, emit_theta=False,
        compute_scores=False, transaction_mode=True,
    )
    tx_nwt = {
        (r["class_id"], r["token"]): r["values"]
        for r in estep.aggregate_nwt(tx, 3).collect()
    }
    assert plain_nwt.keys() == tx_nwt.keys()
    for k in plain_nwt:
        np.testing.assert_allclose(plain_nwt[k], tx_nwt[k], rtol=1e-9)


def test_transaction_weights_drop_type(spark, docs):
    sub = docs.filter(F.col("doc_id") < 100)
    out = estep.process_batches(
        sub,
        _phi(docs),
        num_document_passes=1,
        emit_nwt=True,
        compute_scores=False,
        transaction_mode=True,
        transaction_weights={"@default_transaction": 0.0},
    )
    nwt = estep.aggregate_nwt(out, 3)
    tot = nwt.select(
        F.sum(F.aggregate("values", F.lit(0.0), lambda a, x: a + x))
    ).collect()[0][0]
    assert tot == 0.0


def test_transaction_perplexity_breakdown(spark, docs):
    """D7 rollup: per-transaction-type perplexity components + total."""
    sub = docs.filter(F.col("doc_id") < 200)
    out = estep.process_batches(
        sub,
        _phi(docs),
        num_document_passes=1,
        emit_nwt=False,
        compute_scores=True,
        transaction_mode=True,
    )
    scores = estep.extract_scores(out)
    assert "perplexity" in scores and scores["perplexity"] > 0
    assert "perplexity@@default_transaction" in scores
    # single-type corpus: the breakdown equals the total
    assert abs(
        scores["perplexity"] - scores["perplexity@@default_transaction"]
    ) < 1e-9


def test_should_broadcast_phi_thresholds():
    assert estep.should_broadcast_phi(10_000, 10)
    # 1e9-token vocab x 100 topics is ~1.6TB with overhead: never broadcast
    assert not estep.should_broadcast_phi(1_000_000_000, 100)
    assert not estep.should_broadcast_phi(100, 10, limit=10_000)


def test_auto_size_takes_join_path_without_driver_collect(
    spark, docs, monkeypatch
):
    """broadcast_phi=None on an over-threshold model must use the
    plan-level join and never materialize phi on the driver."""
    from pyspark.sql import DataFrame

    sub = docs.filter(F.col("doc_id") < 200)
    phi = _phi(docs)
    ref = estep.aggregate_nwt(
        estep.process_batches(
            sub, phi, num_document_passes=2, compute_scores=False,
            broadcast_phi=True,
        ),
        3,
    )
    ref_nwt = {
        (r["class_id"], r["token"]): r["values"] for r in ref.collect()
    }

    monkeypatch.setattr(estep, "should_broadcast_phi", lambda *a, **k: False)

    def boom(self):
        raise AssertionError("driver-side phi materialization on join path")

    monkeypatch.setattr(DataFrame, "toPandas", boom)
    out = estep.aggregate_nwt(
        estep.process_batches(
            sub, phi, num_document_passes=2, compute_scores=False,
            broadcast_phi=None,
        ),
        3,
    )
    got = {(r["class_id"], r["token"]): r["values"] for r in out.collect()}
    assert got.keys() == ref_nwt.keys()
    for k in got:
        np.testing.assert_allclose(got[k], ref_nwt[k], rtol=1e-9)


def test_choose_num_buckets_scales_with_corpus():
    # small corpus: exactly one kernel wave (r7: the nwt partial shuffle
    # carries buckets x vocab rows, so no over-partitioning floor)
    assert estep.choose_num_buckets(100_000, 10, 32) == 32
    # 100TB-ish: 2e12 occurrences x 100 topics -> bucket memory governs
    big = estep.choose_num_buckets(2_000_000_000_000, 100, 2000)
    assert big * estep.BUCKET_TARGET_BYTES >= 2_000_000_000_000 * 100 * 8 * 4
    assert big > 4000


def test_observation_scores_match_extract_scores(spark, docs):
    """The single-action Observation path and the cached
    extract_scores path produce the same per-pass scores (same kernel
    partials, different collection plumbing)."""
    from bigartm_spark.model.artm import ARTM

    def fit(cache_theta):
        m = ARTM(
            num_topics=3, num_document_passes=2, seed=7,
            cache_theta=cache_theta,
        )
        from bigartm_spark.operators.dictionary import gather_dictionary

        m.initialize(gather_dictionary(docs))
        m.fit_offline(docs, num_collection_passes=2)
        return m.score_tracker

    obs_path, cache_path = fit(False), fit(True)
    for key in ("perplexity", "items_processed", "sparsity_theta"):
        a, b = obs_path[key], cache_path[key]
        assert len(a) == len(b) == 2
        for x, y in zip(a, b):
            assert abs(x - y) <= 1e-9 * max(abs(x), 1.0), (key, a, b)


def test_prepared_corpus_path_equals_per_pass_path(spark, docs):
    """fit_offline(num_collection_passes=2) takes the prepare_corpus()
    fast path (one hoisted bucket shuffle, cached layout); two
    sequential 1-pass fits run the unprepared per-pass plan. Same
    schedule, same math — trajectories must agree to float noise."""
    from bigartm_spark.model.artm import ARTM
    from bigartm_spark.operators.dictionary import gather_dictionary

    d = gather_dictionary(docs)
    m_prep = ARTM(num_topics=4, num_document_passes=2, seed=11)
    m_prep.initialize(d)
    m_prep.fit_offline(docs, num_collection_passes=2)

    m_pp = ARTM(num_topics=4, num_document_passes=2, seed=11)
    m_pp.initialize(d)
    m_pp.fit_offline(docs, num_collection_passes=1)
    m_pp.fit_offline(docs, num_collection_passes=1)

    a = m_prep.score_tracker["perplexity"]
    b = m_pp.score_tracker["perplexity"]
    assert len(a) == len(b) == 2
    np.testing.assert_allclose(a, b, rtol=1e-9)


def test_prepared_corpus_bakes_in_class_weights_once(spark):
    """A multi-pass fit with class_weights must weight each pass ONCE
    (prepare_corpus bakes the weights in; process_batches must not
    re-apply them on the prepared relation)."""
    from bigartm_spark.corpus import docs_multimodal
    from bigartm_spark.model.artm import ARTM
    from bigartm_spark.operators.dictionary import gather_dictionary

    sf = "/root/testdata/sf0.001"
    docs = docs_multimodal(spark, sf).cache()
    d = gather_dictionary(docs)
    kw = {"num_topics": 3, "num_document_passes": 2, "seed": 5,
          "class_ids": {"@default_class": 1.0, "supp": 2.5}}
    m2 = ARTM(**kw)
    m2.initialize(d)
    m2.fit_offline(docs, num_collection_passes=2)
    m11 = ARTM(**kw)
    m11.initialize(d)
    m11.fit_offline(docs, num_collection_passes=1)
    m11.fit_offline(docs, num_collection_passes=1)
    np.testing.assert_allclose(
        m2.score_tracker["perplexity"],
        m11.score_tracker["perplexity"],
        rtol=1e-9,
    )
