"""End-to-end Phase-1 slice: docs -> dictionary -> init -> fit -> scores."""

from __future__ import annotations

import math

from bigartm_spark.model.artm import ARTM
from bigartm_spark.operators.dictionary import gather_dictionary


def test_fit_offline_perplexity_decreases(spark, docs):
    d = gather_dictionary(docs)
    model = ARTM(num_topics=5, num_document_passes=5, seed=42)
    model.initialize(d)
    model.fit_offline(docs, num_collection_passes=3)
    traj = model.score_tracker["perplexity"]
    assert len(traj) == 3
    assert all(math.isfinite(p) and p > 0 for p in traj)
    # EM on pwt must not increase perplexity (tolerate tiny float noise)
    assert traj[-1] <= traj[0] * 1.0001, traj


def test_phi_rows_normalized(spark, docs):
    from pyspark.sql import functions as F

    d = gather_dictionary(docs)
    model = ARTM(num_topics=4, num_document_passes=2, seed=1)
    model.initialize(d)
    model.fit_offline(docs, num_collection_passes=1)
    # columns of phi (per topic within class) sum to 1
    sums = (
        model.get_phi_long()
        .groupBy("class_id", "topic")
        .agg(F.sum("value").alias("s"))
        .collect()
    )
    for r in sums:
        assert abs(r["s"] - 1.0) < 1e-6


def test_transform_theta_normalized(spark, docs):
    from pyspark.sql import functions as F

    d = gather_dictionary(docs)
    model = ARTM(num_topics=4, num_document_passes=3, seed=7)
    model.initialize(d)
    model.fit_offline(docs, num_collection_passes=1)
    theta = model.transform(docs.limit(200))
    sums = theta.groupBy("doc_id").agg(F.sum("value").alias("s")).collect()
    assert len(sums) > 0
    for r in sums:
        assert abs(r["s"] - 1.0) < 1e-6


def test_lda_facade_and_retrieval_filters(spark, docs):
    from bigartm_spark.model.artm import LDA
    from bigartm_spark.operators.dictionary import gather_dictionary

    lda = LDA(num_topics=4, alpha=0.02, beta=0.02, num_document_passes=2, seed=9)
    lda.initialize(gather_dictionary(docs))
    lda.fit_offline(docs, num_collection_passes=2)
    ppl = lda.score_tracker["perplexity"]
    assert len(ppl) == 2 and ppl[1] <= ppl[0] * 1.0001
    # B6 retrieval filters
    sub = lda.get_phi_long(topic_names=["topic_0", "topic_2"], tokens=["p1", "p2"])
    rows = sub.collect()
    assert {r["topic"] for r in rows} <= {"topic_0", "topic_2"}
    assert {r["token"] for r in rows} <= {"p1", "p2"}
    sparse = lda.get_phi_long(eps=1e-3)
    assert sparse.filter(sparse.value <= 1e-3).count() == 0
