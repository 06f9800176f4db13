"""Lifecycle (G6/G8/G10/G13/G15), hARTM, streaming trainer, multimodal."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from bigartm_spark.model.artm import ARTM
from bigartm_spark.operators.dictionary import gather_dictionary

TOPICS3 = ["t0", "t1", "t2"]


def _fitted(spark, docs, passes=1):
    m = ARTM(topic_names=list(TOPICS3), num_document_passes=2, seed=11)
    m.initialize(gather_dictionary(docs))
    m.fit_offline(docs, passes)
    return m


def test_fit_online_decay_merge(spark, docs):
    from bigartm_spark.streaming.online import split_batch_groups

    m = ARTM(topic_names=list(TOPICS3), num_document_passes=2, seed=1)
    m.initialize(gather_dictionary(docs))
    groups = split_batch_groups(docs, update_every=16)
    assert len(groups) >= 2
    m.fit_online(groups[:3], tau0=64, kappa=0.7)
    assert len(m.score_tracker["perplexity"]) == 3
    assert all(np.isfinite(p) for p in m.score_tracker["perplexity"])
    # nwt lineage is BOUNDED across online passes: the merged n_wt is
    # lazily localCheckpointed (materialized by each pass's own action),
    # so pass k never re-runs pass k-1's E-step kernel. The analyzed
    # plan of the final nwt must be a checkpoint scan, not a chain of
    # python-kernel merges.
    nwt_plan = m.nwt.compact._jdf.queryExecution().analyzed().toString()
    assert "FlatMapGroupsInPandas" not in nwt_plan
    assert "ExistingRDD" in nwt_plan or "LogicalRDD" in nwt_plan


def test_online_trainer_stateful(spark, docs):
    from bigartm_spark.streaming.online import OnlineTrainer, split_batch_groups

    m = ARTM(topic_names=list(TOPICS3), num_document_passes=2, seed=1)
    m.initialize(gather_dictionary(docs))
    trainer = OnlineTrainer(m, tau0=64)
    for g in split_batch_groups(docs, update_every=32)[:2]:
        trainer.process_group(g)
    assert trainer.t == 2
    assert len(m.score_tracker["perplexity"]) == 2


def test_reshape_topics(spark, docs):
    m = _fitted(spark, docs)
    m.reshape_topics(["t2", "t0", "t_new"])
    phi = m.get_phi_long()
    assert set(r["topic"] for r in phi.select("topic").distinct().collect()) == {
        "t2",
        "t0",
        "t_new",
    }
    assert (
        phi.filter((F.col("topic") == "t_new") & (F.col("value") != 0.0)).count()
        == 0
    )


def test_overwrite_and_duplicate(spark, docs):
    m = _fitted(spark, docs)
    clone = m.duplicate()
    zero = m.get_phi_long().withColumn("value", F.lit(0.5))
    m.overwrite_topic_model(zero)
    assert m.get_phi_long().filter(F.col("value") != 0.5).count() == 0
    # the duplicate kept the original values
    assert clone.get_phi_long().filter(F.col("value") != 0.5).count() > 0


def test_rekey_tokens(spark, docs):
    from bigartm_spark.operators.dictionary import top_k_by_df

    m = _fitted(spark, docs)
    small = top_k_by_df(gather_dictionary(docs), 20)
    m.rekey_tokens(small)
    assert m.pwt.compact.count() == 20


def test_info(spark, docs):
    m = _fitted(spark, docs)
    info = m.info()
    assert info["num_topics"] == 3
    assert info["phi_rows"] > 0
    assert "perplexity" in info["score_tracker_keys"]


def test_hartm_two_levels(spark, docs):
    from bigartm_spark.model.hierarchy import HARTM

    d = gather_dictionary(docs)
    h = HARTM()
    h.add_level(docs, d, num_topics=3, num_collection_passes=1, seed=2,
                num_document_passes=2)
    h.add_level(docs, d, num_topics=5, num_collection_passes=1, seed=3,
                num_document_passes=2, parent_level_weight=2.0)
    psi = h.psi()
    rows = psi.collect()
    # Psi: one distribution over 5 child topics per 3 parent topics
    assert len(rows) == 15
    sums = {}
    for r in rows:
        sums[r["parent_topic"]] = sums.get(r["parent_topic"], 0.0) + r["value"]
    for v in sums.values():
        assert abs(v - 1.0) < 1e-6


def test_multimodal_features(spark, sf_dir):
    from bigartm_spark.operators.multimodal import (
        docs_as_media,
        extract_features,
        frame_sample_plan,
    )

    documents = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = docs_as_media(documents.limit(50))
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows:
        assert len(r["feature"]) == 8
        assert r["n_bytes"] > 0
        assert len(r["content_sha256"]) == 64
    # determinism
    again = {r["asset_id"]: list(r["feature"]) for r in extract_features(media).collect()}
    for r in rows:
        assert list(r["feature"]) == again[r["asset_id"]]
    # frame plan: images expand to a single ts
    plan = frame_sample_plan(media)
    assert plan.count() == 50


def test_predict_class_id(spark, sf_dir):
    from bigartm_spark.corpus import docs_multimodal
    from bigartm_spark.model.scores import class_precision

    mm = docs_multimodal(spark, sf_dir)
    m = ARTM(
        topic_names=list(TOPICS3),
        num_document_passes=2,
        seed=4,
        class_weights={"@default_class": 1.0, "supp": 1.0},
    )
    m.initialize(gather_dictionary(mm))
    m.fit_offline(mm, 1)
    preds = m.predict_class_id(mm.filter(F.col("doc_id") < 200), "supp")
    assert preds.count() > 0
    assert all(r["predicted"].startswith("s") for r in preds.collect())
    truth = (
        mm.filter((F.col("class_id") == "supp") & (F.col("doc_id") < 200))
        .groupBy("doc_id")
        .agg(F.min("token").alias("label"))
    )
    prec = class_precision(preds, truth).collect()[0]
    assert 0.0 <= prec["precision"] <= 1.0


def test_reuse_theta_converges_further(spark, docs):
    """C5: carrying theta across passes must not crash and should give a
    perplexity <= the fresh-theta run at the same pass count (more
    effective inner iterations)."""
    from bigartm_spark.operators.dictionary import gather_dictionary

    d = gather_dictionary(docs)

    def run(reuse):
        m = ARTM(
            topic_names=list(TOPICS3),
            num_document_passes=2,
            seed=5,
            reuse_theta=reuse,
        )
        m.initialize(d)
        m.fit_offline(docs, 3)
        return m.score_tracker["perplexity"]

    fresh, reused = run(False), run(True)
    assert len(reused) == 3
    assert reused[-1] <= fresh[-1] * 1.001, (fresh, reused)


def test_fit_online_async_pipeline(spark, docs):
    """G7: async online fit (stale-phi overlap) completes and tracks
    scores for every group."""
    from bigartm_spark.streaming.online import split_batch_groups

    m = ARTM(topic_names=list(TOPICS3), num_document_passes=2, seed=3)
    m.initialize(gather_dictionary(docs))
    groups = split_batch_groups(docs, update_every=16)[:3]
    m.fit_online_async(groups, tau0=64)
    ppl = m.score_tracker["perplexity"]
    assert len(ppl) == 3
    assert all(np.isfinite(p) and p > 0 for p in ppl)
    # phi still a valid distribution per topic
    sums = (
        m.get_phi_long().groupBy("topic").agg(F.sum("value").alias("s")).collect()
    )
    for r in sums:
        assert abs(r["s"] - 1.0) < 1e-6


def test_fit_online_async_deterministic(spark, docs):
    """G7 regression: phi is captured at submit time, so the async run is
    the reference's deterministic deferred scheme — two runs produce
    bit-identical score trajectories (no race on self.pwt)."""
    from bigartm_spark.streaming.online import split_batch_groups

    def run():
        m = ARTM(topic_names=list(TOPICS3), num_document_passes=2, seed=3)
        m.initialize(gather_dictionary(docs))
        groups = split_batch_groups(docs, update_every=16)[:3]
        m.fit_online_async(groups, tau0=64)
        return m.score_tracker["perplexity"]

    assert run() == run()


def test_gather_dictionary_vocab_order(spark, tmp_path):
    from bigartm_spark.sources.uci import read_uci
    from bigartm_spark.operators.dictionary import gather_dictionary
    from bigartm_spark.sources.uci import read_vocab

    docword = tmp_path / "dw.txt"
    vocab = tmp_path / "v.txt"
    docword.write_text("2\n3\n4\n1 3 2\n1 1 5\n2 2 1\n2 1 4\n")
    vocab.write_text("zed\nalpha\nmid\n")
    docs = read_uci(spark, str(docword), str(vocab))
    v = read_vocab(spark, str(vocab))
    d = gather_dictionary(docs, vocab=v)
    ordered = [r["token"] for r in d.orderBy("vocab_order").collect()]
    assert ordered == ["zed", "alpha", "mid"]  # vocab-file order, not hash


def test_theta_disk_cache(spark, docs, tmp_path):
    """§2.K theta disk cache: theta persisted as a parquet state table."""
    import os

    path = str(tmp_path / "theta_state")
    m = ARTM(
        topic_names=list(TOPICS3),
        num_document_passes=2,
        seed=6,
        theta_cache_path=path,
    )
    m.initialize(gather_dictionary(docs))
    m.fit_offline(docs, 1)
    assert os.path.isdir(path)
    theta = m.get_theta_long()
    sums = theta.groupBy("doc_id").agg(F.sum("value").alias("s")).limit(20).collect()
    for r in sums:
        assert abs(r["s"] - 1.0) < 1e-9


def test_fit_with_cooc_regularizer_integration(spark, docs):
    """ImproveCoherencePhi wired through a real fit (cooc from D14)."""
    from bigartm_spark.model.regularizers import ImproveCoherencePhi
    from bigartm_spark.operators.cooc import cooc_gather

    cooc = (
        cooc_gather(docs, window=2, min_tf=5)
        .withColumnRenamed("cooc_tf", "value")
        .select("token_a", "token_b", "value")
        .cache()
    )
    m = ARTM(
        topic_names=list(TOPICS3),
        num_document_passes=2,
        seed=8,
        phi_regularizers=[ImproveCoherencePhi(tau=1e-4, cooc=cooc)],
    )
    m.initialize(gather_dictionary(docs))
    m.fit_offline(docs, 2)
    ppl = m.score_tracker["perplexity"]
    assert len(ppl) == 2 and all(p > 0 for p in ppl)
    sums = m.get_phi_long().groupBy("topic").agg(F.sum("value").alias("s")).collect()
    for r in sums:
        assert abs(r["s"] - 1.0) < 1e-6


def test_theta_retrieval_filters(spark, docs):
    """get_theta(topic_names, eps) + transform_sparse (artm_model.py:
    875-962, 1040-1058): topic selection and the eps-sparse COO layout."""
    from pyspark.sql import functions as F

    from bigartm_spark.model.artm import ARTM
    from bigartm_spark.operators.dictionary import gather_dictionary

    m = ARTM(num_topics=3, num_document_passes=2, seed=6, cache_theta=True)
    m.initialize(gather_dictionary(docs))
    m.fit_offline(docs, num_collection_passes=1)

    full = m.get_theta_long()
    one = m.get_theta_long(topic_names=["topic_0"])
    assert one.select("topic").distinct().collect()[0].topic == "topic_0"
    assert one.count() * 3 == full.count()

    eps = 0.30
    sparse = m.get_theta_long(eps=eps)
    assert sparse.count() == full.filter(F.col("value") > eps).count()
    assert sparse.agg(F.min("value")).collect()[0][0] > eps

    ts = m.transform_sparse(docs.limit(100), eps=eps)
    assert ts.agg(F.min("value")).collect()[0][0] > eps


def test_save_load_matrix_and_score_api(spark, docs, tmp_path):
    """ARTM.save/load single-matrix round trip + clone/remove_theta/
    get_score aliases (artm_model.py:682-975)."""
    from bigartm_spark.model.artm import ARTM
    from bigartm_spark.operators.dictionary import gather_dictionary

    m = ARTM(num_topics=3, num_document_passes=2, seed=13, cache_theta=True)
    m.initialize(gather_dictionary(docs))
    m.fit_offline(docs, num_collection_passes=1)

    assert m.get_score("perplexity") == m.score_tracker["perplexity"][-1]

    p = str(tmp_path / "pwt_export")
    m.save(p)
    other = ARTM(num_topics=3, seed=0)
    other.load(p)
    assert other.topics == m.topics
    assert other.score_tracker == {}
    a = {(r.token, r.topic): r.value for r in m.get_phi_long().collect()}
    b = {(r.token, r.topic): r.value for r in other.get_phi_long().collect()}
    assert a.keys() == b.keys()
    assert all(abs(a[k] - b[k]) < 1e-12 for k in a)

    c = m.clone()
    assert c.get_score("perplexity") == m.get_score("perplexity")
    m.remove_theta()
    assert m.theta is None
    assert isinstance(m.library_version, str)


def test_set_parent_model_psi(spark, docs):
    """ARTM.set_parent_model/get_parent_psi (artm_model.py:1259-1286):
    the child level fits on corpus + parent pseudo-batch and psi rows
    are per-parent-topic distributions over child topics."""
    from pyspark.sql import functions as F

    from bigartm_spark.model.artm import ARTM
    from bigartm_spark.operators.dictionary import gather_dictionary

    d = gather_dictionary(docs)
    parent = ARTM(num_topics=3, num_document_passes=2, seed=21)
    parent.initialize(d)
    parent.fit_offline(docs, num_collection_passes=1)

    child = ARTM(num_topics=5, num_document_passes=2, seed=22)
    child.initialize(d)
    child.set_parent_model(parent, parent_model_weight=2.0)
    child.fit_offline(docs, num_collection_passes=1)

    psi = child.get_psi_long()
    assert psi.select("parent_topic").distinct().count() == 3
    sums = (
        psi.groupBy("parent_topic").agg(F.sum("value").alias("s")).collect()
    )
    for r in sums:
        assert abs(r.s - 1.0) < 1e-6


def test_reshape_combined_api(spark, docs):
    """reshape(topic_names=... | dictionary=...) dispatch + exclusivity
    (artm_model.py:1119-1143)."""
    import pytest as _pytest

    from bigartm_spark.model.artm import ARTM
    from bigartm_spark.operators.dictionary import gather_dictionary

    d = gather_dictionary(docs)
    m = ARTM(num_topics=3, num_document_passes=1, seed=2).initialize(d)
    m.reshape(topic_names=["topic_0", "topic_1"])
    assert m.topics == ["topic_0", "topic_1"]
    small = d.limit(50)
    m.reshape(dictionary=small)
    assert m.pwt.compact.count() == 50
    with _pytest.raises(ValueError):
        m.reshape()
    with _pytest.raises(ValueError):
        m.reshape(topic_names=["a"], dictionary=small)


def test_load_nwt_alias_targets_nwt(spark, docs, tmp_path):
    """load(path, 'nwt') must land in nwt, not clobber pwt (the alias
    accepted by save/_named_matrix)."""
    from bigartm_spark.model.artm import ARTM
    from bigartm_spark.operators.dictionary import gather_dictionary

    m = ARTM(num_topics=2, num_document_passes=1, seed=5)
    m.initialize(gather_dictionary(docs))
    m.fit_offline(docs, num_collection_passes=1)
    p = str(tmp_path / "nwt_store")
    m.save(p, "n_wt")
    other = ARTM(num_topics=2, seed=0)
    other.initialize(gather_dictionary(docs))
    before = other.pwt
    other.load(p, "nwt")
    assert other.nwt is not None
    assert other.pwt is before  # pwt untouched
    import pytest as _pytest

    with _pytest.raises(ValueError):
        other.load(p, "wat")
