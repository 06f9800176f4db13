"""Reference-name API surface (artm_model.py:333-534, 749-961, 1287-1289):
property aliases, update counters, dense/sparse driver-side getters, the
title theta naming mode, and ARTM-level transaction fitting."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigartm_spark.model.artm import ARTM
from bigartm_spark.operators.dictionary import gather_dictionary

TOPICS = ["t0", "t1", "t2"]


def _small(docs):
    return docs.filter(F.col("doc_id") < 300)


@pytest.fixture(scope="module")
def fitted(spark, docs):
    sub = _small(docs)
    m = ARTM(
        topic_names=list(TOPICS), num_document_passes=2, seed=7,
        cache_theta=True,
    )
    m.initialize(gather_dictionary(sub))
    m.fit_offline(sub, 2)
    return m


def test_version_surface(fitted):
    import bigartm_spark

    assert bigartm_spark.version() == bigartm_spark.__version__
    assert fitted.library_version == bigartm_spark.__version__


def test_property_aliases(fitted):
    assert fitted.num_topics == 3
    assert fitted.topic_names == TOPICS
    assert fitted.model_pwt == "pwt"
    assert fitted.model_nwt == "nwt"
    assert fitted.theta_name == "theta"
    assert fitted.num_processors >= 1
    # two offline passes -> two phi updates
    assert fitted.num_phi_updates == 2
    assert fitted.num_online_processed_batches == 0


def test_class_ids_alias(spark):
    m = ARTM(num_topics=2, class_ids={"@default_class": 2.0})
    assert m.class_weights == {"@default_class": 2.0}
    m.class_ids = {"@default_class": 1.0, "supp": 0.5}
    assert m.class_weights["supp"] == 0.5


def test_topic_names_rename(spark, docs):
    sub = _small(docs)
    m = ARTM(topic_names=list(TOPICS), num_document_passes=1, seed=7)
    m.initialize(gather_dictionary(sub))
    m.fit_offline(sub, 1)
    before = {
        (r["class_id"], r["token"]): r["values"]
        for r in m.pwt.compact.collect()
    }
    m.topic_names = ["a", "b", "c"]
    assert m.topics == ["a", "b", "c"]
    assert m.pwt.topics == ["a", "b", "c"]
    # pure relabel: values untouched
    after = {
        (r["class_id"], r["token"]): r["values"]
        for r in m.pwt.compact.collect()
    }
    assert before == after
    with pytest.raises(ValueError):
        m.topic_names = ["only", "two"]
    with pytest.raises(ValueError):
        m.topic_names = []


def test_theta_columns_naming_validation_and_title_join(spark, docs, fitted):
    with pytest.raises(ValueError):
        ARTM(num_topics=2, theta_columns_naming="names")
    fitted.theta_columns_naming = "title"
    out = fitted.get_theta_long(docs=_small(docs))
    assert "doc_title" in out.columns
    row = out.filter(F.col("doc_id").isNotNull()).first()
    assert row["doc_title"] == str(row["doc_id"])  # title == str(orderkey)
    fitted.theta_columns_naming = "id"
    assert "doc_title" not in fitted.get_theta_long().columns


def test_get_phi_dense_matches_get_phi(fitted):
    # reference contract: get_phi_dense -> (ndarray, token tuples,
    # topic names); get_phi -> the same data as a pandas frame
    nd, tokens, cols = fitted.get_phi_dense()
    assert cols == TOPICS and nd.shape == (len(tokens), len(TOPICS))
    dense = fitted.get_phi()
    assert list(dense.columns) == TOPICS and list(dense.index) == tokens
    long_rows = fitted.get_phi_long().collect()
    by_key = {
        (r["class_id"], r["token"], r["topic"]): r["value"] for r in long_rows
    }
    # spot-check every dense cell against the long view
    for (cls, tok), row in dense.iterrows():
        for t in TOPICS:
            assert abs(row[t] - by_key[(cls, tok, t)]) < 1e-12
    # column selection
    nd1, _, cols1 = fitted.get_phi_dense(topic_names=["t1"])
    assert cols1 == ["t1"] and nd1.shape[1] == 1
    assert list(fitted.get_phi(topic_names="t1").columns) == ["t1"]


def test_get_phi_sparse_roundtrip(fitted):
    vals, rows, cols, tokens, topics = fitted.get_phi_sparse(eps=1e-9)
    assert topics == TOPICS
    dense = fitted.get_phi()
    mat = np.zeros((len(tokens), len(topics)))
    mat[rows, cols] = vals
    np.testing.assert_allclose(
        mat, dense.loc[tokens].to_numpy(), atol=1e-9
    )


def test_get_theta_sparse(fitted):
    vals, doc_ids, topic_idx = fitted.get_theta_sparse(eps=1e-9)
    assert len(vals) == len(doc_ids) == len(topic_idx)
    assert np.all(vals > 1e-9)
    assert set(topic_idx) <= {0, 1, 2}
    # per-doc theta sums to ~1 when all topics survive eps
    import pandas as pd

    s = pd.DataFrame({"d": doc_ids, "v": vals}).groupby("d")["v"].sum()
    assert (np.abs(s - 1.0) < 1e-6).mean() > 0.9


def test_online_batch_counter(spark, docs):
    from bigartm_spark.streaming.online import split_batch_groups

    sub = _small(docs)
    m = ARTM(topic_names=list(TOPICS), num_document_passes=1, seed=3)
    m.initialize(gather_dictionary(sub))
    groups = split_batch_groups(sub, update_every=16)[:2]
    m.fit_online(groups, update_every=16)
    assert m.num_online_processed_batches == 32
    assert m.num_phi_updates == 2


def test_artm_transaction_fit(spark, docs):
    """ARTM-level transaction mode (transaction_typenames in the ctor
    routes the fit through the transaction kernel — artm_model.py:526-533
    / processor_transaction_helpers.cc:12-26). Singleton transactions:
    the result must match the plain path with the reference's off-by-one
    (tx runs num_document_passes+1 inner iterations)."""
    sub = _small(docs)
    d = gather_dictionary(sub)

    tx = ARTM(
        topic_names=list(TOPICS), num_document_passes=0, seed=5,
        transaction_typenames={"@default_transaction": 1.0},
    )
    tx.initialize(d)
    tx.fit_offline(sub, 1)

    plain = ARTM(topic_names=list(TOPICS), num_document_passes=1, seed=5)
    plain.initialize(d)
    plain.fit_offline(sub, 1)

    tx_phi = {
        (r["class_id"], r["token"]): r["values"]
        for r in tx.pwt.compact.collect()
    }
    pl_phi = {
        (r["class_id"], r["token"]): r["values"]
        for r in plain.pwt.compact.collect()
    }
    assert tx_phi.keys() == pl_phi.keys()
    for k in tx_phi:
        np.testing.assert_allclose(tx_phi[k], pl_phi[k], rtol=1e-7)
    assert np.isfinite(tx.score_tracker["perplexity"][-1])


def test_transform_matrix_types(spark, docs, fitted):
    sub = _small(docs).filter(F.col("doc_id") < 60)
    theta = fitted.transform(sub)
    assert set(theta.columns) == {"doc_id", "topic", "value"}

    ptdw = fitted.transform(sub, theta_matrix_type="dense_ptdw")
    assert set(ptdw.columns) == {"doc_id", "pos", "topic", "value"}
    # one distribution over topics per (doc, pos): rows sum to 1
    sums = (
        ptdw.groupBy("doc_id", "pos")
        .agg(F.sum("value").alias("s"))
        .collect()
    )
    assert sums and all(abs(r["s"] - 1.0) < 1e-6 for r in sums)

    cached = fitted.transform(sub, theta_matrix_type="cache")
    assert fitted.theta is cached
    assert fitted.transform(sub, theta_matrix_type=None) is None
    with pytest.raises(ValueError):
        fitted.transform(sub, theta_matrix_type="3d_theta")


def test_transform_predict_class_id_passthrough(spark, docs, fitted):
    sub = _small(docs).filter(F.col("doc_id") < 60)
    out = fitted.transform(sub, predict_class_id="@default_class")
    direct = fitted.predict_class_id(sub, "@default_class")
    assert sorted(out.columns) == sorted(direct.columns)
    assert out.count() == direct.count()


def test_ctor_parent_model_and_theta_name(spark, docs, fitted):
    child = ARTM(
        topic_names=["c0", "c1", "c2", "c3"], num_document_passes=1,
        seed=2, num_processors=8, theta_name="my_theta",
        parent_model=fitted, parent_model_weight=2.0,
    )
    assert child.theta_name == "my_theta"
    assert child.parent_model_weight == 2.0
    sub = _small(docs)
    child.initialize(gather_dictionary(sub))
    child.fit_offline(sub, 1)  # fits on corpus + parent pseudo-batch
    psi = child.get_parent_psi()  # reference pandas: child x parent
    assert psi.shape == (4, 3)
    for col in psi.columns:
        assert abs(psi[col].sum() - 1.0) < 1e-6
    rows = child.get_psi_long().collect()
    # one distribution over 4 child topics per 3 parent topics
    assert len(rows) == 12
    sums = {}
    for r in rows:
        sums[r["parent_topic"]] = sums.get(r["parent_topic"], 0) + r["value"]
    assert all(abs(v - 1.0) < 1e-6 for v in sums.values())


def test_reference_export_list_resolves():
    """Every name the reference exports from `import artm`
    (python/artm/__init__.py: artm_model/lda_model/hierarchy_utils/
    dictionary/regularizers/scores/batches_utils __all__ +
    MasterComponent + messages) resolves from bigartm_spark — the
    drop-in-import guarantee."""
    import bigartm_spark as artm

    names = [
        # from .artm_model / .lda_model / .hierarchy_utils
        "ARTM", "version", "load_artm_model", "LDA", "hARTM",
        # from .dictionary / .batches_utils
        "Dictionary", "BatchVectorizer",
        # from .regularizers import *
        "KlFunctionInfo",
        "SmoothSparsePhiRegularizer", "SmoothSparseThetaRegularizer",
        "DecorrelatorPhiRegularizer", "LabelRegularizationPhiRegularizer",
        "SpecifiedSparsePhiRegularizer", "ImproveCoherencePhiRegularizer",
        "SmoothPtdwRegularizer", "TopicSelectionThetaRegularizer",
        "BitermsPhiRegularizer", "HierarchySparsingThetaRegularizer",
        "TopicSegmentationPtdwRegularizer", "SmoothTimeInTopicsPhiRegularizer",
        "NetPlsaPhiRegularizer",
        # from .scores import *
        "PerplexityScore", "SparsityThetaScore", "SparsityPhiScore",
        "ItemsProcessedScore", "TopTokensScore", "ThetaSnippetScore",
        "TopicKernelScore", "TopicMassPhiScore", "ClassPrecisionScore",
        "BackgroundTokensRatioScore",
        # low-level wrapper surface
        "MasterComponent", "messages",
    ]
    missing = [n for n in names if getattr(artm, n, None) is None]
    assert not missing, f"reference exports missing: {missing}"
    # the reference spelling and the classname spelling are the same class
    assert artm.hARTM is artm.HARTM
    # messages is the wrapper message module (Batch with repeated fields)
    b = artm.messages.Batch()
    b.token.append("t0")
    it = b.item.add()
    it.token_id.append(0)
    assert list(b.token) == ["t0"] and len(b.item) == 1


def test_hartm_reference_spelling_constructs(spark):
    """`artm.hARTM(...)` — the exact line a reference script writes."""
    import bigartm_spark as artm

    h = artm.hARTM()
    assert h.num_levels == 0 or hasattr(h, "levels")


def test_transform_batch_vectorizer_returns_reference_pandas(spark, tmp_path):
    """transform's return type follows the input style: a docs DataFrame
    stays distributed (the corpus-scale path), a BatchVectorizer — how
    every reference script calls it — returns the reference pandas
    ThetaMatrix (topics rows x document columns)."""
    import os

    import bigartm_spark as artm

    vw = str(tmp_path / "t.vw.txt")
    with open(vw, "w") as f:
        f.write("title_0 aaa:1 bbb:2 ccc:3\ntitle_1 aaa:2 bbb:1 ccc:1\n")
    bv = artm.BatchVectorizer(
        data_path=vw, data_format="vowpal_wabbit",
        target_folder=str(tmp_path / "b"),
    )
    m = artm.ARTM(num_topics=3, dictionary=bv.dictionary,
                  num_document_passes=2)
    m.fit_offline(batch_vectorizer=bv, num_collection_passes=1)
    out = m.transform(batch_vectorizer=bv)
    assert out.shape == (3, 2)
    for col in out.columns:
        assert abs(out[col].sum() - 1.0) < 1e-9
    # title naming keys the columns by item title
    m.theta_columns_naming = "title"
    named = m.transform(batch_vectorizer=bv)
    assert sorted(named.columns) == ["title_0", "title_1"]
    # DataFrame input stays the distributed long relation
    from pyspark.sql import DataFrame

    assert isinstance(m.transform(bv.docs), DataFrame)
