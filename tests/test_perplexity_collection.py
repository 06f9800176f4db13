"""D7 UnigramCollectionModel perplexity (perplexity.cc:159-239): the
zero-p(w|d) fallback switches from the document unigram n_dw/n_d to the
dictionary's global token frequency. Pinned against a numpy re-derivation
and through both front doors (ARTM PerplexityScore(dictionary=...),
MasterComponent PerplexityScoreConfig(model_type=1))."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

TOPICS = ["t0", "t1"]

# phi: token 'dead' has ZERO probability in every topic -> p(w|d) = 0
PHI_ROWS = [
    ("@default_class", "a", [0.6, 0.2]),
    ("@default_class", "b", [0.4, 0.3]),
    ("@default_class", "dead", [0.0, 0.0]),
    ("@default_class", "c", [0.0, 0.5]),
]

DOCS = [
    # doc 0: a(2) b(1) dead(3)
    (0, "a", 2.0), (0, "b", 1.0), (0, "dead", 3.0),
    # doc 1: b(2) c(2)
    (1, "b", 2.0), (1, "c", 2.0),
]

DICT_CP = {"a": 0.2, "b": 0.3, "dead": 0.4, "c": 0.1}


def _fixture(spark):
    from bigartm_spark.model.phi import PhiMatrix

    phi = PhiMatrix(
        "pwt",
        TOPICS,
        spark.createDataFrame(
            PHI_ROWS, "class_id string, token string, values array<double>"
        ),
    )
    docs = spark.createDataFrame(
        [
            (d, str(d), "0", "@default_class", t, w, i, i, "@default_transaction")
            for i, (d, t, w) in enumerate(DOCS)
        ],
        "doc_id long, title string, batch_id string, class_id string, "
        "token string, weight double, pos int, transaction_id int, "
        "transaction_typename string",
    )
    cp = spark.createDataFrame(
        [("@default_class", t, v) for t, v in DICT_CP.items()],
        "class_id string, token string, cp double",
    )
    return phi, docs, cp


def _numpy_reference(num_passes):
    """Replicate the kernel EM + both perplexity variants in numpy."""
    phi = {t: np.array(v) for _, t, v in PHI_ROWS}
    docs = {}
    for d, t, w in DOCS:
        docs.setdefault(d, []).append((t, w))
    raw_doc = raw_coll = norm = 0.0
    zeros = 0
    for d, toks in docs.items():
        theta = np.full(2, 0.5)
        for _ in range(num_passes):
            n_td = np.zeros(2)
            for t, w in toks:
                num = phi[t] * theta
                z = num.sum()
                if z > 0:
                    n_td += w * num / z
            tot = n_td.sum()
            theta = n_td / tot if tot > 0 else np.zeros(2)
        n_d = sum(w for _, w in toks)
        for t, w in toks:
            z = float((phi[t] * theta).sum())
            norm += w
            if z > 0:
                raw_doc += w * math.log(z)
                raw_coll += w * math.log(z)
            else:
                zeros += 1
                raw_doc += w * math.log(w / n_d)
                raw_coll += w * math.log(DICT_CP[t])
    return (
        math.exp(-raw_doc / norm),
        math.exp(-raw_coll / norm),
        zeros,
    )


def test_collection_model_matches_numpy(spark):
    from bigartm_spark.model import estep

    phi, docs, cp = _fixture(spark)
    out = estep.process_batches(
        docs, phi, num_document_passes=3, compute_scores=True,
        collection_probs=cp,
    )
    s = estep.extract_scores(out)
    exp_doc, exp_coll, exp_zeros = _numpy_reference(3)
    assert s["perplexity"] == pytest.approx(exp_doc, rel=1e-9)
    assert s["perplexity@coll"] == pytest.approx(exp_coll, rel=1e-9)
    assert s["perplexity_zero_words@coll"] == exp_zeros
    # the two models share everything except the zero-word fallback
    assert s["perplexity@coll"] != pytest.approx(s["perplexity"], rel=1e-6)


def test_collection_model_equals_doc_model_without_zero_words(spark):
    from bigartm_spark.model import estep

    phi, docs, cp = _fixture(spark)
    docs_nz = docs.filter(F.col("token") != "dead")
    s = estep.extract_scores(
        estep.process_batches(
            docs_nz, phi, num_document_passes=3, compute_scores=True,
            collection_probs=cp,
        )
    )
    assert s["perplexity_zero_words"] == 0
    assert s["perplexity@coll"] == pytest.approx(s["perplexity"], rel=1e-12)


def test_artm_front_door_dictionary_perplexity(spark):
    """PerplexityScore(dictionary=...) tracks the collection-model value
    (reference scores.py PerplexityScore dictionary kwarg)."""
    import bigartm_spark as artm
    from bigartm_spark.operators.dictionary import gather_dictionary

    phi, docs, cp = _fixture(spark)
    d = gather_dictionary(docs)
    m = artm.ARTM(num_topics=2, num_document_passes=3, seed=1)
    m.scores.add(artm.PerplexityScore(name="PplColl", dictionary=d))
    m.scores.add(artm.PerplexityScore(name="PplDoc"))
    m.initialize(d)
    m.fit_offline(docs, num_collection_passes=2)
    coll = m.score_tracker["PplColl"].value
    doc = m.score_tracker["PplDoc"].value
    assert len(coll) == 2 and len(doc) == 2
    assert all(np.isfinite(coll)) and all(np.isfinite(doc))


def test_master_component_model_type_dispatch(spark):
    """The ported wrapper pattern: PerplexityDoc (default) and
    PerplexityCol (model_type=1 + dictionary) side by side, as in
    reference test_04_dictionary.py."""
    import bigartm_spark.model.master_component as mc
    import bigartm_spark.wrapper.messages_pb2 as messages
    from bigartm_spark.sources.io import save_batches
    import tempfile

    phi, docs, cp = _fixture(spark)
    folder = tempfile.mkdtemp() + "/b"
    save_batches(docs, folder)

    col_cfg = messages.PerplexityScoreConfig()
    col_cfg.model_type = 1
    col_cfg.dictionary_name = "dictionary"
    master = mc.MasterComponent(
        scores={
            "PerplexityDoc": messages.PerplexityScoreConfig(),
            "PerplexityCol": col_cfg,
        }
    )
    master.gather_dictionary(
        dictionary_target_name="dictionary", data_path=folder
    )
    master.initialize_model(
        model_name="pwt", topic_names=TOPICS, dictionary_name="dictionary"
    )
    master.clear_score_cache()
    master.process_batches("pwt", "nwt", 3, folder)
    master.normalize_model("pwt", "nwt")
    doc_s = master.get_score("PerplexityDoc")
    col_s = master.get_score("PerplexityCol")
    assert np.isfinite(doc_s.value) and np.isfinite(col_s.value)
    assert doc_s.normalizer == pytest.approx(col_s.normalizer)
