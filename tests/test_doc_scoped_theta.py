"""Per-document SmoothSparseTheta scoping
(python/tests/artm/test_regularizer_smooth_sparse_theta.py:8-90):
doc_titles selects which docs are regularized; doc_topic_coef multiplies
tau per topic, flat or per-title. The reference pins exact theta values
(its init is fixed); our init differs, so the structural claims are
pinned instead — zeroed columns, boosted topics, untouched docs."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

import bigartm_spark as bs
from bigartm_spark.operators.dictionary import gather_dictionary
from bigartm_spark.sources.vw import read_vowpal_wabbit

VW = """\
title_0 aaa:1 bbb:2 ccc:3
title_1 aaa:1 bbb:2 ccc:3
title_2 aaa:1 bbb:2 ccc:3
title_3 aaa:1 bbb:2 ccc:3
"""

T = 5


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("sst") / "vw.txt"
    path.write_text(VW)
    docs = read_vowpal_wabbit(spark, str(path)).cache()
    return docs, gather_dictionary(docs)


def _theta_by_title(model, docs):
    rows = (
        model.get_theta_long(docs=docs)
        .collect()
    )
    out: dict[str, dict[str, float]] = {}
    for r in rows:
        out.setdefault(r["doc_title"], {})[r["topic"]] = r["value"]
    return out


def _fit(corpus, **reg_kwargs):
    docs, d = corpus
    m = bs.ARTM(
        num_topics=T, num_document_passes=1, seed=11, cache_theta=True,
        theta_columns_naming="title", dictionary=d,
        regularizers=(
            [bs.SmoothSparseThetaRegularizer(name="SST", **reg_kwargs)]
            if reg_kwargs
            else None
        ),
    )
    m.fit_offline(docs, 1)
    return m


def test_doc_titles_suppression(spark, corpus):
    docs, _ = corpus
    base = _fit(corpus)
    model = _fit(corpus, tau=-1000.0, doc_titles=["title_0", "title_2"])

    th = _theta_by_title(model, docs)
    th_base = _theta_by_title(base, docs)
    # selected docs: every topic fully suppressed -> zero column
    # (reference real_values rows show 0.0 for title_0/title_2)
    for title in ("title_0", "title_2"):
        assert all(abs(v) < 1e-12 for v in th[title].values()), th[title]
    # unselected docs: bit-identical to the unregularized fit
    for title in ("title_1", "title_3"):
        for t, v in th[title].items():
            assert abs(v - th_base[title][t]) < 1e-9


def test_flat_doc_topic_coef(spark, corpus):
    docs, _ = corpus
    topics = [f"topic_{i}" for i in range(T)]
    model = _fit(
        corpus,
        tau=-1000.0,
        doc_titles=["title_0", "title_2", "title_1"],
        doc_topic_coef=[0.0, 1.0, 1.0, 0.0, 0.0],
    )
    th = _theta_by_title(model, docs)
    for title in ("title_0", "title_1", "title_2"):
        assert abs(th[title][topics[1]]) < 1e-9
        assert abs(th[title][topics[2]]) < 1e-9
        # surviving topics renormalize to 1
        assert abs(sum(th[title].values()) - 1.0) < 1e-6
    # unselected doc keeps all topics alive
    assert all(v > 1e-6 for v in th["title_3"].values())


def test_per_doc_topic_coef(spark, corpus):
    docs, _ = corpus
    topics = [f"topic_{i}" for i in range(T)]
    model = _fit(
        corpus,
        tau=-1000.0,
        doc_titles=["title_0", "title_3"],
        doc_topic_coef=[[-1.0, 1.0, 0.0, 0.0, -1.0],
                        [0.0, 1.0, 0.0, -1.0, 0.0]],
    )
    th = _theta_by_title(model, docs)
    # title_0: topics 0 and 4 boosted (coef -1 * tau -1000 = +1000),
    # topic 1 suppressed -> mass splits ~evenly across the boosted pair
    assert abs(th["title_0"][topics[0]] - 0.5) < 0.01
    assert abs(th["title_0"][topics[4]] - 0.5) < 0.01
    assert th["title_0"][topics[1]] < 1e-3
    # title_3: topic 3 boosted (coef -1), topic 1 suppressed (coef +1)
    # -> all mass on topic 3 (reference real_values: 0.996735)
    assert th["title_3"][topics[3]] > 0.99
    assert th["title_3"][topics[1]] < 1e-3
    # untouched docs unchanged structure: full distribution
    assert abs(sum(th["title_1"].values()) - 1.0) < 1e-6


def test_retitle_between_fits(spark, corpus):
    """Reference workflow: mutate cfg.doc_titles, re-initialize, refit."""
    docs, d = corpus
    model = _fit(corpus, tau=-1000.0, doc_titles=["title_0"])
    th1 = _theta_by_title(model, docs)
    assert all(abs(v) < 1e-12 for v in th1["title_0"].values())
    assert any(v > 1e-6 for v in th1["title_1"].values())

    model.initialize(d)
    model.regularizers["SST"].doc_titles = ["title_1"]
    model.fit_offline(docs, 1)
    th2 = _theta_by_title(model, docs)
    assert all(abs(v) < 1e-12 for v in th2["title_1"].values())
    assert any(v > 1e-6 for v in th2["title_0"].values())
