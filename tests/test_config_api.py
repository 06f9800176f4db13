"""Class-based config front door (python/artm scores.py / regularizers.py /
score_tracker.py parity): reference-named score and regularizer classes,
containers, live retuning, and the tracker object surface."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

import bigartm_spark as bs
from bigartm_spark.model.artm import ARTM
from bigartm_spark.operators.dictionary import gather_dictionary

TOPICS = ["t0", "t1", "t2"]


def _sub(docs):
    return docs.filter(F.col("doc_id") < 300)


@pytest.fixture(scope="module")
def fitted(spark, docs):
    sub = _sub(docs)
    m = ARTM(
        topic_names=list(TOPICS),
        num_document_passes=2,
        seed=9,
        cache_theta=True,
        scores=[
            bs.PerplexityScore(name="p"),
            bs.SparsityPhiScore(name="sp"),
            bs.SparsityThetaScore(name="st"),
            bs.ItemsProcessedScore(name="items"),
            bs.TopTokensScore(name="tt", num_tokens=3),
            bs.TopicMassPhiScore(name="tm"),
        ],
        regularizers=[
            bs.SmoothSparsePhiRegularizer(name="ssp", tau=0.1),
            bs.SmoothSparseThetaRegularizer(name="sst", tau=0.05),
        ],
    )
    m.initialize(gather_dictionary(sub))
    m.fit_offline(sub, 2)
    return m


def test_score_tracker_object_surface(fitted):
    t = fitted.score_tracker["p"]
    # back-compat: it IS a list
    assert isinstance(t, list) and len(t) == 2
    # reference tracker surface
    assert t.value == list(t)
    assert t.last_value == t[-1]
    assert np.isfinite(t.last_value)
    # per-score extra fields with last_ variants
    assert len(t.raw) == 2
    assert t.last_normalizer > 0
    assert t.last_zero_tokens >= 0
    with pytest.raises(AttributeError):
        t.no_such_field


def test_sparsity_and_items_scores(fitted):
    sp = fitted.score_tracker["sp"]
    assert 0.0 <= sp.last_value <= 1.0
    assert sp.last_total_tokens == 3 * 0 + fitted.pwt.compact.count() * 3
    st = fitted.score_tracker["st"]
    assert 0.0 <= st.last_value <= 1.0
    items = fitted.score_tracker["items"]
    assert items.last_value > 0


def test_top_tokens_and_topic_mass(fitted):
    tt = fitted.score_tracker["tt"]
    toks = tt.last_tokens
    assert set(toks) == set(TOPICS)
    assert all(len(v) == 3 for v in toks.values())
    ws = tt.last_weights
    for topic in TOPICS:
        assert ws[topic] == sorted(ws[topic], reverse=True)
    tm = fitted.score_tracker["tm"]
    assert tm.last_value > 0
    ratios = tm.last_topic_ratio
    assert abs(sum(ratios.values()) - 1.0) < 1e-6


def test_regularizer_container_and_proxy(fitted):
    regs = fitted.regularizers
    assert len(regs) == 2 and "ssp" in regs
    # tau proxies to the live engine object
    eng = regs["ssp"]._engine
    assert eng in fitted.phi_regularizers
    regs["ssp"].tau = -0.42
    assert eng.tau == -0.42
    assert regs["ssp"].tau == -0.42
    with pytest.raises(AttributeError):
        regs.add(bs.SmoothSparsePhiRegularizer(name="ssp", tau=1.0))
    # theta-side config landed in theta_agents
    assert regs["sst"]._engine in fitted.theta_agents


def test_regularizer_del_detaches(spark, docs):
    m = ARTM(topic_names=list(TOPICS), num_document_passes=1, seed=1)
    m.regularizers.add(bs.SmoothSparsePhiRegularizer(name="a", tau=0.1))
    m.regularizers.add(bs.DecorrelatorPhiRegularizer(name="d", tau=0.01))
    assert len(m.phi_regularizers) == 2
    del m.regularizers["a"]
    assert len(m.phi_regularizers) == 1 and len(m.regularizers) == 1


def test_config_equals_engine_fit(spark, docs):
    """Fitting through the named config must be bit-equal to wiring the
    engine regularizer directly."""
    from bigartm_spark.model.regularizers import SmoothSparsePhi

    sub = _sub(docs)
    d = gather_dictionary(sub)

    via_cfg = ARTM(
        topic_names=list(TOPICS), num_document_passes=2, seed=4,
        regularizers=[bs.SmoothSparsePhiRegularizer(name="s", tau=-0.05)],
    )
    via_cfg.initialize(d)
    via_cfg.fit_offline(sub, 1)

    via_eng = ARTM(
        topic_names=list(TOPICS), num_document_passes=2, seed=4,
        phi_regularizers=[SmoothSparsePhi(tau=-0.05)],
    )
    via_eng.initialize(d)
    via_eng.fit_offline(sub, 1)

    a = {
        (r["class_id"], r["token"]): r["values"]
        for r in via_cfg.pwt.compact.collect()
    }
    b = {
        (r["class_id"], r["token"]): r["values"]
        for r in via_eng.pwt.compact.collect()
    }
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-12)


def test_retune_between_fits_changes_result(spark, docs):
    sub = _sub(docs)
    d = gather_dictionary(sub)
    m = ARTM(
        topic_names=list(TOPICS), num_document_passes=1, seed=6,
        regularizers=[bs.SmoothSparsePhiRegularizer(name="s", tau=0.0)],
        scores=[bs.SparsityPhiScore(name="sp")],
    )
    m.initialize(d)
    m.fit_offline(sub, 1)
    sp_before = m.score_tracker["sp"].last_value
    m.regularizers["s"].tau = -5.0  # strong sparsifier
    m.fit_offline(sub, 1)
    assert m.score_tracker["sp"].last_value > sp_before


def test_kl_function_info(spark):
    with pytest.raises(ValueError):
        bs.KlFunctionInfo(function_type="exp")
    cfg = bs.SmoothSparsePhiRegularizer(
        name="k", tau=0.1, kl_function_info=bs.KlFunctionInfo("log")
    )
    assert cfg._engine.transform_function.kind == "logarithm"
    cfg2 = bs.SmoothSparseThetaRegularizer(
        name="k2", tau=0.1,
        kl_function_info=bs.KlFunctionInfo("pol", power_value=3.0, a_value=2.0),
    )
    tf = cfg2._engine.transform_function
    assert tf.kind == "polynomial" and tf.n == 3.0 and tf.a == 2.0


def test_smooth_sparse_theta_topic_mask_resolution(spark, docs):
    m = ARTM(topic_names=list(TOPICS), num_document_passes=1, seed=2)
    cfg = bs.SmoothSparseThetaRegularizer(
        name="masked", tau=1.0, topic_names=["t1"]
    )
    m.regularizers.add(cfg)
    np.testing.assert_array_equal(
        cfg._engine.topic_mask, np.array([0.0, 1.0, 0.0])
    )


def test_scores_container_semantics(fitted):
    s = fitted.scores
    assert s.size == len(s) == 6
    assert "p" in s and s["p"].name == "p"
    with pytest.raises(AttributeError):
        s.add(bs.PerplexityScore(name="p"))
    assert set(s.data) == {"p", "sp", "st", "items", "tt", "tm"}


def test_clone_does_not_alias_config(fitted):
    c = fitted.clone()
    c.regularizers.add(bs.DecorrelatorPhiRegularizer(name="extra", tau=0.01))
    assert "extra" in c.regularizers and "extra" not in fitted.regularizers
    assert len(c.phi_regularizers) == len(fitted.phi_regularizers) + 1
    # cloned tracker keeps the object surface
    assert c.score_tracker["p"].last_value == fitted.score_tracker["p"].last_value


def test_lda_facade_reference_surface(spark, docs):
    sub = _sub(docs)
    d = gather_dictionary(sub)
    lda = bs.LDA(num_topics=3, alpha=0.02, beta=0.01,
                 num_document_passes=2, seed=5)
    lda.initialize(d)
    lda.fit_offline(sub, 2)
    assert lda.alpha == 0.02 and lda.beta == 0.01
    assert len(lda.perplexity_value) == 2
    assert np.isfinite(lda.perplexity_last_value)
    assert 0.0 <= lda.sparsity_phi_last_value <= 1.0
    assert 0.0 <= lda.sparsity_theta_last_value <= 1.0
    assert "lda_phi_reg" in lda.regularizers
    assert "lda_theta_reg" in lda.regularizers
    top = lda.get_top_tokens(num_tokens=4)
    assert len(top) == 3 and all(len(t) == 4 for t in top)
    topw = lda.get_top_tokens(num_tokens=2, with_weights=True)
    assert all(isinstance(t[0], tuple) and len(t[0]) == 2 for t in topw)
    with pytest.raises(ValueError):
        bs.LDA(num_topics=3, beta=[0.1, 0.2])  # wrong length
    per_topic = bs.LDA(num_topics=2, beta=[0.1, 0.2], seed=1)
    assert len(per_topic.regularizers) == 3  # theta + 2 scoped phi regs


def test_lda_equals_artm_with_regularizers(spark, docs):
    """test_lda_model.py:8-80: an ARTM with SmoothSparsePhi/Theta
    regularizers and the LDA facade must produce identical score
    trajectories and top tokens (zero_eps = 0.001 upstream; here the
    models share one code path so we assert tighter)."""
    sub = _sub(docs)
    d = gather_dictionary(sub)
    alpha, beta, passes = 0.01, 0.02, 3

    m_artm = ARTM(
        num_topics=4, num_document_passes=1, seed=8, cache_theta=True,
        dictionary=d,
        regularizers=[
            bs.SmoothSparsePhiRegularizer(name="SparsePhi", tau=beta),
            bs.SmoothSparseThetaRegularizer(name="SparseTheta", tau=alpha),
        ],
        scores=[
            bs.SparsityThetaScore(name="SparsityThetaScore"),
            bs.PerplexityScore(name="PerplexityScore"),
            bs.SparsityPhiScore(name="SparsityPhiScore"),
            bs.TopTokensScore(name="TopTokensScore", num_tokens=5),
        ],
    )
    m_lda = bs.LDA(num_topics=4, alpha=alpha, beta=beta, seed=8,
                   num_document_passes=1, cache_theta=True)
    m_lda.initialize(d)

    m_artm.fit_offline(sub, num_collection_passes=passes)
    m_lda.fit_offline(sub, num_collection_passes=passes)

    for i in range(passes):
        assert abs(
            m_artm.score_tracker["SparsityPhiScore"].value[i]
            - m_lda.sparsity_phi_value[i]
        ) < 1e-9
        assert abs(
            m_artm.score_tracker["SparsityThetaScore"].value[i]
            - m_lda.sparsity_theta_value[i]
        ) < 1e-9
        assert abs(
            m_artm.score_tracker["PerplexityScore"].value[i]
            - m_lda.perplexity_value[i]
        ) < 1e-6

    lda_tt = m_lda.get_top_tokens(num_tokens=5)
    artm_tt = m_artm.score_tracker["TopTokensScore"].last_tokens
    for i, topic in enumerate(m_artm.topic_names):
        assert artm_tt[topic] == lda_tt[i]
    lda_ttw = m_lda.get_top_tokens(num_tokens=5, with_weights=True)
    artm_w = m_artm.score_tracker["TopTokensScore"].last_weights
    t0 = m_artm.topic_names[0]
    for j in range(5):
        assert abs(artm_w[t0][j] - lda_ttw[0][j][1]) < 1e-9
    assert m_lda.library_version.count(".") == 2
    assert m_lda.clone() is not None


def test_topic_selection_kills_topics(spark, docs):
    """test_regularizer_topic_selection.py behavior (kos goldens are
    data-blocked; the behavioral claim ports): with the batch-local
    n/(n_t*T) topic_value default, a positive tau starves small topics —
    some topic masses collapse toward zero — while the unregularized fit
    keeps every topic alive."""
    from bigartm_spark.model.scores import topic_mass_phi

    sub = _sub(docs)
    d = gather_dictionary(sub)

    def masses(model):
        rows = topic_mass_phi(model.nwt).collect()
        return sorted(r["topic_ratio"] for r in rows)

    base = ARTM(num_topics=10, num_document_passes=10, seed=3, dictionary=d)
    base.fit_offline(sub, 3)
    sel = ARTM(
        num_topics=10, num_document_passes=10, seed=3, dictionary=d,
        regularizers=[
            bs.TopicSelectionThetaRegularizer(name="TopicSelection", tau=0.5)
        ],
        scores=[bs.PerplexityScore(name="p")],
    )
    sel.fit_offline(sub, 3)

    m_base, m_sel = masses(base), masses(sel)
    # unregularized: every topic keeps real mass
    assert m_base[0] > 0.01
    # selected: the smallest topics are starved well below the
    # unregularized floor (the reference's topics_left == 8 analogue)
    assert m_sel[0] < m_base[0] / 10
    assert np.isfinite(sel.score_tracker["p"].last_value)


def test_netplsa_ref_parameterization(spark, tmp_path):
    """test_regularizer_net_plsa.py:14-48: the vertex_names /
    vertex_weights / edge_weights parameterization, given at the ctor or
    mutated after add, fits identically."""
    from bigartm_spark.sources.vw import read_vowpal_wabbit

    vw = tmp_path / "net.vw.txt"
    vw.write_text(
        "title_0 aaa:6 bbb:3 ccc:2 |@time_class time_1\n"
        "title_1 aaa:2 bbb:9 ccc:3\n"
        "title_2 aaa:1 bbb:2 ccc:7 |@time_class time_2\n"
        "title_3 aaa:7 bbb:4 ccc:5 |@time_class time_2\n"
    )
    docs = read_vowpal_wabbit(spark, str(vw)).cache()
    d = gather_dictionary(docs)

    m1 = ARTM(num_topics=5, num_document_passes=1, seed=13, dictionary=d)
    m1.regularizers.add(bs.NetPlsaPhiRegularizer(
        name="net_plsa", tau=1.0, class_id="@time_class",
        vertex_names=["time_1", "time_2"], vertex_weights=[1.0, 2.0],
        edge_weights={0: {1: 3.0}, 1: {0: 2.0}},
    ))

    m2 = ARTM(num_topics=5, num_document_passes=1, seed=13, dictionary=d)
    m2.regularizers.add(bs.NetPlsaPhiRegularizer(name="net_plsa", tau=1.0))
    m2.regularizers["net_plsa"].class_id = "@time_class"
    m2.regularizers["net_plsa"].vertex_names = ["time_1", "time_2"]
    m2.regularizers["net_plsa"].vertex_weights = [1.0, 2.0]
    m2.regularizers["net_plsa"].edge_weights = {0: {1: 3.0}, 1: {0: 2.0}}

    m1.fit_offline(docs, 2)
    m2.fit_offline(docs, 2)

    p1 = {(r["class_id"], r["token"]): r["values"]
          for r in m1.pwt.compact.collect()}
    p2 = {(r["class_id"], r["token"]): r["values"]
          for r in m2.pwt.compact.collect()}
    assert p1.keys() == p2.keys()
    for k in p1:
        np.testing.assert_allclose(p1[k], p2[k], rtol=1e-12)
    # the regularizer actually moved the time vertices (vs no-reg fit)
    m0 = ARTM(num_topics=5, num_document_passes=1, seed=13, dictionary=d)
    m0.fit_offline(docs, 2)
    p0 = {(r["class_id"], r["token"]): r["values"]
          for r in m0.pwt.compact.collect()}
    moved = any(
        abs(a - b) > 1e-9
        for k in p1 if k[0] == "@time_class"
        for a, b in zip(p1[k], p0[k])
    )
    assert moved


def test_topic_scoped_sparsity_and_time_regularizer(spark, docs):
    """test_time_regularizers.py shape: two SparsityPhiScores over topic
    halves plus SmoothTimeInTopicsPhi on the first half only (token
    order defaulting from the dictionary); the regularized half ends
    sparser/smoother than the free half differently from a no-reg fit."""
    sub = _sub(docs)
    d = gather_dictionary(sub)
    m = ARTM(
        num_topics=6, num_document_passes=2, seed=17, dictionary=d,
        scores=[
            bs.SparsityPhiScore(name="sp_one", topic_names=None, eps=1e-3),
        ],
    )
    m.scores.add(bs.SparsityPhiScore(
        name="half_one", topic_names=m.topic_names[:3], eps=1e-3))
    m.scores.add(bs.SparsityPhiScore(
        name="half_two", topic_names=m.topic_names[3:], eps=1e-3))
    m.regularizers.add(bs.SmoothTimeInTopicsPhiRegularizer(
        name="time", tau=10.0, topic_names=m.topic_names[:3]))
    m.fit_offline(sub, 2)
    one = m.score_tracker["half_one"].last_value
    two = m.score_tracker["half_two"].last_value
    tot = m.score_tracker["sp_one"].last_value
    assert 0.0 <= one <= 1.0 and 0.0 <= two <= 1.0
    # the halves bracket the total (sanity of the topic_names filter)
    assert min(one, two) <= tot + 1e-9 <= max(one, two) + 1e-9
    # scoped totals add up: zero counts of halves == whole-model count
    z1 = m.score_tracker["half_one"].last_zero_tokens
    z2 = m.score_tracker["half_two"].last_zero_tokens
    t1 = m.score_tracker["half_one"].last_total_tokens
    t2 = m.score_tracker["half_two"].last_total_tokens
    assert t1 == t2 and t1 + t2 == m.pwt.compact.count() * 6
    assert np.isfinite(m.score_tracker["perplexity"][-1])


def test_kernel_and_snippet_tracker_fields(spark, docs):
    """test_artm_model.py:89-107 field surface: TopicKernelScore
    last_tokens/last_size/last_contrast/last_purity per topic,
    ThetaSnippetScore last_document_ids + last_snippet."""
    sub = _sub(docs)
    m = ARTM(
        topic_names=list(TOPICS), num_document_passes=2, seed=21,
        cache_theta=True, dictionary=gather_dictionary(sub),
        scores=[
            bs.TopicKernelScore(name="ker", probability_mass_threshold=0.5),
            bs.ThetaSnippetScore(name="snip", num_items=7),
        ],
    )
    m.fit_offline(sub, 1)
    ker = m.score_tracker["ker"]
    toks = ker.last_tokens
    sizes = ker.last_size
    assert set(toks) <= set(TOPICS)
    for t, lst in toks.items():
        assert len(lst) == sizes[t]
        assert lst == sorted(lst)
    assert all(0 <= c <= 1.0 + 1e-9 for c in ker.last_contrast.values())
    snip = m.score_tracker["snip"]
    ids = snip.last_document_ids
    assert len(ids) == 7
    assert set(snip.last_snippet) == set(ids)
    assert set(snip.last_snippet[ids[0]]) == set(TOPICS)


def test_info_reference_fields(fitted):
    info = fitted.info()
    assert info["topic_name"] == TOPICS
    assert set(info["regularizer"]) == {"ssp", "sst"}
    assert "p" in info["score"] and "perplexity" in info["score"]
    assert info["cache_entry"] > 0  # fitted with cache_theta=True


def test_get_score_evaluates_late_attached(fitted):
    """artm_model.py:968-975 + lda_model.py get_top_tokens pattern: a
    score added after fit evaluates immediately on get_score."""
    fitted.scores.add(bs.TopTokensScore(name="late_tt", num_tokens=2))
    val = fitted.get_score("late_tt")
    assert val == 6.0  # 2 tokens x 3 topics
    toks = fitted.score_tracker["late_tt"].last_tokens
    assert all(len(v) == 2 for v in toks.values())


def test_class_scoped_perplexity(spark, docs):
    """perplexity.cc:66-80 class_ids scoping: on a single-modality corpus
    the scoped score equals the kernel's corpus perplexity; scoping to a
    modality with different fit quality gives a different value on a
    multimodal corpus."""
    from bigartm_spark.corpus import docs_multimodal

    sub = _sub(docs)
    m = ARTM(
        topic_names=list(TOPICS), num_document_passes=2, seed=2,
        cache_theta=True, dictionary=gather_dictionary(sub),
        scores=[
            bs.PerplexityScore(name="all"),
            bs.PerplexityScore(name="scoped", class_ids=["@default_class"]),
        ],
    )
    m.fit_offline(sub, 1)
    a = m.score_tracker["all"].last_value
    s = m.score_tracker["scoped"].last_value
    # single modality: both measure the same corpus, but the kernel
    # accumulates with the theta of each inner pass (reference
    # cumulative semantics) while the scoped recompute evaluates the
    # FINAL theta — so scoped is systematically lower, same ballpark
    assert s < a
    assert abs(a - s) / a < 0.25
    # normalizer = the class's token mass (same corpus -> same mass)
    assert abs(
        m.score_tracker["scoped"].last_normalizer
        - m.score_tracker["all"].last_normalizer
    ) < 1e-6

    mm = docs_multimodal(spark, "/root/testdata/sf0.001")
    m2 = ARTM(
        topic_names=list(TOPICS), num_document_passes=2, seed=2,
        cache_theta=True, dictionary=gather_dictionary(mm),
        class_ids={"@default_class": 1.0, "supp": 1.0},
        scores=[
            bs.PerplexityScore(name="pdef", class_ids=["@default_class"]),
            bs.PerplexityScore(name="psupp", class_ids=["supp"]),
        ],
    )
    m2.fit_offline(mm, 1)
    pd_, ps_ = (
        m2.score_tracker["pdef"].last_value,
        m2.score_tracker["psupp"].last_value,
    )
    assert np.isfinite(pd_) and np.isfinite(ps_)
    assert abs(pd_ - ps_) > 1e-6  # different modalities, different ppl
