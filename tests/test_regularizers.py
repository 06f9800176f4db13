"""Regularizer unit tests on tiny hand-computable matrices
(FIXTURES.md §5 strategy: closed-form single-step r_wt deltas)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigartm_spark.model.phi import PhiMatrix
from bigartm_spark.model.regularizers import (
    BitermsPhi,
    DecorrelatorPhi,
    ImproveCoherencePhi,
    NetPlsaPhi,
    RegularizeContext,
    SmoothSparsePhi,
    SmoothSparseTheta,
    SmoothTimeInTopicsPhi,
    regularize,
    specified_sparse_phi_transform,
)

TOPICS = ["t0", "t1"]


@pytest.fixture(scope="module")
def tiny_phi(spark):
    rows = [
        ("@default_class", "a", [0.5, 0.1]),
        ("@default_class", "b", [0.3, 0.2]),
        ("@default_class", "c", [0.2, 0.7]),
    ]
    df = spark.createDataFrame(
        rows, "class_id string, token string, values array<double>"
    )
    return PhiMatrix("pwt", TOPICS, df)


def _vals(df):
    return {r["token"]: list(r["values"]) for r in df.collect()}


def test_smooth_sparse_phi_const(spark, tiny_phi):
    r = SmoothSparsePhi(tau=-0.5)
    out = _vals(r.rwt_delta(tiny_phi, tiny_phi, RegularizeContext()))
    assert out["a"] == [-0.5, -0.5]


def test_decorrelator_phi(spark, tiny_phi):
    r = DecorrelatorPhi(tau=2.0)
    out = _vals(r.rwt_delta(tiny_phi, tiny_phi, RegularizeContext()))
    # -tau * p_wt * (rowsum - p_wt): a: [-2*0.5*0.1, -2*0.1*0.5]
    np.testing.assert_allclose(out["a"], [-0.1, -0.1], atol=1e-12)
    np.testing.assert_allclose(out["c"], [-2 * 0.2 * 0.7, -2 * 0.7 * 0.2], atol=1e-12)


def test_improve_coherence_phi(spark, tiny_phi):
    cooc = spark.createDataFrame(
        [("a", "b", 2.0)], "token_a string, token_b string, value double"
    )
    r = ImproveCoherencePhi(tau=1.0, cooc=cooc)
    out = _vals(r.rwt_delta(tiny_phi, tiny_phi, RegularizeContext()))
    # r_a = cooc(a,b) * n_b = 2 * [0.3, 0.2]; r_b = 2 * [0.5, 0.1]
    np.testing.assert_allclose(out["a"], [0.6, 0.4], atol=1e-12)
    np.testing.assert_allclose(out["b"], [1.0, 0.2], atol=1e-12)
    assert "c" not in out


def test_biterms_phi(spark, tiny_phi):
    from bigartm_spark.model.mstep import topic_totals

    cooc = spark.createDataFrame(
        [("a", "b", 1.0)], "token_a string, token_b string, value double"
    )
    ctx = RegularizeContext(topic_totals=topic_totals(tiny_phi))
    r = BitermsPhi(tau=1.0, cooc=cooc)
    out = _vals(r.rwt_delta(tiny_phi, tiny_phi, ctx))
    # n_t = [1.0, 1.0]; p_tuw(a,b) ∝ [0.5*0.3, 0.1*0.2] = [0.15, 0.02]
    exp = np.array([0.15, 0.02]) / 0.17
    np.testing.assert_allclose(out["a"], exp, atol=1e-12)
    np.testing.assert_allclose(out["b"], exp, atol=1e-12)


def test_smooth_time_in_topics(spark, tiny_phi):
    order = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "token string, ord int"
    )
    r = SmoothTimeInTopicsPhi(tau=1.0, token_order=order)
    out = _vals(r.rwt_delta(tiny_phi, tiny_phi, RegularizeContext()))
    # b (middle): sign(a-b) + sign(c-b) per topic: t0: sign(0.2)+sign(-0.1)
    # = 1 - 1 = 0; t1: sign(-0.1)+sign(0.5) = 0 -> delta 0
    np.testing.assert_allclose(out["b"], [0.0, 0.0], atol=1e-12)
    # a (first): only next neighbor b: t0 sign(0.3-0.5)=-1 -> -0.5
    np.testing.assert_allclose(out["a"], [-0.5, 0.1], atol=1e-12)


def test_netplsa_phi(spark):
    from bigartm_spark.model.mstep import topic_totals

    rows = [("vertex", "u", [0.6, 0.2]), ("vertex", "v", [0.4, 0.8])]
    phi = PhiMatrix(
        "pwt",
        TOPICS,
        spark.createDataFrame(
            rows, "class_id string, token string, values array<double>"
        ),
    )
    edges = spark.createDataFrame(
        [("u", "v", 1.0), ("v", "u", 1.0)], "src string, dst string, weight double"
    )
    ctx = RegularizeContext(topic_totals=topic_totals(phi))
    r = NetPlsaPhi(tau=1.0, edges=edges, class_id="vertex")
    out = _vals(r.rwt_delta(phi, phi, ctx))
    # n_t = [1.0, 1.0]; r_u,t0 = 1 * (0.4 - 0.6) = -0.2
    np.testing.assert_allclose(out["u"], [-0.2, 0.6], atol=1e-12)
    np.testing.assert_allclose(out["v"], [0.2, -0.6], atol=1e-12)


def test_specified_sparse_transform(spark, tiny_phi):
    t = specified_sparse_phi_transform(max_elements=1)
    out = t(tiny_phi)
    vals = _vals(out.compact)
    # keep the single largest entry per token row, zero the rest
    assert vals["a"] == [0.5, 0.0]
    assert vals["c"] == [0.0, 0.7]


def test_regularize_sums_deltas(spark, tiny_phi):
    rwt = regularize(
        tiny_phi,
        tiny_phi,
        [SmoothSparsePhi(tau=1.0), SmoothSparsePhi(tau=0.5)],
        RegularizeContext(),
    )
    vals = _vals(rwt)
    assert vals["a"] == [1.5, 1.5]


def test_smooth_sparse_theta_agent():
    agent = SmoothSparseTheta(tau=2.0, alpha_iter=[1.0, 0.5])
    n_td = np.ones((2, 2))
    out = agent.apply(None, n_td, 1)
    np.testing.assert_allclose(out, np.ones((2, 2)) + 1.0)


def test_relative_gamma_coefficients(spark, tiny_phi):
    """gamma=1: inc = |tau| * n_t / sum|delta| * delta. With
    SmoothSparsePhi(tau=2) delta_wt = 2 everywhere: sum|delta_t| = 6
    (3 tokens), n_t = 1 (column-normalized phi... n from tiny_phi sums:
    t0: 1.0, t1: 1.0) -> coef = 2 * 1/6 -> inc = 2/6*2 = 2/3."""
    from bigartm_spark.model.mstep import topic_totals

    reg = SmoothSparsePhi(tau=2.0)
    reg.gamma = 1.0
    ctx = RegularizeContext(topic_totals=topic_totals(tiny_phi))
    rwt = regularize(tiny_phi, tiny_phi, [reg], ctx)
    vals = _vals(rwt)
    for tok in ("a", "b", "c"):
        np.testing.assert_allclose(vals[tok], [2.0 / 3, 2.0 / 3], atol=1e-12)


def test_top_tokens_coherence(spark, tiny_phi):
    from bigartm_spark.operators.topk import top_tokens, top_tokens_coherence

    cooc = spark.createDataFrame(
        [("a", "b", 4.0), ("b", "c", 2.0)],
        "token_a string, token_b string, value double",
    )
    top = top_tokens(tiny_phi.to_long(), k=2)
    coh = {
        r["topic"]: r["coherence"]
        for r in top_tokens_coherence(top, cooc, k=2).collect()
    }
    # t0 top-2 = a, b -> cooc 4; coherence = 2/(2*1) * 4 = 4
    assert abs(coh["t0"] - 4.0) < 1e-12
    # t1 top-2 = c, b -> pair (b, c) = 2 -> coherence 2
    assert abs(coh["t1"] - 2.0) < 1e-12


def test_transform_function_variants(spark):
    """TransformFunction (transform_function.cc:35-47): Constant f=1,
    Logarithm f=ln(x) for x>0 else 0, Polynomial f=a*x^n for x>0 else 0 —
    closed-form check on both the Column and numpy faces."""
    import math

    from bigartm_spark.model.regularizers import TransformFunction

    x = np.array([[0.5, 0.0], [2.0, 1.0]])
    np.testing.assert_allclose(TransformFunction("constant").numpy(x), 1.0)
    np.testing.assert_allclose(
        TransformFunction("logarithm").numpy(x),
        [[math.log(0.5), 0.0], [math.log(2.0), 0.0]],
    )
    np.testing.assert_allclose(
        TransformFunction("polynomial", a=3.0, n=2.0).numpy(x),
        [[3.0 * 0.25, 0.0], [12.0, 3.0]],
    )
    df = spark.createDataFrame([(0.5,), (0.0,), (2.0,)], "v double")
    for tf, expect in [
        (TransformFunction("logarithm"), [math.log(0.5), 0.0, math.log(2.0)]),
        (TransformFunction("polynomial", a=3.0, n=2.0), [0.75, 0.0, 12.0]),
    ]:
        got = [r[0] for r in df.select(tf.column(F.col("v"))).collect()]
        np.testing.assert_allclose(got, expect, rtol=1e-12)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        TransformFunction("exp")


def test_smooth_sparse_phi_log_transform(spark):
    """H1 + Logarithm: delta = tau * ln(p_wt) where p>0."""
    from bigartm_spark.model.phi import PhiMatrix
    from bigartm_spark.model.regularizers import (
        RegularizeContext,
        SmoothSparsePhi,
        TransformFunction,
    )

    compact = spark.createDataFrame(
        [("@default_class", "a", [0.5, 0.5]), ("@default_class", "b", [1.0, 0.0])],
        "class_id string, token string, values array<double>",
    )
    phi = PhiMatrix("pwt", ["t0", "t1"], compact)
    reg = SmoothSparsePhi(tau=2.0, transform_function=TransformFunction("logarithm"))
    delta = {
        r["token"]: r["values"]
        for r in reg.rwt_delta(phi, phi, RegularizeContext()).collect()
    }
    import math

    np.testing.assert_allclose(delta["a"], [2.0 * math.log(0.5)] * 2)
    np.testing.assert_allclose(delta["b"], [2.0 * math.log(1.0), 0.0])


def test_smooth_sparse_theta_polynomial_transform():
    """H2 + Polynomial: n_td += tau * a * n^p where transformed > 0."""
    from bigartm_spark.model.regularizers import (
        SmoothSparseTheta,
        TransformFunction,
    )

    agent = SmoothSparseTheta(
        tau=0.5, transform_function=TransformFunction("polynomial", a=2.0, n=2.0)
    )
    n_td = np.array([[2.0, 0.0], [3.0, 1.0]])
    out = agent.apply(None, n_td.copy(), 0)
    # delta = 0.5 * 2 * n^2 (zero cells transformed to 0 -> no add)
    np.testing.assert_allclose(out, [[2.0 + 4.0, 0.0], [3.0 + 9.0, 1.0 + 1.0]])


def test_decorrelator_topic_pairs(spark, tiny_phi):
    """decorrelator_phi.cc:80-95 'complex case': weights_sum is the
    pair-weighted sum over listed topics; r += -tau*p*(weights_sum - p),
    subtracting p even when the topic is not its own pair target
    (reference quirk). Unlisted topics get no delta."""
    r = DecorrelatorPhi(tau=2.0, topic_pairs={"t0": {"t1": 100.0}})
    out = _vals(r.rwt_delta(tiny_phi, tiny_phi, RegularizeContext()))
    # token a: t0 delta = -2 * 0.5 * (100*0.1 - 0.5) = -9.5; t1 -> 0
    np.testing.assert_allclose(out["a"], [-9.5, 0.0], atol=1e-12)
    # token c: -2 * 0.2 * (100*0.7 - 0.2) = -27.92
    np.testing.assert_allclose(out["c"], [-27.92, 0.0], atol=1e-12)


def test_decorrelator_class_ids_scope(spark):
    rows = [
        ("@default_class", "a", [0.5, 0.5]),
        ("labels", "x", [0.4, 0.6]),
    ]
    phi = PhiMatrix(
        "pwt",
        TOPICS,
        spark.createDataFrame(
            rows, "class_id string, token string, values array<double>"
        ),
    )
    r = DecorrelatorPhi(tau=1.0, class_ids=["labels"])
    out = _vals(r.rwt_delta(phi, phi, RegularizeContext()))
    # default class untouched (zero delta), labels regularized
    np.testing.assert_allclose(out["a"], [0.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(
        out["x"], [-0.4 * 0.6, -0.6 * 0.4], atol=1e-12
    )


def test_label_regularization_class_scope(spark):
    from bigartm_spark.model.mstep import topic_totals
    from bigartm_spark.model.regularizers import LabelRegularizationPhi

    rows = [
        ("@default_class", "a", [0.5, 0.5]),
        ("labels", "pos", [0.8, 0.2]),
        ("labels", "neg", [0.2, 0.8]),
    ]
    phi = PhiMatrix(
        "pwt",
        TOPICS,
        spark.createDataFrame(
            rows, "class_id string, token string, values array<double>"
        ),
    )
    ctx = RegularizeContext(topic_totals=topic_totals(phi))
    out = _vals(
        LabelRegularizationPhi(tau=1.0, class_ids=["labels"]).rwt_delta(
            phi, phi, ctx
        )
    )
    np.testing.assert_allclose(out["a"], [0.0, 0.0], atol=1e-12)
    assert sum(out["pos"]) > 0 and sum(out["neg"]) > 0


def test_topic_segmentation_one_hot_semantics():
    """topic_segmentation_ptdw.cc:12-117 closed form: positions are
    hard-assigned one-hot; the main topic switches when the left/right
    window divergence crosses threshold; doc starts take their own
    argmax; docs never bleed into each other."""
    from bigartm_spark.model.regularizers import TopicSegmentationPtdw

    # one doc: 4 positions of topic0 then 4 of topic1 (clean boundary)
    a = np.array([[0.9, 0.1]] * 4 + [[0.1, 0.9]] * 4)
    starts = np.array([0])
    seg = np.zeros(8, dtype=int)
    out = TopicSegmentationPtdw(window=2, threshold=0.3).apply_ptdw(
        a, starts, seg
    )
    # every row one-hot
    np.testing.assert_allclose(out.sum(axis=1), np.ones(8))
    assert set(np.unique(out)) <= {0.0, 1.0}
    # first half topic 0, second half topic 1 (switch at the boundary)
    assert out[:4, 0].all() and out[4:, 1].all()

    # high threshold: no switch, the whole doc keeps the start topic
    out_hi = TopicSegmentationPtdw(window=2, threshold=10.0).apply_ptdw(
        a, starts, seg
    )
    assert out_hi[:, 0].all()

    # two docs: segmentation resets at the second doc's start
    b = np.vstack([a, np.array([[0.2, 0.8]] * 3)])
    starts2 = np.array([0, 8])
    seg2 = np.array([0] * 8 + [1] * 3)
    out2 = TopicSegmentationPtdw(window=2, threshold=0.3).apply_ptdw(
        b, starts2, seg2
    )
    assert out2[8:, 1].all()  # doc 2 starts on its own argmax

    # background weighting: rows are weighted by (1 - bg mass). With bg
    # mass uniform per half the normalized windows are unchanged, so the
    # boundary stays (reference math: weights cancel in L/Lw) ...
    out_bg = TopicSegmentationPtdw(
        window=2, threshold=0.3,
        background_topic_mask=np.array([False, True]),
    ).apply_ptdw(a, starts, seg)
    np.testing.assert_allclose(out_bg, out)
    # ... but positions of pure background (w == 0) can't vote: a doc
    # whose right window is all-background never triggers a change
    c = np.array([[0.9, 0.1]] * 3 + [[0.0, 1.0]] * 3)
    out_c = TopicSegmentationPtdw(
        window=3, threshold=0.05,
        background_topic_mask=np.array([False, True]),
    ).apply_ptdw(c, np.array([0]), np.zeros(6, dtype=int))
    assert out_c[:3, 0].all()
    # without the background mask the same doc switches
    out_c2 = TopicSegmentationPtdw(window=3, threshold=0.05).apply_ptdw(
        c, np.array([0]), np.zeros(6, dtype=int)
    )
    assert out_c2[3:, 1].all()
