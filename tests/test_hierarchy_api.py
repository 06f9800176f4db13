"""hARTM whole-hierarchy surface (hierarchy_utils.py:293-534):
navigation, stacked theta/phi/transform, save/load round trip, refit."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigartm_spark.model.hierarchy import HARTM
from bigartm_spark.operators.dictionary import gather_dictionary


@pytest.fixture(scope="module")
def hier(spark, docs):
    sub = docs.filter(F.col("doc_id") < 400).cache()
    d = gather_dictionary(sub)
    h = HARTM()
    h.add_level(sub, d, num_topics=2, num_collection_passes=1, seed=2,
                num_document_passes=2)
    h.add_level(sub, d, num_topics=3, num_collection_passes=1, seed=3,
                num_document_passes=2, parent_level_weight=2.0)
    return h, sub


def test_navigation(hier):
    h, _ = hier
    assert h.num_levels == 2 and len(h) == 2
    assert h.get_level(0) is h[0]
    assert [m.num_topics for m in h] == [2, 3]


def test_add_level_warns_on_shrinking(spark, docs, hier):
    h, sub = hier
    d = gather_dictionary(sub)
    h2 = h.clone()
    with pytest.warns(UserWarning, match="num_topics"):
        h2.add_level(sub, d, num_topics=2, num_collection_passes=1, seed=4,
                     num_document_passes=1)
    assert h2.num_levels == 3
    h2.del_level(-1)
    assert h2.num_levels == 2


def test_del_level_cascades(hier):
    h, _ = hier
    h3 = h.clone()
    h3.del_level(0)
    assert h3.num_levels == 0


def test_stacked_theta_and_phi(hier):
    h, sub = hier
    theta = h.get_theta_long()
    topics = {r["topic"] for r in theta.select("topic").distinct().collect()}
    assert topics == {
        "level0_topic_0", "level0_topic_1",
        "level1_topic_0", "level1_topic_1", "level1_topic_2",
    }
    # pseudo-docs excluded from the stack
    assert theta.filter(F.col("doc_id") < 0).count() == 0

    phi = h.get_phi_long()
    lv = {r["level"] for r in phi.select("level").distinct().collect()}
    assert lv == {0, 1}
    n_tokens = h[0].pwt.compact.count()
    assert phi.count() == n_tokens * 2 + h[1].pwt.compact.count() * 3
    # reference get_phi: horizontal pandas concat, level<X>_<topic> cols
    wide = h.get_phi()
    assert wide.shape[1] == 5
    assert all(c.startswith("level") for c in wide.columns)


def test_stacked_transform(hier):
    h, sub = hier
    out = h.transform(sub.filter(F.col("doc_id") < 50))
    per_doc = (
        out.groupBy("doc_id").agg(F.sum("value").alias("s")).collect()
    )
    # each level's theta sums to 1 per doc -> stacked sum == num_levels
    for r in per_doc:
        assert abs(r["s"] - 2.0) < 1e-6


def test_save_load_roundtrip(hier, tmp_path):
    h, sub = hier
    path = str(tmp_path / "hier")
    h.save(path)
    with pytest.raises(ValueError, match="empty"):
        h.save(path)

    h2 = HARTM().load(path)
    assert h2.num_levels == 2
    assert [m.num_topics for m in h2.levels] == [2, 3]
    assert h2._parent_level_weights == [1.0, 2.0]
    for a, b in zip(h.levels, h2.levels):
        pa = {
            (r["class_id"], r["token"]): r["values"]
            for r in a.pwt.compact.collect()
        }
        pb = {
            (r["class_id"], r["token"]): r["values"]
            for r in b.pwt.compact.collect()
        }
        assert pa.keys() == pb.keys()
        for k in pa:
            np.testing.assert_allclose(pa[k], pb[k], rtol=1e-6)
    # reference caveat preserved: trackers start empty after load
    assert all(not m.score_tracker for m in h2.levels)


def test_refit_after_load(hier, tmp_path):
    h, sub = hier
    path = str(tmp_path / "hier_refit")
    h.save(path)
    h2 = HARTM().load(path)
    h2.fit_offline(sub, num_collection_passes=1)
    assert all(
        np.isfinite(m.score_tracker["perplexity"][-1]) for m in h2.levels
    )
    # psi is recoverable after the refit (pseudo-doc thetas cached again)
    psi = h2.psi()
    assert psi.count() == 2 * 3


def test_level_get_psi_alias(hier):
    h, _ = hier
    # levels are wired as children: the ARTM_Level name works per level
    psi = h[1].get_psi()  # reference pandas: child topics x parent topics
    assert psi.shape == (3, 2)
    for col in psi.columns:
        assert abs(psi[col].sum() - 1.0) < 1e-6
    long = h[1].get_psi_long()
    assert long.count() == 2 * 3


def test_deferred_levels_wire_parent_at_hierarchy_fit(spark, docs):
    """Reference-style deferred construction: both levels created
    unfitted (parent not yet fitted when the child is added), then the
    whole-hierarchy fit_offline wires the parent pseudo-batch at the
    child's turn (hierarchy_utils.py:340-357 rewire pass)."""
    from pyspark.sql import functions as F

    from bigartm_spark.model.hierarchy import HARTM
    from bigartm_spark.operators.dictionary import gather_dictionary

    sub = docs.filter(F.col("doc_id") < 40)
    d = gather_dictionary(sub)
    h = HARTM(num_document_passes=2, seed=3)
    l0 = h.add_level(num_topics=2)
    l1 = h.add_level(num_topics=3)  # parent unfitted -> wiring deferred
    assert getattr(l1, "_parent_model", None) is None
    l0.initialize(d)
    l1.initialize(d)
    h.fit_offline(sub, num_collection_passes=1)
    assert l1._parent_model is l0  # rewired during the hierarchy fit
    psi = h.psi()
    rows = psi.collect()
    assert {r["parent_topic"] for r in rows} == set(l0.topics)
    sums = (
        psi.groupBy("parent_topic").agg(F.sum("value").alias("s")).collect()
    )
    for r in sums:
        assert abs(r["s"] - 1.0) < 1e-6
