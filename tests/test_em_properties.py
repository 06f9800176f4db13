"""Hypothesis property tests for the EM core invariants (SURVEY §5's
randomized-fixture strategy, applied to the math itself):

- mass conservation: one E-step pass distributes each token occurrence's
  weight across topics, so sum(n_wt) == sum(corpus weight) exactly
  (processor_helpers.cc's n_dw · p_tdw rows sum back to n_dw).
- normalize: every (class_id, topic) column of p_wt sums to 1 when the
  topic has mass (normalize_model semantics, master_component.cc).
- merge commutativity: MergeModel is a weighted union —
  merge(a,b,w1,w2) == merge(b,a,w2,w1) row-for-row.
- theta rows are distributions: per-doc topic weights sum to 1.

Random corpora are tiny (<= 8 docs x 6 tokens) so each example is one
local Spark job; hypothesis settings keep the suite fast and
deterministic (no deadline — Spark job latency is environment noise).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

TOPICS = ["t0", "t1", "t2"]


def _corpus(spark, counts: np.ndarray):
    from bigartm_spark.sources.memory import from_n_wd

    vocab = [f"w{i}" for i in range(counts.shape[0])]
    return from_n_wd(spark, counts, vocab)


counts_strategy = st.integers(2, 6).flatmap(
    lambda w: st.integers(2, 8).flatmap(
        lambda d: st.lists(
            st.lists(st.integers(0, 5), min_size=d, max_size=d),
            min_size=w,
            max_size=w,
        )
    )
)


def _nonempty(counts: list[list[int]]) -> bool:
    a = np.asarray(counts)
    # every doc needs at least one token, else it is not a document
    return bool(a.sum() > 0 and (a.sum(axis=0) > 0).all())


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(counts=counts_strategy.filter(_nonempty), seed=st.integers(0, 2**16))
def test_estep_conserves_mass_and_theta_rows_sum_to_one(spark, counts, seed):
    from bigartm_spark.model import estep
    from bigartm_spark.model.init import initialize_phi
    from bigartm_spark.operators.dictionary import gather_dictionary

    a = np.asarray(counts, dtype=float)
    docs = _corpus(spark, a)
    phi = initialize_phi(gather_dictionary(docs), TOPICS, seed=seed)
    out = estep.process_batches(
        docs, phi, num_document_passes=2, emit_theta=True
    ).cache()
    try:
        nwt = estep.aggregate_nwt(out, len(TOPICS))  # raw compact rows
        nwt_total = sum(
            float(sum(r["values"])) for r in nwt.collect()
        )
        assert nwt_total == pytest.approx(a.sum(), rel=1e-9)

        theta = estep.extract_theta(out, TOPICS)  # long (doc, topic, value)
        per_doc: dict = {}
        for r in theta.collect():
            assert r["value"] >= 0
            per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0.0) + r["value"]
        assert per_doc  # at least one document produced a distribution
        for doc_id, total in per_doc.items():
            assert total == pytest.approx(1.0, abs=1e-9), doc_id
    finally:
        out.unpersist()
        estep.release_phi_broadcasts()


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(counts=counts_strategy.filter(_nonempty), seed=st.integers(0, 2**16))
def test_normalize_columns_sum_to_one(spark, counts, seed):
    from bigartm_spark.model import estep, mstep
    from bigartm_spark.model.init import initialize_phi
    from bigartm_spark.operators.dictionary import gather_dictionary

    a = np.asarray(counts, dtype=float)
    docs = _corpus(spark, a)
    phi = initialize_phi(gather_dictionary(docs), TOPICS, seed=seed)
    out = estep.process_batches(docs, phi, num_document_passes=1)
    try:
        from bigartm_spark.model.phi import PhiMatrix

        nwt = PhiMatrix("nwt", TOPICS, estep.aggregate_nwt(out, len(TOPICS)))
        pwt = mstep.normalize(nwt)
        cols = np.zeros(len(TOPICS))
        for r in pwt.compact.collect():
            cols += np.asarray(r["values"])
        # every topic accumulated some mass on a nonempty corpus, and
        # each normalized column sums to exactly 1
        np.testing.assert_allclose(cols, np.ones(len(TOPICS)), atol=1e-9)
    finally:
        estep.release_phi_broadcasts()


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    counts_a=counts_strategy.filter(_nonempty),
    counts_b=counts_strategy.filter(_nonempty),
    w1=st.floats(0.1, 4.0, allow_nan=False),
    w2=st.floats(0.1, 4.0, allow_nan=False),
)
def test_merge_models_commutes(spark, counts_a, counts_b, w1, w2):
    from bigartm_spark.model import estep, mstep
    from bigartm_spark.model.init import initialize_phi
    from bigartm_spark.operators.dictionary import gather_dictionary

    def one_nwt(counts, seed):
        docs = _corpus(spark, np.asarray(counts, dtype=float))
        phi = initialize_phi(gather_dictionary(docs), TOPICS, seed=seed)
        out = estep.process_batches(docs, phi, num_document_passes=1)
        from bigartm_spark.model.phi import PhiMatrix

        return PhiMatrix("nwt", TOPICS, estep.aggregate_nwt(out, len(TOPICS)))

    na, nb = one_nwt(counts_a, 1), one_nwt(counts_b, 2)
    try:
        ab = {
            (r["class_id"], r["token"]): tuple(r["values"])
            for r in mstep.merge_nwt([(na, w1), (nb, w2)]).compact.collect()
        }
        ba = {
            (r["class_id"], r["token"]): tuple(r["values"])
            for r in mstep.merge_nwt([(nb, w2), (na, w1)]).compact.collect()
        }
        assert set(ab) == set(ba)
        for k in ab:
            np.testing.assert_allclose(ab[k], ba[k], rtol=1e-12)
    finally:
        estep.release_phi_broadcasts()
