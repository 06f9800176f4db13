"""Hypothesis property tests for the MinHash/LSH contract (VERDICT r6
next-round #7, mirroring the r6 VW/EM property suites):

- banding contract: lsh_candidate_pairs is EXACTLY the pairs whose
  signatures (from minhash_signatures) agree on some full band —
  recomputed independently in pandas per random corpus.
- estimate contract: minhash_jaccard_estimate equals the fraction of
  agreeing signature components, recomputed from the signatures.
- set semantics: signatures depend on the shingle set only — extra
  whitespace (empty words are dropped) and duplicated docs produce
  identical signatures; an exact duplicate collides in EVERY band.
- stream/batch equality: the row-local streaming signature columns
  (row_minhash_cols) equal the batch _minhash_wide aggregation on the
  same random corpus.
- analytic banding probability (fixed-seed statistical check, not
  hypothesis): pairs engineered to share a fraction s of shingles
  collide in >= 1 band at the textbook rate 1 - (1 - s^r)^b within a
  generous tolerance.

Random corpora are tiny so each example is one local Spark job;
settings as in test_em_properties.py (no deadline — Spark latency is
environment noise).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bigartm_spark.operators.dedup import LSH_BAND_SIZE, MINHASH_K

# words drawn from a small alphabet so random docs actually share shingles
word_st = st.integers(0, 9).map(lambda i: f"w{i}")
doc_st = st.lists(word_st, min_size=3, max_size=12).map(" ".join)
corpus_st = st.lists(doc_st, min_size=2, max_size=6)


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _sig_matrix(sig_pdf):
    """(doc_id -> np.array of K minima) from the long signature layout."""
    out = {}
    for doc_id, grp in sig_pdf.groupby("doc_id"):
        out[doc_id] = (
            grp.sort_values("sig_idx")["minhash"].to_numpy().copy()
        )
    return out


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpus_st)
def test_lsh_candidates_are_exactly_band_collisions(spark, texts):
    """Banding contract, recomputed independently: (a, b) is a candidate
    iff some band of their signatures agrees component-wise."""
    from bigartm_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = _docs_df(spark, texts)
    sigs = _sig_matrix(minhash_signatures(docs).toPandas())
    n_bands = MINHASH_K // LSH_BAND_SIZE
    expected = set()
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            for band in range(n_bands):
                lo = band * LSH_BAND_SIZE
                if (
                    sigs[a][lo : lo + LSH_BAND_SIZE]
                    == sigs[b][lo : lo + LSH_BAND_SIZE]
                ).all():
                    expected.add((a, b, band))
    got = {
        (r["doc_a"], r["doc_b"], r["band"])
        for r in lsh_candidate_pairs(docs).collect()
    }
    assert got == expected


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpus_st)
def test_jaccard_estimate_is_signature_agreement_fraction(spark, texts):
    from bigartm_spark.operators.dedup import (
        minhash_jaccard_estimate,
        minhash_signatures,
    )

    docs = _docs_df(spark, texts)
    sigs = _sig_matrix(minhash_signatures(docs).toPandas())
    for r in minhash_jaccard_estimate(docs).collect():
        frac = float(
            (sigs[r["doc_a"]] == sigs[r["doc_b"]]).sum() / MINHASH_K
        )
        assert r["est_jaccard"] == pytest.approx(frac)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpus_st, spaces=st.lists(st.integers(1, 3), min_size=1, max_size=4))
def test_signatures_are_set_semantics_and_exact_dups_collide_everywhere(
    spark, texts, spaces
):
    """Whitespace runs (empty words) never change a signature; a byte-
    identical duplicate has an identical signature and therefore
    collides in every band."""
    from bigartm_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    base = texts[0]
    noisy = base
    for k in spaces:  # inject runs of extra spaces at word boundaries
        parts = noisy.split(" ")
        noisy = (" " * k).join(parts)
    rows = [(0, base), (1, noisy), (2, base)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = _sig_matrix(minhash_signatures(docs).toPandas())
    np.testing.assert_array_equal(sigs[0], sigs[1])
    np.testing.assert_array_equal(sigs[0], sigs[2])
    n_bands = MINHASH_K // LSH_BAND_SIZE
    got = {
        (r["doc_a"], r["doc_b"], r["band"])
        for r in lsh_candidate_pairs(docs).collect()
    }
    for band in range(n_bands):  # exact dup -> every band collides
        assert (0, 2, band) in got


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpus_st)
def test_stream_batch_signature_equality(spark, texts):
    """The streaming row-local minhash columns equal the batch explode+
    groupBy aggregation on the same corpus (re-pinned as a property
    after the r6 numeric-shingle rewrite)."""
    from bigartm_spark.operators.dedup import _minhash_wide
    from bigartm_spark.streaming.dedup import row_minhash_cols

    docs = _docs_df(spark, texts)
    batch = (
        _minhash_wide(docs)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    stream = (
        docs.select("doc_id", *row_minhash_cols())
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    # batch path drops docs with no shingles entirely; row-local keeps
    # the row — compare on the docs both emit
    common = batch.index.intersection(stream.index)
    assert len(common) == len(batch)
    for col in batch.columns:
        np.testing.assert_array_equal(
            batch.loc[common, col].to_numpy(),
            stream.loc[common, col].to_numpy(),
            err_msg=col,
        )


def test_band_collision_rate_matches_analytic_probability(spark):
    """Fixed-seed statistical check of the textbook LSH S-curve: a pair
    sharing a fraction s of its shingle set collides in >= 1 band with
    probability 1 - (1 - s^r)^b (r = band size, b = bands). Engineered
    pairs at s in {0.3, 0.7, 0.9}, 120 pairs each, tolerance +-0.12 —
    wide enough to be deterministic-stable, tight enough to catch a
    banding bug (e.g. bands overlapping rows or a constant signature
    column collapses the curve)."""
    from bigartm_spark.operators.dedup import lsh_candidate_pairs

    rng = np.random.default_rng(7)
    n_pairs, shingle_n = 120, 3
    rows, expected_rate = [], {}
    pair_meta = []
    # Build pairs as word sequences with a shared prefix: shingles are
    # runs of 3 words, so sharing the first (m + 2) words of a doc with
    # L + 2 words shares m of its L shingles.
    for s in (0.3, 0.7, 0.9):
        L = 20  # shingles per doc
        m = int(round(s * L))
        for p in range(n_pairs):
            base = rng.integers(0, 1_000_000, size=L + 2)
            alt = base.copy()
            # diverge after the shared prefix: fresh words, disjoint pool
            alt[m + 2 :] = rng.integers(1_000_000, 2_000_000, size=L - m)
            a_id = len(rows)
            rows.append((a_id, " ".join(f"u{w}" for w in base)))
            b_id = len(rows)
            rows.append((b_id, " ".join(f"u{w}" for w in alt)))
            pair_meta.append((a_id, b_id, s))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(docs, n=shingle_n)
        .select("doc_a", "doc_b")
        .distinct()
        .collect()
    }
    r_, b_ = LSH_BAND_SIZE, MINHASH_K // LSH_BAND_SIZE
    for s in (0.3, 0.7, 0.9):
        # true Jaccard of the engineered pair: m shared of (2L - m) union
        m = int(round(s * 20))
        jac = m / (2 * 20 - m)
        analytic = 1.0 - (1.0 - jac**r_) ** b_
        hits = sum(
            1
            for (a, b, ss) in pair_meta
            if ss == s and ((a, b) in got or (b, a) in got)
        )
        rate = hits / n_pairs
        assert abs(rate - analytic) < 0.12, (s, jac, analytic, rate)
