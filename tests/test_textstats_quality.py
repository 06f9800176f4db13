"""repetition_signals / pii_scan / pii_redact / semantic_dedup /
doc_perplexity unit semantics on hand-built rows (the synthetic corpus
contains no PII, so the regex behavior is pinned here; the driver oracle
pairs cover cross-engine value parity on the real tables)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigartm_spark.operators import similarity, textstats


@pytest.fixture(scope="module")
def pii_docs(spark):
    rows = [
        (0, "contact me at alice@example.com or bob.smith+x@mail.co today"),
        (1, "server 10.0.0.1 and 192.168.1.255 are up"),
        (2, "call +14155551234 now; ref 123456789"),
        (3, "clean text with no identifiers at all"),
        (4, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_scan_counts(pii_docs):
    got = {r["doc_id"]: r for r in textstats.pii_scan(pii_docs).collect()}
    assert got[0]["n_emails"] == 2 and got[0]["has_pii"] == 1
    assert got[1]["n_ipv4"] == 2
    assert got[2]["n_phones"] == 1
    # patterns scan independently: the phone's digit tail AND the ref
    # number are both long digit runs
    assert got[2]["n_long_digit_runs"] == 2
    assert got[3]["has_pii"] == 0
    assert got[4]["has_pii"] == 0


def test_pii_redact_replaces_all(pii_docs):
    red = {
        r["doc_id"]: r["redacted_text"]
        for r in textstats.pii_redact(pii_docs).collect()
    }
    assert "<EMAIL>" in red[0] and "@" not in red[0]
    assert red[1].count("<IP>") == 2 and "10.0.0.1" not in red[1]
    assert "<PHONE>" in red[2] and "<NUM>" in red[2]
    assert red[3] == "clean text with no identifiers at all"


def test_repetition_signals_shapes(spark):
    rows = [
        (0, "a b a b a b"),  # bigrams: ab ba ab ba ab -> top 'a b' x3 of 5
        (1, "w x y z"),  # all distinct
        (2, "solo"),  # no bigram
        (3, ""),  # empty
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r for r in textstats.repetition_signals(docs).collect()
    }
    assert got[0]["n_bigrams"] == 5
    assert got[0]["top_bigram_count"] == 3
    assert got[0]["top_bigram_frac"] == pytest.approx(0.6)
    assert got[1]["distinct_bigram_ratio"] == pytest.approx(1.0)
    assert got[2]["n_bigrams"] == 0 and got[2]["top_bigram_frac"] == 0.0
    assert got[3]["n_bigrams"] == 0  # empty doc kept, zeroed


def test_semantic_dedup_drops_near_identical(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randn(6, 8).astype("float32")
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v], 0))
    # vec 100 is a near-copy of vec 0 -> must be dropped (0 survives)
    rows.append((100, [float(x) for x in base[0] * 1.001], 0))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    cents = similarity.seed_centroids(emb, 2)
    surv = similarity.semantic_dedup(emb, cents, threshold=0.95)
    ids = {r["vec_id"] for r in surv.select("vec_id").collect()}
    assert 0 in ids
    assert 100 not in ids
    assert len(ids) == 6  # only the copy was dropped


def test_doc_perplexity_uniform_phi_equals_vocab_size(spark):
    """With p_wd identical for every token (uniform phi), per-doc ppl
    reduces to 1/p_wd = |vocab| exactly — an analytic pin."""
    from bigartm_spark.model.phi import PhiMatrix
    from bigartm_spark.model.scores import doc_perplexity

    rows = [
        (0, "@default_class", "apple", 2.0),
        (0, "@default_class", "pear", 1.0),
        (1, "@default_class", "plum", 4.0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, class_id string, token string, weight double"
    )
    topics = ["t0", "t1"]
    phi_rows = [
        ("@default_class", t, [1.0 / 3, 1.0 / 3]) for t in ("apple", "pear", "plum")
    ]
    compact = spark.createDataFrame(
        phi_rows, "class_id string, token string, values array<double>"
    )
    phi = PhiMatrix("pwt", topics, compact)
    got = {r["doc_id"]: r["doc_ppl"] for r in doc_perplexity(docs, phi).collect()}
    assert got[0] == pytest.approx(3.0, rel=1e-9)
    assert got[1] == pytest.approx(3.0, rel=1e-9)
