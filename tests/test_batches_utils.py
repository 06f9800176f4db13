"""BatchVectorizer facade (reference batches_utils.py:45-128): one
constructor for every corpus format, weights, class filter, batch-store
persistence, and the default gathered dictionary."""

from __future__ import annotations

import numpy as np
import pytest

from bigartm_spark.sources.batches_utils import BatchVectorizer


@pytest.fixture(scope="module")
def tmpdir_mod(tmp_path_factory):
    return tmp_path_factory.mktemp("bv")


@pytest.fixture(scope="module")
def uci_dir(tmpdir_mod):
    d = tmpdir_mod / "uci"
    d.mkdir()
    (d / "docword.kos.txt").write_text(
        "2\n3\n6\n1 3 2\n1 1 5\n1 2 3\n2 3 7\n2 2 1\n2 1 4\n"
    )
    (d / "vocab.kos.txt").write_text("alpha\nbeta\ngamma\n")
    return str(d)


def test_bow_uci_with_dictionary(spark, uci_dir):
    bv = BatchVectorizer(
        spark, data_path=uci_dir, data_format="bow_uci", collection_name="kos"
    )
    assert bv.docs.count() == 6
    # .dictionary is the reference's Dictionary facade; the relation
    # stays available at .df
    d = {r.token: r.tf for r in bv.dictionary.df.collect()}
    assert d == {"alpha": 9.0, "beta": 4.0, "gamma": 9.0}


def test_vowpal_wabbit_and_target_folder(spark, tmpdir_mod):
    p = tmpdir_mod / "corpus.vw"
    p.write_text("doc1 hello world:2\ndoc2 hello:3 bye\n")
    store = str(tmpdir_mod / "store")
    bv = BatchVectorizer(
        spark,
        data_path=str(p),
        data_format="vowpal_wabbit",
        target_folder=store,
    )
    assert bv.docs.count() == 4
    # store round-trips through the batch reader
    bv2 = BatchVectorizer(spark, data_path=store, data_format="batches")
    assert bv2.docs.count() == 4
    rows = {r.token for r in bv2.docs.collect()}
    assert rows == {"hello", "world", "bye"}


def test_bow_n_wd(spark):
    n_wd = np.array([[2, 0], [0, 3]])
    bv = BatchVectorizer(
        spark, data_format="bow_n_wd", n_wd=n_wd, vocabulary=["a", "b"]
    )
    rows = {(r.doc_id, r.token): r.weight for r in bv.docs.collect()}
    assert rows == {(0, "a"): 2.0, (1, "b"): 3.0}


def test_weighted_multi_source_union(spark, uci_dir, tmpdir_mod):
    """data_weight multiplies token weight — batch_weight's entry point
    in the E-step math (processor_helpers.cc:180-215)."""
    bv = BatchVectorizer(
        spark,
        data_path=[uci_dir, uci_dir],
        data_format="bow_uci",
        collection_name="kos",
        data_weight=[1.0, 0.5],
    )
    assert bv.docs.count() == 12
    total = sum(r.weight for r in bv.docs.collect())
    assert total == pytest.approx(22.0 * 1.5)


def test_batch_size_rekeys_batch_id(spark, uci_dir):
    bv = BatchVectorizer(
        spark,
        data_path=uci_dir,
        data_format="bow_uci",
        collection_name="kos",
        batch_size=1,
    )
    ids = {r.doc_id: r.batch_id for r in bv.docs.collect()}
    assert ids == {1: "1", 2: "2"}
    # batches_ids are now the written .batch file names (reference
    # batches_utils.py:300-304); the re-keyed ids are the stems
    import os

    assert sorted(os.path.basename(p) for p in bv.batches_ids) == [
        "1.batch",
        "2.batch",
    ]
    assert bv.num_batches == 2
    assert all(os.path.isfile(p) for p in bv.batches_ids)


def test_fit_through_vectorizer(spark, uci_dir):
    """The facade output drives fit directly (BatchVectorizer -> ARTM is
    the reference's canonical two-liner)."""
    from bigartm_spark.model.artm import ARTM

    bv = BatchVectorizer(
        spark, data_path=uci_dir, data_format="bow_uci", collection_name="kos"
    )
    m = ARTM(num_topics=2, num_document_passes=2, seed=1)
    m.initialize(bv.dictionary)
    m.fit_offline(bv.docs, num_collection_passes=1)
    assert len(m.score_tracker["perplexity"]) == 1


def test_unknown_format_raises(spark):
    with pytest.raises(IOError):
        BatchVectorizer(spark, data_path="/nope", data_format="wat")
