"""Parser + persistence tests (fixtures written in-test, formats per
reference test_data/ layouts — SURVEY.md §5.3)."""

from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="module")
def tmpdir_mod(tmp_path_factory):
    return tmp_path_factory.mktemp("sources")


def test_uci_roundtrip(spark, tmpdir_mod):
    from bigartm_spark.sources.uci import read_uci

    docword = tmpdir_mod / "docword.test.txt"
    vocab = tmpdir_mod / "vocab.test.txt"
    docword.write_text("2\n3\n6\n1 3 2\n1 1 5\n1 2 3\n2 3 7\n2 2 1\n2 1 4\n")
    vocab.write_text("alpha\nbeta\ngamma custom_class\n")
    docs = read_uci(spark, str(docword), str(vocab))
    rows = {(r.doc_id, r.token): (r.class_id, r.weight) for r in docs.collect()}
    assert rows[(1, "alpha")] == ("@default_class", 5.0)
    assert rows[(2, "gamma")] == ("custom_class", 7.0)
    assert len(rows) == 6


def test_uci_skips_comments_and_zero_weight(spark, tmpdir_mod):
    from bigartm_spark.sources.uci import read_uci

    docword = tmpdir_mod / "docword.c.txt"
    vocab = tmpdir_mod / "vocab.c.txt"
    docword.write_text("1\n2\n3\n% a comment\n1 1 2\n1 2 0\n")
    vocab.write_text("a\nb\n")
    docs = read_uci(spark, str(docword), str(vocab))
    assert docs.count() == 1  # zero-weight dropped, comment ignored


def test_vw_modalities_and_weights(spark, tmpdir_mod):
    from bigartm_spark.sources.vw import read_vowpal_wabbit

    p = tmpdir_mod / "vw.txt"
    p.write_text(
        "doc1 hello world:2 |author alex:3\n"
        "doc2 |author noname |@default_class hello:5\n"
    )
    docs = read_vowpal_wabbit(spark, str(p))
    rows = {(r.title, r.class_id, r.token): r.weight for r in docs.collect()}
    assert rows[("doc1", "@default_class", "hello")] == 1.0
    assert rows[("doc1", "@default_class", "world")] == 2.0
    assert rows[("doc1", "author", "alex")] == 3.0
    assert rows[("doc2", "author", "noname")] == 1.0
    assert rows[("doc2", "@default_class", "hello")] == 5.0


def test_vw_transactions(spark, tmpdir_mod):
    from bigartm_spark.sources.vw import read_vowpal_wabbit

    p = tmpdir_mod / "vw_trans.txt"
    p.write_text(
        "doc1 hello ||trans1 |user mel:3 |action click:3 || |user mel |action show ||\n"
    )
    docs = read_vowpal_wabbit(spark, str(p))
    rows = docs.collect()
    by_tok = {}
    for r in rows:
        by_tok.setdefault((r.class_id, r.token), []).append(r)
    # 'hello' is in the default transaction type
    assert by_tok[("@default_class", "hello")][0].transaction_typename == "@default_transaction"
    # user:mel appears in two distinct trans1 transactions
    mel = by_tok[("user", "mel")]
    assert all(r.transaction_typename == "trans1" for r in mel)
    assert len({r.transaction_id for r in mel}) == 2
    # weights parsed inside transactions
    assert any(r.weight == 3.0 for r in by_tok[("action", "click")])


def test_vw_repeated_token_singleton_transactions(spark, tmpdir_mod):
    """Plain tokens outside ``||`` blocks are singleton transactions
    (collection_parser.cc:728-732, pinned by the TransactionVowpalWabbit
    port) — repeats stay separate instances; weights only accumulate for
    duplicates inside one closed multi-token transaction."""
    from bigartm_spark.sources.vw import read_vowpal_wabbit

    p = tmpdir_mod / "vw_rep.txt"
    p.write_text("doc1 w w w:2.5 ||t1 a a:4 ||\n")
    docs = read_vowpal_wabbit(spark, str(p))
    rows = docs.collect()
    plain = [r for r in rows if r.token == "w"]
    assert sorted(r.weight for r in plain) == [1.0, 1.0, 2.5]
    assert len({r.transaction_id for r in plain}) == 3
    # inside the closed ||t1 ... || transaction the duplicate accumulates
    [a] = [r for r in rows if r.token == "a"]
    assert a.weight == 5.0 and a.transaction_typename == "t1"


def test_matrix_market(spark, tmpdir_mod):
    from bigartm_spark.sources.uci import read_matrix_market

    mm = tmpdir_mod / "m.mm"
    vocab = tmpdir_mod / "m.vocab.txt"
    mm.write_text(
        "%%MatrixMarket matrix coordinate real general\n"
        "2 3 4\n1 1 1\n1 2 2\n2 3 1\n2 1 3\n"
    )
    vocab.write_text("x\ny\nz\n")
    docs = read_matrix_market(spark, str(mm), str(vocab))
    rows = {(r.doc_id, r.token): r.weight for r in docs.collect()}
    assert rows == {(1, "x"): 1.0, (1, "y"): 2.0, (2, "z"): 1.0, (2, "x"): 3.0}


def test_model_export_import_roundtrip(spark, docs, tmpdir_mod):
    from bigartm_spark.model.init import initialize_phi
    from bigartm_spark.operators.dictionary import gather_dictionary
    from bigartm_spark.sources.io import export_model, import_model

    d = gather_dictionary(docs)
    phi = initialize_phi(d, ["t0", "t1", "t2"], seed=5)
    path = str(tmpdir_mod / "model")
    export_model(phi, path)
    back = import_model(spark, path)
    assert back.topics == phi.topics
    a = {(r.token, r.topic): r.value for r in phi.to_long().collect()}
    b = {(r.token, r.topic): r.value for r in back.to_long().collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert abs(a[k] - b[k]) < 1e-12


def test_batches_roundtrip(spark, docs, tmpdir_mod):
    from bigartm_spark.sources.io import load_batches, save_batches

    path = str(tmpdir_mod / "batches")
    save_batches(docs.limit(500), path, num_batches=4)
    back = load_batches(spark, path)
    assert back.count() == 500
    assert set(back.columns) == set(docs.columns)


def test_score_tracker_roundtrip(tmpdir_mod):
    from bigartm_spark.sources.io import (
        export_score_tracker,
        import_score_tracker,
    )

    t = {"perplexity": [3.0, 2.5], "sparsity_theta": [0.1, 0.2]}
    p = str(tmpdir_mod / "tracker.json")
    export_score_tracker(t, p)
    assert import_score_tracker(p) == t


def test_from_n_wd(spark):
    import numpy as np

    from bigartm_spark.sources.memory import from_n_wd, import_batches

    n_wd = np.array([[2, 0], [0, 3], [1, 1]])  # W=3 tokens, D=2 docs
    docs = from_n_wd(spark, n_wd, ["a", "b", "c"])
    rows = {(r.doc_id, r.token): r.weight for r in docs.collect()}
    assert rows == {(0, "a"): 2.0, (1, "b"): 3.0, (0, "c"): 1.0, (1, "c"): 1.0}
    more = from_n_wd(spark, np.array([[1], [1], [1]]), ["a", "b", "c"])
    combined = import_batches(docs, more)
    assert combined.count() == 7


def test_read_cooc_file(spark, tmp_path):
    """--read-cooc adjacency format (dictionary_operations.cc:100-190):
    modality markers, colon-separated values, symmetric mirroring."""
    from bigartm_spark.sources.cooc_file import (
        parse_cooc_line,
        read_cooc,
        to_cooc_relation,
    )

    assert parse_cooc_line("alpha beta:2.5 gamma:1") == [
        ("@default_class", "alpha", "@default_class", "beta", 2.5),
        ("@default_class", "alpha", "@default_class", "gamma", 1.0),
    ]
    assert parse_cooc_line("|@labels pos neg:3") == [
        ("@labels", "pos", "@labels", "neg", 3.0)
    ]
    assert parse_cooc_line("alpha |@labels pos:2") == [
        ("@default_class", "alpha", "@labels", "pos", 2.0)
    ]
    assert parse_cooc_line("") == []

    f = tmp_path / "cooc.txt"
    f.write_text("alpha beta:2.5 gamma:1\n|@labels pos neg:3\n\n")
    df = read_cooc(spark, str(f))
    rows = sorted(map(tuple, df.collect()))
    assert len(rows) == 3
    assert ("@default_class", "alpha", "@default_class", "beta", 2.5) in rows

    sym = read_cooc(spark, str(f), symmetric=True)
    assert sym.count() == 6

    rel = to_cooc_relation(df)
    got = sorted(map(tuple, rel.select("token_a", "token_b", "value").collect()))
    assert got == [("alpha", "beta", 2.5), ("alpha", "gamma", 1.0)]
