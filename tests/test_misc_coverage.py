"""Coverage for the remaining small surfaces."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def test_dictionary_export_import(spark, docs, tmp_path):
    from bigartm_spark.operators.dictionary import gather_dictionary
    from bigartm_spark.sources.io import export_dictionary, import_dictionary

    d = gather_dictionary(docs)
    path = str(tmp_path / "dict")
    export_dictionary(d, path)
    back = import_dictionary(spark, path)
    assert back.count() == d.count()
    assert set(back.columns) == {"class_id", "token", "value", "tf", "df"}


def test_write_corpus_vw_roundtrip(spark, docs, tmp_path):
    from bigartm_spark.sources.io import write_corpus_vw
    from bigartm_spark.sources.vw import read_vowpal_wabbit

    subset = docs.filter(F.col("doc_id") < 20)
    path = str(tmp_path / "vw_out")
    write_corpus_vw(subset, path)
    back = read_vowpal_wabbit(spark, path)
    # token mass survives the round trip (weights re-parsed from :w)
    orig = subset.agg(F.sum("weight")).collect()[0][0]
    rt = back.agg(F.sum("weight")).collect()[0][0]
    assert abs(orig - rt) < 1e-6


def test_frame_sample_plan_video(spark):
    from bigartm_spark.operators.multimodal import frame_sample_plan

    media = spark.createDataFrame(
        [
            (1, "video", bytearray(b"v"), None, None, 3500),
            (2, "image", bytearray(b"i"), 8, 8, None),
        ],
        "asset_id long, media_type string, content binary, "
        "meta_width int, meta_height int, meta_duration_ms int",
    )
    plan = frame_sample_plan(media, every_ms=1000)
    rows = {(r["asset_id"], r["frame_ts_ms"]) for r in plan.collect()}
    assert rows == {(1, 0), (1, 1000), (1, 2000), (1, 3000), (2, 0)}


def test_hierarchy_sparsing_agent():
    from bigartm_spark.model.regularizers import HierarchySparsingTheta

    agent = HierarchySparsingTheta(tau=0.5)
    n_td = np.array([[4.0, 1.0, 1.0], [2.0, 2.0, 2.0]])
    out = agent.apply(None, n_td, 0)
    # below-uniform entries damped, above-uniform untouched
    np.testing.assert_allclose(out[0], [4.0, 0.5, 0.5])
    np.testing.assert_allclose(out[1], [2.0, 2.0, 2.0])
    # with doc ids: only pseudo-docs (<= -1_000_000) are damped — corpus
    # docs pass through untouched (reference gates on the parent-phi batch)
    n_td2 = np.array([[4.0, 1.0, 1.0], [4.0, 1.0, 1.0]])
    out2 = agent.apply(None, n_td2, 0, doc_ids=np.array([-1_000_000, 7]))
    np.testing.assert_allclose(out2[0], [4.0, 0.5, 0.5])
    np.testing.assert_allclose(out2[1], [4.0, 1.0, 1.0])
    assert agent.needs_doc_ids


def test_sparse_init_gate(spark):
    """E5 sparse init: dense_init_rate<1 + guaranteed_zeros_rate>0 zeroes
    some cells of low-tf rows and never touches high-tf rows."""
    from pyspark.sql import functions as F

    from bigartm_spark.model.init import initialize_phi

    rows = [("@default_class", f"tok{i:03d}", float(100 - i), 1.0) for i in range(40)]
    d = spark.createDataFrame(rows, "class_id string, token string, tf double, df double")
    phi = initialize_phi(
        d, [f"t{i}" for i in range(8)], seed=3,
        dense_init_rate=0.5, guaranteed_zeros_rate=0.8,
    )
    pdf = phi.compact.toPandas().set_index("token")
    n_zero = {t: sum(1 for v in pdf.loc[t, "values"] if v == 0.0) for t in pdf.index}
    # top-half tf tokens (rank <= 50%) keep a fully dense row
    assert all(n_zero[f"tok{i:03d}"] == 0 for i in range(20))
    # the sparse tail has zeroed cells somewhere
    assert sum(n_zero[f"tok{i:03d}"] for i in range(21, 40)) > 0
    # final phi is the M-step column-normalization: each topic sums to 1
    import numpy as np

    mat = np.stack(pdf["values"].to_numpy())
    np.testing.assert_allclose(mat.sum(axis=0), 1.0, atol=1e-9)


def test_peak_memory(spark):
    from bigartm_spark.model.scores import peak_memory_mb

    mb = peak_memory_mb(spark)
    assert mb > 0


def test_strict_decode_raises():
    import pytest

    from bigartm_spark.operators.multimodal import strict_decode

    with pytest.raises(NotImplementedError):
        strict_decode(b"x", "image")


def test_label_regularization_phi(spark):
    from bigartm_spark.model.mstep import topic_totals
    from bigartm_spark.model.phi import PhiMatrix
    from bigartm_spark.model.regularizers import (
        LabelRegularizationPhi,
        RegularizeContext,
    )

    rows = [("@default_class", "a", [0.6, 0.4]), ("@default_class", "b", [0.4, 0.6])]
    phi = PhiMatrix(
        "pwt",
        ["t0", "t1"],
        spark.createDataFrame(
            rows, "class_id string, token string, values array<double>"
        ),
    )
    ctx = RegularizeContext(topic_totals=topic_totals(phi))
    out = {
        r["token"]: list(r["values"])
        for r in LabelRegularizationPhi(tau=1.0)
        .rwt_delta(phi, phi, ctx)
        .collect()
    }
    # n_t = [1, 1]; row a: p*n = [0.6, 0.4], denom 1.0 -> delta = same
    np.testing.assert_allclose(out["a"], [0.6, 0.4], atol=1e-12)
    # deltas per row sum to tau (a proper distribution over topics)
    assert abs(sum(out["b"]) - 1.0) < 1e-12


def test_sql_api_views(spark, sf_dir):
    from bigartm_spark.corpus import register_views

    register_views(spark, sf_dir)
    out = spark.sql(
        """
        SELECT d.class_id, COUNT(DISTINCT d.token) AS vocab,
               SUM(d.weight) AS mass
        FROM docs d GROUP BY d.class_id
        """
    ).collect()
    assert len(out) == 1 and out[0]["vocab"] > 0
    # the raw tables are queryable too
    n = spark.sql("SELECT COUNT(*) AS n FROM lineitem").collect()[0]["n"]
    assert n > 0
    # real-text corpus view joins against documents metadata
    j = spark.sql(
        """
        SELECT COUNT(*) AS n FROM docs_text t
        JOIN documents m ON m.doc_id = t.doc_id
        WHERE m.lang = 'en'
        """
    ).collect()[0]["n"]
    assert j > 0


def test_resize_images_and_audio_chunks(spark):
    from bigartm_spark.operators.multimodal import (
        audio_chunk_plan,
        resize_images,
    )

    media = spark.createDataFrame(
        [
            (1, "image", bytearray(b"img-bytes"), 640, 480, None),
            (2, "audio", bytearray(b"wav-bytes"), None, None, 12_500),
            (3, "video", bytearray(b"mp4-bytes"), None, None, 3000),
        ],
        "asset_id long, media_type string, content binary, "
        "meta_width int, meta_height int, meta_duration_ms int",
    )
    resized = resize_images(media.filter("media_type = 'image'"), 4, 4)
    row = resized.collect()[0]
    assert row["out_width"] == 4 and len(row["pixels"]) == 16
    # deterministic across calls (fake decode is digest-based)
    again = resize_images(media.filter("media_type = 'image'"), 4, 4).collect()[0]
    assert list(row["pixels"]) == list(again["pixels"])

    chunks = {
        (r["asset_id"], r["chunk_start_ms"], r["chunk_end_ms"])
        for r in audio_chunk_plan(media, chunk_ms=5000).collect()
    }
    # audio: 12.5s -> [0,5000),[5000,10000),[10000,12500); others 1 row
    assert (2, 0, 5000) in chunks and (2, 10000, 12500) in chunks
    assert len([c for c in chunks if c[0] == 2]) == 3
    assert len([c for c in chunks if c[0] == 1]) == 1


def test_write_corpus_vw_groups_modalities(spark, tmp_path):
    """|class is a modality SWITCH (collection_parser.cc:595-623): a
    default-class token serialized after a modality token must still
    re-read as @default_class. Regression for the one-pipe-per-token
    writer, which re-classed every default token that followed a
    modality token."""
    from bigartm_spark.schemas import DOCS_SCHEMA
    from bigartm_spark.sources.io import write_corpus_vw
    from bigartm_spark.sources.vw import read_vowpal_wabbit

    rows = [
        (1, "doc1", "0", "@default_class", "hello", 1.0, 0, None, None),
        (1, "doc1", "0", "author", "alex", 3.0, 1, None, None),
        (1, "doc1", "0", "@default_class", "world", 2.0, 2, None, None),
        (2, "doc2", "0", "label", "pos", 1.0, 0, None, None),
    ]
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    path = str(tmp_path / "vw_grouped")
    write_corpus_vw(docs, path)
    back = read_vowpal_wabbit(spark, path)
    got = sorted(
        (r.title, r.class_id, r.token, r.weight) for r in back.collect()
    )
    assert got == sorted(
        [
            ("doc1", "@default_class", "hello", 1.0),
            ("doc1", "author", "alex", 3.0),
            ("doc1", "@default_class", "world", 2.0),
            ("doc2", "label", "pos", 1.0),
        ]
    )


def test_write_corpus_vw_transactions_roundtrip(spark, tmp_path):
    """Typed transactions survive the VW re-export: same-transaction
    tokens stay grouped under one ||type segment (grammar
    collection_parser.cc:595-666)."""
    from bigartm_spark.schemas import DOCS_SCHEMA
    from bigartm_spark.sources.io import write_corpus_vw
    from bigartm_spark.sources.vw import read_vowpal_wabbit

    rows = [
        (1, "doc1", "0", "@default_class", "plain", 1.0, 0, 0, "@default_transaction"),
        (1, "doc1", "0", "user", "mel", 3.0, 1, 1, "trans1"),
        (1, "doc1", "0", "action", "click", 3.0, 2, 1, "trans1"),
        (1, "doc1", "0", "user", "mel", 1.0, 3, 2, "trans1"),
        (1, "doc1", "0", "action", "show", 1.0, 4, 2, "trans1"),
    ]
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    path = str(tmp_path / "vw_tx")
    write_corpus_vw(docs, path)
    back = read_vowpal_wabbit(spark, path)
    got = back.collect()
    by_tok = {}
    for r in got:
        by_tok.setdefault((r.class_id, r.token, r.weight), []).append(r)
    assert by_tok[("@default_class", "plain", 1.0)][0].transaction_typename == "@default_transaction"
    # both trans1 transactions distinct, each pairing user with action
    tx_ids = {}
    for r in got:
        if r.transaction_typename == "trans1":
            tx_ids.setdefault(r.transaction_id, set()).add((r.class_id, r.token, r.weight))
    assert len(tx_ids) == 2
    assert {("user", "mel", 3.0), ("action", "click", 3.0)} in tx_ids.values()
    assert {("user", "mel", 1.0), ("action", "show", 1.0)} in tx_ids.values()


def test_cooc_gather_asymmetric_storage(spark):
    """symmetric=False writes both orientations with equal counts (the
    reference storage default; --store-symmetric-cooc suppresses the
    mirrored rows, srcmain.cc:1788)."""
    from bigartm_spark.operators.cooc import cooc_gather
    from bigartm_spark.schemas import DOCS_SCHEMA

    rows = [
        (1, "d1", "0", "@default_class", "a", 1.0, 1, None, None),
        (1, "d1", "0", "@default_class", "b", 1.0, 2, None, None),
    ]
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    sym = {(r.token_a, r.token_b): r.cooc_tf
           for r in cooc_gather(docs, window=2).collect()}
    assert sym == {("a", "b"): 1.0}
    asym = {(r.token_a, r.token_b): r.cooc_tf
            for r in cooc_gather(docs, window=2, symmetric=False).collect()}
    assert asym == {("a", "b"): 1.0, ("b", "a"): 1.0}


def test_line_dedup_metachar_separator(spark):
    """Separators containing regex metacharacters split literally
    (F.split takes a Java regex; the sep is \\Q-quoted)."""
    from bigartm_spark.operators.dedup import line_dedup

    docs = spark.createDataFrame(
        [(1, "first line.second line.first line"),
         (2, "first line.third line")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in
           line_dedup(docs, sep=".", min_line_chars=3).collect()}
    assert out[1] == "first line.second line"
    assert out[2] == "third line"
