"""Reference binary .dict dictionary format (sources/dict_pb.py):
round-trip, a hand-built fixture straight from the message spec
(messages.proto:555-568 + dictionary_operations.cc layout), and the
io.py auto-detection seams."""

from __future__ import annotations

import struct

import pytest

from bigartm_spark.schemas import DICTIONARY_SCHEMA
from bigartm_spark.sources.dict_pb import read_dict_file, write_dict_file
from bigartm_spark.sources.io import export_dictionary, import_dictionary


def _spec_fixture_bytes() -> bytes:
    """A .dict built by hand from the wire spec, independent of our
    writer: version byte, then [len][DictionaryData] chunks."""

    def tag(fno, wt):
        return bytes([(fno << 3) | wt])

    def s(fno, txt):
        b = txt.encode()
        return tag(fno, 2) + bytes([len(b)]) + b

    def f32(fno, x):
        return tag(fno, 5) + struct.pack("<f", x)

    def vint(fno, v):
        return tag(fno, 0) + bytes([v])  # small values only

    token_chunk = (
        s(1, "fixture")
        + s(2, "alpha")
        + s(2, "beta")
        + s(3, "@default_class")
        + s(3, "@default_class")
        + f32(4, 0.25)
        + f32(4, 0.75)
        + f32(5, 2.0)
        + f32(5, 6.0)
        + f32(6, 1.0)
        + f32(6, 2.0)
        + vint(10, 7)
    )
    cooc_chunk = (
        vint(7, 0)
        + vint(7, 1)
        + vint(8, 1)
        + vint(8, 0)
        + f32(9, 3.5)
        + f32(9, 3.5)
        + f32(11, 4.0)
        + f32(11, 4.0)
        + f32(12, 2.0)
        + f32(12, 2.0)
    )
    out = b"\x00"
    for chunk in (token_chunk, cooc_chunk):
        out += struct.pack("<i", len(chunk)) + chunk
    return out


def test_read_spec_fixture(spark, tmp_path):
    p = str(tmp_path / "fixture.dict")
    with open(p, "wb") as f:
        f.write(_spec_fixture_bytes())
    d, cooc, meta = read_dict_file(spark, p)
    assert meta == {"name": "fixture", "num_items_in_collection": 7}
    rows = {r["token"]: r for r in d.collect()}
    assert set(rows) == {"alpha", "beta"}
    assert rows["alpha"]["value"] == pytest.approx(0.25)
    assert rows["beta"]["tf"] == pytest.approx(6.0)
    assert rows["beta"]["df"] == pytest.approx(2.0)
    crows = sorted(
        (r["token_a"], r["token_b"], r["cooc_value"], r["cooc_tf"])
        for r in cooc.collect()
    )
    assert crows == [
        ("alpha", "beta", 3.5, 4.0),
        ("beta", "alpha", 3.5, 4.0),
    ]


def test_round_trip_with_cooc(spark, tmp_path):
    d = spark.createDataFrame(
        [
            ("@default_class", "apple", 0.5, 10.0, 3.0),
            ("@default_class", "pear", 0.3, 6.0, 2.0),
            ("labels", "pos", 0.2, 4.0, 4.0),
        ],
        DICTIONARY_SCHEMA,
    )
    cooc = spark.createDataFrame(
        [("apple", "pear", 1.25, 5.0, 2.0)],
        "token_a string, token_b string, cooc_value double, "
        "cooc_tf double, cooc_df double",
    )
    p = str(tmp_path / "rt.dict")
    write_dict_file(d, p, name="rt", num_items_in_collection=42, cooc=cooc)
    d2, cooc2, meta = read_dict_file(spark, p)
    assert meta["name"] == "rt"
    assert meta["num_items_in_collection"] == 42
    got = sorted(
        (r["class_id"], r["token"], round(r["value"], 6), r["tf"], r["df"])
        for r in d2.collect()
    )
    assert got == [
        ("@default_class", "apple", 0.5, 10.0, 3.0),
        ("@default_class", "pear", pytest.approx(0.3), 6.0, 2.0),
        ("labels", "pos", pytest.approx(0.2), 4.0, 4.0),
    ]
    # both directions of the canonical pair, tf/df carried
    crows = sorted(
        (r["token_a"], r["token_b"], r["cooc_value"], r["cooc_df"])
        for r in cooc2.collect()
    )
    assert crows == [
        ("apple", "pear", 1.25, 2.0),
        ("pear", "apple", 1.25, 2.0),
    ]


def test_io_auto_detection(spark, tmp_path):
    d = spark.createDataFrame(
        [("@default_class", "tok", 1.0, 2.0, 1.0)], DICTIONARY_SCHEMA
    )
    bin_path = str(tmp_path / "auto.dict")
    export_dictionary(d, bin_path, num_items_in_collection=3)
    back = import_dictionary(spark, bin_path)
    assert [f.name for f in back.schema.fields] == [
        f.name for f in DICTIONARY_SCHEMA.fields
    ]
    assert back.collect()[0]["token"] == "tok"
    pq_path = str(tmp_path / "pq")
    export_dictionary(d, pq_path)
    assert import_dictionary(spark, pq_path).count() == 1


def test_dict_rejects_bad_version_and_extension(spark, tmp_path):
    p = str(tmp_path / "bad.dict")
    with open(p, "wb") as f:
        f.write(b"\x01\x04\x00\x00\x00abcd")
    with pytest.raises(ValueError, match="version"):
        read_dict_file(spark, p)
    with pytest.raises(ValueError, match="extension"):
        read_dict_file(spark, str(tmp_path / "not_a_dict.bin"))


def test_fit_on_imported_dict(spark, docs, tmp_path):
    """A migrating user's flow: gather -> export .dict -> import -> fit."""
    from bigartm_spark.model.artm import ARTM
    from bigartm_spark.operators.dictionary import gather_dictionary, num_items

    d = gather_dictionary(docs)
    p = str(tmp_path / "corpus.dict")
    export_dictionary(
        d, p, num_items_in_collection=num_items(docs)
    )
    d2 = import_dictionary(spark, p)
    m = ARTM(num_topics=3, num_document_passes=1, seed=5)
    m.initialize(d2)
    m.fit_offline(docs, num_collection_passes=1)
    assert all(v > 0 for v in m.score_tracker["perplexity"])


def test_load_batches_format_param(spark, docs, tmp_path):
    from bigartm_spark.sources.io import load_batches, save_batches

    p = str(tmp_path / "store")
    save_batches(docs, p)
    implicit = load_batches(spark, p)
    explicit = load_batches(spark, p, format="parquet")
    assert implicit.count() == explicit.count() == docs.count()
    with pytest.raises(ValueError, match="unknown batch format"):
        load_batches(spark, p, format="avro")
