"""Reference .batch protobuf importer (messages.proto:26-74;
helpers.cc SaveMessage = raw SerializeToOstream, no framing)."""

from __future__ import annotations

import struct

from bigartm_spark.sources.batch_pb import (
    batch_to_rows,
    parse_batch,
    parse_item,
    serialize_batch,
)


def _sample_batch() -> dict:
    """Shape collection_parser.cc:225-303 writes for regular text:
    per-batch token/class tables, one Item per doc, token_id indexes the
    batch tables, transaction_start_index = 0..n + trailing total."""
    return {
        "token": ["apple", "banana", "cherry"],
        "class_id": ["@default_class", "@default_class", "@labels"],
        "item": [
            {
                "id": 7,
                "title": "doc7",
                "token_id": [0, 1, 2],
                "token_weight": [2.0, 1.0, 3.0],
                "transaction_start_index": [0, 1, 2, 3],
                "transaction_typename_id": [0, 0, 0],
            },
            {
                "id": 8,
                "title": None,
                "token_id": [1],
                "token_weight": [5.0],
                "transaction_start_index": [0, 1],
                "transaction_typename_id": [0],
            },
        ],
        "description": None,
        "id": "b-0001",
        "transaction_typename": ["@default_transaction"],
    }


def test_round_trip():
    b = _sample_batch()
    buf = serialize_batch(b)
    out = parse_batch(buf)
    assert out["token"] == b["token"]
    assert out["class_id"] == b["class_id"]
    assert out["id"] == "b-0001"
    assert out["transaction_typename"] == ["@default_transaction"]
    assert len(out["item"]) == 2
    it = out["item"][0]
    assert it["id"] == 7 and it["title"] == "doc7"
    assert it["token_id"] == [0, 1, 2]
    assert it["token_weight"] == [2.0, 1.0, 3.0]
    assert it["transaction_start_index"] == [0, 1, 2, 3]


def test_packed_decoding():
    """proto2 parsers must accept packed repeated scalars even when the
    schema default is unpacked — craft an Item with packed fields."""
    out = bytearray()
    out += bytes([0x08, 0x07])  # field 1 varint id=7
    # field 4 (token_id), wire 2 packed: varints 0,1,2
    out += bytes([0x22, 0x03, 0x00, 0x01, 0x02])
    # field 5 (token_weight), wire 2 packed: two floats
    floats = struct.pack("<2f", 1.5, 2.5)
    out += bytes([0x2A, len(floats)]) + floats
    it = parse_item(bytes(out))
    assert it["id"] == 7
    assert it["token_id"] == [0, 1, 2]
    assert it["token_weight"] == [1.5, 2.5]


def test_batch_to_rows():
    rows = batch_to_rows(serialize_batch(_sample_batch()), "fallback")
    assert len(rows) == 4
    r0 = rows[0]
    # (doc_id, title, batch_id, class_id, token, weight, pos, tx, tt)
    assert r0 == (
        7, "doc7", "b-0001", "@default_class", "apple", 2.0, 1, 0,
        "@default_transaction",
    )
    assert rows[2][3] == "@labels" and rows[2][4] == "cherry"
    # missing title falls back to str(doc_id)
    assert rows[3][0] == 8 and rows[3][1] == "8" and rows[3][5] == 5.0


def test_read_batch_folder_and_load_batches(spark, tmp_path):
    d = tmp_path / "batches"
    d.mkdir()
    b = _sample_batch()
    (d / "b-0001.batch").write_bytes(serialize_batch(b))
    b2 = dict(b, id=None)  # id falls back to the file stem
    b2["item"] = [dict(b["item"][0], id=9, title="doc9")]
    (d / "deadbeef.batch").write_bytes(serialize_batch(b2))

    from bigartm_spark.sources.batch_pb import read_batch_folder
    from bigartm_spark.sources.io import load_batches
    from bigartm_spark.schemas import DOCS_SCHEMA

    df = read_batch_folder(spark, str(d))
    assert df.schema == DOCS_SCHEMA
    rows = {(r["doc_id"], r["token"]): r for r in df.collect()}
    assert len(rows) == 7
    assert rows[(7, "apple")]["weight"] == 2.0
    assert rows[(7, "apple")]["batch_id"] == "b-0001"
    assert rows[(9, "apple")]["batch_id"] == "deadbeef"

    # load_batches sniffs the protobuf format
    via_loader = load_batches(spark, str(d))
    assert via_loader.count() == 7

    # ... and the model fits directly on the imported relation
    from bigartm_spark.model.artm import ARTM
    from bigartm_spark.operators.dictionary import gather_dictionary

    m = ARTM(num_topics=2, num_document_passes=2, seed=1)
    m.initialize(gather_dictionary(df))
    m.fit_offline(df, num_collection_passes=1)
    assert m.score_tracker["perplexity"][0] > 0


def test_write_batch_folder_round_trip(spark, tmp_path):
    """Export long docs as reference .batch files, re-import, and get the
    identical relation (the full migration round trip)."""
    from pyspark.sql import functions as F

    from bigartm_spark.schemas import DOCS_SCHEMA
    from bigartm_spark.sources.batch_pb import (
        read_batch_folder,
        write_batch_folder,
    )

    rows = []
    for d in range(12):
        for p in range(1, 5):
            rows.append(
                (
                    d, f"doc{d}", f"b{d % 3}",
                    "@default_class" if p < 4 else "@labels",
                    # transaction_id is 0-based per doc: the proto stores
                    # only transaction RUNS, so readback renumbers from 0
                    f"tok{(d + p) % 5}", float(p), p, p - 1,
                    "@default_transaction",
                )
            )
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    out_dir = str(tmp_path / "pb_out")
    paths = write_batch_folder(docs, out_dir)
    assert sorted(paths) == [f"{out_dir}/b{i}.batch" for i in range(3)]

    back = read_batch_folder(spark, out_dir)
    a = sorted(map(tuple, docs.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_dictionary_cooc_export_round_trip(spark, tmp_path):
    """A9 with embedded cooc stats: export_dictionary(cooc=) and read
    both back (dictionary.h embeds cooc in the reference's dictionary)."""
    from bigartm_spark.schemas import COOC_SCHEMA, DICTIONARY_SCHEMA
    from bigartm_spark.sources.io import (
        export_dictionary,
        import_cooc,
        import_dictionary,
    )

    d = spark.createDataFrame(
        [("@default_class", "a", 0.5, 10.0, 3.0),
         ("@default_class", "b", 0.5, 6.0, 2.0)],
        DICTIONARY_SCHEMA,
    )
    cooc = spark.createDataFrame(
        [("a", "b", 1.0, 4.0, 2.0)], COOC_SCHEMA
    )
    path = str(tmp_path / "dict_exp")
    export_dictionary(d, path, cooc=cooc)
    d2 = import_dictionary(spark, path)
    c2 = import_cooc(spark, path)
    assert sorted(map(tuple, d.collect())) == sorted(map(tuple, d2.collect()))
    assert sorted(map(tuple, cooc.collect())) == sorted(map(tuple, c2.collect()))
    # absent cooc -> None
    path2 = str(tmp_path / "dict_exp2")
    export_dictionary(d, path2)
    assert import_cooc(spark, path2) is None
    # scheme-qualified store path (file:// URI): the presence check must
    # go through the Hadoop FS API — a local-filesystem glob would see
    # no such directory and silently drop the cooc relation
    c3 = import_cooc(spark, f"file://{path}")
    assert c3 is not None
    assert sorted(map(tuple, cooc.collect())) == sorted(map(tuple, c3.collect()))
    assert import_cooc(spark, f"file://{path2}") is None


def test_codec_property_round_trip():
    """Property test: arbitrary unicode tokens / weights / ids survive
    the wire round trip byte-exactly (float32 weights compared as f32)."""
    import struct as _struct

    from hypothesis import given, settings, strategies as st

    token = st.text(min_size=0, max_size=30)
    item = st.fixed_dictionaries(
        {
            "id": st.integers(min_value=0, max_value=2**31 - 1),
            "title": st.one_of(st.none(), st.text(max_size=20)),
            "token_id": st.lists(
                st.integers(min_value=0, max_value=100), max_size=20
            ),
            "token_weight": st.lists(
                st.floats(
                    min_value=0, max_value=1e6, allow_nan=False, width=32
                ),
                max_size=20,
            ),
            "transaction_start_index": st.lists(
                st.integers(min_value=0, max_value=100), max_size=20
            ),
            "transaction_typename_id": st.lists(
                st.integers(min_value=0, max_value=10), max_size=20
            ),
        }
    )
    batch = st.fixed_dictionaries(
        {
            "token": st.lists(token, max_size=10),
            "class_id": st.lists(token, max_size=10),
            "item": st.lists(item, max_size=5),
            "description": st.one_of(st.none(), st.text(max_size=10)),
            "id": st.one_of(st.none(), st.text(min_size=1, max_size=16)),
            "transaction_typename": st.lists(token, max_size=3),
        }
    )

    def f32(x):
        return _struct.unpack("<f", _struct.pack("<f", x))[0]

    @settings(max_examples=150, deadline=None)
    @given(batch)
    def check(b):
        out = parse_batch(serialize_batch(b))
        assert out["token"] == b["token"]
        assert out["class_id"] == b["class_id"]
        assert out["id"] == b["id"]
        assert out["description"] == b["description"]
        assert out["transaction_typename"] == b["transaction_typename"]
        assert len(out["item"]) == len(b["item"])
        for got, want in zip(out["item"], b["item"]):
            assert got["id"] == want["id"]
            assert got["title"] == want["title"]
            assert got["token_id"] == want["token_id"]
            assert got["token_weight"] == [f32(w) for w in want["token_weight"]]
            assert got["transaction_start_index"] == want["transaction_start_index"]
            assert got["transaction_typename_id"] == want["transaction_typename_id"]

    check()
