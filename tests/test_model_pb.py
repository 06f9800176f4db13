"""Reference binary model files (ExportModel/ImportModel,
master_component.cc:369-505): wire-spec fixture decode, round-trip,
multi-chunk accumulation, dense-chunk acceptance, io-layer sniffing."""

from __future__ import annotations

import struct

import pytest

from bigartm_spark.model.phi import PhiMatrix


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _ld(fno: int, payload: bytes) -> bytes:
    return _varint((fno << 3) | 2) + _varint(len(payload)) + payload


def _s(fno: int, s: str) -> bytes:
    return _ld(fno, s.encode())


def _float_array(fno: int, vals) -> bytes:
    inner = _ld(1, struct.pack(f"<{len(vals)}f", *vals))
    return _ld(fno, inner)


def _int_array(fno: int, vals) -> bytes:
    inner = _ld(1, b"".join(_varint(v) for v in vals))
    return _ld(fno, inner)


def _spec_file() -> bytes:
    """Hand-built two-chunk sparse model, independent of the codec under
    test: topics (t0, t1, t2); chunk 1 has tokens a (values t0=1.5,
    t2=0.25) and b (t1=2.0); chunk 2 has token c (t0=0.5, t1=0.75)."""
    chunk1 = (
        _s(1, "pwt")
        + _varint((2 << 3) | 0) + _varint(3)
        + _s(3, "t0") + _s(3, "t1") + _s(3, "t2")
        + _s(4, "a") + _s(4, "b")
        + _float_array(5, [1.5, 0.25]) + _float_array(5, [2.0])
        + _s(6, "@default_class") + _s(6, "@default_class")
        + _int_array(8, [0, 2]) + _int_array(8, [1])
    )
    chunk2 = (
        _s(1, "pwt")
        + _varint((2 << 3) | 0) + _varint(3)
        + _s(3, "t0") + _s(3, "t1") + _s(3, "t2")
        + _s(4, "c")
        + _float_array(5, [0.5, 0.75])
        + _s(6, "@default_class")
        + _int_array(8, [0, 1])
    )
    return (
        b"\x00"
        + str(len(chunk1)).encode() + chunk1
        + str(len(chunk2)).encode() + chunk2
    )


def test_read_wire_spec_fixture(spark, tmp_path):
    from bigartm_spark.sources.model_pb import read_model_file

    p = tmp_path / "spec.bin"
    p.write_bytes(_spec_file())
    phi = read_model_file(spark, str(p))
    assert phi.name == "pwt"
    assert phi.topics == ["t0", "t1", "t2"]
    got = {
        r["token"]: r["values"] for r in phi.compact.collect()
    }
    assert got["a"] == pytest.approx([1.5, 0.0, 0.25])
    assert got["b"] == pytest.approx([0.0, 2.0, 0.0])
    assert got["c"] == pytest.approx([0.5, 0.75, 0.0])


def test_round_trip_preserves_values_f32(spark, tmp_path):
    from bigartm_spark.sources.model_pb import read_model_file, write_model_file

    rows = [
        ("@default_class", "alpha", [0.125, 0.0, 0.5]),
        ("@default_class", "beta", [0.0, 0.0625, 0.0]),
        ("@labels", "pos", [0.1, 0.2, 0.7]),
    ]
    phi = PhiMatrix(
        "pwt",
        ["t0", "t1", "t2"],
        spark.createDataFrame(
            rows, "class_id string, token string, values array<double>"
        ),
    )
    p = str(tmp_path / "m.bin")
    write_model_file(phi, p)
    phi2 = read_model_file(spark, p)
    assert phi2.topics == phi.topics
    a = {(r["class_id"], r["token"]): r["values"] for r in phi.compact.collect()}
    b = {(r["class_id"], r["token"]): r["values"] for r in phi2.compact.collect()}
    assert set(a) == set(b)
    for k in a:
        # float32 wire precision; exact for these dyadic values except 0.1/0.2/0.7
        assert b[k] == pytest.approx(a[k], rel=1e-6)
    # exact zeros were dropped on the wire (sparse layout) and restored
    assert b[("@default_class", "beta")][0] == 0.0


def test_dense_chunk_accepted(spark, tmp_path):
    """ApplyTopicModelOperation accepts a dense chunk (no topic_indices)."""
    from bigartm_spark.sources.model_pb import read_model_file

    chunk = (
        _s(1, "m") + _varint((2 << 3) | 0) + _varint(2)
        + _s(3, "t0") + _s(3, "t1")
        + _s(4, "x") + _float_array(5, [0.25, 0.75]) + _s(6, "@default_class")
    )
    p = tmp_path / "dense.bin"
    p.write_bytes(b"\x00" + str(len(chunk)).encode() + chunk)
    phi = read_model_file(spark, str(p))
    got = {r["token"]: r["values"] for r in phi.compact.collect()}
    assert got["x"] == pytest.approx([0.25, 0.75])


def test_bad_version_rejected(spark, tmp_path):
    from bigartm_spark.sources.model_pb import read_model_file

    p = tmp_path / "bad.bin"
    p.write_bytes(b"\x07junk")
    with pytest.raises(ValueError):
        read_model_file(spark, str(p))


def test_chunk_codec_property_round_trip():
    """Property test over the pure serialization layer (no Spark):
    arbitrary unicode tokens/classes and float32-exact weights survive
    serialize -> parse; exact zeros are dropped by the sparse layout."""
    from hypothesis import given, settings, strategies as st

    from bigartm_spark.sources.model_pb import (
        _parse_topic_model,
        _serialize_topic_model_chunk,
    )

    f32 = st.floats(
        min_value=2.0**-100, max_value=2.0**20, allow_nan=False, width=32
    )
    value = st.one_of(st.just(0.0), f32)
    row = st.tuples(
        st.text(min_size=0, max_size=12),
        st.text(min_size=0, max_size=20),
        st.lists(value, min_size=3, max_size=3),
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(row, min_size=0, max_size=8))
    def check(rows):
        buf = _serialize_topic_model_chunk(
            "m", ["t0", "t1", "t2"], rows, eps=1e-37
        )
        m = _parse_topic_model(buf)
        assert m["name"] == "m"
        assert m["topic_name"] == ["t0", "t1", "t2"]
        assert m["token"] == [tok for _, tok, _ in rows]
        assert m["class_id"] == [cls for cls, _, _ in rows]
        for k, (_, _, values) in enumerate(rows):
            expect = [
                (i, struct.unpack("<f", struct.pack("<f", v))[0])
                for i, v in enumerate(values)
                if abs(v) > 1e-37
            ]
            got = list(zip(m["topic_indices"][k], m["token_weights"][k]))
            assert [
                (i, pytest.approx(v, rel=1e-6)) for i, v in expect
            ] == got or got == expect

    check()


def test_io_layer_sniffing_and_fitted_model_round_trip(spark, docs, tmp_path):
    """export_model/.bin + import_model(file) carry a real fitted phi;
    parquet-dir behavior unchanged."""
    from bigartm_spark.model.artm import ARTM
    from bigartm_spark.operators.dictionary import gather_dictionary
    from bigartm_spark.sources.io import export_model, import_model

    m = ARTM(num_topics=3, num_document_passes=2, seed=5)
    m.initialize(gather_dictionary(docs))
    m.fit_offline(docs, num_collection_passes=1)

    binp = str(tmp_path / "fitted.bin")
    export_model(m.pwt, binp)
    back = import_model(spark, binp)
    assert back.topics == m.pwt.topics
    orig = {
        (r["class_id"], r["token"]): r["values"]
        for r in m.pwt.compact.collect()
    }
    got = {
        (r["class_id"], r["token"]): r["values"]
        for r in back.compact.collect()
    }
    assert set(orig) == set(got)
    for k, v in orig.items():
        assert got[k] == pytest.approx(v, rel=2e-6, abs=1e-30)

    pqdir = str(tmp_path / "fitted_pq")
    export_model(m.pwt, pqdir)
    back2 = import_model(spark, pqdir)
    assert back2.topics == m.pwt.topics
    assert back2.compact.count() == m.pwt.compact.count()
