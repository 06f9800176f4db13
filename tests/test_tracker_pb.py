"""Reference binary score-tracker files (ExportScoreTracker /
ImportScoreTracker wire format): spec fixture, round trip, io sniffing."""

from __future__ import annotations

import struct

import pytest


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


def test_read_wire_spec_fixture(tmp_path):
    """Hand-built two-entry stream independent of the codec: one
    PerplexityScore (value + raw + normalizer) and one SparsityPhiScore."""
    from bigartm_spark.sources.tracker_pb import read_score_tracker_file

    ppl = (
        _varint((1 << 3) | 5) + struct.pack("<f", 123.5)
        + _varint((2 << 3) | 1) + struct.pack("<d", -456.25)
        + _varint((3 << 3) | 1) + struct.pack("<d", 99.0)
    )
    sd1 = _ld(1, b"perplexity") + _varint((2 << 3) | 0) + _varint(0) + _ld(3, ppl)
    sp = _varint((1 << 3) | 5) + struct.pack("<f", 0.75)
    sd2 = _ld(1, b"sparsity_phi") + _varint((2 << 3) | 0) + _varint(2) + _ld(3, sp)
    p = tmp_path / "t.bin"
    p.write_bytes(
        b"\x00"
        + str(len(sd1)).encode() + sd1
        + str(len(sd2)).encode() + sd2
    )
    got = read_score_tracker_file(str(p))
    assert got["perplexity"] == pytest.approx([123.5])
    assert got["perplexity_raw"] == pytest.approx([-456.25])
    assert got["perplexity_normalizer"] == pytest.approx([99.0])
    assert got["sparsity_phi"] == pytest.approx([0.75])


def test_round_trip_multi_pass_tracker(tmp_path):
    from bigartm_spark.sources.tracker_pb import (
        read_score_tracker_file,
        write_score_tracker_file,
    )

    tracker = {
        "perplexity": [200.5, 150.25, 120.125],
        "perplexity_raw": [-1000.0, -900.5, -850.25],
        "perplexity_normalizer": [500.0, 500.0, 500.0],
        "sparsity_phi": [0.0, 0.25, 0.5],
        "items_processed": [1000.0, 1000.0, 1000.0],
        "my_custom_score": [1.5, 2.5, 3.5],  # -> Unknown + data_json
    }
    p = str(tmp_path / "rt.tracker")
    write_score_tracker_file(tracker, p)
    got = read_score_tracker_file(p)
    assert set(got) == set(tracker)
    for k, vals in tracker.items():
        assert got[k] == pytest.approx(vals, rel=1e-6)
    # per-pass lengths survive
    assert all(len(v) == 3 for v in got.values())


def test_io_layer_sniffing(tmp_path):
    """export/import_score_tracker: .tracker -> binary, else JSON; import
    sniffs by leading byte."""
    from bigartm_spark.sources.io import (
        export_score_tracker,
        import_score_tracker,
    )

    tracker = {"perplexity": [10.5, 9.25], "sparsity_theta": [0.5, 0.625]}
    binp = str(tmp_path / "t.tracker")
    jsonp = str(tmp_path / "t.json")
    export_score_tracker(tracker, binp)
    export_score_tracker(tracker, jsonp)
    assert open(binp, "rb").read(1) == b"\x00"
    assert open(jsonp, "rb").read(1) == b"{"
    got_b = import_score_tracker(binp)
    got_j = import_score_tracker(jsonp)
    assert got_j == tracker
    for k, vals in tracker.items():
        assert got_b[k] == pytest.approx(vals, rel=1e-6)
