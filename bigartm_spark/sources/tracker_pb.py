"""Reference binary score-tracker files (ExportScoreTracker /
ImportScoreTracker, src/artm/core/master_component.cc:497-570) — the
wire-level A10 so per-pass score history moves between engines.

Framing is the model-file pattern: one 0x00 version byte, then chunks
of [DECIMAL-TEXT length][ScoreData payload] (operator<< length
streaming, formatted re-extraction).

ScoreData (src/artm/messages.proto:261-266): 1 name, 2 type enum,
3 data (the serialized per-type score message), 4 data_json. Every
scalar score message keeps its headline number in `value = 1`
(float — except ItemsProcessedScore int32 and PeakMemoryScore int64);
PerplexityScore additionally carries raw(2 double) / normalizer(3
double) (messages.proto:285-305).

Our tracker is {score_name: [per-pass values]}; export emits one
ScoreData per (pass, score) in pass order, mapping known names onto
their reference ScoreType + message and anything else onto
ScoreType_Unknown with the value in data_json — nothing is dropped.
"""

from __future__ import annotations

import json
import struct

from bigartm_spark.sources.batch_pb import (
    _fields,
    _put_str,
    _tag,
    _write_varint,
)

SCORE_TYPES = {
    "perplexity": 0,
    "sparsity_theta": 1,
    "sparsity_phi": 2,
    "items_processed": 3,
    "top_tokens": 4,
    "theta_snippet": 5,
    "topic_kernel": 6,
    "topic_mass_phi": 7,
    "class_precision": 8,
    "peak_memory": 9,
    "background_tokens_ratio": 10,
}
_UNKNOWN = 9999
# auxiliary tracker keys folded into the PerplexityScore message rather
# than exported as their own entries
_PPL_AUX = ("perplexity_raw", "perplexity_normalizer")


def _float_field(out: bytearray, fno: int, v: float) -> None:
    _tag(out, fno, 5)
    out.extend(struct.pack("<f", float(v)))


def _double_field(out: bytearray, fno: int, v: float) -> None:
    _tag(out, fno, 1)
    out.extend(struct.pack("<d", float(v)))


def _score_payload(name: str, value: float, aux: dict) -> tuple[int, bytes, str | None]:
    """(type, data bytes, data_json) for one score value."""
    body = bytearray()
    if name == "perplexity":
        _float_field(body, 1, value)
        if "perplexity_raw" in aux:
            _double_field(body, 2, aux["perplexity_raw"])
        if "perplexity_normalizer" in aux:
            _double_field(body, 3, aux["perplexity_normalizer"])
        return SCORE_TYPES[name], bytes(body), None
    if name == "items_processed":
        _tag(body, 1, 0)
        _write_varint(body, int(value))
        return SCORE_TYPES[name], bytes(body), None
    if name == "peak_memory":
        _tag(body, 1, 0)
        _write_varint(body, int(value))
        return SCORE_TYPES[name], bytes(body), None
    if name in SCORE_TYPES:
        _float_field(body, 1, value)
        return SCORE_TYPES[name], bytes(body), None
    return _UNKNOWN, b"", json.dumps({"value": value})


def write_score_tracker_file(
    tracker: dict[str, list[float]], path: str
) -> None:
    names = [k for k in tracker if k not in _PPL_AUX]
    n_passes = max((len(v) for v in tracker.values()), default=0)
    with open(path, "wb") as f:
        f.write(b"\x00")
        for i in range(n_passes):
            for name in names:
                vals = tracker[name]
                if i >= len(vals):
                    continue
                aux = {
                    k: tracker[k][i]
                    for k in _PPL_AUX
                    if k in tracker and i < len(tracker[k])
                }
                stype, data, data_json = _score_payload(name, vals[i], aux)
                sd = bytearray()
                _put_str(sd, 1, name)
                _tag(sd, 2, 0)
                _write_varint(sd, stype)
                if data:
                    _tag(sd, 3, 2)
                    _write_varint(sd, len(data))
                    sd.extend(data)
                if data_json is not None:
                    _put_str(sd, 4, data_json)
                f.write(str(len(sd)).encode("ascii"))
                f.write(bytes(sd))


def _decode_value(stype: int, data: bytes, data_json: str | None):
    """headline value (+ perplexity aux dict) from a score payload."""
    aux: dict[str, float] = {}
    if data_json is not None and not data:
        try:
            return json.loads(data_json).get("value"), aux
        except (ValueError, AttributeError):
            return None, aux
    value = None
    for fno, wt, v in _fields(data):
        if fno == 1 and wt == 5:
            value = struct.unpack("<f", v)[0]
        elif fno == 1 and wt == 0:
            value = float(v)
        elif stype == SCORE_TYPES["perplexity"] and fno == 2 and wt == 1:
            aux["perplexity_raw"] = struct.unpack("<d", v)[0]
        elif stype == SCORE_TYPES["perplexity"] and fno == 3 and wt == 1:
            aux["perplexity_normalizer"] = struct.unpack("<d", v)[0]
    return value, aux


def read_score_tracker_file(path: str) -> dict[str, list[float]]:
    with open(path, "rb") as f:
        data = f.read()
    if not data or data[0] != 0:
        raise ValueError(
            f"unsupported tracker version {data[0] if data else '<empty>'}"
        )
    out: dict[str, list[float]] = {}
    i, n = 1, len(data)
    while i < n:
        j = i
        while j < n and 0x30 <= data[j] <= 0x39:
            j += 1
        if j == i:
            raise ValueError(f"corrupt length framing at byte {i}")
        length = int(data[i:j])
        if j + length > n:
            raise ValueError("truncated tracker chunk")
        name, stype, payload, payload_json = None, _UNKNOWN, b"", None
        for fno, wt, v in _fields(data[j : j + length]):
            if fno == 1:
                name = v.decode("utf-8")
            elif fno == 2:
                stype = v
            elif fno == 3:
                payload = v
            elif fno == 4:
                payload_json = v.decode("utf-8")
        i = j + length
        if name is None:
            continue
        value, aux = _decode_value(stype, payload, payload_json)
        if value is not None:
            out.setdefault(name, []).append(value)
        for k, v2 in aux.items():
            out.setdefault(k, []).append(v2)
    return out
