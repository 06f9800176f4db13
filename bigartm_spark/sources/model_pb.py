"""Reference binary model files — ExportModel/ImportModel wire format
(read AND write), so a model trained by the C++ reference loads here
and vice versa.

Layout (src/artm/core/master_component.cc:369-505):

- 1 version byte (0x00)
- repeated chunks of [DECIMAL-TEXT payload length][TopicModel payload].
  The reference streams the length with ``operator<<`` (ASCII digits)
  and reads it back with formatted extraction — unlike the ``.dict``
  file's binary little-endian int32 framing. The digits/payload
  boundary is unambiguous because a TopicModel payload always begins
  with a field tag byte, never an ASCII digit.
- each chunk holds <= min(|vocab|, 100MB / num_topics) tokens
  (master_component.cc:396) in the SPARSE retrieval layout
  (phi_matrix_operations.cc:178-188): per token, ``topic_indices``
  (IntArray, packed int32) lists the topic positions with
  |value| > eps (GetTopicModelArgs.eps default 1e-37) and
  ``token_weights`` (FloatArray, packed float) their float32 values.

TopicModel fields (src/artm/messages.proto:453-462):
  1 name, 2 num_topics, 3 topic_name*, 4 token*,
  5 token_weights* (FloatArray{repeated float value=1 packed}),
  6 class_id*, 8 topic_indices* (IntArray{repeated int32 value=1
  packed}).

Import follows ApplyTopicModelOperation(apply_weight=1, add_missing)
semantics (phi_matrix_operations.cc:192-300): chunks accumulate into
one dense token x topic matrix; a dense chunk (no topic_indices) is
accepted too.

Models are vocab-sized — driver-bounded by the same argument the
reference relies on (each chunk caps at ~100MB and the whole message at
the 2GB protobuf limit); the distributed relation is rebuilt with
spark.createDataFrame after decode.
"""

from __future__ import annotations

import struct

from pyspark.sql import SparkSession

from bigartm_spark.model.phi import PhiMatrix
from bigartm_spark.sources.batch_pb import (
    _fields,
    _put_str,
    _repeated_float,
    _repeated_int32,
    _tag,
    _write_varint,
)

DEFAULT_EPS = 1e-37  # GetTopicModelArgs.eps default (messages.proto:610)
_CHUNK_BUDGET_BYTES = 100 * 1024 * 1024  # master_component.cc:396


def _packed_floats(out: bytearray, fno: int, values) -> None:
    """A FloatArray/IntArray-style sub-message: here the sub-message body
    holding `repeated float value = 1 [packed]`."""
    body = bytearray()
    raw = struct.pack(f"<{len(values)}f", *[float(v) for v in values])
    _tag(body, 1, 2)
    _write_varint(body, len(raw))
    body.extend(raw)
    _tag(out, fno, 2)
    _write_varint(out, len(body))
    out.extend(body)


def _packed_int32s(out: bytearray, fno: int, values) -> None:
    body = bytearray()
    raw = bytearray()
    for v in values:
        if v < 0:
            raise ValueError("topic index cannot be negative")
        _write_varint(raw, int(v))
    _tag(body, 1, 2)
    _write_varint(body, len(raw))
    body.extend(raw)
    _tag(out, fno, 2)
    _write_varint(out, len(body))
    out.extend(body)


def _serialize_topic_model_chunk(
    name: str,
    topic_names: list[str],
    tokens: list[tuple[str, str, list[float]]],
    eps: float,
) -> bytes:
    """(class_id, token, values[T]) rows -> TopicModel bytes in field-
    number order (matching the C++ proto2 serializer's output order)."""
    out = bytearray()
    _put_str(out, 1, name)
    _tag(out, 2, 0)
    _write_varint(out, len(topic_names))
    for t in topic_names:
        _put_str(out, 3, t)
    for _, tok, _ in tokens:
        _put_str(out, 4, tok)
    for _, _, values in tokens:
        nz = [v for v in values if abs(v) > eps]
        _packed_floats(out, 5, nz)
    for cls, _, _ in tokens:
        _put_str(out, 6, cls)
    for _, _, values in tokens:
        idx = [i for i, v in enumerate(values) if abs(v) > eps]
        _packed_int32s(out, 8, idx)
    return bytes(out)


def write_model_file(
    phi: PhiMatrix, path: str, eps: float = DEFAULT_EPS
) -> None:
    pdf = phi.compact.toPandas()
    rows = [
        (r.class_id, r.token, list(r.values))
        for r in pdf.itertuples(index=False)
    ]
    per_chunk = max(
        1, min(len(rows) or 1, _CHUNK_BUDGET_BYTES // max(1, phi.num_topics))
    )
    with open(path, "wb") as f:
        f.write(b"\x00")
        for i in range(0, max(len(rows), 1), per_chunk):
            chunk = rows[i : i + per_chunk]
            if not chunk and i > 0:
                break
            payload = _serialize_topic_model_chunk(
                phi.name, phi.topics, chunk, eps
            )
            f.write(str(len(payload)).encode("ascii"))
            f.write(payload)
            if not rows:
                break


def _parse_topic_model(buf: bytes) -> dict:
    m = {
        "name": None,
        "num_topics": 0,
        "topic_name": [],
        "token": [],
        "token_weights": [],
        "class_id": [],
        "topic_indices": [],
    }
    for fno, wt, v in _fields(buf):
        if fno == 1:
            m["name"] = v.decode("utf-8")
        elif fno == 2:
            m["num_topics"] = v
        elif fno == 3:
            m["topic_name"].append(v.decode("utf-8"))
        elif fno == 4:
            m["token"].append(v.decode("utf-8"))
        elif fno == 5:
            vals: list[float] = []
            for f2, w2, v2 in _fields(v):
                if f2 == 1:
                    _repeated_float(vals, w2, v2)
            m["token_weights"].append(vals)
        elif fno == 6:
            m["class_id"].append(v.decode("utf-8"))
        elif fno == 8:
            idx: list[int] = []
            for f2, w2, v2 in _fields(v):
                if f2 == 1:
                    _repeated_int32(idx, w2, v2)
            m["topic_indices"].append(idx)
    return m


def read_model_file(spark: SparkSession, path: str) -> PhiMatrix:
    with open(path, "rb") as f:
        data = f.read()
    if not data or data[0] != 0:
        raise ValueError(
            f"unsupported model file version {data[0] if data else '<empty>'}"
        )
    i, n = 1, len(data)
    name = None
    topic_names: list[str] = []
    acc: dict[tuple[str, str], list[float]] = {}
    while i < n:
        j = i
        while j < n and 0x30 <= data[j] <= 0x39:
            j += 1
        if j == i:
            raise ValueError(f"corrupt length framing at byte {i}")
        length = int(data[i:j])
        if j + length > n:
            raise ValueError("truncated model chunk")
        m = _parse_topic_model(data[j : j + length])
        i = j + length
        if name is None:
            name = m["name"] or "pwt"
            topic_names = list(m["topic_name"])
        T = len(topic_names) or m["num_topics"]
        sparse = len(m["topic_indices"]) > 0
        for k, tok in enumerate(m["token"]):
            cls = m["class_id"][k] if k < len(m["class_id"]) else "@default_class"
            vals = acc.setdefault((cls, tok), [0.0] * T)
            weights = m["token_weights"][k]
            if sparse:
                for pos, w in zip(m["topic_indices"][k], weights):
                    vals[pos] += w  # ApplyTopicModelOperation increment
            else:
                for pos, w in enumerate(weights):
                    vals[pos] += w
    if name is None:
        raise ValueError(f"no chunks in model file {path}")
    rows = [
        (cls, tok, vals) for (cls, tok), vals in acc.items()
    ]
    df = spark.createDataFrame(
        rows, "class_id string, token string, values array<double>"
    )
    return PhiMatrix(name=name, topics=topic_names, compact=df)
