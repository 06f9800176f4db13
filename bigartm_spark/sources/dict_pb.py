"""Reference binary ``.dict`` dictionary files (read AND write).

Wire layout (src/artm/core/dictionary_operations.cc:53-252):

- 1 version byte (0)
- repeated chunks of [int32 little-endian payload length][DictionaryData
  protobuf payload]
- the FIRST chunk carries the token table (name, num_items_in_collection,
  parallel token/class_id/token_value/token_tf/token_df arrays); every
  later chunk carries cooc triplets (cooc_first_index/second_index/value
  and optionally tf/df), <= 10M triplets per chunk, indices referring to
  positions in the token chunk. A chunk must hold tokens XOR cooc
  (dictionary_operations.cc:208-210).

DictionaryData fields (src/artm/messages.proto:555-568):
  1 name, 2 token*, 3 class_id*, 4 token_value*, 5 token_tf*,
  6 token_df*, 7 cooc_first_index*, 8 cooc_second_index*, 9 cooc_value*,
  10 num_items_in_collection, 11 cooc_tf*, 12 cooc_df*
(* = repeated; floats are unpacked fixed32 exactly as the reference's
proto2 serializer emits them, and the parser accepts packed too).

Dictionaries are vocab-sized — bounded driver-side work by construction
(the reference itself caps a chunk at 3e7 tokens and the whole message at
the 2GB protobuf limit); the distributed relation is built with
spark.createDataFrame after decode.

Reuses the hand-rolled proto2 wire primitives from sources/batch_pb.py
(no protobuf lib in the runtime).
"""

from __future__ import annotations

import os
import struct

from pyspark.sql import DataFrame, SparkSession

from bigartm_spark.schemas import DICTIONARY_SCHEMA
from bigartm_spark.sources.batch_pb import (
    _fields,
    _int32,
    _put_str,
    _repeated_float,
    _repeated_int32,
    _tag,
    _write_varint,
)

MAX_COOC_PER_CHUNK = 10 * 1000 * 1000  # dictionary_operations.cc:114


def _parse_dictionary_data(buf: bytes) -> dict:
    d = {
        "name": None,
        "token": [],
        "class_id": [],
        "token_value": [],
        "token_tf": [],
        "token_df": [],
        "cooc_first_index": [],
        "cooc_second_index": [],
        "cooc_value": [],
        "num_items_in_collection": 0,
        "cooc_tf": [],
        "cooc_df": [],
    }
    for fno, wt, v in _fields(buf):
        if fno == 1:
            d["name"] = v.decode("utf-8")
        elif fno == 2:
            d["token"].append(v.decode("utf-8"))
        elif fno == 3:
            d["class_id"].append(v.decode("utf-8"))
        elif fno == 4:
            _repeated_float(d["token_value"], wt, v)
        elif fno == 5:
            _repeated_float(d["token_tf"], wt, v)
        elif fno == 6:
            _repeated_float(d["token_df"], wt, v)
        elif fno == 7:
            _repeated_int32(d["cooc_first_index"], wt, v)
        elif fno == 8:
            _repeated_int32(d["cooc_second_index"], wt, v)
        elif fno == 9:
            _repeated_float(d["cooc_value"], wt, v)
        elif fno == 10:
            d["num_items_in_collection"] = _int32(v) if wt == 0 else v
        elif fno == 11:
            _repeated_float(d["cooc_tf"], wt, v)
        elif fno == 12:
            _repeated_float(d["cooc_df"], wt, v)
    return d


def _put_float(out: bytearray, fno: int, x: float) -> None:
    _tag(out, fno, 5)
    out += struct.pack("<f", float(x))


def _put_int32(out: bytearray, fno: int, v: int) -> None:
    _tag(out, fno, 0)
    _write_varint(out, int(v) & 0xFFFFFFFF if int(v) < 0 else int(v))


def _serialize_token_chunk(
    name: str,
    num_items: int,
    tokens: list[str],
    class_ids: list[str],
    values: list[float],
    tfs: list[float],
    dfs: list[float],
) -> bytes:
    out = bytearray()
    _put_str(out, 1, name)
    for t in tokens:
        _put_str(out, 2, t)
    for c in class_ids:
        _put_str(out, 3, c)
    for x in values:
        _put_float(out, 4, x)
    for x in tfs:
        _put_float(out, 5, x)
    for x in dfs:
        _put_float(out, 6, x)
    _tag(out, 10, 0)
    _write_varint(out, int(num_items))
    return bytes(out)


def _serialize_cooc_chunk(
    first: list[int],
    second: list[int],
    value: list[float],
    tf: list[float] | None,
    df: list[float] | None,
) -> bytes:
    out = bytearray()
    for i in first:
        _put_int32(out, 7, i)
    for i in second:
        _put_int32(out, 8, i)
    for x in value:
        _put_float(out, 9, x)
    if tf:
        for x in tf:
            _put_float(out, 11, x)
    if df:
        for x in df:
            _put_float(out, 12, x)
    return bytes(out)


def write_dict_file(
    dictionary: DataFrame,
    path: str,
    name: str = "dictionary",
    num_items_in_collection: int = 0,
    cooc: DataFrame | None = None,
    overwrite: bool = True,
) -> str:
    """Export a dictionary relation (DICTIONARY_SCHEMA) as a reference
    ``.dict`` file the C++ Import() can read. ``cooc`` takes
    (token_a, token_b, cooc_value[, cooc_tf, cooc_df]) canonical pairs;
    both directions are written, matching the reference's symmetric
    in-memory map that Export() walks."""
    if not path.endswith(".dict"):
        path += ".dict"
    if os.path.exists(path) and not overwrite:
        raise FileExistsError(path)
    pdf = dictionary.select(
        "class_id", "token", "value", "tf", "df"
    ).toPandas()
    tokens = pdf["token"].tolist()
    class_ids = pdf["class_id"].tolist()
    idx = {
        (c, t): i for i, (c, t) in enumerate(zip(class_ids, tokens))
    }
    chunks = [
        _serialize_token_chunk(
            name,
            num_items_in_collection,
            tokens,
            class_ids,
            pdf["value"].fillna(0.0).tolist(),
            pdf["tf"].fillna(0.0).tolist(),
            pdf["df"].fillna(0.0).tolist(),
        )
    ]
    if cooc is not None:
        ccols = cooc.columns
        has_tfdf = "cooc_tf" in ccols and "cooc_df" in ccols
        cpdf = cooc.toPandas()
        first: list[int] = []
        second: list[int] = []
        value: list[float] = []
        tf: list[float] = []
        df: list[float] = []
        # token index lookup is class-blind in the cooc relation (pairs
        # carry raw tokens); resolve within @default_class first, else
        # first matching token of any class
        tok2i: dict[str, int] = {}
        for i, (c, t) in enumerate(zip(class_ids, tokens)):
            if t not in tok2i or c == "@default_class":
                if t not in tok2i or class_ids[tok2i[t]] != "@default_class":
                    tok2i[t] = i
        def flush():
            if first:
                chunks.append(
                    _serialize_cooc_chunk(
                        first,
                        second,
                        value,
                        tf if has_tfdf else None,
                        df if has_tfdf else None,
                    )
                )
                first.clear(); second.clear(); value.clear()
                tf.clear(); df.clear()

        for row in cpdf.itertuples(index=False):
            r = row._asdict() if hasattr(row, "_asdict") else dict(row)
            ia = tok2i.get(r["token_a"])
            ib = tok2i.get(r["token_b"])
            if ia is None or ib is None:
                continue
            v = float(r.get("cooc_value", r.get("cooc_tf", 0.0)))
            for x, y in ((ia, ib), (ib, ia)):
                first.append(x)
                second.append(y)
                value.append(v)
                if has_tfdf:
                    tf.append(float(r["cooc_tf"]))
                    df.append(float(r["cooc_df"]))
                if len(first) >= MAX_COOC_PER_CHUNK:
                    flush()
        flush()
    with open(path, "wb") as f:
        f.write(b"\x00")  # version (fout << char(0))
        for payload in chunks:
            f.write(struct.pack("<i", len(payload)))
            f.write(payload)
    return path


def read_dict_file(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame | None, dict]:
    """Import a reference ``.dict`` file: (dictionary relation in
    DICTIONARY_SCHEMA, cooc triplets relation or None, meta with the
    stored name / num_items_in_collection)."""
    if not path.endswith(".dict"):
        raise ValueError(
            f"reference dictionaries use the .dict extension: {path}"
        )
    with open(path, "rb") as f:
        blob = f.read()
    if not blob or blob[0] != 0:
        raise ValueError(
            f"unsupported .dict format version: {blob[0] if blob else 'empty'}"
        )
    i = 1
    tokens = None
    meta = {"name": None, "num_items_in_collection": 0}
    cooc_rows: list[tuple] = []
    while i < len(blob):
        if i + 4 > len(blob):
            break
        (length,) = struct.unpack_from("<i", blob, i)
        i += 4
        if length <= 0 or i + length > len(blob):
            raise ValueError(f"corrupt .dict chunk at offset {i - 4}")
        d = _parse_dictionary_data(blob[i : i + length])
        i += length
        has_tok = len(d["token"]) > 0
        has_cooc = len(d["cooc_value"]) > 0
        if has_tok == has_cooc:
            raise ValueError(
                ".dict chunk must hold tokens XOR cooc triplets "
                "(dictionary_operations.cc:208-210)"
            )
        if has_tok:
            tokens = d
            meta["name"] = d["name"]
            meta["num_items_in_collection"] = int(
                d["num_items_in_collection"]
            )
        else:
            if tokens is None:
                raise ValueError(".dict cooc chunk before token chunk")
            tok = tokens["token"]
            has_tfdf = len(d["cooc_tf"]) > 0
            for k, (a, b) in enumerate(
                zip(d["cooc_first_index"], d["cooc_second_index"])
            ):
                cooc_rows.append(
                    (
                        tok[a],
                        tok[b],
                        float(d["cooc_value"][k]),
                        float(d["cooc_tf"][k]) if has_tfdf else None,
                        float(d["cooc_df"][k]) if has_tfdf else None,
                    )
                )
    if tokens is None:
        raise ValueError(f"no token chunk in {path}")
    n = len(tokens["token"])

    def fcol(key):
        vals = tokens[key]
        return [float(vals[j]) if j < len(vals) else 0.0 for j in range(n)]

    rows = list(
        zip(
            tokens["class_id"] if tokens["class_id"] else ["@default_class"] * n,
            tokens["token"],
            fcol("token_value"),
            fcol("token_tf"),
            fcol("token_df"),
        )
    )
    dict_df = spark.createDataFrame(rows, DICTIONARY_SCHEMA)
    cooc_df = None
    if cooc_rows:
        cooc_df = spark.createDataFrame(
            cooc_rows,
            "token_a string, token_b string, cooc_value double, "
            "cooc_tf double, cooc_df double",
        )
    return dict_df, cooc_df, meta
