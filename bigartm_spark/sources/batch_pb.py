"""A5/A6 compatibility: reference ``.batch`` protobuf files.

The reference persists each batch as one raw-serialized proto2 ``Batch``
message (helpers.cc SaveMessage/LoadMessage = SerializeToOstream /
ParseFromIstream, no framing; layout messages.proto:26-74, written by
collection_parser.cc:225-303). A migrating user's corpus is a directory
of these files, so we read them natively: a minimal proto2 wire-format
codec (varint + length-delimited + fixed32 — the only wire types the
Batch/Item messages use), with the decode fanned out over executors via
the ``binaryFile`` source + ``flatMap``-style ``mapInPandas``. No
protobuf library dependency.

Wire notes:
- repeated int32/float fields are written UNPACKED by proto2 C++ (no
  [packed=true] in messages.proto) but the decoder accepts packed too,
  as any conformant parser must.
- int32 varints are sign-extended 64-bit on the wire; ids here are
  non-negative but decoding handles the general case.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

from bigartm_spark.schemas import DEFAULT_TRANSACTION, DOCS_SCHEMA


# ------------------------------------------------------------ wire codec
def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7
        if shift > 70:
            raise ValueError("malformed varint")


def _write_varint(out: bytearray, v: int) -> None:
    v &= (1 << 64) - 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _int32(v: int) -> int:
    v &= 0xFFFFFFFF
    return (v ^ 0x80000000) - 0x80000000


def _fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """Yield (field_number, wire_type, raw value) over a message body."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _read_varint(buf, i)
        elif wt == 1:
            v, i = buf[i : i + 8], i + 8
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            v, i = buf[i : i + ln], i + ln
        elif wt == 5:
            v, i = buf[i : i + 4], i + 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fno, wt, v


def _repeated_int32(store: list, wt: int, v) -> None:
    if wt == 0:
        store.append(_int32(v))
    else:  # packed
        i = 0
        while i < len(v):
            x, i = _read_varint(v, i)
            store.append(_int32(x))


def _repeated_float(store: list, wt: int, v) -> None:
    if wt == 5:
        store.append(struct.unpack("<f", v)[0])
    else:  # packed
        store.extend(
            struct.unpack(f"<{len(v) // 4}f", v[: len(v) // 4 * 4])
        )


def parse_item(buf: bytes) -> dict:
    it = {
        "id": 0,
        "title": None,
        "token_id": [],
        "token_weight": [],
        "transaction_start_index": [],
        "transaction_typename_id": [],
    }
    for fno, wt, v in _fields(buf):
        if fno == 1:
            it["id"] = _int32(v)
        elif fno == 3:
            it["title"] = v.decode("utf-8")
        elif fno == 4:
            _repeated_int32(it["token_id"], wt, v)
        elif fno == 5:
            _repeated_float(it["token_weight"], wt, v)
        elif fno == 6:
            _repeated_int32(it["transaction_start_index"], wt, v)
        elif fno == 7:
            _repeated_int32(it["transaction_typename_id"], wt, v)
    return it


def parse_batch(buf: bytes) -> dict:
    b = {
        "token": [],
        "class_id": [],
        "item": [],
        "description": None,
        "id": None,
        "transaction_typename": [],
    }
    for fno, _wt, v in _fields(buf):
        if fno == 1:
            b["token"].append(v.decode("utf-8"))
        elif fno == 2:
            b["class_id"].append(v.decode("utf-8"))
        elif fno == 3:
            b["item"].append(parse_item(v))
        elif fno == 4:
            b["description"] = v.decode("utf-8")
        elif fno == 5:
            b["id"] = v.decode("utf-8")
        elif fno == 6:
            b["transaction_typename"].append(v.decode("utf-8"))
    return b


def _tag(out: bytearray, fno: int, wt: int) -> None:
    _write_varint(out, (fno << 3) | wt)


def _put_str(out: bytearray, fno: int, s: str) -> None:
    raw = s.encode("utf-8")
    _tag(out, fno, 2)
    _write_varint(out, len(raw))
    out.extend(raw)


def serialize_item(it: dict) -> bytes:
    out = bytearray()
    _tag(out, 1, 0)
    _write_varint(out, it.get("id", 0))
    if it.get("title") is not None:
        _put_str(out, 3, it["title"])
    for v in it.get("token_id", ()):
        _tag(out, 4, 0)
        _write_varint(out, v)
    for v in it.get("token_weight", ()):
        _tag(out, 5, 5)
        out.extend(struct.pack("<f", v))
    for v in it.get("transaction_start_index", ()):
        _tag(out, 6, 0)
        _write_varint(out, v)
    for v in it.get("transaction_typename_id", ()):
        _tag(out, 7, 0)
        _write_varint(out, v)
    return bytes(out)


def serialize_batch(b: dict) -> bytes:
    """Unpacked proto2 encoding — byte-compatible with what the C++
    reference's parser accepts (and what its writer emits)."""
    out = bytearray()
    for t in b.get("token", ()):
        _put_str(out, 1, t)
    for c in b.get("class_id", ()):
        _put_str(out, 2, c)
    for it in b.get("item", ()):
        raw = serialize_item(it)
        _tag(out, 3, 2)
        _write_varint(out, len(raw))
        out.extend(raw)
    if b.get("description") is not None:
        _put_str(out, 4, b["description"])
    if b.get("id") is not None:
        _put_str(out, 5, b["id"])
    for t in b.get("transaction_typename", ()):
        _put_str(out, 6, t)
    return bytes(out)


# ------------------------------------------------------------ Spark face
def batch_to_rows(buf: bytes, batch_id_fallback: str) -> list[tuple]:
    """One decoded .batch -> long-docs rows (DOCS_SCHEMA order)."""
    b = parse_batch(buf)
    tokens, classes = b["token"], b["class_id"]
    tt_names = b["transaction_typename"] or [DEFAULT_TRANSACTION]
    batch_id = b["id"] or batch_id_fallback
    # the reference processor treats every Item as its own document
    # regardless of item.id (id is reporting metadata; hand-built
    # batches often leave it at the proto default 0 for every item —
    # test_regularizer_biterms.py:40-80). Our engine keys the EM by
    # doc_id, so duplicate ids within a batch would silently MERGE
    # documents: re-key such batches to a batch-stable unique id and
    # keep the raw id visible as the title (what the reference shows
    # as item_id).
    raw_ids = [it["id"] for it in b["item"]]
    rekey = len(set(raw_ids)) != len(raw_ids)
    if rekey:
        import hashlib

        # 40 hash bits << 20 = 60-bit ids: int64-safe, 2^-40 collision
        # odds between two re-keyed batches
        base = (
            int(
                hashlib.md5((batch_id or "").encode()).hexdigest()[:10], 16
            )
            << 20
        )
    rows = []
    for item_idx, it in enumerate(b["item"]):
        doc_id = (base + item_idx) if rekey else it["id"]
        title = (
            it["title"] if it["title"] is not None else str(it["id"])
        )
        tids = it["token_id"]
        weights = it["token_weight"] or [1.0] * len(tids)
        tsi = it["transaction_start_index"]
        tt_ids = it["transaction_typename_id"]
        # tsi = start offset of each transaction + trailing sentinel (the
        # parser appends the total count at item end; regular text:
        # 0,1,...,n -> each token its own transaction)
        # no start indexes (old-format / hand-built batch): regular
        # bag-of-words — every token is its own transaction, matching
        # the parser's per-token RecordTransaction (collection_parser.cc
        # :258-260); a single shared transaction would silently turn the
        # item into one atomic co-occurrence under a transaction model
        tx_of = list(range(len(tids)))
        if tsi:
            tx_of = [0] * len(tids)
            starts = list(tsi)
            if starts[-1] != len(tids):
                starts.append(len(tids))
            for tx in range(len(starts) - 1):
                for p in range(starts[tx], starts[tx + 1]):
                    tx_of[p] = tx
        for pos, tid in enumerate(tids):
            cls = classes[tid] if tid < len(classes) else "@default_class"
            tx = tx_of[pos]
            tt = tt_names[tt_ids[tx]] if tx < len(tt_ids) and tt_ids[tx] < len(tt_names) else tt_names[0]
            rows.append(
                (
                    int(doc_id),
                    title,
                    batch_id,
                    cls,
                    tokens[tid] if tid < len(tokens) else "",
                    float(weights[pos]) if pos < len(weights) else 1.0,
                    pos + 1,
                    tx,
                    tt,
                )
            )
    return rows


def rows_to_batch(pdf, batch_id: str) -> bytes:
    """Long-docs rows of ONE batch -> serialized Batch bytes, laid out
    like collection_parser.cc:225-303 (per-batch token/class tables in
    first-seen order, items sorted by doc_id, transaction runs from the
    transaction_id column when present)."""
    pdf = pdf.sort_values(
        ["doc_id"] + (["pos"] if "pos" in pdf.columns else []),
        kind="mergesort",
    )
    import pandas as pd

    tok_index: dict[tuple, int] = {}
    tokens: list[str] = []
    classes: list[str] = []
    tt_index: dict[str, int] = {}
    tt_names: list[str] = []
    items = []
    for doc_id, g in pdf.groupby("doc_id", sort=True):
        token_ids, weights, tsi, tt_ids = [], [], [], []
        last_tx = object()
        for row in g.itertuples(index=False):
            key = (row.class_id, row.token)
            if key not in tok_index:
                tok_index[key] = len(tokens)
                tokens.append(row.token)
                classes.append(row.class_id)
            tx = getattr(row, "transaction_id", None)
            if tx is not None and pd.isna(tx):
                tx = None
            tt = getattr(row, "transaction_typename", None)
            if tt is None or (not isinstance(tt, str) and pd.isna(tt)):
                tt = DEFAULT_TRANSACTION
            if tx is None or tx != last_tx:
                tsi.append(len(token_ids))
                if tt not in tt_index:
                    tt_index[tt] = len(tt_names)
                    tt_names.append(tt)
                tt_ids.append(tt_index[tt])
                last_tx = tx if tx is not None else object()  # singleton runs
            token_ids.append(tok_index[key])
            weights.append(float(row.weight))
        tsi.append(len(token_ids))  # trailing sentinel, parser parity
        title = getattr(row, "title", None)
        if title is not None and not isinstance(title, str) and pd.isna(title):
            title = None
        if int(doc_id) != _int32(int(doc_id)):
            raise ValueError(
                f"doc_id {doc_id} does not fit the Batch proto's int32 item id"
            )
        items.append(
            {
                "id": int(doc_id),
                "title": str(title) if title is not None else str(doc_id),
                "token_id": token_ids,
                "token_weight": weights,
                "transaction_start_index": tsi,
                "transaction_typename_id": tt_ids,
            }
        )
    return serialize_batch(
        {
            "token": tokens,
            "class_id": classes,
            "item": items,
            "id": batch_id,
            "transaction_typename": tt_names or [DEFAULT_TRANSACTION],
        }
    )


def write_batch_folder(docs: DataFrame, path: str) -> list[str]:
    """Long docs -> one reference-layout ``.batch`` file per batch_id.

    Each batch is assembled and written by the executor that owns its
    group (applyInPandas over batch_id — one shuffle, no driver
    bottleneck). Local/shared filesystems only, like the reference's
    target_folder; at cloud scale point ``path`` at a fuse mount or swap
    the open() for an object-store client."""
    import os

    import pandas as pd

    from bigartm_spark.session import ensure_package_shipped

    ensure_package_shipped(docs.sparkSession)
    os.makedirs(path, exist_ok=True)

    def write_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        batch_id = str(key[0])
        buf = rows_to_batch(pdf, batch_id)
        fname = os.path.join(path, f"{batch_id}.batch")
        with open(fname, "wb") as f:
            f.write(buf)
        return pd.DataFrame(
            {"batch_id": [batch_id], "path": [fname],
             "n_items": [pdf["doc_id"].nunique()]}
        )

    out = docs.groupBy("batch_id").applyInPandas(
        write_group, "batch_id string, path string, n_items long"
    )
    return [r["path"] for r in out.collect()]


def read_batch_folder(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """Directory of reference ``.batch`` files (or an explicit file
    list — BatchVectorizer's batches= names) -> long docs DataFrame.

    The scan is the ``binaryFile`` source (one row per file, content as
    bytes) and the decode runs on executors via mapInPandas — file
    parallelism is Spark's, no driver-side loop over files."""
    import pandas as pd

    from bigartm_spark.session import ensure_package_shipped

    ensure_package_shipped(spark)
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.batch")
        .load(path)
        .select("path", "content")
    )
    names = [f.name for f in DOCS_SCHEMA.fields]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p, content in zip(pdf["path"], pdf["content"]):
                stem = p.rsplit("/", 1)[-1].rsplit(".", 1)[0]
                out.extend(batch_to_rows(bytes(content), stem))
            if out:
                yield pd.DataFrame(out, columns=names)

    return files.mapInPandas(decode, DOCS_SCHEMA)


def read_batch_vocab(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """Distinct (class_id, token) universe of a ``.batch`` folder — the
    Batch.token/class_id tables, INCLUDING tokens no item references.
    The reference's Gather emits zero-stat dictionary entries for these
    (dictionary_operations.cc:316-325); pair with
    gather_dictionary(full_vocab=...)."""
    import pandas as pd

    from bigartm_spark.session import ensure_package_shipped

    ensure_package_shipped(spark)
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.batch")
        .load(path)
        .select("content")
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cls, tok = [], []
            for content in pdf["content"]:
                b = parse_batch(bytes(content))
                tokens = b["token"]
                classes = b["class_id"] or ["@default_class"] * len(tokens)
                tok.extend(tokens)
                cls.extend(classes)
            if tok:
                yield pd.DataFrame({"class_id": cls, "token": tok})

    schema = "class_id string, token string"
    return files.mapInPandas(decode, schema).dropDuplicates(
        ["class_id", "token"]
    )
