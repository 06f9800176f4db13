"""A3: Vowpal Wabbit corpus scan.

Grammar (collection_parser.cc:483-805, transaction syntax :595-666):

    title tok[:w] ... |class_id tok:w ... ||trans_type tok ... || ...

- first field is the item title;
- ``|x`` switches the current modality (class_id) to x; ``|@default_class``
  switches back;
- ``||name`` opens a typed transaction block, ``||`` closes the current
  transaction and opens the next of the same type; tokens inside one
  transaction co-occur atomically;
- ``tok:w`` sets a float weight (default 1); repeated (class, token)
  within one transaction accumulates weight.

The reference parses with a mutex-guarded chunk reader + thread team;
here each text partition parses independently inside one Arrow-batched
mapInPandas pass — natively parallel, no locks. Parsing is the one place
where per-line imperative logic is genuinely simpler than expressions.

doc_id is the portable content hash of the title (stable across runs and
partitionings; the reference uses sequential ids — documented divergence,
title is the durable join key either way, cf. theta cache C5).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from bigartm_spark.schemas import DEFAULT_CLASS, DEFAULT_TRANSACTION, DOCS_SCHEMA

_P_HASH = 1_000_000_007


def _char_hash(s: str, init: int = 7) -> int:
    h = init
    for ch in s:
        h = (h * 31 + ord(ch)) % _P_HASH
    return h


def parse_vw_line(line: str) -> list[tuple]:
    """-> [(doc_id, title, class_id, token, weight, pos, transaction_id,
    transaction_typename)]

    Transaction grouping follows collection_parser.cc:595-733 exactly
    (pinned by the TransactionVowpalWabbit port on the reference's own
    vw_transaction_data.txt):
    - bare ``||`` closes the pending tokens as ONE multi-token transaction;
    - ``||name`` first dumps each pending token as its OWN singleton
      transaction (under the *old* typename), then switches the typename;
    - end of item dumps each remaining token as its own singleton
      transaction — so plain tokens outside ``||`` blocks are singleton
      transactions, never grouped;
    - ``|class`` switches modality without closing a transaction, and both
      ``||`` forms reset the modality to @default_class.
    Repeated (class_id, token) within one closed multi-token transaction
    accumulates weight.
    """
    fields = line.split()
    if not fields:
        return []
    title = fields[0]
    doc_id = _char_hash(title)
    class_id = DEFAULT_CLASS
    trans_type = DEFAULT_TRANSACTION
    next_tid = 0
    pos = 0
    rows: list[tuple] = []
    pending: list[tuple] = []  # (class_id, token, weight) in order

    def flush(as_group: bool) -> None:
        nonlocal next_tid, pos
        if not pending:
            return
        if as_group:
            acc: dict[tuple, float] = {}
            order: list[tuple] = []
            for c, t, w in pending:
                k = (c, t)
                if k in acc:
                    acc[k] += w
                else:
                    acc[k] = w
                    order.append(k)
            for c, t in order:
                pos += 1
                rows.append(
                    (doc_id, title, c, t, acc[(c, t)], pos, next_tid, trans_type)
                )
            next_tid += 1
        else:
            for c, t, w in pending:
                pos += 1
                rows.append((doc_id, title, c, t, w, pos, next_tid, trans_type))
                next_tid += 1
        pending.clear()

    for f in fields[1:]:
        if f.startswith("||"):
            name = f[2:]
            if name:
                flush(as_group=False)
                trans_type = name
            else:
                flush(as_group=True)
            class_id = DEFAULT_CLASS
            continue
        if f.startswith("|"):
            class_id = f[1:] or DEFAULT_CLASS
            continue
        if ":" in f:
            tok, _, wstr = f.rpartition(":")
            try:
                weight = float(wstr)
            except ValueError:
                tok, weight = f, 1.0
        else:
            tok, weight = f, 1.0
        if not tok:
            continue
        pending.append((class_id, tok, weight))
    flush(as_group=False)
    return rows


def read_vowpal_wabbit(spark: SparkSession, path: str) -> DataFrame:
    from bigartm_spark.session import ensure_package_shipped

    ensure_package_shipped(spark)
    lines = spark.read.text(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for line in pdf["value"]:
                for (
                    doc_id,
                    title,
                    cls,
                    tok,
                    w,
                    p,
                    tid,
                    ttype,
                ) in parse_vw_line(line):
                    rows.append(
                        (
                            doc_id,
                            title,
                            str(doc_id % 64),
                            cls,
                            tok,
                            w,
                            p,
                            tid,
                            ttype,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "title",
                    "batch_id",
                    "class_id",
                    "token",
                    "weight",
                    "pos",
                    "transaction_id",
                    "transaction_typename",
                ],
            )

    return lines.mapInPandas(parse, DOCS_SCHEMA)
