"""Event-time normalization: one contract for every ts encoding the
driver (or a user's parquet writer) has shipped so far.

Across rounds the `events.parquet` ts column has arrived as:
- TIMESTAMP(NANOS)            -> read as `bigint` via nanosAsLong
- TIMESTAMP(MICROS, adj=true) -> Spark `timestamp`
- TIMESTAMP(MICROS, adj=false)-> Spark `timestamp_ntz` (pandas/pyarrow
  default when no tz is attached)

`normalize_ts` maps all three to a plain `timestamp` holding the same
instant DuckDB's `epoch_us(ts)` sees, so every downstream query
(window, session_window, unix_micros, date_trunc) is written once
against one type.

The NTZ branch is deliberately NOT `cast(ts as timestamp)`: that cast
interprets the wall time in the *session* time zone, so a non-UTC
session would shift every instant. `timestampdiff` between two NTZ
values is pure wall-clock arithmetic (time-zone free), and
`timestamp_micros` builds the instant from epoch micros directly —
together they pin the DuckDB/naive-as-UTC semantics no matter what the
session TZ is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NTZ_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Return ``df`` with ``col`` normalized to TIMESTAMP (UTC instant).

    Handles: ``bigint`` (epoch nanoseconds, the nanosAsLong legacy read),
    ``timestamp_ntz`` (naive wall time, interpreted as UTC exactly like
    DuckDB's ``epoch_us``), and ``timestamp`` (pass-through). Any other
    type raises — silently mis-typed event time should fail loudly at
    plan build, not produce shifted sessions.
    """
    dtype = dict(df.dtypes).get(col)
    if dtype is None:
        raise ValueError(f"column {col!r} not found in {df.columns}")
    if dtype == "timestamp":
        return df
    if dtype == "bigint":
        # integer DIV, never floor(ts/1000.0): epoch-ns values (~1.7e18)
        # exceed double's 2^53 mantissa, so float division is off by up
        # to ~256ns and floor() then lands on the wrong microsecond
        return df.withColumn(
            col, F.timestamp_micros(F.expr(f"`{col}` DIV 1000"))
        )
    if dtype == "timestamp_ntz":
        return df.withColumn(
            col,
            F.timestamp_micros(
                F.expr(f"timestampdiff(MICROSECOND, {_NTZ_EPOCH}, `{col}`)")
            ),
        )
    raise TypeError(
        f"cannot normalize event-time column {col!r} of type {dtype!r}; "
        "expected bigint (epoch ns), timestamp, or timestamp_ntz"
    )
