"""normalize_ts contract: the driver has shipped three ts encodings
across rounds (TIMESTAMP(NANOS) read as bigint under nanosAsLong,
tz-adjusted MICROS -> timestamp, naive MICROS -> timestamp_ntz). All
three must land on the same instants and sessionize identically, so a
data regeneration can never turn an event query red again."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
# user 1: two sessions (40-min gap incl. a sub-second straddle);
# user 2: one session
_OFFSETS = [
    (0, dt.timedelta(minutes=0), 1),
    (1, dt.timedelta(minutes=10), 1),
    (2, dt.timedelta(minutes=20, microseconds=123456), 1),
    (3, dt.timedelta(minutes=60), 1),
    (4, dt.timedelta(minutes=70), 1),
    (10, dt.timedelta(minutes=5), 2),
    (11, dt.timedelta(minutes=15), 2),
]


def _arrow_table(ts_type):
    ids = [e for e, _, _ in _OFFSETS]
    stamps = [T0 + off for _, off, _ in _OFFSETS]
    users = [u for _, _, u in _OFFSETS]
    return pa.table(
        {
            "event_id": pa.array(ids, pa.int64()),
            "ts": pa.array(stamps).cast(ts_type),
            "user_id": pa.array(users, pa.int64()),
        }
    )


@pytest.fixture(scope="module")
def variant_paths(tmp_path_factory):
    root = tmp_path_factory.mktemp("ts_variants")
    paths = {}
    for name, ts_type in [
        ("nanos", pa.timestamp("ns")),
        ("micros_ntz", pa.timestamp("us")),
        ("micros_utc", pa.timestamp("us", tz="UTC")),
    ]:
        p = str(root / f"{name}.parquet")
        pq.write_table(_arrow_table(ts_type), p)
        paths[name] = p
    return paths


def _read_normalized(spark, path):
    from bigartm_spark.functions.timeutil import normalize_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_ts(spark.read.parquet(path))


def test_three_encodings_read_as_expected_spark_types(spark, variant_paths):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    seen = {
        name: dict(spark.read.parquet(p).dtypes)["ts"]
        for name, p in variant_paths.items()
    }
    # the premise of the contract: each file exercises a distinct branch
    assert seen == {
        "nanos": "bigint",
        "micros_ntz": "timestamp_ntz",
        "micros_utc": "timestamp",
    }


def test_normalize_ts_same_instants_across_encodings(spark, variant_paths):
    micros = {}
    for name, p in variant_paths.items():
        df = _read_normalized(spark, p)
        assert dict(df.dtypes)["ts"] == "timestamp"
        micros[name] = {
            r["event_id"]: r["us"]
            for r in df.select(
                "event_id", F.unix_micros("ts").alias("us")
            ).collect()
        }
    assert micros["nanos"] == micros["micros_ntz"] == micros["micros_utc"]
    # and the instants are the naive-as-UTC epoch (DuckDB epoch_us)
    expected_e2 = int(
        (T0 + dt.timedelta(minutes=20, microseconds=123456))
        .replace(tzinfo=dt.timezone.utc)
        .timestamp()
        * 1_000_000
    )
    assert micros["micros_ntz"][2] == expected_e2


def test_sessionize_identical_across_encodings(spark, variant_paths):
    from bigartm_spark.streaming.events import sessionize_events

    results = {}
    for name, p in variant_paths.items():
        out = sessionize_events(_read_normalized(spark, p)).select(
            "user_id",
            F.unix_micros("session_start").alias("s_us"),
            F.unix_micros("session_end").alias("e_us"),
            "n_events",
        )
        results[name] = sorted(tuple(r) for r in out.collect())
    assert results["nanos"] == results["micros_ntz"] == results["micros_utc"]
    # user 1: [0,10,20] then [60,70]; user 2: [5,15]
    assert [(u, n) for (u, _, _, n) in results["micros_ntz"]] == [
        (1, 3),
        (1, 2),
        (2, 2),
    ] or sorted((u, n) for (u, _, _, n) in results["micros_ntz"]) == [
        (1, 2),
        (1, 3),
        (2, 2),
    ]


def test_normalize_ts_rejects_unknown_type(spark):
    df = spark.createDataFrame([(1, "x")], "event_id long, ts string")
    with pytest.raises(TypeError):
        from bigartm_spark.functions.timeutil import normalize_ts

        normalize_ts(df)
