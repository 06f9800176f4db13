"""Property test: the portable hash/RNG is value-identical between the
Spark expression and its DuckDB SQL replica for arbitrary strings — the
foundation every oracle comparison rests on."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bigartm_spark.functions.hashing import (
    char_hash,
    char_hash_sql,
    unit_uniform,
    unit_uniform_sql,
)

# printable-ish text incl. non-ASCII; no surrogates
TOKEN = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",), min_codepoint=1, max_codepoint=0x2FFFF
    ),
    max_size=40,
)


@settings(max_examples=5, deadline=None)
@given(st.lists(TOKEN, min_size=1, max_size=25, unique=True))
def test_portable_hash_cross_engine(spark, tokens):
    df = spark.createDataFrame([(s,) for s in tokens], "s string")
    sp = {
        r["s"]: (r["h"], round(r["u"], 15))
        for r in df.select(
            "s",
            char_hash("s").alias("h"),
            unit_uniform(F.lit("cls"), F.col("s"), 2, seed=7).alias("u"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in tokens])
    du = {
        r[0]: (r[1], round(r[2], 15))
        for r in con.execute(
            f"SELECT s, {char_hash_sql('s')}, "
            f"{unit_uniform_sql(chr(39) + 'cls' + chr(39), 's', '2', seed=7)} "
            "FROM t"
        ).fetchall()
    }
    assert sp == du
