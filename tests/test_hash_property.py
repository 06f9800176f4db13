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


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),  # doc
            st.sampled_from(["@default_class", "author", "tag"]),
            st.text(alphabet="abcdefg", min_size=1, max_size=6),  # token
            st.floats(min_value=0.25, max_value=8.0, allow_nan=False),
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=12, deadline=None)
def test_vw_export_roundtrip_property(spark, tmp_path_factory, rows):
    """Property: any (doc, class, token, weight) multiset over a VW-safe
    alphabet survives write_corpus_vw -> read_vowpal_wabbit with weights
    accumulated per (doc, class, token) — the invariant the E-step
    consumes."""
    from collections import defaultdict

    from bigartm_spark.schemas import DOCS_SCHEMA
    from bigartm_spark.sources.io import write_corpus_vw
    from bigartm_spark.sources.vw import read_vowpal_wabbit

    data = [
        (d, f"doc{d}", "0", c, t, float(w), i, None, None)
        for i, (d, c, t, w) in enumerate(rows)
    ]
    docs = spark.createDataFrame(data, DOCS_SCHEMA)
    path = str(tmp_path_factory.mktemp("vw_prop") / "out")
    write_corpus_vw(docs, path)
    back = read_vowpal_wabbit(spark, path)

    want = defaultdict(float)
    for d, c, t, w in rows:
        want[(f"doc{d}", c, t)] += float(w)
    got = defaultdict(float)
    for r in back.collect():
        got[(r.title, r.class_id, r.token)] += r.weight
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6 * max(1.0, abs(want[k]))
