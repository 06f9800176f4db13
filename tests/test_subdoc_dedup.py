"""Sub-document dedup: line_dedup (C4-style global exact-line dedup with
reassembly) and duplicate_spans (rolling token-window approximation of
suffix-array substring dedup). Both are pinned against a DuckDB oracle
inline — the driver registry is at its 50-row cap, so the oracle lives
here instead of oracle_sql()."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

DOCS = [
    (0, "alpha beta\nshared line one\nunique zero"),
    (1, "shared line one\ngamma delta\nshared line two"),
    (2, "shared line two\nshared line one\nepsilon"),
    (3, "shared line one"),  # whole doc is a later duplicate -> empty
    (4, "x\ny\nx"),  # within-doc repeat: second x is a duplicate too
    # consecutive + trailing separators: zero-length lines are below
    # min_line_chars=1 and must be kept verbatim, never deduped —
    # in BOTH engines (ADVICE r5: the oracle previously deduped them)
    (5, "alpha beta\n\nshared line one\n"),
    (6, "\n\nzeta"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_line_dedup_matches_duckdb_oracle(spark, docs_df):
    from bigartm_spark.operators.dedup import line_dedup

    got = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_kept"])
        for r in line_dedup(docs_df).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", DOCS)
    oracle = con.execute(
        """
WITH parts AS (
  SELECT doc_id, string_split(text, chr(10)) AS ps FROM d
),
lines AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS pos, ps[i] AS line
  FROM parts, UNNEST(range(1, len(ps) + 1)) AS t(i)
),
first AS (
  SELECT line, MIN(ROW(doc_id, pos)) AS f FROM lines
  WHERE length(line) >= 1 GROUP BY line
),
kept AS (
  SELECT l.doc_id, l.pos, l.line FROM lines l JOIN first fi ON l.line = fi.line
  WHERE ROW(l.doc_id, l.pos) = fi.f
  UNION ALL
  SELECT doc_id, pos, line FROM lines WHERE length(line) = 0
),
rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
),
totals AS (SELECT doc_id, COUNT(*) AS n_lines FROM lines GROUP BY doc_id)
SELECT t.doc_id, COALESCE(r.text, '') AS text, t.n_lines,
       COALESCE(r.n_kept, 0) AS n_kept
FROM totals t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
"""
    ).fetchall()
    want = {r[0]: (r[1], r[2], r[3]) for r in oracle}
    assert got == want
    # semantic spot checks: doc 3's only line is doc 0's, doc 4 keeps
    # one 'x', every doc's line count is intact
    assert got[3][0] == ""
    assert got[4][0] == "x\ny"
    assert got[0][0] == DOCS[0][1]  # first occurrences all kept
    # zero-length lines survive verbatim even when repeated across docs;
    # the non-empty lines of doc 5 are all later duplicates
    assert got[5] == ("\n", 4, 2)
    assert got[6] == ("\n\nzeta", 3, 3)


def test_line_dedup_min_line_chars_passthrough(spark, docs_df):
    from bigartm_spark.operators.dedup import line_dedup

    # with min_line_chars=2 the one-char 'x'/'y' lines are never deduped
    got = {
        r["doc_id"]: r["text"]
        for r in line_dedup(docs_df, min_line_chars=2).collect()
    }
    assert got[4] == "x\ny\nx"


SPAN_DOCS = [
    (0, "a b c d e f g h"),
    (1, "z z a b c d y y"),  # shares the 4-token span 'a b c d' with 0
    (2, "q r s t u v w x"),  # no cross-doc span
    (3, "a b c d e f q q"),  # shares 'a b c d' (and 'e f' tail differs)
]


def test_duplicate_spans_matches_duckdb_oracle(spark):
    from bigartm_spark.operators.dedup import duplicate_spans

    df = spark.createDataFrame(SPAN_DOCS, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["start_pos"], r["n_docs"])
        for r in duplicate_spans(df, span_tokens=4, stride=1).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", SPAN_DOCS)
    oracle = con.execute(
        """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM d
),
spans AS (
  SELECT doc_id, CAST(i AS INT) AS start_pos,
         array_to_string(ws[i:i+3], ' ') AS span
  FROM w, UNNEST(range(1, len(ws) - 2)) AS t(i)
),
per AS (SELECT span, COUNT(DISTINCT doc_id) AS n_docs FROM spans GROUP BY span)
SELECT s.doc_id, s.start_pos, p.n_docs
FROM spans s JOIN per p ON s.span = p.span WHERE p.n_docs > 1
"""
    ).fetchall()
    want = sorted((r[0], r[1], r[2]) for r in oracle)
    assert got == want
    # the shared 'a b c d' span is reported in docs 0, 1, 3
    assert {(0, 1, 3), (1, 3, 3), (3, 1, 3)} <= set(got)


def test_duplicate_spans_default_stride_non_overlapping(spark):
    from bigartm_spark.operators.dedup import duplicate_spans

    df = spark.createDataFrame(SPAN_DOCS, "doc_id long, text string")
    # stride = span_tokens: start positions are 1, 5, ... only
    rows = duplicate_spans(df, span_tokens=4).collect()
    assert all((r["start_pos"] - 1) % 4 == 0 for r in rows)


def test_pipeline_cli_line_dedup_stage(spark, tmp_path):
    """--line-dedup end-to-end: text is rewritten, empty docs dropped."""
    import json
    import subprocess
    import sys

    src = str(tmp_path / "docs_lines")
    spark.createDataFrame(DOCS, "doc_id long, text string").withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("t")).write.parquet(src)
    out_dir = tmp_path / "clean_lines"
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "bigartm_spark",
            "pipeline",
            "--input",
            src,
            "--output",
            str(out_dir),
            "--dedup",
            "none",
            "--line-dedup",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["input_rows"] == len(DOCS)
    # doc 3 became empty and was dropped
    assert stats["after_line_dedup"] == len(DOCS) - 1
    got = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(str(out_dir)).collect()
    }
    assert 3 not in got
    assert got[4] == "x\ny"


def test_pipeline_cli_dup_span_filter(spark, tmp_path):
    """--max-dup-span-frac drops the heavily-duplicated docs and keeps
    the rest."""
    import json
    import subprocess
    import sys

    # docs 0/1 share their full 8-token text (duplicated span coverage
    # 1.0 with span=4); docs 2/3 are unique
    rows = [
        (0, "a b c d e f g h"),
        (1, "a b c d e f g h"),
        (2, "q r s t u v w x"),
        (3, "m n o p j k l i"),
    ]
    src = str(tmp_path / "docs_spans")
    spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("t")).write.parquet(src)
    out_dir = tmp_path / "clean_spans"
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "bigartm_spark",
            "pipeline",
            "--input",
            src,
            "--output",
            str(out_dir),
            "--dedup",
            "none",
            "--max-dup-span-frac",
            "0.5",
            "--dup-span-tokens",
            "4",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["input_rows"] == 4
    assert stats["after_dup_span_filter"] == 2
    kept = {
        r["doc_id"] for r in spark.read.parquet(str(out_dir)).collect()
    }
    assert kept == {2, 3}


def test_duplicate_spans_plan_shape(spark):
    """Scale pin: explode -> one hash agg -> hash join on span_hash;
    no cartesian, no window over the corpus."""
    from bigartm_spark.operators.dedup import duplicate_spans

    df = spark.createDataFrame(SPAN_DOCS, "doc_id long, text string")
    q = duplicate_spans(df, span_tokens=4)
    plan = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
