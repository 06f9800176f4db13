"""§2.K composability: the corpus-cleaning Column-expression operators
(quality_score, pii_redact, lang_id) are one-definition batch+stream —
the same call works on a readStream relation and agrees with the batch
result. Pure codegen exprs have no state, so this is the zero-cost
streaming face of the pipeline's filter stages."""

from __future__ import annotations

from pyspark.sql import functions as F

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "contact me at alice@example.com or 555-123-4567 for details"),
    (2, "le chat et le chien sont dans la maison avec les enfants"),
    (3, "x"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_scan_and_redact_stream_equals_batch(spark, tmp_path):
    from bigartm_spark.operators.textstats import pii_redact, pii_scan

    src = str(tmp_path / "docs_src")
    _docs(spark).write.parquet(src)
    stream = spark.readStream.schema(_docs(spark).schema).parquet(src)
    assert stream.isStreaming

    def clean(df):
        scan = pii_scan(df).select("doc_id", "n_emails", "n_phones", "has_pii")
        red = pii_redact(df).select("doc_id", "redacted_text")
        return red.join(scan, "doc_id")

    # stateless projection chain (self-join of derived projections of
    # one source is a single micro-batch plan) -> append mode
    q = (
        clean(stream)
        .writeStream.format("memory")
        .queryName("pii_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    streamed = {
        r["doc_id"]: (r["redacted_text"], r["n_emails"], r["n_phones"])
        for r in spark.sql("select * from pii_mem").collect()
    }
    batch = {
        r["doc_id"]: (r["redacted_text"], r["n_emails"], r["n_phones"])
        for r in clean(_docs(spark)).collect()
    }
    assert streamed == batch and len(streamed) == len(DOCS)
    # the PII doc was actually redacted
    assert "alice@example.com" not in streamed[1][0]
    assert streamed[1][1] >= 1


def test_lang_quality_filter_stream_equals_batch(spark, tmp_path):
    """The pipeline's quality/lang filter stage as a streaming query."""
    from bigartm_spark.operators.textstats import lang_id, quality_score

    src = str(tmp_path / "docs_src2")
    _docs(spark).write.parquet(src)
    stream = spark.readStream.schema(_docs(spark).schema).parquet(src)

    def stage(df):
        q = quality_score(df).select("doc_id", "quality")
        lang = lang_id(df).select("doc_id", "predicted_lang")
        return (
            df.join(q, "doc_id")
            .join(lang, "doc_id")
            .filter(F.col("quality") > 0.2)
            .select("doc_id", "predicted_lang", "quality")
        )

    # stream-stream joins need watermarks; but a stream joined twice to
    # DERIVED projections of ITSELF is still one stateless micro-batch
    # plan — Spark handles it in append mode with availableNow
    got_batch = sorted(
        (r["doc_id"], r["predicted_lang"]) for r in stage(_docs(spark)).collect()
    )
    q = (
        stage(stream)
        .writeStream.format("memory")
        .queryName("lq_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got_stream = sorted(
        (r["doc_id"], r["predicted_lang"])
        for r in spark.sql("select * from lq_mem").collect()
    )
    assert got_stream == got_batch and len(got_stream) >= 2


def test_corpus_stats_stream_equals_batch(spark, tmp_path):
    """corpus_stats (minus the share window, which streaming plans
    forbid) runs as a complete-mode aggregate over a file stream and
    converges to the batch numbers."""
    from bigartm_spark.operators.sampling import corpus_stats

    rows = [(i, f"src{i % 2}", "tok " * (i + 1)) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    src = str(tmp_path / "cs_src")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)

    q = (
        corpus_stats(stream, with_share=False)
        .writeStream.format("memory")
        .queryName("cs_mem")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    streamed = {
        r["source"]: (r["n_docs"], r["total_tokens"], r["total_chars"])
        for r in spark.sql("select * from cs_mem").collect()
    }
    batch = {
        r["source"]: (r["n_docs"], r["total_tokens"], r["total_chars"])
        for r in corpus_stats(df, with_share=False).collect()
    }
    assert streamed == batch and len(streamed) == 2
