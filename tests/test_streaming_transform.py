"""Streaming inference (streaming_transform) parity with the batch
E-step transform: same phi, same docs, theta must agree."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigartm_spark.corpus import docs_from_documents
from bigartm_spark.model.artm import ARTM
from bigartm_spark.operators.dictionary import gather_dictionary
from bigartm_spark.streaming.transform import streaming_transform
from tests.conftest import sf_dir, spark  # noqa: F401


def _fitted_model(spark, sf_dir):
    docs = docs_from_documents(spark, sf_dir)
    m = ARTM(num_topics=4, num_document_passes=5, seed=7)
    m.initialize(gather_dictionary(docs))
    m.fit_offline(docs, num_collection_passes=1)
    return m, docs


def test_streaming_transform_matches_batch(spark, sf_dir, tmp_path):
    m, docs = _fitted_model(spark, sf_dir)
    batch_theta = {
        (r.doc_id, r.topic): r.value
        for r in m.transform(docs).collect()
    }

    src = str(tmp_path / "doc_stream")
    documents = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    documents.write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        streaming_transform(stream, m.pwt, num_document_passes=5)
        .writeStream.format("memory")
        .queryName("stream_theta")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_theta = {
        (r.doc_id, r.topic): r.value
        for r in spark.sql("select * from stream_theta").collect()
    }

    assert set(stream_theta) == set(batch_theta)
    worst = max(
        abs(stream_theta[k] - batch_theta[k]) for k in batch_theta
    )
    assert worst < 1e-6, worst


def test_streaming_transform_is_mode_agnostic(spark, sf_dir):
    """The same definition runs on a plain batch DataFrame."""
    m, _ = _fitted_model(spark, sf_dir)
    documents = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = streaming_transform(documents, m.pwt, num_document_passes=5)
    assert not out.isStreaming
    rows = out.groupBy("doc_id").agg(F.sum("value").alias("s")).collect()
    assert rows and all(abs(r.s - 1.0) < 1e-9 for r in rows)
