"""operators/sampling.py: deterministic split / stratified sample /
domain-mixture resample semantics.

The cross-engine value parity is covered by the driver oracle pairs
(sample_split_stratified, sample_domain_mixture); here we pin the
*behavioral* contract: determinism across runs and partitionings,
disjoint-exhaustive splits, expected-rate tolerance, mixture shape, and
no-upsampling.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigartm_spark.operators import sampling


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet")


def test_hash_split_disjoint_exhaustive_deterministic(documents):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    s1 = sampling.hash_split(documents, w)
    total = documents.count()
    counts = {
        r["split"]: r["n"]
        for r in s1.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert sum(counts.values()) == total  # exhaustive, no row dropped
    # expected rates within a loose tolerance (500+ docs)
    assert abs(counts["train"] / total - 0.8) < 0.1
    # determinism across runs AND partitionings
    s2 = sampling.hash_split(documents.repartition(13), w)
    assert (
        s1.select("doc_id", "split")
        .exceptAll(s2.select("doc_id", "split"))
        .count()
        == 0
    )


def test_hash_split_stable_vs_seed(documents):
    w = {"train": 0.5, "test": 0.5}
    a = sampling.hash_split(documents, w, seed=0)
    b = sampling.hash_split(documents, w, seed=1)
    moved = (
        a.select("doc_id", "split")
        .join(
            b.select("doc_id", F.col("split").alias("split_b")), "doc_id"
        )
        .filter(F.col("split") != F.col("split_b"))
        .count()
    )
    assert moved > 0  # a different seed is a different split


def test_stratified_sample_rates_and_subset(documents):
    fr = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
    out = sampling.stratified_sample(documents, fr)
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    n_src0 = documents.filter(F.col("source") == "src0").count()
    assert counts.get("src0") == n_src0  # rate 1.0 keeps everything
    assert "src2" not in counts  # rate 0.0 drops everything
    assert 0 < counts.get("src1", 0) < documents.filter(
        F.col("source") == "src1"
    ).count()
    # strata not named in the dict are dropped
    assert out.filter(~F.col("source").isin(*fr)).count() == 0


def test_stratified_sample_global_fraction(documents):
    out = sampling.stratified_sample(documents, 0.25)
    n = documents.count()
    assert 0.1 * n < out.count() < 0.45 * n
    # sampled set is a subset of the input
    assert out.join(documents, "doc_id", "left_anti").count() == 0


def test_mixture_rates_no_upsampling(documents):
    targets = {"src0": 0.6, "src1": 0.2, "src2": 0.2}
    rates = sampling.mixture_rates(documents, targets)
    rows = {r["stratum"]: r for r in rates.collect()}
    assert set(rows) == set(targets)
    for r in rows.values():
        assert 0.0 < r["keep_rate"] <= 1.0
    # the binding stratum (largest target per available row) keeps 100%
    assert rows["src0"]["keep_rate"] == pytest.approx(1.0)


def test_domain_mixture_resample_hits_targets(documents):
    targets = {"src0": 0.5, "src1": 0.25, "src2": 0.25}
    out = sampling.domain_mixture_resample(documents, targets)
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    total = sum(counts.values())
    # src0 is the binding stratum: kept whole (25 of 25 at sf0.01)
    assert counts["src0"] == documents.filter(
        F.col("source") == "src0"
    ).count()
    # realized mixture within Bernoulli noise of the target
    assert abs(counts["src0"] / total - 0.5) < 0.2
    # only targeted strata survive
    assert set(counts) == set(targets)


def test_hash_split_and_sample_work_on_streams(spark, tmp_path):
    """The sampling coins are stateless Column expressions, so the same
    operators run unchanged on a Structured Stream (the ingest-time
    split/sample of a live corpus feed) and agree with the batch result."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = str(tmp_path / "docs_src")
    docs.write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    assert stream.isStreaming

    out = sampling.stratified_sample(
        sampling.hash_split(stream.select("doc_id", "source")), 0.5
    )
    q = (
        out.writeStream.format("memory")
        .queryName("split_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    batch = {
        (r["doc_id"], r["split"])
        for r in sampling.stratified_sample(
            sampling.hash_split(docs.select("doc_id", "source")), 0.5
        ).collect()
    }
    streamed = {
        (r["doc_id"], r["split"])
        for r in spark.sql("select * from split_mem").collect()
    }
    assert streamed == batch and len(streamed) > 0


def test_corpus_stats(spark, sf_dir):
    import duckdb

    from bigartm_spark.operators.sampling import corpus_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = corpus_stats(docs).collect()
    assert out and all(r["n_docs"] > 0 for r in out)
    # token share sums to 1 across groups
    assert abs(sum(r["token_share"] for r in out) - 1.0) < 1e-9
    # exact fields vs DuckDB on the same parquet
    con = duckdb.connect()
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            f"""
            SELECT source, COUNT(*) AS n,
                   SUM(len(list_filter(string_split(text, ' '),
                                       w -> len(w) > 0))) AS toks,
                   SUM(len(text)) AS chars
            FROM '{sf_dir}/documents.parquet' GROUP BY source
            """
        ).fetchall()
    }
    for r in out:
        n, toks, chars = want[r["source"]]
        assert r["n_docs"] == n
        assert r["total_tokens"] == toks
        assert r["total_chars"] == chars
        # percentiles ordered and within the observed range
        p = r["token_percentiles"]
        assert p == sorted(p) and p[0] >= 0
    # whole-corpus mode: single row, no token_share column
    whole = corpus_stats(docs, group_col=None)
    assert "token_share" not in whole.columns
    rows = whole.collect()
    assert len(rows) == 1
    assert rows[0]["n_docs"] == sum(r["n_docs"] for r in out)
