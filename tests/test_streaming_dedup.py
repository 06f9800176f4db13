"""Streaming dedup: cross-micro-batch state and batch parity.

Two parquet files + maxFilesPerTrigger=1 force two micro-batches, so
the tests exercise the part that matters: duplicates arriving AFTER the
original's micro-batch are still caught (state store, not per-batch
dedup)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigartm_spark.operators.dedup import lsh_candidate_pairs
from bigartm_spark.streaming.dedup import (
    band_rows,
    streaming_exact_dedup,
    streaming_lsh_candidates,
)
from tests.conftest import spark  # noqa: F401

BASE = (
    "the quick brown fox jumps over the lazy dog again and again today"
)
# appended word: shingle superset, so the 8 minima (hence every band)
# survive — a deterministic near-dup for LSH, unlike a word swap which
# can lose the minhash draw on all bands at k=8
NEAR = BASE + " extra"
OTHER = "completely different words about spark structured streaming state"


def _write_two_batches(spark, tmp_path):
    """batch 1: docs 10 (BASE), 11 (OTHER); batch 2: docs 12 (dup of
    BASE), 13 (near-dup of BASE), 14 (unique)."""
    src = str(tmp_path / "docs_src")
    b1 = spark.createDataFrame(
        [(10, BASE), (11, OTHER)], "doc_id long, text string"
    )
    b2 = spark.createDataFrame(
        [(12, BASE), (13, NEAR), (14, "tiny")], "doc_id long, text string"
    )
    b1.coalesce(1).write.parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)
    schema = "doc_id long, text string"
    return spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)


def _run(stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_exact_dedup_cross_batch(spark, tmp_path):
    stream = _write_two_batches(spark, tmp_path)
    _run(streaming_exact_dedup(stream), "exact_dedup_mem")
    rows = spark.sql("select * from exact_dedup_mem").collect()
    survivors = {r.doc_id for r in rows}
    # doc 12 (same text as 10, later micro-batch) must be swallowed;
    # every distinct content emits exactly one survivor
    assert survivors == {10, 11, 13, 14}
    assert len(rows) == len(survivors)


def test_streaming_lsh_candidates_cross_batch(spark, tmp_path):
    stream = _write_two_batches(spark, tmp_path)
    _run(streaming_lsh_candidates(stream), "lsh_cand_mem")
    rows = spark.sql("select * from lsh_cand_mem").collect()
    got = {(r.doc_id, r.canonical_doc_id) for r in rows}
    # the exact duplicate collides on every band with doc 10's buckets
    assert (12, 10) in got
    # the near-duplicate shares most shingles -> at least one band
    assert (13, 10) in got
    # unrelated docs never pair
    assert all(c == 10 for _, c in got)


def test_stream_band_sig_matches_batch(spark):
    """The row-local HOF minhash must equal the batch explode+groupBy
    signature — else streaming and batch dedup would disagree on the
    same corpus."""
    docs = spark.createDataFrame(
        [(1, BASE), (2, NEAR), (3, OTHER)], "doc_id long, text string"
    )
    from bigartm_spark.operators.dedup import (
        LSH_BAND_SIZE,
        MINHASH_K,
        _minhash_wide,
    )

    stream_side = {
        (r.doc_id, r.band): r.band_sig
        for r in band_rows(docs).collect()
    }
    wide = _minhash_wide(docs).collect()
    n_bands = MINHASH_K // LSH_BAND_SIZE
    for r in wide:
        for band in range(n_bands):
            sig = ",".join(
                str(r[f"_m{band * LSH_BAND_SIZE + j}"])
                for j in range(LSH_BAND_SIZE)
            )
            assert stream_side[(r.doc_id, band)] == sig


def test_stream_candidates_subset_of_batch_pairs(spark, tmp_path):
    """Star-shaped online candidates must be a subset of the batch
    all-pairs output on the same corpus (same buckets, fewer edges)."""
    stream = _write_two_batches(spark, tmp_path)
    _run(streaming_lsh_candidates(stream), "lsh_sub_mem")
    got = {
        tuple(sorted((r.doc_id, r.canonical_doc_id)))
        for r in spark.sql("select * from lsh_sub_mem").collect()
    }
    docs = spark.createDataFrame(
        [(10, BASE), (11, OTHER), (12, BASE), (13, NEAR), (14, "tiny")],
        "doc_id long, text string",
    )
    batch_pairs = {
        tuple(sorted((r.doc_a, r.doc_b)))
        for r in lsh_candidate_pairs(docs).collect()
    }
    assert got <= batch_pairs
    # and the batch near-dup edges to the canonical are all present
    assert {(10, 12), (10, 13)} <= got


def test_streaming_exact_dedup_state_survives_restart(spark, tmp_path):
    """Stop the query, append new files, start a NEW query on the same
    checkpointLocation: duplicates of docs seen before the restart must
    still be swallowed (state store recovery, not per-run memory)."""
    src = str(tmp_path / "docs_src_ckpt")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "survivors")

    def run_once(sink_subdir):
        # memory sink can't recover from a checkpoint; foreachBatch can
        def write(batch_df, batch_id):
            batch_df.write.mode("append").parquet(
                f"{out}/{sink_subdir}"
            )

        stream = spark.readStream.schema("doc_id long, text string").parquet(
            src
        )
        q = (
            streaming_exact_dedup(stream)
            .writeStream.foreachBatch(write)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(
        [(1, BASE), (2, OTHER)], "doc_id long, text string"
    ).coalesce(1).write.parquet(src)
    run_once("run1")
    first = {
        r.doc_id for r in spark.read.parquet(f"{out}/run1").collect()
    }
    assert first == {1, 2}

    spark.createDataFrame(
        [(3, BASE), (4, "brand new content here")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(src)
    run_once("run2")
    second = {
        r.doc_id for r in spark.read.parquet(f"{out}/run2").collect()
    }
    # doc 3 duplicates doc 1 from BEFORE the restart -> swallowed
    assert second == {4}
