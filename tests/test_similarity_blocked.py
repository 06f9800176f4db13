"""r8 optimization: blocked_pair_cosine_scores replaces the bucket/cell
self-join + per-pair kernel in near_dup_pairs_lsh / semantic_dedup /
cosine_near_dup_pairs. These tests pin the contract that made the swap
safe: bit-identical cosines and identical pair sets against the legacy
join formulation (kept here as the spec), including the zero-norm
(NaN -> Arrow NULL -> dropped) edge and the chunked score panel."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigartm_spark.operators.similarity import (
    blocked_pair_cosine_scores,
    near_dup_pairs_lsh,
    pair_cosine_scores,
    semantic_dedup,
    seed_centroids,
    sign_lsh_bucket,
)

SF = "/root/testdata/sf0.001"


def _legacy_join_pairs(bucketed, block_col, threshold):
    """The pre-r8 formulation, verbatim: self-join on the block key with
    both payloads, per-pair Arrow kernel, JVM threshold filter."""
    a = bucketed.select(
        block_col, F.col("vec_id").alias("vec_a"), F.col("embedding").alias("_ea")
    )
    b = bucketed.select(
        block_col, F.col("vec_id").alias("vec_b"), F.col("embedding").alias("_eb")
    )
    pairs = a.join(b, block_col).filter(F.col("vec_a") < F.col("vec_b"))
    return pair_cosine_scores(
        pairs, "_ea", "_eb", [block_col, "vec_a", "vec_b"]
    ).filter(F.col("cosine") >= threshold)


def _sorted(pdf, key):
    return pdf.sort_values(key).reset_index(drop=True)


def test_blocked_pairs_bit_equal_join_path(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    bucketed = emb.withColumn("bucket", sign_lsh_bucket(F.col("embedding"), 4))
    key = ["bucket", "vec_a", "vec_b"]
    want = _sorted(_legacy_join_pairs(bucketed, "bucket", 0.3).toPandas(), key)
    got = _sorted(
        blocked_pair_cosine_scores(bucketed, "bucket", 0.3).toPandas(), key
    )
    assert len(want) > 0  # the threshold actually selects something
    assert len(got) == len(want)
    assert (got[key].to_numpy() == want[key].to_numpy()).all()
    # bit-identical, not allclose: downstream threshold/rounding must
    # be unable to flip a single pair
    assert (got["cosine"].to_numpy() == want["cosine"].to_numpy()).all()


def test_blocked_pairs_chunk_boundaries(spark):
    """A tiny chunk_elems forces many anchor chunks per block; the pair
    set and scores must not depend on the chunking."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    bucketed = emb.withColumn("bucket", sign_lsh_bucket(F.col("embedding"), 2))
    key = ["bucket", "vec_a", "vec_b"]
    one = _sorted(
        blocked_pair_cosine_scores(bucketed, "bucket", 0.2).toPandas(), key
    )
    many = _sorted(
        blocked_pair_cosine_scores(
            bucketed, "bucket", 0.2, chunk_elems=97
        ).toPandas(),
        key,
    )
    assert len(one) == len(many) > 0
    assert (one["cosine"].to_numpy() == many["cosine"].to_numpy()).all()


def test_blocked_pairs_zero_norm_dropped_like_join_path(spark):
    """Zero-norm vectors: the join path's NaN cosine crossed Arrow as
    NULL and died on the isnotnull threshold filter; the blocked kernel
    must drop exactly the same pairs (numpy NaN >= t is False)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("embedding")
    )
    dim = len(emb.select("embedding").first()["embedding"])
    zeros = spark.createDataFrame(
        [(99990001, "z1", [0.0] * dim), (99990002, "z2", [0.0] * dim)],
        "vec_id long, label string, embedding array<double>",
    )
    embz = emb.unionByName(zeros)
    bucketed = embz.withColumn("bucket", sign_lsh_bucket(F.col("embedding"), 4))
    key = ["bucket", "vec_a", "vec_b"]
    want = _sorted(_legacy_join_pairs(bucketed, "bucket", 0.3).toPandas(), key)
    got = _sorted(
        blocked_pair_cosine_scores(bucketed, "bucket", 0.3).toPandas(), key
    )
    assert want["cosine"].notna().all() and got["cosine"].notna().all()
    assert len(got) == len(want)
    assert (got[key].to_numpy() == want[key].to_numpy()).all()
    assert (got["cosine"].to_numpy() == want["cosine"].to_numpy()).all()


def test_blocked_pairs_multi_tile_block(spark):
    """A single block wider than the default 64x512 tile forces the
    multi-tile path (several anchor blocks x several column tiles,
    including the diagonal-overlap mask) at DEFAULT chunk_elems; scores
    must stay bit-identical to the legacy join spec."""
    rng = np.random.default_rng(7)
    n, d = 700, 16
    rows = [
        (i, [float(x) for x in rng.standard_normal(d)]) for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).withColumn("bucket", F.lit(0))
    key = ["bucket", "vec_a", "vec_b"]
    want = _sorted(_legacy_join_pairs(df, "bucket", 0.2).toPandas(), key)
    got = _sorted(
        blocked_pair_cosine_scores(df, "bucket", 0.2).toPandas(), key
    )
    assert len(got) == len(want) > 0
    assert (got[key].to_numpy() == want[key].to_numpy()).all()
    assert (got["cosine"].to_numpy() == want["cosine"].to_numpy()).all()


def test_blocked_pairs_single_and_empty_blocks(spark):
    """Blocks of size 1 emit nothing and do not crash the kernel."""
    df = spark.createDataFrame(
        [(1, "a", [1.0, 0.0]), (2, "b", [0.9, 0.1]), (3, "c", [0.0, 1.0])],
        "vec_id long, label string, embedding array<double>",
    )
    out = blocked_pair_cosine_scores(df, "label", 0.0).toPandas()
    assert len(out) == 0  # every label-block is a singleton


def test_near_dup_lsh_unchanged_results(spark):
    """End-to-end: the rewired operator returns the identical relation
    the join formulation returned (threshold as in the oracle row)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    bucketed = emb.withColumn("bucket", sign_lsh_bucket(F.col("embedding"), 4))
    key = ["bucket", "vec_a", "vec_b"]
    want = _sorted(_legacy_join_pairs(bucketed, "bucket", 0.3).toPandas(), key)
    got = _sorted(near_dup_pairs_lsh(emb, threshold=0.3).toPandas(), key)
    assert list(got.columns) == ["bucket", "vec_a", "vec_b", "cosine"]
    assert len(got) == len(want)
    assert (got["cosine"].to_numpy() == want["cosine"].to_numpy()).all()


def test_semantic_dedup_survivors_unchanged(spark):
    """The one-exchange semantic_dedup returns exactly the survivor set
    of the legacy join shape (assign + join-back + pair self-join)."""
    from bigartm_spark.operators.similarity import ivf_assign

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = seed_centroids(emb, 8)
    got = semantic_dedup(emb, cents, threshold=0.3).toPandas()

    assigned = ivf_assign(emb, cents)
    withe = assigned.select("vec_id", "cell_id").join(
        emb.select("vec_id", "embedding"), "vec_id"
    )
    dup = _legacy_join_pairs(
        withe.withColumnRenamed("cell_id", "bucket"), "bucket", 0.3
    )
    drops = dup.select(F.col("vec_b").alias("vec_id")).distinct()
    want = assigned.join(drops, "vec_id", "left_anti").toPandas()

    key = ["vec_id"]
    got, want = _sorted(got, key), _sorted(want, key)
    assert list(got.columns) == ["vec_id", "label", "cell_id", "centroid_sim"]
    assert len(got) == len(want) > 0
    assert (got["vec_id"].to_numpy() == want["vec_id"].to_numpy()).all()
    assert (got["cell_id"].to_numpy() == want["cell_id"].to_numpy()).all()
    assert (
        got["centroid_sim"].to_numpy() == want["centroid_sim"].to_numpy()
    ).all()


def _explain(df, mode: str = "simple") -> str:
    jqe = df._jdf.queryExecution()
    return df.sparkSession._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        jqe, mode
    )


def test_hot_block_splits_fan_out_bit_identical(spark):
    """r9 skew safety: a block past max_block_rows is hash-split into
    chunk-pair task groups (≥K-way fan-out instead of one |block|² task).
    The pair set and cosine BITS must be identical to the unsplit path
    and to the legacy join spec, the plan must stay one Exchange +
    FlatMapGroupsInPandas with no joins, and duplicate ids must not
    produce (id, id) self-pairs on either path."""
    from bigartm_spark.operators.similarity import _oversized_blocks

    rng = np.random.default_rng(11)
    d = 8
    rows = [
        (0, i, [float(x) for x in rng.standard_normal(d)]) for i in range(260)
    ]
    rows += [
        (1, 1000 + i, [float(x) for x in rng.standard_normal(d)])
        for i in range(30)
    ]
    # duplicate id inside the hot block: the join spec (vec_a < vec_b)
    # never pairs it with itself
    rows.append((0, 7, [float(x) for x in rng.standard_normal(d)]))
    df = spark.createDataFrame(
        rows, "bucket int, vec_id long, embedding array<double>"
    )
    key = ["bucket", "vec_a", "vec_b"]
    # createDataFrame has no size estimate -> "assume big" -> the split
    # decision runs the count-by-block pass on both calls below
    plain = blocked_pair_cosine_scores(
        df, "bucket", 0.2, max_block_rows=10**9
    )
    split = blocked_pair_cosine_scores(df, "bucket", 0.2, max_block_rows=40)
    want = _sorted(_legacy_join_pairs(df, "bucket", 0.2).toPandas(), key)
    p = _sorted(plain.toPandas(), key)
    s = _sorted(split.toPandas(), key)
    assert len(p) == len(s) == len(want) > 0
    assert (p[key].to_numpy() == s[key].to_numpy()).all()
    assert (p["cosine"].to_numpy() == s["cosine"].to_numpy()).all()
    assert (s[key].to_numpy() == want[key].to_numpy()).all()
    assert (s["cosine"].to_numpy() == want["cosine"].to_numpy()).all()
    assert (s["vec_a"] != s["vec_b"]).all()  # no self-pairs
    # ≥K-way fan-out: the hot block (261 rows / cap 40) splits 7 ways ->
    # 7*8/2 = 28 chunk-pair task groups instead of 1
    assert _oversized_blocks(
        df.select("bucket", "vec_id", "embedding"), "bucket", 40
    ) == {0: 7}
    # plan: still exactly one exchange feeding FlatMapGroupsInPandas,
    # pairs never exist as join rows
    plan = _explain(
        blocked_pair_cosine_scores(df, "bucket", 0.2, max_block_rows=40)
    )
    assert "FlatMapGroupsInPandas" in plan
    assert plan.count("Exchange") == 1, plan
    for join in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                 "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert join not in plan, join


def test_small_input_skips_the_sizing_job(spark):
    """Catalyst-estimate gate: a parquet-backed input provably under
    max_block_rows runs NO pre-count job and keeps the r8 single-group
    plan (groupBy(block) only — no _u/_v salt columns). Uses an
    explicit cap the sf0.001 estimate clearly clears — the default
    BLOCK_SPLIT_TARGET is deliberately small enough that mid-size
    inputs DO pay the one sizing job."""
    from bigartm_spark.operators.similarity import BLOCK_ROW_TARGET

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    bucketed = emb.withColumn("bucket", sign_lsh_bucket(F.col("embedding"), 4))
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    out = blocked_pair_cosine_scores(
        bucketed, "bucket", 0.3, max_block_rows=BLOCK_ROW_TARGET
    )
    after = set(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "size-gated path must not run a sizing job"
    plan = _explain(out)
    assert "_chunk" not in plan and "_u" not in plan
    assert plan.count("Exchange") == 1


def test_split_group_cap_fails_fast(spark, monkeypatch):
    """VERDICT r8 #6: the split-path task memory bound is enforced in
    code, not prose — a task group larger than _SPLIT_GROUP_SLACK ×
    max_block_rows raises instead of silently holding an unbounded
    frame. Trigger it by lying to the splitter (sizing pass reports one
    chunk for a block that is far larger), which is exactly the
    source-changed-under-us race the guard exists for."""
    from bigartm_spark.operators import similarity as sim

    rng = np.random.default_rng(3)
    rows = [
        (0, i, [float(x) for x in rng.standard_normal(4)]) for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "bucket int, vec_id long, embedding array<double>"
    )
    # sizing pass claims block 0 needs splitting but only 1 chunk:
    # every row lands in the (0,0) group -> 60 rows > 4 x 10
    monkeypatch.setattr(sim, "_oversized_blocks", lambda *a, **k: {0: 1})
    out = sim.blocked_pair_cosine_scores(df, "bucket", 0.0, max_block_rows=10)
    with pytest.raises(Exception, match="exceeds"):
        out.count()


def test_derive_lsh_bits_scales_with_corpus(spark):
    """bits grows with the estimated corpus size (floor 4, cap 24) so
    the default near_dup_pairs_lsh bucket population stays bounded."""
    from bigartm_spark.operators.similarity import (
        BLOCK_ROW_TARGET,
        derive_lsh_bits,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    assert derive_lsh_bits(emb) == 4  # tiny corpus keeps the default
    # no estimate -> default
    local = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    assert derive_lsh_bits(local) == 4
    # a corpus estimated at ~2^20 x target rows needs 20 bits; the cap
    # holds at 24 for anything larger
    assert derive_lsh_bits(emb, target_bucket_rows=1) > 4
    big = derive_lsh_bits(emb, target_bucket_rows=1)
    assert big <= 24
