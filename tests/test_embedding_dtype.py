"""Embedding dtype contract: every similarity entry point must produce
identical results whether the parquet writer shipped the embedding
column as list<float> or list<double>.

Same defensive posture as functions/timeutil.normalize_ts for event
timestamps: the driver's testdata generator (pandas/pyarrow) controls
the physical type, it has changed between rounds before (events ts), and
an operator that bakes in one element type fails analysis — or worse,
silently changes precision — on the other."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def vec_dirs(tmp_path_factory):
    """The same 40 deterministic vectors written twice: float32 list and
    float64 list. float64 values are EXACT float32 values widened, so
    both readers see identical reals."""
    rng = np.random.RandomState(7)
    vecs = rng.rand(40, 8).astype(np.float32)
    ids = np.arange(40, dtype=np.int64)
    labels = (ids % 3).astype(np.int32)
    out = {}
    for dtype, pa_type in [("f32", pa.float32()), ("f64", pa.float64())]:
        d = tmp_path_factory.mktemp(f"emb_{dtype}")
        table = pa.table(
            {
                "vec_id": pa.array(ids),
                "embedding": pa.array(
                    [v.astype(np.float64) for v in vecs], pa.list_(pa_type)
                ),
                "label": pa.array(labels),
            }
        )
        pq.write_table(table, str(d / "embeddings.parquet"))
        out[dtype] = str(d / "embeddings.parquet")
    return out


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_schema_differs_but_results_match(spark, vec_dirs):
    from bigartm_spark.operators.similarity import (
        brute_force_topk,
        lsh_bucketed_topk,
    )

    f32 = spark.read.parquet(vec_dirs["f32"])
    f64 = spark.read.parquet(vec_dirs["f64"])
    assert dict(f32.dtypes)["embedding"] == "array<float>"
    assert dict(f64.dtypes)["embedding"] == "array<double>"

    for fn in [
        lambda e: brute_force_topk(e, query_id=0, k=5),
        lambda e: lsh_bucketed_topk(e, query_id=0, k=5, bits=2),
    ]:
        a = _rows(fn(f32), ["vec_id", "rank"])
        b = _rows(fn(f64), ["vec_id", "rank"])
        assert a == b


def test_kmeans_and_ivf_dtype_parity(spark, vec_dirs):
    from bigartm_spark.operators.similarity import (
        ivf_assign,
        kmeans_parallel_seed,
    )

    f32 = spark.read.parquet(vec_dirs["f32"])
    f64 = spark.read.parquet(vec_dirs["f64"])
    c32 = kmeans_parallel_seed(f32, k=4)
    c64 = kmeans_parallel_seed(f64, k=4)
    a32 = _rows(ivf_assign(f32, c32), ["vec_id", "cell_id"])
    a64 = _rows(ivf_assign(f64, c64), ["vec_id", "cell_id"])
    assert a32 == a64


def test_semantic_dedup_dtype_parity(spark, vec_dirs):
    from bigartm_spark.operators.similarity import (
        kmeans_parallel_seed,
        semantic_dedup,
    )

    f32 = spark.read.parquet(vec_dirs["f32"])
    f64 = spark.read.parquet(vec_dirs["f64"])
    s32 = _rows(
        semantic_dedup(f32, kmeans_parallel_seed(f32, k=4), threshold=0.95),
        ["vec_id"],
    )
    s64 = _rows(
        semantic_dedup(f64, kmeans_parallel_seed(f64, k=4), threshold=0.95),
        ["vec_id"],
    )
    assert s32 == s64
