"""operators/packing.py: concat-and-chunk sequence packing semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigartm_spark.operators.packing import pack_sequences, packing_stats


@pytest.fixture(scope="module")
def toks(spark):
    # one shard (n_shards=1) keeps the layout hand-checkable
    rows = [(0, 100), (1, 100), (2, 100), (3, 50), (4, 0), (5, 306)]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_offsets_are_contiguous(toks):
    out = {
        r["doc_id"]: r
        for r in pack_sequences(toks, budget=256, n_shards=1).collect()
    }
    assert out[0]["start_offset"] == 0 and out[0]["end_offset"] == 100
    assert out[1]["start_offset"] == 100
    assert out[2]["start_offset"] == 200
    assert out[3]["start_offset"] == 300
    assert out[4]["start_offset"] == 350  # zero-length doc sits in place
    assert out[5]["start_offset"] == 350 and out[5]["end_offset"] == 656


def test_pack_ids_and_boundaries(toks):
    out = {
        r["doc_id"]: r
        for r in pack_sequences(toks, budget=256, n_shards=1).collect()
    }
    # doc2 spans 200..300, crossing the 256 boundary
    assert out[2]["crosses_boundary"] == 1
    assert out[0]["crosses_boundary"] == 0
    assert out[4]["crosses_boundary"] == 0  # empty doc never crosses
    # pack index = start_offset div budget (shard 0 -> no id offset)
    assert out[0]["pack_id"] == 0
    assert out[3]["pack_id"] == 1
    assert out[5]["pack_id"] == 1  # starts at 350
    # doc5 spans 350..656, crossing 512
    assert out[5]["crosses_boundary"] == 1


def test_sharding_is_deterministic_and_partitioned(toks):
    a = pack_sequences(toks, budget=256, n_shards=4)
    b = pack_sequences(toks.repartition(7), budget=256, n_shards=4)
    assert a.exceptAll(b).count() == 0
    shards = {r["shard"] for r in a.select("shard").distinct().collect()}
    assert shards == {0, 1, 2, 3} - (
        {3} if 3 not in {d % 4 for d in range(6)} else set()
    )


def test_packing_stats_fill_ratio(toks):
    packed = pack_sequences(toks, budget=256, n_shards=1)
    stats = packing_stats(packed, budget=256).collect()
    assert len(stats) == 1
    s = stats[0]
    assert s["n_docs"] == 6
    assert s["total_tokens"] == 656
    assert s["n_packs"] == 2  # packs 0 and 1 started (656 tokens)
    assert s["n_boundary_docs"] == 2
    assert s["fill_ratio"] == pytest.approx(656 / (2 * 256))
