"""Executor-storage lifecycle: fits and composed dedup runs must not
accrete cached relations or broadcast blocks across passes (r2 VERDICT
"What's wrong" #2/#3 — broadcast/cache lifecycle).

Plan-level caches are pinned by the CacheManager until an explicit
unpersist, so "does the persistent-RDD set grow?" is the observable;
phi broadcasts are tracked in estep._ISSUED_PHI_BROADCASTS.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigartm_spark.model import estep
from bigartm_spark.model.artm import ARTM
from bigartm_spark.operators import dedup
from bigartm_spark.operators.dictionary import gather_dictionary


def _n_cached_rdds(spark, settle: bool = False) -> int:
    """Entries the CacheManager / block manager still holds. With
    ``settle``, drive Python + JVM GC first: retired phi localCheckpoint
    RDDs are freed by the ContextCleaner once unreferenced (that is the
    designed mechanism for checkpoint blocks — unlike plan-level caches
    and broadcasts, which need the explicit releases under test here)."""
    import gc
    import time

    def n():
        return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

    if settle:
        for _ in range(10):
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.5)
            if n() <= 3:
                break
    return n()


def test_fit_offline_does_not_accrete_broadcasts_or_caches(spark, docs):
    m = ARTM(num_topics=3, num_document_passes=2, seed=7)
    m.initialize(gather_dictionary(docs))
    m.fit_offline(docs, num_collection_passes=3)
    mid_b = len(estep._ISSUED_PHI_BROADCASTS)
    mid_c = _n_cached_rdds(spark, settle=True)
    m.fit_offline(docs, num_collection_passes=7)
    # the per-pass phi broadcasts are released as passes retire: the
    # registry must not grow with pass count (fit end releases all)
    assert len(estep._ISSUED_PHI_BROADCASTS) == 0
    assert mid_b <= 1
    # storage must not grow with pass count either (one live phi +
    # small slack; retired checkpoint blocks fall to the ContextCleaner)
    assert _n_cached_rdds(spark, settle=True) <= mid_c + 1
    assert all(
        abs(v) < float("inf") for v in m.score_tracker["perplexity"]
    )


def test_deduplicate_corpus_releases_tracked_caches(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    before = _n_cached_rdds(spark)
    out = dedup.deduplicate_corpus(docs, hash_fn="xxhash64")
    n = out.count()
    assert n > 0
    # every intermediate cache (bands, wide sigs, per-round labels) is
    # released by the composed op itself — nothing left tracked, and the
    # CacheManager set is back to the baseline, EXCEPT the one tiny drop
    # list each live result deliberately pins (localCheckpoint inside
    # deduplicate_corpus; freed by the ContextCleaner when the result
    # is dropped). settle=True absorbs the cleaner's GC timing.
    assert dedup._TRACKED_CACHES == []
    assert _n_cached_rdds(spark, settle=True) <= before + 1
    # running it again must not stack a second generation of
    # intermediates: with BOTH results alive the only growth allowed is
    # the second result's own pinned drop list
    out2 = dedup.deduplicate_corpus(docs, hash_fn="xxhash64")
    assert out2.count() == n
    assert dedup._TRACKED_CACHES == []
    assert _n_cached_rdds(spark, settle=True) <= before + 2


def test_release_dedup_caches_standalone(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    pairs = dedup.lsh_candidate_pairs(docs)
    assert pairs.count() >= 0
    assert len(dedup._TRACKED_CACHES) >= 1  # bands cache live for reuse
    dedup.release_dedup_caches()
    assert dedup._TRACKED_CACHES == []
    # the relation is still correct after release (recomputes uncached)
    assert pairs.count() >= 0


def test_dedup_clusters_one_job_per_round_and_warns(spark):
    import warnings

    # a diameter-5 chain: 0-1-2-3-4-5 -> converges to canonical 0
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "doc_a long, doc_b long"
    )
    out = dedup.dedup_clusters(pairs)
    rows = {r["doc_id"]: r["canonical"] for r in out.collect()}
    assert rows == {i: 0 for i in range(6)}
    # non-convergence warning: same chain, one round allowed
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        dedup.dedup_clusters(pairs, max_iterations=1).collect()
        assert any("did not converge" in str(x.message) for x in w)
