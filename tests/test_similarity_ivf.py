"""IVF ANN: assignment coverage, Lloyd refinement, probe recall, and a
real-text ARTM fit over the documents corpus view."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_ivf_assign_partitions_everything(spark, sf_dir):
    from bigartm_spark.operators.similarity import ivf_assign, seed_centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = seed_centroids(emb, 8)
    assigned = ivf_assign(emb, cents)
    assert assigned.count() == emb.count()  # every vector in exactly one cell
    n_cells = assigned.select("cell_id").distinct().count()
    assert 1 < n_cells <= 8


def test_ivf_lloyd_refinement_improves_quantization(spark, sf_dir):
    from bigartm_spark.operators.similarity import (
        ivf_assign,
        ivf_refine_centroids,
        seed_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    seeds = seed_centroids(emb, 8).cache()
    refined = ivf_refine_centroids(emb, seeds, iterations=2).cache()

    def mean_sim(cents):
        return (
            ivf_assign(emb, cents).agg(F.avg("centroid_sim")).collect()[0][0]
        )

    assert mean_sim(refined) >= mean_sim(seeds) - 1e-9


def test_ivf_probe_recall_vs_brute_force(spark, sf_dir):
    from bigartm_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        seed_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    cents = seed_centroids(emb, 4)
    exact = {r["vec_id"] for r in brute_force_topk(emb, 0, 5).collect()}
    # probing every cell must recover the exact result
    full_probe = {
        r["vec_id"] for r in ivf_topk(emb, cents, 0, 5, n_probe=4).collect()
    }
    assert full_probe == exact
    # 1-probe returns 5 candidates from the query's own cell
    one = ivf_topk(emb, cents, 0, 5, n_probe=1).collect()
    assert len(one) == 5


def test_artm_on_real_text_corpus(spark, sf_dir):
    from bigartm_spark.corpus import docs_from_documents
    from bigartm_spark.model.artm import ARTM
    from bigartm_spark.operators.dictionary import gather_dictionary
    from bigartm_spark.operators.topk import top_tokens

    docs = docs_from_documents(spark, sf_dir).cache()
    m = ARTM(num_topics=4, num_document_passes=3, seed=21)
    m.initialize(gather_dictionary(docs))
    m.fit_offline(docs, num_collection_passes=2)
    ppl = m.score_tracker["perplexity"]
    assert ppl[-1] <= ppl[0] * 1.0001
    top = top_tokens(m.get_phi_long(), k=5).collect()
    assert len(top) == 20  # 4 topics x 5 real word tokens
    assert all(r["token"].isalpha() for r in top)


def test_kmeans_parallel_seed_deterministic(spark):
    """k-means|| seeding: k centroids, deterministic across invocations
    (xxhash-style pseudo-randomness, not rand()), usable by ivf_assign."""
    from bigartm_spark.operators.similarity import (
        ivf_assign,
        kmeans_parallel_seed,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    c1 = kmeans_parallel_seed(emb, k=8, rounds=2)
    c2 = kmeans_parallel_seed(emb, k=8, rounds=2)
    r1 = sorted((r["cell_id"], tuple(r["centroid"])) for r in c1.collect())
    r2 = sorted((r["cell_id"], tuple(r["centroid"])) for r in c2.collect())
    assert r1 == r2
    assert len(r1) == 8
    assert len({c for _, c in r1}) == 8  # all distinct
    assigned = ivf_assign(emb, c1)
    per_cell = assigned.groupBy("cell_id").count().collect()
    # seeding spread: a healthy majority of cells get members
    assert len(per_cell) >= 4
    assert sum(r["count"] for r in per_cell) == 500


def test_seed_uniform_pythonhashseed_independent():
    """The kmeans|| uniform must not depend on CPython hash() /
    PYTHONHASHSEED (r2 ADVICE): identical values from subprocesses
    launched with different hash seeds."""
    import os
    import subprocess
    import sys

    code = (
        "import numpy as np;"
        "from bigartm_spark.functions.hashing import int_uniform_np;"
        "print(','.join('%.17g' % x for x in int_uniform_np(np.arange(64), 2)))"
    )
    outs = []
    for hs in ("0", "1", "random"):
        env = dict(os.environ, PYTHONHASHSEED=hs, PYTHONPATH="/root/repo")
        outs.append(
            subprocess.check_output([sys.executable, "-c", code], env=env)
        )
    assert outs[0] == outs[1] == outs[2]


def test_kmeans_seed_round0_matches_loop_semantics(spark):
    """kmeans_seed_round0 (the oracle face) must agree with what the
    production loop would pick in round 0: same uniform, same predicate."""
    from bigartm_spark.operators.similarity import kmeans_seed_round0

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    out = kmeans_seed_round0(emb, k=8).collect()
    assert len(out) == emb.count()
    picked = [r for r in out if r["picked"] == 1]
    # the candidate itself has d2 = 0 -> never picked; some others are
    assert 0 < len(picked) < len(out)
    for r in out:
        assert 0.0 <= r["u"] < 1.0
        assert r["d2"] >= 0.0


def test_ivf_persisted_index_prunes_and_matches(spark, sf_dir, tmp_path):
    from bigartm_spark.operators.similarity import (
        brute_force_topk,
        ivf_build_index,
        ivf_query_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    idx = str(tmp_path / "ivf_idx")
    ivf_build_index(emb, idx, k_cells=4)

    # index is complete: every vector landed in exactly one cell partition
    vectors = spark.read.parquet(f"{idx}/vectors.parquet")
    assert vectors.count() == emb.count()

    # probing every cell == brute force (same ranking contract)
    exact = [
        (r["vec_id"], r["rank"])
        for r in brute_force_topk(emb, 0, 5).collect()
    ]
    full = [
        (r["vec_id"], r["rank"])
        for r in ivf_query_index(
            spark, idx, query_id=0, k=5, n_probe=4
        ).collect()
    ]
    assert full == exact

    # a 1-probe scan reads ONLY the probed cell's directory: the literal
    # IN filter must land in PartitionFilters, not a post-scan Filter
    one = ivf_query_index(spark, idx, query_id=0, k=5, n_probe=1)
    plan = one._jdf.queryExecution().executedPlan().toString()
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)", plan)
    assert pf and "cell_id" in pf.group(1), plan[:2000]
    cells = {r["cell_id"] for r in one.collect()}
    assert len(cells) == 1
