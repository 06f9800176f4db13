"""Production-vs-oracle hash variants and the shingle-df cap: the
xxhash64 paths are bench-only, so pin their semantics against the
oracle-paired md5 paths here."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark):
    rows = []
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    for d in range(20):
        text = base if d % 5 == 0 else f"{base} variant {d} " + " ".join(
            f"w{d}x{j}" for j in range(6)
        )
        rows.append((d, text))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_hash_variants_agree_on_duplicates(spark):
    """Exact-duplicate docs collide in EVERY band under both hash
    functions; candidate pairs found by md5 LSH on identical docs are
    found by xxhash64 LSH too."""
    from bigartm_spark.operators.dedup import lsh_candidate_pairs

    docs = _docs(spark)
    dup_pairs = {(a, b) for a in (0, 5, 10, 15) for b in (0, 5, 10, 15) if a < b}
    for hash_fn in ("md5", "xxhash64"):
        got = {
            (r["doc_a"], r["doc_b"])
            for r in lsh_candidate_pairs(docs, hash_fn=hash_fn).collect()
        }
        assert dup_pairs <= got, (hash_fn, got)


def test_simhash_variants_rank_duplicates_identical(spark):
    """simhash(xxhash64) gives identical hashes for identical texts and
    (like md5) differing hashes across unrelated texts."""
    from bigartm_spark.operators.dedup import simhash

    docs = _docs(spark)
    for hash_fn in ("md5", "xxhash64"):
        sim = {r["doc_id"]: r["simhash"] for r in simhash(docs, hash_fn=hash_fn).collect()}
        assert sim[0] == sim[5] == sim[10] == sim[15], hash_fn
        assert len(set(sim.values())) > 1, hash_fn


def test_ngram_jaccard_shingle_df_cap(spark):
    """The df cap drops near-universal shingles from the index: with a
    tiny cap the boilerplate-only pairs disappear, with cap=None the
    exact Jaccard returns."""
    from bigartm_spark.operators.dedup import ngram_jaccard_pairs

    docs = _docs(spark)
    uncapped = ngram_jaccard_pairs(docs, threshold=0.05, max_shingle_df=None)
    capped = ngram_jaccard_pairs(docs, threshold=0.05, max_shingle_df=3)
    n_un, n_cap = uncapped.count(), capped.count()
    assert n_un > 0
    # base-sentence shingles appear in all 20 docs -> removed by cap=3;
    # only the 4 identical docs (sharing nothing else) can still pair...
    # and they share ONLY capped shingles, so the capped index yields fewer pairs
    assert n_cap < n_un


def test_dedup_clusters_components(spark):
    """Min-label propagation: two separate chains resolve to their own
    canonical mins; isolated docs don't appear."""
    from bigartm_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        # component {1,2,3,9} (chain) and {5,7}
        [(1, 2), (2, 3), (3, 9), (5, 7)],
        "doc_a long, doc_b long",
    )
    got = {r["doc_id"]: r["canonical"] for r in dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 7: 5}


def test_deduplicate_corpus(spark):
    """Exact dups collapse to min doc_id; LSH near-dup clusters keep the
    canonical only; distinct docs survive."""
    from bigartm_spark.operators.dedup import deduplicate_corpus

    from bigartm_spark.operators.dedup import (
        dedup_clusters,
        lsh_candidate_pairs,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base), (2, base),                      # exact dup pair -> keep 1
        (3, base + " " + base),                    # near-dup (same shingle core)
        (4, "totally different text with unique content words only"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    survivors = {r["doc_id"] for r in deduplicate_corpus(docs).collect()}
    assert 1 in survivors and 4 in survivors
    assert 2 not in survivors  # exact dup always collapses
    # LSH banding is probabilistic per fixture: assert self-consistency —
    # survivors == exact canonicals minus LSH-cluster non-canonicals
    exact_canon = {1, 3, 4}
    pairs = lsh_candidate_pairs(
        docs.filter(F.col("doc_id").isin(list(exact_canon)))
    ).select("doc_a", "doc_b")
    dropped = {
        r["doc_id"]
        for r in dedup_clusters(pairs).collect()
        if r["doc_id"] != r["canonical"]
    }
    assert survivors == exact_canon - dropped


def test_empty_word_hash_constant_matches_engine(spark):
    """EMPTY_WORD_HASH_XX64 is hardcoded (streaming column builders have
    no session to query) — pin it against the engine so a Spark-side
    seed/algorithm change can never silently pass empty words into the
    minhash shingle stream."""
    from bigartm_spark.operators.dedup import EMPTY_WORD_HASH_XX64

    assert spark.sql("SELECT xxhash64('')").first()[0] == EMPTY_WORD_HASH_XX64


def test_minhash_xxhash64_ignores_extra_whitespace(spark):
    """The numeric-shingle path must tokenize exactly like words_col:
    runs of spaces produce empty split cells whose hashes are removed,
    so signatures are invariant to extra/trailing whitespace."""
    from bigartm_spark.operators.dedup import minhash_signatures

    a = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(0, "  alpha  beta gamma  delta epsilon ")],
        "doc_id long, text string",
    )
    sa = sorted((r.sig_idx, r.minhash) for r in minhash_signatures(a).collect())
    sb = sorted((r.sig_idx, r.minhash) for r in minhash_signatures(b).collect())
    assert sa == sb and len(sa) == 8


def test_minhash_jaccard_estimate_matches_legacy_join_shape(spark):
    """r9: minhash_jaccard_estimate keeps each colliding pair at its
    first colliding band (map-side exact dedup) and computes agreement
    from signatures carried through the band join. Pin the result
    identical to the legacy shape — distinct candidate pairs joined back
    against the wide signature rows — on a fixture with multi-band
    collisions (exact dups collide in EVERY band)."""
    from bigartm_spark.operators.dedup import (
        MINHASH_K,
        _minhash_wide,
        lsh_candidate_pairs,
        minhash_jaccard_estimate,
        release_dedup_caches,
    )

    docs = _docs(spark)
    for hash_fn in ("md5", "xxhash64"):
        got = sorted(
            tuple(r)
            for r in minhash_jaccard_estimate(docs, hash_fn=hash_fn).collect()
        )
        wide = _minhash_wide(docs, 3, hash_fn)
        cand = (
            lsh_candidate_pairs(docs, 3, hash_fn)
            .select("doc_a", "doc_b")
            .distinct()
        )
        a = wide.select(
            F.col("doc_id").alias("doc_a"),
            *[F.col(f"_m{i}").alias(f"_a{i}") for i in range(MINHASH_K)],
        )
        b = wide.select(
            F.col("doc_id").alias("doc_b"),
            *[F.col(f"_m{i}").alias(f"_b{i}") for i in range(MINHASH_K)],
        )
        matches = sum(
            F.when(F.col(f"_a{i}") == F.col(f"_b{i}"), 1).otherwise(0)
            for i in range(MINHASH_K)
        )
        want = sorted(
            tuple(r)
            for r in cand.join(a, "doc_a")
            .join(b, "doc_b")
            .select(
                "doc_a",
                "doc_b",
                (matches.cast("double") / F.lit(float(MINHASH_K))).alias(
                    "est_jaccard"
                ),
            )
            .collect()
        )
        release_dedup_caches()
        assert len(got) == len(want) > 0, hash_fn
        assert got == want, hash_fn


def test_lsh_unique_pairs_matches_distinct_candidates(spark):
    """r9: lsh_unique_pairs dedupes inside the band join (first-band
    filter) — its pair SET must equal distinct(lsh_candidate_pairs) with
    no duplicate rows, under both hash variants, on a fixture where
    exact dups collide in every band."""
    from bigartm_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_unique_pairs,
        release_dedup_caches,
    )

    docs = _docs(spark)
    for hash_fn in ("md5", "xxhash64"):
        got = [tuple(r) for r in lsh_unique_pairs(docs, hash_fn=hash_fn).collect()]
        want = sorted(
            tuple(r)
            for r in lsh_candidate_pairs(docs, hash_fn=hash_fn)
            .select("doc_a", "doc_b")
            .distinct()
            .collect()
        )
        release_dedup_caches()
        assert len(got) == len(set(got)), hash_fn  # truly unique rows
        assert sorted(got) == want, hash_fn
        assert len(want) > 0, hash_fn


def test_dedup_clusters_assume_unique_matches_default(spark):
    """assume_unique=True skips the input distinct (the caller
    guarantees one row per pair) — labels must be identical to the
    default path on unique input."""
    from bigartm_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 7), (8, 9), (9, 10)],
        "doc_a long, doc_b long",
    )
    want = {r["doc_id"]: r["canonical"] for r in dedup_clusters(pairs).collect()}
    got = {
        r["doc_id"]: r["canonical"]
        for r in dedup_clusters(pairs, assume_unique=True).collect()
    }
    assert got == want == {1: 1, 2: 1, 3: 1, 5: 5, 7: 5, 8: 8, 9: 8, 10: 8}


def test_dedup_clusters_band_duplicate_pairs_are_deduped(spark):
    """The CC loop dedupes its pair input (LSH hands one row per
    colliding band): duplicate and reversed duplicates must not change
    the labels."""
    from bigartm_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (1, 2), (1, 2), (2, 3), (5, 7), (5, 7)],
        "doc_a long, doc_b long",
    )
    got = {r["doc_id"]: r["canonical"] for r in dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 7: 5}


def test_dedup_clusters_frontier_long_chain(spark):
    """r9 frontier propagation: a path graph of diameter 9 needs many
    rounds where the frontier (changed nodes) shrinks to the chain's
    moving head — labels must still converge to the global min exactly
    as full propagation does (per-round equality is the invariant: an
    unchanged node's message is already folded into every neighbor)."""
    import warnings as _warnings

    from bigartm_spark.operators.dedup import dedup_clusters

    # path 20-19-...-11 (descending ids so the min label must travel the
    # full diameter), plus a reversed-duplicate edge and a 2-clique
    edges = [(i - 1, i) for i in range(12, 21)] + [(12, 11), (30, 31)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")  # converges -> no warning
        got = {
            r["doc_id"]: r["canonical"]
            for r in dedup_clusters(pairs, max_iterations=20).collect()
        }
    want = {i: 11 for i in range(11, 21)}
    want.update({30: 30, 31: 30})
    assert got == want


def test_dedup_clusters_nonconvergence_warns(spark):
    """max_iterations below the component diameter still warns (the
    frontier rewrite must not change the convergence accounting)."""
    import warnings as _warnings

    from bigartm_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(i - 1, i) for i in range(2, 9)], "doc_a long, doc_b long"
    )
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        out = dedup_clusters(pairs, max_iterations=2)
        out.collect()
        assert any("did not converge" in str(x.message) for x in w)
