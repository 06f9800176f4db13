"""Deduplication operators for large-scale training-data pipelines.

All operate on a documents table (doc_id, text). Scale design:
- exact: one hash-groupBy shuffle on a 128-bit digest.
- minhash/LSH: shingle explode -> per-doc signature agg -> band-bucket
  join; candidate verification is restricted to bucket collisions, never
  all-pairs. This is the standard shingle->minhash->band->bucket-join
  pipeline; every stage is a plain shuffle Catalyst can size with AQE.
- simhash: one pass of bit-vote aggregation per doc.
- n-gram Jaccard: shingle inverted-index self-join (|pairs sharing a
  shingle|, not |docs|^2).

Randomness is the portable mod-prime generator so every operator has a
DuckDB-replayable oracle.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

# MinHash: k independent permutations = md5 over seed-prefixed shingles,
# minimum taken in lexicographic hex order. md5 is a JVM intrinsic on the
# Spark side (whole-stage codegen, no interpreted lambdas) and identical
# in DuckDB, so signatures match byte-for-byte.
MINHASH_K = 8
LSH_BAND_SIZE = 2  # 8 sigs -> 4 bands of 2

# Intermediate caches created inside the ops below (band relations,
# wide signatures, shingle indexes). A long-lived session composing
# them would otherwise accrete executor storage until LRU eviction;
# the composed ops (deduplicate_corpus) release after their consuming
# action, and any caller can call release_dedup_caches() once done.
_TRACKED_CACHES: list[DataFrame] = []


def _tracked_cache(df: DataFrame) -> DataFrame:
    out = df.cache()
    _TRACKED_CACHES.append(out)
    return out


def release_dedup_caches() -> None:
    """Unpersist every intermediate relation cached by the dedup ops.
    Safe at any time: a consumer whose plan still references one simply
    recomputes it uncached."""
    while _TRACKED_CACHES:
        try:
            _TRACKED_CACHES.pop().unpersist()
        except Exception:
            pass


def words_col(text=None) -> F.Column:
    """Whitespace tokens, empties dropped — byte-identical to the oracle's
    list_filter(string_split(...)). (No F.col default arg: that would need
    an active SparkContext at import time.)"""
    if text is None:
        text = F.col("text")
    return F.filter(F.split(text, " "), lambda w: F.length(w) > 0)


def shingles_col(n: int = 3, text=None) -> F.Column:
    """Word n-gram shingles joined by single spaces."""
    ws = words_col(text)
    k = F.size(ws) - (n - 1)
    # sequence(1, 0) would DESCEND in Spark — guard the short-doc case
    idx = F.when(k >= 1, F.sequence(F.lit(1), k)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(ws, i + j) for j in range(n)]
        ),
    )


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Exact dedup on md5(text): (text_md5, n_dups, canonical_doc_id).

    Tiny inputs coalesce to ONE partition first: a groupBy over a
    SinglePartition child needs no exchange, so the whole query is one
    stage (measured 0.17s -> 0.10s at sf0.1; estimate-gated, the
    at-scale one-shuffle plan is untouched)."""
    from bigartm_spark.session import coalesce_if_small

    documents = coalesce_if_small(documents, target=1)
    return (
        documents.select("doc_id", F.md5("text").alias("text_md5"))
        .groupBy("text_md5")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
    )


def _spread(documents: DataFrame) -> DataFrame:
    """Small-file inputs arrive as one partition; the per-row shingle/hash
    work is the expensive part, so spread rows across the cluster first
    (the shuffle moves only the raw docs, cheap relative to the explode).

    The target is SIZE-aware: ~1 MB of raw docs per task, capped at the
    cluster parallelism, floored at 4 — a sub-MB input doesn't pay
    32-task scheduling (measured 2x on the sf0.1 bench), while a 100 TB
    scan already arrives in thousands of parquet splits and skips the
    repartition entirely via the partition-count check. The budget is
    deliberately much smaller than a scan-sized 16-128 MB split: the
    downstream explode+k-hash work is ~100-300x the raw doc bytes
    (shingle strings x MINHASH_K hashes), so 1 MB raw is already
    seconds of per-task compute and a mid-size input (tens of MB on a
    32-core cluster) gets full parallelism for its map stage. Measured
    honestly: an interleaved same-process A/B at sf10 (58 MB docs,
    1 MB -> 32 map tasks vs 16 MB -> 4) showed PARITY on the lsh/
    jaccard pipelines (32-36s / 40-46s both legs) — their wall is the
    104M-row pair shuffle, not the map stage — and sf0.1 (584 KB) hits
    the 4-task floor under either budget, so the smaller budget is
    free insurance for map-stage-bound callers, not a measured win."""
    from bigartm_spark.session import estimated_plan_bytes

    sc = documents.sparkSession.sparkContext
    target = sc.defaultParallelism
    sz = estimated_plan_bytes(documents)
    if sz is not None:  # unknown size -> assume big, keep full spread
        target = min(target, max(4, int(sz // (1 << 20)) + 1))
    if documents.rdd.getNumPartitions() < target:
        return documents.repartition(target)
    return documents


def doc_shingles(
    documents: DataFrame, n: int = 3, distinct: bool = True
) -> DataFrame:
    """(doc_id, shingle); ``distinct=True`` gives set semantics (a full
    shuffle — only pay it where sets matter, e.g. Jaccard)."""
    sh = _spread(documents).select(
        "doc_id", F.explode(shingles_col(n)).alias("shingle")
    )
    return sh.distinct() if distinct else sh


def _perm_hash(i: int, hash_fn: str) -> F.Column:
    """Permutation-i hash of the shingle column. ``md5`` (hex string,
    DuckDB-replayable — used by the oracle-paired plans) or ``xxhash64``
    (64-bit long, the faster production default: one intrinsic, no
    string concat/hex encode)."""
    if hash_fn == "md5":
        return F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))
    if hash_fn == "xxhash64":
        return F.xxhash64(F.lit(i), F.col("shingle"))
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


# xxhash64('') under Spark's fixed seed 42 — an algorithmic constant
# (the algorithm and seed are part of Spark's stable function contract);
# pinned against the engine by test_dedup_variants.
EMPTY_WORD_HASH_XX64 = -7444071767201028348


def hashed_words_col(text=None) -> F.Column:
    """Per-word xxhash64 longs, empty words dropped by removing the
    empty-string hash (a 2^-64 collision with a real word is below any
    sketch's error floor) — the numeric-tokenization front end shared by
    the batch and streaming xxhash64 minhash paths."""
    if text is None:
        text = F.col("text")
    return F.array_remove(
        F.transform(F.split(text, " "), lambda w: F.xxhash64(w)),
        EMPTY_WORD_HASH_XX64,
    )


def hashed_shingles_col(hs: F.Column, n: int = 3) -> F.Column:
    """Shingle hashes as longs: xxhash64 over each run of n consecutive
    word hashes (no shingle strings ever built). ``hs`` must be a
    PRE-PROJECTED word-hash array column (``hashed_words_col`` behind a
    select) — inlining the array expression here would make Catalyst
    re-evaluate it n times per row (measured 2x slower at sf0.1)."""
    k = F.size(hs) - (n - 1)
    idx = F.when(k >= 1, F.sequence(F.lit(1), k)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.xxhash64(*[F.element_at(hs, i + j) for j in range(n)]),
    )


def _minhash_wide(
    documents: DataFrame, n: int = 3, hash_fn: str = "xxhash64"
) -> DataFrame:
    """(doc_id, _m0.._m{k-1}): k permutation minima per doc.

    min() is duplicate-insensitive, so the exploded shingles are fed
    WITHOUT a distinct: map-side partial aggregation collapses every
    partition to ≤k values per doc before the single shuffle — the
    distinct would itself be a full shuffle of the exploded relation
    and buys nothing (r1 bench: 12.2s -> this shape).

    The xxhash64 production path never materializes shingle STRINGS:
    words are hashed once to longs (empty words dropped by removing the
    empty-string hash — a 2^-64 collision with a real word is below the
    sketch's own error floor), a shingle hash is xxhash64 over the n
    consecutive word hashes, and permutation i re-hashes that single
    long — O(|words|) string hashes instead of O(|words| x k) string
    hashes over n-times-longer concatenations (2.4x end-to-end at
    sf0.1: 0.85s -> 0.36s). The md5 path keeps string shingles: its hex
    minima are replayed verbatim by the DuckDB oracle."""
    if hash_fn == "xxhash64":
        sh = (
            _spread(documents)
            .select("doc_id", hashed_words_col().alias("_hw"))
            .select(
                "doc_id",
                F.explode(hashed_shingles_col(F.col("_hw"), n)).alias("h"),
            )
        )
        aggs = [
            F.min(F.xxhash64(F.lit(i), F.col("h"))).alias(f"_m{i}")
            for i in range(MINHASH_K)
        ]
        return sh.groupBy("doc_id").agg(*aggs)
    sh = doc_shingles(documents, n, distinct=False)
    aggs = [
        F.min(_perm_hash(i, hash_fn)).alias(f"_m{i}") for i in range(MINHASH_K)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_signatures(
    documents: DataFrame, n: int = 3, hash_fn: str = "xxhash64"
) -> DataFrame:
    """(doc_id, sig_idx, minhash): k permutation minima over the doc's
    shingle set; permutation i hashes the shingle with seed i, minimum in
    the hash type's natural order (lexicographic for md5 hex, numeric for
    xxhash64). One explode + one groupBy with k min() aggregates — all
    codegen, no interpreted lambdas, no distinct."""
    per_doc = _minhash_wide(documents, n, hash_fn)
    return per_doc.select(
        "doc_id",
        F.posexplode(
            F.array(*[F.col(f"_m{i}") for i in range(MINHASH_K)])
        ).alias("sig_idx", "minhash"),
    )


def lsh_candidate_pairs(
    documents: DataFrame, n: int = 3, hash_fn: str = "xxhash64"
) -> DataFrame:
    """MinHash-LSH: band the signature, bucket-join, emit candidate pairs
    (doc_a < doc_b, with the colliding band). The join is on
    (band, band-signature) — only same-bucket docs ever meet.

    Bands are sliced straight out of the wide per-doc signature row
    (columns are already in sig_idx order), so there is no
    posexplode + re-groupBy round trip: one agg shuffle, one join."""
    n_bands = MINHASH_K // LSH_BAND_SIZE
    band_structs = [
        F.struct(
            F.lit(band).alias("band"),
            F.concat_ws(
                ",",
                *[
                    F.col(f"_m{band * LSH_BAND_SIZE + j}").cast("string")
                    for j in range(LSH_BAND_SIZE)
                ],
            ).alias("band_sig"),
        )
        for band in range(n_bands)
    ]
    bands = _tracked_cache(  # both sides of the bucket self-join read this
        _minhash_wide(documents, n, hash_fn)
        .select("doc_id", F.explode(F.array(*band_structs)).alias("_b"))
        .select("doc_id", "_b.band", "_b.band_sig")
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"), "band", "band_sig"
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), "band", "band_sig"
    )
    # one row per (doc_a, doc_b, band) by construction (bands has one row
    # per (doc, band)) — no distinct needed.
    return (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "band")
    )


def _first_band_pairs(
    documents: DataFrame, n: int = 3, hash_fn: str = "xxhash64"
) -> DataFrame:
    """Each LSH candidate pair exactly ONCE, deduped map-side: the FULL
    signature rides each side of the band self-join (k longs/strings per
    band row — |docs|×n_bands rows either way), and a pair that collides
    in several bands is kept only at its FIRST colliding band — which is
    recomputable from the two signatures in the same row, i.e. an exact
    dedup with no pair-sized shuffle. Columns: doc_a, doc_b plus both
    carried signatures (_a0.._ak / _b0.._bk) for consumers that score
    agreement inline."""
    n_bands = MINHASH_K // LSH_BAND_SIZE
    band_structs = [
        F.struct(
            F.lit(band).alias("band"),
            F.concat_ws(
                ",",
                *[
                    F.col(f"_m{band * LSH_BAND_SIZE + j}").cast("string")
                    for j in range(LSH_BAND_SIZE)
                ],
            ).alias("band_sig"),
        )
        for band in range(n_bands)
    ]
    sigs = [f"_m{i}" for i in range(MINHASH_K)]
    bands = _tracked_cache(  # both sides of the self-join read this
        _minhash_wide(documents, n, hash_fn)
        .select("doc_id", *sigs, F.explode(F.array(*band_structs)).alias("_b"))
        .select("doc_id", *sigs, "_b.band", "_b.band_sig")
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"_m{i}").alias(f"_a{i}") for i in range(MINHASH_K)],
        "band",
        "band_sig",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"_m{i}").alias(f"_b{i}") for i in range(MINHASH_K)],
        "band",
        "band_sig",
    )
    # band j collides iff every component in it agrees; the join row's
    # own band always collides, so first_band is never NULL
    collides = []
    for j in range(n_bands):
        c = None
        for t in range(LSH_BAND_SIZE):
            eq = F.col(f"_a{j * LSH_BAND_SIZE + t}") == F.col(
                f"_b{j * LSH_BAND_SIZE + t}"
            )
            c = eq if c is None else c & eq
        collides.append(c)
    first_band = F.coalesce(
        *[F.when(collides[j], F.lit(j)) for j in range(n_bands)]
    )
    return (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(F.col("band") == first_band)
    )


def lsh_unique_pairs(
    documents: DataFrame, n: int = 3, hash_fn: str = "xxhash64"
) -> DataFrame:
    """(doc_a, doc_b), one row per LSH candidate pair — the deduplicated
    face of ``lsh_candidate_pairs`` (which emits one row per colliding
    band). The dedup happens inside the band-join stage (first-band
    filter, see ``_first_band_pairs``), so no pair-sized relation ever
    crosses an exchange — the shape for pair consumers that don't need
    the band column (CC clustering, estimate joins)."""
    return _first_band_pairs(documents, n, hash_fn).select("doc_a", "doc_b")


def minhash_jaccard_estimate(
    documents: DataFrame, n: int = 3, hash_fn: str = "xxhash64"
) -> DataFrame:
    """(doc_a, doc_b, est_jaccard) for LSH candidate pairs: the fraction
    of agreeing signature components — the standard cheap estimate
    (E[fraction] = true Jaccard) used to filter candidates BEFORE any
    exact shingle-set verification. Never touches raw text.

    Shape (r9): rides ``_first_band_pairs`` — agreement is computed
    inline from the signatures carried through the band join. The old
    shape shuffled the band-duplicated pair relation through a distinct
    (104M rows → 33.6M at sf10) and then shuffle-joined the signatures
    back on doc_a and doc_b (2 × 33.6M pair rows): three pair-sized
    exchanges replaced by ZERO — candidate pairs never cross an
    exchange at all (sf10: 50.4 s → 37.5 s, identical 33,591,728 rows)."""
    matches = sum(
        F.when(F.col(f"_a{i}") == F.col(f"_b{i}"), 1).otherwise(0)
        for i in range(MINHASH_K)
    )
    return _first_band_pairs(documents, n, hash_fn).select(
        "doc_a",
        "doc_b",
        (matches.cast("double") / F.lit(float(MINHASH_K))).alias(
            "est_jaccard"
        ),
    )


def ngram_jaccard_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.1,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """All-pairs n-gram Jaccard via the shingle inverted index:
    |A ∩ B| from the self-join, sizes from per-doc counts.
    jaccard = inter / (|A| + |B| - inter) >= threshold.

    ``max_shingle_df`` drops shingles appearing in more than that many
    docs from the index BEFORE the self-join (a shingle with df=d emits
    d²/2 join rows, so stop-phrase shingles are a skew bomb at scale;
    capping is standard practice). Sizes and intersections are both
    computed over the capped index, so with a cap the result is the
    exact Jaccard over the REDUCED shingle universe — a deliberate
    semantic change, so it is opt-in: the default (None) is the exact
    Jaccard over all shingles; pass a cap (e.g. 100) at scale-sensitive
    call sites.

    Capped index shape (r9): the old order cached the full distinct
    (doc, shingle) index (26.5M rows at sf10) only to keep ~2% of it
    after the cap, and recomputed the capped join for each of its three
    consumers (sizes, both self-join sides). Now the df aggregate and
    the survivors join both hang off the SAME distinct relation, so its
    exchange is planned once and reused (AQE stage reuse — the heavy
    relation is computed exactly once and never enters the block
    cache); the ≤cap shingle set is broadcast-joined back (forced under
    a size gate — a shuffle join here would re-shuffle the full index
    by the shingle key, whose hot values are exactly the over-cap
    stop-shingles the join is about to drop), and only the ~2%
    surviving rows are cached for the three consumers."""
    if max_shingle_df is not None:
        from bigartm_spark.session import (
            FILE_SCAN_EST_EXPANSION,
            estimated_plan_bytes,
            plan_reads_files,
        )

        pairs_d = doc_shingles(documents, n)  # distinct (doc, shingle)
        keep = (
            pairs_d.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_shingle_df)
            .select("shingle")
        )
        est = estimated_plan_bytes(documents)
        if est is not None and plan_reads_files(documents):
            est *= FILE_SCAN_EST_EXPANSION
        if est is not None and est <= (4 << 30):
            # the ≤cap shingle set of a ≤4 GiB corpus fits the
            # broadcast budget comfortably; past that, leave the
            # strategy to AQE (and raise the cap / pre-hash shingles
            # at true 100 TB deployments — see SCALE.md)
            keep = F.broadcast(keep)
        sh = _tracked_cache(pairs_d.join(keep, "shingle"))
    else:
        sh = _tracked_cache(doc_shingles(documents, n))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_sz"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    # no broadcast hint: sizes is |docs|-sized (unbounded at scale) —
    # AQE broadcasts it when it is actually small, shuffles otherwise
    out = (
        inter.join(
            sizes.withColumnRenamed("doc_id", "doc_a")
            .withColumnRenamed("_sz", "_sa"),
            "doc_a",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "_sz", "_sb"
            ),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.col("_inter") / (F.col("_sa") + F.col("_sb") - F.col("_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


def dedup_clusters(
    pairs: DataFrame,
    max_iterations: int = 20,
    assume_unique: bool = False,
) -> DataFrame:
    """Connected components over candidate pairs -> (doc_id, canonical):
    the cluster representative is the minimum doc_id reachable through
    the duplicate graph — the standard post-LSH canonical-selection step.

    Iterative min-label propagation: each round joins labels to the
    (bidirectional) edge list and takes the per-node min of own and
    neighbor labels; stop when a round changes nothing. Near-duplicate
    clusters have tiny diameter, so rounds ≈ 2-3 in practice; each round
    is one join + one groupBy (plain shuffles, no driver-side graph).
    Only docs that appear in some pair are returned.

    ONE job per round: the changed-label count rides an Observation on
    the same count() action that fills the round's cache (the old
    separate probe join doubled the per-round job count). Every 5th
    round the label relation is localCheckpointed so a deep component
    can't build a max_iterations-deep recursive plan.

    Frontier propagation (r9): labels are non-increasing, so a node
    whose label did NOT change in round t-1 would resend the exact
    message (its label) it sent before — a value every neighbor already
    folded in. Round t therefore joins the edge list only against the
    FRONTIER (nodes changed in t-1): per-round labels are provably
    identical to full propagation round-by-round, but the per-round
    aggregate input shrinks from |edges| to edges incident to the
    frontier — after round 0 that is nearly nothing for the
    tiny-diameter components LSH produces, where the old shape paid
    the full |edges|-row aggregate again every round. Round 0 itself
    skips the label join outright: initial labels are the identity, so
    the first neighbor-min is just groupBy(src).min(dst).

    The pair list is deduplicated before the edge union (r9): LSH
    callers may hand over one row per COLLIDING BAND (104M rows for
    33.6M distinct pairs at sf10 — prefer ``lsh_unique_pairs``, whose
    dedup is map-side), and CC is invariant under duplicate edges —
    without the distinct every propagation round would join ~3× the
    necessary rows. Callers that already guarantee one row per pair
    (``lsh_unique_pairs``) pass ``assume_unique=True`` and skip that
    pair-sized exchange outright — the measured r9 corpus_survivors
    regression (131.5 → 139.9 s at sf10) was exactly this distinct
    re-shuffling an already-unique relation. Only the deduped
    undirected pair list is cached; the doubled directed edge view is
    derived from it per round (same cache bytes read, half the cache
    storage)."""
    ded = pairs.select("doc_a", "doc_b")
    if not assume_unique:
        ded = ded.distinct()
    ded = ded.cache()
    edges = ded.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        ded.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    cached_labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
    ).cache()
    labels = cached_labels
    changed = 0
    frontier = None  # None = round 0 (identity labels, every node sends)
    for it in range(max_iterations):
        if frontier is None:
            # identity labels: min neighbor label == min neighbor id —
            # one groupBy with map-side partial min, no join
            nbr_min = edges.groupBy(F.col("src").alias("doc_id")).agg(
                F.min("dst").alias("_nbr")
            )
        else:
            nbr_min = (
                edges.join(
                    frontier.select(
                        F.col("doc_id").alias("dst"),
                        F.col("label").alias("_nl"),
                    ),
                    "dst",
                )
                .groupBy(F.col("src").alias("doc_id"))
                .agg(F.min("_nl").alias("_nbr"))
            )
        obs = Observation()
        new_labels = (
            labels.join(nbr_min, "doc_id", "left")
            .select(
                "doc_id",
                F.col("label").alias("_old"),
                F.least(
                    "label", F.coalesce("_nbr", F.col("label"))
                ).alias("label"),
            )
            .select(
                "doc_id",
                "label",
                (F.col("label") < F.col("_old")).alias("_chg"),
            )
            .observe(
                obs,
                F.sum(F.col("_chg").cast("long")).alias("changed"),
            )
            .cache()
        )
        if (it + 1) % 5 == 0:
            # truncate the growing join lineage; the checkpoint action
            # is this round's one job (it fills the observation too)
            cached = new_labels
            new_labels = new_labels.localCheckpoint(eager=True)
            cached.unpersist()
        else:
            new_labels.count()  # the round's ONE action
        changed = int(obs.get["changed"] or 0)
        cached_labels.unpersist()
        cached_labels = new_labels
        labels = new_labels.select("doc_id", "label")
        frontier = new_labels.filter("_chg").select("doc_id", "label")
        if changed == 0:
            break
    if changed != 0:
        warnings.warn(
            f"dedup_clusters did not converge in {max_iterations} rounds "
            f"({changed} labels still changing): a duplicate component "
            "with diameter > max_iterations would keep members under "
            "different canonicals — raise max_iterations",
            RuntimeWarning,
            stacklevel=2,
        )
    ded.unpersist()  # labels are checkpoint-materialized
    return labels.select("doc_id", F.col("label").alias("canonical"))


def deduplicate_corpus(
    documents: DataFrame,
    n: int = 3,
    use_lsh: bool = True,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """The end-to-end cleaner: drop exact duplicates (keep min doc_id per
    md5) then drop MinHash-LSH near-duplicate cluster members (keep the
    cluster canonical). Returns the surviving documents unchanged.

    Every stage is a bounded shuffle: hash-groupBy, band join, label
    propagation, two anti-join-free semi-joins — no all-pairs anywhere."""
    canon_exact = exact_dedup(documents).select(
        F.col("canonical_doc_id").alias("doc_id")
    )
    survivors = documents.join(canon_exact, "doc_id")
    if not use_lsh:
        return survivors
    # unique pairs (first-band dedup inside the band join) rather than
    # the band-duplicated relation: the CC step's distinct then touches
    # |pairs| rows instead of |pair, band| rows (r9)
    pairs = lsh_unique_pairs(survivors, n, hash_fn=hash_fn)
    clusters = dedup_clusters(pairs, assume_unique=True)
    # materialize the (tiny) drop list eagerly so every upstream cache
    # (band relation, per-round labels) can be released NOW instead of
    # accreting in executor storage for the life of the session
    drop = (
        clusters.filter(F.col("doc_id") != F.col("canonical"))
        .select("doc_id")
        .localCheckpoint(eager=True)
    )
    try:
        clusters.unpersist()
    except Exception:
        pass
    release_dedup_caches()
    return survivors.join(drop, "doc_id", "left_anti")


def contamination_check(
    documents: DataFrame, probes: DataFrame, n: int = 3
) -> DataFrame:
    """Benchmark decontamination: which documents share word n-grams
    with any probe text (e.g. eval-set questions)?
    (doc_id, probe_id, n_shared_shingles) for every overlapping pair.

    The probe set is small by definition, so its shingle index is
    broadcast — the corpus-side explode joins map-side with no shuffle
    of the big relation; the count agg shuffles only the matches."""
    doc_sh = doc_shingles(documents, n)  # distinct: overlap is set-based
    probe_sh = (
        probes.select(
            F.col("probe_id"), F.explode(shingles_col(n)).alias("shingle")
        )
        .distinct()
    )
    return (
        doc_sh.join(F.broadcast(probe_sh), "shingle")
        .groupBy("doc_id", "probe_id")
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
    )


def simhash(
    documents: DataFrame, bits: int = 16, hash_fn: str = "xxhash64"
) -> DataFrame:
    """(doc_id, simhash): per-bit weighted vote over word hashes
    (weight = word multiplicity). Word hash = low ``bits`` of xxhash64
    (one intrinsic — production default) or the first 4 hex digits of
    md5 (DuckDB-replayable, used by the oracle-paired plan)."""
    if hash_fn == "md5":
        h = F.conv(F.substring(F.md5("word"), 1, 4), 16, 10).cast("long")
    elif hash_fn == "xxhash64":
        # mask to non-negative so shiftright semantics match across bits
        h = F.xxhash64("word").bitwiseAND(F.lit((1 << bits) - 1))
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    w = _spread(documents).select(
        "doc_id", F.explode(words_col()).alias("word")
    ).withColumn("_h", h)
    votes = [
        F.sum(
            (F.shiftright(F.col("_h"), b).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"_v{b}")
        for b in range(bits)
    ]
    per_doc = w.groupBy("doc_id").agg(*votes)
    sim = None
    for b in range(bits):
        bit = F.when(F.col(f"_v{b}") > 0, F.lit(2**b)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return per_doc.select("doc_id", sim.cast("long").alias("simhash"))


# -- sub-document dedup ---------------------------------------------------


def line_dedup(
    documents: DataFrame, sep: str = "\n", min_line_chars: int = 1
) -> DataFrame:
    """C4-style global exact-line dedup: every distinct line keeps its
    FIRST occurrence corpus-wide (min doc_id, then min position within
    that doc); later occurrences are removed and each doc's text is
    reassembled from its surviving lines in original order.

    Returns (doc_id, text, n_lines, n_kept). Docs whose every line was
    a later duplicate come back with empty text (callers typically drop
    text == '').

    Scale shape: explode to one row per line, ONE groupBy shuffle on
    the line string to pick the global first occurrence (min over a
    struct — no window over the whole corpus), broadcast-free join back
    on (line, doc_id, pos) via a second groupBy. Lines shorter than
    ``min_line_chars`` are kept verbatim (never deduped) — the C4 rule
    that boilerplate detection shouldn't eat list markup.
    """
    # F.split takes a Java regex but reassembly uses sep literally —
    # quote it (\Q...\E) so metacharacter separators ('.', '|') split
    # on the literal string instead of garbling every document
    lines = documents.select(
        "doc_id",
        F.posexplode(
            F.split(F.col("text"), "\\Q" + sep + "\\E")
        ).alias("pos", "line"),
    )
    elig = lines.filter(F.length("line") >= min_line_chars)
    first = elig.groupBy("line").agg(
        F.min(F.struct("doc_id", "pos")).alias("_first")
    )
    kept_elig = elig.join(first, "line").filter(
        (F.col("doc_id") == F.col("_first.doc_id"))
        & (F.col("pos") == F.col("_first.pos"))
    ).select("doc_id", "pos", "line")
    kept_short = lines.filter(F.length("line") < min_line_chars)
    kept = kept_elig.unionByName(kept_short.select("doc_id", "pos", "line"))
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            sep, F.transform(F.array_sort(F.collect_list(F.struct("pos", "line"))), lambda s: s.line)
        ).alias("text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = lines.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_lines"))
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("text", F.lit("")).alias("text"),
            "n_lines",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )


def duplicate_spans(
    documents: DataFrame, span_tokens: int = 20, stride: int | None = None
) -> DataFrame:
    """Cross-document repeated token spans — the scalable approximation
    of suffix-array substring dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): hash every rolling
    ``span_tokens``-token window and report spans whose exact text
    occurs in more than one document.

    Returns (doc_id, start_pos, span_hash, n_docs) — one row per
    occurrence of a cross-doc duplicated span. start_pos is 1-based in
    tokens. Consumers cut or mask these ranges.

    ``stride`` defaults to span_tokens (non-overlapping windows: |tokens|
    rows total, the 100 TB-safe default — a duplicated region ≥ 2*span
    tokens is always hit). stride=1 is the exact rolling variant
    (span_tokens× more rows; still explode→ONE groupBy, no joins wider
    than the span list itself).
    """
    if stride is None:
        stride = span_tokens
    ws = words_col()
    k = F.size(ws) - (span_tokens - 1)
    starts = F.when(
        k >= 1, F.sequence(F.lit(1), k, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    spans = _spread(documents).select(
        "doc_id",
        F.explode(
            F.transform(
                starts,
                lambda i: F.struct(
                    i.alias("start_pos"),
                    F.xxhash64(
                        F.concat_ws(
                            " ", F.slice(ws, i, F.lit(span_tokens))
                        )
                    ).alias("span_hash"),
                ),
            )
        ).alias("s"),
    ).select("doc_id", "s.start_pos", "s.span_hash")
    per_span = spans.groupBy("span_hash").agg(
        F.count_distinct("doc_id").alias("n_docs")
    )
    dup = per_span.filter(F.col("n_docs") > 1)
    return spans.join(dup, "span_hash").select(
        "doc_id", "start_pos", "span_hash", "n_docs"
    )
