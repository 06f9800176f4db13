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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# MinHash: k independent permutations = md5 over seed-prefixed shingles,
# minimum taken in lexicographic hex order. md5 is a JVM intrinsic on the
# Spark side (whole-stage codegen, no interpreted lambdas) and identical
# in DuckDB, so signatures match byte-for-byte.
MINHASH_K = 8
LSH_BAND_SIZE = 2  # 8 sigs -> 4 bands of 2


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
    """Exact dedup on md5(text): (text_md5, n_dups, canonical_doc_id)."""
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
    (the shuffle moves only the raw docs, cheap relative to the explode)."""
    sc = documents.sparkSession.sparkContext
    target = sc.defaultParallelism
    if documents.rdd.getNumPartitions() < target:
        return documents.repartition(target)
    return documents


def doc_shingles(documents: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) distinct."""
    return (
        _spread(documents)
        .select("doc_id", F.explode(shingles_col(n)).alias("shingle"))
        .distinct()
    )


def minhash_signatures(documents: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, sig_idx, minhash hex-string): k permutation minima over
    the doc's shingle set; permutation i = md5('<i>|' + shingle), minimum
    in lexicographic order. One explode + one groupBy with k min()
    aggregates — all codegen, no interpreted lambdas."""
    sh = doc_shingles(documents, n)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"_m{i}")
        for i in range(MINHASH_K)
    ]
    per_doc = sh.groupBy("doc_id").agg(*aggs)
    sigs = per_doc.select(
        "doc_id",
        F.posexplode(
            F.array(*[F.col(f"_m{i}") for i in range(MINHASH_K)])
        ).alias("sig_idx", "minhash"),
    )
    return sigs


def lsh_candidate_pairs(documents: DataFrame, n: int = 3) -> DataFrame:
    """MinHash-LSH: band the signature, bucket-join, emit candidate pairs
    (doc_a < doc_b, with the colliding band). The join is on
    (band, band-signature) — only same-bucket docs ever meet."""
    sigs = minhash_signatures(documents, n)
    bands = (
        sigs.withColumn("band", (F.col("sig_idx") / LSH_BAND_SIZE).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("sig_idx", "minhash"))
                    ),
                    lambda s: s["minhash"],
                ),
            ).alias("band_sig")
        )
    ).cache()  # both sides of the bucket self-join read this relation
    a = bands.select(
        F.col("doc_id").alias("doc_a"), "band", "band_sig"
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), "band", "band_sig"
    )
    return (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "band")
        .distinct()
    )


def ngram_jaccard_pairs(
    documents: DataFrame, n: int = 3, threshold: float = 0.1
) -> DataFrame:
    """All-pairs n-gram Jaccard via the shingle inverted index:
    |A ∩ B| from the self-join, sizes from per-doc counts.
    jaccard = inter / (|A| + |B| - inter) >= threshold."""
    sh = doc_shingles(documents, n).cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_sz"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    out = (
        inter.join(
            F.broadcast(sizes.withColumnRenamed("doc_id", "doc_a")
                        .withColumnRenamed("_sz", "_sa")), "doc_a"
        )
        .join(
            F.broadcast(
                sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                    "_sz", "_sb"
                )
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


def simhash(documents: DataFrame, bits: int = 16) -> DataFrame:
    """(doc_id, simhash): per-bit weighted vote over word hashes
    (weight = word multiplicity). Word hash = first 16 bits of md5."""
    w = _spread(documents).select(
        "doc_id", F.explode(words_col()).alias("word")
    ).withColumn(
        "_h",
        F.conv(F.substring(F.md5("word"), 1, 4), 16, 10).cast("long"),
    )
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
