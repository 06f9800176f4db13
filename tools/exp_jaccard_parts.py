"""Round-8 sub-measurement: stage attribution inside the two halves of
dedup_jaccard_verify at sf10, plus a prototype of the est-side
"signatures ride the band join" shape (one pair shuffle instead of
distinct + two sig joins).

Usage: python tools/exp_jaccard_parts.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def timed(sc, name, fn):
    sc.setJobDescription(name)
    t0 = time.time()
    n = fn()
    dt = time.time() - t0
    print(f"{name}: {dt:.1f}s rows={n}", flush=True)
    sc.setJobDescription(None)
    return dt


def est_one_shuffle(documents, n=3, hash_fn="md5"):
    """minhash_jaccard_estimate rewrite: the band self-join carries both
    full signatures, so agreement is computed inline and the only
    pair-sized shuffle is the final (doc_a, doc_b) dedup."""
    from bigartm_spark.operators import dedup

    wide = dedup._minhash_wide(documents, n, hash_fn)
    n_bands = dedup.MINHASH_K // dedup.LSH_BAND_SIZE
    band_structs = [
        F.struct(
            F.lit(band).alias("band"),
            F.concat_ws(
                ",",
                *[
                    F.col(f"_m{band * dedup.LSH_BAND_SIZE + j}").cast("string")
                    for j in range(dedup.LSH_BAND_SIZE)
                ],
            ).alias("band_sig"),
        )
        for band in range(n_bands)
    ]
    bands = dedup._tracked_cache(
        wide.select(
            "doc_id",
            F.array(*[F.col(f"_m{i}") for i in range(dedup.MINHASH_K)]).alias(
                "_sig"
            ),
            F.explode(F.array(*band_structs)).alias("_b"),
        ).select("doc_id", "_sig", "_b.band", "_b.band_sig")
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("_sig").alias("_sa"),
        "band", "band_sig",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("_sig").alias("_sb"),
        "band", "band_sig",
    )
    matches = sum(
        F.when(F.col("_sa")[i] == F.col("_sb")[i], 1).otherwise(0)
        for i in range(dedup.MINHASH_K)
    )
    return (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            (matches.cast("double") / F.lit(float(dedup.MINHASH_K))).alias(
                "est_jaccard"
            ),
        )
        .distinct()
    )


def main():
    from bigartm_spark.operators import dedup
    from bigartm_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    spark = get_spark("exp-jaccard-parts")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # ---- ngram half, incremental
    sh = dedup.doc_shingles(docs, 3)
    timed(sc, "1_shingles_distinct", sh.count)
    keep = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= 100)
        .select("shingle")
    )
    shc = sh.join(keep, "shingle")
    timed(sc, "2_dfcap_join", shc.count)
    a = shc.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = shc.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    timed(sc, "3_inter_selfjoin_agg", inter.count)
    dedup.release_dedup_caches()

    # ---- est half A/B (current vs one-shuffle), interleaved
    for leg in range(2):
        timed(
            sc,
            f"est_current_leg{leg}",
            lambda: dedup.minhash_jaccard_estimate(docs, hash_fn="md5").count(),
        )
        dedup.release_dedup_caches()
        timed(
            sc,
            f"est_oneshuffle_leg{leg}",
            lambda: est_one_shuffle(docs, hash_fn="md5").count(),
        )
        dedup.release_dedup_caches()
    spark.stop()


if __name__ == "__main__":
    main()
