"""Capture .explain("formatted") for the operators touched in
optimization round 9 -> plans/r09/<query>_<suffix>.txt.

Usage: python tools/capture_plans_r09.py [suffix] [outdir]

Captured relations (sf dir from $SPARK_GRAFT_SF_DIR, default sf0.01 —
the correctness-gate scale):
- embedding_near_dup_pairs: the declared query (bits=4, estimate-gated
  small path) AND a forced hot-block split variant (tiny max_block_rows)
  showing the salted chunk-pair plan.
- semantic_dedup_survivors: declared query shape.
- dedup_jaccard_verify components: ngram_jaccard_pairs (df-capped index
  build) and minhash_jaccard_estimate.
- dedup_corpus_survivors: deduplicate_corpus projection.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main():
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    outdir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans",
            "r09",
        )
    )
    os.makedirs(outdir, exist_ok=True)

    from pyspark.sql import functions as F

    from bigartm_spark.operators import dedup, similarity
    from bigartm_spark.session import get_spark

    spark = get_spark("bigartm_spark-plans-r09")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def dump(name, df):
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(explain_str(df))
        print(name, "->", f"{name}_{suffix}.txt")

    # bits=4 valid both pre- and post-r9 (it is the declared query's
    # pinned value and the pre-r9 default)
    dump(
        "embedding_near_dup_pairs",
        similarity.near_dup_pairs_lsh(emb, threshold=0.3, bits=4),
    )
    # forced split: a cap below the bucket populations exercises the
    # salted chunk-pair plan (r9's skew-safe path; absent before r9)
    try:
        bucketed = emb.withColumn(
            "bucket", similarity.sign_lsh_bucket(F.col("embedding"), 4)
        )
        dump(
            "embedding_near_dup_pairs_hotsplit",
            similarity.blocked_pair_cosine_scores(
                bucketed, "bucket", 0.3, max_block_rows=16
            ),
        )
    except TypeError:
        print("(no max_block_rows param — pre-r9 code, skipping hotsplit)")

    cents = similarity.seed_centroids(emb, 8)
    dump(
        "semantic_dedup_survivors",
        similarity.semantic_dedup(emb, cents, threshold=0.3),
    )

    dump(
        "ngram_jaccard_pairs_dfcap",
        dedup.ngram_jaccard_pairs(
            docs, threshold=0.05, max_shingle_df=100
        ),
    )
    dedup.release_dedup_caches()
    dump(
        "minhash_jaccard_estimate",
        dedup.minhash_jaccard_estimate(docs, hash_fn="md5"),
    )
    dedup.release_dedup_caches()
    dump("dedup_corpus_survivors", dedup.deduplicate_corpus(docs, hash_fn="md5"))
    dedup.release_dedup_caches()
    spark.stop()


if __name__ == "__main__":
    main()
