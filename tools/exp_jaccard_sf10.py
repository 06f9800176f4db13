"""Round-8 measurement: where does dedup_jaccard_verify's sf10 wall go?

Times (single run each, labeled jobs, count() action like the bracket):
  1. ngram_jaccard_pairs core (threshold=0.05, df-cap 100)
  2. minhash_jaccard_estimate (LSH candidates + signature agreement)
  3. the composed dedup_jaccard_verify query

Usage: python tools/exp_jaccard_sf10.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    from bigartm_spark.operators import dedup
    from bigartm_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    spark = get_spark("exp-jaccard-sf10")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def timed(name, fn):
        sc.setJobDescription(name)
        t0 = time.time()
        n = fn()
        dt = time.time() - t0
        print(f"{name}: {dt:.1f}s rows={n}", flush=True)
        sc.setJobDescription(None)
        dedup.release_dedup_caches()
        return dt

    timed(
        "ngram_jaccard_pairs",
        lambda: dedup.ngram_jaccard_pairs(
            docs, threshold=0.05, max_shingle_df=100
        ).count(),
    )
    timed(
        "minhash_jaccard_estimate",
        lambda: dedup.minhash_jaccard_estimate(docs, hash_fn="md5").count(),
    )

    def full():
        est = dedup.minhash_jaccard_estimate(docs, hash_fn="md5")
        exact = dedup.ngram_jaccard_pairs(
            docs, threshold=0.05, max_shingle_df=100
        )
        return est.join(exact, ["doc_a", "doc_b"]).count()

    timed("dedup_jaccard_verify_full", full)
    spark.stop()


if __name__ == "__main__":
    main()
