"""r9 experiment: sf10 wall + row parity for the dedup rewrites.

Run once from each code state (the repo root on sys.path decides):
    python tools/exp_dedup_sf10.py <label> [SF_DIR]

Queries (count() methodology, matching the r8 sweep):
- ngram_jaccard: df-capped inverted-index Jaccard (r9 pushes the cap
  before the wide distinct).
- minhash_estimate: signature-agreement estimate (r9 computes it inline
  in the band join with first-colliding-band dedup — zero pair-sized
  exchanges).
- corpus_survivors: deduplicate_corpus composition (r9 dedupes the CC
  edge input).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LABEL = sys.argv[1] if len(sys.argv) > 1 else "run"
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10"


def main():
    from bigartm_spark.operators import dedup
    from bigartm_spark.session import get_spark

    spark = get_spark(f"exp-dedup-{LABEL}")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def timed(name, make):
        spark.sparkContext.setJobDescription(f"{LABEL}: {name}")
        t0 = time.time()
        n = make().count()
        wall = round(time.time() - t0, 1)
        dedup.release_dedup_caches()
        print(
            json.dumps(
                {"label": LABEL, "query": name, "sec": wall, "rows": n}
            ),
            flush=True,
        )

    timed(
        "ngram_jaccard",
        lambda: dedup.ngram_jaccard_pairs(
            docs, threshold=0.05, max_shingle_df=100
        ),
    )
    timed(
        "minhash_estimate",
        lambda: dedup.minhash_jaccard_estimate(docs, hash_fn="md5"),
    )
    timed(
        "corpus_survivors",
        lambda: dedup.deduplicate_corpus(docs, hash_fn="md5"),
    )
    spark.stop()


if __name__ == "__main__":
    main()
