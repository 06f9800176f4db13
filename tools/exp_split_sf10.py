"""r9 experiment: sf10 wall + row parity for the pair scorers, before
(r8 single-task-per-block) vs after (r9 hash-split oversized blocks).

Run once from each code state (the repo root on sys.path decides):
    python tools/exp_split_sf10.py <label> [SF_DIR]
Prints one JSON line per query: wall seconds (count() methodology,
matching the r8 sweep numbers) + row count for parity checks.

Queries:
- near_dup_bits4: the declared embedding_near_dup_pairs shape
  (bits=4 pinned). At sf10 the 16 buckets hold ~12.5k rows on average
  but the hot ones exceed the 32k cap -> r9 splits them.
- semantic_dedup: the declared semantic_dedup_survivors shape
  (8 seed cells over 200k vectors -> every cell is hot; r8 ran at most
  8 kernel tasks).
- near_dup_derived: near_dup_pairs_lsh with the r9 default size-derived
  bits (NOT the declared query's result — evidence for the adaptive
  default's scale behavior; absent in the before leg).
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
    from bigartm_spark.operators import similarity
    from bigartm_spark.session import get_spark

    spark = get_spark(f"exp-split-{LABEL}")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    def timed(name, make):
        spark.sparkContext.setJobDescription(f"{LABEL}: {name}")
        t0 = time.time()
        try:
            df = make()
            n = df.count()
        except TypeError as exc:  # pre-r9 signature
            print(json.dumps({"label": LABEL, "query": name, "skip": str(exc)}))
            return
        wall = round(time.time() - t0, 1)
        print(
            json.dumps(
                {"label": LABEL, "query": name, "sec": wall, "rows": n}
            ),
            flush=True,
        )

    timed(
        "near_dup_bits4",
        lambda: similarity.near_dup_pairs_lsh(emb, threshold=0.3, bits=4),
    )
    timed(
        "semantic_dedup",
        lambda: similarity.semantic_dedup(
            emb, similarity.seed_centroids(emb, 8), threshold=0.3
        ),
    )
    if LABEL != "before":
        timed(
            "near_dup_derived",
            lambda: similarity.near_dup_pairs_lsh(emb, threshold=0.3),
        )
    spark.stop()


if __name__ == "__main__":
    main()
