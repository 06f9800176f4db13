"""Time the DuckDB oracle on the bench.py query set at a given SF dir.

Used for the SCALE.md scale-trend check (sf0.1 vs sf1): runs the
oracle_sql() entry matching each bench.py query with the same min-of-2
steady-state discipline and prints one JSON line.

Usage: python tools/bench_duckdb.py [--sf DIR]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

# bench.py query name -> oracle_sql() key with the equivalent workload.
# estep / fit map to the 1-pass oracle (SQL can't loop); noted in SCALE.md.
BENCH_TO_ORACLE = {
    "gather_dictionary": "d1_gather_dictionary",
    "top_k_by_df": "b3b4_filter_topk_dictionary",
    "cooc_ppmi_w2": "d14f4_cooc_ppmi_filtered",
    "initialize_phi": "g1e5_initialize_and_ranking",
    # d2/g5 merged into one driver row in r3; the composite computes
    # both nwt and pwt so it stands in for either bench workload
    "estep_nwt_1_inner_pass": "d2g5_estep_mstep_pass",
    "fit_offline_1pass": "d2g5_estep_mstep_pass",
    "dedup_exact": "dedup_exact",
    "dedup_minhash_sigs": "dedup_minhash_signatures",
    "dedup_lsh_candidates": "dedup_lsh_candidates",
    "dedup_simhash": "dedup_simhash",
    "ann_cosine_topk": "ann_topk_composite",
    "text_quality": "text_lang_quality",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    import __spark_entry__ as entry

    oracles = entry.oracle_sql()
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        # single-file parquet (driver testdata) or a Spark-written
        # directory of part files (/tmp/sf1)
        for src in (f"{args.sf}/{t}.parquet", f"{args.sf}/{t}.parquet/*.parquet"):
            try:
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
                break
            except duckdb.Error:
                continue  # partial SF dirs carry only the bench tables

    timings: dict[str, float] = {}
    for name, key in BENCH_TO_ORACLE.items():
        sql = oracles[key]
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            con.execute(sql).fetchall()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    sf = args.sf.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_bench_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "timing": "min of 2 runs per query (steady-state)",
            }
        )
    )


if __name__ == "__main__":
    main()
