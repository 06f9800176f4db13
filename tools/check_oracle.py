"""Self-check harness replicating the driver's correctness gate:
run every __spark_entry__.queries() entry on Spark AND its oracle_sql()
in DuckDB at sf0.01, compare row count, column names, and
order-insensitive values.

Usage: python tools/check_oracle.py [name ...] [--sf DIR] [--plain]

--plain replicates the GATE's session flavor: a default-config
SparkSession (Arrow OFF), where createDataFrame uses the strict type
verifier that rejects numpy scalars. Round 7 regressed 50/50 -> 48/50
on exactly this difference (the repo session enables Arrow; the gate
doesn't) — run both flavors before calling a round done.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        # a Spark-written table is a DIRECTORY of part files (e.g. the
        # generated /tmp/sf1); the driver's testdata is a single file
        for src in (f"{sf_dir}/{t}.parquet", f"{sf_dir}/{t}.parquet/*.parquet"):
            try:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM '{src}'"
                )
                break
            except duckdb.IOException:
                continue
        else:
            raise FileNotFoundError(f"{sf_dir}/{t}.parquet")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(sp: pd.DataFrame, du: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sp.columns) != sorted(du.columns):
        problems.append(f"schema: spark={sorted(sp.columns)} duck={sorted(du.columns)}")
        return problems
    if len(sp) != len(du):
        problems.append(f"rowcount: spark={len(sp)} duck={len(du)}")
        return problems
    a, b = canon(sp), canon(du)
    for c in a.columns:
        if np.issubdtype(a[c].dtype, np.number) or np.issubdtype(
            b[c].dtype, np.number
        ):
            av = a[c].astype(float).to_numpy()
            bv = b[c].astype(float).to_numpy()
            if not np.allclose(av, bv, rtol=0, atol=5e-7, equal_nan=True):
                bad = np.nanmax(np.abs(av - bv))
                problems.append(f"col {c}: max abs diff {bad}")
            elif not (av == bv).all():
                n = (av != bv).sum()
                problems.append(
                    f"col {c}: {n} values differ post-round (hash would MISMATCH)"
                )
        else:
            if not (a[c].to_numpy() == b[c].to_numpy()).all():
                n = (a[c].to_numpy() != b[c].to_numpy()).sum()
                problems.append(f"col {c}: {n} string values differ")
    return problems


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--plain",
        action="store_true",
        help="run under a default-config (Arrow-off) session like the gate",
    )
    args = ap.parse_args()

    import __spark_entry__ as entry
    from bigartm_spark.session import get_spark

    spark = get_spark("check-oracle")
    if args.plain:
        spark = spark.newSession()
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
        # required to read the testdata's TIMESTAMP(NANOS) events parquet
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        print("session: PLAIN (Arrow off, default verifier)")
    con = duck_con(args.sf)
    qs, oracles = entry.queries(), entry.oracle_sql()
    names = args.names or list(qs)
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            sp = qs[name](spark, args.sf).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only check) — {len(sp)} rows")
            continue
        try:
            du = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        problems = compare(sp, du)
        dt = time.time() - t0
        if problems:
            failures += 1
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(problems))
        else:
            print(f"OK   {name} ({dt:.1f}s): {len(sp)} rows")
    print(f"\n{len(names) - failures}/{len(names)} passed")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
