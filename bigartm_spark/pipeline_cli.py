"""`python -m bigartm_spark pipeline ...` — the training-data pipeline
as one command: dedup -> quality/language filter -> PII redaction ->
domain-mixture resample -> train/val/test split -> sequence packing ->
partitioned parquet shards.

Composes the oracle-checked operators (operators/{dedup,textstats,
sampling,packing}.py); every stage is optional and the stage order is
the one a production corpus build uses. Writes the surviving corpus
partitioned by split (so downstream training readers partition-prune)
and prints ONE JSON stats line to stdout.
"""

from __future__ import annotations

import argparse
import json
import sys


def _parse_weights(spec: str) -> dict[str, float]:
    """'train=0.98,val=0.01,test=0.01' -> dict (also for --mixture)."""
    out: dict[str, float] = {}
    for part in spec.split(","):
        k, _, v = part.partition("=")
        if not _ or not k:
            raise ValueError(f"bad weight spec {part!r} (want name=value)")
        out[k.strip()] = float(v)
    return out


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="bigartm_spark pipeline",
        description="corpus cleaning / layout pipeline",
    )
    p.add_argument("--input", required=True, help="documents parquet path")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument(
        "--dedup",
        choices=["none", "exact", "lsh"],
        default="exact",
        help="exact = md5 canonical only; lsh = exact + MinHash-LSH clusters",
    )
    p.add_argument("--min-quality", type=float, default=None)
    p.add_argument("--lang", default=None, help="keep only this language")
    p.add_argument("--redact-pii", action="store_true")
    p.add_argument(
        "--mixture", default=None, help="e.g. src0=0.5,src1=0.3,src2=0.2"
    )
    p.add_argument(
        "--split", default=None, help="e.g. train=0.98,val=0.01,test=0.01"
    )
    p.add_argument("--pack-budget", type=int, default=None)
    p.add_argument("--pack-shards", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv: list[str] | None = None) -> int:
    from pyspark.sql import functions as F

    from bigartm_spark.operators import dedup, packing, sampling, textstats
    from bigartm_spark.session import get_spark

    args = build_parser().parse_args(argv)
    spark = get_spark("bigartm_spark-pipeline")
    docs = spark.read.parquet(args.input)
    stats: dict[str, object] = {"input_rows": docs.count()}

    if args.dedup == "exact":
        canon = dedup.exact_dedup(docs).select(
            F.col("canonical_doc_id").alias("doc_id")
        )
        docs = docs.join(canon, "doc_id", "left_semi")
    elif args.dedup == "lsh":
        docs = dedup.deduplicate_corpus(docs)
    if args.dedup != "none":
        stats["after_dedup"] = docs.count()

    if args.min_quality is not None or args.lang is not None:
        keep = textstats.quality_score(docs).select("doc_id", "quality")
        docs = docs.join(keep, "doc_id")
        if args.min_quality is not None:
            docs = docs.filter(F.col("quality") >= args.min_quality)
        if args.lang is not None:
            docs = docs.filter(F.col("lang") == args.lang)
        docs = docs.drop("quality")
        stats["after_quality"] = docs.count()

    if args.redact_pii:
        docs = textstats.pii_redact(docs).drop("text").withColumnRenamed(
            "redacted_text", "text"
        )

    if args.mixture:
        docs = sampling.domain_mixture_resample(
            docs, _parse_weights(args.mixture), seed=args.seed
        )
        stats["after_mixture"] = docs.count()

    if args.split:
        docs = sampling.hash_split(
            docs, _parse_weights(args.split), seed=args.seed
        )
    else:
        docs = docs.withColumn("split", F.lit("train"))

    if args.pack_budget is not None:
        toks = textstats.token_count(docs).select("doc_id", "n_tokens")
        packed = packing.pack_sequences(
            toks, budget=args.pack_budget, n_shards=args.pack_shards
        )
        docs = docs.join(packed, "doc_id")

    docs.write.mode("overwrite").partitionBy("split").parquet(args.output)
    out = spark.read.parquet(args.output)
    stats["output_rows"] = out.count()
    stats["splits"] = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
