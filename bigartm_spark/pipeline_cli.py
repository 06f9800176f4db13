"""`python -m bigartm_spark pipeline ...` — the training-data pipeline
as one command: dedup -> line dedup (C4-style, rewrites text) ->
duplicated-span filter (cross-doc repeated token windows) -> semantic
dedup (SemDeDup over embeddings) -> quality/language filter ->
doc-perplexity filter (model-based quality) -> PII redaction ->
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
    p.add_argument(
        "--line-dedup",
        action="store_true",
        help="C4-style global exact-line dedup: later occurrences of a "
        "duplicated line are removed and text is rewritten; docs left "
        "empty are dropped",
    )
    p.add_argument("--line-sep", default="\n")
    p.add_argument(
        "--max-dup-span-frac",
        type=float,
        default=None,
        help="drop docs where more than this fraction of tokens sits in "
        "cross-document duplicated spans (duplicate_spans detector)",
    )
    p.add_argument(
        "--dup-span-tokens",
        type=int,
        default=20,
        help="span window (tokens) for --max-dup-span-frac",
    )
    p.add_argument(
        "--semantic-dedup",
        action="store_true",
        help="SemDeDup over --embeddings: drop near-identical-meaning docs",
    )
    p.add_argument(
        "--embeddings",
        default=None,
        help="embeddings parquet (vec_id aligned with doc_id); required "
        "by --semantic-dedup",
    )
    p.add_argument("--sem-threshold", type=float, default=0.9)
    p.add_argument(
        "--sem-cells",
        type=int,
        default=8,
        help="k-means cells blocking the SemDeDup pair join (grow with "
        "corpus size: pair work is sum(|cell|^2))",
    )
    p.add_argument("--min-quality", type=float, default=None)
    p.add_argument("--lang", default=None, help="keep only this language")
    p.add_argument(
        "--min-doc-ppl",
        type=float,
        default=None,
        help="drop docs the topic model explains TOO well (low-ppl "
        "boilerplate/repetition)",
    )
    p.add_argument(
        "--max-doc-ppl",
        type=float,
        default=None,
        help="drop docs the topic model cannot explain (high-ppl outliers)",
    )
    p.add_argument(
        "--doc-ppl-topics",
        type=int,
        default=10,
        help="topics for the throwaway doc-ppl scoring model",
    )
    p.add_argument(
        "--doc-ppl-passes",
        type=int,
        default=2,
        help="EM passes for the doc-ppl scoring model",
    )
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
    p.add_argument(
        "--stats-report",
        default=None,
        help="write a per-source corpus_stats token-budget report "
        "(before + after cleaning) to this JSON file",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    from pyspark.sql import functions as F

    from bigartm_spark.operators import dedup, packing, sampling, textstats
    from bigartm_spark.session import get_spark

    args = build_parser().parse_args(argv)
    spark = get_spark("bigartm_spark-pipeline")
    docs = spark.read.parquet(args.input)
    stats: dict[str, object] = {"input_rows": docs.count()}

    def _stats_rows(rel):
        group = "source" if "source" in rel.columns else None
        return [
            r.asDict()
            for r in sampling.corpus_stats(rel, group_col=group).collect()
        ]

    if args.stats_report is not None:
        stats_report: dict[str, object] = {"before": _stats_rows(docs)}

    if args.dedup == "exact":
        canon = dedup.exact_dedup(docs).select(
            F.col("canonical_doc_id").alias("doc_id")
        )
        docs = docs.join(canon, "doc_id", "left_semi")
    elif args.dedup == "lsh":
        docs = dedup.deduplicate_corpus(docs)
    if args.dedup != "none":
        stats["after_dedup"] = docs.count()

    if args.line_dedup:
        cleaned = dedup.line_dedup(docs, sep=args.line_sep)
        docs = (
            docs.drop("text")
            .join(cleaned.select("doc_id", "text"), "doc_id")
            .filter(F.col("text") != "")
        )
        stats["after_line_dedup"] = docs.count()

    if args.max_dup_span_frac is not None:
        from bigartm_spark.operators.textstats import token_count

        spans = dedup.duplicate_spans(
            docs, span_tokens=args.dup_span_tokens
        )
        # non-overlapping default stride -> each hit covers span_tokens
        # distinct tokens; coverage = hits * span / doc_tokens
        hits = spans.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("_n_dup_spans")
        )
        toks = token_count(docs).select("doc_id", "n_tokens")
        frac = (
            F.col("_n_dup_spans")
            * F.lit(float(args.dup_span_tokens))
            / F.greatest(F.col("n_tokens").cast("double"), F.lit(1.0))
        )
        too_dup = (
            hits.join(toks, "doc_id")
            .filter(frac > args.max_dup_span_frac)
            .select("doc_id")
        )
        docs = docs.join(too_dup, "doc_id", "left_anti")
        stats["after_dup_span_filter"] = docs.count()

    if args.semantic_dedup:
        if not args.embeddings:
            print("--semantic-dedup requires --embeddings", file=sys.stderr)
            return 2
        from bigartm_spark.operators import similarity

        emb = spark.read.parquet(args.embeddings)
        # score only current survivors; vec_id is the doc key
        emb = emb.join(
            docs.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
        )
        cents = similarity.ivf_refine_centroids(
            emb,
            similarity.kmeans_parallel_seed(emb, args.sem_cells),
            iterations=2,
        )
        surv = similarity.semantic_dedup(
            emb, cents, threshold=args.sem_threshold
        ).select("vec_id")
        # drop only docs positively identified as semantic dupes (in the
        # embedding table but not among survivors); docs with no
        # embedding row cannot be judged and pass through
        dropped = emb.select("vec_id").join(surv, "vec_id", "left_anti")
        docs = docs.join(
            dropped.select(F.col("vec_id").alias("doc_id")),
            "doc_id",
            "left_anti",
        )
        stats["after_semantic_dedup"] = docs.count()

    if args.min_quality is not None or args.lang is not None:
        keep = textstats.quality_score(docs).select("doc_id", "quality")
        docs = docs.join(keep, "doc_id")
        if args.min_quality is not None:
            docs = docs.filter(F.col("quality") >= args.min_quality)
        if args.lang is not None:
            docs = docs.filter(F.col("lang") == args.lang)
        docs = docs.drop("quality")
        stats["after_quality"] = docs.count()

    if args.min_doc_ppl is not None or args.max_doc_ppl is not None:
        # model-based quality: fit a small throwaway topic model on the
        # survivors and score each doc's perplexity under uniform theta
        # (doc_ppl_quality's operator); both tails are droppable — low
        # ppl = boilerplate the model memorized, high ppl = outliers it
        # cannot explain
        from bigartm_spark.corpus import tokenize_documents
        from bigartm_spark.model.artm import ARTM
        from bigartm_spark.model.scores import doc_perplexity
        from bigartm_spark.operators.dictionary import gather_dictionary

        # cache: the scoring fit scans this relation once per EM action;
        # uncached it would re-run the whole upstream dedup lineage each
        # pass (the CLI session ends after the write, so no unpersist)
        long_docs = tokenize_documents(docs).cache()
        m = ARTM(
            num_topics=args.doc_ppl_topics,
            num_document_passes=2,
            seed=args.seed,
        )
        m.initialize(gather_dictionary(long_docs))
        m.fit_offline(long_docs, num_collection_passes=args.doc_ppl_passes)
        ppl = doc_perplexity(long_docs, m.pwt).select("doc_id", "doc_ppl")
        # LEFT join: a doc that tokenizes to zero tokens has no
        # perplexity row; an inner join would silently drop it no matter
        # what thresholds were given. Null doc_ppl passes both filters
        # (the ppl filter never evaluated that doc).
        docs = docs.join(ppl, "doc_id", "left")
        if args.min_doc_ppl is not None:
            docs = docs.filter(
                F.col("doc_ppl").isNull()
                | (F.col("doc_ppl") >= args.min_doc_ppl)
            )
        if args.max_doc_ppl is not None:
            docs = docs.filter(
                F.col("doc_ppl").isNull()
                | (F.col("doc_ppl") <= args.max_doc_ppl)
            )
        docs = docs.drop("doc_ppl")
        stats["after_doc_ppl"] = docs.count()

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
    if args.stats_report is not None:
        stats_report["after"] = _stats_rows(out)
        with open(args.stats_report, "w") as f:
            json.dump(stats_report, f)
        stats["stats_report"] = args.stats_report
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
