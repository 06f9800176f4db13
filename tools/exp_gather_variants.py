"""Round-8 experiment: gather_dictionary plan variants at sf0.1.

Times each variant min-of-5 with the bench's count() action on the
bench's cached docs relation, on an otherwise idle host. Variants:

  A  current shape: coalesce_if_small(target=2), two-stage agg,
     class-total via groupBy+broadcast-join of a duplicated stats subtree
  B  target=1 (single partition: every groupBy is exchange-free)
  C  class totals computed directly from docs (sum(weight) by class —
     algebraically identical, skips the duplicated stats subtree)
  D  class totals via a window over stats (no duplicated subtree,
     one extra small exchange)

Usage: python tools/exp_gather_variants.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def variant_a(docs):
    from bigartm_spark.operators.dictionary import gather_dictionary

    return gather_dictionary(docs)


def _stats(docs, target):
    from bigartm_spark.session import coalesce_if_small

    docs = coalesce_if_small(docs, target=target)
    per_doc = docs.groupBy("class_id", "token", "doc_id").agg(
        F.sum("weight").alias("_w")
    )
    return docs, per_doc.groupBy("class_id", "token").agg(
        F.sum("_w").alias("tf"),
        F.count(F.lit(1)).cast("double").alias("df"),
    )


def variant_b(docs):
    docs2, stats = _stats(docs, target=1)
    class_tot = stats.groupBy("class_id").agg(F.sum("tf").alias("_class_tf"))
    return (
        stats.join(F.broadcast(class_tot), "class_id")
        .withColumn("value", F.col("tf") / F.col("_class_tf"))
        .select("class_id", "token", "value", "tf", "df")
    )


def variant_c(docs):
    docs2, stats = _stats(docs, target=2)
    class_tot = docs2.groupBy("class_id").agg(
        F.sum("weight").alias("_class_tf")
    )
    return (
        stats.join(F.broadcast(class_tot), "class_id")
        .withColumn("value", F.col("tf") / F.col("_class_tf"))
        .select("class_id", "token", "value", "tf", "df")
    )


def variant_d(docs):
    from pyspark.sql import Window

    docs2, stats = _stats(docs, target=2)
    w = Window.partitionBy("class_id")
    return (
        stats.withColumn("value", F.col("tf") / F.sum("tf").over(w))
        .select("class_id", "token", "value", "tf", "df")
    )


def main():
    from bigartm_spark.corpus import docs_from_lineitem
    from bigartm_spark.session import get_spark

    spark = get_spark("exp-gather")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"
    docs = docs_from_lineitem(spark, sf).cache()
    docs.count()

    variants = {
        "A_current_t2": variant_a,
        "B_single_part": variant_b,
        "C_classtot_from_docs": variant_c,
        "D_window": variant_d,
    }
    # warmup each (codegen)
    for name, fn in variants.items():
        fn(docs).count()
    for name, fn in variants.items():
        best = float("inf")
        for _ in range(5):
            t0 = time.time()
            n = fn(docs).count()
            best = min(best, time.time() - t0)
        print(f"{name}: {best:.3f}s  rows={n}")
    spark.stop()


if __name__ == "__main__":
    main()
