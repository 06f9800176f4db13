"""Derive /tmp/sfN (K x the sf0.1 driver testdata) for the SCALE.md
scale-trend sweeps. Generalizes tools/gen_sf1.py: big tables are
replicated K times with shifted primary keys (documents text perturbed
per replica so cross-replica exact duplicates do not explode the dedup
candidate graph; events shift user_id so session semantics survive
while user cardinality grows); dimension tables are copied verbatim.

Usage: python tools/gen_sfn.py [K] [DST]
Defaults: K=100, DST=/tmp/sf10  (i.e. sf10 = 100 x sf0.1).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from bigartm_spark import get_spark
from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"
K = int(sys.argv[1]) if len(sys.argv) > 1 else 100
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10"

spark = get_spark()
t0 = time.time()
reps = spark.range(K).withColumnRenamed("id", "_rep")


def shift(df, key):
    span = df.agg(F.max(key)).collect()[0][0] + 1
    return (
        df.crossJoin(F.broadcast(reps))
        .withColumn(key, F.col(key) + F.col("_rep") * F.lit(span))
    )


def write(df, name, parts=64):
    df.repartition(parts).write.mode("overwrite").parquet(f"{DST}/{name}.parquet")
    print(name, spark.read.parquet(f"{DST}/{name}.parquet").count(),
          f"{time.time() - t0:.1f}s", flush=True)


write(shift(spark.read.parquet(f"{SRC}/lineitem.parquet"), "l_orderkey").drop("_rep"),
      "lineitem")

docs = shift(spark.read.parquet(f"{SRC}/documents.parquet"), "doc_id")
write(
    docs.withColumn(
        "text",
        F.when(F.col("_rep") == 0, F.col("text")).otherwise(
            F.concat(F.col("text"), F.lit(" rep"), F.col("_rep").cast("string"))
        ),
    ).drop("_rep"),
    "documents",
)

write(shift(spark.read.parquet(f"{SRC}/embeddings.parquet"), "vec_id").drop("_rep"),
      "embeddings")

ev = shift(spark.read.parquet(f"{SRC}/events.parquet"), "event_id")
uspan = ev.agg(F.max("user_id")).collect()[0][0] + 1
write(
    ev.withColumn("user_id", F.col("user_id") + F.col("_rep") * F.lit(uspan))
    .drop("_rep"),
    "events",
)

orders = shift(spark.read.parquet(f"{SRC}/orders.parquet"), "o_orderkey").drop("_rep")
write(orders, "orders", parts=32)

for dim in ["region", "nation", "customer", "supplier", "part"]:
    dst = f"{DST}/{dim}.parquet"
    if not os.path.exists(dst):
        os.symlink(f"{SRC}/{dim}.parquet", dst)
    print("linked", dim, flush=True)

print("done", f"{time.time() - t0:.1f}s total; K={K} -> {DST}")
