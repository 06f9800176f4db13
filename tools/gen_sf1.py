"""Derive /tmp/sf1 (10x the sf0.1 driver testdata) for the SCALE.md
scale-trend check: replicate rows with shifted keys; perturb documents
text per replica so cross-replica exact duplicates do not explode the
dedup candidate graph. Usage: python tools/gen_sf1.py"""
import time

from bigartm_spark import get_spark
from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1"
K = 10
spark = get_spark()
t0 = time.time()

li = spark.read.parquet(f"{SRC}/lineitem.parquet")
okey_span = li.agg(F.max("l_orderkey")).collect()[0][0] + 1
reps = spark.range(K).withColumnRenamed("id", "_rep")
li10 = (
    li.crossJoin(F.broadcast(reps))
    .withColumn("l_orderkey", F.col("l_orderkey") + F.col("_rep") * F.lit(okey_span))
    .drop("_rep")
)
li10.repartition(32).write.mode("overwrite").parquet(f"{DST}/lineitem.parquet")
print("lineitem", li10.count(), time.time() - t0)

docs = spark.read.parquet(f"{SRC}/documents.parquet")
did_span = docs.agg(F.max("doc_id")).collect()[0][0] + 1
docs10 = (
    docs.crossJoin(F.broadcast(reps))
    .withColumn("doc_id", F.col("doc_id") + F.col("_rep") * F.lit(did_span))
    .withColumn(
        "text",
        F.when(F.col("_rep") == 0, F.col("text")).otherwise(
            F.concat(F.col("text"), F.lit(" rep"), F.col("_rep").cast("string"))
        ),
    )
    .drop("_rep")
)
docs10.repartition(32).write.mode("overwrite").parquet(f"{DST}/documents.parquet")
print("documents", docs10.count())

emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
vid_span = emb.agg(F.max("vec_id")).collect()[0][0] + 1
emb10 = (
    emb.crossJoin(F.broadcast(reps))
    .withColumn("vec_id", F.col("vec_id") + F.col("_rep") * F.lit(vid_span))
    .drop("_rep")
)
emb10.repartition(32).write.mode("overwrite").parquet(f"{DST}/embeddings.parquet")
print("embeddings", emb10.count(), "total", time.time() - t0)
