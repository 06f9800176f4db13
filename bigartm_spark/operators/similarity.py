"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exactness baseline. One pass, no shuffle
  until the final top-k (which is a tiny global sort of k*partitions
  candidates thanks to window/limit pushdown).
- sign-LSH bucketed variant: the 100TB path — candidates restricted to
  the query's bucket, so the scan prunes to |bucket| rows. Bucketing here
  is deterministic coordinate-sign bits (replayable in the SQL oracle);
  swap in random-hyperplane signs for production quality.

All arithmetic is JVM-side zip_with/aggregate in array order, so the
DuckDB oracle (list_transform/list_reduce, also left-to-right) matches
bit-for-bit before rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _query_vec(embeddings: DataFrame, query_id: int) -> DataFrame:
    return F.broadcast(
        embeddings.filter(F.col("vec_id") == query_id).select(
            F.col("embedding").alias("_q")
        )
    )


def brute_force_topk(
    embeddings: DataFrame, query_id: int = 0, k: int = 10
) -> DataFrame:
    """Top-k most-cosine-similar vectors to vec_id=query_id (excluded)."""
    q = _query_vec(embeddings, query_id)
    scored = (
        embeddings.filter(F.col("vec_id") != query_id)
        .crossJoin(q)
        .select(
            "vec_id",
            "label",
            cosine(F.col("embedding"), F.col("_q")).alias("cosine"),
        )
    )
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("vec_id", "label", "cosine", "rank")
    )


def knn_per_label(
    embeddings: DataFrame, query_id: int = 0, k: int = 3
) -> DataFrame:
    """Top-k nearest per label group — the grouped-ANN shape."""
    q = _query_vec(embeddings, query_id)
    scored = (
        embeddings.filter(F.col("vec_id") != query_id)
        .crossJoin(q)
        .select(
            "vec_id", "label", cosine(F.col("embedding"), F.col("_q")).alias("cosine")
        )
    )
    w = Window.partitionBy("label").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("label", "vec_id", "cosine", "rank")
    )


def sign_lsh_bucket(emb: Column, bits: int = 4) -> Column:
    """Deterministic sign-bit bucket from the first ``bits`` coordinates."""
    out = F.lit(0)
    for b in range(bits):
        out = out + F.when(
            F.element_at(emb, b + 1) > 0, F.lit(2**b)
        ).otherwise(F.lit(0))
    return out.cast("int")


def lsh_bucketed_topk(
    embeddings: DataFrame, query_id: int = 0, k: int = 5, bits: int = 4
) -> DataFrame:
    """ANN restricted to the query's LSH bucket. At scale the bucket column
    is a partition/cluster key, so this prunes the scan itself."""
    bucketed = embeddings.withColumn(
        "bucket", sign_lsh_bucket(F.col("embedding"), bits)
    )
    qrow = F.broadcast(
        bucketed.filter(F.col("vec_id") == query_id).select(
            F.col("embedding").alias("_q"), F.col("bucket").alias("_qb")
        )
    )
    scored = (
        bucketed.filter(F.col("vec_id") != query_id)
        .join(qrow, F.col("bucket") == F.col("_qb"))
        .select(
            "vec_id",
            "label",
            "bucket",
            cosine(F.col("embedding"), F.col("_q")).alias("cosine"),
        )
    )
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("vec_id", "label", "bucket", "cosine", "rank")
    )


def ivf_assign(
    embeddings: DataFrame, centroids: DataFrame, metric: str = "cosine"
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest
    centroid (broadcast the centroid table — it is tiny by construction).
    centroids(cell_id, centroid array<float|double>)."""
    scored = embeddings.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "label",
        "cell_id",
        cosine(F.col("embedding"), F.col("centroid")).alias("_sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("_sim"), F.asc("cell_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "label", "cell_id", F.col("_sim").alias("centroid_sim"))
    )


def seed_centroids(embeddings: DataFrame, k: int) -> DataFrame:
    """Deterministic coarse centroids: the k lowest vec_ids (replace with
    k-means++ at scale; determinism matters more here than quality)."""
    return (
        embeddings.orderBy("vec_id")
        .limit(k)
        .select(
            F.col("vec_id").cast("int").alias("cell_id"),
            F.col("embedding").alias("centroid"),
        )
    )


def ivf_refine_centroids(
    embeddings: DataFrame, centroids: DataFrame, iterations: int = 2
) -> DataFrame:
    """Lloyd refinement: assignment + per-cell mean, iterated. Each round
    is one broadcast join + one groupBy — no driver-side loops over data."""
    dim_row = embeddings.select(F.size("embedding").alias("d")).first()
    dim = dim_row["d"]
    cur = centroids
    for _ in range(iterations):
        assigned = ivf_assign(embeddings, cur)
        joined = embeddings.join(assigned.select("vec_id", "cell_id"), "vec_id")
        cur = joined.groupBy("cell_id").agg(
            F.array(
                *[
                    F.avg(F.col("embedding")[i].cast("double"))
                    for i in range(dim)
                ]
            ).alias("centroid")
        )
    return cur


def ivf_topk(
    embeddings: DataFrame,
    centroids: DataFrame,
    query_id: int = 0,
    k: int = 5,
    n_probe: int = 1,
) -> DataFrame:
    """IVF search: rank centroids against the query, scan only the
    n_probe nearest cells. At scale cell_id is the partition key of the
    vector table, so the probe prunes the scan itself."""
    assigned = ivf_assign(embeddings, centroids).select("vec_id", "cell_id")
    q = _query_vec(embeddings, query_id)
    qcells = (
        centroids.crossJoin(q)
        .select("cell_id", cosine(F.col("centroid"), F.col("_q")).alias("_s"))
        .orderBy(F.desc("_s"), F.asc("cell_id"))
        .limit(n_probe)
        .select("cell_id")
    )
    candidates = (
        embeddings.join(assigned, "vec_id")
        .join(F.broadcast(qcells), "cell_id")
        .filter(F.col("vec_id") != query_id)
    )
    scored = candidates.crossJoin(q).select(
        "vec_id",
        "label",
        "cell_id",
        cosine(F.col("embedding"), F.col("_q")).alias("cosine"),
    )
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("vec_id", "label", "cell_id", "cosine", "rank")
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.9
) -> DataFrame:
    """Embedding near-duplicate pairs, label-blocked (join within label —
    the blocking key stands in for an IVF/LSH bucket at scale)."""
    a = embeddings.select(
        F.col("vec_id").alias("vec_a"), F.col("label"), F.col("embedding").alias("_ea")
    )
    b = embeddings.select(
        F.col("vec_id").alias("vec_b"), F.col("label"), F.col("embedding").alias("_eb")
    )
    return (
        a.join(b, "label")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "label",
            "vec_a",
            "vec_b",
            cosine(F.col("_ea"), F.col("_eb")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
