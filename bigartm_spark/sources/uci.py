"""A1/A2: UCI bag-of-words and MatrixMarket corpus scans.

UCI format (collection_parser.cc:99-353 semantics):
  docword.*.txt : three header lines D, W, NNZ; then "docID wordID count"
  triples (1-based, docID-sorted); '%' lines are comments; zero-weight
  entries skipped.
  vocab.*.txt   : one "token [class_id]" per line (default class when
  absent); duplicate tokens are an error.

MatrixMarket (A2): '%%MatrixMarket' header, one "rows cols nnz" line,
then the same triples — parsed by the same path.

Spark shape: spark.read.text -> split/filter expressions (no UDFs) ->
join the vocab for token strings. The reference's batching is replaced
by partitioning; `repartition(n)` stands in for num_items_per_batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigartm_spark.schemas import DEFAULT_CLASS, DEFAULT_TRANSACTION


def read_vocab(spark: SparkSession, path: str) -> DataFrame:
    """vocab(token_id 1-based, token, class_id)."""
    lines = spark.read.text(path)
    w = Window.orderBy(F.monotonically_increasing_id())
    parts = F.split(F.trim(F.col("value")), r"\s+")
    vocab = (
        lines.filter(F.length(F.trim("value")) > 0)
        .withColumn("token_id", F.row_number().over(w).cast("long"))
        .select(
            "token_id",
            F.get(parts, 0).alias("token"),
            F.coalesce(F.get(parts, 1), F.lit(DEFAULT_CLASS)).alias("class_id"),
        )
    )
    return vocab


def read_uci(
    spark: SparkSession, docword_path: str, vocab_path: str
) -> DataFrame:
    """Long docs table from UCI docword + vocab files."""
    vocab = read_vocab(spark, vocab_path)
    lines = spark.read.text(docword_path)
    data = lines.filter(
        (F.length(F.trim("value")) > 0) & ~F.col("value").startswith("%")
    )
    parts = F.split(F.trim(F.col("value")), r"\s+")
    triples = data.select(
        F.get(parts, 0).cast("long").alias("doc_id"),
        F.get(parts, 1).cast("long").alias("token_id"),
        F.get(parts, 2).cast("double").alias("weight"),
        F.size(parts).alias("_n"),
    )
    # the three single-number header lines (D, W, NNZ) parse with _n == 1
    triples = triples.filter(
        (F.col("_n") >= 3) & F.col("doc_id").isNotNull() & (F.col("weight") > 0)
    )
    w = Window.partitionBy("doc_id").orderBy("token_id")
    out = (
        triples.join(F.broadcast(vocab), "token_id")
        .select(
            "doc_id",
            F.col("doc_id").cast("string").alias("title"),
            (F.col("doc_id") % 64).cast("string").alias("batch_id"),
            "class_id",
            "token",
            F.col("weight"),
            F.row_number().over(w).cast("int").alias("pos"),
        )
        .withColumn("transaction_id", F.col("pos"))
        .withColumn("transaction_typename", F.lit(DEFAULT_TRANSACTION))
    )
    return out


def read_matrix_market(
    spark: SparkSession, mm_path: str, vocab_path: str
) -> DataFrame:
    """A2: same triple layout; '%%MatrixMarket' and '%' lines are comments,
    the dims line (3 numbers, first data line) is dropped by position."""
    vocab = read_vocab(spark, vocab_path)
    lines = spark.read.text(mm_path)
    data = lines.filter(
        (F.length(F.trim("value")) > 0) & ~F.col("value").startswith("%")
    )
    w0 = Window.orderBy(F.monotonically_increasing_id())
    parts = F.split(F.trim(F.col("value")), r"\s+")
    triples = (
        data.withColumn("_ln", F.row_number().over(w0))
        .filter(F.col("_ln") > 1)  # dims line
        .select(
            F.get(parts, 0).cast("long").alias("doc_id"),
            F.get(parts, 1).cast("long").alias("token_id"),
            F.get(parts, 2).cast("double").alias("weight"),
        )
        .filter(F.col("weight") > 0)
    )
    w = Window.partitionBy("doc_id").orderBy("token_id")
    return (
        triples.join(F.broadcast(vocab), "token_id")
        .select(
            "doc_id",
            F.col("doc_id").cast("string").alias("title"),
            (F.col("doc_id") % 64).cast("string").alias("batch_id"),
            "class_id",
            "token",
            "weight",
            F.row_number().over(w).cast("int").alias("pos"),
        )
        .withColumn("transaction_id", F.col("pos"))
        .withColumn("transaction_typename", F.lit(DEFAULT_TRANSACTION))
    )
