"""Corpus builders: long-format ``docs`` DataFrames.

Two kinds of inputs:
- the driver's TPC-H-ish testdata (TESTDATA.md) mapped to a corpus view
  (FIXTURES.md §4): orders' lineitems are "documents", partkeys "tokens";
- real corpus formats (UCI / VW / MatrixMarket) via ``bigartm_spark.sources``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigartm_spark.schemas import DEFAULT_CLASS, DEFAULT_TRANSACTION

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def docs_from_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical corpus view over the driver testdata (FIXTURES.md §4).

    doc = order, token = 'p'||partkey, weight = quantity. Column pruning
    at the parquet scan is automatic (Catalyst reads only the 4 columns).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("doc_id"),
        F.col("l_orderkey").cast("string").alias("title"),
        (F.col("l_orderkey") % 64).cast("string").alias("batch_id"),
        F.lit(DEFAULT_CLASS).alias("class_id"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("token"),
        F.col("l_quantity").cast("double").alias("weight"),
        F.col("l_linenumber").cast("int").alias("pos"),
        F.col("l_linenumber").cast("int").alias("transaction_id"),
        F.lit(DEFAULT_TRANSACTION).alias("transaction_typename"),
    )


def docs_supplier_modality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second modality (class_id='supp') from lineitem suppliers — exercises
    multimodal weights (SURVEY.md B1/B2)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("doc_id"),
        F.col("l_orderkey").cast("string").alias("title"),
        (F.col("l_orderkey") % 64).cast("string").alias("batch_id"),
        F.lit("supp").alias("class_id"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("token"),
        F.lit(1.0).alias("weight"),
        F.col("l_linenumber").cast("int").alias("pos"),
        F.col("l_linenumber").cast("int").alias("transaction_id"),
        F.lit(DEFAULT_TRANSACTION).alias("transaction_typename"),
    )


def docs_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    return docs_from_lineitem(spark, sf_dir).unionByName(
        docs_supplier_modality(spark, sf_dir)
    )


# DuckDB replicas (the driver pre-registers the raw tables as views).
DOCS_CTE = """
docs AS (
  SELECT l_orderkey                           AS doc_id,
         CAST(l_orderkey AS VARCHAR)          AS title,
         CAST(l_orderkey % 64 AS VARCHAR)     AS batch_id,
         '@default_class'                     AS class_id,
         'p' || CAST(l_partkey AS VARCHAR)    AS token,
         CAST(l_quantity AS DOUBLE)           AS weight,
         CAST(l_linenumber AS INT)            AS pos,
         CAST(l_linenumber AS INT)            AS transaction_id,
         '@default_transaction'               AS transaction_typename
  FROM lineitem
)
""".strip()

DOCS_MULTI_CTE = """
docs AS (
  SELECT l_orderkey AS doc_id, CAST(l_orderkey AS VARCHAR) AS title,
         CAST(l_orderkey % 64 AS VARCHAR) AS batch_id,
         '@default_class' AS class_id,
         'p' || CAST(l_partkey AS VARCHAR) AS token,
         CAST(l_quantity AS DOUBLE) AS weight,
         CAST(l_linenumber AS INT) AS pos,
         CAST(l_linenumber AS INT) AS transaction_id,
         '@default_transaction' AS transaction_typename
  FROM lineitem
  UNION ALL
  SELECT l_orderkey, CAST(l_orderkey AS VARCHAR),
         CAST(l_orderkey % 64 AS VARCHAR),
         'supp',
         's' || CAST(l_suppkey AS VARCHAR),
         1.0,
         CAST(l_linenumber AS INT),
         CAST(l_linenumber AS INT),
         '@default_transaction'
  FROM lineitem
)
""".strip()
