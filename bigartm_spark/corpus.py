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


def _occurrence_pos():
    """Unique, deterministic within-doc position. (l_orderkey,
    l_linenumber) is NOT unique in the driver testdata, so pos must be a
    row_number with a total tiebreak — ties beyond the sort key are exact
    duplicate rows, which are interchangeable."""
    from pyspark.sql import Window

    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_quantity"
    )
    return F.row_number().over(w).cast("int")


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
        _occurrence_pos().alias("pos"),
        _occurrence_pos().alias("transaction_id"),
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
        _occurrence_pos().alias("pos"),
        _occurrence_pos().alias("transaction_id"),
        F.lit(DEFAULT_TRANSACTION).alias("transaction_typename"),
    )


def docs_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    return docs_from_lineitem(spark, sf_dir).unionByName(
        docs_supplier_modality(spark, sf_dir)
    )


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """SQL API surface: register the raw tables plus the engine's corpus
    views as temp views so `spark.sql(...)` works directly:

        register_views(spark, sf_dir)
        spark.sql("SELECT token, SUM(weight) tf FROM docs GROUP BY token")
    """
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    docs_from_lineitem(spark, sf_dir).createOrReplaceTempView("docs")
    docs_multimodal(spark, sf_dir).createOrReplaceTempView("docs_multimodal")
    docs_from_documents(spark, sf_dir).createOrReplaceTempView("docs_text")


def docs_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-text corpus: the documents table tokenized into the long
    bag-of-words layout — see tokenize_documents."""
    return tokenize_documents(load_table(spark, sf_dir, "documents"))


def tokenize_documents(d: DataFrame) -> DataFrame:
    """A documents relation (doc_id, text, ...) tokenized into the long
    bag-of-words layout (token = word, weight = in-doc count) — the
    A3-style parse applied to a parquet text column. Pure expressions:
    split -> posexplode -> count per (doc, word)."""
    from pyspark.sql import Window

    words = F.filter(F.split(F.col("text"), " "), lambda w: F.length(w) > 0)
    exploded = d.select(
        "doc_id", F.explode(words).alias("token")
    )
    counts = exploded.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("double").alias("weight")
    )
    w = Window.partitionBy("doc_id").orderBy("token")
    return counts.select(
        "doc_id",
        F.col("doc_id").cast("string").alias("title"),
        (F.col("doc_id") % 16).cast("string").alias("batch_id"),
        F.lit(DEFAULT_CLASS).alias("class_id"),
        "token",
        "weight",
        F.row_number().over(w).cast("int").alias("pos"),
    ).withColumn("transaction_id", F.col("pos")).withColumn(
        "transaction_typename", F.lit(DEFAULT_TRANSACTION)
    )


# DuckDB replicas (the driver pre-registers the raw tables as views).
_POS_SQL = (
    "CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey "
    "ORDER BY l_linenumber, l_partkey, l_quantity) AS INT)"
)

DOCS_CTE = f"""
docs AS (
  SELECT l_orderkey                           AS doc_id,
         CAST(l_orderkey AS VARCHAR)          AS title,
         CAST(l_orderkey % 64 AS VARCHAR)     AS batch_id,
         '@default_class'                     AS class_id,
         'p' || CAST(l_partkey AS VARCHAR)    AS token,
         CAST(l_quantity AS DOUBLE)           AS weight,
         {_POS_SQL}                           AS pos,
         {_POS_SQL}                           AS transaction_id,
         '@default_transaction'               AS transaction_typename
  FROM lineitem
)
""".strip()

DOCS_MULTI_CTE = f"""
docs AS (
  SELECT l_orderkey AS doc_id, CAST(l_orderkey AS VARCHAR) AS title,
         CAST(l_orderkey % 64 AS VARCHAR) AS batch_id,
         '@default_class' AS class_id,
         'p' || CAST(l_partkey AS VARCHAR) AS token,
         CAST(l_quantity AS DOUBLE) AS weight,
         {_POS_SQL} AS pos,
         {_POS_SQL} AS transaction_id,
         '@default_transaction' AS transaction_typename
  FROM lineitem
  UNION ALL
  SELECT l_orderkey, CAST(l_orderkey AS VARCHAR),
         CAST(l_orderkey % 64 AS VARCHAR),
         'supp',
         's' || CAST(l_suppkey AS VARCHAR),
         1.0,
         {_POS_SQL},
         {_POS_SQL},
         '@default_transaction'
  FROM lineitem
)
""".strip()
