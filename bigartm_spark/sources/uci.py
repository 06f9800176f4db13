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


def read_vocab(
    spark: SparkSession, path: str, validate: bool = True
) -> DataFrame:
    """vocab(token_id 1-based, token, class_id).

    With validate (the default — collection_parser.cc:305-353 raises for
    each case) the vocab is rejected when it contains an empty interior
    line ("Empty token at line N"), a line with more than two fields
    ("Expected format: <token> [<class_id>]"), or a duplicate
    (token, class_id) pair ("found twice"). The checks are two tiny
    aggregation jobs over the vocab file only — never over the corpus.
    """
    lines = spark.read.text(path)
    w = Window.orderBy(F.monotonically_increasing_id())
    parts = F.split(F.trim(F.col("value")), r"\s+")
    numbered = lines.withColumn("_line", F.row_number().over(w))
    if validate:
        bad = numbered.agg(
            F.min(
                F.when(F.length(F.trim("value")) == 0, F.col("_line"))
            ).alias("empty_line"),
            F.min(F.when(F.size(parts) > 2, F.col("_line"))).alias(
                "wide_line"
            ),
        ).collect()[0]
        if bad["empty_line"] is not None:
            raise ValueError(
                f"Empty token at line {bad['empty_line']}, file {path}"
            )
        if bad["wide_line"] is not None:
            raise ValueError(
                f"Error at line {bad['wide_line']}, file {path}. "
                "Expected format: <token> [<class_id>]"
            )
    vocab = (
        numbered.filter(F.length(F.trim("value")) > 0)
        .select(
            F.col("_line").cast("long").alias("token_id"),
            F.get(parts, 0).alias("token"),
            F.coalesce(F.get(parts, 1), F.lit(DEFAULT_CLASS)).alias("class_id"),
        )
    )
    if validate:
        dup = (
            vocab.groupBy("token", "class_id")
            .agg(F.count(F.lit(1)).alias("_n"), F.collect_list("token_id").alias("_ids"))
            .filter(F.col("_n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            r = dup[0]
            ids = sorted(r["_ids"])
            raise ValueError(
                f"Token ({r['token']}, {r['class_id']}) found twice, lines "
                f"{ids[0]} and {ids[1]}, file {path}"
            )
    return vocab


def read_mm_vocab(spark: SparkSession, path: str) -> DataFrame:
    """MatrixMarket-style vocab: ``token_id token weight`` per line with
    explicit zero-based ids; the weight column is ignored — it is
    recalculated from the docword file (collection_parser.cc:355-372,
    ParseVocabMatrixMarket). Returns (token_id 0-based, token, class_id)."""
    lines = spark.read.text(path)
    parts = F.split(F.trim(F.col("value")), r"\s+")
    return (
        lines.filter(F.length(F.trim("value")) > 0)
        .select(
            F.get(parts, 0).cast("long").alias("token_id"),
            F.get(parts, 1).alias("token"),
            F.lit(DEFAULT_CLASS).alias("class_id"),
        )
    )


def read_uci(
    spark: SparkSession, docword_path: str, vocab_path: str,
    strict: bool = False,
) -> DataFrame:
    """Long docs table from UCI docword + vocab files.

    strict adds the reference's out-of-range wordID check
    (collection_parser.cc:193-208, ArgumentOutOfRangeException): any
    docword triple whose wordID has no vocab row raises instead of being
    dropped. It costs one extra pass over the docword file, so it is
    opt-in — at 100 TB you validate a sample, not every scan; the vocab
    itself is always validated (read_vocab)."""
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
    if strict:
        missing = (
            triples.join(F.broadcast(vocab), "token_id", "left_anti")
            .select("token_id")
            .limit(1)
            .collect()
        )
        if missing:
            bad = missing[0][0]
            msg = (
                f"Failed to parse wordID {bad} in {docword_path}. "
            )
            if bad == 0:
                msg += (
                    "wordID column appears to be zero-based in the docword "
                    "file being parsed. UCI format defines wordID column to "
                    "be unity-based."
                )
            else:
                msg += "Token_id value is outside of the expected range."
            raise ValueError(msg)
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


def _sniff_mm_vocab(spark: SparkSession, path: str) -> bool:
    """True when the vocab file is MatrixMarket-style (``id token weight``
    with a leading integer id), false for UCI-style (``token [class]``)."""
    first = (
        spark.read.text(path)
        .filter(F.length(F.trim("value")) > 0)
        .limit(1)
        .collect()
    )
    if not first:
        return False
    parts = first[0][0].split()
    return len(parts) == 3 and parts[0].lstrip("-").isdigit()


def read_matrix_market(
    spark: SparkSession, mm_path: str, vocab_path: str | None = None,
) -> DataFrame:
    """A2: same triple layout; '%%MatrixMarket' and '%' lines are comments,
    the dims line (3 numbers, first data line) is dropped by position.

    vocab_path accepts either vocab flavor (sniffed): UCI one-token-per-line
    or the MM ``token_id token weight`` form the reference's
    ParseVocabMatrixMarket reads (collection_parser.cc:355-372); docword
    wordIDs are unity-based and map onto the zero-based MM ids via id-1
    (use_unity_based_indices, collection_parser.cc:189-191). With no vocab
    the reference autogenerates keyword = str(zero-based id)
    (collection_parser.cc:143-149)."""
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
    if vocab_path is None:
        # autogenerated tokens: keyword is the zero-based id
        joined = triples.select(
            "doc_id",
            (F.col("token_id") - 1).cast("string").alias("token"),
            F.lit(DEFAULT_CLASS).alias("class_id"),
            "weight",
            "token_id",
        )
    elif _sniff_mm_vocab(spark, vocab_path):
        vocab = read_mm_vocab(spark, vocab_path)
        joined = triples.withColumn("_vid", F.col("token_id") - 1).join(
            F.broadcast(vocab.withColumnRenamed("token_id", "_vid")), "_vid"
        )
    else:
        vocab = read_vocab(spark, vocab_path)
        joined = triples.join(F.broadcast(vocab), "token_id")
    w = Window.partitionBy("doc_id").orderBy("token_id")
    return (
        joined
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
