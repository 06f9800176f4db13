"""A5-A11: batch/model/dictionary/score-tracker persistence + readable sinks.

Reference writes protobuf files per batch and chunked binary model files
(master_component.cc:331-571); our batch format IS parquet (columnar,
chunked row groups for free), so every export/import is a one-liner with
schema enforcement. CSV sinks mirror the CLI's --write-*-readable
(srcmain.cc:1202-1300).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigartm_spark.model.phi import PhiMatrix
from bigartm_spark.schemas import DICTIONARY_SCHEMA, DOCS_SCHEMA


def save_batches(docs: DataFrame, path: str, num_batches: int | None = None):
    """A7: persist the long corpus; batch_id is the partition key so
    online fit / incremental reads prune partitions (§4)."""
    w = docs
    if num_batches is not None:
        w = docs.repartition(num_batches, "batch_id")
    w.write.mode("overwrite").partitionBy("batch_id").parquet(path)


def _hadoop_ls(spark: SparkSession, path: str) -> list[str]:
    """Directory entry names via the Hadoop FileSystem API — works for
    local paths AND hdfs://, s3a://, etc. (a local-filesystem glob would
    silently miss remote stores and fall through to the wrong reader)."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return []
    return [st.getPath().getName() for st in fs.listStatus(hpath)]


def load_batches(
    spark: SparkSession, path: str, format: str | None = None
) -> DataFrame:
    """A5: lazy scan of the batch store. Accepts BOTH formats: our
    parquet store and a directory of reference ``.batch`` protobuf files
    (one serialized Batch per file, messages.proto:65-74). Pass
    ``format`` ("parquet" | "batch_pb") to skip sniffing; otherwise the
    directory listing (Hadoop FS, any scheme) decides."""
    if format is None:
        names = _hadoop_ls(spark, path)
        format = (
            "batch_pb"
            if any(n.endswith(".batch") for n in names)
            else "parquet"
        )
    if format == "batch_pb":
        from bigartm_spark.sources.batch_pb import read_batch_folder

        return read_batch_folder(spark, path)
    if format != "parquet":
        raise ValueError(f"unknown batch format {format!r}")
    df = spark.read.parquet(path)
    cols = [f.name for f in DOCS_SCHEMA.fields]
    return df.select(*[F.col(c).cast(dict_field_type(DOCS_SCHEMA, c)) for c in cols])


def dict_field_type(schema, name):
    return next(f.dataType for f in schema.fields if f.name == name)


def load_batch_vocab(
    spark: SparkSession, path: str, format: str | None = None
) -> DataFrame:
    """(class_id, token) universe of a batch store — for reference
    ``.batch`` folders this is the Batch.token table INCLUDING
    zero-occurrence tokens (dictionary_operations.cc:316-325 gathers
    zero-stat entries for them); the parquet store holds occurrence rows
    only, so there the universe equals the occurring set."""
    if format is None:
        names = _hadoop_ls(spark, path)
        format = (
            "batch_pb"
            if any(n.endswith(".batch") for n in names)
            else "parquet"
        )
    if format == "batch_pb":
        from bigartm_spark.sources.batch_pb import read_batch_vocab

        return read_batch_vocab(spark, path)
    return (
        load_batches(spark, path, format=format)
        .select("class_id", "token")
        .dropDuplicates(["class_id", "token"])
    )


def export_model(phi: PhiMatrix, path: str):
    """A8. A ``.bin``/``.model`` path writes the reference's binary
    chunked-TopicModel format (sources/model_pb.py, readable by the C++
    ImportModel); any other path is the long-COO parquet export dir with
    a topics sidecar."""
    if path.endswith((".bin", ".model")):
        from bigartm_spark.sources.model_pb import write_model_file

        write_model_file(phi, path)
        return
    phi.to_long().write.mode("overwrite").parquet(f"{path}/phi.parquet")
    with open(f"{path}/meta.json", "w") as f:
        json.dump({"name": phi.name, "topics": phi.topics}, f)


def import_model(spark: SparkSession, path: str) -> PhiMatrix:
    """Auto-detects the format: a reference binary model file (version
    byte 0, master_component.cc:432-505) or our parquet export dir."""
    if os.path.isfile(path):
        from bigartm_spark.sources.model_pb import read_model_file

        return read_model_file(spark, path)
    with open(f"{path}/meta.json") as f:
        meta = json.load(f)
    long_df = spark.read.parquet(f"{path}/phi.parquet")
    return PhiMatrix.from_long(meta["name"], meta["topics"], long_df)


def export_dictionary(
    dictionary: DataFrame,
    path: str,
    cooc: DataFrame | None = None,
    name: str = "dictionary",
    num_items_in_collection: int = 0,
):
    """A9. A ``.dict`` path writes the reference's binary token-chunked
    format (sources/dict_pb.py, readable by the C++ Import); any other
    path is the parquet export dir."""
    if path.endswith(".dict"):
        from bigartm_spark.sources.dict_pb import write_dict_file

        write_dict_file(
            dictionary,
            path,
            name=name,
            num_items_in_collection=num_items_in_collection,
            cooc=cooc,
        )
        return
    dictionary.write.mode("overwrite").parquet(f"{path}/dictionary.parquet")
    if cooc is not None:
        cooc.write.mode("overwrite").parquet(f"{path}/cooc.parquet")


def import_dictionary(spark: SparkSession, path: str) -> DataFrame:
    """Auto-detects the format: a ``.dict`` file (reference binary,
    dictionary_operations.cc:165-252) or our parquet export dir."""
    if path.endswith(".dict"):
        from bigartm_spark.sources.dict_pb import read_dict_file

        df, _, _ = read_dict_file(spark, path)
        return df
    df = spark.read.parquet(f"{path}/dictionary.parquet")
    return df.select(*[f.name for f in DICTIONARY_SCHEMA.fields])


def import_cooc(spark: SparkSession, path: str) -> DataFrame | None:
    """Cooc stats bundled with an exported dictionary (the reference
    embeds cooc triplets inside the dictionary object,
    messages.proto:555-568 / dictionary.h — ours ride alongside as a
    second parquet in the same export dir). None if absent.

    Presence check goes through the Hadoop FileSystem API (same as
    load_batches): a local glob would silently return None for a store
    on hdfs:// or s3a:// and the dictionary would quietly lose its cooc
    relation."""
    if not _hadoop_ls(spark, f"{path}/cooc.parquet"):
        return None
    return spark.read.parquet(f"{path}/cooc.parquet")


def export_score_tracker(tracker: dict[str, list[float]], path: str):
    """A10: per-pass score history. A ``.bin``/``.tracker`` path writes
    the reference's binary ScoreData stream (sources/tracker_pb.py,
    readable by the C++ ImportScoreTracker); otherwise JSON."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if path.endswith((".bin", ".tracker")):
        from bigartm_spark.sources.tracker_pb import write_score_tracker_file

        write_score_tracker_file(tracker, path)
        return
    with open(path, "w") as f:
        json.dump(tracker, f)


def import_score_tracker(path: str) -> dict[str, list[float]]:
    """Sniffs the format: a leading 0x00 byte is the reference binary
    stream (JSON can never start with NUL), anything else is JSON."""
    with open(path, "rb") as f:
        first = f.read(1)
    if first == b"\x00":
        from bigartm_spark.sources.tracker_pb import read_score_tracker_file

        return read_score_tracker_file(path)
    with open(path) as f:
        return json.load(f)


def write_model_readable(phi: PhiMatrix, path: str, sep: str = ","):
    """A11: CSV sink of the wide (pivoted) model — the CLI's
    --write-model-readable (srcmain.cc --csv-separator)."""
    long_df = phi.to_long()
    wide = (
        long_df.groupBy("class_id", "token")
        .pivot("topic", phi.topics)
        .agg(F.first("value"))
    )
    wide.coalesce(1).write.mode("overwrite").option("header", True).option(
        "sep", sep
    ).csv(path)


def _sorted_join(key_cols, body_col="_seg"):
    """collect_list order is plan-dependent; sort segments by their key
    struct before joining so the emitted line is deterministic."""
    return F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(*key_cols, F.col(body_col).alias("s")))
            ),
            lambda s: s["s"],
        ),
        " ",
    )


def write_corpus_vw(docs: DataFrame, path: str):
    """A11: re-export the corpus in VW format (one doc per line).

    ``|class`` is a modality *switch* in the VW grammar — it applies to
    every following token until the next switch (collection_parser.cc:
    595-623) — so tokens are grouped per class before assembly:
    default-class tokens (no prefix) first, then one ``|class`` segment
    per remaining modality. Interleaving classes token-by-token (one
    pipe per token) would silently re-class every default token that
    follows a modality token on re-read.

    Typed transactions are emitted as ``||type`` segments, one per
    original transaction_id (grammar `:595-666`): tokens of one
    transaction stay in one segment, so transaction grouping (which the
    E-step's product form depends on) survives the round trip; the
    numeric transaction_id values themselves are re-assigned by the
    parser, exactly as a reference re-parse would."""
    tok = F.concat("token", F.lit(":"), F.col("weight").cast("string"))
    is_tx = (
        F.col("transaction_typename").isNotNull()
        & (F.col("transaction_typename") != "@default_transaction")
    )
    base = docs.withColumn("_tok", tok).withColumn("_is_tx", is_tx)

    # class-grouped body inside one (doc, transaction) scope; the
    # default-transaction scope collapses every non-tx token
    per_class = (
        base.withColumn(
            "_tid", F.when(is_tx, F.col("transaction_id")).otherwise(F.lit(-1))
        )
        .withColumn(
            "_ttype",
            F.when(is_tx, F.col("transaction_typename")).otherwise(F.lit("")),
        )
        .groupBy("doc_id", "title", "_tid", "_ttype", "class_id")
        .agg(
            _sorted_join(
                [F.coalesce("pos", F.lit(0)).alias("pos")], "_tok"
            ).alias("_body")
        )
        .withColumn(
            "_seg",
            F.when(
                F.col("class_id") == "@default_class", F.col("_body")
            ).otherwise(F.concat(F.lit("|"), "class_id", F.lit(" "), "_body")),
        )
    )
    per_scope = (
        per_class.groupBy("doc_id", "title", "_tid", "_ttype")
        .agg(
            _sorted_join(
                [
                    # default class sorts first, then by name
                    (F.col("class_id") != "@default_class").cast("int").alias("k"),
                    F.col("class_id").alias("c"),
                ]
            ).alias("_scope_body")
        )
        .withColumn(
            "_scope",
            # '||type body ||': the trailing bare '||' closes the scope as
            # ONE multi-token transaction (collection_parser.cc:598-601);
            # without it a following '||type' would dump these tokens as
            # singleton transactions (parse_vw_line, pinned by the
            # TransactionVowpalWabbit port)
            F.when(F.col("_tid") == -1, F.col("_scope_body")).otherwise(
                F.concat(
                    F.lit("||"), "_ttype", F.lit(" "), "_scope_body",
                    F.lit(" ||"),
                )
            ),
        )
    )
    per_doc = (
        per_scope.groupBy("doc_id", "title")
        .agg(
            # non-transaction scope (_tid=-1) first, then transactions
            # in original order
            _sorted_join([F.col("_tid").alias("t")], "_scope").alias("_line")
        )
        .select(F.concat_ws(" ", "title", "_line").alias("value"))
    )
    per_doc.coalesce(1).write.mode("overwrite").text(path)


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str | list[str] = "doc_id",
    num_buckets: int = 32,
    path: str | None = None,
):
    """Persist a relation bucketed (and sorted) by its join key(s). This
    is the co-located-join store: two tables bucketed on the same keys
    with the same bucket count join WITHOUT a shuffle — the move that
    matters most for repeated joins against a 100 TB corpus (dedup
    reruns, incremental fits, theta-cache joins, the shuffle-regime
    E-step token->phi join on (class_id, token)). At cluster scale
    choose num_buckets ~ total_size / 256 MB.

    Bucketing metadata lives in the session catalog (saveAsTable);
    ``path`` makes it an external table at that location.
    """
    cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *cols)
        .sortBy(*cols)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def load_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket spec intact (a plain
    ``read.parquet`` of the files would lose the metadata and reintroduce
    the shuffle)."""
    return spark.table(table)
