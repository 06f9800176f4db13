"""Reference co-occurrence file parser (the CLI's --read-cooc input).

Format per dictionary_operations.cc:100-190 (GatherDictionary cooc
branch): one adjacency line per first-token —

    [|modality] first_token [|modality] second:value second2:value ...

fields split on space/colon/tab; a ``|modality`` marker switches the
class of the tokens that follow (first token's class also seeds the
second tokens' default). Lines parse into (class_a, token_a, class_b,
token_b, value) rows; ``symmetric=True`` mirrors each pair, matching
``symmetric_cooc_values``.

The scan is ``spark.read.text`` (distributed, one row per line); parsing
is an Arrow-batched mapInPandas — a parser, not a hot path.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigartm_spark.schemas import DEFAULT_CLASS

COOC_FILE_SCHEMA = T.StructType(
    [
        T.StructField("class_a", T.StringType(), False),
        T.StructField("token_a", T.StringType(), False),
        T.StructField("class_b", T.StringType(), False),
        T.StructField("token_b", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
    ]
)


def parse_cooc_line(line: str) -> list[tuple]:
    """One adjacency line -> pair rows (pure function, unit-testable)."""
    strs = [s for s in _split(line)]
    cls = DEFAULT_CLASS
    i = 0
    # leading modality markers before the first token
    while i < len(strs) and (not strs[i] or strs[i][0] == "|"):
        if strs[i]:
            cls = strs[i][1:]
        i += 1
    if i >= len(strs):
        return []
    first_cls, first_tok = cls, strs[i]
    i += 1
    out = []
    second_cls = first_cls
    while i < len(strs):
        # modality markers may precede any second token
        while i < len(strs) and (not strs[i] or strs[i][0] == "|"):
            if strs[i]:
                second_cls = strs[i][1:]
            i += 1
        if i + 1 >= len(strs):
            break
        tok, val = strs[i], strs[i + 1]
        i += 2
        try:
            v = float(val)
        except ValueError:
            continue
        out.append((first_cls, first_tok, second_cls, tok, v))
    return out


def _split(line: str) -> list[str]:
    import re

    return [s for s in re.split(r"[ :\t\r]", line.strip()) if s != ""]


def read_cooc(
    spark: SparkSession, path: str, symmetric: bool = False
) -> DataFrame:
    """--read-cooc: adjacency file -> (class_a, token_a, class_b,
    token_b, value) relation."""
    import pandas as pd

    from bigartm_spark.session import ensure_package_shipped

    ensure_package_shipped(spark)
    lines = spark.read.text(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in COOC_FILE_SCHEMA.fields]
        for pdf in batches:
            rows: list[tuple] = []
            for line in pdf["value"]:
                rows.extend(parse_cooc_line(line))
            if rows:
                yield pd.DataFrame(rows, columns=cols)

    out = lines.mapInPandas(parse, COOC_FILE_SCHEMA)
    if symmetric:
        mirrored = out.select(
            F.col("class_b").alias("class_a"),
            F.col("token_b").alias("token_a"),
            F.col("class_a").alias("class_b"),
            F.col("token_a").alias("token_b"),
            "value",
        )
        out = out.unionByName(mirrored)
    return out


def to_cooc_relation(cooc_file_df: DataFrame) -> DataFrame:
    """Project to the engine's COOC_SCHEMA (token_a, token_b, value,
    tf, df) for ImproveCoherencePhi / BitermsPhi — default-class pairs,
    value doubling as tf (the reference's dictionary cooc carries value
    only; tf/df are a ToDo upstream, dictionary_operations.cc:180)."""
    return cooc_file_df.filter(
        (F.col("class_a") == DEFAULT_CLASS) & (F.col("class_b") == DEFAULT_CLASS)
    ).select(
        "token_a",
        "token_b",
        "value",
        F.col("value").alias("tf"),
        F.lit(None).cast("double").alias("df"),
    )
