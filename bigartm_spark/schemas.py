"""Canonical StructTypes (fixed schemas; never inferred).

Mirrors the reference protobuf type system (SURVEY.md §1.2):
float32 matrix values (accumulated in double), no maps/decimals/timestamps.
Reference: /root/reference/src/artm/messages.proto:26-74,555-568.
"""

from __future__ import annotations

from pyspark.sql import types as T

DEFAULT_CLASS = "@default_class"
DEFAULT_TRANSACTION = "@default_transaction"

# Long (exploded bag-of-words) corpus. One row per token occurrence.
# Replaces Batch/Item (messages.proto:26-74); Spark partitions replace
# batch files, batch_id retained for online-fit ordering / score parity.
DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("batch_id", T.StringType(), True),
        T.StructField("class_id", T.StringType(), False),
        T.StructField("token", T.StringType(), False),
        # double, not float32: every view/parser emits double and all
        # accumulation is double anyway (the reference accumulates scores
        # in double too, messages.proto:289-302)
        T.StructField("weight", T.DoubleType(), False),
        T.StructField("pos", T.IntegerType(), True),
        T.StructField("transaction_id", T.IntegerType(), True),
        T.StructField("transaction_typename", T.StringType(), True),
    ]
)

# Corpus-level vocabulary stats (messages.proto:555-568; dictionary.h).
DICTIONARY_SCHEMA = T.StructType(
    [
        T.StructField("class_id", T.StringType(), False),
        T.StructField("token", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("tf", T.DoubleType(), True),
        T.StructField("df", T.DoubleType(), True),
    ]
)

# Sparse token x token co-occurrence, COO (messages.proto:562-567).
COOC_SCHEMA = T.StructType(
    [
        T.StructField("token_a", T.StringType(), False),
        T.StructField("token_b", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("tf", T.DoubleType(), True),
        T.StructField("df", T.DoubleType(), True),
    ]
)

# Phi-class matrices in long COO form (dense_phi_matrix.h:131-158).
PHI_SCHEMA = T.StructType(
    [
        T.StructField("class_id", T.StringType(), False),
        T.StructField("token", T.StringType(), False),
        T.StructField("topic", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
    ]
)

# Compact (row-per-token) phi used internally by the EM kernel: the topic
# axis is a fixed-order array, topics list kept model-side. This is the
# Spark analogue of the reference's dense row-major rows.
def phi_compact_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("class_id", T.StringType(), False),
            T.StructField("token", T.StringType(), False),
            T.StructField("values", T.ArrayType(T.DoubleType(), False), False),
        ]
    )


THETA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("topic", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
    ]
)

PTDW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("pos", T.IntegerType(), False),
        T.StructField("topic", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
    ]
)
