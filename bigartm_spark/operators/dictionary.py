"""Dictionary operators: gather (D1), filter (B3), top-k (B4/E6).

Reference semantics:
- gather: /root/reference/src/artm/core/dictionary_operations.cc:254-332
  per (class_id, token): tf = sum(weight), df = #distinct docs,
  value = tf / class-total tf.
- filter: dictionary_operations.cc:483-527 (min/max df, df_rate, tf;
  optional value renormalization).
- top-k by df: dictionary_operations.cc:530-542 (max_dictionary_size).

All plain DataFrame aggregations — Catalyst plans partial+final hash
aggregates, replacing the reference's per-batch token maps + final merge.
The class-total tf uses a tiny groupBy+broadcast-join back instead of a
window, so the big table is shuffled once, not twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gather_dictionary(
    docs: DataFrame,
    vocab: DataFrame | None = None,
    full_vocab: DataFrame | None = None,
) -> DataFrame:
    """D1. dictionary(class_id, token, value, tf, df) from a long corpus.

    vocab (E10): optional (token_id, token [, class_id]) from read_vocab —
    adds a vocab_order column so exports follow vocab-file order
    (dictionary_operations.cc:336-396); hash order otherwise.

    full_vocab: optional (class_id, token) relation of the COMPLETE token
    universe (a batch store's Batch.token lists, or the vocab file). The
    reference's Gather emits an entry for every such token even when it
    never occurs in any item — tf = df = value = 0
    (dictionary_operations.cc:316-325 iterates batch.token, :399-401
    zero-fills via operator[]) — and InitializeModel then creates phi
    rows for them, which changes the per-topic normalization. Pinned by
    the C++ Regularizers.TopicSelection port."""
    # two-stage agg instead of countDistinct(doc_id): the Expand that
    # implements a mixed count-distinct doubles the shuffled rows; the
    # per-(token, doc) pre-agg gets map-side combine on occurrence rows
    from bigartm_spark.session import coalesce_if_small

    # tiny corpus -> 2-partition scan: measured 0.52s -> 0.25s at sf0.1
    # (task-scheduling floor, SCALE.md); estimate-gated, no count action
    docs = coalesce_if_small(docs, target=2)
    per_doc = docs.groupBy("class_id", "token", "doc_id").agg(
        F.sum("weight").alias("_w")
    )
    stats = per_doc.groupBy("class_id", "token").agg(
        F.sum("_w").alias("tf"),
        F.count(F.lit(1)).cast("double").alias("df"),
    )
    class_tot = stats.groupBy("class_id").agg(F.sum("tf").alias("_class_tf"))
    out = (
        stats.join(F.broadcast(class_tot), "class_id")
        .withColumn("value", F.col("tf") / F.col("_class_tf"))
        .select("class_id", "token", "value", "tf", "df")
    )
    if full_vocab is not None:
        universe = full_vocab.select("class_id", "token").dropDuplicates(
            ["class_id", "token"]
        )
        out = (
            universe.join(out, ["class_id", "token"], "left")
            .fillna({"value": 0.0, "tf": 0.0, "df": 0.0})
        )
    if vocab is not None:
        # join on (token, class_id) when the vocab carries classes so a
        # token listed under two modalities keeps distinct order slots
        keys = ["token", "class_id"] if "class_id" in vocab.columns else ["token"]
        order = vocab.select(
            *keys, F.col("token_id").alias("vocab_order")
        )
        out = out.join(F.broadcast(order), keys, "left")
    return out


def num_items(docs: DataFrame) -> int:
    """Scalar companion of D1 (num_items_in_collection)."""
    return docs.select(F.countDistinct("doc_id")).collect()[0][0]


def filter_dictionary(
    dictionary: DataFrame,
    num_items_in_collection: int | None = None,
    class_id: str | None = None,
    min_df: float | None = None,
    max_df: float | None = None,
    min_df_rate: float | None = None,
    max_df_rate: float | None = None,
    min_tf: float | None = None,
    max_tf: float | None = None,
    recalculate_value: bool = False,
) -> DataFrame:
    """B3. Predicate filter on token stats; rate thresholds are df/num_items.

    With recalculate_value, value is renormalized to tf / class-total tf of
    the *kept* tokens (dictionary_operations.cc:512-527).
    """
    cond = F.lit(True)
    if class_id is not None:
        # Thresholds apply within one class; other classes pass through
        # (reference filters per requested class_id).
        scoped = F.col("class_id") == class_id
    else:
        scoped = F.lit(True)
    if min_df is not None:
        cond &= F.col("df") >= min_df
    if max_df is not None:
        cond &= F.col("df") <= max_df
    if min_df_rate is not None:
        cond &= F.col("df") >= min_df_rate * num_items_in_collection
    if max_df_rate is not None:
        cond &= F.col("df") <= max_df_rate * num_items_in_collection
    if min_tf is not None:
        cond &= F.col("tf") >= min_tf
    if max_tf is not None:
        cond &= F.col("tf") <= max_tf
    out = dictionary.filter(~scoped | cond)
    if recalculate_value:
        tot = out.groupBy("class_id").agg(F.sum("tf").alias("_class_tf"))
        out = (
            out.drop("value")
            .join(F.broadcast(tot), "class_id")
            .withColumn("value", F.col("tf") / F.col("_class_tf"))
            .select("class_id", "token", "value", "tf", "df")
        )
    return out


def top_k_by_df(dictionary: DataFrame, k: int) -> DataFrame:
    """B4/E6. Keep the k most-document-frequent tokens per class.

    Deterministic tiebreak on token so results are stable across runs
    (the reference sorts then truncates). rank over a per-class window —
    the dictionary is small (vocab-sized), so a single-partition-per-class
    window is fine even at 100TB corpus scale.
    """
    w = Window.partitionBy("class_id").orderBy(F.desc("df"), F.asc("token"))
    return (
        dictionary.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
