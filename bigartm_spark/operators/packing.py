"""Sequence packing: corpus -> fixed-token-budget training sequences.

The last step of an LLM data pipeline: documents, already cleaned /
deduped / sampled, are laid out into training sequences of exactly
``budget`` tokens. We implement the GPT-style concat-and-chunk layout
(documents concatenated in a deterministic order, the stream cut every
``budget`` tokens) because it is the one large-scale pipelines actually
use — no padding waste, and it is expressible as pure window arithmetic:

- shard by a deterministic key (doc_id % n_shards) so layout work
  spreads over the cluster and each shard's packing is independent;
- within a shard, order by doc_id and take a running token-offset
  (one window cumsum — the only shuffle, keyed by shard);
- a doc's pack_id is its start offset div budget; docs whose span
  crosses a pack boundary are flagged (the trainer's attention mask /
  document-boundary logic needs exactly this bit).

Everything is integer Column arithmetic — replayable in the DuckDB
oracle, deterministic under retry, and scale-shaped: one shuffle on the
shard key, bounded per-shard state, no driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs_with_tokens: DataFrame,
    budget: int = 2048,
    n_shards: int = 64,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """(doc_id, n_tokens) -> (doc_id, shard, start_offset, end_offset,
    pack_id, crosses_boundary). ``pack_id`` is globally unique
    (shard * 2^32 + local pack index)."""
    shard = (F.col(id_col) % F.lit(n_shards)).cast("long")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    out = (
        docs_with_tokens.withColumn("shard", shard)
        .withColumn(
            "start_offset",
            F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("long"),
        )
        .withColumn(
            "end_offset", F.col("start_offset") + F.col(tokens_col).cast("long")
        )
    )
    local_pack = F.floor(F.col("start_offset") / F.lit(budget)).cast("long")
    # a doc crosses a boundary iff its span covers an offset divisible by
    # budget strictly inside (start, end)
    last_pack_touched = F.floor(
        (F.col("end_offset") - F.lit(1)) / F.lit(budget)
    ).cast("long")
    return out.select(
        id_col,
        "shard",
        "start_offset",
        "end_offset",
        (F.col("shard") * F.lit(1 << 32) + local_pack).alias("pack_id"),
        F.when(F.col(tokens_col) > 0, (last_pack_touched > local_pack))
        .otherwise(F.lit(False))
        .cast("int")
        .alias("crosses_boundary"),
    )


def packing_stats(packed: DataFrame, budget: int = 2048) -> DataFrame:
    """Layout efficiency rollup: per shard, the number of packs, total
    tokens, and fill ratio (tokens / (packs * budget)) — the number a
    pipeline owner watches to size ``budget`` and ``n_shards``."""
    per_shard = packed.groupBy("shard").agg(
        F.countDistinct("pack_id").alias("n_packs"),
        F.max("end_offset").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("crosses_boundary").cast("long").alias("n_boundary_docs"),
    )
    return per_shard.select(
        "shard",
        "n_packs",
        "total_tokens",
        "n_docs",
        "n_boundary_docs",
        (
            F.col("total_tokens").cast("double")
            / (F.col("n_packs") * F.lit(budget)).cast("double")
        ).alias("fill_ratio"),
    )
