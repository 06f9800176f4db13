"""Streaming (continuous-ingestion) dedup: the online counterpart of
``operators/dedup.py`` for a pipeline that ingests documents as a
stream and must drop duplicates against EVERYTHING seen so far, not
just the current micro-batch.

Design notes (100 TB / long-lived stream):

- State lives in the Spark state store keyed by content hash (exact) or
  LSH band bucket (near-dup): one tiny row per key, partitioned by the
  groupBy key — never a driver-side set. On a real cluster run with the
  RocksDB state store provider so state spills to disk and checkpoints
  incrementally; there is deliberately NO timeout on dedup state (a
  duplicate is a duplicate forever). If the corpus outgrows even RocksDB,
  the standard move is sharding the stream by hash prefix upstream.

- The batch MinHash path aggregates exploded shingles (groupBy + k
  min()s) because that gets map-side partial aggregation; on a stream a
  groupBy aggregation is itself a stateful operator and cannot feed
  applyInPandasWithState (chained-stateful restriction). Each document
  is one row here, so the stream path computes the k per-doc minima
  row-locally with array HOFs (transform + array_min) — no shuffle, no
  aggregation state, identical values to the batch signature (same
  seed-prefixed xxhash64/md5 per shingle, same minimum). HOFs are
  interpreted, not codegen — acceptable on the per-micro-batch row
  volume, and the only stateless-per-row formulation.

- Near-dup candidates are star-shaped: each LSH bucket's state remembers
  the FIRST document that claimed the bucket (the online canonical) and
  every later arrival emits (doc_id, canonical_doc_id, band). The batch
  operator emits all intra-bucket pairs; online, pairing each newcomer
  with the bucket canonical is the bounded-state equivalent (state is
  O(1) per bucket, not O(|bucket|)). Feed candidates to
  minhash_jaccard_estimate / ngram verification exactly as in batch.

Reference has no streaming dedup (BigARTM is batch EM only); this module
extends the LLM-pipeline surface, same contract style as
streaming/events.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigartm_spark.operators.dedup import (
    LSH_BAND_SIZE,
    MINHASH_K,
    shingles_col,
)


def _row_perm_hash(i: int, shingle: F.Column, hash_fn: str) -> F.Column:
    """Permutation-i hash of one shingle value — same formula as the
    batch ``_perm_hash`` (seed-prefixed md5 / seeded xxhash64), applied
    inside a row-local HOF instead of on an exploded relation."""
    if hash_fn == "md5":
        return F.md5(F.concat(F.lit(f"{i}|"), shingle))
    if hash_fn == "xxhash64":
        return F.xxhash64(F.lit(i), shingle)
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def row_minhash_cols(
    n: int = 3, hash_fn: str = "xxhash64", shingle_hashes=None
) -> list[F.Column]:
    """k per-document minhash columns computed row-locally (no explode,
    no groupBy): min over the doc's shingles of the permutation hash.
    Value-identical to the batch ``_minhash_wide`` columns.

    md5: string shingles, array_min on hex strings — the same
    lexicographic minimum the batch agg takes. xxhash64: the batch
    path's numeric shingles (word-hash runs re-hashed per permutation);
    pass ``shingle_hashes`` as a PRE-PROJECTED ``hashed_shingles_col``
    column — referencing the expression inline here would make Catalyst
    re-evaluate the whole word-hash pipeline k times per row."""
    if hash_fn == "xxhash64":
        from bigartm_spark.operators.dedup import (
            hashed_shingles_col,
            hashed_words_col,
        )

        sh = (
            shingle_hashes
            if shingle_hashes is not None
            else hashed_shingles_col(hashed_words_col(), n)
        )
        return [
            F.array_min(
                F.transform(sh, (lambda i: lambda h: F.xxhash64(F.lit(i), h))(i))
            ).alias(f"_m{i}")
            for i in range(MINHASH_K)
        ]
    sh = shingles_col(n)

    def perm(i):
        # one-arg lambda via closure: a second (defaulted) parameter
        # would flip PySpark's HOF into (element, index) mode
        return lambda s: _row_perm_hash(i, s, hash_fn)

    return [
        F.array_min(F.transform(sh, perm(i))).alias(f"_m{i}")
        for i in range(MINHASH_K)
    ]


def band_rows(
    documents: DataFrame, n: int = 3, hash_fn: str = "xxhash64"
) -> DataFrame:
    """(doc_id, band, band_sig): one row per (document, LSH band), the
    streaming-safe (stateless, per-row) equivalent of the relation the
    batch ``lsh_candidate_pairs`` buckets on. Documents too short to
    shingle produce no rows (same as batch, where they vanish at the
    explode)."""
    n_bands = MINHASH_K // LSH_BAND_SIZE
    if hash_fn == "xxhash64":
        from bigartm_spark.operators.dedup import (
            hashed_shingles_col,
            hashed_words_col,
        )

        # project the numeric shingle hashes ONCE, then take the k
        # row-local minima over the named column (see row_minhash_cols)
        wide = (
            documents.select(
                "doc_id", hashed_words_col().alias("_hw")
            )
            .select(
                "doc_id",
                hashed_shingles_col(F.col("_hw"), n).alias("_sh"),
            )
            .filter(F.size("_sh") >= 1)
            .select(
                "doc_id",
                *row_minhash_cols(n, hash_fn, shingle_hashes=F.col("_sh")),
            )
        )
    else:
        wide = documents.filter(F.size(shingles_col(n)) >= 1).select(
            "doc_id", *row_minhash_cols(n, hash_fn)
        )
    band_structs = [
        F.struct(
            F.lit(band).alias("band"),
            F.concat_ws(
                ",",
                *[
                    F.col(f"_m{band * LSH_BAND_SIZE + j}").cast("string")
                    for j in range(LSH_BAND_SIZE)
                ],
            ).alias("band_sig"),
        )
        for band in range(n_bands)
    ]
    return wide.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("_b")
    ).select("doc_id", "_b.band", "_b.band_sig")


_EXACT_OUT = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text_md5", T.StringType()),
    ]
)
_EXACT_STATE = T.StructType(
    [
        T.StructField("canonical_doc_id", T.LongType()),
        T.StructField("n_dups", T.LongType()),
    ]
)


def streaming_exact_dedup(documents: DataFrame) -> DataFrame:
    """First-seen exact dedup over a document stream: emits (doc_id,
    text_md5) only for the first document carrying each content hash —
    across ALL micro-batches, not just within one. Later duplicates are
    swallowed (their count accumulates in state).

    Batch exact_dedup picks min(doc_id) as canonical; a stream cannot
    (the minimum may not have arrived yet), so the canonical is
    first-seen, min(doc_id) within the first micro-batch that carries
    the hash — deterministic under replay because micro-batch contents
    are deterministic from the checkpoint."""

    def update(key, pdfs, state):
        import pandas as pd

        text_md5 = key[0]
        batch_min = None
        n = 0
        for pdf in pdfs:
            n += len(pdf)
            m = int(pdf["doc_id"].min())
            batch_min = m if batch_min is None else min(batch_min, m)
        if state.exists:
            canonical, seen = state.get
            state.update((canonical, seen + n))
            return  # all duplicates of an already-emitted doc
        state.update((batch_min, n))
        yield pd.DataFrame({"doc_id": [batch_min], "text_md5": [text_md5]})

    keyed = documents.select("doc_id", F.md5("text").alias("text_md5"))
    return keyed.groupBy("text_md5").applyInPandasWithState(
        update, _EXACT_OUT, _EXACT_STATE, "update", "NoTimeout"
    )


_LSH_OUT = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("canonical_doc_id", T.LongType()),
        T.StructField("band", T.IntegerType()),
    ]
)
_LSH_STATE = T.StructType([T.StructField("canonical_doc_id", T.LongType())])


def streaming_lsh_candidates(
    documents: DataFrame, n: int = 3, hash_fn: str = "xxhash64"
) -> DataFrame:
    """Online MinHash-LSH candidate generation: for every arriving
    document whose band signature collides with a bucket claimed in any
    earlier micro-batch (or by an earlier doc of the same batch), emit
    (doc_id, canonical_doc_id, band). The bucket canonical is first-seen
    (min doc_id within the claiming batch). Star-shaped output — verify
    candidates downstream exactly like the batch pairs."""

    def update(key, pdfs, state):
        import pandas as pd

        band = int(key[0])
        ids: list[int] = []
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf["doc_id"])
        ids.sort()
        if state.exists:
            (canonical,) = state.get
        else:
            canonical = ids[0]
            state.update((canonical,))
            ids = ids[1:]
        if ids:
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "canonical_doc_id": [canonical] * len(ids),
                    "band": [band] * len(ids),
                }
            )

    return band_rows(documents, n, hash_fn).groupBy(
        "band", "band_sig"
    ).applyInPandasWithState(update, _LSH_OUT, _LSH_STATE, "update", "NoTimeout")
