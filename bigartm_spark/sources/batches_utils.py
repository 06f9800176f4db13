"""BatchVectorizer — the reference's front-door corpus loader.

Reference: python/artm/batches_utils.py:45-128. One constructor accepts
every input format ('bow_uci', 'vowpal_wabbit', 'bow_n_wd', 'batches'),
optionally persists the batch store, applies per-source data weights,
and gathers the default dictionary. Here the "vectorized collection" IS
the long docs DataFrame; batches are parquet partitions, so the facade
is thin composition over the per-format readers:

- 'bow_uci'        -> sources/uci.read_uci (docword.<name>.txt + vocab)
- 'vowpal_wabbit'  -> sources/vw.read_vowpal_wabbit
- 'bow_n_wd'       -> sources/memory.from_n_wd (numpy counts + vocab)
- 'batches'        -> sources/io.load_batches (parquet or .batch store)

Deviations, stated: batch_size re-keys batch_id as doc_id // batch_size
(deterministic, shuffle-free — the reference's sequential chunking needs
a global order that a distributed parse should not impose); in-memory
models / guid batch naming have no meaning here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class BatchVectorizer:
    """Parse a collection into the long docs DataFrame (+ dictionary).

    data_path / data_weight may be lists (one weight per source, summed
    by union — batches_utils.py data_weight list semantics); weight
    multiplies token weight, which is exactly where batch_weight enters
    the E-step math (processor_helpers.cc:180-215 batch_weight · n_dw).
    """

    def __init__(
        self,
        spark: SparkSession | None = None,
        data_path: str | list[str] = "",
        data_format: str = "batches",
        collection_name: str | None = None,
        target_folder: str | None = None,
        batch_size: int | None = None,
        data_weight: float | list[float] = 1.0,
        n_wd=None,
        vocabulary=None,
        gather_dictionary: bool = True,
        class_ids: list[str] | None = None,
    ):
        if spark is None:
            # reference ctor has no session argument
            # (batches_utils.py:46); default to the package session
            from bigartm_spark.session import get_spark

            spark = get_spark()
        self.spark = spark
        self.data_path = data_path
        self.batch_size = batch_size
        paths = data_path if isinstance(data_path, list) else [data_path]
        weights = (
            data_weight
            if isinstance(data_weight, list)
            else [data_weight] * len(paths)
        )
        if len(weights) != len(paths):
            raise ValueError("data_weight list must match data_path list")

        parts = [
            self._read_one(data_format, p, collection_name, n_wd, vocabulary)
            for p in paths
        ]
        docs = None
        for df, w in zip(parts, weights):
            if w != 1.0:
                df = df.withColumn(
                    "weight", F.col("weight") * F.lit(float(w))
                )
            docs = df if docs is None else docs.unionByName(df)

        if class_ids is not None:
            docs = docs.filter(F.col("class_id").isin(list(class_ids)))
        if batch_size is not None:
            docs = docs.withColumn(
                "batch_id",
                (F.col("doc_id") / F.lit(int(batch_size)))
                .cast("long")
                .cast("string"),
            )

        if target_folder is not None:
            from bigartm_spark.sources.io import save_batches

            if any(
                self._under(p, target_folder)
                for p in paths
                if isinstance(p, str) and p
            ):
                # the reference parser writes .batch files next to the
                # source file (its own tests use target_folder ==
                # dirname(data_path)); save_batches overwrites the
                # folder, so the lazy parse must be materialized BEFORE
                # its source is clobbered. Gated on the overlap — the
                # common disjoint-folder path stays zero-copy.
                docs = docs.localCheckpoint(eager=True)
            save_batches(docs, target_folder)
            docs = spark.read.parquet(target_folder)
        if data_format != "batches" and target_folder is not None:
            # reference batches_utils.py:128: after a non-batch parse,
            # data_path points at the written batch store (scripts then
            # call Dictionary.gather(data_path=bv.data_path))
            self.data_path = target_folder

        self.docs = docs
        self._dictionary = None
        self._gather = gather_dictionary

    @staticmethod
    def _under(path: str, folder: str) -> bool:
        """True when ``path`` sits inside ``folder`` (local paths)."""
        import os

        try:
            p = os.path.realpath(path)
            f = os.path.realpath(folder)
        except (OSError, ValueError):
            return False
        return p == f or p.startswith(f.rstrip(os.sep) + os.sep)

    def _read_one(self, fmt, path, collection_name, n_wd, vocabulary):
        if fmt == "bow_uci":
            from bigartm_spark.sources.uci import read_uci

            if collection_name is None:
                raise ValueError("bow_uci requires collection_name")
            return read_uci(
                self.spark,
                os.path.join(path, f"docword.{collection_name}.txt"),
                os.path.join(path, f"vocab.{collection_name}.txt"),
            )
        if fmt == "vowpal_wabbit":
            from bigartm_spark.sources.vw import read_vowpal_wabbit

            return read_vowpal_wabbit(self.spark, path)
        if fmt == "bow_n_wd":
            from bigartm_spark.sources.memory import from_n_wd

            if n_wd is None or vocabulary is None:
                raise ValueError("bow_n_wd requires n_wd and vocabulary")
            return from_n_wd(self.spark, n_wd, vocabulary)
        if fmt == "batches":
            from bigartm_spark.sources.io import load_batches

            return load_batches(self.spark, path)
        raise IOError(f"Unknown data format {fmt!r}")

    @property
    def dictionary(self) -> DataFrame | None:
        """Default gathered dictionary (batches_utils.py
        gather_dictionary=True); built lazily, None when disabled."""
        if self._dictionary is None and self._gather:
            from bigartm_spark.operators.dictionary import gather_dictionary

            self._dictionary = gather_dictionary(self.docs).cache()
        return self._dictionary

    @property
    def batches_ids(self) -> list[str]:
        """Distinct batch ids (the reference's batches_list file names)."""
        return [
            r.batch_id
            for r in self.docs.select("batch_id").distinct().collect()
        ]

    @property
    def weights(self) -> list[float]:
        return [1.0 for _ in self.batches_ids]
