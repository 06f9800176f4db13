"""BatchVectorizer — the reference's front-door corpus loader.

Reference: python/artm/batches_utils.py:33-362. One constructor accepts
every input format ('bow_uci', 'vowpal_wabbit', 'bow_n_wd', 'batches'),
persists the parsed collection as a reference-layout ``.batch`` folder,
applies per-source data weights, and gathers the default dictionary.
Here the "vectorized collection" IS the long docs DataFrame; the
``.batch`` store is written by ``sources/batch_pb.write_batch_folder``
(executor-side, one file per batch group), so the facade is thin
composition over the per-format readers:

- 'bow_uci'        -> sources/uci.read_uci (docword.<name>.txt + vocab)
- 'vowpal_wabbit'  -> sources/vw.read_vowpal_wabbit
- 'bow_n_wd'       -> sources/memory.from_n_wd (numpy counts + vocab)
- 'batches'        -> sources/io.load_batches (parquet or .batch store),
                      a list of in-memory ``messages.Batch`` objects
                      (batches_utils.py:208-211 process-in-memory mode),
                      or a list of batch file names under data_path
                      (batches_utils.py:223-225)

Store/lifecycle parity (batches_utils.py:88-143): a non-'batches' parse
always materializes a batch folder — ``target_folder`` when given, else
an auto-created uuid-urn directory under ``data_path`` that is removed
by ``__del__``/``with``-exit (``_remove_batches``). ``batches_list``
holds ``Batch(filename)`` wrappers over the written files (or in-memory
batch ids), ``batches_ids`` the file names themselves — both exactly
what reference scripts glob and reopen.

Deviations, stated: batch_size re-keys batch_id as doc_id // batch_size
(deterministic, shuffle-free — the reference's sequential chunking needs
a global order that a distributed parse should not impose; the grouping
it produces is the same contiguous-doc chunking); data_weight lists are
baked into the stored token weights at parse time (exactly where
batch_weight enters the E-step math, processor_helpers.cc:180-215), so
``weights`` reads 1.0 per written batch rather than echoing the
constructor argument.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Batch:
    """Filename wrapper (reference batches_utils.py:33-42)."""

    def __init__(self, filename: str):
        self._filename = filename

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return "Batch({0})".format(self._filename)

    @property
    def filename(self) -> str:
        return self._filename


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
        batches: list | None = None,
        process_in_memory_model=None,
    ):
        if spark is None:
            # reference ctor has no session argument
            # (batches_utils.py:46); default to the package session
            from bigartm_spark.session import get_spark

            spark = get_spark()
        self.spark = spark
        self.data_path = data_path
        self._batch_size = batch_size
        self._batches_list: list = []
        self._remove_batches = False
        self._target_folder: str | None = target_folder
        self._model = process_in_memory_model
        self._process_in_memory = (
            data_format == "batches" and process_in_memory_model is not None
        )
        paths = data_path if isinstance(data_path, list) else [data_path]
        weights = (
            data_weight
            if isinstance(data_weight, list)
            else [data_weight] * len(paths)
        )
        if len(weights) != len(paths):
            raise ValueError("data_weight list must match data_path list")

        if data_format == "batches" and batches is not None:
            docs = self._from_batch_list(batches, paths[0], weights[0])
        else:
            parts = [
                self._read_one(
                    data_format, p, collection_name, n_wd, vocabulary
                )
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

        if data_format != "batches":
            # the reference ALWAYS persists a non-'batches' parse as a
            # .batch folder: target_folder when given, else an
            # auto-created uuid dir under data_path, removed on dispose
            # (batches_utils.py:96-102)
            if self._target_folder is None:
                base = (
                    data_path
                    if isinstance(data_path, str) and os.path.isdir(data_path)
                    else tempfile.gettempdir()
                )
                self._target_folder = os.path.join(
                    base, format(uuid.uuid1().urn).replace(":", "")
                )
                self._remove_batches = True
            docs = self._write_store(docs, paths)
            # reference batches_utils.py:128: after a non-batch parse,
            # data_path points at the written batch store (scripts then
            # call Dictionary.gather(data_path=bv.data_path))
            self.data_path = self._target_folder
        elif batches is None:
            # folder store: surface the .batch files like the reference
            # (batches_utils.py:216-220); parquet stores keep batch ids
            for p in paths:
                if isinstance(p, str) and os.path.isdir(p):
                    import glob as _glob

                    found = sorted(
                        _glob.glob(os.path.join(p, "*.batch"))
                    )
                    self._batches_list += [Batch(f) for f in found]

        self.docs = docs
        self._dictionary = None
        self._gather = gather_dictionary

    # -- store / in-memory helpers ------------------------------------------

    def _write_store(self, docs: DataFrame, paths: list) -> DataFrame:
        """Materialize the parse as a reference .batch folder and return
        the docs relation to expose (the parsed frame itself — the store
        round-trips losslessly, so a re-read would only add a scan)."""
        from bigartm_spark.sources.batch_pb import write_batch_folder

        if any(
            self._under(p, self._target_folder)
            for p in paths
            if isinstance(p, str) and p
        ):
            # the reference parser writes .batch files next to the
            # source file (its own tests use target_folder ==
            # dirname(data_path)); the folder is not cleared, but the
            # lazy parse is materialized first so a same-folder source
            # cannot be half-read during the write
            docs = docs.localCheckpoint(eager=True)
        files = sorted(write_batch_folder(docs, self._target_folder))
        self._batches_list = [Batch(f) for f in files]
        return docs

    def _from_batch_list(self, batches: list, path: str, weight: float):
        """data_format='batches' with an explicit list: in-memory
        ``messages.Batch`` objects (decoded driver-side — the reference's
        process-in-memory mode is a small-collection convenience) or
        batch file names under data_path."""
        import pandas as pd

        from bigartm_spark.schemas import DOCS_SCHEMA
        from bigartm_spark.sources.batch_pb import batch_to_rows

        if batches and isinstance(batches[0], str):
            from bigartm_spark.sources.batch_pb import read_batch_folder

            self._batches_list = [
                Batch(os.path.join(path, b) if path else b) for b in batches
            ]
            return read_batch_folder(
                self.spark, [b.filename for b in self._batches_list]
            )
        rows: list[tuple] = []
        for i, b in enumerate(batches):
            rows += batch_to_rows(b.SerializeToString(), str(i))
        self._batches_list = [
            getattr(b, "id", None) or str(i) for i, b in enumerate(batches)
        ]
        docs = self.spark.createDataFrame(
            pd.DataFrame(rows, columns=[f.name for f in DOCS_SCHEMA.fields]),
            DOCS_SCHEMA,
        )
        if weight != 1.0:
            docs = docs.withColumn(
                "weight", F.col("weight") * F.lit(float(weight))
            )
        return docs

    # -- dispose (batches_utils.py:130-143) ---------------------------------

    def _dispose(self) -> None:
        self._process_in_memory = False
        if self._remove_batches and self._target_folder:
            shutil.rmtree(self._target_folder, ignore_errors=True)
        self._remove_batches = False

    def __enter__(self) -> "BatchVectorizer":
        return self

    def __exit__(self, exc_type, exc_value, traceback) -> None:
        self._dispose()

    def __del__(self) -> None:  # pragma: no cover - GC timing
        try:
            self._dispose()
        except Exception:
            pass

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
    def dictionary(self):
        """Default gathered dictionary as the named ``Dictionary`` facade
        (the reference returns a Dictionary object, batches_utils.py:109-112
        — scripts call ``.save_text``/``.filter`` on it and hand it to
        ``ARTM(dictionary=...)``); built lazily, None when disabled."""
        if self._dictionary is None and self._gather:
            from bigartm_spark.dictionary import Dictionary
            from bigartm_spark.operators.dictionary import gather_dictionary

            d = Dictionary(spark=self.spark)
            d.df = gather_dictionary(self.docs).cache()
            d.num_items_in_collection = (
                self.docs.select("doc_id").distinct().count()
            )
            self._dictionary = d
        return self._dictionary

    @property
    def batches_list(self) -> list:
        """``Batch(filename)`` wrappers over the store files; in-memory
        batch ids in process-in-memory mode (batches_utils.py:311-315)."""
        return self._batches_list

    @property
    def batches_ids(self) -> list[str]:
        """Batch file names (or in-memory ids); falls back to the
        relation's distinct batch ids for parquet stores with no files."""
        if self._batches_list:
            return [
                b.filename if isinstance(b, Batch) else b
                for b in self._batches_list
            ]
        return [
            r.batch_id
            for r in self.docs.select("batch_id").distinct().collect()
        ]

    @property
    def num_batches(self) -> int:
        return len(self.batches_ids)

    @property
    def batch_size(self) -> int | None:
        return self._batch_size

    @property
    def weights(self) -> list[float]:
        # data_weight is baked into stored token weights (module
        # docstring); the per-batch multiplier left to apply is 1.0
        return [1.0 for _ in self.batches_ids]
