"""Low-level wrapper surface parity (reference python/artm/wrapper/).

The reference's ``artm.wrapper`` package wraps the C library through
ctypes: ``LibArtm()`` loads the shared object and each ``ArtmFoo`` call
marshals a protobuf config (api.py + spec.py there). There is no C
library here — ``LibArtm`` is a thin facade whose verbs run the same
operations on Spark, so scripts written against the wrapper API
(python/tests/wrapper/*) port by changing only the import line.

Submodules mirror the reference layout: ``messages_pb2`` (the message
classes — plain Python with protobuf repeated-field semantics, no
protobuf dependency) and ``constants`` (the enum value names from
wrapper/constants.py).
"""

from __future__ import annotations

import os

from bigartm_spark.wrapper import constants, messages_pb2

__all__ = ["LibArtm", "constants", "messages_pb2"]


class LibArtm:
    """Facade over the verbs the reference exposes as C calls
    (python/artm/wrapper/api.py ARTM_API list). Each verb takes the
    same config dict/message the ctypes wrapper accepted."""

    def __init__(self, lib_name=None, logging_config=None):
        # lib_name/logging_config accepted for signature parity; there
        # is no shared object to load and no glog to configure
        from bigartm_spark.session import get_spark

        self._spark = get_spark()

    def version(self) -> str:
        """MAJOR.MINOR.PATCH, like ArtmGetVersion (test_12_version.py)."""
        import bigartm_spark

        return bigartm_spark.__version__

    # -- parsing / batches ------------------------------------------------
    def ArtmParseCollection(self, config: dict):
        """CollectionParser dispatch (collection_parser.cc:808-826):
        UCI / MatrixMarket / VW file -> batch folder on disk."""
        from bigartm_spark.sources import uci, vw

        fmt = config.get("format", constants.CollectionParserConfig_CollectionFormat_BagOfWordsUci)
        target = config["target_folder"]
        if fmt == constants.CollectionParserConfig_CollectionFormat_BagOfWordsUci:
            docs = uci.read_uci(
                self._spark,
                config["docword_file_path"],
                config.get("vocab_file_path"),
            )
        elif fmt == constants.CollectionParserConfig_CollectionFormat_MatrixMarket:
            docs = uci.read_matrix_market(
                self._spark,
                config["docword_file_path"],
                config.get("vocab_file_path"),
            )
        elif fmt == constants.CollectionParserConfig_CollectionFormat_VowpalWabbit:
            docs = vw.read_vowpal_wabbit(
                self._spark, config["docword_file_path"]
            )
        else:
            raise ValueError(f"unknown collection format {fmt!r}")
        nipb = config.get("num_items_per_batch")
        if nipb:
            # reference parser semantics: batches of <= nipb items
            # (collection_parser.cc num_items_per_batch); our long rows
            # re-key batch_id so the .batch writer groups accordingly
            from pyspark.sql import functions as Fn

            docs = docs.withColumn(
                "batch_id",
                (Fn.col("doc_id") / Fn.lit(int(nipb)))
                .cast("long")
                .cast("string"),
            )
        # the C++ parser writes one protobuf .batch file per batch —
        # emit the same layout (write_batch_folder), so ported scripts
        # that os.listdir() for '*.batch' see what they expect;
        # load_batches() sniffs the format on read
        from bigartm_spark.sources.batch_pb import write_batch_folder

        write_batch_folder(docs, target)
        return target

    def ArtmSaveBatch(self, disk_path: str, batch) -> None:
        """Serialize one messages_pb2.Batch to ``<id>.batch`` in the
        reference's proto2 wire format (c_interface.cc:240-249)."""
        import uuid

        from bigartm_spark.sources.batch_pb import serialize_batch

        b = messages_pb2.batch_to_dict(batch)
        if not b.get("id"):
            b["id"] = str(uuid.uuid4())
        os.makedirs(disk_path, exist_ok=True)
        with open(os.path.join(disk_path, f"{b['id']}.batch"), "wb") as f:
            f.write(serialize_batch(b))

    # -- dictionaries ------------------------------------------------------
    def ArtmCreateDictionary(self, master, config) -> None:
        """DictionaryData message -> named dictionary on the master
        (dictionary_operations.cc Create path). ``master`` is our
        MasterComponent (the reference passed a master id int)."""
        master.create_dictionary(config, dictionary_name=getattr(config, "name", None))
