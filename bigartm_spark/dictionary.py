"""Dictionary facade — the reference's named dictionary object
(python/artm/dictionary.py:17-236) over a Spark dictionary relation
(class_id, token, value, tf, df) plus an optional bundled cooc relation.

The reference keeps dictionaries as native objects addressed by name
inside the master component; here the state is simply a DataFrame the
facade carries, so every verb is a plan transformation and the object
works directly wherever a dictionary DataFrame is expected
(ARTM.initialize, BatchVectorizer, regularizer contexts unwrap it).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# python/artm/dictionary.py:17 — the text/pandas field order
FIELDS = ["token", "class_id", "token_value", "token_tf", "token_df"]


def _spark(spark: SparkSession | None) -> SparkSession:
    if spark is not None:
        return spark
    s = SparkSession.getActiveSession()
    if s is None:
        from bigartm_spark.session import get_spark

        s = get_spark()
    return s


def unwrap_dictionary(obj) -> DataFrame | None:
    """Accept either a Dictionary facade or a raw dictionary DataFrame
    (every engine entry point funnels through this)."""
    if obj is None or isinstance(obj, DataFrame):
        return obj
    if isinstance(obj, Dictionary):
        return obj.df
    raise TypeError(f"expected Dictionary or DataFrame, got {type(obj)!r}")


class Dictionary:
    """python/artm/dictionary.py:26-236."""

    def __init__(
        self,
        name: str | None = None,
        dictionary_path: str | None = None,
        data_path: str | None = None,
        df: DataFrame | None = None,
        spark: SparkSession | None = None,
    ):
        self._name = name if name is not None else str(uuid.uuid4())
        self._spark = spark
        self.df: DataFrame | None = df
        self.cooc: DataFrame | None = None
        self.num_items_in_collection: int = 0
        if dictionary_path is not None:
            self.load(dictionary_path=dictionary_path)
        if data_path is not None:
            self.gather(data_path=data_path)

    # -- identity / lifecycle ------------------------------------------------
    @property
    def name(self) -> str:
        return self._name

    def dispose(self) -> None:
        for rel in (self.df, self.cooc):
            if rel is not None:
                try:
                    rel.unpersist()
                except Exception:
                    pass
        self.df = None
        self.cooc = None

    def __enter__(self) -> "Dictionary":
        return self

    def __exit__(self, exc_type, exc_value, traceback) -> None:
        self.dispose()

    def __repr__(self) -> str:
        return f"artm.Dictionary(name={self._name!r})"

    # -- binary / parquet store (dictionary.py:67-83) ------------------------
    def load(self, dictionary_path: str) -> "Dictionary":
        """Reference binary ``.dict`` file or our parquet export dir."""
        from bigartm_spark.sources.io import import_cooc, import_dictionary

        spark = _spark(self._spark)
        self.df = import_dictionary(spark, dictionary_path)
        if dictionary_path.endswith(".dict"):
            from bigartm_spark.sources.dict_pb import read_dict_file

            _, cooc, meta = read_dict_file(spark, dictionary_path)
            self._name = meta.get("name") or self._name
            self.num_items_in_collection = meta.get(
                "num_items_in_collection", 0
            )
            self.cooc = cooc
        else:
            self.cooc = import_cooc(spark, dictionary_path)
        return self

    def save(self, dictionary_path: str) -> None:
        from bigartm_spark.sources.io import export_dictionary

        if self.df is None:
            raise RuntimeError("dictionary is empty; gather/load/create first")
        export_dictionary(
            self.df,
            dictionary_path,
            cooc=self.cooc,
            name=self._name,
            num_items_in_collection=self.num_items_in_collection,
        )

    # -- text / pandas round trips (dictionary.py:84-162) --------------------
    def save_text(self, dictionary_path: str, encoding: str = "utf-8") -> None:
        """The reference's human-readable format (dictionary.py:84-104):
        header ``name: <n> num_items: <k>``, a FIELDS comment line, then
        one ``token, class_id, value, tf, df`` row per token."""
        pdf = self.save_dataframe()
        with open(dictionary_path, "w", encoding=encoding) as fout:
            fout.write(
                f"name: {self._name} num_items: "
                f"{self.num_items_in_collection}\n"
            )
            fout.write(", ".join(FIELDS) + "\n")
            for row in pdf.itertuples(index=False):
                fout.write(
                    f"{row.token}, {row.class_id}, {row.token_value}, "
                    f"{row.token_tf}, {row.token_df}\n"
                )

    def load_text(self, dictionary_path: str, encoding: str = "utf-8") -> "Dictionary":
        import pandas as pd

        rows = []
        with open(dictionary_path, encoding=encoding) as fin:
            first = fin.readline().rstrip("\n").split(" ")
            self._name = first[1]
            self.num_items_in_collection = int(first[3])
            fin.readline()  # the FIELDS comment line
            for line in fin:
                p = line.rstrip("\n").split(" ")
                rows.append(
                    (
                        p[0][:-1],
                        p[1][:-1],
                        float(p[2][:-1]),
                        float(p[3][:-1]),
                        float(p[4]),
                    )
                )
        pdf = pd.DataFrame(rows, columns=FIELDS)
        return self.load_from_dataframe(pdf, _keep_meta=True)

    def save_dataframe(self):
        """pandas view in the reference's FIELDS layout
        (dictionary.py:105-119). Driver-side by contract — the reference
        returns an in-process frame; vocabularies are dictionary-sized."""
        if self.df is None:
            raise RuntimeError("dictionary is empty; gather/load/create first")
        pdf = (
            self.df.select(
                "token",
                "class_id",
                F.col("value").alias("token_value"),
                F.col("tf").alias("token_tf"),
                F.col("df").alias("token_df"),
            )
            .toPandas()
            .astype(
                {
                    "token_value": "float32",
                    "token_tf": "float32",
                    "token_df": "float32",
                }
            )
        )
        return pdf

    def load_from_dataframe(self, dataframe, _keep_meta: bool = False) -> "Dictionary":
        """pandas frame with the FIELDS columns -> dictionary relation
        (dictionary.py:146-162)."""
        spark = _spark(self._spark)
        pdf = dataframe[FIELDS].rename(
            columns={
                "token_value": "value",
                "token_tf": "tf",
                "token_df": "df",
            }
        )
        self.df = spark.createDataFrame(
            pdf, schema="token string, class_id string, value double, "
            "tf double, df double"
        ).select("class_id", "token", "value", "tf", "df")
        if not _keep_meta:
            self.num_items_in_collection = 0
        return self

    def create(self, dictionary_data) -> "Dictionary":
        """dictionary.py:163-172 — accepts a pandas frame in FIELDS
        layout, a dict of FIELDS lists, or a ready dictionary DataFrame."""
        if isinstance(dictionary_data, DataFrame):
            self.df = dictionary_data
            return self
        import pandas as pd

        if isinstance(dictionary_data, dict):
            dictionary_data = pd.DataFrame(dictionary_data)
        return self.load_from_dataframe(dictionary_data)

    # -- gather / filter (dictionary.py:173-231) -----------------------------
    def gather(
        self,
        data_path: str | DataFrame,
        cooc_file_path: str | None = None,
        vocab_file_path: str | None = None,
        symmetric_cooc_values: bool = False,
    ) -> "Dictionary":
        """D1 over a batch store (or a long corpus DataFrame directly);
        vocab file pins token order, cooc file loads the bundled cooc
        relation (dictionary_operations.cc:254-396)."""
        from bigartm_spark.operators.dictionary import (
            gather_dictionary,
            num_items,
        )

        spark = _spark(self._spark)
        full_vocab = None
        if isinstance(data_path, DataFrame):
            docs = data_path
        else:
            from bigartm_spark.sources.io import load_batch_vocab, load_batches

            docs = load_batches(spark, data_path)
            # the token universe includes zero-occurrence batch tokens —
            # the reference gathers zero-stat entries for them
            # (dictionary_operations.cc:316-325)
            full_vocab = load_batch_vocab(spark, data_path)
        vocab = None
        if vocab_file_path is not None:
            from bigartm_spark.sources.uci import read_vocab

            vocab = read_vocab(spark, vocab_file_path)
            # reference: the vocab file IS the universe — batch tokens
            # outside it are skipped, vocab tokens missing from the
            # corpus get zero-stat entries (dictionary_operations.cc:
            # 340-401 operator[] zero-fill)
            docs = docs.join(
                F.broadcast(vocab.select("token")), "token", "left_semi"
            )
            full_vocab = vocab.select("class_id", "token")
        self.df = gather_dictionary(docs, vocab=vocab, full_vocab=full_vocab)
        self.num_items_in_collection = num_items(docs)
        if cooc_file_path is not None:
            from bigartm_spark.sources.cooc_file import (
                read_cooc,
                to_cooc_relation,
            )

            self.cooc = to_cooc_relation(
                read_cooc(
                    spark, cooc_file_path, symmetric=symmetric_cooc_values
                )
            )
        return self

    def filter(
        self,
        class_id: str | None = None,
        min_df: float | None = None,
        max_df: float | None = None,
        min_df_rate: float | None = None,
        max_df_rate: float | None = None,
        min_tf: float | None = None,
        max_tf: float | None = None,
        max_dictionary_size: int | None = None,
        recalculate_value: bool = False,
        inplace: bool = True,
    ) -> "Dictionary":
        """B3/B4 (dictionary.py:197-231): threshold filter + optional
        top-k-by-df truncation; inplace=False returns a new facade."""
        from bigartm_spark.operators.dictionary import (
            filter_dictionary,
            top_k_by_df,
        )

        if self.df is None:
            raise RuntimeError("dictionary is empty; gather/load/create first")
        out = filter_dictionary(
            self.df,
            num_items_in_collection=self.num_items_in_collection or None,
            class_id=class_id,
            min_df=min_df,
            max_df=max_df,
            min_df_rate=min_df_rate,
            max_df_rate=max_df_rate,
            min_tf=min_tf,
            max_tf=max_tf,
            recalculate_value=recalculate_value,
        )
        if max_dictionary_size is not None:
            out = top_k_by_df(out, max_dictionary_size)
        target = self if inplace else Dictionary(spark=self._spark)
        target.df = out
        target.cooc = self.cooc
        target.num_items_in_collection = self.num_items_in_collection
        return target

    def __deepcopy__(self, memo):
        """dictionary.py:232-234: dictionaries are shared, not copied
        (DataFrames are immutable so sharing IS value semantics)."""
        return self
