"""A4/A6: in-memory corpus sources.

Reference: BatchVectorizer(data_format='bow_n_wd') builds batches from a
dense numpy token x doc matrix + vocab dict
(python/artm/batches_utils.py:46-128); ImportBatches pushes serialized
batches into the store (master_component.cc:331-363). Here both are
createDataFrame/union over the long docs layout — the COO of the matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigartm_spark.schemas import DEFAULT_CLASS, DEFAULT_TRANSACTION, DOCS_SCHEMA


def from_n_wd(
    spark: SparkSession,
    n_wd,
    vocabulary: dict[int, str] | list[str],
    class_id: str = DEFAULT_CLASS,
) -> DataFrame:
    """Token x doc count matrix (shape W x D) -> long docs. Accepts a
    numpy array / numpy.matrix / any sparse object exposing ``toarray``
    (scipy csr et al., duck-typed so scipy stays optional), rejecting
    anything else with TypeError — the reference's input contract
    (batches_utils.py _parse_n_wd + test_batches_utils test_errors_n_wd).
    Zero cells are dropped (the COO form)."""
    import numpy as np

    if hasattr(n_wd, "toarray"):  # scipy.sparse-like
        n_wd = n_wd.toarray()
    if not isinstance(n_wd, (np.ndarray, np.matrix, list)):
        raise TypeError(f"n_wd must be a counts matrix, got {type(n_wd)!r}")
    n_wd = np.asarray(n_wd)
    if n_wd.ndim != 2 or not np.issubdtype(n_wd.dtype, np.number):
        raise TypeError("n_wd must be a 2-D numeric matrix")
    if isinstance(vocabulary, dict):
        vocab = [vocabulary[i] for i in range(len(vocabulary))]
    else:
        vocab = list(vocabulary)
    ws, ds = np.nonzero(n_wd)
    rows = []
    pos_per_doc: dict[int, int] = {}
    for w, d in zip(ws.tolist(), ds.tolist()):
        pos = pos_per_doc.get(d, 0) + 1
        pos_per_doc[d] = pos
        rows.append(
            (
                d,
                str(d),
                str(d % 64),
                class_id,
                vocab[w],
                float(n_wd[w, d]),
                pos,
                pos,
                DEFAULT_TRANSACTION,
            )
        )
    return spark.createDataFrame(rows, DOCS_SCHEMA)


def import_batches(base: DataFrame | None, new_docs: DataFrame) -> DataFrame:
    """A6: append batches to the in-memory store (immutably)."""
    if base is None:
        return new_docs
    return base.unionByName(new_docs)
