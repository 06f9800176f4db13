"""Streaming model inference: theta for documents arriving on a live
stream, against a FIXED trained phi — "deploy the trained model".

The batch ``ARTM.transform`` runs the grouped applyInPandas E-step
kernel; a streaming groupBy+applyInPandas is not allowed (stateful), and
no state is needed anyway — each (doc_id, text) row is self-contained.
So the stream path is a stateless mapInPandas: tokenize row-locally with
the same whitespace semantics as ``corpus.docs_from_documents``, look
the tokens up in a phi snapshot captured in the task closure, and run
the reference's per-document inner EM loop (uniform theta init,
``num_document_passes`` iterations, max(n,0) clamp — the no-agent
special case of ``estep._doc_kernel_factory``'s loop,
processor_helpers.cc:468-513) vectorized over the doc's tokens.

Scale: the closure carries |phi-class tokens| × T doubles to each task —
same budget class as the E-step broadcast fast path (≤ ~256 MB models).
For models above that, run inference as micro-batch jobs via
foreachBatch + ARTM.transform, which uses the plan-level join path.

Works identically on a batch DataFrame (mapInPandas is mode-agnostic) —
one definition, both modes, append-capable on streams.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigartm_spark.model.phi import PhiMatrix
from bigartm_spark.schemas import DEFAULT_CLASS

_THETA_OUT = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("topic", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def streaming_transform(
    documents: DataFrame,
    phi: PhiMatrix,
    num_document_passes: int = 10,
    class_id: str = DEFAULT_CLASS,
) -> DataFrame:
    """theta(doc_id, topic, value) for a stream of (doc_id, text) rows.
    Documents with no token in phi's vocabulary emit nothing (the batch
    kernel's inner-merge behavior)."""
    from bigartm_spark.session import ensure_package_shipped

    ensure_package_shipped(documents.sparkSession)
    snap = (
        phi.compact.filter(F.col("class_id") == class_id)
        .select("token", "values")
        .toPandas()
    )
    tok_idx = {t: i for i, t in enumerate(snap["token"])}
    mat = (
        np.stack(snap["values"].to_numpy())
        if len(snap)
        else np.zeros((0, len(phi.topics)))
    )
    topics = list(phi.topics)
    T_ = len(topics)
    passes = num_document_passes

    def infer(batches):
        for pdf in batches:
            out_doc: list[int] = []
            out_topic: list[str] = []
            out_val: list[float] = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                counts: dict[int, float] = {}
                for tok in str(text).split(" "):
                    i = tok_idx.get(tok)
                    if tok and i is not None:
                        counts[i] = counts.get(i, 0.0) + 1.0
                if not counts:
                    continue
                idx = np.fromiter(counts.keys(), dtype=np.int64)
                w = np.fromiter(counts.values(), dtype=np.float64)
                phi_rows = mat[idx]  # (nnz, T)
                theta = np.full(T_, 1.0 / T_)
                for _ in range(passes):
                    num = phi_rows * theta  # (nnz, T)
                    z = num.sum(axis=1)
                    ptdw = np.divide(
                        num, z[:, None], out=num, where=z[:, None] > 0
                    )
                    n_td = (w[:, None] * ptdw).sum(axis=0)
                    np.maximum(n_td, 0.0, out=n_td)
                    tot = n_td.sum()
                    theta = n_td / tot if tot > 0 else np.full(T_, 1.0 / T_)
                out_doc.extend([int(doc_id)] * T_)
                out_topic.extend(topics)
                out_val.extend(float(v) for v in theta)
            yield pd.DataFrame(
                {"doc_id": out_doc, "topic": out_topic, "value": out_val}
            )

    return documents.select("doc_id", "text").mapInPandas(infer, _THETA_OUT)
