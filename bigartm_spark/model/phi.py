"""PhiMatrix — a named token x topic matrix as a DataFrame.

Internal layout is *compact*: one row per (class_id, token) with the topic
axis as a fixed-order array<double> (the Spark analogue of the reference's
dense row-major rows, /root/reference/src/artm/core/dense_phi_matrix.h:131-158).
Compact rows keep the EM join payload to one row per token and let the
kernel see contiguous vectors; the long COO form (class_id, token, topic,
value) is the API/export view (SURVEY.md §1.3: long == sparse COO layout).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class PhiMatrix:
    name: str
    topics: list[str]
    compact: DataFrame  # (class_id, token, values: array<double>)

    @property
    def num_topics(self) -> int:
        return len(self.topics)

    def to_long(self, eps: float | None = None) -> DataFrame:
        """COO view (class_id, token, topic, value); eps drops near-zeros
        (sparse retrieval layout, messages.proto:599-619)."""
        topics = F.array(*[F.lit(t) for t in self.topics])
        out = self.compact.select(
            "class_id",
            "token",
            F.posexplode("values").alias("_i", "value"),
        ).select(
            "class_id",
            "token",
            F.element_at(topics, F.col("_i") + 1).alias("topic"),
            "value",
        )
        if eps is not None:
            out = out.filter(F.col("value") > eps)
        return out

    @staticmethod
    def from_long(name: str, topics: list[str], long_df: DataFrame) -> "PhiMatrix":
        """Build compact rows from COO; missing (token, topic) cells are 0."""
        idx = F.map_from_arrays(
            F.array(*[F.lit(t) for t in topics]),
            F.array(*[F.lit(i) for i in range(len(topics))]),
        )
        n = len(topics)
        agg = (
            long_df.withColumn("_i", idx[F.col("topic")])
            .groupBy("class_id", "token")
            .agg(
                F.map_from_entries(
                    F.collect_list(F.struct(F.col("_i"), F.col("value")))
                ).alias("_m")
            )
            .select(
                "class_id",
                "token",
                F.array(
                    *[
                        F.coalesce(F.col("_m").getItem(i), F.lit(0.0))
                        for i in range(n)
                    ]
                ).alias("values"),
            )
        )
        return PhiMatrix(name=name, topics=list(topics), compact=agg)

    def checkpoint(self) -> "PhiMatrix":
        """Break lineage between EM passes (localCheckpoint: keeps the data
        on executors; on a real cluster use reliable checkpoint dir)."""
        return PhiMatrix(
            self.name, self.topics, self.compact.localCheckpoint(eager=True)
        )

    def cache(self) -> "PhiMatrix":
        return PhiMatrix(self.name, self.topics, self.compact.cache())

    def release(self) -> None:
        """Drop any cached blocks; safe on uncached relations."""
        try:
            self.compact.unpersist()
        except Exception:
            pass


class LocalPhiMatrix(PhiMatrix):
    """PhiMatrix backed by a driver-side numpy copy (broadcast-regime fit
    loops: the E-step ships the numpy triple, never the relation). The
    Spark relation is materialized LAZILY on first ``.compact`` access —
    a fit pass that only feeds the next pass's broadcast pays zero
    createDataFrame cost; readouts (get_phi, exports) materialize on
    demand."""

    def __init__(self, name, topics, spark, cls_np, tok_np, mat):
        self.name = name
        self.topics = list(topics)
        self._spark = spark
        self.local = (cls_np, tok_np, mat)
        self._compact = None

    @property
    def compact(self) -> DataFrame:
        if self._compact is None:
            import pandas as pd

            cls_np, tok_np, mat = self.local
            # ndarray.tolist() yields nested *native* Python floats;
            # [list(r) for r in mat] would keep numpy.float64 elements,
            # which the strict Arrow-off createDataFrame verifier rejects
            # (DoubleType can not accept numpy.float64). The relation must
            # be valid under ANY session config, not just our Arrow-on one.
            self._compact = self._spark.createDataFrame(
                pd.DataFrame(
                    {
                        "class_id": [str(c) for c in cls_np],
                        "token": [str(t) for t in tok_np],
                        "values": mat.tolist(),
                    }
                ),
                schema="class_id string, token string, values array<double>",
            )
        return self._compact

    def release(self) -> None:
        # nothing distributed to reclaim; drop the materialized relation
        self._compact = None
