"""G11 hARTM — hierarchical topic models.

Reference: python/artm/hierarchy_utils.py:18-330 + the parent pseudo-batch
trick (A12, phi_matrix_operations.cc:496-533): to couple level k to level
k-1, the parent Phi is converted into a synthetic batch whose "documents"
are the parent topics (doc t has token w with weight phi_parent[w,t] *
parent_level_weight). Fitting the child on corpus + pseudo-batch makes
theta(pseudo-doc = parent topic) = Psi = p(child topic | parent topic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bigartm_spark.model.artm import ARTM
from bigartm_spark.model.phi import PhiMatrix
from bigartm_spark.schemas import DEFAULT_TRANSACTION


def phi_to_pseudo_batch(
    phi: PhiMatrix,
    parent_level_weight: float = 1.0,
    doc_id_offset: int = -1_000_000,
) -> DataFrame:
    """A12: parent Phi -> synthetic docs. Pseudo doc_ids are negative
    (offset - topic_index) so they never collide with corpus ids."""
    topic_idx = F.map_from_arrays(
        F.array(*[F.lit(t) for t in phi.topics]),
        F.array(*[F.lit(i) for i in range(len(phi.topics))]),
    )
    long = phi.to_long(eps=0.0)
    return long.select(
        (F.lit(doc_id_offset) - topic_idx[F.col("topic")]).alias("doc_id"),
        F.concat(F.lit("@parent_phi_"), F.col("topic")).alias("title"),
        F.lit("@parent").alias("batch_id"),
        "class_id",
        "token",
        (F.col("value") * F.lit(float(parent_level_weight))).alias("weight"),
        F.row_number()
        .over(Window.partitionBy("topic").orderBy("class_id", "token"))
        .cast("int")
        .alias("pos"),
    ).withColumn("transaction_id", F.col("pos")).withColumn(
        "transaction_typename", F.lit(DEFAULT_TRANSACTION)
    )


class HARTM:
    """Hierarchy of ARTM levels. add_level fits the new level on
    corpus ∪ parent-pseudo-batch; psi(level) reads the pseudo-docs' theta."""

    def __init__(self):
        self.levels: list[ARTM] = []

    def add_level(
        self,
        docs: DataFrame,
        dictionary: DataFrame,
        num_topics: int,
        num_collection_passes: int = 1,
        parent_level_weight: float = 1.0,
        seed: int = 0,
        **artm_kwargs,
    ) -> ARTM:
        topic_names = [
            f"level{len(self.levels)}_topic_{i}" for i in range(num_topics)
        ]
        model = ARTM(
            topic_names=topic_names, seed=seed, cache_theta=True, **artm_kwargs
        )
        model.initialize(dictionary)
        if self.levels:
            parent = self.levels[-1]
            pseudo = phi_to_pseudo_batch(
                parent.pwt, parent_level_weight=parent_level_weight
            )
            fit_docs = docs.unionByName(pseudo)
        else:
            fit_docs = docs
        model.fit_offline(fit_docs, num_collection_passes)
        self.levels.append(model)
        return model

    def psi(self, level: int = -1) -> DataFrame:
        """p(child_topic | parent_topic): theta restricted to pseudo-docs.
        Columns: parent_topic, topic, value."""
        if len(self.levels) < 2:
            raise ValueError("psi needs at least two levels")
        model = self.levels[level]
        parent = self.levels[level - 1 if level > 0 else -2]
        theta = model.get_theta()
        mapping = [
            (-1_000_000 - i, t) for i, t in enumerate(parent.topics)
        ]
        map_df = theta.sparkSession.createDataFrame(
            mapping, "doc_id long, parent_topic string"
        )
        return theta.join(F.broadcast(map_df), "doc_id").select(
            "parent_topic", "topic", "value"
        )
