"""G6/§2.K: online EM on a stream.

BigARTM's online algorithm is processing-time micro-batch streaming:
ordered batch groups, stateful n_wt merged with decay/apply weights
rho = (tau0 + t)^-kappa (master_component.cc:1364-1385; weights
python/artm/artm_model.py:652-659). That is exactly Structured
Streaming's foreachBatch contract, so the trainer is a thin sink:

    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(dir)
    OnlineTrainer(model).attach(stream)  # .start() the returned query

No watermarks/event-time exist in the reference (documented: this wrapper
is an extension beyond parity, not a parity claim). Batch-mode
`fit_online` on a static list of groups reproduces the reference
semantics exactly and is what the golden tests pin.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

from bigartm_spark.model.artm import ARTM


class OnlineTrainer:
    """Stateful online EM: each micro-batch is one batch group; after each,
    n_wt <- (1 - rho) * n_wt + rho * n̂_wt, then regularize + normalize."""

    def __init__(self, model: ARTM, tau0: float = 1024.0, kappa: float = 0.7):
        self.model = model
        self.tau0 = tau0
        self.kappa = kappa
        self.t = 0

    def process_group(self, group_docs: DataFrame):
        self.t += 1
        rho = math.pow(self.tau0 + self.t, -self.kappa)
        self.model._one_pass(
            group_docs, decay_weight=1.0 - rho, apply_weight=rho
        )

    def foreach_batch(self, batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        self.process_group(batch_df)

    def attach(self, stream_df: DataFrame, **writer_kwargs):
        """Wire onto a streaming DataFrame; caller starts/stops the query."""
        return (
            stream_df.writeStream.foreachBatch(self.foreach_batch)
            .outputMode("update")
            .trigger(processingTime=writer_kwargs.pop("processing_time", "10 seconds"))
        )


def split_batch_groups(
    docs: DataFrame, update_every: int, batch_ids: list[str] | None = None
) -> list[DataFrame]:
    """Offline grouping helper mirroring FitOnline's update_after points:
    batches in id order, grouped update_every at a time."""
    from pyspark.sql import functions as F

    if batch_ids is None:
        batch_ids = sorted(
            r["batch_id"]
            for r in docs.select("batch_id").distinct().collect()
        )
    groups = [
        batch_ids[i : i + update_every]
        for i in range(0, len(batch_ids), update_every)
    ]
    return [docs.filter(F.col("batch_id").isin(g)) for g in groups]
