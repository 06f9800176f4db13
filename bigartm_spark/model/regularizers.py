"""G3 RegularizeModel — the regularizer framework (SURVEY.md §2.H).

Two extension points, mirroring the reference's RegularizerInterface
(/root/reference/src/artm/regularizer_interface.h):

- **Phi regularizers**: callables ``(pwt, nwt, ctx) -> rwt delta`` built
  from Column expressions over compact rows; deltas are summed into r_wt
  (phi_matrix_operations.cc:273-381), each scaled by tau (and optionally a
  relative gamma rescaling against n_t).
- **Theta agents**: tiny picklable objects applied inside the E-step
  kernel between n_td recompute and normalization
  (processor_helpers.cc:169-171; the final normalize is itself the last
  agent in the reference).

Implemented Phi regularizers: SmoothSparsePhi (H1), DecorrelatorPhi (H3),
SpecifiedSparsePhi (H5, see operators/topk.py), SmoothTimeInTopicsPhi
(H12) via lag windows. Theta agents: SmoothSparseTheta (H2),
TopicSelectionTheta (H8).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigartm_spark.model.phi import PhiMatrix


# ---------------------------------------------------------------- Phi side
@dataclass
class RegularizeContext:
    dictionary: DataFrame | None = None  # (class_id, token, value, tf, df)
    topic_totals: DataFrame | None = None  # (class_id, totals array)


class PhiRegularizer:
    """Base: subclass and implement rwt_delta(pwt, nwt, ctx) -> DataFrame
    with compact layout (class_id, token, values)."""

    def __init__(self, tau: float, topic_names: list[str] | None = None):
        self.tau = tau
        self.topic_names = topic_names

    def _topic_mask(self, topics: list[str]) -> list[float]:
        if self.topic_names is None:
            return [1.0] * len(topics)
        sel = set(self.topic_names)
        return [1.0 if t in sel else 0.0 for t in topics]

    def rwt_delta(self, pwt: PhiMatrix, nwt: PhiMatrix, ctx: RegularizeContext) -> DataFrame:
        raise NotImplementedError


class SmoothSparsePhi(PhiRegularizer):
    """H1: r_wt += tau * f(p_wt) * dict_coef[w]; f = const 1 by default
    (transform_function.cc Constant). dict coef = dictionary.value when a
    dictionary is supplied, else 1 (smooth_sparse_phi.cc:25-85).
    tau > 0 smooths, tau < 0 sparses (LDA alpha/beta when constant)."""

    def __init__(self, tau: float, topic_names=None, class_ids=None, use_dictionary=False):
        super().__init__(tau, topic_names)
        self.class_ids = class_ids
        self.use_dictionary = use_dictionary

    def rwt_delta(self, pwt, nwt, ctx):
        mask = self._topic_mask(pwt.topics)
        base = pwt.compact
        coef = F.lit(float(self.tau))
        if self.use_dictionary and ctx.dictionary is not None:
            d = ctx.dictionary.select(
                "class_id", "token", F.col("value").alias("_dv")
            )
            base = base.join(F.broadcast(d), ["class_id", "token"], "left")
            coef = coef * F.coalesce(F.col("_dv"), F.lit(0.0))
        if self.class_ids is not None:
            coef = F.when(
                F.col("class_id").isin(list(self.class_ids)), coef
            ).otherwise(F.lit(0.0))
        marr = F.array(*[F.lit(m) for m in mask])
        out = base.select(
            "class_id",
            "token",
            F.zip_with(
                "values", marr, lambda _v, m: coef * m
            ).alias("values"),
        )
        return out


class DecorrelatorPhi(PhiRegularizer):
    """H3: r_wt -= tau * p_wt * sum_{s != t} p_ws  (decorrelator_phi.cc:25-140).

    The row-sum is an array aggregate — no shuffle at all."""

    def rwt_delta(self, pwt, nwt, ctx):
        mask = self._topic_mask(pwt.topics)
        marr = F.array(*[F.lit(m) for m in mask])
        rowsum = F.aggregate(
            F.zip_with("values", marr, lambda v, m: v * m),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        tau = F.lit(float(self.tau))
        return pwt.compact.select(
            "class_id",
            "token",
            F.zip_with(
                "values",
                marr,
                lambda v, m: -tau * m * v * (rowsum - v),
            ).alias("values"),
        )


class LabelRegularizationPhi(PhiRegularizer):
    """H4: r_wt += tau * dict[w] * (p_wt * n_t) / sum_s p_ws * n_s
    (label_regularization_phi.cc:17-98)."""

    def rwt_delta(self, pwt, nwt, ctx):
        if ctx.topic_totals is None:
            raise ValueError("LabelRegularizationPhi needs topic totals (n_t)")
        base = pwt.compact.join(F.broadcast(ctx.topic_totals), "class_id")
        coef = F.lit(float(self.tau))
        if ctx.dictionary is not None:
            d = ctx.dictionary.select(
                "class_id", "token", F.col("value").alias("_dv")
            )
            base = base.join(F.broadcast(d), ["class_id", "token"], "left")
            coef = coef * F.coalesce(F.col("_dv"), F.lit(0.0))
        weighted = F.zip_with("values", "totals", lambda v, t: v * t)
        denom = F.aggregate(weighted, F.lit(0.0), lambda a, x: a + x)
        return base.select(
            "class_id",
            "token",
            F.transform(
                weighted,
                lambda x: F.when(denom > 0, coef * x / denom).otherwise(F.lit(0.0)),
            ).alias("values"),
        )


def regularize(
    pwt: PhiMatrix,
    nwt: PhiMatrix,
    regularizers: list[PhiRegularizer],
    ctx: RegularizeContext | None = None,
) -> DataFrame | None:
    """Sum regularizer deltas into one compact rwt DataFrame (or None)."""
    ctx = ctx or RegularizeContext()
    if not regularizers:
        return None
    n = nwt.num_topics
    deltas = [r.rwt_delta(pwt, nwt, ctx) for r in regularizers]
    u = deltas[0]
    for d in deltas[1:]:
        u = u.unionByName(d)
    return u.groupBy("class_id", "token").agg(
        F.array(*[F.sum(F.col("values")[i]) for i in range(n)]).alias("values")
    )


# -------------------------------------------------------------- Theta side
@dataclass
class SmoothSparseTheta:
    """H2: n_td += tau * alpha_iter[pass] * mult_t
    (smooth_sparse_theta.cc:30-170; f = const). Runs inside the E-step
    kernel as vectorized numpy."""

    tau: float
    alpha_iter: list[float] | None = None
    topic_mask: np.ndarray | None = None  # (T,) 0/1

    def apply(self, theta: np.ndarray, n_td: np.ndarray, pass_idx: int) -> np.ndarray:
        a = 1.0
        if self.alpha_iter is not None:
            a = self.alpha_iter[min(pass_idx, len(self.alpha_iter) - 1)]
        delta = self.tau * a
        if self.topic_mask is not None:
            return n_td + delta * self.topic_mask[None, :]
        return n_td + delta


@dataclass
class TopicSelectionTheta:
    """H8: n_td -= tau * n_td * topic_value[t] * alpha_iter[pass]
    (topic_selection_theta.cc:15-164); topic_value defaults to
    n / (n_t * |T|) computed from the previous pass's totals."""

    tau: float
    topic_value: np.ndarray | None = None  # (T,)
    alpha_iter: list[float] | None = None

    def apply(self, theta: np.ndarray, n_td: np.ndarray, pass_idx: int) -> np.ndarray:
        a = 1.0
        if self.alpha_iter is not None:
            a = self.alpha_iter[min(pass_idx, len(self.alpha_iter) - 1)]
        tv = self.topic_value if self.topic_value is not None else 1.0
        return n_td - self.tau * a * n_td * tv
