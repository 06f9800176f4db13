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

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigartm_spark.model.phi import PhiMatrix


@dataclass
class TransformFunction:
    """f applied to the smoothed value (transform_function.cc:35-47,
    messages.proto TransformConfig): Constant f(x)=1, Logarithm
    f(x)=ln(x) for x>0 else 0, Polynomial f(x)=a*x^n for x>0 else 0.
    Usable as a Column expression (phi side) and as numpy (theta-agent
    side, inside the E-step kernel)."""

    kind: str = "constant"  # constant | logarithm | polynomial
    a: float = 1.0
    n: float = 1.0

    def __post_init__(self):
        if self.kind not in ("constant", "logarithm", "polynomial"):
            raise ValueError(f"unknown transform kind {self.kind!r}")

    @property
    def is_constant(self) -> bool:
        return self.kind == "constant"

    def column(self, v: F.Column) -> F.Column:
        if self.kind == "constant":
            return F.lit(1.0)
        if self.kind == "logarithm":
            return F.when(v > 0, F.log(v)).otherwise(F.lit(0.0))
        return F.when(
            v > 0, F.lit(float(self.a)) * F.pow(v, F.lit(float(self.n)))
        ).otherwise(F.lit(0.0))

    def numpy(self, x: np.ndarray) -> np.ndarray:
        if self.kind == "constant":
            return np.ones_like(x)
        pos = x > 0
        if self.kind == "logarithm":
            return np.where(pos, np.log(np.where(pos, x, 1.0)), 0.0)
        return np.where(pos, self.a * np.power(np.where(pos, x, 1.0), self.n), 0.0)


CONSTANT_TRANSFORM = TransformFunction("constant")


# ---------------------------------------------------------------- Phi side
@dataclass
class RegularizeContext:
    dictionary: DataFrame | None = None  # (class_id, token, value, tf, df)
    topic_totals: DataFrame | None = None  # (class_id, totals array)


class PhiRegularizer:
    """Base: subclass and implement rwt_delta(pwt, nwt, ctx) -> DataFrame
    with compact layout (class_id, token, values). Deltas include tau.

    gamma (0..1) switches to *relative* coefficients: the delta is
    rescaled per (class, topic) against the topic mass, so tau becomes
    scale-free (phi_matrix_operations.cc:283-357 semantics)."""

    def __init__(
        self,
        tau: float,
        topic_names: list[str] | None = None,
        gamma: float | None = None,
    ):
        self.tau = tau
        self.topic_names = topic_names
        self.gamma = gamma

    def _topic_mask(self, topics: list[str]) -> list[float]:
        if self.topic_names is None:
            return [1.0] * len(topics)
        sel = set(self.topic_names)
        return [1.0 if t in sel else 0.0 for t in topics]

    def rwt_delta(self, pwt: PhiMatrix, nwt: PhiMatrix, ctx: RegularizeContext) -> DataFrame:
        raise NotImplementedError


class SmoothSparsePhi(PhiRegularizer):
    """H1: r_wt += tau * f(p_wt) * dict_coef[w]; f defaults to Constant
    and supports Logarithm / Polynomial (transform_function.cc:35-47,
    smooth_sparse_phi.cc:25-85 applies f to the p_wt cell). dict coef =
    dictionary.value when a dictionary is supplied, else 1.
    tau > 0 smooths, tau < 0 sparses (LDA alpha/beta when constant)."""

    def __init__(
        self,
        tau: float,
        topic_names=None,
        class_ids=None,
        use_dictionary=False,
        transform_function: TransformFunction | None = None,
    ):
        super().__init__(tau, topic_names)
        self.class_ids = class_ids
        self.use_dictionary = use_dictionary
        self.transform_function = transform_function or CONSTANT_TRANSFORM

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
        tf = self.transform_function
        out = base.select(
            "class_id",
            "token",
            F.zip_with(
                "values", marr, lambda v, m: coef * m * tf.column(v)
            ).alias("values"),
        )
        return out


class DecorrelatorPhi(PhiRegularizer):
    """H3: r_wt -= tau * p_wt * sum_{s != t} p_ws  (decorrelator_phi.cc:25-140).

    The row-sum is an array aggregate — no shuffle at all.

    class_ids restricts the regularized tokens to those modalities
    (decorrelator_phi.cc:44-52); topic_pairs switches to the "complex
    case" (decorrelator_phi.cc:80-95): {topic: {other_topic: weight}} —
    for each listed topic t, weights_sum = sum_s pairs[t][s] * p_ws and
    r_wt += -tau * p_wt * (weights_sum - p_wt); unlisted topics get no
    delta. The reference subtracts p_wt even when t is not among its own
    pair targets — quirk preserved."""

    def __init__(self, tau, topic_names=None, gamma=None, class_ids=None,
                 topic_pairs: dict | None = None):
        super().__init__(tau, topic_names=topic_names, gamma=gamma)
        self.class_ids = class_ids
        self.topic_pairs = topic_pairs

    def rwt_delta(self, pwt, nwt, ctx):
        tau = F.lit(float(self.tau))
        base = pwt.compact
        if self.class_ids is not None:
            scoped = F.col("class_id").isin(list(self.class_ids))
        else:
            scoped = F.lit(True)
        if self.topic_pairs:
            idx = {t: i for i, t in enumerate(pwt.topics)}
            cols = []
            for i, t in enumerate(pwt.topics):
                pairs = self.topic_pairs.get(t)
                if not pairs:
                    cols.append(F.lit(0.0))
                    continue
                v_t = F.col("values")[i]
                wsum = None
                for other, w in pairs.items():
                    if other not in idx:
                        continue
                    term = F.lit(float(w)) * F.col("values")[idx[other]]
                    wsum = term if wsum is None else wsum + term
                if wsum is None:
                    cols.append(F.lit(0.0))
                    continue
                cols.append(-tau * v_t * (wsum - v_t))
            delta = F.array(*cols)
        else:
            mask = self._topic_mask(pwt.topics)
            marr = F.array(*[F.lit(m) for m in mask])
            rowsum = F.aggregate(
                F.zip_with("values", marr, lambda v, m: v * m),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            delta = F.zip_with(
                "values", marr, lambda v, m: -tau * m * v * (rowsum - v)
            )
        zero = F.array(*[F.lit(0.0)] * len(pwt.topics))
        return base.select(
            "class_id",
            "token",
            F.when(scoped, delta).otherwise(zero).alias("values"),
        )


class LabelRegularizationPhi(PhiRegularizer):
    """H4: r_wt += tau * dict[w] * (p_wt * n_t) / sum_s p_ws * n_s
    (label_regularization_phi.cc:17-98); class_ids restricts the
    regularized tokens to those modalities (the usual call scopes it to
    the label class, label_regularization_phi.cc:33-45)."""

    def __init__(self, tau, topic_names=None, gamma=None, class_ids=None):
        super().__init__(tau, topic_names=topic_names, gamma=gamma)
        self.class_ids = class_ids

    def rwt_delta(self, pwt, nwt, ctx):
        if ctx.topic_totals is None:
            raise ValueError("LabelRegularizationPhi needs topic totals (n_t)")
        base = pwt.compact.join(F.broadcast(ctx.topic_totals), "class_id")
        coef = F.lit(float(self.tau))
        if self.class_ids is not None:
            coef = F.when(
                F.col("class_id").isin(list(self.class_ids)), coef
            ).otherwise(F.lit(0.0))
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


def _symmetrize_cooc(cooc: DataFrame) -> DataFrame:
    """cooc(token_a, token_b, value) canonicalized a<b -> both directions
    (the reference dictionary stores cooc per token, both ways)."""
    return cooc.select("token_a", "token_b", "value").unionAll(
        cooc.select(
            F.col("token_b").alias("token_a"),
            F.col("token_a").alias("token_b"),
            "value",
        )
    )


class ImproveCoherencePhi(PhiRegularizer):
    """H6: r_wt += tau * sum_v cooc(w,v) * n_vt
    (improve_coherence_phi.cc:61-90). One shuffle: cooc ⋈ nwt on the
    neighbor token, then groupBy the target token with element-wise array
    sums. The cooc relation comes from ctx.cooc (gathered by D14)."""

    def __init__(self, tau, cooc: DataFrame, class_id: str = "@default_class",
                 topic_names=None):
        super().__init__(tau, topic_names)
        self.cooc = cooc
        self.class_id = class_id

    def rwt_delta(self, pwt, nwt, ctx):
        n = nwt.num_topics
        mask = self._topic_mask(nwt.topics)
        sym = _symmetrize_cooc(self.cooc)
        neigh = nwt.compact.filter(F.col("class_id") == self.class_id).select(
            F.col("token").alias("token_b"), F.col("values").alias("_nv")
        )
        joined = sym.join(neigh, "token_b").select(
            F.col("token_a").alias("token"),
            F.transform("_nv", lambda v: v * F.col("value")).alias("_wv"),
        )
        tau = float(self.tau)
        agg = joined.groupBy("token").agg(
            F.array(
                *[
                    (F.sum(F.col("_wv")[i]) * tau * mask[i])
                    for i in range(n)
                ]
            ).alias("values")
        )
        return agg.select(
            F.lit(self.class_id).alias("class_id"), "token", "values"
        )


class BitermsPhi(PhiRegularizer):
    """H9: for each cooc pair (w,u): p_tuw ∝ n_t * p_wt * p_ut (normalized
    over t); r_wt += tau * sum_u cooc(w,u) * p_tuw (biterms_phi.cc:77-152).
    Needs topic totals n_t (ctx.topic_totals)."""

    def __init__(self, tau, cooc: DataFrame, class_id: str = "@default_class",
                 topic_names=None):
        super().__init__(tau, topic_names)
        self.cooc = cooc
        self.class_id = class_id

    def rwt_delta(self, pwt, nwt, ctx):
        if ctx.topic_totals is None:
            raise ValueError("BitermsPhi needs ctx.topic_totals (n_t)")
        n = pwt.num_topics
        mask = self._topic_mask(pwt.topics)
        marr = F.array(*[F.lit(m) for m in mask])
        sym = _symmetrize_cooc(self.cooc)
        base = pwt.compact.filter(F.col("class_id") == self.class_id)
        w_side = base.select(
            F.col("token").alias("token_a"), F.col("values").alias("_pw")
        )
        u_side = base.select(
            F.col("token").alias("token_b"), F.col("values").alias("_pu")
        )
        nt = ctx.topic_totals.filter(
            F.col("class_id") == self.class_id
        ).select(F.col("totals").alias("_nt"))
        joined = (
            sym.join(w_side, "token_a")
            .join(u_side, "token_b")
            .crossJoin(F.broadcast(nt))
        )
        p_tuw = F.zip_with(
            F.zip_with("_pw", "_pu", lambda a, b: a * b),
            F.zip_with("_nt", marr, lambda t, m: t * m),
            lambda ab, t: ab * t,
        )
        norm = F.aggregate(p_tuw, F.lit(0.0), lambda a, x: a + x)
        contrib = F.transform(
            p_tuw,
            lambda x: F.when(norm > 0, x / norm).otherwise(F.lit(0.0))
            * F.col("value"),
        )
        tau = float(self.tau)
        agg = (
            joined.select(F.col("token_a").alias("token"), contrib.alias("_c"))
            .groupBy("token")
            .agg(
                F.array(
                    *[(F.sum(F.col("_c")[i]) * tau) for i in range(n)]
                ).alias("values")
            )
        )
        return agg.select(
            F.lit(self.class_id).alias("class_id"), "token", "values"
        )


class SmoothTimeInTopicsPhi(PhiRegularizer):
    """H12: discrete smoothing along an externally supplied token order
    within one modality: r_wt += tau * p_wt * (sign(p_prev - p_wt) +
    sign(p_next - p_wt)) (smooth_time_in_topics_phi.cc:25-99 — the
    derivative of a total-variation penalty). token_order(token, ord)."""

    def __init__(self, tau, token_order: DataFrame, class_id: str = "@default_class",
                 topic_names=None):
        super().__init__(tau, topic_names)
        self.token_order = token_order
        self.class_id = class_id

    def rwt_delta(self, pwt, nwt, ctx):
        from pyspark.sql import Window

        n = pwt.num_topics
        mask = self._topic_mask(pwt.topics)
        marr = F.array(*[F.lit(m) for m in mask])
        base = (
            pwt.compact.filter(F.col("class_id") == self.class_id)
            .join(F.broadcast(self.token_order), "token")
        )
        # partition by class_id: the chain order is per-modality, so the
        # sequential unit is one modality's vocab, not the global table
        # (a bare orderBy would funnel every row through one task)
        w = Window.partitionBy("class_id").orderBy("ord")
        prev = F.lag("values").over(w)
        nxt = F.lead("values").over(w)
        tau = float(self.tau)

        def tv(v, p, nx, m):
            sp = F.when(p.isNull(), F.lit(0.0)).otherwise(F.signum(p - v))
            sn = F.when(nx.isNull(), F.lit(0.0)).otherwise(F.signum(nx - v))
            return F.lit(tau) * m * v * (sp + sn)

        out = base.select(
            F.lit(self.class_id).alias("class_id"),
            "token",
            F.zip_with(
                F.zip_with(
                    "values",
                    F.coalesce(prev, F.array(*[F.lit(None).cast("double")] * n)),
                    lambda v, p: F.struct(v.alias("v"), p.alias("p")),
                ),
                F.zip_with(
                    F.coalesce(nxt, F.array(*[F.lit(None).cast("double")] * n)),
                    marr,
                    lambda nx, m: F.struct(nx.alias("nx"), m.alias("m")),
                ),
                lambda a, b: tv(a["v"], a["p"], b["nx"], b["m"]),
            ).alias("values"),
        )
        return out


class NetPlsaPhi(PhiRegularizer):
    """H13: graph smoothing over a vertex modality
    (net_plsa_phi.cc:76-97): for vertex u,
    r_ut += tau * n_t^2 * sum_v e_uv * (p_vt/D_v - p_ut/D_u) / D_u.
    edges(src, dst, weight) directed as stored; vertex_weights(token, d)
    optional (D=1 otherwise). Two broadcast-joined edge passes, one
    groupBy — no graph library needed."""

    def __init__(self, tau, edges: DataFrame | None = None,
                 class_id: str = "vertex",
                 vertex_weights: DataFrame | None = None, topic_names=None):
        super().__init__(tau, topic_names)
        self.edges = edges
        self.class_id = class_id
        self.vertex_weights = vertex_weights

    def rwt_delta(self, pwt, nwt, ctx):
        if self.edges is None:
            # reference behavior with no vertex info: regularization is
            # skipped (net_plsa_phi.cc guards on vertex presence)
            import warnings

            warnings.warn("NetPlsaPhi has no edge relation; skipping")
            return None
        if ctx.topic_totals is None:
            raise ValueError("NetPlsaPhi needs ctx.topic_totals (n_t)")
        n = pwt.num_topics
        mask = self._topic_mask(pwt.topics)
        base = pwt.compact.filter(F.col("class_id") == self.class_id)
        if self.vertex_weights is not None:
            vw = self.vertex_weights.select("token", F.col("d").alias("_d"))
            base = base.join(F.broadcast(vw), "token", "left").withColumn(
                "_d", F.coalesce(F.col("_d"), F.lit(1.0))
            )
        else:
            base = base.withColumn("_d", F.lit(1.0))
        u_side = base.select(
            F.col("token").alias("_u"),
            F.col("values").alias("_pu"),
            F.col("_d").alias("_du"),
        )
        v_side = base.select(
            F.col("token").alias("_v"),
            F.col("values").alias("_pv"),
            F.col("_d").alias("_dv"),
        )
        e = self.edges.select(
            F.col("src").alias("_u"), F.col("dst").alias("_v"),
            F.col("weight").alias("_w")
        )
        joined = e.join(u_side, "_u").join(v_side, "_v")
        inner = F.zip_with(
            "_pv",
            "_pu",
            lambda pv, pu: F.col("_w")
            * (pv / F.col("_dv") - pu / F.col("_du"))
            / F.col("_du"),
        )
        agg = joined.select(F.col("_u").alias("token"), inner.alias("_c")).groupBy(
            "token"
        ).agg(F.array(*[F.sum(F.col("_c")[i]) for i in range(n)]).alias("_s"))
        nt = ctx.topic_totals.filter(
            F.col("class_id") == self.class_id
        ).select(F.col("totals").alias("_nt"))
        tau = float(self.tau)
        marr = F.array(*[F.lit(m) for m in mask])
        return agg.crossJoin(F.broadcast(nt)).select(
            F.lit(self.class_id).alias("class_id"),
            "token",
            F.zip_with(
                F.zip_with("_s", "_nt", lambda s, t: s * t * t),
                marr,
                lambda x, m: F.lit(tau) * x * m,
            ).alias("values"),
        )


class MultiLanguagePhi(PhiRegularizer):
    """H14: the reference implementation is a no-op stub
    (multilanguage_phi.cc:1-35) — accepted for parity, warns, adds 0."""

    def rwt_delta(self, pwt, nwt, ctx):
        import warnings

        warnings.warn("MultiLanguagePhi is a no-op (parity with reference stub)")
        return None


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
    deltas = []
    for r in regularizers:
        d = r.rwt_delta(pwt, nwt, ctx)
        if d is None:
            continue
        if r.gamma is not None:
            d = _apply_relative_coefficients(d, r, nwt, ctx)
        deltas.append(d)
    if not deltas:
        return None
    u = deltas[0]
    for d in deltas[1:]:
        u = u.unionByName(d)
    return u.groupBy("class_id", "token").agg(
        F.array(*[F.sum(F.col("values")[i]) for i in range(n)]).alias("values")
    )


def _apply_relative_coefficients(
    delta: DataFrame, reg: PhiRegularizer, nwt, ctx: RegularizeContext
) -> DataFrame:
    """Relative regularization (phi_matrix_operations.cc:25-90,283-357):
    inc_wt = |tau| * C_t * delta_wt with
    C_t = gamma * n_t / sum_w|delta_wt| + (1-gamma) * n / sum_tw|delta|,
    computed per class over the regularized topic set. With delta already
    tau-scaled, the |tau| factor restores the reference's tau-free
    normalizer (delta/tau inside the sums cancels)."""
    if ctx.topic_totals is None:
        raise ValueError("relative regularization (gamma) needs topic totals")
    nT = nwt.num_topics
    mask = [1.0] * nT
    if reg.topic_names is not None:
        sel = set(reg.topic_names)
        mask = [1.0 if t in sel else 0.0 for t in nwt.topics]
    marr = F.array(*[F.lit(m) for m in mask])
    s_t = delta.groupBy("class_id").agg(
        F.array(
            *[
                F.sum(F.abs(F.col("values")[i]) * F.lit(mask[i]))
                for i in range(nT)
            ]
        ).alias("_s_t")
    )
    stats = s_t.join(F.broadcast(ctx.topic_totals), "class_id").select(
        "class_id",
        "_s_t",
        F.zip_with("totals", marr, lambda t, m: t * m).alias("_n_t"),
    )
    sum_over = lambda c: F.aggregate(c, F.lit(0.0), lambda a, x: a + x)  # noqa: E731
    gamma = float(reg.gamma)
    abs_tau = abs(float(reg.tau))
    coefs = stats.select(
        "class_id",
        F.zip_with(
            "_n_t",
            "_s_t",
            lambda n_t, st: F.when(
                st > 0,
                F.lit(abs_tau)
                * (
                    F.lit(gamma) * n_t / st
                    + F.lit(1.0 - gamma)
                    * sum_over(F.col("_n_t"))
                    / sum_over(F.col("_s_t"))
                ),
            ).otherwise(F.lit(0.0)),
        ).alias("_coef"),
    )
    return delta.join(F.broadcast(coefs), "class_id").select(
        "class_id",
        "token",
        F.zip_with("values", "_coef", lambda v, c: v * c).alias("values"),
    )


def specified_sparse_phi_transform(
    max_elements: int, probability_threshold: float | None = None,
    by_column: bool = False
):
    """H5 SpecifiedSparsePhi (specified_sparse_phi.cc:23-156): in the
    reference this regularizer rewrites p_wt in place (keep top-k per
    row/column, zero the rest), so it maps to a post-normalize phi
    transform, not an additive r_wt delta."""
    from bigartm_spark.model.phi import PhiMatrix
    from bigartm_spark.operators.topk import specified_sparse

    def transform(phi: "PhiMatrix") -> "PhiMatrix":
        kept = specified_sparse(
            phi.to_long(),
            phi.topics,
            max_elements=max_elements,
            probability_threshold=probability_threshold,
            by_column=by_column,
        )
        return PhiMatrix.from_long(phi.name, phi.topics, kept)

    return transform


# -------------------------------------------------------------- Theta side
@dataclass
class SmoothSparseTheta:
    """H2: n_td += tau * alpha_iter[pass] * mult_t * f(n_td), added only
    where f(n_td) > 0 (smooth_sparse_theta.cc:30-66: the agent applies
    the transform to the n_td cell and skips non-positive transformed
    values). f defaults to Constant; Logarithm/Polynomial supported.
    Runs inside the E-step kernel as vectorized numpy.

    Per-document scoping (smooth_sparse_theta.cc item_topic_multiplier /
    messages.proto SmoothSparseThetaConfig.item_title + item_topic_coef):
    when ``doc_ids`` is set, only those documents are regularized;
    ``doc_topic_coef`` multiplies tau per topic — one (T,) vector for all
    selected docs, or a {doc_id: (T,) vector} map (the reference's
    list-of-lists aligned with item_title). Title → doc_id resolution
    happens at fit time (ARTM._resolve_doc_scoped_agents) because the
    kernel sees ids, not titles."""

    tau: float
    alpha_iter: list[float] | None = None
    topic_mask: np.ndarray | None = None  # (T,) 0/1
    transform_function: TransformFunction | None = None
    doc_ids: np.ndarray | None = None  # selected docs (kernel row scope)
    doc_topic_coef: object | None = None  # (T,) array or {doc_id: (T,)}

    @property
    def needs_doc_ids(self) -> bool:
        return self.doc_ids is not None

    def apply(
        self,
        theta: np.ndarray,
        n_td: np.ndarray,
        pass_idx: int,
        doc_ids: np.ndarray | None = None,
    ) -> np.ndarray:
        a = 1.0
        if self.alpha_iter is not None:
            a = self.alpha_iter[min(pass_idx, len(self.alpha_iter) - 1)]
        delta = self.tau * a
        tf = self.transform_function or CONSTANT_TRANSFORM
        if not tf.is_constant:
            v = tf.numpy(n_td)
            delta = delta * np.where(v > 0, v, 0.0)
        mult: np.ndarray | float = 1.0
        if self.topic_mask is not None:
            mult = self.topic_mask[None, :]
        if self.doc_ids is None and self.doc_topic_coef is not None:
            # empty item scope (reference: no item filter): the (T,)
            # coefficient vector applies to every document
            if not isinstance(self.doc_topic_coef, dict):
                mult = mult * np.asarray(self.doc_topic_coef, dtype=float)[
                    None, :
                ]
        if self.doc_ids is not None:
            if doc_ids is None:
                return n_td  # scoped agent without row ids: no-op
            sel = np.isin(doc_ids, self.doc_ids).astype(float)
            if self.doc_topic_coef is None:
                mult = mult * sel[:, None]
            elif isinstance(self.doc_topic_coef, dict):
                T_ = n_td.shape[1]
                coef = np.zeros((len(doc_ids), T_))
                for i, d in enumerate(doc_ids):
                    c = self.doc_topic_coef.get(d)
                    if c is not None:
                        coef[i] = c
                mult = mult * coef
            else:
                mult = mult * sel[:, None] * np.asarray(
                    self.doc_topic_coef, dtype=float
                )[None, :]
        return n_td + delta * mult


@dataclass
class HierarchySparsingTheta:
    """H10 (hierarchy_sparsing_theta.cc:16-160): sparsify
    psi = p(child topic | parent topic) on hARTM pseudo-batch docs by
    damping below-uniform entries — a KL-toward-sparse pressure applied
    ONLY to pseudo-docs. The reference disables this regularizer unless
    the batch is a parent-phi pseudo-batch (hierarchy_sparsing_theta.cc:
    regularization_on gated on batch.description == kParentPhiMatrixBatch);
    here pseudo-docs are identified by their synthetic negative ids
    (doc_id <= pseudo_doc_threshold, see hierarchy.phi_to_pseudo_batch),
    so corpus-doc thetas are never distorted."""

    tau: float = 1.0
    pseudo_doc_threshold: int = -1_000_000  # phi_to_pseudo_batch offset
    needs_doc_ids = True  # kernel passes per-row doc ids of n_td

    def apply(
        self,
        theta: np.ndarray,
        n_td: np.ndarray,
        pass_idx: int,
        doc_ids: np.ndarray | None = None,
    ) -> np.ndarray:
        T_ = n_td.shape[1]
        uniform = n_td.sum(axis=1, keepdims=True) / T_
        below = n_td < uniform
        damp = self.tau * n_td * below
        if doc_ids is not None:
            is_pseudo = doc_ids <= self.pseudo_doc_threshold
            damp = damp * is_pseudo[:, None]
        return n_td - damp


# --------------------------------------------------------------- Ptdw side
@dataclass
class SmoothPtdw:
    """H7 (smooth_ptdw.cc:20-115, E7): moving-average smoothing of
    p(t|d,w) over token positions within a document, half-width h =
    window // 2. Vectorized via segment-aware prefix sums; the kernel
    re-normalizes rows afterwards (the reference appends a normalizer)."""

    tau: float = 1.0
    window: int = 20

    def apply_ptdw(self, ptdw: np.ndarray, starts: np.ndarray, seg: np.ndarray):
        h = max(self.window // 2, 1)
        n = len(ptdw)
        csum = np.vstack([np.zeros((1, ptdw.shape[1])), np.cumsum(ptdw, axis=0)])
        idx = np.arange(n)
        seg_start = starts[seg]
        ends = np.append(starts[1:], n)
        seg_end = ends[seg]
        lo = np.maximum(idx - h, seg_start)
        hi = np.minimum(idx + h + 1, seg_end)
        avg = (csum[hi] - csum[lo]) / (hi - lo)[:, None]
        return (1.0 - self.tau) * ptdw + self.tau * avg


@dataclass
class TopicSegmentationPtdw:
    """H11 (topic_segmentation_ptdw.cc:12-117, E8): hard topic
    segmentation of the position axis. Each position's p(t|d,w) row is
    rewritten one-hot to the running ``main_topic``; the main topic
    switches to the right-window argmax when the left/right window
    divergence crosses ``threshold``:

        change at i  <=>  (L[l]/Lw - R[l]/Rw)/2 + (R[r]/Rw - L[r]/Lw)/2
                          > threshold,

    with L/R the h-position window sums left/right of i, each row
    weighted by (1 - background mass) so background topics neither vote
    nor count (background_topic_mask from background_topic_names).
    Position 0 (each doc start) one-hots its own argmax. Vectorized with
    segment-aware prefix sums + forward fill; the reference's per-item
    sliding loop, row for row."""

    window: int = 10
    threshold: float = 0.3
    background_topic_mask: np.ndarray | None = None  # (T,) bool

    def apply_ptdw(self, ptdw: np.ndarray, starts: np.ndarray, seg: np.ndarray):
        n, T_ = ptdw.shape
        h = max(int(self.window), 1)
        if self.background_topic_mask is not None:
            bg = ptdw[:, np.asarray(self.background_topic_mask, bool)].sum(
                axis=1
            )
            w = 1.0 - bg
        else:
            w = np.ones(n)
        wp = ptdw * w[:, None]
        csum = np.vstack([np.zeros((1, T_)), np.cumsum(wp, axis=0)])
        wsum = np.concatenate([[0.0], np.cumsum(w)])
        idx = np.arange(n)
        seg_start = starts[seg]
        ends = np.append(starts[1:], n)
        seg_end = ends[seg]
        llo = np.maximum(idx - h, seg_start)
        rhi = np.minimum(idx + h, seg_end)
        left = csum[idx] - csum[llo]
        lw = wsum[idx] - wsum[llo]
        right = csum[rhi] - csum[idx]
        rw = wsum[rhi] - wsum[idx]
        l_topic = left.argmax(axis=1)
        r_topic = right.argmax(axis=1)
        lw_ = np.where(lw > 0, lw, 1.0)
        rw_ = np.where(rw > 0, rw, 1.0)
        ll = left[idx, l_topic] / lw_
        rl = right[idx, l_topic] / rw_
        rr = right[idx, r_topic] / rw_
        lr = left[idx, r_topic] / lw_
        score = (ll - rl) / 2.0 + (rr - lr) / 2.0
        changes = (score > self.threshold) & (lw > 0) & (rw > 0)
        vals = np.where(changes, r_topic, -1)
        vals[starts] = ptdw[starts].argmax(axis=1)  # doc starts reset
        set_idx = np.where(vals >= 0, idx, -1)
        last = np.maximum.accumulate(set_idx)
        main = vals[last]
        out = np.zeros_like(ptdw)
        out[idx, main] = 1.0
        return out


@dataclass
class TopicSelectionTheta:
    """H8: n_td -= tau * n_td * topic_value[t] * alpha_iter[pass]
    (topic_selection_theta.cc:15-164). When topic_value is not
    configured, the reference computes it BATCH-LOCALLY on every inner
    iteration (topic_selection_theta.cc:115-131): topic_value[t] =
    n / (n_t * |T|) with n_t summed over the batch's current n_td — so
    small topics get a large value and are damped hardest (rich-get-
    richer topic selection). A uniform fallback would cancel in the
    theta normalize and turn the regularizer into a no-op."""

    tau: float
    topic_value: np.ndarray | None = None  # (T,)
    alpha_iter: list[float] | None = None

    def apply(self, theta: np.ndarray, n_td: np.ndarray, pass_idx: int) -> np.ndarray:
        a = 1.0
        if self.alpha_iter is not None:
            a = self.alpha_iter[min(pass_idx, len(self.alpha_iter) - 1)]
        if self.topic_value is not None:
            tv = self.topic_value
        else:
            n_t = n_td.sum(axis=0)
            n = n_t.sum()
            T_ = n_td.shape[1]
            with np.errstate(divide="ignore", invalid="ignore"):
                tv = np.where(n_t > 0, n / (n_t * T_), 0.0)
        return n_td - self.tau * a * n_td * tv
