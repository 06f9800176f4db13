"""M-step: normalizer (D4) + normalize (D5) + clamp (B8) on compact phi.

Reference: /root/reference/src/artm/core/phi_matrix_operations.cc:383-446
(n_t = sum_w max(n_wt + r_wt, 0); p_wt = max(n_wt + r_wt, 0) / n_t, 0 when
n_t <= 0).

Everything is Column expressions over array rows: the per-topic totals are
T scalar sums (one tiny aggregate), divided back via a literal array — no
join, no second shuffle of the big table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigartm_spark.model.phi import PhiMatrix


def _clamped(nwt_df: DataFrame, num_topics: int, rwt_df: DataFrame | None) -> DataFrame:
    """max(n_wt + r_wt, 0) per cell (B8, phi_matrix_operations.cc:435)."""
    if rwt_df is None:
        return nwt_df.select(
            "class_id",
            "token",
            F.transform("values", lambda x: F.greatest(x, F.lit(0.0))).alias(
                "values"
            ),
        )
    r = rwt_df.select(
        "class_id", "token", F.col("values").alias("_rvalues")
    )
    return (
        nwt_df.join(r, ["class_id", "token"], "left")
        .select(
            "class_id",
            "token",
            F.when(
                F.col("_rvalues").isNull(),
                F.transform("values", lambda x: F.greatest(x, F.lit(0.0))),
            )
            .otherwise(
                F.zip_with(
                    "values",
                    "_rvalues",
                    lambda n, rr: F.greatest(n + rr, F.lit(0.0)),
                )
            )
            .alias("values"),
        )
    )


def topic_totals(nwt: PhiMatrix, rwt_df: DataFrame | None = None) -> DataFrame:
    """D4: n_t per (class_id, topic-index) — returns (class_id, totals array)."""
    clamped = _clamped(nwt.compact, nwt.num_topics, rwt_df)
    return clamped.groupBy("class_id").agg(
        F.array(
            *[F.sum(F.col("values")[i]) for i in range(nwt.num_topics)]
        ).alias("totals")
    )


def normalize(
    nwt: PhiMatrix, rwt_df: DataFrame | None = None, name: str = "pwt"
) -> PhiMatrix:
    """D5: p_wt = max(n_wt + r_wt, 0) / n_t  (0 if n_t <= 0).

    The per-class totals table has one row per class_id (a handful) —
    broadcast join back."""
    clamped = _clamped(nwt.compact, nwt.num_topics, rwt_df)
    totals = clamped.groupBy("class_id").agg(
        F.array(
            *[F.sum(F.col("values")[i]) for i in range(nwt.num_topics)]
        ).alias("_totals")
    )
    pwt = clamped.join(F.broadcast(totals), "class_id").select(
        "class_id",
        "token",
        F.zip_with(
            "values",
            "_totals",
            lambda v, t: F.when(t > 0, v / t).otherwise(F.lit(0.0)),
        ).alias("values"),
    )
    return PhiMatrix(name=name, topics=list(nwt.topics), compact=pwt)


def normalize_local(cls_np, mat):
    """Driver-side numpy twin of :func:`normalize` (rwt=None): B8 clamp
    max(n,0), per-class column totals, divide (0 when the class total is
    <= 0). The broadcast-regime fit paths (_init_phi_local and the
    unregularized fast pass) both call THIS, so the semantics can never
    desynchronize from the distributed M-step — parity is pinned by
    test_mstep_local_parity."""
    import numpy as np

    mat = np.maximum(mat, 0.0)
    den = np.zeros_like(mat)
    if len(mat):
        for c in np.unique(cls_np):
            sel = cls_np == c
            den[sel] = mat[sel].sum(axis=0)
    with np.errstate(invalid="ignore", divide="ignore"):
        return np.where(den > 0, mat / np.where(den > 0, den, 1.0), 0.0)


def merge_nwt(
    sources: list[tuple[PhiMatrix, float]], name: str = "nwt"
) -> PhiMatrix:
    """D6/F1 MergeModel: target = sum_i w_i * src_i with token-set union
    (master_component.cc:937-1013). unionByName + groupBy-sum — the
    reference's full-outer token reconciliation is the same hash shuffle."""
    topics = sources[0][0].topics
    n = len(topics)
    parts = []
    for src, wt in sources:
        if src.topics != topics:
            raise ValueError("merge_nwt: topic sets must match (use reshape first)")
        parts.append(
            src.compact.select(
                "class_id",
                "token",
                F.transform("values", lambda x: x * F.lit(float(wt))).alias(
                    "values"
                ),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    merged = u.groupBy("class_id", "token").agg(
        F.array(*[F.sum(F.col("values")[i]) for i in range(n)]).alias("values")
    )
    return PhiMatrix(name=name, topics=list(topics), compact=merged)
