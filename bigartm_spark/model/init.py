"""G1 InitializeModel — deterministic seeded Phi from a dictionary.

Reference: /root/reference/src/artm/core/master_component.cc:587-705
(per-token hash-seeded uniforms, row-normalized); sparse init ranks tokens
by tf and zeroes a share of low-rank rows (E5, master_component.cc:662-697).

We use the portable mod-prime generator (functions/hashing.py) instead of
boost::mt19937 so the DuckDB oracle reproduces values exactly; this is a
documented divergence from bit-parity with the C++ RNG. Never rand():
non-deterministic across task retries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bigartm_spark.functions.hashing import base_hash, uniform_from_base
from bigartm_spark.model.phi import PhiMatrix


def initialize_phi(
    dictionary: DataFrame,
    topics: list[str],
    seed: int = 0,
    name: str = "pwt",
    dense_init_rate: float = 1.0,
    guaranteed_zeros_rate: float = 0.0,
) -> PhiMatrix:
    """Row of uniforms per token, normalized over topics (columns follow
    ``topics`` order). Optional sparse init: tokens below the top
    ``dense_init_rate`` share by tf get ``guaranteed_zeros_rate`` of their
    cells zeroed (zero iff u_zero <= rate, mirroring helpers.cc:87-94)."""
    n = len(topics)
    hb = F.col("_hb")
    vals = F.array(*[uniform_from_base(hb, i, seed=seed) for i in range(n)])
    df = (
        dictionary.select("class_id", "token", "tf")
        .withColumn("_hb", base_hash("class_id", "token"))
        .withColumn("_v", vals)
        .drop("_hb")
    )
    if dense_init_rate < 1.0 and guaranteed_zeros_rate > 0.0:
        w = Window.partitionBy("class_id").orderBy(F.desc("tf"), F.asc("token"))
        zero_gate = F.array(
            *[
                unit_uniform("class_id", "token", i + n, seed=seed + 1)
                for i in range(n)
            ]
        )
        df = (
            df.withColumn("_pr", F.percent_rank().over(w))
            .withColumn(
                "_v",
                F.when(
                    F.col("_pr") <= F.lit(dense_init_rate), F.col("_v")
                ).otherwise(
                    F.zip_with(
                        F.col("_v"),
                        zero_gate,
                        lambda v, g: F.when(
                            g <= F.lit(guaranteed_zeros_rate), F.lit(0.0)
                        ).otherwise(v),
                    )
                ),
            )
            .drop("_pr")
        )
    # per-token row of uniforms normalized to sum 1 = the seeded n_wt row
    # (helpers.cc:101-107) ...
    norm = F.aggregate(F.col("_v"), F.lit(0.0), lambda a, x: a + x)
    compact = df.select(
        "class_id",
        "token",
        F.when(
            norm > 0, F.transform(F.col("_v"), lambda x: x / norm)
        )
        .otherwise(F.col("_v"))
        .alias("values"),
    )
    nwt = PhiMatrix(name=name, topics=list(topics), compact=compact)
    # ... then p_wt = column-normalize over tokens per topic (D5), exactly
    # as InitializeModel ends with a Normalize (master_component.cc:699-704)
    from bigartm_spark.model.mstep import normalize

    return normalize(nwt, None, name=name)
