"""Driver-facing query registry: each SURVEY.md §2 operator as a
(spark_callable, duckdb_oracle_sql) pair over the driver testdata.

The driver runs the Spark query and the oracle at sf0.01 and compares
row-count + schema + order-insensitive value hash (CORRECTNESS_r{N}.json).
Conventions keeping the hashes stable across engines:

- every float output column is ROUND(x, 6) on BOTH sides;
- counts are cast to bigint on both sides;
- ranking windows always carry a deterministic tiebreak;
- all randomness is the portable mod-prime generator
  (functions/hashing.py), replayed in the oracle as plain integer SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigartm_spark.corpus import (
    DOCS_CTE,
    DOCS_MULTI_CTE,
    docs_from_lineitem,
    docs_multimodal,
)
from bigartm_spark.functions.hashing import unit_uniform_sql
from bigartm_spark.model import estep, mstep
from bigartm_spark.model.init import initialize_phi
from bigartm_spark.operators.dictionary import (
    filter_dictionary,
    gather_dictionary,
    top_k_by_df,
)

SEED = 42
N_TOPICS = 5
TOPICS = [f"topic_{i}" for i in range(N_TOPICS)]

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _portable_round_sql(sql: str) -> str:
    """Rewrite every ROUND(<expr>, 6) into FLOOR((<expr>) * 1e6 + 0.5)/1e6.

    Engines disagree on exact-half decimal rounding of doubles (Spark
    round() goes through BigDecimal shortest-repr HALF_UP; DuckDB rounds
    the binary double), so ties like 0.5060625 split. floor(x*1e6+0.5) is
    pure double arithmetic — identical on both engines given identical x.
    """
    out = []
    i = 0
    n = len(sql)
    while i < n:
        j = sql.upper().find("ROUND(", i)
        if j < 0:
            out.append(sql[i:])
            break
        out.append(sql[i:j])
        depth = 1
        k = j + len("ROUND(")
        start = k
        while k < n and depth > 0:
            if sql[k] == "(":
                depth += 1
            elif sql[k] == ")":
                depth -= 1
            k += 1
        inner = sql[start : k - 1].rstrip()
        scale = None
        for dec, s in ((6, 1_000_000), (4, 10_000)):
            for suffix in (f", {dec}", f",{dec}"):
                if inner.endswith(suffix):
                    expr = inner[: -len(suffix)]
                    scale = s
                    break
            if scale is not None:
                break
        if scale is None:
            out.append(sql[j:k])
            i = k
            continue
        out.append(f"FLOOR(({expr}) * {scale} + 0.5) / {scale}")
        i = k
    return "".join(out)


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = _portable_round_sql(oracle)
        return fn

    return deco


def _round_cols(df: DataFrame, decimals: int, *cols: str) -> DataFrame:
    """Spark twin of the oracle's portable rounding (see above)."""
    m = float(10**decimals)
    for c in cols:
        df = df.withColumn(
            c,
            (
                F.floor(F.col(c).cast("double") * F.lit(m) + F.lit(0.5))
                / F.lit(m)
            ).cast("double"),
        )
    return df


def _r6(df: DataFrame, *cols: str) -> DataFrame:
    return _round_cols(df, 6, *cols)


def _r4(df: DataFrame, *cols: str) -> DataFrame:
    """4-decimal variant for columns that SUM many float terms (n_wt):
    the absolute summation-order noise grows with row count, so at large
    SF a 6-decimal boundary occasionally splits between engines (seen at
    sf1: one nwt cell, diff exactly 1e-6); two fewer digits keeps the
    check strong and makes flips ~100x rarer."""
    return _round_cols(df, 4, *cols)


# ---------------------------------------------------------------- SQL CTEs
DICT_CTE = """
dict AS (
  SELECT class_id, token,
         CAST(SUM(weight) AS DOUBLE) AS tf,
         CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
  FROM docs GROUP BY class_id, token
)
""".strip()


def _phi_cte(seed: int = SEED, n_topics: int = N_TOPICS) -> str:
    """Oracle replica of model/init.py initialize_phi: per-token uniforms
    (portable RNG) -> row-normalize -> column-normalize (D5)."""
    u = unit_uniform_sql("class_id", "token", "topic_idx", seed=seed)
    return f"""
topics AS (SELECT UNNEST(range({n_topics})) AS topic_idx),
raw AS (
  SELECT d.class_id, d.token, t.topic_idx, {u} AS u
  FROM dict d CROSS JOIN topics t
),
rown AS (
  SELECT class_id, token, topic_idx,
         u / SUM(u) OVER (PARTITION BY class_id, token) AS nwt
  FROM raw
),
phi AS (
  SELECT class_id, token, topic_idx,
         nwt / SUM(nwt) OVER (PARTITION BY class_id, topic_idx) AS value
  FROM rown
)
""".strip()


def _spark_phi(spark: SparkSession, sf_dir: str, seed: int = SEED):
    docs = docs_from_lineitem(spark, sf_dir)
    d = gather_dictionary(docs)
    return docs, d, initialize_phi(d, TOPICS, seed=seed)


def _pyr6(x: float) -> float:
    """Python twin of the portable rounding (python round() is banker's)."""
    import math

    return math.floor(x * 1000000.0 + 0.5) / 1000000.0


def _pyr4(x: float) -> float:
    import math

    return math.floor(x * 10000.0 + 0.5) / 10000.0


def _seeded_row_normalized_nwt(d: DataFrame, seed: int) -> DataFrame:
    from bigartm_spark.functions.hashing import base_hash, uniform_from_base

    vals = F.array(
        *[uniform_from_base(F.col("_hb"), i, seed=seed) for i in range(N_TOPICS)]
    )
    norm = F.aggregate(F.col("_v"), F.lit(0.0), lambda a, x: a + x)
    return (
        d.select("class_id", "token")
        .withColumn("_hb", base_hash("class_id", "token"))
        .withColumn("_v", vals)
        .select(
            "class_id",
            "token",
            F.transform("_v", lambda x: x / norm).alias("values"),
        )
    )


# ============================================================ D1: gather
@register(
    "d1_gather_dictionary",
    f"""
WITH {DOCS_CTE}, {DICT_CTE}
SELECT class_id, token,
       ROUND(tf / SUM(tf) OVER (PARTITION BY class_id), 6) AS value,
       ROUND(tf, 6) AS tf, ROUND(df, 6) AS df
FROM dict
""",
)
def d1_gather_dictionary(spark, sf_dir):
    docs = docs_from_lineitem(spark, sf_dir)
    return _r6(gather_dictionary(docs), "value", "tf", "df")


# ================================================ B3+B4: filter / top-k df
@register(
    "b3b4_filter_topk_dictionary",
    f"""
WITH {DOCS_CTE}, {DICT_CTE},
kept AS (
  SELECT class_id, token,
         tf / SUM(tf) OVER (PARTITION BY class_id) AS value, tf, df
  FROM (SELECT * FROM dict
        WHERE df >= 5
          AND df <= 0.5 * (SELECT COUNT(DISTINCT doc_id) FROM docs))
),
v AS (SELECT class_id, token,
             tf / SUM(tf) OVER (PARTITION BY class_id) AS value, tf, df
      FROM dict),
topk AS (
  SELECT class_id, token, value, tf, df FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY class_id
                                 ORDER BY df DESC, token ASC) AS rn
    FROM v) WHERE rn <= 50
)
SELECT 'filter' AS part, class_id, token, ROUND(value, 6) AS value,
       ROUND(tf, 6) AS tf, ROUND(df, 6) AS df FROM kept
UNION ALL
SELECT 'topk' AS part, class_id, token, ROUND(value, 6) AS value,
       ROUND(tf, 6) AS tf, ROUND(df, 6) AS df FROM topk
""",
)
def b3b4_filter_topk_dictionary(spark, sf_dir):
    """B3 (df filter with value recalc) and B4 (top-k by df) as one
    tagged union — both dictionary ops keep their exact semantics."""
    docs = docs_from_lineitem(spark, sf_dir)
    from bigartm_spark.operators.dictionary import num_items

    d = gather_dictionary(docs)
    filt = filter_dictionary(
        d,
        num_items_in_collection=num_items(docs),
        min_df=5,
        max_df_rate=0.5,
        recalculate_value=True,
    ).withColumn("part", F.lit("filter"))
    topk = top_k_by_df(d, 50).withColumn("part", F.lit("topk"))
    cols = ["part", "class_id", "token", "value", "tf", "df"]
    out = filt.select(*cols).unionByName(topk.select(*cols))
    return _r6(out, "value", "tf", "df")


# ============================================================ D15: stats
@register(
    "d15_parse_stats",
    f"""
WITH {DOCS_CTE}
SELECT class_id,
       CAST(COUNT(DISTINCT token) AS BIGINT) AS unique_tokens,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS num_docs,
       ROUND(SUM(weight), 4) AS total_weight,
       CAST(COUNT(*) AS BIGINT) AS nnz
FROM docs GROUP BY class_id
""",
)
def d15_parse_stats(spark, sf_dir):
    docs = docs_from_lineitem(spark, sf_dir)
    out = docs.groupBy("class_id").agg(
        F.countDistinct("token").alias("unique_tokens"),
        F.countDistinct("doc_id").alias("num_docs"),
        F.sum("weight").alias("total_weight"),
        F.count(F.lit(1)).alias("nnz"),
    )
    return _r4(out, "total_weight")


# =========================================== G1+E5: init phi / sparse-init
@register(
    "g1e5_initialize_and_ranking",
    f"""
WITH {DOCS_CTE}, {DICT_CTE}, {_phi_cte()},
r AS (SELECT class_id, token,
             PERCENT_RANK() OVER (PARTITION BY class_id
                                  ORDER BY tf DESC, token ASC) AS pr
      FROM dict)
SELECT 'phi' AS part, class_id, token,
       'topic_' || CAST(topic_idx AS VARCHAR) AS k,
       ROUND(value, 6) AS value
FROM phi
UNION ALL
SELECT 'rank' AS part, class_id, token,
       CAST(CAST(pr <= 0.5 AS INT) AS VARCHAR) AS k,
       ROUND(pr, 6) AS value
FROM r
""",
)
def g1e5_initialize_and_ranking(spark, sf_dir):
    """G1 (portable-RNG InitializeModel) and E5 (sparse-init tf percent
    ranking: dense_init flag in k) in one tagged union."""
    docs = docs_from_lineitem(spark, sf_dir)
    d = gather_dictionary(docs)
    phi = initialize_phi(d, TOPICS, seed=SEED)
    g1 = (
        phi.to_long()
        .select(
            F.lit("phi").alias("part"),
            "class_id",
            "token",
            F.col("topic").alias("k"),
            "value",
        )
    )
    w = Window.partitionBy("class_id").orderBy(F.desc("tf"), F.asc("token"))
    e5 = d.select(
        F.lit("rank").alias("part"),
        "class_id",
        "token",
        F.percent_rank().over(w).alias("value"),
    ).select(
        "part",
        "class_id",
        "token",
        (F.col("value") <= 0.5).cast("int").cast("string").alias("k"),
        "value",
    )
    return _r6(g1.unionByName(e5), "value")


# ============================================================ D4: n_t
@register(
    "d4_topic_totals",
    f"""
WITH {DOCS_CTE}, {DICT_CTE}, {_phi_cte()},
nwt AS (SELECT class_id, token, topic_idx, nwt AS value FROM rown)
SELECT class_id, 'topic_' || CAST(topic_idx AS VARCHAR) AS topic,
       ROUND(SUM(GREATEST(value, 0)), 4) AS n_t
FROM nwt GROUP BY class_id, topic_idx
""",
)
def d4_topic_totals(spark, sf_dir):
    docs = docs_from_lineitem(spark, sf_dir)
    d = gather_dictionary(docs)
    # the seeded, row-normalized n_wt (pre-column-normalization)
    nwt = _seeded_row_normalized_nwt(d, SEED)
    from bigartm_spark.model.phi import PhiMatrix

    totals = mstep.topic_totals(PhiMatrix("nwt", TOPICS, nwt))
    out = totals.select(
        "class_id",
        F.posexplode("totals").alias("_i", "n_t"),
    ).select(
        "class_id",
        F.concat(F.lit("topic_"), F.col("_i").cast("string")).alias("topic"),
        "n_t",
    )
    return _r4(out, "n_t")


# ============== D6+F1+G6: merge (same-set + outer union + online schedule)
# G6 half: rho_t = (tau0 + t)^-kappa with tau0=64, kappa=0.7,
# update_every=1 (artm_model.py:652-659). Group 1 seeds n_wt unweighted
# (no prior state); group 2's E-step runs against the phi produced by
# group 1's update and merges n2 = (1-rho2)*n1 + rho2*nhat2 — the
# synchronous Robbins-Monro decay/apply fold
# (master_component.cc:1387-1439), SQL-replayed end-to-end.
#
# FIRST-BATCH DIVERGENCE (documented, ADVICE r7): this repo's
# fit_online seeds n_wt from the FIRST group's raw E-step output
# (artm.py merge path skips decay/apply while self.nwt is None — the
# InitializeModel n_wt is a normalized seed, not prior mass), so rho1
# is never applied and the initialized n_wt is never decayed. The C++
# reference folds the first update against the initialized n_wt too:
# n1_ref = (1-rho1)*n_init + rho1*nhat1. The two schedules converge
# after a few updates (the init mass decays geometrically) but differ
# on the first one; this oracle replays OUR convention, so it verifies
# the repo's schedule end-to-end rather than reference first-update
# semantics. The reference-pinned trajectories in
# test_master_model_port.py cover the steady-state agreement.
_RHO2 = (64.0 + 2.0) ** -0.7


def _estep_sql(docs_t: str, phi_t: str, s: str) -> str:
    """One 1-doc-pass E-step replica (same math as _ESTEP_CTES below)
    over table ``docs_t`` against phi table ``phi_t``, suffix ``s`` —
    lets the G6 oracle chain two E-steps where the second uses the phi
    the first produced (exactly the synchronous online schedule)."""
    return f"""
j{s} AS (
  SELECT d.doc_id, d.pos, d.token, d.class_id, d.weight,
         p.topic_idx, p.value AS phi_v
  FROM {docs_t} d
  JOIN {phi_t} p ON p.token = d.token AND p.class_id = d.class_id
),
z{s} AS (
  SELECT *, phi_v / SUM(phi_v) OVER (PARTITION BY doc_id, pos) AS ptdw0
  FROM j{s}
),
ntd{s} AS (
  SELECT doc_id, topic_idx, SUM(weight * ptdw0) AS n_td
  FROM z{s} GROUP BY doc_id, topic_idx
),
th{s} AS (
  SELECT doc_id, topic_idx,
         n_td / SUM(n_td) OVER (PARTITION BY doc_id) AS th
  FROM ntd{s}
),
q{s} AS (
  SELECT z.doc_id, z.pos, z.token, z.class_id, z.weight, z.topic_idx,
         z.phi_v * t.th AS num
  FROM z{s} z JOIN th{s} t
    ON t.doc_id = z.doc_id AND t.topic_idx = z.topic_idx
),
qn{s} AS (
  SELECT *, num / SUM(num) OVER (PARTITION BY doc_id, pos) AS ptdw
  FROM q{s}
),
n{s} AS (
  SELECT class_id, token, topic_idx, SUM(weight * ptdw) AS v
  FROM qn{s} GROUP BY class_id, token, topic_idx
)
""".strip()


@register(
    "d6f1_merge_models",
    f"""
WITH {DOCS_CTE}, {DICT_CTE}, {_phi_cte()},
g0 AS (SELECT * FROM docs WHERE doc_id % 2 = 0),
g1 AS (SELECT * FROM docs WHERE doc_id % 2 = 1),
{_estep_sql('g0', 'phi', '1')},
pwt1 AS (
  SELECT class_id, token, topic_idx,
         GREATEST(v, 0) / SUM(GREATEST(v, 0))
           OVER (PARTITION BY class_id, topic_idx) AS value
  FROM n1
),
{_estep_sql('g1', 'pwt1', '2')},
gmerged AS (
  SELECT COALESCE(a.class_id, b.class_id) AS class_id,
         COALESCE(a.token, b.token) AS token,
         COALESCE(a.topic_idx, b.topic_idx) AS topic_idx,
         (1.0 - {_RHO2!r}) * COALESCE(a.v, 0)
           + {_RHO2!r} * COALESCE(b.v, 0) AS v
  FROM n1 a
  FULL JOIN n2 b
    ON a.class_id = b.class_id AND a.token = b.token
   AND a.topic_idx = b.topic_idx
),
t1 AS (SELECT UNNEST(range({N_TOPICS})) AS topic_idx),
top50 AS (
  SELECT class_id, token FROM (
    SELECT class_id, token,
           ROW_NUMBER() OVER (PARTITION BY class_id
                              ORDER BY df DESC, token ASC) AS rn
    FROM dict) WHERE rn <= 50
),
rawa AS (SELECT class_id, token, topic_idx,
         {unit_uniform_sql("class_id", "token", "topic_idx", seed=1)} AS u
         FROM dict CROSS JOIN t1),
rawb AS (SELECT class_id, token, topic_idx,
         {unit_uniform_sql("class_id", "token", "topic_idx", seed=2)} AS u
         FROM dict CROSS JOIN t1),
na AS (SELECT class_id, token, topic_idx,
       u / SUM(u) OVER (PARTITION BY class_id, token) AS v FROM rawa),
nb AS (SELECT class_id, token, topic_idx,
       u / SUM(u) OVER (PARTITION BY class_id, token) AS v FROM rawb),
nas AS (SELECT n.* FROM na n JOIN top50 s
        ON s.class_id = n.class_id AND s.token = n.token),
same AS (
  SELECT a.class_id, a.token, a.topic_idx, 0.7 * a.v + 0.3 * b.v AS value
  FROM na a JOIN nb b
    ON a.class_id = b.class_id AND a.token = b.token
   AND a.topic_idx = b.topic_idx
),
outeru AS (
  SELECT class_id, token, topic_idx, SUM(wv) AS value FROM (
    SELECT class_id, token, topic_idx, 0.5 * v AS wv FROM nas
    UNION ALL
    SELECT class_id, token, topic_idx, 2.0 * v AS wv FROM nb
  ) GROUP BY class_id, token, topic_idx
)
SELECT 'same' AS part, class_id, token,
       'topic_' || CAST(topic_idx AS VARCHAR) AS topic,
       ROUND(value, 6) AS value
FROM same
UNION ALL
SELECT 'outer' AS part, class_id, token,
       'topic_' || CAST(topic_idx AS VARCHAR) AS topic,
       ROUND(value, 6) AS value
FROM outeru
UNION ALL
SELECT 'g6_nwt' AS part, class_id, token,
       'topic_' || CAST(topic_idx AS VARCHAR) AS topic,
       ROUND(v, 4) AS value
FROM gmerged
UNION ALL
SELECT 'g6_pwt' AS part, class_id, token,
       'topic_' || CAST(topic_idx AS VARCHAR) AS topic,
       ROUND(GREATEST(v, 0) / SUM(GREATEST(v, 0))
               OVER (PARTITION BY class_id, topic_idx), 6) AS value
FROM gmerged
""",
)
def d6f1_merge_models(spark, sf_dir):
    """D6 (same token set, weighted sum), F1 (different token sets,
    full outer union semantics) MergeModel, and G6 (online fit_online
    merge schedule, r7) in one tagged union.

    The g6_* parts replay a two-group fit_online (tau0=64, kappa=0.7,
    update_every=1) end-to-end: group 2's E-step runs against the phi
    produced by group 1's update, the final n_wt carries the
    (1-rho)/rho decay-apply merge, and p_wt its normalization — the
    synchronous Robbins-Monro schedule hash-verified like the offline
    pass (the streaming foreachBatch path drives this same fit_online
    loop). Folded here rather than a 51st row: the registry is sized to
    the driver's 50-row cap, and G6's merge is the D6 operator."""
    docs = docs_from_lineitem(spark, sf_dir)
    d = gather_dictionary(docs)
    from bigartm_spark.model.artm import ARTM
    from bigartm_spark.model.phi import PhiMatrix

    a = PhiMatrix("a", TOPICS, _seeded_row_normalized_nwt(d, 1))
    b = PhiMatrix("b", TOPICS, _seeded_row_normalized_nwt(d, 2))
    small = top_k_by_df(d, 50)
    a_small = PhiMatrix("as", TOPICS, _seeded_row_normalized_nwt(small, 1))
    same = mstep.merge_nwt([(a, 0.7), (b, 0.3)], "m").to_long()
    outer = mstep.merge_nwt([(a_small, 0.5), (b, 2.0)], "m").to_long()

    g0 = docs.filter(F.col("doc_id") % 2 == 0)
    g1 = docs.filter(F.col("doc_id") % 2 == 1)
    model = ARTM(
        topic_names=list(TOPICS), num_document_passes=1, seed=SEED,
        init_method="portable",  # the oracle SQL replays this init
    )
    model.initialize(d)
    model.fit_online([g0, g1], tau0=64.0, kappa=0.7, update_every=1)
    g6_nwt = _r4(
        model.nwt.to_long().withColumn("part", F.lit("g6_nwt")), "value"
    )
    g6_pwt = _r6(
        model.get_phi_long().withColumn("part", F.lit("g6_pwt")), "value"
    )

    cols = ["part", "class_id", "token", "topic", "value"]
    out = (
        same.withColumn("part", F.lit("same"))
        .select(*cols)
        .unionByName(outer.withColumn("part", F.lit("outer")).select(*cols))
    )
    out = _r6(out, "value")
    return out.unionByName(g6_nwt.select(*cols)).unionByName(
        g6_pwt.select(*cols)
    )


# ============================================================ E1: top tokens
@register(
    "e1_top_tokens",
    f"""
WITH {DOCS_CTE}, {DICT_CTE}, {_phi_cte()},
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY class_id, topic_idx
                                   ORDER BY value DESC, token ASC) AS rn
      FROM phi)
SELECT 'topic_' || CAST(topic_idx AS VARCHAR) AS topic, token,
       ROUND(value, 6) AS value, CAST(rn AS BIGINT) AS rank
FROM r WHERE rn <= 10
""",
)
def e1_top_tokens(spark, sf_dir):
    _, _, phi = _spark_phi(spark, sf_dir)
    w = Window.partitionBy("class_id", "topic").orderBy(
        F.desc("value"), F.asc("token")
    )
    out = (
        phi.to_long()
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 10)
        .select("topic", "token", "value", "rank")
    )
    return _r6(out, "value")


# ============================================================ E2: kernel
@register(
    "e2_topic_kernel",
    f"""
WITH {DOCS_CTE}, {DICT_CTE}, {_phi_cte()},
ptw AS (SELECT *, value / SUM(value) OVER (PARTITION BY class_id, token) AS p_tw
        FROM phi),
k AS (SELECT * FROM ptw WHERE p_tw > 0.25)
SELECT 'topic_' || CAST(topic_idx AS VARCHAR) AS topic,
       CAST(COUNT(*) AS BIGINT) AS kernel_size,
       ROUND(SUM(value), 6) AS purity,
       ROUND(AVG(p_tw), 6) AS contrast
FROM k GROUP BY topic_idx
""",
)
def e2_topic_kernel(spark, sf_dir):
    _, _, phi = _spark_phi(spark, sf_dir)
    long = phi.to_long()
    w = Window.partitionBy("class_id", "token")
    ptw = long.withColumn("p_tw", F.col("value") / F.sum("value").over(w))
    out = (
        ptw.filter(F.col("p_tw") > 0.25)
        .groupBy("topic")
        .agg(
            F.count(F.lit(1)).alias("kernel_size"),
            F.sum("value").alias("purity"),
            F.avg("p_tw").alias("contrast"),
        )
    )
    return _r6(out, "purity", "contrast")


# ============================================================ E4: sparse
@register(
    "e4_specified_sparse_phi",
    f"""
WITH {DOCS_CTE}, {DICT_CTE}, {_phi_cte()},
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY class_id, token
                                   ORDER BY value DESC, topic_idx ASC) AS rn
      FROM phi)
SELECT class_id, token, 'topic_' || CAST(topic_idx AS VARCHAR) AS topic,
       ROUND(value, 6) AS value
FROM r WHERE rn <= 2
""",
)
def e4_specified_sparse_phi(spark, sf_dir):
    _, _, phi = _spark_phi(spark, sf_dir)
    from bigartm_spark.operators.topk import specified_sparse

    return _r6(specified_sparse(phi.to_long(), TOPICS, max_elements=2), "value")


# ================================================ E7+E9: window smooth + lag
@register(
    "e7e9_window_ops",
    f"""
WITH {DOCS_CTE}
SELECT doc_id, pos, token,
       ROUND(AVG(weight) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING), 6)
         AS smoothed,
       CAST(SIGN(weight - COALESCE(LAG(weight) OVER (PARTITION BY doc_id
                                                     ORDER BY pos), weight))
            AS DOUBLE) AS trend
FROM docs
""",
)
def e7e9_window_ops(spark, sf_dir):
    """E7 (SmoothPtdw moving window) and E9 (SmoothTimeInTopics lag) over
    the same row set — one pass, two window expressions, one sort."""
    docs = docs_from_lineitem(spark, sf_dir)
    w_avg = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-2, 2)
    w_lag = Window.partitionBy("doc_id").orderBy("pos")
    out = docs.select(
        "doc_id",
        "pos",
        "token",
        F.avg("weight").over(w_avg).alias("smoothed"),
        F.signum(
            F.col("weight")
            - F.coalesce(F.lag("weight").over(w_lag), F.col("weight"))
        )
        .cast("double")
        .alias("trend"),
    )
    return _r6(out, "smoothed")


# ====================================== D14+F4: cooc PPMI + dict anti-filter
@register(
    "d14f4_cooc_ppmi_filtered",
    f"""
WITH {DOCS_CTE}, {DICT_CTE},
pairs AS (
  SELECT a.doc_id, a.token AS token_a, b.token AS token_b
  FROM docs a JOIN docs b
    ON a.doc_id = b.doc_id AND ABS(a.pos - b.pos) <= 2 AND a.token < b.token
),
cooc AS (
  SELECT token_a, token_b, CAST(COUNT(*) AS DOUBLE) AS cooc_tf,
         CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS cooc_df
  FROM pairs GROUP BY token_a, token_b
),
marg AS (
  SELECT token, SUM(cooc_tf) AS n_u FROM (
    SELECT token_a AS token, cooc_tf FROM cooc
    UNION ALL SELECT token_b, cooc_tf FROM cooc
  ) GROUP BY token
),
tot AS (SELECT SUM(cooc_tf) * 2 AS n FROM cooc),
kept AS (SELECT token FROM dict WHERE df >= 20),
dpairs AS (
  SELECT a.doc_id,
         LEAST(a.token, b.token) AS token_a,
         GREATEST(a.token, b.token) AS token_b
  FROM docs a JOIN docs b
    ON a.doc_id = b.doc_id AND b.pos - a.pos BETWEEN 1 AND 2
  WHERE a.token <> b.token
),
filtered AS (
  SELECT token_a, token_b, CAST(COUNT(*) AS DOUBLE) AS cooc_tf
  FROM dpairs
  WHERE token_a IN (SELECT token FROM kept)
    AND token_b IN (SELECT token FROM kept)
  GROUP BY token_a, token_b
)
SELECT 'ppmi' AS part, c.token_a, c.token_b, ROUND(c.cooc_tf, 6) AS cooc_tf,
       ROUND(c.cooc_df, 6) AS cooc_df,
       ROUND(GREATEST(0.0, LN((SELECT n FROM tot) * c.cooc_tf
                              / (ma.n_u * mb.n_u))), 6) AS ppmi
FROM cooc c
JOIN marg ma ON ma.token = c.token_a
JOIN marg mb ON mb.token = c.token_b
UNION ALL
SELECT 'filtered' AS part, token_a, token_b, ROUND(cooc_tf, 6) AS cooc_tf,
       0.0 AS cooc_df, 0.0 AS ppmi
FROM filtered
""",
)
def d14f4_cooc_ppmi_filtered(spark, sf_dir):
    """D14 (cooc gather + PPMI) and F4 (dictionary filter propagated to
    cooc pairs, both sides left-semi) in one tagged union."""
    from bigartm_spark.operators.cooc import cooc_gather, cooc_ppmi

    docs = docs_from_lineitem(spark, sf_dir)
    ppmi = cooc_ppmi(docs, window=2).withColumn("part", F.lit("ppmi"))
    kept = filter_dictionary(gather_dictionary(docs), min_df=20).select("token")
    cooc = cooc_gather(docs, window=2).select(
        "token_a", "token_b", F.col("cooc_tf").cast("double").alias("cooc_tf")
    )
    filtered = (
        cooc.join(F.broadcast(kept), cooc.token_a == kept.token, "left_semi")
        .join(
            F.broadcast(kept.withColumnRenamed("token", "_t2")),
            F.col("token_b") == F.col("_t2"),
            "left_semi",
        )
        .withColumn("part", F.lit("filtered"))
        .withColumn("cooc_df", F.lit(0.0))
        .withColumn("ppmi", F.lit(0.0))
    )
    cols = ["part", "token_a", "token_b", "cooc_tf", "cooc_df", "ppmi"]
    out = ppmi.select(*cols).unionByName(filtered.select(*cols))
    return _r6(out, "cooc_tf", "cooc_df", "ppmi")


# ============================== F2+B5: token intersect / model membership
@register(
    "f2b5_model_token_ops",
    f"""
WITH {DOCS_CTE}, {DICT_CTE},
topk AS (SELECT token FROM (
  SELECT token, ROW_NUMBER() OVER (PARTITION BY class_id
                                   ORDER BY df DESC, token ASC) AS rn
  FROM dict) WHERE rn <= 50),
inter AS (
  SELECT DISTINCT d.class_id, d.token
  FROM docs d WHERE d.token IN (SELECT token FROM topk)
),
memb AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS in_model_occurrences,
         SUM(weight) AS in_model_weight
  FROM docs WHERE token IN (SELECT token FROM topk)
  GROUP BY doc_id
)
SELECT 'intersect' AS part, class_id || '|' || token AS key,
       CAST(0 AS BIGINT) AS in_model_occurrences,
       0.0 AS in_model_weight
FROM inter
UNION ALL
SELECT 'membership' AS part, CAST(doc_id AS VARCHAR) AS key,
       in_model_occurrences, ROUND(in_model_weight, 6) AS in_model_weight
FROM memb
""",
)
def f2b5_model_token_ops(spark, sf_dir):
    """F2 (token-set intersect) and B5 (the E-step's token_index != -1
    membership drop, processor_helpers.cc:221-227) in one tagged union,
    both left-semi joins against the broadcast model token set."""
    docs = docs_from_lineitem(spark, sf_dir)
    topk = top_k_by_df(gather_dictionary(docs), 50).select("token")
    inter = (
        docs.join(F.broadcast(topk), "token", "left_semi")
        .select("class_id", "token")
        .distinct()
        .select(
            F.lit("intersect").alias("part"),
            F.concat_ws("|", "class_id", "token").alias("key"),
            F.lit(0).cast("long").alias("in_model_occurrences"),
            F.lit(0.0).alias("in_model_weight"),
        )
    )
    memb = (
        docs.join(F.broadcast(topk), "token", "left_semi")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("in_model_occurrences"),
            F.sum("weight").alias("in_model_weight"),
        )
        .select(
            F.lit("membership").alias("part"),
            F.col("doc_id").cast("string").alias("key"),
            "in_model_occurrences",
            "in_model_weight",
        )
    )
    return _r6(inter.unionByName(memb), "in_model_weight")


# ============================================================ B1/B2: modality
@register(
    "b2_class_weights",
    f"""
WITH {DOCS_MULTI_CTE}
SELECT class_id,
       ROUND(SUM(weight * CASE class_id WHEN '@default_class' THEN 1.0
                          WHEN 'supp' THEN 2.0 ELSE 0.0 END), 6)
         AS weighted_tf,
       CAST(COUNT(*) AS BIGINT) AS nnz
FROM docs GROUP BY class_id
""",
)
def b2_class_weights(spark, sf_dir):
    docs = docs_multimodal(spark, sf_dir)
    weighted = estep.apply_class_weights(
        docs, {"@default_class": 1.0, "supp": 2.0}
    )
    out = weighted.groupBy("class_id").agg(
        F.sum("weight").alias("weighted_tf"),
        F.count(F.lit(1)).alias("nnz"),
    )
    return _r6(out, "weighted_tf")


# ==================================================== D3: E-step theta
_ESTEP_CTES = f"""
{DOCS_CTE}, {DICT_CTE}, {_phi_cte()},
j AS (
  SELECT d.doc_id, d.pos, d.token, d.weight, p.topic_idx, p.value AS phi_v
  FROM docs d
  JOIN phi p ON p.token = d.token AND p.class_id = d.class_id
),
znorm AS (
  SELECT *, phi_v / SUM(phi_v) OVER (PARTITION BY doc_id, pos) AS ptdw0
  FROM j
),
ntd AS (
  SELECT doc_id, topic_idx, SUM(weight * ptdw0) AS n_td
  FROM znorm GROUP BY doc_id, topic_idx
),
theta AS (
  SELECT doc_id, topic_idx,
         n_td / SUM(n_td) OVER (PARTITION BY doc_id) AS th
  FROM ntd
)
""".strip()


@register(
    "d3e3_theta_and_snippet",
    f"""
WITH {_ESTEP_CTES},
first_docs AS (SELECT DISTINCT doc_id FROM docs ORDER BY doc_id LIMIT 10)
SELECT 'theta' AS part, doc_id,
       'topic_' || CAST(topic_idx AS VARCHAR) AS topic,
       ROUND(th, 6) AS value
FROM theta
UNION ALL
SELECT 'snippet' AS part, t.doc_id,
       'topic_' || CAST(t.topic_idx AS VARCHAR) AS topic,
       ROUND(t.th, 6) AS value
FROM theta t JOIN first_docs f ON f.doc_id = t.doc_id
""",
)
def d3e3_theta_and_snippet(spark, sf_dir):
    """D3 (one-pass E-step theta) and E3 (ThetaSnippet over the first 10
    docs) in one tagged union from a single process_batches pass."""
    from bigartm_spark.model.scores import theta_snippet

    docs, _, phi = _spark_phi(spark, sf_dir)
    out = estep.process_batches(
        docs,
        phi,
        num_document_passes=1,
        emit_nwt=False,
        emit_theta=True,
        compute_scores=False,
    )
    theta = _r6(estep.extract_theta(out, TOPICS), "value")
    cols = ["part", "doc_id", "topic", "value"]
    d3 = theta.withColumn("part", F.lit("theta")).select(*cols)
    e3 = (
        theta_snippet(theta, 10)
        .withColumn("part", F.lit("snippet"))
        .select(*cols)
    )
    return d3.unionByName(e3)


# ============================================ D2+G5: E-step nwt + EM pwt
@register(
    "d2g5_estep_mstep_pass",
    f"""
WITH {_ESTEP_CTES},
p2 AS (
  SELECT z.doc_id, z.pos, z.token, z.weight, z.topic_idx, z.phi_v * t.th AS num
  FROM znorm z JOIN theta t
    ON t.doc_id = z.doc_id AND t.topic_idx = z.topic_idx
),
p2n AS (
  SELECT *, num / SUM(num) OVER (PARTITION BY doc_id, pos) AS ptdw
  FROM p2
),
nwt1 AS (
  SELECT token, topic_idx, SUM(weight * ptdw) AS v
  FROM p2n GROUP BY token, topic_idx
)
SELECT '@default_class' AS class_id, token,
       'topic_' || CAST(topic_idx AS VARCHAR) AS topic,
       ROUND(v, 4) AS nwt,
       ROUND(GREATEST(v, 0) / SUM(GREATEST(v, 0)) OVER (PARTITION BY topic_idx), 6)
         AS pwt
FROM nwt1
""",
)
def d2g5_estep_mstep_pass(spark, sf_dir):
    """D2 (E-step n_wt) and G5 (the full offline EM pass G2 -> D4 -> D5)
    joined on (class_id, token, topic): one row carries the raw n_wt and
    the normalized p_wt it becomes — the strongest end-to-end correctness
    check of the engine core, now as a single driver row."""
    from bigartm_spark.model.artm import ARTM
    from bigartm_spark.model.phi import PhiMatrix

    docs, _, phi = _spark_phi(spark, sf_dir)
    out = estep.process_batches(
        docs,
        phi,
        num_document_passes=1,
        emit_nwt=True,
        emit_theta=False,
        compute_scores=False,
    )
    nwt = estep.aggregate_nwt(out, N_TOPICS)
    nwt_long = (
        PhiMatrix("nwt", TOPICS, nwt)
        .to_long()
        .withColumnRenamed("value", "nwt")
    )

    model = ARTM(
        topic_names=list(TOPICS), num_document_passes=1, seed=SEED,
        init_method="portable",  # the oracle SQL replays this init
    )
    model.initialize(gather_dictionary(docs))
    model.fit_offline(docs, num_collection_passes=1)
    pwt_long = model.get_phi_long().withColumnRenamed("value", "pwt")
    out = nwt_long.join(pwt_long, ["class_id", "token", "topic"])
    return _r4(_r6(out, "pwt"), "nwt")


# ==================================================== F3: topic reconfigure
@register(
    "f3_reshape_topics",
    f"""
WITH {DOCS_CTE}, {DICT_CTE}, {_phi_cte()},
kept AS (
  SELECT class_id, token,
         'topic_' || CAST(topic_idx AS VARCHAR) AS topic,
         value
  FROM phi WHERE topic_idx IN (0, 2)
),
added AS (SELECT class_id, token, 'topic_new' AS topic, 0.0 AS value FROM dict)
SELECT class_id, token, topic, ROUND(value, 6) AS value FROM kept
UNION ALL
SELECT class_id, token, topic, ROUND(value, 6) AS value FROM added
""",
)
def f3_reshape_topics(spark, sf_dir):
    from bigartm_spark.model.artm import ARTM

    docs = docs_from_lineitem(spark, sf_dir)
    model = ARTM(topic_names=list(TOPICS), seed=SEED, init_method="portable")
    model.initialize(gather_dictionary(docs))
    model.reshape_topics(["topic_0", "topic_2", "topic_new"])
    return _r6(model.get_phi_long(), "value")




# ==================================================== D7+I4: scalar scores
@register(
    "d7i4_perplexity_and_counters",
    f"""
WITH {DOCS_CTE}, {DICT_CTE}, {_phi_cte()},
j AS (
  SELECT d.doc_id, d.pos, d.weight, SUM(p.value / {N_TOPICS}) AS pwd
  FROM docs d
  JOIN phi p ON p.token = d.token AND p.class_id = d.class_id
  GROUP BY d.doc_id, d.pos, d.weight
)
SELECT ROUND(EXP(-SUM(weight * LN(pwd)) / SUM(weight)), 6) AS perplexity,
       ROUND(SUM(weight), 4) AS normalizer,
       (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) FROM docs) AS items,
       (SELECT ROUND(SUM(weight), 4) FROM docs) AS token_weight
FROM j
""",
)
def d7i4_perplexity_and_counters(spark, sf_dir):
    """D7 (perplexity under uniform theta) and I4 (items-processed /
    token-weight counters) from ONE process_batches score pass."""
    docs, _, phi = _spark_phi(spark, sf_dir)
    out = estep.process_batches(
        docs,
        phi,
        num_document_passes=0,  # theta stays uniform
        emit_nwt=False,
        emit_theta=False,
        compute_scores=True,
    )
    scores = estep.extract_scores(out)
    return spark.createDataFrame(
        [
            (
                _pyr6(scores["perplexity"]),
                _pyr4(scores["perplexity_normalizer"]),
                int(scores["items_processed"]),
                _pyr4(scores["token_weight"]),
            )
        ],
        "perplexity double, normalizer double, items bigint, token_weight double",
    )


# ============================ doc-ppl: model-based per-doc quality score
@register(
    "doc_ppl_quality",
    f"""
WITH {DOCS_CTE}, {DICT_CTE}, {_phi_cte()},
pw AS (
  SELECT class_id, token, SUM(value / {N_TOPICS}) AS pwd
  FROM phi GROUP BY class_id, token
),
j AS (
  SELECT d.doc_id, d.weight, p.pwd
  FROM docs d JOIN pw p ON p.token = d.token AND p.class_id = d.class_id
)
SELECT doc_id, ROUND(SUM(weight), 6) AS token_weight,
       ROUND(-SUM(weight * LN(pwd)) / SUM(weight), 6) AS doc_log_ppl
FROM j GROUP BY doc_id
""",
)
def doc_ppl_quality(spark, sf_dir):
    """Model-based per-document quality: D7's perplexity disaggregated to
    one row per doc (uniform theta) — the 'drop the outliers the topic
    model can't explain' filter of a training pipeline. Compared in LOG
    space: exp() amplifies summation-order double noise ~ppl-fold, so a
    6-decimal doc_ppl rounding can flip between engines on borderline
    values (seen once at sf0.1); log-ppl is O(10) and rounds stably.
    doc_ppl = exp(doc_log_ppl) for consumers."""
    from bigartm_spark.model.scores import doc_perplexity

    docs, _, phi = _spark_phi(spark, sf_dir)
    out = doc_perplexity(docs, phi).drop("doc_ppl")
    return _r6(out, "token_weight", "doc_log_ppl")


# ============================== D8+D11: sparsity phi / topic mass scores
@register(
    "d8d11_phi_scores",
    f"""
WITH {DOCS_CTE}, {DICT_CTE}, {_phi_cte()},
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY class_id, token
                                   ORDER BY value DESC, topic_idx ASC) AS rn
      FROM phi),
sp AS (SELECT class_id, CASE WHEN rn <= 2 THEN value ELSE 0.0 END AS v FROM r),
sparsity AS (
  SELECT class_id,
         AVG(CASE WHEN v < 1e-37 THEN 1.0 ELSE 0.0 END) AS v1,
         CAST(SUM(CASE WHEN v < 1e-37 THEN 1 ELSE 0 END) AS DOUBLE) AS v2,
         CAST(COUNT(*) AS DOUBLE) AS v3
  FROM sp GROUP BY class_id
),
nwt AS (SELECT class_id, token, topic_idx, nwt AS value FROM rown),
pt AS (SELECT class_id, topic_idx,
              SUM(GREATEST(value, 0)) AS topic_mass
       FROM nwt GROUP BY class_id, topic_idx)
SELECT 'sparsity_phi' AS part, class_id, '*' AS k,
       ROUND(v1, 6) AS v1, v2, v3
FROM sparsity
UNION ALL
SELECT 'topic_mass' AS part, class_id,
       'topic_' || CAST(topic_idx AS VARCHAR) AS k,
       ROUND(topic_mass, 6) AS v1,
       ROUND(topic_mass / SUM(topic_mass) OVER (PARTITION BY class_id), 6)
         AS v2,
       0.0 AS v3
FROM pt
""",
)
def d8d11_phi_scores(spark, sf_dir):
    """D8 (SparsityPhi over a 2-sparsified phi) and D11 (TopicMassPhi over
    the seeded n_wt) in one tagged union, normalized to (k, v1, v2, v3)."""
    from bigartm_spark.model.phi import PhiMatrix
    from bigartm_spark.model.scores import topic_mass_phi

    docs = docs_from_lineitem(spark, sf_dir)
    d = gather_dictionary(docs)
    phi = initialize_phi(d, TOPICS, seed=SEED)
    w = Window.partitionBy("class_id", "token").orderBy(
        F.desc("value"), F.asc("topic")
    )
    sparsified = (
        phi.to_long()
        .withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "value", F.when(F.col("_rn") <= 2, F.col("value")).otherwise(0.0)
        )
    )
    d8 = sparsified.groupBy("class_id").agg(
        F.avg(F.when(F.col("value") < 1e-37, 1.0).otherwise(0.0)).alias("v1"),
        F.sum(F.when(F.col("value") < 1e-37, 1).otherwise(0))
        .cast("double")
        .alias("v2"),
        F.count(F.lit(1)).cast("double").alias("v3"),
    ).select(
        F.lit("sparsity_phi").alias("part"),
        "class_id",
        F.lit("*").alias("k"),
        "v1",
        "v2",
        "v3",
    )
    nwt = PhiMatrix("nwt", TOPICS, _seeded_row_normalized_nwt(d, SEED))
    d11 = topic_mass_phi(nwt).select(
        F.lit("topic_mass").alias("part"),
        "class_id",
        F.col("topic").alias("k"),
        F.col("topic_mass").alias("v1"),
        F.col("topic_ratio").alias("v2"),
        F.lit(0.0).alias("v3"),
    )
    return _r6(d8.unionByName(d11), "v1", "v2")


# ============================================ D13: background tokens
@register(
    "d13_background_tokens_ratio",
    f"""
WITH {DOCS_CTE}, {DICT_CTE}, {_phi_cte()},
en AS (
  SELECT class_id, token, topic_idx, value,
         value / SUM(value) OVER (PARTITION BY class_id, token) AS p_tw,
         SUM(value) OVER (PARTITION BY class_id, topic_idx)
           / SUM(value) OVER (PARTITION BY class_id) AS p_t
  FROM phi
),
kl AS (
  SELECT class_id, token,
         SUM(CASE WHEN p_t > 0 AND p_tw > 0
                  THEN p_t * LN(p_t / p_tw) ELSE 0.0 END) AS kl
  FROM en GROUP BY class_id, token
)
SELECT class_id, token, ROUND(kl, 6) AS kl,
       CAST(kl > 0.5 AS INT) AS is_background
FROM kl
""",
)
def d13_background_tokens_ratio(spark, sf_dir):
    from bigartm_spark.model.scores import background_tokens_ratio

    _, _, phi = _spark_phi(spark, sf_dir)
    out = background_tokens_ratio(phi, delta_threshold=0.5)
    return _r6(
        out.withColumn("is_background", F.col("is_background").cast("int")),
        "kl",
    )


# ============================== H1+H1b: smooth/sparse + TransformFunction
@register(
    "h1_smooth_sparse_phi_deltas",
    f"""
WITH {DOCS_CTE}, {DICT_CTE}, {_phi_cte()},
dictv AS (SELECT class_id, token,
                 tf / SUM(tf) OVER (PARTITION BY class_id) AS dv
          FROM dict),
base AS (
  SELECT p.class_id, p.token, p.topic_idx, p.value, d.dv
  FROM phi p JOIN dictv d
    ON d.class_id = p.class_id AND d.token = p.token
)
SELECT 'const' AS variant, class_id, token,
       'topic_' || CAST(topic_idx AS VARCHAR) AS topic,
       ROUND(-0.5 * dv, 6) AS delta
FROM base
UNION ALL
SELECT 'log' AS variant, class_id, token,
       'topic_' || CAST(topic_idx AS VARCHAR) AS topic,
       ROUND(-0.5 * dv *
             (CASE WHEN value > 0 THEN ln(value) ELSE 0 END), 6) AS delta
FROM base
""",
)
def h1_smooth_sparse_phi_deltas(spark, sf_dir):
    """SmoothSparsePhi with dictionary coefficients, both TransformFunction
    variants (transform_function.cc:35-38): const (delta = tau * dict.value)
    and logarithm (delta = tau * dict.value * ln(p_wt)), tagged union."""
    from bigartm_spark.model.phi import PhiMatrix
    from bigartm_spark.model.regularizers import (
        RegularizeContext,
        SmoothSparsePhi,
        TransformFunction,
    )

    docs = docs_from_lineitem(spark, sf_dir)
    d = gather_dictionary(docs)
    phi = initialize_phi(d, TOPICS, seed=SEED)
    ctx = RegularizeContext(dictionary=d)
    parts = []
    for variant, reg in (
        ("const", SmoothSparsePhi(tau=-0.5, use_dictionary=True)),
        (
            "log",
            SmoothSparsePhi(
                tau=-0.5,
                use_dictionary=True,
                transform_function=TransformFunction("logarithm"),
            ),
        ),
    ):
        delta = reg.rwt_delta(phi, phi, ctx)
        parts.append(
            PhiMatrix("r", TOPICS, delta)
            .to_long()
            .withColumnRenamed("value", "delta")
            .withColumn("variant", F.lit(variant))
            .select("variant", "class_id", "token", "topic", "delta")
        )
    return _r6(parts[0].unionByName(parts[1]), "delta")


# ========================================= H3+H4: decorrelator + label reg
@register(
    "h3h4_regularizer_deltas",
    f"""
WITH {DOCS_CTE}, {DICT_CTE}, {_phi_cte()},
rs AS (SELECT class_id, token, topic_idx, value,
              SUM(value) OVER (PARTITION BY class_id, token) AS rowsum
       FROM phi),
nt AS (SELECT class_id, topic_idx, SUM(value) AS n_t
       FROM phi GROUP BY class_id, topic_idx),
wt AS (SELECT p.class_id, p.token, p.topic_idx, p.value * n.n_t AS wv
       FROM phi p JOIN nt n
         ON n.class_id = p.class_id AND n.topic_idx = p.topic_idx),
den AS (SELECT class_id, token, SUM(wv) AS d
        FROM wt GROUP BY class_id, token),
lab AS (
  SELECT w.class_id, w.token, w.topic_idx,
         CASE WHEN de.d > 0 THEN 1.5 * w.wv / de.d ELSE 0.0 END AS delta_label
  FROM wt w JOIN den de
    ON de.class_id = w.class_id AND de.token = w.token
)
SELECT r.class_id, r.token, 'topic_' || CAST(r.topic_idx AS VARCHAR) AS topic,
       ROUND(-2.0 * r.value * (r.rowsum - r.value), 6) AS delta_decor,
       ROUND(l.delta_label, 6) AS delta_label
FROM rs r JOIN lab l
  ON l.class_id = r.class_id AND l.token = r.token
 AND l.topic_idx = r.topic_idx
""",
)
def h3h4_regularizer_deltas(spark, sf_dir):
    """H3 (DecorrelatorPhi) and H4 (LabelRegularizationPhi) deltas over
    the same phi, joined on the cell key — two regularizers, one driver
    row."""
    from bigartm_spark.model import mstep
    from bigartm_spark.model.phi import PhiMatrix
    from bigartm_spark.model.regularizers import (
        DecorrelatorPhi,
        LabelRegularizationPhi,
        RegularizeContext,
    )

    _, _, phi = _spark_phi(spark, sf_dir)
    d_decor = DecorrelatorPhi(tau=2.0).rwt_delta(phi, phi, RegularizeContext())
    decor = (
        PhiMatrix("r", TOPICS, d_decor)
        .to_long()
        .withColumnRenamed("value", "delta_decor")
    )
    ctx = RegularizeContext(topic_totals=mstep.topic_totals(phi))
    d_label = LabelRegularizationPhi(tau=1.5).rwt_delta(phi, phi, ctx)
    label = (
        PhiMatrix("r", TOPICS, d_label)
        .to_long()
        .withColumnRenamed("value", "delta_label")
    )
    out = decor.join(label, ["class_id", "token", "topic"])
    return _r6(out, "delta_decor", "delta_label")


