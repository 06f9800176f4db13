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
        if inner.endswith(", 6"):
            expr = inner[: -len(", 6")]
        elif inner.endswith(",6"):
            expr = inner[: -len(",6")]
        else:
            out.append(sql[j:k])
            i = k
            continue
        out.append(f"FLOOR(({expr}) * 1000000 + 0.5) / 1000000")
        i = k
    return "".join(out)


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = _portable_round_sql(oracle)
        return fn

    return deco


def _r6(df: DataFrame, *cols: str) -> DataFrame:
    """Spark twin of the oracle's portable rounding (see above)."""
    for c in cols:
        df = df.withColumn(
            c,
            (
                F.floor(F.col(c).cast("double") * F.lit(1000000.0) + F.lit(0.5))
                / F.lit(1000000.0)
            ).cast("double"),
        )
    return df


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


# ============================================================ B3: filter
@register(
    "b3_filter_dictionary",
    f"""
WITH {DOCS_CTE}, {DICT_CTE},
kept AS (
  SELECT * FROM dict
  WHERE df >= 5 AND df <= 0.5 * (SELECT COUNT(DISTINCT doc_id) FROM docs)
)
SELECT class_id, token,
       ROUND(tf / SUM(tf) OVER (PARTITION BY class_id), 6) AS value,
       ROUND(tf, 6) AS tf, ROUND(df, 6) AS df
FROM kept
""",
)
def b3_filter_dictionary(spark, sf_dir):
    docs = docs_from_lineitem(spark, sf_dir)
    from bigartm_spark.operators.dictionary import num_items

    d = gather_dictionary(docs)
    out = filter_dictionary(
        d,
        num_items_in_collection=num_items(docs),
        min_df=5,
        max_df_rate=0.5,
        recalculate_value=True,
    )
    return _r6(out, "value", "tf", "df")


# ============================================================ B4: top-k df
@register(
    "b4_top_k_by_df",
    f"""
WITH {DOCS_CTE}, {DICT_CTE},
v AS (SELECT class_id, token,
             tf / SUM(tf) OVER (PARTITION BY class_id) AS value, tf, df
      FROM dict),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY class_id
                                   ORDER BY df DESC, token ASC) AS rn
      FROM v)
SELECT class_id, token, ROUND(value, 6) AS value,
       ROUND(tf, 6) AS tf, ROUND(df, 6) AS df
FROM r WHERE rn <= 50
""",
)
def b4_top_k_by_df(spark, sf_dir):
    docs = docs_from_lineitem(spark, sf_dir)
    return _r6(top_k_by_df(gather_dictionary(docs), 50), "value", "tf", "df")


# ============================================================ D15: stats
@register(
    "d15_parse_stats",
    f"""
WITH {DOCS_CTE}
SELECT class_id,
       CAST(COUNT(DISTINCT token) AS BIGINT) AS unique_tokens,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS num_docs,
       ROUND(SUM(weight), 6) AS total_weight,
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
    return _r6(out, "total_weight")


# ============================================================ G1: init phi
@register(
    "g1_initialize_phi",
    f"""
WITH {DOCS_CTE}, {DICT_CTE}, {_phi_cte()}
SELECT class_id, token,
       'topic_' || CAST(topic_idx AS VARCHAR) AS topic,
       ROUND(value, 6) AS value
FROM phi
""",
)
def g1_initialize_phi(spark, sf_dir):
    _, _, phi = _spark_phi(spark, sf_dir)
    return _r6(phi.to_long(), "value")


# ============================================================ D4: n_t
@register(
    "d4_topic_totals",
    f"""
WITH {DOCS_CTE}, {DICT_CTE}, {_phi_cte()},
nwt AS (SELECT class_id, token, topic_idx, nwt AS value FROM rown)
SELECT class_id, 'topic_' || CAST(topic_idx AS VARCHAR) AS topic,
       ROUND(SUM(GREATEST(value, 0)), 6) AS n_t
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
    return _r6(out, "n_t")


# ============================================================ D6/F1: merge
@register(
    "d6_merge_models",
    f"""
WITH {DOCS_CTE}, {DICT_CTE},
t1 AS (SELECT UNNEST(range({N_TOPICS})) AS topic_idx),
rawa AS (SELECT class_id, token, topic_idx,
         {unit_uniform_sql("class_id", "token", "topic_idx", seed=1)} AS u
         FROM dict CROSS JOIN t1),
rawb AS (SELECT class_id, token, topic_idx,
         {unit_uniform_sql("class_id", "token", "topic_idx", seed=2)} AS u
         FROM dict CROSS JOIN t1),
na AS (SELECT class_id, token, topic_idx,
       u / SUM(u) OVER (PARTITION BY class_id, token) AS v FROM rawa),
nb AS (SELECT class_id, token, topic_idx,
       u / SUM(u) OVER (PARTITION BY class_id, token) AS v FROM rawb)
SELECT a.class_id, a.token,
       'topic_' || CAST(a.topic_idx AS VARCHAR) AS topic,
       ROUND(0.7 * a.v + 0.3 * b.v, 6) AS value
FROM na a JOIN nb b
  ON a.class_id = b.class_id AND a.token = b.token AND a.topic_idx = b.topic_idx
""",
)
def d6_merge_models(spark, sf_dir):
    docs = docs_from_lineitem(spark, sf_dir)
    d = gather_dictionary(docs)
    from bigartm_spark.model.phi import PhiMatrix

    a = PhiMatrix("a", TOPICS, _seeded_row_normalized_nwt(d, 1))
    b = PhiMatrix("b", TOPICS, _seeded_row_normalized_nwt(d, 2))
    merged = mstep.merge_nwt([(a, 0.7), (b, 0.3)], "m")
    return _r6(merged.to_long(), "value")


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


# ============================================================ E7: window
@register(
    "e7_moving_window_smooth",
    f"""
WITH {DOCS_CTE}
SELECT doc_id, pos, token,
       ROUND(AVG(weight) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING), 6)
         AS smoothed
FROM docs
""",
)
def e7_moving_window_smooth(spark, sf_dir):
    docs = docs_from_lineitem(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-2, 2)
    out = docs.select(
        "doc_id", "pos", "token", F.avg("weight").over(w).alias("smoothed")
    )
    return _r6(out, "smoothed")


# ============================================================ E9: lag
@register(
    "e9_lag_trend",
    f"""
WITH {DOCS_CTE}
SELECT doc_id, pos, token,
       CAST(SIGN(weight - COALESCE(LAG(weight) OVER (PARTITION BY doc_id
                                                     ORDER BY pos), weight))
            AS DOUBLE) AS trend
FROM docs
""",
)
def e9_lag_trend(spark, sf_dir):
    docs = docs_from_lineitem(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy("pos")
    out = docs.select(
        "doc_id",
        "pos",
        "token",
        F.signum(
            F.col("weight") - F.coalesce(F.lag("weight").over(w), F.col("weight"))
        )
        .cast("double")
        .alias("trend"),
    )
    return out


# ============================================================ D14: cooc
@register(
    "d14_cooc_ppmi",
    f"""
WITH {DOCS_CTE},
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
tot AS (SELECT SUM(cooc_tf) * 2 AS n FROM cooc)
SELECT c.token_a, c.token_b, ROUND(c.cooc_tf, 6) AS cooc_tf,
       ROUND(c.cooc_df, 6) AS cooc_df,
       ROUND(GREATEST(0.0, LN((SELECT n FROM tot) * c.cooc_tf
                              / (ma.n_u * mb.n_u))), 6) AS ppmi
FROM cooc c
JOIN marg ma ON ma.token = c.token_a
JOIN marg mb ON mb.token = c.token_b
""",
)
def d14_cooc_ppmi(spark, sf_dir):
    docs = docs_from_lineitem(spark, sf_dir)
    from bigartm_spark.operators.cooc import cooc_ppmi

    return _r6(cooc_ppmi(docs, window=2), "cooc_tf", "cooc_df", "ppmi")


# ============================================================ F2: intersect
@register(
    "f2_token_intersect",
    f"""
WITH {DOCS_CTE}, {DICT_CTE},
topk AS (SELECT token FROM (
  SELECT token, ROW_NUMBER() OVER (PARTITION BY class_id
                                   ORDER BY df DESC, token ASC) AS rn
  FROM dict) WHERE rn <= 50)
SELECT DISTINCT d.class_id, d.token
FROM docs d WHERE d.token IN (SELECT token FROM topk)
""",
)
def f2_token_intersect(spark, sf_dir):
    docs = docs_from_lineitem(spark, sf_dir)
    topk = top_k_by_df(gather_dictionary(docs), 50).select("token")
    return (
        docs.join(F.broadcast(topk), "token", "left_semi")
        .select("class_id", "token")
        .distinct()
    )


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
    "d3_estep_theta_one_pass",
    f"""
WITH {_ESTEP_CTES}
SELECT doc_id, 'topic_' || CAST(topic_idx AS VARCHAR) AS topic,
       ROUND(th, 6) AS value
FROM theta
""",
)
def d3_estep_theta_one_pass(spark, sf_dir):
    docs, _, phi = _spark_phi(spark, sf_dir)
    out = estep.process_batches(
        docs,
        phi,
        num_document_passes=1,
        emit_nwt=False,
        emit_theta=True,
        compute_scores=False,
    )
    return _r6(estep.extract_theta(out, TOPICS), "value")


# ==================================================== D2: E-step nwt
@register(
    "d2_estep_nwt_one_pass",
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
)
SELECT '@default_class' AS class_id, token,
       'topic_' || CAST(topic_idx AS VARCHAR) AS topic,
       ROUND(SUM(weight * ptdw), 6) AS value
FROM p2n GROUP BY token, topic_idx
""",
)
def d2_estep_nwt_one_pass(spark, sf_dir):
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
    from bigartm_spark.model.phi import PhiMatrix

    return _r6(PhiMatrix("nwt", TOPICS, nwt).to_long(), "value")


# ==================================================== G5: one full EM pass
@register(
    "g5_em_one_pass_pwt",
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
       ROUND(GREATEST(v, 0) / SUM(GREATEST(v, 0)) OVER (PARTITION BY topic_idx), 6)
         AS value
FROM nwt1
""",
)
def g5_em_one_pass_pwt(spark, sf_dir):
    """The whole offline EM pass (G2 -> D4 -> D5) against the SQL oracle:
    the strongest end-to-end correctness check of the engine core."""
    from bigartm_spark.model.artm import ARTM

    docs = docs_from_lineitem(spark, sf_dir)
    model = ARTM(
        topic_names=list(TOPICS), num_document_passes=1, seed=SEED
    )
    model.initialize(gather_dictionary(docs))
    model.fit_offline(docs, num_collection_passes=1)
    return _r6(model.get_phi(), "value")


# ==================================================== F1: union merge
@register(
    "f1_union_merge",
    f"""
WITH {DOCS_CTE}, {DICT_CTE},
top50 AS (
  SELECT class_id, token FROM (
    SELECT class_id, token,
           ROW_NUMBER() OVER (PARTITION BY class_id
                              ORDER BY df DESC, token ASC) AS rn
    FROM dict) WHERE rn <= 50
),
t1 AS (SELECT UNNEST(range({N_TOPICS})) AS topic_idx),
rawa AS (SELECT d.class_id, d.token, topic_idx,
         {unit_uniform_sql("d.class_id", "d.token", "topic_idx", seed=1)} AS u
         FROM top50 d CROSS JOIN t1),
rawb AS (SELECT class_id, token, topic_idx,
         {unit_uniform_sql("class_id", "token", "topic_idx", seed=2)} AS u
         FROM dict CROSS JOIN t1),
na AS (SELECT class_id, token, topic_idx,
       u / SUM(u) OVER (PARTITION BY class_id, token) AS v FROM rawa),
nb AS (SELECT class_id, token, topic_idx,
       u / SUM(u) OVER (PARTITION BY class_id, token) AS v FROM rawb),
uni AS (
  SELECT class_id, token, topic_idx, 0.5 * v AS wv FROM na
  UNION ALL
  SELECT class_id, token, topic_idx, 2.0 * v AS wv FROM nb
)
SELECT class_id, token, 'topic_' || CAST(topic_idx AS VARCHAR) AS topic,
       ROUND(SUM(wv), 6) AS value
FROM uni GROUP BY class_id, token, topic_idx
""",
)
def f1_union_merge(spark, sf_dir):
    """MergeModel over DIFFERENT token sets (full outer union semantics)."""
    from bigartm_spark.model.phi import PhiMatrix

    docs = docs_from_lineitem(spark, sf_dir)
    d = gather_dictionary(docs)
    small = top_k_by_df(d, 50)
    a = PhiMatrix("a", TOPICS, _seeded_row_normalized_nwt(small, 1))
    b = PhiMatrix("b", TOPICS, _seeded_row_normalized_nwt(d, 2))
    merged = mstep.merge_nwt([(a, 0.5), (b, 2.0)], "m")
    return _r6(merged.to_long(), "value")


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
    model = ARTM(topic_names=list(TOPICS), seed=SEED)
    model.initialize(gather_dictionary(docs))
    model.reshape_topics(["topic_0", "topic_2", "topic_new"])
    return _r6(model.get_phi(), "value")


# ==================================================== F4: cooc anti-filter
@register(
    "f4_cooc_filter",
    f"""
WITH {DOCS_CTE}, {DICT_CTE},
kept AS (SELECT token FROM dict WHERE df >= 20),
pairs AS (
  SELECT a.doc_id,
         LEAST(a.token, b.token) AS token_a,
         GREATEST(a.token, b.token) AS token_b
  FROM docs a JOIN docs b
    ON a.doc_id = b.doc_id AND b.pos - a.pos BETWEEN 1 AND 2
  WHERE a.token <> b.token
)
SELECT token_a, token_b, CAST(COUNT(*) AS BIGINT) AS cooc_tf
FROM pairs
WHERE token_a IN (SELECT token FROM kept)
  AND token_b IN (SELECT token FROM kept)
GROUP BY token_a, token_b
""",
)
def f4_cooc_filter(spark, sf_dir):
    """Dictionary filter propagated to cooc pairs (both sides left-semi)."""
    from bigartm_spark.operators.cooc import cooc_gather
    from bigartm_spark.operators.dictionary import filter_dictionary

    docs = docs_from_lineitem(spark, sf_dir)
    kept = filter_dictionary(gather_dictionary(docs), min_df=20).select("token")
    cooc = cooc_gather(docs, window=2).select(
        "token_a", "token_b", F.col("cooc_tf").cast("long").alias("cooc_tf")
    )
    return (
        cooc.join(F.broadcast(kept), cooc.token_a == kept.token, "left_semi")
        .join(
            F.broadcast(kept.withColumnRenamed("token", "_t2")),
            F.col("token_b") == F.col("_t2"),
            "left_semi",
        )
    )


# ==================================================== B5: model membership
@register(
    "b5_token_membership",
    f"""
WITH {DOCS_CTE}, {DICT_CTE},
model_tokens AS (
  SELECT token FROM (
    SELECT token, ROW_NUMBER() OVER (PARTITION BY class_id
                                     ORDER BY df DESC, token ASC) AS rn
    FROM dict) WHERE rn <= 50
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS in_model_occurrences,
       ROUND(SUM(weight), 6) AS in_model_weight
FROM docs WHERE token IN (SELECT token FROM model_tokens)
GROUP BY doc_id
""",
)
def b5_token_membership(spark, sf_dir):
    """Left-semi join docs against the model token set (the E-step's
    token_index != -1 drop, processor_helpers.cc:221-227)."""
    docs = docs_from_lineitem(spark, sf_dir)
    model_tokens = top_k_by_df(gather_dictionary(docs), 50).select("token")
    out = (
        docs.join(F.broadcast(model_tokens), "token", "left_semi")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("in_model_occurrences"),
            F.sum("weight").alias("in_model_weight"),
        )
    )
    return _r6(out, "in_model_weight")


# ==================================================== E5: sparse-init rank
@register(
    "e5_sparse_init_ranking",
    f"""
WITH {DOCS_CTE}, {DICT_CTE},
r AS (SELECT class_id, token, tf,
             PERCENT_RANK() OVER (PARTITION BY class_id
                                  ORDER BY tf DESC, token ASC) AS pr
      FROM dict)
SELECT class_id, token, ROUND(pr, 6) AS tf_percent_rank,
       CAST(pr <= 0.5 AS INT) AS dense_init
FROM r
""",
)
def e5_sparse_init_ranking(spark, sf_dir):
    docs = docs_from_lineitem(spark, sf_dir)
    d = gather_dictionary(docs)
    w = Window.partitionBy("class_id").orderBy(F.desc("tf"), F.asc("token"))
    out = d.select(
        "class_id",
        "token",
        F.percent_rank().over(w).alias("tf_percent_rank"),
    ).withColumn(
        "dense_init", (F.col("tf_percent_rank") <= 0.5).cast("int")
    )
    return _r6(out, "tf_percent_rank")


# ==================================================== D7: perplexity
@register(
    "d7_perplexity_uniform_theta",
    f"""
WITH {DOCS_CTE}, {DICT_CTE}, {_phi_cte()},
j AS (
  SELECT d.doc_id, d.pos, d.weight, SUM(p.value / {N_TOPICS}) AS pwd
  FROM docs d
  JOIN phi p ON p.token = d.token AND p.class_id = d.class_id
  GROUP BY d.doc_id, d.pos, d.weight
)
SELECT ROUND(EXP(-SUM(weight * LN(pwd)) / SUM(weight)), 6) AS perplexity,
       ROUND(SUM(weight), 6) AS normalizer
FROM j
""",
)
def d7_perplexity_uniform_theta(spark, sf_dir):
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
        [(_pyr6(scores["perplexity"]), _pyr6(scores["perplexity_normalizer"]))],
        "perplexity double, normalizer double",
    )


# ==================================================== D8: sparsity phi
@register(
    "d8_sparsity_phi",
    f"""
WITH {DOCS_CTE}, {DICT_CTE}, {_phi_cte()},
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY class_id, token
                                   ORDER BY value DESC, topic_idx ASC) AS rn
      FROM phi),
sp AS (SELECT class_id, CASE WHEN rn <= 2 THEN value ELSE 0.0 END AS v FROM r)
SELECT class_id,
       ROUND(AVG(CASE WHEN v < 1e-37 THEN 1.0 ELSE 0.0 END), 6) AS sparsity,
       CAST(SUM(CASE WHEN v < 1e-37 THEN 1 ELSE 0 END) AS BIGINT) AS zero_count,
       CAST(COUNT(*) AS BIGINT) AS total_count
FROM sp GROUP BY class_id
""",
)
def d8_sparsity_phi(spark, sf_dir):
    _, _, phi = _spark_phi(spark, sf_dir)
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
    out = sparsified.groupBy("class_id").agg(
        F.avg(F.when(F.col("value") < 1e-37, 1.0).otherwise(0.0)).alias(
            "sparsity"
        ),
        F.sum(F.when(F.col("value") < 1e-37, 1).otherwise(0))
        .cast("long")
        .alias("zero_count"),
        F.count(F.lit(1)).alias("total_count"),
    )
    return _r6(out, "sparsity")


# ==================================================== D11: topic mass
@register(
    "d11_topic_mass",
    f"""
WITH {DOCS_CTE}, {DICT_CTE}, {_phi_cte()},
nwt AS (SELECT class_id, token, topic_idx, nwt AS value FROM rown),
pt AS (SELECT class_id, topic_idx,
              SUM(GREATEST(value, 0)) AS topic_mass
       FROM nwt GROUP BY class_id, topic_idx)
SELECT class_id, 'topic_' || CAST(topic_idx AS VARCHAR) AS topic,
       ROUND(topic_mass, 6) AS topic_mass,
       ROUND(topic_mass / SUM(topic_mass) OVER (PARTITION BY class_id), 6)
         AS topic_ratio
FROM pt
""",
)
def d11_topic_mass(spark, sf_dir):
    from bigartm_spark.model.phi import PhiMatrix
    from bigartm_spark.model.scores import topic_mass_phi

    docs = docs_from_lineitem(spark, sf_dir)
    d = gather_dictionary(docs)
    nwt = PhiMatrix("nwt", TOPICS, _seeded_row_normalized_nwt(d, SEED))
    return _r6(topic_mass_phi(nwt), "topic_mass", "topic_ratio")


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


# ==================================================== E3: theta snippet
@register(
    "e3_theta_snippet",
    f"""
WITH {_ESTEP_CTES},
first_docs AS (SELECT DISTINCT doc_id FROM docs ORDER BY doc_id LIMIT 10)
SELECT t.doc_id, 'topic_' || CAST(t.topic_idx AS VARCHAR) AS topic,
       ROUND(t.th, 6) AS value
FROM theta t JOIN first_docs f ON f.doc_id = t.doc_id
""",
)
def e3_theta_snippet(spark, sf_dir):
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
    theta = estep.extract_theta(out, TOPICS)
    return _r6(theta_snippet(theta, 10), "value")


# ==================================================== H1: smooth/sparse
@register(
    "h1_smooth_sparse_phi_delta",
    f"""
WITH {DOCS_CTE}, {DICT_CTE}, {_phi_cte()},
dictv AS (SELECT class_id, token,
                 tf / SUM(tf) OVER (PARTITION BY class_id) AS dv
          FROM dict)
SELECT p.class_id, p.token,
       'topic_' || CAST(p.topic_idx AS VARCHAR) AS topic,
       ROUND(-0.5 * d.dv, 6) AS delta
FROM phi p JOIN dictv d
  ON d.class_id = p.class_id AND d.token = p.token
""",
)
def h1_smooth_sparse_phi_delta(spark, sf_dir):
    """SmoothSparsePhi with dictionary coefficients: delta = tau * dict.value."""
    from bigartm_spark.model.regularizers import (
        RegularizeContext,
        SmoothSparsePhi,
    )

    docs = docs_from_lineitem(spark, sf_dir)
    d = gather_dictionary(docs)
    _, _, phi = _spark_phi(spark, sf_dir)
    reg = SmoothSparsePhi(tau=-0.5, use_dictionary=True)
    delta = reg.rwt_delta(phi, phi, RegularizeContext(dictionary=d))
    from bigartm_spark.model.phi import PhiMatrix

    out = PhiMatrix("r", TOPICS, delta).to_long().withColumnRenamed(
        "value", "delta"
    )
    return _r6(out, "delta")


@register(
    "h1b_log_transform_delta",
    f"""
WITH {DOCS_CTE}, {DICT_CTE}, {_phi_cte()},
dictv AS (SELECT class_id, token,
                 tf / SUM(tf) OVER (PARTITION BY class_id) AS dv
          FROM dict)
SELECT p.class_id, p.token,
       'topic_' || CAST(p.topic_idx AS VARCHAR) AS topic,
       ROUND(-0.5 * d.dv *
             (CASE WHEN p.value > 0 THEN ln(p.value) ELSE 0 END), 6) AS delta
FROM phi p JOIN dictv d
  ON d.class_id = p.class_id AND d.token = p.token
""",
)
def h1b_log_transform_delta(spark, sf_dir):
    """SmoothSparsePhi with the Logarithm TransformFunction
    (transform_function.cc:35-38): delta = tau * dict.value * ln(p_wt)."""
    from bigartm_spark.model.regularizers import (
        RegularizeContext,
        SmoothSparsePhi,
        TransformFunction,
    )

    docs = docs_from_lineitem(spark, sf_dir)
    d = gather_dictionary(docs)
    _, _, phi = _spark_phi(spark, sf_dir)
    reg = SmoothSparsePhi(
        tau=-0.5,
        use_dictionary=True,
        transform_function=TransformFunction("logarithm"),
    )
    delta = reg.rwt_delta(phi, phi, RegularizeContext(dictionary=d))
    from bigartm_spark.model.phi import PhiMatrix

    out = PhiMatrix("r", TOPICS, delta).to_long().withColumnRenamed(
        "value", "delta"
    )
    return _r6(out, "delta")


# ==================================================== H3: decorrelator
@register(
    "h3_decorrelator_phi_delta",
    f"""
WITH {DOCS_CTE}, {DICT_CTE}, {_phi_cte()},
rs AS (SELECT class_id, token, topic_idx, value,
              SUM(value) OVER (PARTITION BY class_id, token) AS rowsum
       FROM phi)
SELECT class_id, token, 'topic_' || CAST(topic_idx AS VARCHAR) AS topic,
       ROUND(-2.0 * value * (rowsum - value), 6) AS delta
FROM rs
""",
)
def h3_decorrelator_phi_delta(spark, sf_dir):
    from bigartm_spark.model.phi import PhiMatrix
    from bigartm_spark.model.regularizers import (
        DecorrelatorPhi,
        RegularizeContext,
    )

    _, _, phi = _spark_phi(spark, sf_dir)
    delta = DecorrelatorPhi(tau=2.0).rwt_delta(phi, phi, RegularizeContext())
    out = PhiMatrix("r", TOPICS, delta).to_long().withColumnRenamed(
        "value", "delta"
    )
    return _r6(out, "delta")


# ==================================================== H4: label reg
@register(
    "h4_label_regularization_delta",
    f"""
WITH {DOCS_CTE}, {DICT_CTE}, {_phi_cte()},
nt AS (SELECT class_id, topic_idx, SUM(value) AS n_t
       FROM phi GROUP BY class_id, topic_idx),
wt AS (SELECT p.class_id, p.token, p.topic_idx, p.value * n.n_t AS wv
       FROM phi p JOIN nt n
         ON n.class_id = p.class_id AND n.topic_idx = p.topic_idx),
den AS (SELECT class_id, token, SUM(wv) AS d
        FROM wt GROUP BY class_id, token)
SELECT w.class_id, w.token,
       'topic_' || CAST(w.topic_idx AS VARCHAR) AS topic,
       ROUND(CASE WHEN de.d > 0 THEN 1.5 * w.wv / de.d ELSE 0.0 END, 6)
         AS delta
FROM wt w JOIN den de
  ON de.class_id = w.class_id AND de.token = w.token
""",
)
def h4_label_regularization_delta(spark, sf_dir):
    from bigartm_spark.model import mstep
    from bigartm_spark.model.phi import PhiMatrix
    from bigartm_spark.model.regularizers import (
        LabelRegularizationPhi,
        RegularizeContext,
    )

    _, _, phi = _spark_phi(spark, sf_dir)
    ctx = RegularizeContext(topic_totals=mstep.topic_totals(phi))
    delta = LabelRegularizationPhi(tau=1.5).rwt_delta(phi, phi, ctx)
    out = PhiMatrix("r", TOPICS, delta).to_long().withColumnRenamed(
        "value", "delta"
    )
    return _r6(out, "delta")


# ==================================================== I4: items processed
@register(
    "i4_items_processed",
    f"""
WITH {DOCS_CTE}
SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS items,
       ROUND(SUM(weight), 6) AS token_weight
FROM docs
""",
)
def i4_items_processed(spark, sf_dir):
    docs, _, phi = _spark_phi(spark, sf_dir)
    out = estep.process_batches(
        docs, phi, num_document_passes=0, emit_nwt=False, compute_scores=True
    )
    scores = estep.extract_scores(out)
    return spark.createDataFrame(
        [(int(scores["items_processed"]), _pyr6(scores["token_weight"]))],
        "items bigint, token_weight double",
    )
