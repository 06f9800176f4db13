"""LLM-data-pipeline queries over documents/embeddings, oracle-checked.

Spark side: operators/{dedup,similarity,textstats}.py. Oracle side: the
same tokenization / hashing / float arithmetic expressed as DuckDB SQL —
list_filter/list_transform/list_reduce evaluate left-to-right exactly
like Spark's filter/transform/aggregate, so doubles match bit-for-bit
before the ROUND(6).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bigartm_spark.functions.hashing import char_hash_sql, int_uniform_sql
from bigartm_spark.operators import dedup, sampling, similarity, textstats
from bigartm_spark.plans.driver_queries import _r6, register

WORDS_SQL = "list_filter(string_split(text, ' '), w -> len(w) > 0)"

SHINGLES_CTE = f"""
docw AS (SELECT doc_id, {WORDS_SQL} AS ws FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
  FROM docw, UNNEST(range(1, GREATEST(len(ws) - 2, 0) + 1)) AS t(i)
)
""".strip()

def _minhash_sig_cte() -> str:
    """k permutations = md5 over seed-prefixed shingles, lexicographic min."""
    return f"""
{SHINGLES_CTE},
sig AS (
  SELECT doc_id, t.sig_idx,
         MIN(md5(CAST(t.sig_idx AS VARCHAR) || '|' || shingle)) AS minhash
  FROM sh, (SELECT UNNEST(range({dedup.MINHASH_K})) AS sig_idx) t
  GROUP BY doc_id, t.sig_idx
)
""".strip()


# ------------------------------------------------------------- dedup
@register(
    "dedup_exact",
    f"""
WITH doc_part AS (
  SELECT 'doc' AS part, md5(text) AS key,
         CAST(COUNT(*) AS BIGINT) AS n, MIN(doc_id) AS m
  FROM documents GROUP BY md5(text)
),
parts AS (SELECT doc_id, string_split(text, ' ') AS ps FROM documents),
lines AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS pos, ps[i] AS line
  FROM parts, UNNEST(range(1, len(ps) + 1)) AS t(i)
),
first AS (
  SELECT line, MIN(ROW(doc_id, pos)) AS f FROM lines
  WHERE length(line) >= 1 GROUP BY line
),
kept AS (
  SELECT l.doc_id, l.pos, l.line FROM lines l JOIN first fi ON l.line = fi.line
  WHERE ROW(l.doc_id, l.pos) = fi.f
  UNION ALL
  SELECT doc_id, pos, line FROM lines WHERE length(line) = 0
),
rebuilt AS (
  SELECT doc_id, string_agg(line, ' ' ORDER BY pos) AS text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
),
totals AS (SELECT doc_id, COUNT(*) AS n_lines FROM lines GROUP BY doc_id),
line_part AS (
  SELECT 'line' AS part,
         CAST(t.doc_id AS VARCHAR) || ':' || md5(COALESCE(r.text, '')) AS key,
         CAST(t.n_lines AS BIGINT) AS n,
         CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS m
  FROM totals t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
),
w AS (SELECT doc_id, {WORDS_SQL} AS ws FROM documents),
spans AS (
  SELECT doc_id, CAST(i AS INT) AS start_pos,
         array_to_string(ws[i:i+2], ' ') AS span
  FROM w, UNNEST(range(1, GREATEST(len(ws) - 1, 1))) AS t(i)
),
per AS (SELECT span, COUNT(DISTINCT doc_id) AS n_docs FROM spans GROUP BY span),
dup AS (
  SELECT s.doc_id, s.span FROM spans s JOIN per p ON s.span = p.span
  WHERE p.n_docs > 1
),
span_part AS (
  SELECT 'span' AS part, CAST(doc_id AS VARCHAR) AS key,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT span) AS BIGINT) AS m
  FROM dup GROUP BY doc_id
)
SELECT * FROM doc_part
UNION ALL SELECT * FROM line_part
UNION ALL SELECT * FROM span_part
""",
)
def dedup_exact(spark, sf_dir):
    """Tagged-union composite over the exact-dedup family — the driver
    registry sits at its 50-row cap, so the three operators share one
    row (VERDICT r4 next-round #3):

    - part 'doc'  — whole-document exact dedup (md5 groupBy);
    - part 'line' — C4-style global first-occurrence line dedup with
      text reassembly (operators/dedup.py line_dedup; sep=' ' because
      the synthetic documents are single-line — every word plays the
      role of a line, exercising the same explode -> min-struct ->
      join-back plan);
    - part 'span' — cross-document duplicate token spans (rolling-hash
      approximation of suffix-array substring dedup), aggregated per
      doc: n = dup-span occurrences, m = distinct dup spans. Spark
      counts distinct xxhash64 span hashes, the oracle distinct span
      texts — equal outside hash collisions.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    doc_part = dedup.exact_dedup(docs).select(
        F.lit("doc").alias("part"),
        F.col("text_md5").alias("key"),
        F.col("n_dups").cast("long").alias("n"),
        F.col("canonical_doc_id").cast("long").alias("m"),
    )
    ld = dedup.line_dedup(docs, sep=" ")
    line_part = ld.select(
        F.lit("line").alias("part"),
        F.concat_ws(
            ":", F.col("doc_id").cast("string"), F.md5("text")
        ).alias("key"),
        F.col("n_lines").cast("long").alias("n"),
        F.col("n_kept").cast("long").alias("m"),
    )
    spans = dedup.duplicate_spans(docs, span_tokens=3, stride=1)
    span_part = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_distinct("span_hash").cast("long").alias("m"),
    ).select(
        F.lit("span").alias("part"),
        F.col("doc_id").cast("string").alias("key"),
        "n",
        "m",
    )
    return doc_part.unionByName(line_part).unionByName(span_part)


@register(
    "dedup_minhash_signatures",
    f"""
WITH {_minhash_sig_cte()}
SELECT doc_id, CAST(sig_idx AS INT) AS sig_idx, minhash FROM sig
""",
)
def dedup_minhash_signatures(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.minhash_signatures(docs, hash_fn="md5")


@register(
    "dedup_lsh_candidates",
    f"""
WITH {_minhash_sig_cte()},
bands AS (
  SELECT doc_id, CAST(sig_idx // {dedup.LSH_BAND_SIZE} AS INT) AS band,
         STRING_AGG(CAST(minhash AS VARCHAR), ',' ORDER BY sig_idx) AS band_sig
  FROM sig GROUP BY doc_id, CAST(sig_idx // {dedup.LSH_BAND_SIZE} AS INT)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.band
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
""",
)
def dedup_lsh_candidates(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.lsh_candidate_pairs(docs, hash_fn="md5")


@register(
    "dedup_jaccard_verify",
    f"""
WITH {_minhash_sig_cte()},
bands AS (
  SELECT doc_id, CAST(sig_idx // {dedup.LSH_BAND_SIZE} AS INT) AS band,
         STRING_AGG(CAST(minhash AS VARCHAR), ',' ORDER BY sig_idx) AS band_sig
  FROM sig GROUP BY doc_id, CAST(sig_idx // {dedup.LSH_BAND_SIZE} AS INT)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
),
agree AS (
  SELECT c.doc_a, c.doc_b,
         SUM(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END) AS m
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.doc_a
  JOIN sig sb ON sb.doc_id = c.doc_b AND sb.sig_idx = sa.sig_idx
  GROUP BY c.doc_a, c.doc_b
),
keep AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 100),
shc AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN keep USING (shingle)),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shc GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
exact AS (
  SELECT doc_a, doc_b,
         CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.05
)
SELECT g.doc_a, g.doc_b,
       CAST(g.m AS DOUBLE) / {dedup.MINHASH_K} AS est_jaccard,
       ROUND(e.jaccard, 6) AS jaccard
FROM agree g JOIN exact e
  ON e.doc_a = g.doc_a AND e.doc_b = g.doc_b
""",
)
def dedup_jaccard_verify(spark, sf_dir):
    """The estimate->verify step of MinHash dedup as one driver row:
    signature-agreement Jaccard estimate over LSH candidate pairs joined
    with the exact n-gram Jaccard (df-capped inverted-index self-join)
    for the pairs both stages surface."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    est = dedup.minhash_jaccard_estimate(docs, hash_fn="md5")
    exact = _r6(
        dedup.ngram_jaccard_pairs(docs, threshold=0.05, max_shingle_df=100),
        "jaccard",
    )
    return est.join(exact, ["doc_a", "doc_b"])


@register(
    "dedup_cluster_canonicals",
    f"""
WITH RECURSIVE {_minhash_sig_cte()},
bands AS (
  SELECT doc_id, CAST(sig_idx // {dedup.LSH_BAND_SIZE} AS INT) AS band,
         STRING_AGG(CAST(minhash AS VARCHAR), ',' ORDER BY sig_idx) AS band_sig
  FROM sig GROUP BY doc_id, CAST(sig_idx // {dedup.LSH_BAND_SIZE} AS INT)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM cand
  UNION ALL SELECT doc_b, doc_a FROM cand
),
reach(doc_id, label) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.src, r.label FROM edges e JOIN reach r ON r.doc_id = e.dst
)
SELECT doc_id, MIN(label) AS canonical FROM reach GROUP BY doc_id
""",
)
def dedup_cluster_canonicals(spark, sf_dir):
    """Connected components over the MinHash-LSH candidate graph: the
    canonical (min doc_id) per duplicate cluster — min-label propagation
    on Spark vs a recursive reachability CTE in the oracle. Pairs come
    from lsh_unique_pairs (r9): the same candidate SET as the oracle's
    DISTINCT over band collisions, deduped map-side inside the band
    join instead of through a pair-sized distinct shuffle."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.dedup_clusters(
        dedup.lsh_unique_pairs(docs, hash_fn="md5"), assume_unique=True
    )


@register(
    "dedup_corpus_survivors",
    f"""
WITH RECURSIVE canon_exact AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
surv AS (
  SELECT d.* FROM documents d JOIN canon_exact USING (doc_id)
),
docw AS (SELECT doc_id, {WORDS_SQL} AS ws FROM surv),
sh AS (
  SELECT DISTINCT doc_id,
         ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
  FROM docw, UNNEST(range(1, GREATEST(len(ws) - 2, 0) + 1)) AS t(i)
),
sig AS (
  SELECT doc_id, t.sig_idx,
         MIN(md5(CAST(t.sig_idx AS VARCHAR) || '|' || shingle)) AS minhash
  FROM sh, (SELECT UNNEST(range({dedup.MINHASH_K})) AS sig_idx) t
  GROUP BY doc_id, t.sig_idx
),
bands AS (
  SELECT doc_id, CAST(sig_idx // {dedup.LSH_BAND_SIZE} AS INT) AS band,
         STRING_AGG(CAST(minhash AS VARCHAR), ',' ORDER BY sig_idx) AS band_sig
  FROM sig GROUP BY doc_id, CAST(sig_idx // {dedup.LSH_BAND_SIZE} AS INT)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM cand
  UNION ALL SELECT doc_b, doc_a FROM cand
),
reach(doc_id, label) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.src, r.label FROM edges e JOIN reach r ON r.doc_id = e.dst
),
drop_docs AS (
  SELECT doc_id FROM (
    SELECT doc_id, MIN(label) AS canonical FROM reach GROUP BY doc_id)
  WHERE doc_id <> canonical
)
SELECT s.doc_id, s.lang, s.source,
       CAST(s.n_chars AS BIGINT) AS n_chars
FROM surv s LEFT JOIN drop_docs dd ON dd.doc_id = s.doc_id
WHERE dd.doc_id IS NULL
""",
)
def dedup_corpus_survivors(spark, sf_dir):
    """End-to-end corpus cleaning: exact dedup then LSH-cluster
    canonical selection (deduplicate_corpus), metadata of survivors."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = dedup.deduplicate_corpus(docs, hash_fn="md5")
    return out.select(
        "doc_id", "lang", "source", F.col("n_chars").cast("long").alias("n_chars")
    )


@register(
    "contamination_check",
    f"""
WITH {SHINGLES_CTE},
probes AS (
  SELECT doc_id AS probe_id, text FROM documents WHERE doc_id < 3
),
pw AS (SELECT probe_id, {WORDS_SQL} AS ws FROM probes),
psh AS (
  SELECT DISTINCT probe_id,
         ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
  FROM pw, UNNEST(range(1, GREATEST(len(ws) - 2, 0) + 1)) AS t(i)
)
SELECT sh.doc_id, psh.probe_id,
       CAST(COUNT(*) AS BIGINT) AS n_shared_shingles
FROM sh JOIN psh USING (shingle)
GROUP BY sh.doc_id, psh.probe_id
""",
)
def contamination_check(spark, sf_dir):
    """Benchmark decontamination: n-gram overlap of every document
    against a probe set (here: docs 0-2 standing in for an eval set)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    probes = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("probe_id"), "text"
    )
    return dedup.contamination_check(docs, probes)


_HEX16_SQL = (
    "(strpos('0123456789abcdef', substr(md5(word), 1, 1)) - 1) * 4096 + "
    "(strpos('0123456789abcdef', substr(md5(word), 2, 1)) - 1) * 256 + "
    "(strpos('0123456789abcdef', substr(md5(word), 3, 1)) - 1) * 16 + "
    "(strpos('0123456789abcdef', substr(md5(word), 4, 1)) - 1)"
)


def _simhash_sql(bits: int = 16) -> str:
    votes = ", ".join(
        f"SUM(((h >> {b}) & 1) * 2 - 1) AS v{b}" for b in range(bits)
    )
    simexpr = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(bits)
    )
    return f"""
WITH w AS (
  SELECT doc_id, UNNEST({WORDS_SQL}) AS word FROM documents
),
h AS (SELECT doc_id, CAST({_HEX16_SQL} AS BIGINT) AS h FROM w),
v AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id)
SELECT doc_id, CAST({simexpr} AS BIGINT) AS simhash FROM v
""".strip()


@register("dedup_simhash", _simhash_sql())
def dedup_simhash(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.simhash(docs, hash_fn="md5")


# ------------------------------------------------------------- similarity
_DOT_SQL = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(range(1, len({a}) + 1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), (acc, x) -> acc + x)"
)


def _cos_sql(a: str, b: str) -> str:
    return (
        f"({_DOT_SQL.format(a=a, b=b)}) / "
        f"(SQRT({_DOT_SQL.format(a=a, b=a)}) * SQRT({_DOT_SQL.format(a=b, b=b)}))"
    )


@register(
    "ann_topk_composite",
    f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
s AS (
  SELECT vec_id, label, {_cos_sql('embedding', 'qe')} AS cosine
  FROM embeddings, q WHERE vec_id <> 0
),
g AS (SELECT *, ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id ASC) AS rank
      FROM s),
pl AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY label
                                    ORDER BY cosine DESC, vec_id ASC) AS rank
       FROM s)
SELECT 'global' AS scope, vec_id, label, ROUND(cosine, 6) AS cosine,
       CAST(rank AS BIGINT) AS rank
FROM g WHERE rank <= 10
UNION ALL
SELECT 'per_label' AS scope, vec_id, label, ROUND(cosine, 6) AS cosine,
       CAST(rank AS BIGINT) AS rank
FROM pl WHERE rank <= 3
""",
)
def ann_topk_composite(spark, sf_dir):
    """Brute-force cosine top-k (global TakeOrderedAndProject) and
    per-label kNN (window top-k) for the same query vector, one driver
    row — the two exact-search baselines the ANN paths are measured
    against."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    g = (
        _r6(similarity.brute_force_topk(emb, query_id=0, k=10), "cosine")
        .withColumn("scope", F.lit("global"))
        .select("scope", "vec_id", "label", "cosine", "rank")
    )
    pl = (
        _r6(similarity.knn_per_label(emb, query_id=0, k=3), "cosine")
        .withColumn("scope", F.lit("per_label"))
        .select("scope", "vec_id", "label", "cosine", "rank")
    )
    return g.unionByName(pl)


_BUCKET_SQL = " + ".join(
    f"(CASE WHEN embedding[{b + 1}] > 0 THEN {1 << b} ELSE 0 END)"
    for b in range(4)
)


@register(
    "ann_lsh_bucketed_topk",
    f"""
WITH be AS (
  SELECT vec_id, label, embedding, CAST({_BUCKET_SQL} AS INT) AS bucket
  FROM embeddings
),
q AS (SELECT embedding AS qe, bucket AS qb FROM be WHERE vec_id = 0),
s AS (
  SELECT vec_id, label, bucket, {_cos_sql('embedding', 'qe')} AS cosine
  FROM be, q WHERE vec_id <> 0 AND bucket = qb
),
r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id ASC) AS rank
      FROM s)
SELECT vec_id, label, bucket, ROUND(cosine, 6) AS cosine,
       CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 5
""",
)
def ann_lsh_bucketed_topk(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return _r6(similarity.lsh_bucketed_topk(emb, query_id=0, k=5), "cosine")


@register(
    "embedding_near_dup_pairs",
    f"""
WITH be AS (
  SELECT vec_id, embedding, CAST({_BUCKET_SQL} AS INT) AS bucket
  FROM embeddings
),
pairs AS (
  SELECT a.bucket, a.vec_id AS vec_a, b.vec_id AS vec_b,
         {_cos_sql('a.embedding', 'b.embedding')} AS cosine
  FROM be a JOIN be b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT bucket, vec_a, vec_b, ROUND(cosine, 6) AS cosine
FROM pairs WHERE cosine >= 0.3
""",
)
def embedding_near_dup_pairs(spark, sf_dir):
    """Near-dup pairs blocked by sign-LSH bucket (not label): candidate
    generation is sum(|bucket|²), the scale-safe shape. bits=4 pinned
    explicitly — the oracle SQL above hardcodes the 4-bit bucket, and
    the operator's default now derives bits from the corpus size."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return _r6(
        similarity.near_dup_pairs_lsh(emb, threshold=0.3, bits=4), "cosine"
    )


@register(
    "ann_kmeans_seed",
    f"""
WITH q AS (SELECT embedding AS c0 FROM embeddings
           WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)),
s AS (
  SELECT vec_id,
         (1.0 - ({_cos_sql('embedding', 'c0')}))
           * (1.0 - ({_cos_sql('embedding', 'c0')})) AS d2,
         {int_uniform_sql('vec_id', '0')} AS u
  FROM embeddings, q
),
tot AS (SELECT SUM(d2) AS t FROM s)
SELECT vec_id, ROUND(d2, 6) AS d2, ROUND(u, 6) AS u,
       CAST(u < 16 * d2 / (SELECT t FROM tot) AS INT) AS picked
FROM s
""",
)
def ann_kmeans_seed(spark, sf_dir):
    """k-means|| (Bahmani et al., VLDB'12) round-0 scoring + selection:
    the portable (vec_id, round)-keyed MINSTD uniform and the
    oversampled selection predicate, replayed exactly in SQL."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return _r6(similarity.kmeans_seed_round0(emb, k=8, oversample=2.0), "d2", "u")


_CENTROID_CTE = """
cents AS (
  SELECT CAST(vec_id AS INT) AS cell_id, embedding AS centroid
  FROM embeddings WHERE vec_id < 8
)
""".strip()


@register(
    "ann_ivf_assign",
    f"""
WITH {_CENTROID_CTE},
s AS (
  SELECT e.vec_id, e.label, c.cell_id,
         {_cos_sql('e.embedding', 'c.centroid')} AS sim
  FROM embeddings e CROSS JOIN cents c
),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY sim DESC, cell_id ASC) AS rn
      FROM s)
SELECT vec_id, label, cell_id, ROUND(sim, 6) AS centroid_sim
FROM r WHERE rn = 1
""",
)
def ann_ivf_assign(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = similarity.seed_centroids(emb, 8)
    return _r6(similarity.ivf_assign(emb, cents), "centroid_sim")


@register(
    "ann_ivf_index_probe",
    f"""
WITH {_CENTROID_CTE},
s AS (
  SELECT e.vec_id, e.label, e.embedding, c.cell_id,
         {_cos_sql('e.embedding', 'c.centroid')} AS sim
  FROM embeddings e CROSS JOIN cents c
),
assigned AS (
  SELECT vec_id, label, embedding, cell_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY sim DESC, cell_id ASC) AS rn
    FROM s) WHERE rn = 1
),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
qcell AS (
  SELECT cell_id FROM (
    SELECT c.cell_id, {_cos_sql('c.centroid', 'qe')} AS sim
    FROM cents c, q
    ORDER BY sim DESC, cell_id ASC LIMIT 2)
),
cand AS (
  SELECT a.vec_id, a.label, a.cell_id,
         {_cos_sql('a.embedding', 'qe')} AS cosine
  FROM assigned a, q
  WHERE a.cell_id IN (SELECT cell_id FROM qcell) AND a.vec_id <> 0
),
r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id ASC) AS rank
      FROM cand)
SELECT vec_id, label, CAST(cell_id AS INT) AS cell_id,
       ROUND(cosine, 6) AS cosine, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 5
""",
)
def ann_ivf_index_probe(spark, sf_dir):
    """Persistent IVF index (build-once store partitioned by cell_id,
    similarity.py ivf_build_index/ivf_query_index) replayed end-to-end:
    build with the deterministic seed centroids, then a 2-probe query
    whose scan reads ONLY the probed cell directories (PartitionFilters
    — the pruned-scan path pinned in test_similarity_ivf). Replaces the
    ephemeral ann_ivf_topk registry row (that path is the same assign +
    probe + topk machinery, still covered by tests/test_similarity_ivf
    and the ann_ivf_assign/refine rows) to keep the registry at the
    50-row driver cap."""
    import hashlib
    import tempfile

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = similarity.seed_centroids(emb, 8)
    # md5, not hash(): Python string hashing is salted per process, so
    # hash() would mint a new never-cleaned index dir every run instead
    # of reusing the build-once store
    digest = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    idx = os.path.join(tempfile.gettempdir(), f"bigartm_ivf_idx_{digest}")
    similarity.ivf_build_index(emb, idx, centroids=cents)
    out = similarity.ivf_query_index(spark, idx, query_id=0, k=5, n_probe=2)
    return _r6(out.withColumn("cell_id", F.col("cell_id").cast("int")), "cosine")


@register(
    "ann_ivf_refine",
    f"""
WITH {_CENTROID_CTE},
s AS (
  SELECT e.vec_id, e.embedding, c.cell_id,
         {_cos_sql('e.embedding', 'c.centroid')} AS sim
  FROM embeddings e CROSS JOIN cents c
),
assigned AS (
  SELECT vec_id, embedding, cell_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY sim DESC, cell_id ASC) AS rn
    FROM s) WHERE rn = 1
)
SELECT cell_id, CAST(t.i AS INT) AS dim_idx,
       ROUND(AVG(CAST(embedding[t.i] AS DOUBLE)), 6) AS value
FROM assigned, UNNEST(range(1, 65)) AS t(i)
GROUP BY cell_id, t.i
""",
)
def ann_ivf_refine(spark, sf_dir):
    """One Lloyd iteration (ivf_refine_centroids): per-cell mean of the
    assigned vectors, long (cell_id, dim_idx, value) layout so the hash
    compare sees scalars, not array formatting."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = similarity.seed_centroids(emb, 8)
    refined = similarity.ivf_refine_centroids(emb, cents, iterations=1)
    out = refined.select(
        "cell_id",
        F.posexplode("centroid").alias("_i", "value"),
    ).select(
        "cell_id",
        (F.col("_i") + 1).cast("int").alias("dim_idx"),
        "value",
    )
    return _r6(out, "value")


# ------------------------------------------------------------- textstats
@register(
    "text_stats_composite",
    f"""
WITH m AS (
  SELECT doc_id,
         CAST(len({WORDS_SQL}) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct({WORDS_SQL})) AS BIGINT) AS n_distinct_tokens,
         CAST(len(text) AS BIGINT) AS n_chars_measured,
         CAST(len(regexp_extract_all(text,
              '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_pieces,
         md5(text) AS fp, {char_hash_sql('text')} AS fp_rolling
  FROM documents
)
SELECT doc_id, n_tokens, n_distinct_tokens, n_chars_measured,
       n_pieces, n_tokens AS n_words,
       ROUND(CASE WHEN n_tokens > 0
                  THEN CAST(n_pieces AS DOUBLE) / n_tokens ELSE 0.0 END, 6)
         AS pieces_per_word,
       fp, fp_rolling
FROM m
""",
)
def text_stats_composite(spark, sf_dir):
    """Token counting, BPE-ish piece counting, and document fingerprinting
    (md5 + rolling hash) as ONE per-doc row — three textstats operators,
    one scan, all whole-stage-codegen column expressions."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tc = textstats.token_count(docs)
    bpe = textstats.bpe_ish_tokens(docs).select(
        "doc_id", "n_pieces", "n_words", "pieces_per_word"
    )
    fp = textstats.fingerprint(docs).select("doc_id", "fp", "fp_rolling")
    out = tc.join(bpe, "doc_id").join(fp, "doc_id")
    return _r6(out, "pieces_per_word")


def _lang_quality_sql() -> str:
    langs = sorted(textstats.LANG_STOPWORDS)
    score_exprs = []
    for lang in langs:
        sw = ", ".join(f"'{w}'" for w in textstats.LANG_STOPWORDS[lang])
        score_exprs.append(
            f"CAST(len(list_filter(ws, w -> list_contains([{sw}], w))) AS DOUBLE)"
            f" / len(ws) AS score_{lang}"
        )
    mx = "GREATEST(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    whens = " ".join(
        f"WHEN score_{lang} = {mx} AND {mx} > 0 THEN '{lang}'" for lang in langs
    )
    rounded = ", ".join(
        f"ROUND(sc.score_{lang}, 6) AS score_{lang}" for lang in langs
    )
    return f"""
WITH docw AS (SELECT doc_id, {WORDS_SQL} AS ws FROM documents),
sc AS (SELECT doc_id, {', '.join(score_exprs)} FROM docw),
m AS (
  SELECT doc_id,
         CAST(len(ws) AS DOUBLE) AS n_words,
         CASE WHEN len(ws) > 0
              THEN CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws)
              ELSE 0.0 END AS distinct_ratio,
         CASE WHEN len(ws) > 0
              THEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                     list_transform(ws, w -> CAST(len(w) AS DOUBLE))),
                     (a, x) -> a + x) / len(ws)
              ELSE 0.0 END AS mean_word_len
  FROM docw
)
SELECT m.doc_id, {rounded},
       CASE {whens} ELSE 'und' END AS predicted_lang,
       ROUND(m.n_words, 6) AS n_words,
       ROUND(m.distinct_ratio, 6) AS distinct_ratio,
       ROUND(m.mean_word_len, 6) AS mean_word_len,
       ROUND(0.4 * LEAST(m.n_words / 100.0, 1.0)
             + 0.3 * m.distinct_ratio
             + 0.3 * LEAST(m.mean_word_len / 8.0, 1.0), 6) AS quality
FROM m JOIN sc ON sc.doc_id = m.doc_id
""".strip()


@register("text_lang_quality", _lang_quality_sql())
def text_lang_quality(spark, sf_dir):
    """Language-ID (stopword-ratio argmax) and the quality heuristic as
    one per-doc row — the two per-document classifiers a cleaning
    pipeline always runs together, one scan, all codegen."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = textstats.lang_id(docs).join(textstats.quality_score(docs), "doc_id")
    return _r6(
        out,
        *[f"score_{lang}" for lang in sorted(textstats.LANG_STOPWORDS)],
        "n_words",
        "distinct_ratio",
        "mean_word_len",
        "quality",
    )


@register(
    "text_tokenize_corpus",
    f"""
WITH docw AS (SELECT doc_id, {WORDS_SQL} AS ws FROM documents),
ex AS (SELECT doc_id, UNNEST(ws) AS token FROM docw),
counts AS (
  SELECT doc_id, token, CAST(COUNT(*) AS DOUBLE) AS weight
  FROM ex GROUP BY doc_id, token
)
SELECT doc_id, CAST(doc_id AS VARCHAR) AS title,
       CAST(doc_id % 16 AS VARCHAR) AS batch_id,
       '@default_class' AS class_id, token, weight,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY token) AS INT)
         AS pos
FROM counts
""",
)
def text_tokenize_corpus(spark, sf_dir):
    """documents.text -> long bag-of-words docs view (the real-text A3
    parse; ARTM fits directly on this relation)."""
    from bigartm_spark.corpus import docs_from_documents

    return docs_from_documents(spark, sf_dir).drop(
        "transaction_id", "transaction_typename"
    )


@register(
    "corpus_quality_filter",
    f"""
WITH docw AS (SELECT doc_id, lang, {WORDS_SQL} AS ws FROM documents),
m AS (
  SELECT doc_id, lang,
         CAST(len(ws) AS DOUBLE) AS n_words,
         CASE WHEN len(ws) > 0
              THEN CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws)
              ELSE 0.0 END AS distinct_ratio,
         CASE WHEN len(ws) > 0
              THEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                     list_transform(ws, w -> CAST(len(w) AS DOUBLE))),
                     (a, x) -> a + x) / len(ws)
              ELSE 0.0 END AS mean_word_len
  FROM docw
),
q AS (
  SELECT doc_id, lang,
         0.4 * LEAST(n_words / 100.0, 1.0)
         + 0.3 * distinct_ratio
         + 0.3 * LEAST(mean_word_len / 8.0, 1.0) AS quality
  FROM m
)
SELECT doc_id, lang, ROUND(quality, 6) AS quality
FROM q WHERE quality >= 0.5 AND lang = 'en'
""",
)
def corpus_quality_filter(spark, sf_dir):
    """The select step of a training pipeline: keep docs passing the
    quality heuristic AND a language gate (quality_score + metadata
    filter compose as plain relational ops; the filter pushes down)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = textstats.quality_score(docs).select("doc_id", "quality")
    out = (
        docs.select("doc_id", "lang")
        .join(q, "doc_id")
        .filter((F.col("quality") >= 0.5) & (F.col("lang") == "en"))
    )
    return _r6(out.select("doc_id", "lang", "quality"), "quality")




# ------------------------------------------------------------- sampling
# weights/fractions chosen to be exactly representable doubles so the
# cumulative thresholds are literal-identical in both engines
_SPLIT_WEIGHTS = {"train": 0.5, "val": 0.25, "test": 0.25}
_SAMPLE_FRACTIONS = {"src0": 0.75, "src3": 0.5, "src7": 0.25}
_MIX_TARGETS = {"src0": 0.5, "src1": 0.3, "src2": 0.2}


_PACK_BUDGET = 256
_PACK_SHARDS = 8


def _split_sample_sql() -> str:
    u_split = int_uniform_sql("doc_id", str(sampling.SPLIT_SALT))
    u_sample = int_uniform_sql("doc_id", str(sampling.SAMPLE_SALT))
    names = list(_SPLIT_WEIGHTS)
    total = float(sum(_SPLIT_WEIGHTS.values()))
    whens, cum = [], 0.0
    for name in names[:-1]:
        cum += float(_SPLIT_WEIGHTS[name]) / total
        whens.append(f"WHEN u_split < {cum!r} THEN '{name}'")
    split_case = f"CASE {' '.join(whens)} ELSE '{names[-1]}' END"
    rate_whens = " ".join(
        f"WHEN source = '{s}' THEN {float(f)!r}"
        for s, f in sorted(_SAMPLE_FRACTIONS.items())
    )
    return f"""
WITH u AS (
  SELECT doc_id, source, {u_split} AS u_split, {u_sample} AS u_sample,
         CAST(len({WORDS_SQL}) AS BIGINT) AS n_tokens
  FROM documents
),
sh AS (
  SELECT *, CAST(doc_id % {_PACK_SHARDS} AS BIGINT) AS shard FROM u
),
ofs AS (
  SELECT *,
         CAST(COALESCE(SUM(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_offset
  FROM sh
)
SELECT doc_id, source, {split_case} AS split,
       CAST(u_sample < (CASE {rate_whens} ELSE 0.0 END) AS INT) AS in_sample,
       shard, start_offset,
       start_offset + n_tokens AS end_offset,
       shard * {1 << 32} + CAST(FLOOR(start_offset / {_PACK_BUDGET}) AS BIGINT)
         AS pack_id,
       CAST(CASE WHEN n_tokens > 0 THEN
              CAST(FLOOR((start_offset + n_tokens - 1) / {_PACK_BUDGET}) AS BIGINT)
                > CAST(FLOOR(start_offset / {_PACK_BUDGET}) AS BIGINT)
            ELSE FALSE END AS INT) AS crosses_boundary
FROM ofs
""".strip()


@register("sample_split_pack", _split_sample_sql())
def sample_split_pack(spark, sf_dir):
    """The corpus-to-shards layout plan as one per-doc row: deterministic
    train/val/test hash-split, per-stratum Bernoulli sample flag, and the
    GPT-style concat-and-chunk sequence packing (shard, token offsets,
    pack id, boundary flag). The coins are the portable integer-keyed
    MINSTD generator and the packing is one per-shard window cumsum —
    laying out 100 TB is one scan plus one shard-keyed shuffle."""
    from bigartm_spark.operators.packing import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.select("doc_id", "source")
    s = sampling.hash_split(base, _SPLIT_WEIGHTS)
    kept = sampling.stratified_sample(base, _SAMPLE_FRACTIONS).select(
        "doc_id", F.lit(1).alias("in_sample")
    )
    toks = textstats.token_count(docs).select("doc_id", "n_tokens")
    packed = pack_sequences(
        toks, budget=_PACK_BUDGET, n_shards=_PACK_SHARDS
    )
    return (
        s.join(kept, "doc_id", "left")
        .withColumn("in_sample", F.coalesce("in_sample", F.lit(0)).cast("int"))
        .join(packed, "doc_id")
        .select(
            "doc_id",
            "source",
            "split",
            "in_sample",
            "shard",
            "start_offset",
            "end_offset",
            "pack_id",
            "crosses_boundary",
        )
    )


def _mixture_sql() -> str:
    u = int_uniform_sql("d.doc_id", str(sampling.MIXTURE_SALT))
    targets = sorted(_MIX_TARGETS.items())
    tot = float(sum(w for _, w in targets))
    values = ", ".join(
        f"('{s}', CAST({float(w) / tot!r} AS DOUBLE))" for s, w in targets
    )
    in_list = ", ".join(f"'{s}'" for s, _ in targets)
    return f"""
WITH tw(source, p) AS (VALUES {values}),
cnt AS (
  SELECT source, COUNT(*) AS n_rows FROM documents
  WHERE source IN ({in_list}) GROUP BY source
),
r AS (
  SELECT c.source, c.n_rows, t.p,
         CAST(c.n_rows AS DOUBLE) / t.p AS ratio
  FROM cnt c JOIN tw t USING (source)
),
rates AS (
  SELECT source,
         LEAST((SELECT MIN(ratio) FROM r) * p / CAST(n_rows AS DOUBLE), 1.0)
           AS keep_rate
  FROM r
)
SELECT d.doc_id, d.source
FROM documents d JOIN rates USING (source)
WHERE {u} < keep_rate
""".strip()


@register("sample_domain_mixture", _mixture_sql())
def sample_domain_mixture(spark, sf_dir):
    """Domain-mixture resampling: learn per-stratum keep-rates from one
    K-row count aggregate (K = #domains) so the surviving corpus matches
    the target web:books:code-style mixture by downsampling only, then
    apply the deterministic coin filter. Two jobs at any scale."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    out = sampling.domain_mixture_resample(docs, _MIX_TARGETS)
    return out.select("doc_id", "source")


def _repetition_pii_sql() -> str:
    email, ipv4 = textstats.PII_EMAIL, textstats.PII_IPV4
    phone, digits = textstats.PII_PHONE, textstats.PII_LONG_DIGITS
    return f"""
WITH docw AS (SELECT doc_id, {WORDS_SQL} AS ws FROM documents),
bg AS (
  SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bigram
  FROM docw, UNNEST(range(1, GREATEST(len(ws) - 1, 0) + 1)) AS t(i)
),
bc AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY doc_id, bigram),
rep AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
         CAST(COUNT(*) AS BIGINT) AS n_distinct_bigrams,
         CAST(MAX(c) AS BIGINT) AS top_bigram_count
  FROM bc GROUP BY doc_id
),
pii AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '{email}')) AS BIGINT) AS n_emails,
         CAST(len(regexp_extract_all(text, '{ipv4}')) AS BIGINT) AS n_ipv4,
         CAST(len(regexp_extract_all(text, '{phone}')) AS BIGINT) AS n_phones,
         CAST(len(regexp_extract_all(text, '{digits}')) AS BIGINT)
           AS n_long_digit_runs
  FROM documents
)
SELECT p.doc_id,
       COALESCE(r.n_bigrams, 0) AS n_bigrams,
       COALESCE(r.n_distinct_bigrams, 0) AS n_distinct_bigrams,
       COALESCE(r.top_bigram_count, 0) AS top_bigram_count,
       ROUND(CASE WHEN COALESCE(r.n_bigrams, 0) > 0
             THEN CAST(r.top_bigram_count AS DOUBLE) / r.n_bigrams
             ELSE 0.0 END, 6) AS top_bigram_frac,
       ROUND(CASE WHEN COALESCE(r.n_bigrams, 0) > 0
             THEN CAST(r.n_distinct_bigrams AS DOUBLE) / r.n_bigrams
             ELSE 0.0 END, 6) AS distinct_bigram_ratio,
       p.n_emails, p.n_ipv4, p.n_phones, p.n_long_digit_runs,
       CAST(p.n_emails + p.n_ipv4 + p.n_phones + p.n_long_digit_runs > 0
            AS INT) AS has_pii
FROM pii p LEFT JOIN rep r ON r.doc_id = p.doc_id
""".strip()


@register("text_repetition_pii", _repetition_pii_sql())
def text_repetition_pii(spark, sf_dir):
    """Gopher-style bigram repetition signals joined with the PII scan —
    the two remaining per-doc quality columns of a cleaning pipeline,
    one driver row."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rep = textstats.repetition_signals(docs)
    pii = textstats.pii_scan(docs)
    out = pii.join(rep, "doc_id")
    return _r6(out, "top_bigram_frac", "distinct_bigram_ratio").select(
        "doc_id",
        "n_bigrams",
        "n_distinct_bigrams",
        "top_bigram_count",
        "top_bigram_frac",
        "distinct_bigram_ratio",
        "n_emails",
        "n_ipv4",
        "n_phones",
        "n_long_digit_runs",
        "has_pii",
    )


@register(
    "semantic_dedup_survivors",
    f"""
WITH {_CENTROID_CTE},
s AS (
  SELECT e.vec_id, e.label, c.cell_id,
         {_cos_sql('e.embedding', 'c.centroid')} AS sim
  FROM embeddings e CROSS JOIN cents c
),
assigned AS (
  SELECT vec_id, label, cell_id, sim FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY sim DESC, cell_id ASC) AS rn
    FROM s) WHERE rn = 1
),
ae AS (
  SELECT a.vec_id, a.cell_id, e.embedding
  FROM assigned a JOIN embeddings e USING (vec_id)
),
pairs AS (
  SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
         {_cos_sql('x.embedding', 'y.embedding')} AS cosine
  FROM ae x JOIN ae y ON x.cell_id = y.cell_id AND x.vec_id < y.vec_id
),
drops AS (SELECT DISTINCT vec_b FROM pairs WHERE cosine >= 0.3)
SELECT a.vec_id, a.label, a.cell_id, ROUND(a.sim, 6) AS centroid_sim
FROM assigned a LEFT JOIN drops d ON d.vec_b = a.vec_id
WHERE d.vec_b IS NULL
""",
)
def semantic_dedup_survivors(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023): k-means-cell-blocked semantic
    near-dup removal — survivors after dropping every vector with a
    more-canonical neighbor at cosine >= 0.3 inside its cell."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = similarity.seed_centroids(emb, 8)
    return _r6(similarity.semantic_dedup(emb, cents, threshold=0.3), "centroid_sim")
