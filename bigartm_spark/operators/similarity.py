"""Similarity search over embedding columns (array<float>).

Production scoring is Arrow-batched numpy in ``mapInPandas`` — Spark's
higher-order array functions (``aggregate``/``zip_with``) are NOT
whole-stage-codegen'd, so a HOF dot product is an interpreted
per-element loop (r1 bench: 290× slower than the oracle). The numpy
kernels below vectorize over the rows of each Arrow batch while looping
over the (small, fixed) embedding dimension, accumulating LEFT-TO-RIGHT
in float64 — the exact evaluation order of Spark's ``aggregate`` and
DuckDB's ``list_reduce`` — so results stay bit-for-bit identical to the
SQL oracles before rounding.

Topology per operator:
- brute-force cosine top-k: one mapInPandas scan, then a distributed
  TakeOrderedAndProject (orderBy+limit — per-partition top-k, no global
  sort); the rank column is a window over the k surviving rows only.
- sign-LSH bucketed variant: the 100TB path — candidates restricted to
  the query's bucket via a pushable literal predicate; at scale the
  bucket column is a partition/cluster key so the scan itself prunes.
- IVF: centroids are collected to the driver (bounded by construction:
  |cells| ≪ |vectors|); assignment and probe-cell scoring happen in a
  single mapInPandas pass — no crossJoin row blow-up, no per-vector
  window shuffle.
- near-dup pairs: blocked by LSH bucket (never all-pairs), pair scoring
  via the same numpy kernel.

The Column helpers ``dot``/``norm``/``cosine`` keep the HOF form for
small expressions and tests; hot paths must use the kernels.
"""

from __future__ import annotations

import math
from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from bigartm_spark.functions.hashing import int_uniform_np


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# ---------------------------------------------------------------- kernels
def _lr_dot(E: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Row-wise dot(E[i], q), accumulated left-to-right over the dim axis
    (each step is one IEEE float64 mul + add per row — the same op
    sequence as aggregate/list_reduce, vectorized across rows)."""
    acc = np.zeros(E.shape[0], dtype=np.float64)
    for j in range(E.shape[1]):
        acc = acc + E[:, j] * q[j]
    return acc


def _lr_sq_norm(E: np.ndarray) -> np.ndarray:
    acc = np.zeros(E.shape[0], dtype=np.float64)
    for j in range(E.shape[1]):
        acc = acc + E[:, j] * E[:, j]
    return acc


def _lr_scalar_sq_norm(q: np.ndarray) -> float:
    acc = 0.0
    for x in q:
        acc = acc + float(x) * float(x)
    return acc


def _stack(col: pd.Series) -> np.ndarray:
    return np.stack(col.to_numpy()).astype(np.float64)


def _collect_vec(embeddings: DataFrame, vec_id: int) -> np.ndarray:
    """One-row lookup of the query vector (pushable vec_id predicate)."""
    row = embeddings.filter(F.col("vec_id") == vec_id).select("embedding").first()
    if row is None:
        raise ValueError(f"vec_id {vec_id} not found")
    return np.asarray(row["embedding"], dtype=np.float64)


def _keep_schema(df: DataFrame, keep: Sequence[str], out: str) -> StructType:
    fields = [df.schema[c] for c in keep]
    return StructType(list(fields) + [StructField(out, DoubleType(), True)])


def cosine_score_col(vec_col: str, qvec: np.ndarray):
    """JVM-side cosine(vec_col, literal query): zip_with product +
    left-to-right F.aggregate sum in double — the SAME operation order
    as the numpy kernel's _lr_dot/_lr_sq_norm, so values are
    bit-identical, but the whole expression runs inside whole-stage
    codegen: no Python workers, no Arrow transfer. The literal query
    array is constant-folded once by Catalyst. Single-query scoring is
    JVM-bound at any scale; the mapInPandas path below stays for
    many-pair/batched scoring where numpy's SIMD wins."""
    q = [float(x) for x in np.asarray(qvec, dtype=np.float64)]
    q_norm = math.sqrt(_lr_scalar_sq_norm(np.asarray(q)))
    qlit = F.array(*[F.lit(x) for x in q])
    e = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(e, qlit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = F.sqrt(
        F.aggregate(
            F.transform(e, lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return dot / (nrm * F.lit(q_norm))


def cosine_scores_expr(
    df: DataFrame,
    qvec: np.ndarray,
    keep: Sequence[str] = ("vec_id", "label"),
    vec_col: str = "embedding",
    out: str = "cosine",
) -> DataFrame:
    """cosine_scores twin built on :func:`cosine_score_col` (pure
    Column expressions, zero Python in the plan)."""
    return df.select(*keep, cosine_score_col(vec_col, qvec).alias(out))


def cosine_scores(
    df: DataFrame,
    qvec: np.ndarray,
    keep: Sequence[str] = ("vec_id", "label"),
    vec_col: str = "embedding",
    out: str = "cosine",
) -> DataFrame:
    """keep* + cosine(vec_col, qvec): one numpy pass per Arrow batch."""
    from bigartm_spark.session import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    q = np.asarray(qvec, dtype=np.float64)
    q_norm = math.sqrt(_lr_scalar_sq_norm(q))
    keep = list(keep)
    schema = _keep_schema(df, keep, out)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = _stack(pdf[vec_col])
            cos = _lr_dot(E, q) / (np.sqrt(_lr_sq_norm(E)) * q_norm)
            res = pdf[keep].copy()
            res[out] = cos
            yield res

    return df.select(*keep, vec_col).mapInPandas(score, schema)


def pair_cosine_scores(
    pairs: DataFrame,
    col_a: str,
    col_b: str,
    keep: Sequence[str],
    out: str = "cosine",
) -> DataFrame:
    """keep* + cosine(col_a, col_b) for a pair relation."""
    from bigartm_spark.session import ensure_package_shipped

    ensure_package_shipped(pairs.sparkSession)
    keep = list(keep)
    schema = _keep_schema(pairs, keep, out)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A, B = _stack(pdf[col_a]), _stack(pdf[col_b])
            d = np.zeros(len(pdf), dtype=np.float64)
            for j in range(A.shape[1]):
                d = d + A[:, j] * B[:, j]
            cos = d / (np.sqrt(_lr_sq_norm(A)) * np.sqrt(_lr_sq_norm(B)))
            res = pdf[keep].copy()
            res[out] = cos
            yield res

    return pairs.select(*keep, col_a, col_b).mapInPandas(score, schema)


# Bucket-population target for the size-derived LSH bit width, and the
# row bound past which semantic_dedup materializes its assignment.
BLOCK_ROW_TARGET = 32768
# Sub-chunk row target for oversized blocks (max_block_rows default):
# a (chunk_u, chunk_v) task group holds ≤ ~2×BLOCK_SPLIT_TARGET rows,
# so its frame is ~2×2048×d×8 bytes twice (C- and F-order) — 4 MB at
# d=64 — and its kernel does ~cap²·d mul+adds ≈ 0.1-0.3 s: enough work
# to amortize scheduling, small enough that sum|block|² compute fans
# out across the cluster instead of one task per block. Replication
# cost is |block|/cap copies of each row, i.e. ≥ ~0.2×cap FLOPs per
# shuffled byte at d=64 — compute-dominated at any scale. Measured
# sf10 U-curve (identical row sets): semantic_dedup 95.7s (cap 32768,
# ~1 task/cell) → 21s (2048) → 21s (512); near_dup bits=4 26s → 11s
# (2048) → 10.5s (1024). The pre-count that decides splitting is
# skipped entirely when Catalyst's size estimate proves the whole
# input below the cap.
BLOCK_SPLIT_TARGET = 2048
# Conservative floor for bytes-per-embedding-row when turning a plan
# size estimate into a row-count UPPER bound (real rows are ≥ d×4 raw).
_EMB_ROW_MIN_BYTES = 64
# A split-path task group may exceed 2×target only by hash-binomial
# spread; 4× is far outside that tail, so a bigger group means the
# pre-counted source changed under us — fail fast instead of OOMing.
_SPLIT_GROUP_SLACK = 4


def _rows_upper_bound(df) -> int | None:
    """Catalyst-estimate row-count UPPER bound for an embedding relation
    (None = unknown, assume big). File-scan estimates are compressed
    on-disk bytes, so they are inflated before dividing by the
    conservative per-row floor — the bound errs high, never low."""
    from bigartm_spark.session import (
        FILE_SCAN_EST_EXPANSION,
        estimated_plan_bytes,
        plan_reads_files,
    )

    est = estimated_plan_bytes(df)
    if est is None:
        return None
    if plan_reads_files(df):
        est *= FILE_SCAN_EST_EXPANSION
    return est // _EMB_ROW_MIN_BYTES


def _oversized_blocks(
    src: DataFrame, block_col: str, max_rows: int
) -> dict:
    """{block_value: n_sub_chunks} for blocks larger than ``max_rows``
    (one lightweight count-by-block job; the block key's cardinality is
    bounded by construction — 2^bits buckets / k cells — and only
    over-cap blocks are collected, ≤ total/max_rows of them)."""
    rows = (
        src.groupBy(block_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > max_rows)
        .collect()
    )
    return {
        r[block_col]: -(-int(r["_n"]) // max_rows) for r in rows
    }


def _tile_pair_scores(anchors, tile, nrm_a, nrm_t, threshold):
    """Cosines + threshold mask for one anchors×tile panel: the SAME
    left-to-right float64 column recurrence as ``pair_cosine_scores``
    (one IEEE mul + add per dim step, in-place out= forms), so every
    cosine is bit-identical to the join-path kernel regardless of which
    side is anchor (IEEE mul is commutative). NaN (zero-norm) >= t is
    False — those pairs drop exactly as the join path's NULLs did."""
    D = np.zeros((anchors.shape[0], tile.shape[0]), dtype=np.float64)
    tmp = np.empty_like(D)
    for j in range(anchors.shape[1]):
        np.multiply(anchors[:, j : j + 1], tile[:, j][None, :], out=tmp)
        np.add(D, tmp, out=D)
    with np.errstate(invalid="ignore", divide="ignore"):
        cos = D / (nrm_a[:, None] * nrm_t[None, :])
        keep = cos >= threshold
    return cos, keep


def _tile_shape(chunk_elems: int) -> tuple[int, int]:
    a_rows = max(1, min(64, chunk_elems // 8))
    t_cols = max(1, min(512, chunk_elems // a_rows))
    return a_rows, t_cols


def _triangle_pairs(pdf, id_col, vec_col, threshold, chunk_elems):
    """Strict-upper-triangle pairs (by id order; equal-id pairs masked,
    matching the join spec's ``vec_a < vec_b``) within one frame.
    Returns (ids_a, ids_b, cos) numpy arrays or None."""
    n = len(pdf)
    if n < 2:
        return None
    pdf = pdf.sort_values(id_col)
    E = _stack(pdf[vec_col])
    ids = pdf[id_col].to_numpy()
    nrm = np.sqrt(_lr_sq_norm(E))
    # F-order so each column slice below is contiguous
    EF = np.asfortranarray(E)
    a_rows, t_cols = _tile_shape(chunk_elems)
    ar_idx = np.arange(a_rows)[:, None]
    tc_idx = np.arange(t_cols)[None, :]
    av, bv, cv = [], [], []
    for s in range(0, n - 1, a_rows):
        c = min(a_rows, n - 1 - s)
        anchors = EF[s : s + c]
        nrm_a = nrm[s : s + c]
        for t0 in range(s + 1, n, t_cols):
            m = min(t_cols, n - t0)
            cos, keep = _tile_pair_scores(
                anchors, EF[t0 : t0 + m], nrm_a, nrm[t0 : t0 + m], threshold
            )
            if t0 <= s + c - 1:
                # tile overlaps the anchor rows: strict upper
                # triangle only (global t0+k > s+i)
                keep &= tc_idx[:, :m] > (s - t0) + ar_idx[:c]
            r, t = np.nonzero(keep)
            if len(r):
                ia, ib = ids[s + r], ids[t0 + t]
                # duplicate id values sort adjacent: mask (id, id)
                # self-pairs the join spec's vec_a < vec_b excluded
                ne = ia != ib
                if not ne.all():
                    ia, ib, r, t = ia[ne], ib[ne], r[ne], t[ne]
                if len(r):
                    av.append(ia)
                    bv.append(ib)
                    cv.append(cos[r, t])
    if not av:
        return None
    return np.concatenate(av), np.concatenate(bv), np.concatenate(cv)


def _cross_pairs(pa, pb, id_col, vec_col, threshold, chunk_elems):
    """All cross pairs between two disjoint-id frames, emitted in join
    order (vec_a = lower id). Same tiled bit-exact kernel as the
    triangle path."""
    if len(pa) == 0 or len(pb) == 0:
        return None
    EA = np.asfortranarray(_stack(pa[vec_col]))
    EB = np.asfortranarray(_stack(pb[vec_col]))
    ids_a, ids_b = pa[id_col].to_numpy(), pb[id_col].to_numpy()
    nrm_a, nrm_b = np.sqrt(_lr_sq_norm(EA)), np.sqrt(_lr_sq_norm(EB))
    a_rows, t_cols = _tile_shape(chunk_elems)
    av, bv, cv = [], [], []
    for s in range(0, len(ids_a), a_rows):
        c = min(a_rows, len(ids_a) - s)
        for t0 in range(0, len(ids_b), t_cols):
            m = min(t_cols, len(ids_b) - t0)
            cos, keep = _tile_pair_scores(
                EA[s : s + c],
                EB[t0 : t0 + m],
                nrm_a[s : s + c],
                nrm_b[t0 : t0 + m],
                threshold,
            )
            r, t = np.nonzero(keep)
            if len(r):
                ia, ib = ids_a[s + r], ids_b[t0 + t]
                av.append(np.minimum(ia, ib))
                bv.append(np.maximum(ia, ib))
                cv.append(cos[r, t])
    if not av:
        return None
    return np.concatenate(av), np.concatenate(bv), np.concatenate(cv)


def blocked_pair_cosine_scores(
    embeddings: DataFrame,
    block_col: str,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out: str = "cosine",
    chunk_elems: int = 4_000_000,
    max_block_rows: int = BLOCK_SPLIT_TARGET,
) -> DataFrame:
    """All within-block pairs (``vec_a < vec_b`` by ``id_col``) with
    cosine >= ``threshold``: (block, vec_a, vec_b, cosine).

    The guide-§8 shape for block-quadratic verification. The self-join
    formulation replicates every embedding |block|−1 times through the
    pair relation (sum|block|² payload rows — ~30 GB of Arrow traffic at
    the sf10 sweep's 29.6M pairs); here each embedding crosses exactly
    ONE groupBy exchange and pairs never exist as rows outside the numpy
    kernel. Scores are computed with the SAME left-to-right float64
    column recurrence as ``pair_cosine_scores``, evaluated over
    L2-resident anchor×tail tiles: per element the mul/add sequence and
    operands are identical to the join path whatever the tile shape, so
    every cosine is bit-identical (pinned in test_similarity_blocked.py).
    Equal-id pairs are masked to match the join spec's ``vec_a < vec_b``
    (duplicate ids in a block previously produced (id, id) self-pairs).

    Zero-norm vectors: the join path's kernel yields NaN, which Arrow
    hands back to the JVM as NULL and the caller's ``isnotnull``-bearing
    threshold filter drops; numpy's ``NaN >= t`` is False, so this
    kernel drops exactly the same pairs.

    Skew safety (``max_block_rows``): groupBy(block).applyInPandas puts
    each block in ONE task — AQE skew splitting does not apply to
    FlatMapGroupsInPandas, so a hot block would otherwise be a single
    task holding a |block|×d frame and doing |block|² work. Blocks
    larger than ``max_block_rows`` are therefore hash-split into
    m = ceil(|block|/max_block_rows) chunks on xxhash64(id), and every
    chunk pair (u ≤ v) becomes its own task group: (c,c) groups score
    the strict upper triangle within chunk c, (u,v) groups score all
    cross pairs — a provably exact partition of the pair set (equal ids
    hash to the same chunk, so cross groups never see an (id, id)
    pair). Each row is replicated m ways, i.e. |block|²/max_block_rows
    rows shuffled — dominated by the |block|² kernel work it fans out.
    The plan keeps exactly ONE exchange (the groupBy); the per-block
    chunk counts come from one lightweight count-by-block job that is
    itself SKIPPED when Catalyst's size estimate proves the whole input
    under ``max_block_rows`` rows (the common small case: zero extra
    jobs, identical plan).

    Memory per task: ≤ ~2×``max_block_rows``×d doubles (twice: C- and
    F-order) plus one tile panel of at most min(``chunk_elems``, 64×512)
    doubles; the split kernel fails fast if a group exceeds the
    hash-spread slack instead of OOMing."""
    from bigartm_spark.session import ensure_package_shipped

    ensure_package_shipped(embeddings.sparkSession)
    src = embeddings.select(block_col, id_col, vec_col)
    id_type = src.schema[id_col].dataType
    schema = StructType(
        [
            src.schema[block_col],
            StructField("vec_a", id_type, True),
            StructField("vec_b", id_type, True),
            StructField(out, DoubleType(), True),
        ]
    )

    def _result(pdf, blk, trio):
        if trio is None:
            return pd.DataFrame(
                {
                    block_col: pdf[block_col].iloc[:0],
                    "vec_a": pdf[id_col].iloc[:0],
                    "vec_b": pdf[id_col].iloc[:0],
                    out: pd.Series([], dtype="float64"),
                }
            )
        ids_a, ids_b, cos = trio
        return pd.DataFrame(
            {
                block_col: np.repeat(blk, len(ids_a)),
                "vec_a": ids_a,
                "vec_b": ids_b,
                out: cos,
            }
        )

    rows_ub = _rows_upper_bound(src)
    hot = (
        {}
        if rows_ub is not None and rows_ub <= max_block_rows
        else _oversized_blocks(src, block_col, max_block_rows)
    )

    if not hot:

        def score(pdf: pd.DataFrame) -> pd.DataFrame:
            trio = _triangle_pairs(pdf, id_col, vec_col, threshold, chunk_elems)
            blk = pdf[block_col].iloc[0] if len(pdf) else None
            return _result(pdf, blk, trio)

        return src.groupBy(block_col).applyInPandas(score, schema)

    # ---- split path: hot blocks fan out over (chunk_u, chunk_v) groups
    if len(hot) <= 4096:
        # bounded literal map: zero extra exchanges in the plan
        entries = []
        for k, m in hot.items():
            entries += [F.lit(k), F.lit(int(m))]
        m_col = F.coalesce(
            F.element_at(F.create_map(*entries), F.col(block_col)), F.lit(1)
        )
    else:  # degenerate block-key cardinality: broadcast-join the map
        mdf = src.sparkSession.createDataFrame(
            [(k, int(m)) for k, m in hot.items()], [block_col, "_m"]
        )
        src = src.join(F.broadcast(mdf), block_col, "left")
        m_col = F.coalesce(F.col("_m"), F.lit(1))
    chunk = F.pmod(F.xxhash64(F.col(id_col)), m_col).cast("int")
    salted = (
        src.withColumn("_chunk", chunk)
        .withColumn(
            "_t",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), m_col - 1),
                    lambda o: F.struct(
                        F.least(o, F.col("_chunk")).alias("u"),
                        F.greatest(o, F.col("_chunk")).alias("v"),
                    ),
                )
            ),
        )
        .select(
            block_col,
            id_col,
            vec_col,
            "_chunk",
            F.col("_t.u").alias("_u"),
            F.col("_t.v").alias("_v"),
        )
    )
    group_cap = _SPLIT_GROUP_SLACK * max_block_rows

    def score_split(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > group_cap:
            raise ValueError(
                f"blocked pair scorer: task group of {len(pdf)} rows "
                f"exceeds {_SPLIT_GROUP_SLACK}x max_block_rows "
                f"({max_block_rows}) — the pre-counted source changed "
                "between the sizing pass and execution"
            )
        blk = pdf[block_col].iloc[0] if len(pdf) else None
        u = int(pdf["_u"].iloc[0]) if len(pdf) else 0
        v = int(pdf["_v"].iloc[0]) if len(pdf) else 0
        if u == v:
            trio = _triangle_pairs(pdf, id_col, vec_col, threshold, chunk_elems)
        else:
            ch = pdf["_chunk"].to_numpy()
            trio = _cross_pairs(
                pdf[ch == u],
                pdf[ch == v],
                id_col,
                vec_col,
                threshold,
                chunk_elems,
            )
        return _result(pdf, blk, trio)

    return salted.groupBy(block_col, "_u", "_v").applyInPandas(
        score_split, schema
    )


def _ranked_topk(scored: DataFrame, k: int, cols: Sequence[str]) -> DataFrame:
    """Distributed top-k (TakeOrderedAndProject via orderBy+limit — no
    global sort), then rank as a window over the k survivors only."""
    top = scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        *cols, "cosine", "rank"
    )


def _cosine_join_col(vec_col: str, qvec_col: str):
    """cosine(vec_col, qvec_col) as a pure Column expression: zip_with
    product + left-to-right F.aggregate sums in double — same operation
    order as the numpy kernel, whole-plan JVM."""
    e = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    qe = F.transform(F.col(qvec_col), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(e, qe, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = F.sqrt(
        F.aggregate(
            F.transform(e, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
    )
    qn = F.sqrt(
        F.aggregate(
            F.transform(qe, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
    )
    return dot / (nrm * qn)


def _query_scored(
    embeddings: DataFrame, query_id: int, keep: Sequence[str]
) -> DataFrame:
    """Candidates scored against the query vector in ONE action: the
    1-row query side rides a broadcast (hash) join — no driver collect
    of the vector, no second Spark job. Empty result when query_id is
    absent (the pre-r8 form raised ValueError from its lookup job)."""
    qdf = embeddings.filter(F.col("vec_id") == query_id).select(
        F.col("embedding").alias("_qe")
    )
    return (
        embeddings.filter(F.col("vec_id") != query_id)
        .crossJoin(F.broadcast(qdf))
        .select(*keep, _cosine_join_col("embedding", "_qe").alias("cosine"))
    )


def brute_force_topk(
    embeddings: DataFrame, query_id: int = 0, k: int = 10
) -> DataFrame:
    """Top-k most-cosine-similar vectors to vec_id=query_id (excluded).

    One Spark action end-to-end: scoring is JVM codegen (no Python
    workers), the top-k is TakeOrderedAndProject (per-partition heads,
    no global sort), and the only exchange in the plan is the 1-row
    query broadcast."""
    scored = _query_scored(embeddings, query_id, ["vec_id", "label"])
    top = _ranked_topk(scored, k, ["vec_id", "label"])
    return top.select("vec_id", "label", "cosine", "rank")


def knn_per_label(
    embeddings: DataFrame, query_id: int = 0, k: int = 3
) -> DataFrame:
    """Top-k nearest per label group — the grouped-ANN shape. Same
    single-action broadcast-join scoring as brute_force_topk."""
    scored = _query_scored(embeddings, query_id, ["vec_id", "label"])
    w = Window.partitionBy("label").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("label", "vec_id", "cosine", "rank")
    )


def sign_lsh_bucket(emb: Column, bits: int = 4) -> Column:
    """Deterministic sign-bit bucket from the first ``bits`` coordinates."""
    out = F.lit(0)
    for b in range(bits):
        out = out + F.when(
            F.element_at(emb, b + 1) > 0, F.lit(2**b)
        ).otherwise(F.lit(0))
    return out.cast("int")


def lsh_bucketed_topk(
    embeddings: DataFrame, query_id: int = 0, k: int = 5, bits: int = 4
) -> DataFrame:
    """ANN restricted to the query's LSH bucket. The bucket comparison is
    a literal predicate (the query's bucket is resolved driver-side), so
    at scale — bucket as a partition/cluster key — the scan itself
    prunes to |bucket| rows."""
    bucketed = embeddings.withColumn(
        "bucket", sign_lsh_bucket(F.col("embedding"), bits)
    )
    qrow = (
        bucketed.filter(F.col("vec_id") == query_id)
        .select("embedding", "bucket")
        .first()
    )
    if qrow is None:
        raise ValueError(f"vec_id {query_id} not found")
    q = np.asarray(qrow["embedding"], dtype=np.float64)
    cand = bucketed.filter(
        (F.col("bucket") == qrow["bucket"]) & (F.col("vec_id") != query_id)
    )
    scored = cosine_scores_expr(cand, q, keep=["vec_id", "label", "bucket"])
    return _ranked_topk(scored, k, ["vec_id", "label", "bucket"])


def _collect_centroids(
    centroids: DataFrame,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell_ids (asc), centroid matrix (cells × dim), centroid norms.
    Bounded driver materialization: |cells| ≪ |vectors| by construction
    (IVF coarse quantizer — thousands of cells for billions of rows)."""
    rows = centroids.orderBy("cell_id").collect()
    cell_ids = np.asarray([r["cell_id"] for r in rows], dtype=np.int64)
    C = np.stack([np.asarray(r["centroid"], dtype=np.float64) for r in rows])
    norms = np.asarray([math.sqrt(_lr_scalar_sq_norm(c)) for c in C])
    return cell_ids, C, norms


def _assign_kernel(
    E: np.ndarray, C: np.ndarray, c_norms: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Nearest-centroid index (ties → lowest cell position, matching
    ROW_NUMBER ... ORDER BY sim DESC, cell_id ASC) and its cosine."""
    rn = np.sqrt(_lr_sq_norm(E))
    sims = np.empty((E.shape[0], C.shape[0]), dtype=np.float64)
    for c in range(C.shape[0]):
        sims[:, c] = _lr_dot(E, C[c]) / (rn * c_norms[c])
    best = np.argmax(sims, axis=1)  # first max = lowest cell_id (sorted)
    return best, sims[np.arange(E.shape[0]), best]


def ivf_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    metric: str = "cosine",
    keep_embedding: bool = False,
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest
    centroid. One mapInPandas pass — no crossJoin row blow-up and no
    per-vector window shuffle; centroids ride along as a (bounded)
    task closure. centroids(cell_id, centroid array<float|double>).

    ``keep_embedding`` passes the embedding column through untouched so
    callers that need (cell_id, embedding) — semantic_dedup's blocked
    pair scorer — skip a second scan + a vec_id join-back of the
    payload (guide §2.4: one relation, no re-attach join)."""
    from bigartm_spark.session import ensure_package_shipped

    ensure_package_shipped(embeddings.sparkSession)
    cell_ids, C, c_norms = _collect_centroids(centroids)
    fields = [
        embeddings.schema["vec_id"],
        embeddings.schema["label"],
        StructField("cell_id", centroids.schema["cell_id"].dataType, True),
        StructField("centroid_sim", DoubleType(), True),
    ]
    if keep_embedding:
        fields.append(embeddings.schema["embedding"])
    schema = StructType(fields)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            best, sim = _assign_kernel(_stack(pdf["embedding"]), C, c_norms)
            cols = {
                "vec_id": pdf["vec_id"].to_numpy(),
                "label": pdf["label"].to_numpy(),
                "cell_id": cell_ids[best],
                "centroid_sim": sim,
            }
            if keep_embedding:
                # .to_numpy(): index-free, immune to any upstream
                # non-RangeIndex on the batch frame
                cols["embedding"] = pdf["embedding"].to_numpy()
            yield pd.DataFrame(cols)

    return embeddings.select("vec_id", "label", "embedding").mapInPandas(
        assign, schema
    )


def seed_centroids(embeddings: DataFrame, k: int) -> DataFrame:
    """Deterministic coarse centroids: the k lowest vec_ids (the
    oracle-replayable baseline; use ``kmeans_parallel_seed`` for
    production-quality seeding at scale)."""
    return (
        embeddings.orderBy("vec_id")
        .limit(k)
        .select(
            F.col("vec_id").cast("int").alias("cell_id"),
            F.col("embedding").alias("centroid"),
        )
    )


def _seed_scored(
    embeddings: DataFrame, C: np.ndarray, c_norms: np.ndarray, rnd: int
) -> DataFrame:
    """k-means|| per-round scoring relation: (vec_id, _d2 = squared cosine
    distance to the nearest candidate, _u = portable uniform keyed by
    (vec_id, rnd)). Shared by the production loop and the oracle query."""

    schema = StructType(
        [
            embeddings.schema["vec_id"],
            StructField("_d2", DoubleType(), True),
            StructField("_u", DoubleType(), True),
        ]
    )

    def score(batches, _C=C, _n=c_norms, _rnd=rnd):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = _stack(pdf["embedding"])
            _, sim = _assign_kernel(E, _C, _n)
            d2 = np.square(1.0 - sim)  # cosine distance^2
            # portable uniform in (0,1) from (vec_id, round): MINSTD
            # mixing, not CPython hash() — PYTHONHASHSEED-independent
            u = int_uniform_np(pdf["vec_id"].to_numpy(), _rnd)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "_d2": d2,
                    "_u": u,
                }
            )

    return embeddings.select("vec_id", "embedding").mapInPandas(score, schema)


def kmeans_seed_round0(
    embeddings: DataFrame, k: int, oversample: float = 2.0
) -> DataFrame:
    """The oracle-replayable face of kmeans_parallel_seed's first round:
    every vector scored against the round-0 candidate (lowest vec_id),
    with the selection predicate u < target * d2 / sum(d2) made explicit.
    Returns (vec_id, d2, u, picked)."""
    from bigartm_spark.session import ensure_package_shipped

    ensure_package_shipped(embeddings.sparkSession)
    first = (
        embeddings.orderBy("vec_id")
        .limit(1)
        .select("vec_id", "embedding")
        .collect()
    )
    if not first:
        raise ValueError("empty embeddings")
    C = np.stack([np.asarray(first[0]["embedding"], np.float64)])
    c_norms = np.asarray([math.sqrt(_lr_scalar_sq_norm(C[0]))])
    target = max(int(oversample * k), 1)
    scored = _seed_scored(embeddings, C, c_norms, 0)
    tot = scored.agg(F.sum("_d2").alias("s")).collect()[0]["s"] or 0.0
    return scored.select(
        "vec_id",
        F.col("_d2").alias("d2"),
        F.col("_u").alias("u"),
        (F.col("_u") < F.lit(float(target)) * F.col("_d2") / F.lit(tot))
        .cast("int")
        .alias("picked"),
    )


def kmeans_parallel_seed(
    embeddings: DataFrame, k: int, rounds: int = 3, oversample: float = 2.0
) -> DataFrame:
    """k-means|| seeding (Bahmani et al., VLDB'12), deterministic across
    retries: instead of k sequential k-means++ draws (k cluster passes),
    each of ``rounds`` passes samples ~oversample*k candidates with
    probability ∝ cosine distance to the nearest candidate so far. The
    pseudo-randomness is the repo's portable integer-keyed MINSTD
    generator over (vec_id, round) (functions/hashing.py::int_uniform_np
    — engine- and PYTHONHASHSEED-independent, SQL-replayable) — stable
    under task retry/reordering, unlike rand(). The oversampled candidate set
    (≤ 1 + rounds*oversample*k rows) is reduced to k on the driver by a
    farthest-first sweep — bounded, cluster-independent work.

    Returns (cell_id 0..k-1, centroid) for ivf_assign / ivf_topk."""
    from bigartm_spark.session import ensure_package_shipped

    ensure_package_shipped(embeddings.sparkSession)
    first = (
        embeddings.orderBy("vec_id")
        .limit(1)
        .select("vec_id", "embedding")
        .collect()
    )
    if not first:
        raise ValueError("empty embeddings")
    cands = [
        (int(first[0]["vec_id"]), np.asarray(first[0]["embedding"], np.float64))
    ]
    target = max(int(oversample * k), 1)
    for rnd in range(rounds):
        C = np.stack([c for _, c in cands])
        c_norms = np.asarray([math.sqrt(_lr_scalar_sq_norm(c)) for c in C])
        scored = _seed_scored(embeddings, C, c_norms, rnd)
        tot = scored.agg(F.sum("_d2").alias("s")).collect()[0]["s"] or 0.0
        if tot <= 0:
            break
        # P(select v) = min(1, target * d2/sum_d2); one filter, no sort
        picked = (
            scored.filter(F.col("_u") < F.lit(float(target)) * F.col("_d2") / F.lit(tot))
            .select("vec_id")
            .join(embeddings.select("vec_id", "embedding"), "vec_id")
            .collect()
        )
        seen = {v for v, _ in cands}
        for r in picked:
            if r["vec_id"] not in seen:
                seen.add(r["vec_id"])
                cands.append(
                    (int(r["vec_id"]), np.asarray(r["embedding"], np.float64))
                )
    # farthest-first reduction to k (deterministic; ties -> lowest vec_id)
    chosen = [0]
    C = np.stack([c for _, c in cands])
    c_norms = np.asarray([math.sqrt(_lr_scalar_sq_norm(c)) for c in C])
    sims = np.empty((len(cands), len(cands)))
    for i in range(len(cands)):
        sims[i] = _lr_dot(C, C[i]) / (c_norms * c_norms[i])
    while len(chosen) < min(k, len(cands)):
        best_sim = sims[:, chosen].max(axis=1)
        best_sim[chosen] = np.inf
        nxt = int(np.argmin(best_sim))
        chosen.append(nxt)
    spark = embeddings.sparkSession
    rows = [
        (i, [float(x) for x in C[c]]) for i, c in enumerate(sorted(chosen))
    ]
    return spark.createDataFrame(
        rows, "cell_id int, centroid array<double>"
    )


def ivf_refine_centroids(
    embeddings: DataFrame, centroids: DataFrame, iterations: int = 2
) -> DataFrame:
    """Lloyd refinement: assignment + per-cell mean, iterated. Each round
    is one mapInPandas assignment + one groupBy — no driver-side loops
    over data."""
    dim_row = embeddings.select(F.size("embedding").alias("d")).first()
    dim = dim_row["d"]
    cur = centroids
    for _ in range(iterations):
        assigned = ivf_assign(embeddings, cur)
        joined = embeddings.join(assigned.select("vec_id", "cell_id"), "vec_id")
        cur = joined.groupBy("cell_id").agg(
            F.array(
                *[
                    F.avg(F.col("embedding")[i].cast("double"))
                    for i in range(dim)
                ]
            ).alias("centroid")
        )
    return cur


def ivf_topk(
    embeddings: DataFrame,
    centroids: DataFrame,
    query_id: int = 0,
    k: int = 5,
    n_probe: int = 1,
) -> DataFrame:
    """IVF search: rank centroids against the query (driver-side — the
    centroid table is tiny), then assign + probe-filter + score in ONE
    mapInPandas pass over the vectors. At scale cell_id is the partition
    key of the vector table, so the probe prunes the scan itself."""
    from bigartm_spark.session import ensure_package_shipped

    ensure_package_shipped(embeddings.sparkSession)
    cell_ids, C, c_norms = _collect_centroids(centroids)
    q = _collect_vec(embeddings, query_id)
    q_norm = math.sqrt(_lr_scalar_sq_norm(q))
    # probe cells: cosine(centroid, q), order by (sim desc, cell_id asc)
    c_sims = np.asarray(
        [_lr_dot(C[c : c + 1], q)[0] / (c_norms[c] * q_norm) for c in range(len(C))]
    )
    order = sorted(range(len(C)), key=lambda c: (-c_sims[c], cell_ids[c]))
    probe = set(int(cell_ids[c]) for c in order[:n_probe])

    schema = StructType(
        [
            embeddings.schema["vec_id"],
            embeddings.schema["label"],
            StructField("cell_id", centroids.schema["cell_id"].dataType, True),
            StructField("cosine", DoubleType(), True),
        ]
    )

    def search(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = _stack(pdf["embedding"])
            best, _ = _assign_kernel(E, C, c_norms)
            cells = cell_ids[best]
            mask = np.isin(cells, list(probe)) & (
                pdf["vec_id"].to_numpy() != query_id
            )
            if not mask.any():
                continue
            Em = E[mask]
            cos = _lr_dot(Em, q) / (np.sqrt(_lr_sq_norm(Em)) * q_norm)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy()[mask],
                    "label": pdf["label"].to_numpy()[mask],
                    "cell_id": cells[mask],
                    "cosine": cos,
                }
            )

    scored = embeddings.select("vec_id", "label", "embedding").mapInPandas(
        search, schema
    )
    return _ranked_topk(scored, k, ["vec_id", "label", "cell_id"])


def cosine_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.9
) -> DataFrame:
    """Embedding near-duplicate pairs, label-blocked. Quadratic within a
    block — use ``near_dup_pairs_lsh`` in production, where the blocking
    key is an LSH bucket with a bounded population."""
    return blocked_pair_cosine_scores(embeddings, "label", threshold)


def derive_lsh_bits(
    embeddings: DataFrame,
    default: int = 4,
    target_bucket_rows: int = BLOCK_ROW_TARGET,
) -> int:
    """Sign-LSH bit width sized from the corpus, not a constant: enough
    bits that an AVERAGE bucket holds ≤ ``target_bucket_rows`` vectors
    (2^bits buckets over the estimated row count), floored at
    ``default`` and capped at 24 (buckets must come from leading
    embedding coordinates). Uses Catalyst's size estimate only — no
    job; unknown estimate keeps the default (the downstream block
    splitter still bounds any single task)."""
    rows_ub = _rows_upper_bound(embeddings)
    if rows_ub is None or rows_ub <= 0:
        return default
    need = math.ceil(math.log2(max(rows_ub / target_bucket_rows, 1.0)))
    return max(default, min(int(need), 24))


def near_dup_pairs_lsh(
    embeddings: DataFrame, threshold: float = 0.9, bits: int | None = None
) -> DataFrame:
    """Embedding near-duplicate pairs blocked by sign-LSH bucket:
    pair generation stays inside each bucket, so candidate compute is
    sum(|bucket|²) not |vectors|² — the 100TB shape. ``bits=None``
    (default) derives the bucket count from the corpus size estimate
    (``derive_lsh_bits``), so buckets SHRINK as the corpus grows instead
    of a fixed 2^4 = 16 buckets concentrating n²/16 work; pass an
    explicit ``bits`` to pin the candidate set (the oracle-paired query
    pins 4, matching its frozen SQL). Since r8 the pairs come from
    ``blocked_pair_cosine_scores`` (one groupBy(bucket) exchange of the
    vectors) instead of a bucket self-join that replicated every
    embedding |bucket|−1 times into the pair relation; cosines are
    bit-identical, and since r9 oversized buckets additionally fan out
    over sub-chunk task groups (see the scorer's skew-safety note)."""
    if bits is None:
        bits = derive_lsh_bits(embeddings)
    bucketed = embeddings.withColumn(
        "bucket", sign_lsh_bucket(F.col("embedding"), bits)
    )
    return blocked_pair_cosine_scores(bucketed, "bucket", threshold)


def semantic_dedup(
    embeddings: DataFrame, centroids: DataFrame, threshold: float = 0.9
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): assign
    every vector to its nearest k-means cell, generate candidate pairs
    only WITHIN a cell, and drop any vector that has a more-canonical
    (lower vec_id) neighbor at cosine >= threshold.

    Returns the survivors: (vec_id, label, cell_id, centroid_sim).

    Scale shape: pair generation is blocked by cell_id — sum(|cell|²)
    compute, not |vectors|², and |cell| is controlled by k (grow
    centroids with the corpus). One-sweep canonical selection (drop the
    higher id of each similar pair) rather than full connected
    components: matches the published SemDeDup procedure. Use
    dedup.dedup_clusters on the pair list when transitive-cluster
    canonicals are required.

    Since r8 the within-cell pairs come from
    ``blocked_pair_cosine_scores`` over the assignment that carries the
    embedding through (``ivf_assign(keep_embedding=True)``): the old
    shape re-scanned the vectors, join-attached them to the assignment
    by vec_id, and then replicated every embedding |cell|−1 times into
    the pair relation; now the payload crosses one groupBy(cell_id)
    exchange exactly once (sf10: 53 min → see OPTIMIZATION_r08.md).
    Cosines are bit-identical, so the survivor set is unchanged.

    r9: past the scorer's split gate the assignment is
    localCheckpoint'ed first — the assignment kernel otherwise runs
    THREE times (the scorer's block-sizing count, the pair branch, and
    the survivors branch each recompute the lineage). Materializing n×d
    rows once is linear work inside the query (never reused across
    runs); small inputs keep the r8 lazy two-scan plan.
    """
    assigned = ivf_assign(embeddings, centroids, keep_embedding=True)
    rows_ub = _rows_upper_bound(assigned)
    if rows_ub is None or rows_ub > BLOCK_ROW_TARGET:
        assigned = assigned.localCheckpoint(eager=True)
    dup = blocked_pair_cosine_scores(assigned, "cell_id", threshold)
    drops = dup.select(F.col("vec_b").alias("vec_id")).distinct()
    return assigned.drop("embedding").join(drops, "vec_id", "left_anti")


# -- persistent IVF index ------------------------------------------------


def ivf_build_index(
    embeddings: DataFrame,
    path: str,
    k_cells: int = 8,
    seed_rounds: int = 3,
    lloyd_iterations: int = 2,
    centroids: DataFrame | None = None,
) -> None:
    """Build-once/query-many IVF index on disk: ``path/centroids.parquet``
    (k_cells rows) plus ``path/vectors.parquet`` partitioned by
    ``cell_id``. Partitioning is the point — a probe of p cells reads p
    directories and skips the rest entirely (PartitionFilters, asserted
    in tests), unlike ivf_topk which re-assigns the full vector table
    per query. At 100 TB this is the difference between scanning
    n_probe/k_cells of the corpus and scanning all of it.

    ``centroids`` overrides the kmeans pipeline with a caller-provided
    (cell_id, centroid) table — e.g. seed_centroids for a
    deterministically replayable index."""
    cents = (
        centroids
        if centroids is not None
        else ivf_refine_centroids(
            embeddings,
            kmeans_parallel_seed(embeddings, k_cells, rounds=seed_rounds),
            iterations=lloyd_iterations,
        )
    ).cache()
    cents.write.mode("overwrite").parquet(f"{path}/centroids.parquet")
    assigned = ivf_assign(embeddings, cents).select("vec_id", "cell_id")
    (
        embeddings.join(assigned, "vec_id")
        .write.mode("overwrite")
        .partitionBy("cell_id")
        .parquet(f"{path}/vectors.parquet")
    )
    cents.unpersist()


def ivf_probe_cells(
    centroids: DataFrame, qvec: np.ndarray, n_probe: int
) -> list[int]:
    """The n_probe cell_ids nearest the query (sim desc, cell_id asc) —
    driver-side over the bounded centroid table, same ordering contract
    as ivf_topk."""
    cell_ids, C, c_norms = _collect_centroids(centroids)
    q = np.asarray(qvec, dtype=np.float64)
    q_norm = math.sqrt(_lr_scalar_sq_norm(q))
    sims = _lr_dot(C, q) / (c_norms * q_norm)
    order = sorted(range(len(C)), key=lambda c: (-sims[c], cell_ids[c]))
    return [int(cell_ids[c]) for c in order[:n_probe]]


def ivf_query_index(
    spark,
    path: str,
    qvec: np.ndarray = None,
    query_id: int = None,
    k: int = 5,
    n_probe: int = 1,
) -> DataFrame:
    """Query a persisted IVF index: rank cells driver-side, scan ONLY the
    probed cell partitions (literal IN-filter on the partition column →
    directory pruning at the source), numpy-score, TakeOrdered top-k.
    Pass the query as a vector, or as a ``query_id`` resolved from the
    index itself (one pruned-by-nothing point lookup)."""
    vectors = spark.read.parquet(f"{path}/vectors.parquet")
    if qvec is None:
        if query_id is None:
            raise ValueError("pass qvec or query_id")
        qvec = _collect_vec(vectors, query_id)
    centroids = spark.read.parquet(f"{path}/centroids.parquet")
    probe = ivf_probe_cells(centroids, qvec, n_probe)
    scanned = vectors.filter(F.col("cell_id").isin(probe))
    if query_id is not None:
        scanned = scanned.filter(F.col("vec_id") != query_id)
    scored = cosine_scores(scanned, qvec, keep=("vec_id", "label", "cell_id"))
    return _ranked_topk(scored, k, ["vec_id", "label", "cell_id"])
