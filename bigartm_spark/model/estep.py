"""G2 ProcessBatches — the E-step as one Spark job.

Reference: /root/reference/src/artm/core/processor.cc:50-292 and
processor_helpers.cc:261-590 (per-batch CSR build + inner theta passes +
n_wt increments behind spin locks + cumulative scores).

Spark shape (SURVEY.md §3.1):

    docs ⋈ phi.compact                      -- broadcast when phi is small
      → groupBy(doc-bucket).applyInPandas   -- vectorized inner EM per doc
      → nwt partials + theta rows + score partials (one output relation)
      → groupBy(token).sum / groupBy(score).sum   -- partial+final agg

The kernel is the only Python in the hot path: it is Arrow-batched and
fully vectorized across all docs of a bucket (numpy segment ops — the
analogue of the reference's AVX loops, processor_helpers.cc:403-514).
Buckets (hash of doc_id) keep Arrow batches large instead of one tiny
group per document; the map-side per-bucket n_wt pre-aggregation mirrors
the reference's per-batch partial n_wt, so the shuffle moves at most
|vocab| rows per bucket, never one row per (token-occurrence × topic).
Shared mutable n_wt + spin locks are replaced by an associative
groupBy-sum (no locks, deterministic up to float addition order).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigartm_spark.model.phi import PhiMatrix

THETA_EPS = 1e-37  # sparsity threshold, messages.proto:610

# Sentinel column marking a prepare_corpus() output. Deliberately ugly:
# process_batches() skips the whole pass-invariant preparation half when
# it sees this column, so an accidental collision with a user column
# would silently drop class weighting and bucket on arbitrary values.
BUCKET_COL = "__bigartm_bucket__"

KERNEL_OUT_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),  # nwt|theta|ptdw|score
        T.StructField("key", T.StringType(), True),  # token or score name
        T.StructField("class_id", T.StringType(), True),
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("pos", T.IntegerType(), True),
        T.StructField("values", T.ArrayType(T.DoubleType()), False),
    ]
)

_OUT_COLS = ["kind", "key", "class_id", "doc_id", "pos", "values"]

# Auto-sizing threshold for the broadcast-phi fast path: above this
# estimated in-memory size (|vocab| x T x 8B x 2 overhead factor) the
# plan-level shuffle join is used instead of a driver collect+broadcast.
PHI_BROADCAST_MAX_BYTES = 256 * 1024 * 1024

# per-worker-process memo of the merge key frame rebuilt from a broadcast
# (keyed by Spark broadcast id; the value itself is cached by Spark per
# worker, this avoids re-assembling the pandas frame per task). Size 1:
# a stale entry pins the previous pass's phi value tuple (plus a rebuilt
# pandas frame) in every worker process — near the 256MB broadcast
# threshold that is GBs of dead memory per worker across EM passes.
_KF_CACHE: dict[int, object] = {}

# driver-side registry of phi broadcasts issued by process_batches, so
# fit loops can reclaim executor broadcast blocks deterministically
# instead of waiting on the ContextCleaner GC race (a 15-pass fit near
# the 256MB threshold otherwise parks ~4GB of dead blocks per executor)
_ISSUED_PHI_BROADCASTS: list = []


def release_phi_broadcasts(keep_last: int = 0) -> None:
    """Unpersist phi broadcasts issued so far, keeping the ``keep_last``
    most recent. unpersist (never destroy): the driver retains the value,
    so if a consumer's lineage is ever recomputed the broadcast is simply
    re-shipped — correctness-safe even if called while an overlapped
    async E-step is still running."""
    while len(_ISSUED_PHI_BROADCASTS) > keep_last:
        b = _ISSUED_PHI_BROADCASTS.pop(0)
        try:
            b.unpersist(blocking=False)
        except Exception:
            pass


def should_broadcast_phi(
    n_rows: int, num_topics: int, limit: int = PHI_BROADCAST_MAX_BYTES
) -> bool:
    """True if an (n_rows x num_topics) double phi fits the broadcast
    budget (2x factor covers key strings + pandas/pickle overhead)."""
    return n_rows * num_topics * 8 * 2 <= limit


# Kernel working set per bucket ≈ nnz x T doubles x ~4 live arrays
# (phi_rows, ptdw, contribs, partial n_wt). Budget per bucket:
BUCKET_TARGET_BYTES = 512 * 1024 * 1024


def choose_num_buckets(
    corpus_nnz: int,
    num_topics: int,
    parallelism: int,
    target_bytes: int = BUCKET_TARGET_BYTES,
) -> int:
    """Bucket count that keeps the per-bucket kernel working set under
    ``target_bytes`` AND saturates the cluster. Parallelism alone is the
    wrong default at scale: 100 TB over parallelism-many buckets would
    put billions of rows (x T doubles, x4 arrays) in one applyInPandas
    group — ``need`` takes over there. At small corpora exactly ONE
    wave of kernel tasks is the floor-minimizing choice: the nwt
    partial-aggregation shuffle carries buckets x vocab rows, so halving
    the bucket count halves it (measured 3.7s -> 2.9s on the 2-pass
    sf0.1 fit vs the old 2x-parallelism default; per-doc math is
    bucket-independent, trajectories drift < 1e-14 relative)."""
    need = (corpus_nnz * num_topics * 8 * 4 + target_bytes - 1) // target_bytes
    return max(parallelism, int(need), 8)


def _bcast_lookup(phi_bcast):
    """(key_frame, matrix) from a (cls, tok, mat) numpy broadcast.
    Memo keyed by the identity of the worker-cached value tuple (the
    strong ref kept in the cache pins it, so the id stays valid; the
    `is` check guards against id reuse after eviction)."""
    val = phi_bcast.value
    entry = _KF_CACHE.get(id(val))
    if entry is not None and entry[0] is val:
        return entry[1], val[2]
    cls_arr, tok_arr, mat = val
    kf = pd.DataFrame({"class_id": cls_arr, "token": tok_arr})
    kf["_row_idx"] = np.arange(len(kf), dtype=np.int64)
    _KF_CACHE.clear()  # evict the stale pass's value tuple immediately
    _KF_CACHE[id(val)] = (val, kf)
    return kf, mat


def _doc_kernel_factory(
    num_topics: int,
    num_document_passes: int,
    theta_agents: list,
    emit_nwt: bool,
    emit_theta: bool,
    compute_scores: bool,
    ptdw_agents: list | None = None,
    emit_ptdw: bool = False,
    phi_bcast=None,
    class_score_breakdown: bool = False,
):
    """Build the applyInPandas kernel. All captured state must pickle.

    phi_bcast: optional Spark broadcast of (key_frame, matrix) — the C1
    token->phi-row lookup done worker-side via a pandas hash merge, so the
    shuffle and Arrow transfer carry only (doc_id, token, weight) instead
    of a T-wide double array per token occurrence. When None, the rows
    arrive pre-joined with a `values` column (the plan-level join path
    for models too large to broadcast)."""
    ptdw_agents = ptdw_agents or []
    sort_cols = ["doc_id", "pos"] if (ptdw_agents or emit_ptdw) else ["doc_id"]

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(columns=_OUT_COLS)
        if phi_bcast is not None:
            key_frame, mat = _bcast_lookup(phi_bcast)
            pdf = pdf.merge(key_frame, on=["class_id", "token"], how="inner")
            if len(pdf) == 0:
                return pd.DataFrame(columns=_OUT_COLS)
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        theta_init_col = (
            pdf["_theta_init"] if "_theta_init" in pdf.columns else None
        )
        w = pdf["weight"].to_numpy(dtype=np.float64)
        if phi_bcast is not None:
            phi_rows = mat[pdf["_row_idx"].to_numpy()]  # (nnz, T) view-copy
        else:
            phi_rows = np.stack(pdf["values"].to_numpy())  # (nnz, T)
        doc_ids = pdf["doc_id"].to_numpy()
        # segment boundaries: rows of one doc are contiguous after the sort
        change = np.flatnonzero(doc_ids[1:] != doc_ids[:-1]) + 1
        starts = np.concatenate(([0], change))
        seg = np.repeat(np.arange(len(starts)), np.diff(np.append(starts, len(doc_ids))))
        n_docs = len(starts)
        uniq_docs = doc_ids[starts]

        T_ = num_topics
        theta = np.full((n_docs, T_), 1.0 / T_)
        if theta_init_col is not None:
            # C5 reuse_theta: cached rows override the uniform init
            # (processor_helpers.cc:81-92); docs without a cache entry
            # keep the default
            firsts = theta_init_col.to_numpy()[starts]
            for i, t0 in enumerate(firsts):
                if t0 is not None and len(t0) == T_:
                    theta[i] = np.asarray(t0, dtype=np.float64)

        def compute_ptdw(th):
            num = phi_rows * th[seg]  # (nnz, T)
            z = num.sum(axis=1)
            out = np.divide(num, z[:, None], out=num, where=z[:, None] > 0)
            for agent in ptdw_agents:
                out = agent.apply_ptdw(out, starts, seg)
                zz = out.sum(axis=1)  # re-normalize rows (NormalizePtdwAgent)
                out = np.divide(
                    out, zz[:, None], out=out, where=zz[:, None] > 0
                )
                z = zz
            return out, z

        # inner passes: regularize after each n_td recompute, normalize as
        # the final agent (processor_helpers.cc:468-513, 169-171)
        for p in range(num_document_passes):
            ptdw, z = compute_ptdw(theta)
            n_td = np.add.reduceat(w[:, None] * ptdw, starts, axis=0)
            for agent in theta_agents:
                if getattr(agent, "needs_doc_ids", False):
                    # e.g. HierarchySparsingTheta: damp pseudo-docs only
                    n_td = agent.apply(theta, n_td, p, doc_ids=uniq_docs)
                else:
                    n_td = agent.apply(theta, n_td, p)
            np.maximum(n_td, 0.0, out=n_td)
            tot = n_td.sum(axis=1)
            # zero-total rows (possible only under total regularizer
            # suppression, e.g. SmoothSparseTheta tau<<0 on a scoped
            # doc) stay ZERO like the reference's normalize, so the doc
            # contributes nothing downstream (smooth_sparse_theta test
            # semantics) -- not a uniform row
            theta = np.divide(
                n_td, tot[:, None], out=np.zeros_like(n_td),
                where=tot[:, None] > 0,
            )

        # final ptdw with the converged theta
        ptdw, z = compute_ptdw(theta)

        out_kind: list[str] = []
        out_key: list = []
        out_cls: list = []
        out_doc: list = []
        out_pos: list = []
        out_vals: list = []

        if emit_nwt:
            # map-side partial aggregation per (class_id, token)
            contrib = w[:, None] * ptdw
            cls_codes, cls_uniq = pd.factorize(pdf["class_id"], sort=False)
            tok_codes, tok_uniq = pd.factorize(pdf["token"], sort=False)
            pair = cls_codes.astype(np.int64) * len(tok_uniq) + tok_codes
            codes, pair_uniq = pd.factorize(pair, sort=False)
            nwt = np.zeros((len(pair_uniq), T_))
            np.add.at(nwt, codes, contrib)
            u_cls = np.asarray(cls_uniq)[(pair_uniq // len(tok_uniq)).astype(int)]
            u_tok = np.asarray(tok_uniq)[(pair_uniq % len(tok_uniq)).astype(int)]
            for i in range(len(pair_uniq)):
                out_kind.append("nwt")
                out_key.append(u_tok[i])
                out_cls.append(u_cls[i])
                out_doc.append(None)
                out_pos.append(None)
                out_vals.append(nwt[i])

        if emit_theta:
            for i in range(n_docs):
                out_kind.append("theta")
                out_key.append(None)
                out_cls.append(None)
                out_doc.append(int(uniq_docs[i]))
                out_pos.append(None)
                out_vals.append(theta[i])

        if emit_ptdw:
            pos_arr = pdf["pos"].to_numpy()
            for i in range(len(pdf)):
                out_kind.append("ptdw")
                out_key.append(None)
                out_cls.append(None)
                out_doc.append(int(doc_ids[i]))
                out_pos.append(int(pos_arr[i]))
                out_vals.append(ptdw[i])

        if compute_scores:
            # perplexity: sum w*ln p(w|d); zero-p fallback = document
            # unigram n_dw/n_d (perplexity.cc:159-239 default model)
            n_d = np.add.reduceat(w, starts)
            pz = z.copy()
            zero_mask = pz <= 0
            if zero_mask.any():
                pz[zero_mask] = (w / n_d[seg])[zero_mask]
            log_terms = w * np.log(np.maximum(pz, 1e-300))
            raw = float(log_terms.sum())
            scores = {
                "perplexity_raw": raw,
                "perplexity_normalizer": float(w.sum()),
                "perplexity_zero_words": float(zero_mask.sum()),
                "sparsity_theta_zero": float((theta < THETA_EPS).sum()),
                "sparsity_theta_total": float(theta.size),
                "items_processed": float(n_docs),
                "token_weight": float(w.sum()),
            }
            if class_score_breakdown:
                # opt-in per-modality partials (PerplexityScoreConfig
                # class_id scoping, perplexity.cc:66-80) — dynamic keys,
                # so only the extract_scores path may request this (the
                # fixed-key Observation fast path cannot carry them)
                cls_arr = pdf["class_id"].to_numpy()
                for c in pd.unique(cls_arr):
                    selc = cls_arr == c
                    scores[f"perplexity_raw@cls:{c}"] = float(
                        log_terms[selc].sum()
                    )
                    scores[f"perplexity_normalizer@cls:{c}"] = float(
                        w[selc].sum()
                    )
                    scores[f"perplexity_zero_words@cls:{c}"] = float(
                        zero_mask[selc].sum()
                    )
            if "cp" in pdf.columns:
                # UnigramCollectionModel variant (perplexity.cc:159-239):
                # zero-p(w|d) fallback = the dictionary's global token
                # frequency (the joined cp column); tokens missing from
                # the dictionary degrade to the document model so the
                # sum stays finite (the reference skips them via its
                # zero-words accounting)
                cp = pd.to_numeric(
                    pdf["cp"], errors="coerce"
                ).to_numpy(dtype=np.float64)
                pzc = z.copy()
                if zero_mask.any():
                    fb = np.where(
                        np.isfinite(cp) & (cp > 0), cp, w / n_d[seg]
                    )
                    pzc[zero_mask] = fb[zero_mask]
                scores["perplexity_raw@coll"] = float(
                    np.sum(w * np.log(np.maximum(pzc, 1e-300)))
                )
                scores["perplexity_normalizer@coll"] = float(w.sum())
                scores["perplexity_zero_words@coll"] = float(zero_mask.sum())
            for k, v in scores.items():
                out_kind.append("score")
                out_key.append(k)
                out_cls.append(None)
                out_doc.append(None)
                out_pos.append(None)
                out_vals.append(np.array([v]))

        return pd.DataFrame(
            {
                "kind": out_kind,
                "key": out_key,
                "class_id": out_cls,
                "doc_id": out_doc,
                "pos": pd.array(out_pos, dtype="Int32"),
                "values": out_vals,
            }
        )

    return kernel


def apply_class_weights(
    docs: DataFrame, class_weights: dict[str, float] | None
) -> DataFrame:
    """B2 modality weighting: weight *= class_weight[class_id]; 0 drops.

    Literal CASE expression, not a join — the class map is a handful of
    entries (processor_helpers.cc:180-215)."""
    if not class_weights:
        return docs
    expr = F.lit(None).cast("double")
    cw = F.col("class_id")
    mapped = None
    for cls, wt in class_weights.items():
        cond = cw == F.lit(cls)
        mapped = F.when(cond, F.lit(float(wt))) if mapped is None else mapped.when(
            cond, F.lit(float(wt))
        )
    expr = mapped.otherwise(F.lit(0.0))
    return (
        docs.withColumn("weight", F.col("weight") * expr)
        .filter(F.col("weight") > 0)
    )


def process_batches(
    docs: DataFrame,
    pwt: PhiMatrix,
    num_document_passes: int = 10,
    class_weights: dict[str, float] | None = None,
    theta_agents: list | None = None,
    emit_nwt: bool = True,
    emit_theta: bool = False,
    compute_scores: bool = True,
    num_buckets: int | None = None,
    broadcast_phi: bool | None = None,
    ptdw_agents: list | None = None,
    emit_ptdw: bool = False,
    transaction_mode: bool = False,
    transaction_weights: dict[str, float] | None = None,
    theta_cache: DataFrame | None = None,
    phi_local: tuple | None = None,
    collection_probs: DataFrame | None = None,
    class_score_breakdown: bool = False,
) -> DataFrame:
    """One E-step pass over the corpus. Returns the kernel output relation
    (kind, key, class_id, doc_id, pos, values) — callers aggregate it.

    broadcast_phi: phi has |vocab| rows (vocab x topics doubles). Up to
    ~10^6 x 100 topics this fits the broadcast budget comfortably and
    turns the join into a worker-side hash merge (C1: the reference's
    token->phi-row unordered_map lookup). For larger models the
    plan-level shuffle join on (class_id, token) avoids materializing
    phi on the driver. None (default) auto-sizes: estimate
    |vocab| x T x 8B x 2 and broadcast only under
    PHI_BROADCAST_MAX_BYTES — nothing is ever pulled to the driver
    above the threshold.
    """
    from bigartm_spark.session import ensure_package_shipped

    ensure_package_shipped(docs.sparkSession)
    # A relation carrying ``BUCKET_COL`` came from prepare_corpus(): class
    # weighting, the collection-probs join, column pruning, and the
    # bucket shuffle are already done (and CACHED, hash-partitioned on
    # BUCKET_COL) — skip the pass-invariant half entirely. The
    # class_weights / collection_probs arguments are ignored for such
    # input; the caller baked them in at preparation time.
    prepared = BUCKET_COL in docs.columns
    need_pos = bool(ptdw_agents) or emit_ptdw
    cols = ["doc_id", "class_id", "token", "weight"]
    if not prepared:
        docs = apply_class_weights(docs, class_weights)
        if collection_probs is not None and not transaction_mode:
            # D7 UnigramCollectionModel: ride the dictionary's global token
            # frequency through the kernel as a `cp` column (dictionary-sized
            # broadcast join, left so out-of-dictionary tokens stay scored).
            # dropDuplicates guards the training stream: a dictionary with
            # repeated (class_id, token) rows must not fan out corpus rows —
            # attaching a score can never be allowed to alter n_wt/theta.
            docs = docs.join(
                F.broadcast(
                    collection_probs.select("class_id", "token", "cp")
                    .dropDuplicates(["class_id", "token"])
                ),
                ["class_id", "token"],
                "left",
            )
            cols.append("cp")
        if need_pos or transaction_mode:
            cols.append("pos")
        if transaction_mode:
            cols += ["transaction_id", "transaction_typename"]

    if broadcast_phi is None and not transaction_mode:
        # count() on the (checkpointed/cached) phi is one cheap job,
        # nothing driver-side
        broadcast_phi = should_broadcast_phi(
            pwt.compact.count(), pwt.num_topics
        )

    phi_bcast = None
    if broadcast_phi and not transaction_mode:
        # ship phi once per executor as raw numpy (cls, tok, matrix) —
        # cheaper to pickle than a pandas frame; the shuffle then
        # carries only the bare occurrence rows. A fit loop that already
        # holds the driver copy (ARTM collects the new phi as the pass's
        # materializing action) passes it via ``phi_local`` and the
        # collect job is skipped entirely — one Spark job per EM pass.
        if phi_local is not None:
            cls_np, tok_np, mat = phi_local
        else:
            phi_pdf = pwt.compact.toPandas()
            mat = (
                np.stack(phi_pdf["values"].to_numpy())
                if len(phi_pdf)
                else np.zeros((0, pwt.num_topics))
            )
            cls_np = phi_pdf["class_id"].to_numpy()
            tok_np = phi_pdf["token"].to_numpy()
        phi_bcast = docs.sparkSession.sparkContext.broadcast(
            (cls_np, tok_np, mat)
        )
        _ISSUED_PHI_BROADCASTS.append(phi_bcast)
        joined = docs if prepared else docs.select(*cols)
    else:
        joined = (docs if prepared else docs.select(*cols)).join(
            pwt.compact, ["class_id", "token"]
        )  # B5: inner join drops tokens absent from the model; AQE picks
        # the join strategy (broadcast if small, else shuffle)

    if theta_cache is not None and not transaction_mode:
        # C5 reuse_theta: left join the cached per-doc theta rows
        joined = joined.join(theta_cache, "doc_id", "left")
    if num_buckets is None:
        num_buckets = max(
            docs.sparkSession.sparkContext.defaultParallelism * 2, 8
        )
    if transaction_mode:
        kernel = _transaction_kernel_factory(
            pwt.num_topics,
            num_document_passes,
            theta_agents or [],
            emit_nwt,
            emit_theta,
            transaction_weights,
            compute_scores=compute_scores,
        )
    else:
        kernel = _doc_kernel_factory(
            pwt.num_topics,
            num_document_passes,
            theta_agents or [],
            emit_nwt,
            emit_theta,
            compute_scores,
            ptdw_agents=ptdw_agents,
            emit_ptdw=emit_ptdw,
            phi_bcast=phi_bcast,
            class_score_breakdown=class_score_breakdown,
        )
    bucketed = (
        joined  # already bucketed + hash-partitioned: exchange elided
        if prepared
        else joined.withColumn(
            BUCKET_COL, F.pmod(F.xxhash64("doc_id"), F.lit(num_buckets))
        )
    )
    return bucketed.groupBy(BUCKET_COL).applyInPandas(kernel, KERNEL_OUT_SCHEMA)


def prepare_corpus(
    docs: DataFrame,
    num_buckets: int,
    class_weights: dict[str, float] | None = None,
    collection_probs: DataFrame | None = None,
    need_pos: bool = False,
    transaction_mode: bool = False,
) -> DataFrame:
    """Hoist the pass-invariant half of :func:`process_batches` out of a
    multi-pass fit loop: class weighting (B2), the collection-probs join
    (D7), column pruning, and the doc->bucket shuffle.

    Returns a CACHED relation hash-partitioned on ``BUCKET_COL`` — the
    per-pass ``groupBy(BUCKET_COL).applyInPandas`` then satisfies its
    clustered-distribution requirement from the cached layout and elides
    its exchange, so a fit pays ONE corpus shuffle total instead of one
    per collection pass (~2x per-pass E-step cost at sf0.1, measured).
    At cluster scale this is the difference between re-shuffling 100 TB
    per EM pass and scanning co-located cached blocks.

    process_batches() recognizes the ``BUCKET_COL`` column and skips the
    preparation half; pass the SAME num_buckets and let the caller
    ``unpersist()`` when the fit loop ends.
    """
    docs = apply_class_weights(docs, class_weights)
    cols = ["doc_id", "class_id", "token", "weight"]
    if collection_probs is not None and not transaction_mode:
        docs = docs.join(
            F.broadcast(
                collection_probs.select("class_id", "token", "cp")
                .dropDuplicates(["class_id", "token"])
            ),
            ["class_id", "token"],
            "left",
        )
        cols.append("cp")
    if need_pos or transaction_mode:
        cols.append("pos")
    if transaction_mode:
        cols += ["transaction_id", "transaction_typename"]
    return (
        docs.select(*cols)
        .withColumn(
            BUCKET_COL, F.pmod(F.xxhash64("doc_id"), F.lit(num_buckets))
        )
        .repartition(num_buckets, BUCKET_COL)
        .cache()
    )


def _transaction_kernel_factory(
    num_topics: int,
    num_document_passes: int,
    theta_agents: list,
    emit_nwt: bool,
    emit_theta: bool,
    transaction_weights: dict[str, float] | None,
    compute_scores: bool = False,
):
    """E-step with typed-transaction semantics
    (processor_transaction_helpers.cc:28-160):
      p(x|t,d) ∝ theta_td * prod_{w in x} phi_wt   (product over tokens)
      n_td[t] += tt_weight * n_kdx * p(t|d,x)      (n_kdx = first token's w)
      n_wt[w] += same value for EVERY token w of the transaction.
    Runs num_document_passes + 1 inner iterations (reference off-by-one).
    """
    tt_w = transaction_weights

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(columns=_OUT_COLS)
        pdf = pdf.sort_values(
            ["doc_id", "transaction_id", "pos"], kind="mergesort"
        )
        T_ = num_topics
        phi_rows = np.stack(pdf["values"].to_numpy())  # (nnz, T)
        doc_ids = pdf["doc_id"].to_numpy()
        tx_ids = pdf["transaction_id"].to_numpy()
        w = pdf["weight"].to_numpy(dtype=np.float64)

        # transaction segments (within doc)
        key_change = np.flatnonzero(
            (doc_ids[1:] != doc_ids[:-1]) | (tx_ids[1:] != tx_ids[:-1])
        ) + 1
        tx_starts = np.concatenate(([0], key_change))
        # doc segments over transactions
        tx_doc = doc_ids[tx_starts]
        doc_change = np.flatnonzero(tx_doc[1:] != tx_doc[:-1]) + 1
        doc_starts_tx = np.concatenate(([0], doc_change))
        n_docs = len(doc_starts_tx)
        uniq_docs = tx_doc[doc_starts_tx]
        tx_seg_doc = np.repeat(
            np.arange(n_docs),
            np.diff(np.append(doc_starts_tx, len(tx_starts))),
        )
        n_kdx = w[tx_starts]  # first token's weight per transaction
        if tt_w is not None:
            names = pdf["transaction_typename"].to_numpy()[tx_starts]
            ttw = np.array([tt_w.get(nm, 0.0) for nm in names])
        else:
            ttw = np.ones(len(tx_starts))

        log_phi = np.log(np.maximum(phi_rows, 1e-300))
        theta = np.full((n_docs, T_), 1.0 / T_)

        def tx_helper(th):
            # prod of phi over transaction tokens (via log-sum, stable)
            logs = np.add.reduceat(log_phi, tx_starts, axis=0)
            prod = np.exp(logs)
            helper = prod * th[tx_seg_doc]  # (n_tx, T)
            z = helper.sum(axis=1)
            return helper, z

        for it in range(num_document_passes + 1):
            helper, z = tx_helper(theta)
            ptdx = np.divide(
                helper, z[:, None], out=np.zeros_like(helper),
                where=z[:, None] > 1e-100,
            )
            contrib = (ttw * n_kdx)[:, None] * ptdx
            n_td = np.add.reduceat(contrib, doc_starts_tx, axis=0)
            for agent in theta_agents:
                if getattr(agent, "needs_doc_ids", False):
                    n_td = agent.apply(theta, n_td, it, doc_ids=uniq_docs)
                else:
                    n_td = agent.apply(theta, n_td, it)
            np.maximum(n_td, 0.0, out=n_td)
            tot = n_td.sum(axis=1)
            # zero-total rows (possible only under total regularizer
            # suppression, e.g. SmoothSparseTheta tau<<0 on a scoped
            # doc) stay ZERO like the reference's normalize, so the doc
            # contributes nothing downstream (smooth_sparse_theta test
            # semantics) -- not a uniform row
            theta = np.divide(
                n_td, tot[:, None], out=np.zeros_like(n_td),
                where=tot[:, None] > 0,
            )

        out_rows = {c: [] for c in _OUT_COLS}

        if emit_nwt:
            helper, z = tx_helper(theta)
            ptdx = np.divide(
                helper, z[:, None], out=np.zeros_like(helper),
                where=z[:, None] > 1e-100,
            )
            tx_values = (ttw * n_kdx)[:, None] * ptdx  # (n_tx, T)
            # every token of tx gets the tx value
            tx_len = np.diff(np.append(tx_starts, len(pdf)))
            row_vals = np.repeat(tx_values, tx_len, axis=0)  # (nnz, T)
            cls_codes, cls_uniq = pd.factorize(pdf["class_id"], sort=False)
            tok_codes, tok_uniq = pd.factorize(pdf["token"], sort=False)
            pair = cls_codes.astype(np.int64) * len(tok_uniq) + tok_codes
            codes, pair_uniq = pd.factorize(pair, sort=False)
            nwt = np.zeros((len(pair_uniq), T_))
            np.add.at(nwt, codes, row_vals)
            u_cls = np.asarray(cls_uniq)[(pair_uniq // len(tok_uniq)).astype(int)]
            u_tok = np.asarray(tok_uniq)[(pair_uniq % len(tok_uniq)).astype(int)]
            for i in range(len(pair_uniq)):
                out_rows["kind"].append("nwt")
                out_rows["key"].append(u_tok[i])
                out_rows["class_id"].append(u_cls[i])
                out_rows["doc_id"].append(None)
                out_rows["pos"].append(None)
                out_rows["values"].append(nwt[i])

        if emit_theta:
            for i in range(n_docs):
                out_rows["kind"].append("theta")
                out_rows["key"].append(None)
                out_rows["class_id"].append(None)
                out_rows["doc_id"].append(int(uniq_docs[i]))
                out_rows["pos"].append(None)
                out_rows["values"].append(theta[i])

        if compute_scores:
            # D7 with per-transaction-type breakdown (perplexity.cc's
            # transaction rollup): raw/normalizer per tt_name + totals
            helper, z = tx_helper(theta)
            names_all = pdf["transaction_typename"].to_numpy()[tx_starts]
            pz = np.maximum(z, 1e-300)
            raw_terms = n_kdx * np.log(pz)
            for nm in pd.unique(names_all):
                sel = names_all == nm
                for key, val in (
                    (f"perplexity_raw@{nm}", float(raw_terms[sel].sum())),
                    (f"perplexity_normalizer@{nm}", float(n_kdx[sel].sum())),
                ):
                    out_rows["kind"].append("score")
                    out_rows["key"].append(key)
                    out_rows["class_id"].append(None)
                    out_rows["doc_id"].append(None)
                    out_rows["pos"].append(None)
                    out_rows["values"].append(np.array([val]))
            for key, val in (
                ("perplexity_raw", float(raw_terms.sum())),
                ("perplexity_normalizer", float(n_kdx.sum())),
                ("items_processed", float(n_docs)),
            ):
                out_rows["kind"].append("score")
                out_rows["key"].append(key)
                out_rows["class_id"].append(None)
                out_rows["doc_id"].append(None)
                out_rows["pos"].append(None)
                out_rows["values"].append(np.array([val]))

        out = pd.DataFrame(out_rows)
        out["pos"] = pd.array(out["pos"], dtype="Int32")
        return out

    return kernel


def aggregate_nwt(kernel_out: DataFrame, num_topics: int, name: str = "nwt") -> PhiMatrix:
    """Final aggregation of per-bucket n_wt partials: element-wise array sum
    as T scalar aggregates (all JVM-side, single shuffle)."""
    nwt = (
        kernel_out.filter(F.col("kind") == "nwt")
        .groupBy("class_id", F.col("key").alias("token"))
        .agg(
            F.array(
                *[F.sum(F.col("values")[i]) for i in range(num_topics)]
            ).alias("values")
        )
    )
    return nwt


def extract_theta(kernel_out: DataFrame, topics: list[str]) -> DataFrame:
    """theta(doc_id, topic, value) from kernel output."""
    tarr = F.array(*[F.lit(t) for t in topics])
    return (
        kernel_out.filter(F.col("kind") == "theta")
        .select("doc_id", F.posexplode("values").alias("_i", "value"))
        .select(
            "doc_id",
            F.element_at(tarr, F.col("_i") + 1).alias("topic"),
            "value",
        )
    )


def theta_to_cache(theta: DataFrame, topics: list[str]) -> DataFrame:
    """Long theta -> (doc_id, _theta_init array) for C5 reuse."""
    idx = F.map_from_arrays(
        F.array(*[F.lit(t) for t in topics]),
        F.array(*[F.lit(i) for i in range(len(topics))]),
    )
    n = len(topics)
    return (
        theta.withColumn("_i", idx[F.col("topic")])
        .groupBy("doc_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("_i"), F.col("value")))
            ).alias("_m")
        )
        .select(
            "doc_id",
            F.array(
                *[F.coalesce(F.col("_m").getItem(i), F.lit(0.0)) for i in range(n)]
            ).alias("_theta_init"),
        )
    )


def extract_ptdw(kernel_out: DataFrame, topics: list[str]) -> DataFrame:
    """ptdw(doc_id, pos, topic, value) from kernel output (Ptdw matrix,
    messages.proto:651-658)."""
    tarr = F.array(*[F.lit(t) for t in topics])
    return (
        kernel_out.filter(F.col("kind") == "ptdw")
        .select("doc_id", "pos", F.posexplode("values").alias("_i", "value"))
        .select(
            "doc_id",
            "pos",
            F.element_at(tarr, F.col("_i") + 1).alias("topic"),
            "value",
        )
    )


def _finalize_scores(out: dict[str, float]) -> dict[str, float]:
    """Final transforms over summed partials: exp(-raw/normalizer) per
    perplexity key, sparsity ratios (score_manager.cc semantics)."""
    for k in [k for k in out if k.startswith("perplexity_raw")]:
        suffix = k[len("perplexity_raw"):]
        norm = out.get(f"perplexity_normalizer{suffix}")
        if norm:
            out[f"perplexity{suffix}"] = math.exp(-out[k] / norm)
    if "sparsity_theta_total" in out and out["sparsity_theta_total"]:
        out["sparsity_theta"] = (
            out["sparsity_theta_zero"] / out["sparsity_theta_total"]
        )
    return out


def extract_scores(kernel_out: DataFrame) -> dict[str, float]:
    """Associative merge of cumulative score partials (score_manager.cc
    semantics: plain sums; final transforms applied at the end)."""
    rows = (
        kernel_out.filter(F.col("kind") == "score")
        .groupBy("key")
        .agg(F.sum(F.col("values")[0]).alias("v"))
        .collect()
    )
    return _finalize_scores({r["key"]: r["v"] for r in rows})


# Standard (non-transaction) kernel score keys — fixed set, so they can
# ride an Observation instead of a second job over the kernel output.
STANDARD_SCORE_KEYS = [
    "perplexity_raw",
    "perplexity_normalizer",
    "perplexity_zero_words",
    "sparsity_theta_zero",
    "sparsity_theta_total",
    "items_processed",
    "token_weight",
    # emitted only when a collection-model perplexity rides the pass
    # (null-safe: the Observation drops absent keys)
    "perplexity_raw@coll",
    "perplexity_normalizer@coll",
    "perplexity_zero_words@coll",
]


def attach_score_observation(kernel_out: DataFrame):
    """(Observation, observed df): score sums collected as a SIDE EFFECT
    of whatever action consumes the kernel output — the M-step pass then
    needs neither a cache of the kernel relation nor a second job.
    Only valid for the standard kernel (transaction mode emits dynamic
    per-type keys; use extract_scores there)."""
    from pyspark.sql import Observation

    obs = Observation()
    aggs = [
        F.sum(
            F.when(
                (F.col("kind") == "score") & (F.col("key") == k),
                F.col("values")[0],
            )
        ).alias(k)
        for k in STANDARD_SCORE_KEYS
    ]
    return obs, kernel_out.observe(obs, *aggs)


def scores_from_observation(obs) -> dict[str, float]:
    """Finalize scores after the consuming action ran (obs.get blocks
    until then)."""
    vals = {k: v for k, v in obs.get.items() if v is not None}
    return _finalize_scores(vals)
