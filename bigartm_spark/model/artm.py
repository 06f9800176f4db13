"""ARTM — the MasterModel facade (SURVEY.md §1.1, G5/G6/G4/G12).

Reference lifecycle (master_component.cc:1575-1642 FitOffline): per pass
ProcessBatches -> Regularize -> Normalize -> snapshot scores. Here each
pass is one Spark job graph. Lineage is broken per pass (the distributed
analogue of the reference's in-place matrix swap,
master_component.cc:1047-1088) either by collecting the new phi to the
driver (broadcast regime — the same copy then feeds the next pass's
broadcast, so a pass is exactly ONE Spark job) or by a localCheckpoint
(shuffle regime, phi too large to collect).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

from bigartm_spark.model import estep, mstep
from bigartm_spark.model.init import initialize_phi
from bigartm_spark.model.phi import LocalPhiMatrix, PhiMatrix
# Dictionary size (Catalyst estimate) under which initialize() collects
# the (class_id, token) keys in one job instead of running a count job
# first: ~8 MB of key strings is ~10^5 tokens, far inside the driver
# budget, and the broadcast-regime init needs the keys anyway.
SMALL_DICT_MAX_BYTES = 8 * 1024 * 1024
# floor for bytes-per-dictionary-row when turning a size estimate into
# a row-count UPPER bound (rows carry class_id + token strings + stats)
DICT_ROW_MIN_BYTES = 16

# Conservative bytes-per-occurrence-row used to derive the E-step bucket
# count from Catalyst's size estimate without a count() job. Real long
# corpora run ~90B/row (measured on the cached sf0.1 relation), so /40
# overestimates rows ~2x — erring toward MORE buckets, never fewer, at
# the scale where bucket count matters.
CORPUS_BYTES_PER_ROW = 40

from bigartm_spark.model.regularizers import (
    PhiRegularizer,
    RegularizeContext,
    regularize,
)


def _as_docs(obj) -> DataFrame:
    """Accept a long docs DataFrame OR a BatchVectorizer (the reference's
    fit/transform verbs take batch_vectorizer objects,
    artm_model.py:570-1058)."""
    if isinstance(obj, DataFrame):
        return obj
    docs = getattr(obj, "docs", None)
    if isinstance(docs, DataFrame):
        return docs
    raise TypeError(
        f"expected a docs DataFrame or BatchVectorizer, got {type(obj)!r}"
    )


class ARTM:
    """Additive-regularization topic model on Spark DataFrames.

    Parity surface of python/artm/artm_model.py (reference) re-expressed:
    named DataFrames instead of in-process matrices, no threads.
    """

    def __init__(
        self,
        num_topics: int | None = None,
        topic_names: list[str] | None = None,
        num_document_passes: int = 10,
        seed: int = 0,
        class_weights: dict[str, float] | None = None,
        phi_regularizers: list[PhiRegularizer] | None = None,
        theta_agents: list | None = None,
        phi_transforms: list | None = None,
        cache_theta: bool = False,
        reuse_theta: bool = False,
        phi_scores: dict | None = None,
        theta_cache_path: str | None = None,
        num_buckets: int | None = None,
        transaction_typenames: dict[str, float] | None = None,
        theta_columns_naming: str = "id",
        show_progress_bars: bool = False,
        class_ids: dict[str, float] | None = None,
        scores: list | None = None,
        regularizers: list | None = None,
        dictionary=None,
        num_processors: int | None = None,
        theta_name: str | None = None,
        parent_model: "ARTM | None" = None,
        parent_model_weight: float | None = None,
        init_method: str = "reference",
    ):
        """phi_scores: optional {name: callable(PhiMatrix) -> float}
        evaluated on the fresh p_wt after every pass (the non-cumulative
        score hook — sparsity-phi, topic mass, ...).

        theta_cache_path: persist the theta cache as a parquet state table
        instead of executor memory (the reference's disk_cache_path,
        cache_manager.h:36-60 / messages.proto:792).

        num_buckets: E-step kernel group count (default 2x parallelism).
        Kernel memory per task ~ (corpus_nnz / num_buckets) * num_topics
        * 8B; raise it until that fits executor memory at your scale."""
        if topic_names is None:
            topic_names = [f"topic_{i}" for i in range(num_topics or 10)]
        self.topics = topic_names
        self.num_document_passes = num_document_passes
        self.seed = seed
        # 'reference' = bit-exact replica of the reference's token-hash
        # mt19937 init (helpers.cc:79-135) — the default, so a ported
        # reference script reproduces the reference's numbers verbatim
        # (its default seed=-1 mixes nothing into the hash, same as our
        # seed=0). 'portable' = the hash-uniform generator the DuckDB
        # oracle can replay in SQL (used by the oracle-paired plans).
        self.init_method = init_method
        if class_weights is not None and class_ids is not None:
            raise ValueError("give class_weights or class_ids, not both")
        # class_ids is the reference ctor name (artm_model.py:383-385)
        self.class_weights = class_weights if class_weights is not None else class_ids
        self.phi_regularizers = phi_regularizers or []
        self.theta_agents = theta_agents or []
        self.phi_transforms = phi_transforms or []
        self.cache_theta = cache_theta or reuse_theta or bool(theta_cache_path)
        self.reuse_theta = reuse_theta
        self.phi_scores = phi_scores or {}
        self.theta_cache_path = theta_cache_path
        self.num_buckets = num_buckets
        self.transaction_typenames = transaction_typenames
        self.theta_columns_naming = theta_columns_naming
        # accepted for reference signature compatibility; there is no
        # terminal progress bar to draw in a Spark job (the Spark UI is
        # the progress surface), so the flag is held but never read
        self.show_progress_bars = show_progress_bars
        self._num_phi_updates = 0
        self._num_online_processed_batches = 0
        self.pwt = None
        self.nwt: PhiMatrix | None = None
        self.theta: DataFrame | None = None
        self.dictionary: DataFrame | None = None
        self.score_tracker: dict[str, list[float]] = {}
        # reference class-based config front door (model/api.py):
        # model.scores.add(PerplexityScore(...)),
        # model.regularizers['x'].tau = ... — containers route configs
        # onto the engine lists above
        from bigartm_spark.model.api import Regularizers, Scores

        self.ptdw_agents: list = []
        self.scores = Scores(self)
        self.regularizers = Regularizers(self)
        for s in scores or []:
            self.scores.add(s)
        for r in regularizers or []:
            self.regularizers.add(r)
        # num_processors is accepted for ctor-signature parity and
        # ignored: task slots belong to the cluster manager, not the
        # model (the num_processors property reports Spark parallelism)
        del num_processors
        self._theta_name = theta_name or "theta"
        if parent_model is not None:
            # hARTM child wiring at construction (artm_model.py:205-212)
            self.set_parent_model(
                parent_model,
                1.0 if parent_model_weight is None else parent_model_weight,
            )
        if dictionary is not None:
            # reference ctor semantics (artm_model.py:199-204): a
            # dictionary given at construction initializes the model
            self.initialize(dictionary)

    # _phi_local is the driver-side numpy copy of pwt (cls, tok, matrix)
    # that feeds the next pass's broadcast without a collect job. It is
    # only ever valid for the exact pwt it was collected from, so ANY
    # assignment to pwt (overwrite/reshape/rekey/import/dispose) clears
    # it; _merge_and_normalize re-sets it right after assigning pwt.
    @property
    def pwt(self) -> PhiMatrix | None:
        return self._pwt

    @pwt.setter
    def pwt(self, value: PhiMatrix | None) -> None:
        self._pwt = value
        self._phi_local = None

    # -- G1 -------------------------------------------------------------
    def initialize(
        self,
        dictionary: DataFrame,
        dense_init_rate: float = 1.0,
        guaranteed_zeros_rate: float = 0.0,
    ) -> "ARTM":
        """G1. Sparse init (srcmain.cc:1799-1800 --dense-init-rate /
        --guaranteed-zeros-rate) passes through to initialize_phi's E5
        ranking gate. Accepts a raw dictionary DataFrame or the named
        Dictionary facade (bigartm_spark/dictionary.py)."""
        from bigartm_spark.dictionary import unwrap_dictionary
        from bigartm_spark.session import estimated_plan_bytes

        dictionary = unwrap_dictionary(dictionary)
        self.dictionary = dictionary.cache()
        use_reference = (
            getattr(self, "init_method", "reference") == "reference"
            and dense_init_rate >= 1.0
            and guaranteed_zeros_rate <= 0.0
        )
        # C1 join strategy: broadcast phi while |vocab| x T x 8B fits a
        # generous executor budget; beyond that fall back to a shuffle
        # join on (class_id, token) (AQE handles skew).
        # When Catalyst's size estimate already proves the dictionary
        # tiny (accurate for cached/materialized relations; file-scan
        # estimates are compressed bytes, inflated so the row bound errs
        # high), collect the (class_id, token) keys directly and count
        # locally — ONE job instead of a count job plus the driver
        # init's own collect (measured ~115ms/initialize at sf0.1).
        # The collect additionally requires that should_broadcast_phi
        # would choose the broadcast regime even at the estimate's
        # row-count UPPER bound (monotone: fewer true rows only keeps it
        # True) — a small-bytes dictionary with many short tokens or a
        # large T could otherwise send the decision to False and strand
        # the collected keys as wasted driver work. Unknown or large
        # estimate, or a non-broadcast regime -> count() as before.
        from bigartm_spark.session import (
            FILE_SCAN_EST_EXPANSION,
            plan_reads_files,
        )

        init_pdf = None
        sz = estimated_plan_bytes(self.dictionary)
        if sz is not None and plan_reads_files(self.dictionary):
            sz *= FILE_SCAN_EST_EXPANSION
        if (
            sz is not None
            and sz <= SMALL_DICT_MAX_BYTES
            and estep.should_broadcast_phi(
                sz // DICT_ROW_MIN_BYTES, len(self.topics)
            )
        ):
            init_pdf = self.dictionary.select("class_id", "token").toPandas()
            vocab_rows = len(init_pdf)
        else:
            vocab_rows = self.dictionary.count()
        self._broadcast_phi = estep.should_broadcast_phi(
            vocab_rows, len(self.topics)
        )
        if use_reference and self._broadcast_phi:
            # bit-parity init generated DRIVER-SIDE: the broadcast regime
            # already guarantees vocab x T fits the driver, the per-token
            # RNG is hash-seeded (order-independent), and the first fit
            # pass needs the driver copy anyway for its phi broadcast —
            # so a distributed init job + collect would be pure overhead
            # (~1s/fit at sf0.1: the mapInPandas kernel runs twice under
            # mstep.normalize's totals subquery). At vocabularies past
            # the broadcast threshold the distributed path below keeps
            # the right shape.
            self._init_phi_local(init_pdf)
        elif use_reference:
            # bit-parity with the reference default init (see ctor);
            # the sparse-init knobs are srcmain CLI flags the portable
            # generator implements, so they keep that path
            from bigartm_spark.model.init import initialize_phi_reference

            self.pwt = initialize_phi_reference(
                self.dictionary, self.topics, seed=self.seed
            ).cache()
        else:
            self.pwt = initialize_phi(
                self.dictionary,
                self.topics,
                seed=self.seed,
                dense_init_rate=dense_init_rate,
                guaranteed_zeros_rate=guaranteed_zeros_rate,
            ).cache()
        return self

    def _init_phi_local(self, pdf=None) -> None:
        """Reference-RNG init on the driver: same per-token hash-seeded
        vectors as initialize_phi_reference (helpers.cc:79-135), column-
        normalized per class exactly as mstep.normalize; sets both the
        local pwt relation and the _phi_local driver copy the broadcast
        E-step feeds on. ``pdf``: the (class_id, token) keys if the
        caller already collected them (initialize's size-gated single
        collect); collected here otherwise."""
        from bigartm_spark.model.init import (
            reference_random_matrix,
            reference_token_hash,
        )
        from bigartm_spark.model.mstep import normalize_local

        if pdf is None:
            pdf = self.dictionary.select("class_id", "token").toPandas()
        n = len(self.topics)
        hashes = [
            reference_token_hash(c, t, self.seed)
            for c, t in zip(pdf["class_id"], pdf["token"])
        ]
        cls_np = pdf["class_id"].to_numpy()
        tok_np = pdf["token"].to_numpy()
        mat = normalize_local(cls_np, reference_random_matrix(n, hashes))
        self.pwt = LocalPhiMatrix(
            "pwt",
            self.topics,
            self.dictionary.sparkSession,
            cls_np,
            tok_np,
            mat,
        )
        self._phi_local = (cls_np, tok_np, mat)

    # -- hARTM child wiring (artm_model.py:1259-1286) ----------------------
    def set_parent_model(
        self, parent_model: "ARTM", parent_model_weight: float = 1.0
    ) -> "ARTM":
        """Make this model a child hierarchy level: fit_offline unions
        the parent-phi pseudo-batch (A12) into the corpus with this
        weight, exactly as HARTM.add_level does."""
        if parent_model.pwt is None:
            raise RuntimeError("parent model is not initialized")
        self._parent_model = parent_model
        self.parent_model_weight = parent_model_weight
        # psi reads the pseudo-docs' theta rows
        self.cache_theta = True
        return self

    def get_psi(self):
        """Reference ARTM_Level name (hierarchy_utils.py:652-661)."""
        return self.get_parent_psi()

    def get_psi_long(self) -> DataFrame:
        """Distributed Psi readout (our extension): long layout
        (parent_topic, topic, value) from the pseudo-docs' theta."""
        from pyspark.sql import functions as F

        parent = getattr(self, "_parent_model", None)
        if parent is None:
            raise RuntimeError("call set_parent_model first")
        theta = self.get_theta_long()
        mapping = [(-1_000_000 - i, t) for i, t in enumerate(parent.topics)]
        map_df = theta.sparkSession.createDataFrame(
            mapping, "doc_id long, parent_topic string"
        )
        return theta.join(F.broadcast(map_df), "doc_id").select(
            "parent_topic", "topic", "value"
        )

    def get_parent_psi(self):
        """p(child_topic | parent_topic) from the pseudo-docs' theta
        (artm_model.py:1275-1286): the reference returns the transform's
        pandas ThetaMatrix — child topics as rows, parent topics as
        columns."""
        parent = getattr(self, "_parent_model", None)
        if parent is None:
            raise RuntimeError("call set_parent_model first")
        pdf = self.get_psi_long().toPandas()
        wide = pdf.pivot_table(
            index="topic", columns="parent_topic", values="value",
            aggfunc="first", fill_value=0.0,
        )
        wide = wide.loc[[t for t in self.topics if t in wide.index]]
        wide = wide[[t for t in parent.topics if t in wide.columns]]
        wide.index.name = None
        wide.columns.name = None
        return wide

    # -- G5 ---------------------------------------------------------------
    def fit_offline(
        self, docs=None, num_collection_passes: int = 1, batch_vectorizer=None
    ) -> "ARTM":
        # batch_vectorizer= is the reference kwarg spelling
        # (artm_model.py:570: fit_offline(batch_vectorizer=...))
        docs = _as_docs(docs if docs is not None else batch_vectorizer)
        if self.pwt is None:
            raise RuntimeError("call initialize(dictionary) first")
        # lazy doc_id -> title mapping for get_theta's title columns
        # (artm_model.py:503-509); never materialized unless used
        self._theta_titles = docs.select("doc_id", "title")
        parent = getattr(self, "_parent_model", None)
        if parent is not None:
            from bigartm_spark.model.hierarchy import phi_to_pseudo_batch

            docs = docs.unionByName(
                phi_to_pseudo_batch(
                    parent.pwt,
                    parent_level_weight=self.parent_model_weight,
                )
            )
        if self.num_buckets is None:
            # size E-step buckets from the corpus, not just parallelism,
            # so the per-bucket kernel working set stays inside the
            # executor budget at any scale. Catalyst's size estimate
            # (free, driver-side) stands in for the row count via the
            # conservative CORPUS_BYTES_PER_ROW divisor, calibrated on
            # IN-MEMORY relation stats (~90 B/row) so it OVERestimates
            # rows there. A raw file scan's sizeInBytes is COMPRESSED
            # on-disk bytes — dictionary/RLE occurrence tables pack well
            # under 40 B/row, which would UNDERcount rows and let the
            # per-bucket working set blow past BUCKET_TARGET_BYTES — so
            # file-backed plans inflate the estimate first (more
            # buckets, never fewer). A count job runs only when no
            # estimate exists.
            from bigartm_spark.session import (
                FILE_SCAN_EST_EXPANSION,
                estimated_plan_bytes,
                plan_reads_files,
            )

            sc = docs.sparkSession.sparkContext
            est = estimated_plan_bytes(docs)
            if est is not None and plan_reads_files(docs):
                est *= FILE_SCAN_EST_EXPANSION
            approx_rows = (
                est // CORPUS_BYTES_PER_ROW if est is not None else docs.count()
            )
            self.num_buckets = estep.choose_num_buckets(
                approx_rows, len(self.topics), sc.defaultParallelism
            )
        prepared = None
        if num_collection_passes > 1:
            # hoist the pass-invariant half (class weights, cp join,
            # projection, bucket shuffle) out of the loop: one corpus
            # shuffle per FIT, each pass's groupBy elides its exchange
            # against the cached hash-partitioned layout
            prepared = estep.prepare_corpus(
                docs,
                self.num_buckets,
                class_weights=self.class_weights,
                collection_probs=self._collection_probs(),
                need_pos=bool(self.ptdw_agents),
                transaction_mode=bool(self.transaction_typenames),
            )
        try:
            for _ in range(num_collection_passes):
                self._one_pass(docs, kernel_docs=prepared)
        finally:
            if prepared is not None:
                prepared.unpersist()
        estep.release_phi_broadcasts()  # nothing in flight after the loop
        return self

    def _collection_probs(self) -> DataFrame | None:
        """Dictionary global token frequencies for any attached
        UnigramCollectionModel perplexity (PerplexityScore(dictionary=...)):
        (class_id, token, cp) with cp = the gathered token value
        (tf / class-total tf — the reference's collection model,
        perplexity.cc:159-239)."""
        from pyspark.sql import functions as F

        for cfg in getattr(self, "scores", []):
            d = getattr(cfg, "dictionary", None)
            if d is not None and type(cfg).__name__ == "PerplexityScore":
                from bigartm_spark.dictionary import unwrap_dictionary

                return unwrap_dictionary(d).select(
                    "class_id", "token", F.col("value").alias("cp")
                )
        return None

    def _resolve_doc_scoped_agents(self, docs: DataFrame) -> None:
        """Resolve doc_titles on attached SmoothSparseTheta configs to
        kernel doc ids against THIS corpus (the kernel rows carry ids,
        not titles). Memoized per (docs, titles) so repeated passes pay
        one lookup; a no-op when no config is doc-scoped."""
        for c in getattr(self, "regularizers", []):
            hook = getattr(c, "_resolve_token_order", None)
            if hook is not None:
                hook(self)  # H12 default time axis from the dictionary
        # doc_titles=None -> not doc-scoped; doc_titles=[] (explicitly
        # empty) -> the reference applies doc_topic_coef to ALL items
        # (smooth_sparse_theta.cc: empty item scope = no item filter)
        cfgs = [
            c
            for c in getattr(self, "regularizers", [])
            if getattr(c, "doc_titles", None) is not None
        ]
        if not cfgs:
            return
        import numpy as np
        from pyspark.sql import functions as F

        key = (
            id(docs),
            tuple(
                (tuple(c.doc_titles), repr(getattr(c, "doc_topic_coef", None)))
                for c in cfgs
            ),
        )
        if getattr(self, "_doc_scope_key", None) == key:
            return
        titles = sorted({t for c in cfgs for t in c.doc_titles})
        by_title = {}
        if titles:
            rows = (
                docs.filter(F.col("title").isin(titles))
                .select("doc_id", "title")
                .distinct()
                .collect()
            )
            by_title = {r["title"]: r["doc_id"] for r in rows}
        for c in cfgs:
            eng = c._engine
            coef = c.doc_topic_coef
            if not c.doc_titles:
                # all-items scope: clear any stale id scope and apply
                # the (T,) coefficient vector to every document
                eng.doc_ids = None
                eng.doc_topic_coef = (
                    np.asarray(coef, dtype=float) if coef is not None else None
                )
                continue
            ids = [by_title[t] for t in c.doc_titles if t in by_title]
            eng.doc_ids = np.array(ids, dtype=np.int64)
            if coef is None:
                eng.doc_topic_coef = None
            elif isinstance(coef[0], (list, tuple, np.ndarray)):
                # list-of-lists aligned with doc_titles -> per-doc map
                eng.doc_topic_coef = {
                    by_title[t]: np.asarray(cf, dtype=float)
                    for t, cf in zip(c.doc_titles, coef)
                    if t in by_title
                }
            else:
                eng.doc_topic_coef = np.asarray(coef, dtype=float)
        self._doc_scope_key = key

    def _one_pass(
        self,
        docs: DataFrame,
        decay_weight: float = 0.0,
        apply_weight: float = 1.0,
        kernel_docs: DataFrame | None = None,
    ):
        # kernel_docs: a prepare_corpus() relation for the E-step kernel
        # (pass-invariant work pre-done + cached); docs keeps the full
        # schema for title-scoped regularizer resolution and score
        # recomputation
        self._resolve_doc_scoped_agents(docs)
        # class-scoped scores (PerplexityScore class_ids) recompute over
        # the fit corpus after the update; a plain reference, no action
        self._last_fit_docs = docs
        kernel_out = estep.process_batches(
            kernel_docs if kernel_docs is not None else docs,
            self.pwt,
            num_document_passes=self.num_document_passes,
            class_weights=self.class_weights,
            theta_agents=self.theta_agents,
            emit_nwt=True,
            emit_theta=self.cache_theta,
            compute_scores=True,
            collection_probs=self._collection_probs(),
            broadcast_phi=getattr(self, "_broadcast_phi", True),
            num_buckets=self.num_buckets,
            ptdw_agents=self.ptdw_agents or None,
            transaction_mode=bool(self.transaction_typenames),
            transaction_weights=self.transaction_typenames,
            theta_cache=(
                estep.theta_to_cache(self.theta, self.topics)
                if self.reuse_theta and self.theta is not None
                else None
            ),
            phi_local=getattr(self, "_phi_local", None),
        )
        if self.cache_theta:
            # the theta extraction re-reads the kernel output -> cache it
            kernel_out = kernel_out.cache()
            self._merge_and_normalize(kernel_out, decay_weight, apply_weight)
        else:
            # single-action pass: scores ride an Observation on the same
            # job that materializes the new phi — no cache of the kernel
            # relation, no second scores job
            obs, observed = estep.attach_score_observation(kernel_out)
            self._merge_and_normalize(
                observed, decay_weight, apply_weight, score_observation=obs
            )

    # -- G6 ---------------------------------------------------------------
    def fit_online(
        self,
        doc_groups=None,
        tau0: float = 1024.0,
        kappa: float = 0.7,
        update_every: int = 1,
        batch_vectorizer=None,
    ) -> "ARTM":
        """Online EM: after each batch group, n_wt <- decay*n_wt + apply*n̂;
        rho = (tau0 + t)^-kappa (python/artm/artm_model.py:652-659).

        doc_groups may be a pre-split list of DataFrames, or a docs
        DataFrame / BatchVectorizer — then groups are cut by batch_id
        with update_every batches per group (the reference signature
        fit_online(batch_vectorizer, update_every=...))."""
        if doc_groups is None:
            doc_groups = batch_vectorizer  # reference kwarg spelling
        if not isinstance(doc_groups, list):
            from bigartm_spark.streaming.online import split_batch_groups

            doc_groups = split_batch_groups(
                _as_docs(doc_groups), update_every=update_every
            )
        self._autosize_buckets(doc_groups)
        if doc_groups:
            from functools import reduce

            self._theta_titles = reduce(
                lambda a, b: a.unionByName(b),
                [g.select("doc_id", "title") for g in doc_groups],
            )
        t = 0
        for group in doc_groups:
            t += update_every
            rho = math.pow(tau0 + t, -kappa)
            self._one_pass(group, decay_weight=1.0 - rho, apply_weight=rho)
            self._num_online_processed_batches += update_every
        estep.release_phi_broadcasts()  # nothing in flight after the loop
        return self

    def _autosize_buckets(self, doc_groups: list[DataFrame]) -> None:
        """Same bucket sizing as fit_offline, from the first group's nnz
        (groups are equal-sized slices by construction; one count,
        amortized over all groups and passes)."""
        if self.num_buckets is None and doc_groups:
            sc = doc_groups[0].sparkSession.sparkContext
            self.num_buckets = estep.choose_num_buckets(
                doc_groups[0].count(), len(self.topics), sc.defaultParallelism
            )

    # -- G7 ---------------------------------------------------------------
    def fit_online_async(
        self,
        doc_groups: list[DataFrame],
        tau0: float = 1024.0,
        kappa: float = 0.7,
        update_every: int = 1,
    ) -> "ARTM":
        """G7 async online EM (master_component.cc:1387-1439): the E-step
        of group k+1 overlaps the merge/normalize of group k, so group k+1
        is processed against the *previous* phi (the reference's
        "deferred await" — results differ slightly from the synchronous
        algorithm, exactly as upstream documents). Spark jobs submitted
        from separate Python threads run concurrently in one session."""
        import math as _math
        from concurrent.futures import ThreadPoolExecutor

        self._autosize_buckets(doc_groups)

        def launch(group, pwt, theta_cache, phi_local):
            # phi (and its driver copy) and theta-cache are captured AT
            # SUBMIT TIME: the main thread reassigns self.pwt
            # concurrently in _merge_and_normalize, so reading it here
            # would make "stale or fresh phi" timing-dependent instead
            # of the reference's deterministic deferred scheme
            out = estep.process_batches(
                group,
                pwt,
                num_document_passes=self.num_document_passes,
                class_weights=self.class_weights,
                theta_agents=self.theta_agents,
                emit_nwt=True,
                emit_theta=self.cache_theta,
                compute_scores=True,
                broadcast_phi=getattr(self, "_broadcast_phi", True),
                num_buckets=self.num_buckets,
                theta_cache=theta_cache,
                phi_local=phi_local,
            ).cache()
            out.count()  # materialize in the background thread
            return out

        def theta_cache_df():
            return (
                estep.theta_to_cache(self.theta, self.topics)
                if self.reuse_theta and self.theta is not None
                else None
            )

        t = 0
        retired: list = []  # phis awaiting unpersist (in-flight E-step may hold them)
        with ThreadPoolExecutor(max_workers=1) as pool:
            pending = pool.submit(
                launch, doc_groups[0], self.pwt, theta_cache_df(),
                getattr(self, "_phi_local", None),
            )
            for k in range(len(doc_groups)):
                kernel_out = pending.result()
                # the E-step that captured any retired phi has completed
                for old in retired:
                    try:
                        old.compact.unpersist()
                    except Exception:
                        pass
                retired.clear()
                if k + 1 < len(doc_groups):
                    # launched BEFORE this group's merge -> stale phi by design
                    pending = pool.submit(
                        launch, doc_groups[k + 1], self.pwt, theta_cache_df(),
                        getattr(self, "_phi_local", None),
                    )
                t += update_every
                self._num_online_processed_batches += update_every
                rho = _math.pow(tau0 + t, -kappa)
                old_pwt = self.pwt
                self._merge_and_normalize(
                    kernel_out, decay_weight=1.0 - rho, apply_weight=rho,
                    unpersist_old=False,
                )
                retired.append(old_pwt)
        for old in retired:
            try:
                old.compact.unpersist()
            except Exception:
                pass
        estep.release_phi_broadcasts()  # pool drained: nothing in flight
        return self

    def _merge_and_normalize(
        self,
        kernel_out,
        decay_weight: float,
        apply_weight: float,
        unpersist_old: bool = True,
        score_observation=None,
    ):
        """M-step half of a pass given a materialized kernel output."""
        nwt_df = estep.aggregate_nwt(kernel_out, len(self.topics))
        nwt_new = PhiMatrix("nwt", self.topics, nwt_df)
        if decay_weight != 0.0 and self.nwt is not None:
            nwt_new = mstep.merge_nwt(
                [(self.nwt, decay_weight), (nwt_new, apply_weight)], "nwt"
            )
        # else: FIRST online update seeds n_wt from the raw E-step output
        # (self.nwt is None until a pass runs — InitializeModel's n_wt is
        # a normalized seed, not prior mass). Documented divergence from
        # the reference, which folds update 1 against the initialized
        # n_wt: n1_ref = (1-rho1)*n_init + rho1*nhat1. The schedules
        # converge geometrically after a few updates; the G6 oracle in
        # plans/driver_queries.py replays THIS convention.
        # LAZY localCheckpoint: materialized by this pass's existing
        # action (the pwt collect/checkpoint reads nwt), no extra job —
        # and it bounds nwt lineage, which otherwise chains across
        # online passes (nwt_k references nwt_{k-1}'s whole kernel, so
        # pass k would recompute every earlier E-step: O(k^2) work on a
        # long online run; offline reads of m.nwt get cheap too)
        self.nwt = PhiMatrix(
            nwt_new.name,
            nwt_new.topics,
            nwt_new.compact.localCheckpoint(eager=False),
        )
        old_pwt = self.pwt
        if (
            getattr(self, "_broadcast_phi", False)
            and not self.phi_regularizers
            and not self.phi_transforms
        ):
            # Unregularized pass in the broadcast regime: normalize IN
            # NUMPY on the collected nwt instead of running a Spark
            # totals-agg + broadcast-join + projection (measured ~0.5s
            # of pure job overhead per pass at sf0.1). The pass's ONE
            # Spark action becomes the nwt collect — the score
            # Observation rides it and it materializes the lazy
            # localCheckpoint, so later distributed reads of self.nwt
            # stay free. normalize_local is the shared driver twin of
            # mstep.normalize (B8 clamp, p=0 when class total <= 0).
            import numpy as np

            from bigartm_spark.model.mstep import normalize_local

            pdf = self.nwt.compact.toPandas()
            mat = (
                np.stack(pdf["values"].to_numpy())
                if len(pdf)
                else np.zeros((0, len(self.topics)))
            )
            cls_np = pdf["class_id"].to_numpy()
            tok_np = pdf["token"].to_numpy()
            mat = normalize_local(cls_np, mat)
            self.pwt = LocalPhiMatrix(
                "pwt",
                self.topics,
                kernel_out.sparkSession,
                cls_np,
                tok_np,
                mat,
            )
            self._phi_local = (cls_np, tok_np, mat)
            self._finish_pass(
                kernel_out, old_pwt, unpersist_old, score_observation
            )
            return
        ctx = RegularizeContext(
            dictionary=self.dictionary,
            topic_totals=mstep.topic_totals(self.nwt)
            if self.phi_regularizers
            else None,
        )
        rwt_df = regularize(self.pwt, self.nwt, self.phi_regularizers, ctx)
        new_pwt = mstep.normalize(self.nwt, rwt_df, name="pwt")
        for transform in self.phi_transforms:
            new_pwt = transform(new_pwt)
        if getattr(self, "_broadcast_phi", False):
            # broadcast regime: phi fits the driver by definition
            # (should_broadcast_phi gated it), so the pass's ONE action
            # is a toPandas collect of the new phi — the Observation
            # rides it, the driver copy feeds the next pass's broadcast
            # with no extra collect job, and pwt becomes a local
            # relation (lineage-free by construction: no checkpoint
            # write, no executor blocks to reclaim).
            import numpy as np

            pdf = new_pwt.compact.toPandas()
            mat = (
                np.stack(pdf["values"].to_numpy())
                if len(pdf)
                else np.zeros((0, len(self.topics)))
            )
            cls_np = pdf["class_id"].to_numpy()
            tok_np = pdf["token"].to_numpy()
            self.pwt = LocalPhiMatrix(
                "pwt",
                self.topics,
                kernel_out.sparkSession,
                cls_np,
                tok_np,
                mat,
            )
            self._phi_local = (cls_np, tok_np, mat)
        else:
            self.pwt = new_pwt.checkpoint()
        self._finish_pass(kernel_out, old_pwt, unpersist_old, score_observation)

    def _finish_pass(
        self, kernel_out, old_pwt, unpersist_old, score_observation
    ):
        """Shared pass epilogue: score extraction, theta cache, old-phi
        reclamation, tracker bookkeeping."""
        if unpersist_old and old_pwt is not None:
            old_pwt.release()  # no-op materialization for lazy local phi
        if score_observation is not None:
            # the checkpoint above consumed the kernel relation; the
            # observation already carries the summed score partials
            scores = estep.scores_from_observation(score_observation)
        else:
            scores = estep.extract_scores(kernel_out)
        if self.cache_theta:
            theta = estep.extract_theta(kernel_out, self.topics)
            if self.theta_cache_path:
                # disk state table (the reference's theta disk cache)
                theta.write.mode("overwrite").parquet(self.theta_cache_path)
                self.theta = theta.sparkSession.read.parquet(
                    self.theta_cache_path
                )
            else:
                self.theta = theta.localCheckpoint(eager=True)
        try:
            kernel_out.unpersist()
        except Exception:
            pass
        # the checkpoint/extractions above consumed this pass's kernel
        # relation; reclaim all but the newest phi broadcast (the newest
        # may belong to an overlapped async E-step still in flight —
        # keeping one handle costs <=256MB, and release_phi_broadcasts
        # is unpersist-not-destroy so even that would only re-ship)
        estep.release_phi_broadcasts(keep_last=1)
        # a configured score owning a built-in kernel key (e.g.
        # PerplexityScore(name='perplexity')) is the single writer for
        # that tracker — otherwise the raw kernel value and the config's
        # (possibly dictionary-fallback) value would interleave in one
        # list (reference: only explicitly attached scores are tracked)
        cfg_names = {c.name for c in getattr(self, "scores", [])}
        for k, v in scores.items():
            if k not in cfg_names:
                self._tracker_append(k, v)
        for name, fn in self.phi_scores.items():
            self._tracker_append(name, float(fn(self.pwt)))
        self._collect_configured_scores(scores)
        self._num_phi_updates += 1

    def _tracker_append(self, key: str, value) -> None:
        lst = self.score_tracker.get(key)
        if lst is None:
            from bigartm_spark.model.api import ScoreTrackerList

            lst = ScoreTrackerList(name=key, store=self.score_tracker)
            self.score_tracker[key] = lst
        lst.append(value)

    def _collect_configured_scores(self, pass_scores: dict) -> None:
        """Evaluate every attached class-based score after a phi update
        (score_tracker.py semantics: one record per synchronization);
        extra per-score fields live as <name>__<field> siblings that the
        tracker resolves via attribute access."""
        for cfg in getattr(self, "scores", []):
            rec = cfg.collect(self, pass_scores)
            if "value" in rec:
                self._tracker_append(cfg.name, rec.pop("value"))
            for field, v in rec.items():
                self._tracker_append(f"{cfg.name}__{field}", v)

    # -- G4 ---------------------------------------------------------------
    def transform(
        self,
        docs=None,
        theta_matrix_type: str = "dense_theta",
        predict_class_id: str | None = None,
        batch_vectorizer=None,
    ) -> DataFrame | None:
        """theta for new docs without touching nwt (pure E-step).

        The RETURN TYPE follows the input style, documented loudly
        because it is the one place the front door branches:

        - a docs **DataFrame** returns the DISTRIBUTED long relation —
          transform output scales with the corpus (the 100 TB path), so
          Spark-first callers never pay a driver collect;
        - a **BatchVectorizer** (how every reference script calls it,
          artm_model.py:976-1039) returns the reference's pandas
          ThetaMatrix (topics rows x document columns) for
          'dense_theta', matching get_theta().

        theta_matrix_type: 'dense_theta' — theta; 'dense_ptdw' — the
        flat p(t|d,w) relation (doc_id, pos, topic, value), one row per
        token position in input order (long in both styles); 'cache' —
        populate self.theta and return it; None — run the pass for its
        side effects only."""
        if docs is None:
            docs = batch_vectorizer  # reference kwarg spelling
        if predict_class_id is not None:
            # artm_model.py:982-987: p(c|d) over the target modality's
            # labels instead of theta
            return self.predict_class_id(_as_docs(docs), predict_class_id)
        if theta_matrix_type not in ("dense_theta", "dense_ptdw", "cache", None):
            raise ValueError(
                "theta_matrix_type should be 'dense_theta', 'dense_ptdw', "
                "'cache', or None"
            )
        want_ptdw = theta_matrix_type == "dense_ptdw"
        if theta_matrix_type == "cache":
            self._theta_titles = _as_docs(docs).select("doc_id", "title")
        kernel_out = estep.process_batches(
            _as_docs(docs),
            self.pwt,
            num_document_passes=self.num_document_passes,
            class_weights=self.class_weights,
            theta_agents=self.theta_agents,
            ptdw_agents=self.ptdw_agents or None,
            emit_nwt=False,
            emit_theta=not want_ptdw,
            emit_ptdw=want_ptdw,
            compute_scores=False,
            broadcast_phi=getattr(self, "_broadcast_phi", True),
            phi_local=getattr(self, "_phi_local", None),
        )
        if want_ptdw:
            return estep.extract_ptdw(kernel_out, self.topics)
        theta = estep.extract_theta(kernel_out, self.topics)
        if theta_matrix_type == "cache":
            self.theta = theta.localCheckpoint(eager=True)
            return self.theta
        if theta_matrix_type is None:
            theta.count()  # materialize the pass, return nothing
            return None
        if not isinstance(docs, DataFrame):
            # BatchVectorizer input = reference calling style -> the
            # reference pandas ThetaMatrix (see docstring)
            import pandas as pd

            pdf = theta.toPandas()
            colkey = "doc_id"
            if self.theta_columns_naming == "title":
                titles = (
                    _as_docs(docs)
                    .select("doc_id", "title")
                    .dropDuplicates(["doc_id"])
                    .toPandas()
                )
                pdf = pdf.merge(titles, on="doc_id", how="left")
                colkey = "title"
            wide = pdf.pivot_table(
                index="topic", columns=colkey, values="value",
                aggfunc="first", fill_value=0.0,
            )
            wide = wide.loc[[t for t in self.topics if t in wide.index]]
            wide.index.name = None
            wide.columns.name = None
            return wide
        return theta

    def predict_class_id(self, docs: DataFrame, class_id: str) -> DataFrame:
        """p(c|d) over label-modality tokens: theta ⋈ phi[label tokens] +
        argmax (processor_helpers.cc:27-42)."""
        from pyspark.sql import functions as F

        theta = self.transform(docs).withColumnRenamed("value", "_theta_v")
        labels = (
            self.pwt.to_long()
            .filter(F.col("class_id") == class_id)
            .withColumnRenamed("value", "_phi_v")
        )
        scored = (
            theta.join(F.broadcast(labels), "topic")
            .groupBy("doc_id", "token")
            .agg(F.sum(F.col("_theta_v") * F.col("_phi_v")).alias("p"))
        )
        from pyspark.sql import Window

        w = Window.partitionBy("doc_id").orderBy(F.desc("p"), F.asc("token"))
        return (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("doc_id", F.col("token").alias("predicted"), "p")
        )

    # -- lifecycle (G8/G10/G13/G14/G15) -------------------------------------
    def overwrite_topic_model(self, phi_long: DataFrame) -> "ARTM":
        """G8 OverwriteTopicModel: replace pwt values from a long COO
        relation (master_component.cc:1090-1102)."""
        self.pwt = PhiMatrix.from_long("pwt", self.topics, phi_long).cache()
        return self

    def reshape_topics(self, new_topics: list[str]) -> "ARTM":
        """G10/F3: drop removed topics' columns, zero-fill added ones,
        reorder by name (master_component.cc:193-221)."""
        from pyspark.sql import functions as F

        old = {t: i for i, t in enumerate(self.topics)}
        cols = [
            F.col("values")[old[t]] if t in old else F.lit(0.0)
            for t in new_topics
        ]
        for m in ("pwt", "nwt"):
            mat = getattr(self, m)
            if mat is None:
                continue
            setattr(
                self,
                m,
                PhiMatrix(
                    mat.name,
                    list(new_topics),
                    mat.compact.select(
                        "class_id", "token", F.array(*cols).alias("values")
                    ),
                ),
            )
        self.topics = list(new_topics)
        return self

    def rekey_tokens(self, dictionary: DataFrame) -> "ARTM":
        """G10/F2: restrict model rows to a new dictionary's token set
        (left-semi join); tokens new to the model get zero rows."""
        from pyspark.sql import functions as F

        keys = dictionary.select("class_id", "token")
        kept = self.pwt.compact.join(keys, ["class_id", "token"], "left_semi")
        missing = keys.join(
            self.pwt.compact.select("class_id", "token"),
            ["class_id", "token"],
            "left_anti",
        ).select(
            "class_id",
            "token",
            F.array(*[F.lit(0.0)] * len(self.topics)).alias("values"),
        )
        self.pwt = PhiMatrix("pwt", self.topics, kept.unionByName(missing))
        self.dictionary = dictionary
        return self

    # reference method names (artm_model.py:1104-1143)
    def reshape_tokens(self, dictionary: DataFrame) -> "ARTM":
        return self.rekey_tokens(dictionary)

    def reshape(
        self,
        topic_names: list[str] | None = None,
        dictionary: DataFrame | None = None,
    ) -> "ARTM":
        """Combined reshape (artm_model.py:1119-1143): exactly one of
        topic_names / dictionary, as the reference enforces."""
        if (topic_names is None) == (dictionary is None):
            raise ValueError(
                "give exactly one of topic_names or dictionary"
            )
        if topic_names is not None:
            return self.reshape_topics(topic_names)
        return self.rekey_tokens(dictionary)

    def duplicate(self) -> "ARTM":
        """G13: DataFrames are immutable — a shallow copy of the named
        object map is a deep copy semantically (c_interface.cc:251-261)."""
        import copy

        from bigartm_spark.model.api import (
            Regularizers,
            Scores,
            ScoreTrackerList,
        )

        clone = copy.copy(self)
        clone.score_tracker = {}
        for k, v in self.score_tracker.items():
            clone.score_tracker[k] = ScoreTrackerList(
                v, name=k, store=clone.score_tracker
            )
        # engine lists and containers must not alias the original's
        # (adding a regularizer to the clone must leave the source alone)
        clone.phi_regularizers = list(self.phi_regularizers)
        clone.theta_agents = list(self.theta_agents)
        clone.phi_transforms = list(self.phi_transforms)
        clone.ptdw_agents = list(getattr(self, "ptdw_agents", []))
        clone.scores = Scores(clone)
        clone.scores._data = dict(self.scores._data)
        clone.regularizers = Regularizers(clone)
        clone.regularizers._data = dict(self.regularizers._data)
        return clone

    def clone(self) -> "ARTM":
        """Reference alias for duplicate (artm_model.py:317)."""
        return self.duplicate()

    def dump_artm_model(self, data_path: str) -> None:
        """Reference method spelling (artm_model.py:1154-1166): dump the
        whole model into a fresh folder; load back with the module-level
        ``load_artm_model`` like reference scripts do."""
        from bigartm_spark.sources.dump import dump_artm_model

        dump_artm_model(self, data_path)

    def save(self, filename: str, model_name: str = "p_wt") -> None:
        """Save one Phi-like matrix (artm_model.py:682-702). 'p_wt' or
        'n_wt'; a .bin/.model filename writes the reference's binary
        chunked format, anything else a parquet export dir."""
        from bigartm_spark.sources.io import export_model

        mat = self._named_matrix(model_name)
        if mat is None:
            raise RuntimeError(
                "Model does not exist yet. Use ARTM.initialize()/ARTM.fit_*()"
            )
        export_model(mat, filename)

    def load(self, filename: str, model_name: str = "p_wt") -> None:
        """Load a matrix saved by save() (artm_model.py:703-748).
        Reference semantics preserved: topic names are overwritten from
        the file and the score tracker is emptied."""
        from pyspark.sql import SparkSession

        from bigartm_spark.sources.io import import_model

        # getActiveSession is thread-local; fall back to the default
        # session so load() works from any caller thread
        spark = (
            SparkSession.getActiveSession()
            or SparkSession.builder.getOrCreate()
        )
        mat = import_model(spark, filename)
        if model_name not in ("p_wt", "pwt", "n_wt", "nwt"):
            raise ValueError(f"unknown matrix name {model_name!r}")
        if model_name in ("n_wt", "nwt"):
            self.nwt = mat
        else:
            self.pwt = mat.cache()
            self.topics = list(mat.topics)
            self._broadcast_phi = estep.should_broadcast_phi(
                mat.compact.count(), len(mat.topics)
            )
        self.score_tracker = {}

    def _named_matrix(self, model_name: str) -> PhiMatrix | None:
        if model_name in ("p_wt", "pwt"):
            return self.pwt
        if model_name in ("n_wt", "nwt"):
            return self.nwt
        raise ValueError(f"unknown matrix name {model_name!r}")

    def remove_theta(self) -> None:
        """Drop the cached theta matrix (artm_model.py:962-967)."""
        self.theta = None

    def get_score(self, score_name: str):
        """Latest value of a tracked score (artm_model.py:968-975).

        A score attached AFTER fitting (the reference's
        scores.add(...); get_score(name) workflow, e.g. LDA's
        get_top_tokens) has no tracked history yet: it is evaluated NOW
        against the current matrices and its full record dict returned
        (phi-side scores only — kernel-side partials exist only during a
        pass)."""
        if score_name not in self.score_tracker and score_name in getattr(
            self, "scores", ()
        ):
            rec = self.scores[score_name].collect(self, {})
            self._tracker_append(score_name, rec.pop("value", float("nan")))
            for field, v in rec.items():
                self._tracker_append(f"{score_name}__{field}", v)
            return self.score_tracker[score_name][-1]
        if score_name not in self.score_tracker:
            raise KeyError(
                f"score {score_name!r} not tracked; have "
                f"{sorted(self.score_tracker)}"
            )
        return self.score_tracker[score_name][-1]

    @property
    def library_version(self) -> str:
        from bigartm_spark import __version__

        return __version__

    def dispose(self):
        """G14: drop cached state."""
        for mat in (self.pwt, self.nwt):
            if mat is not None:
                try:
                    mat.compact.unpersist()
                except Exception:
                    pass
        estep.release_phi_broadcasts()
        self.pwt = self.nwt = self.theta = None

    def info(self) -> dict:
        """G15 MasterComponentInfo: object inventory + sizes. Keys mirror
        the reference info message's field names (master_component_info:
        config.topic_name, score, regularizer, cache_entry) alongside the
        engine-native inventory."""
        out = {
            "topics": list(self.topics),
            "num_topics": len(self.topics),
            "num_document_passes": self.num_document_passes,
            "regularizers": [type(r).__name__ for r in self.phi_regularizers],
            "theta_agents": [type(a).__name__ for a in self.theta_agents],
            "score_tracker_keys": sorted(self.score_tracker),
            # reference-field aliases (test_artm_model.py:99-104 reads
            # info.config.topic_name / info.score / info.regularizer /
            # info.cache_entry)
            "topic_name": list(self.topics),
            "score": sorted(
                set(self.score_tracker)
                | {s.name for s in getattr(self, "scores", [])}
            ),
            "regularizer": [
                r.name for r in getattr(self, "regularizers", [])
            ],
            "cache_entry": (
                self.theta.select("doc_id").distinct().count()
                if self.theta is not None
                else 0
            ),
        }
        if self.pwt is not None:
            out["phi_rows"] = self.pwt.compact.count()
        if self.dictionary is not None:
            out["dictionary_rows"] = self.dictionary.count()
        return out

    # -- retrieval (B6) ----------------------------------------------------
    def get_phi_long(
        self,
        eps: float | None = None,
        topic_names: list[str] | None = None,
        class_ids: list[str] | None = None,
        tokens: list[str] | None = None,
    ) -> DataFrame:
        """The Spark-first phi readout (our extension): the DISTRIBUTED
        long COO relation (class_id, token, topic, value) with
        GetTopicModelArgs filters (phi_matrix_operations.cc:93-190) —
        select by topic / class / token; eps>0 drops near-zeros. Use
        this for vocabulary-scale pipelines; ``get_phi()`` is the
        reference-faithful pandas frame and collects to the driver."""
        from pyspark.sql import functions as F

        out = self.pwt.to_long(eps=eps)
        if topic_names is not None:
            out = out.filter(F.col("topic").isin(list(topic_names)))
        if class_ids is not None:
            out = out.filter(F.col("class_id").isin(list(class_ids)))
        if tokens is not None:
            out = out.filter(F.col("token").isin(list(tokens)))
        return out

    def get_phi(
        self,
        topic_names: list[str] | None = None,
        class_ids: list[str] | None = None,
        model_name: str | None = None,
    ):
        """Reference get_phi (artm_model.py:787-813): pandas frame with
        one row per (class_id, token) tuple and one column per topic.
        Collects the dense matrix to the driver — the reference
        contract; distributed callers use ``get_phi_long()``."""
        import pandas as pd

        if isinstance(topic_names, str):
            topic_names = [topic_names]
        if isinstance(class_ids, str):
            class_ids = [class_ids]
        nd_array, tokens, cols = self.get_phi_dense(
            topic_names=topic_names, class_ids=class_ids,
            model_name=model_name,
        )
        return pd.DataFrame(data=nd_array, columns=cols, index=tokens)

    def get_theta_long(
        self,
        topic_names: list[str] | None = None,
        eps: float | None = None,
        docs: DataFrame | None = None,
    ) -> DataFrame:
        """The DISTRIBUTED cached-theta readout (our extension) with
        GetThetaMatrixArgs filters (artm_model.py:875-962): select
        topics, eps>0 = sparse COO layout (the reference's
        get_theta_sparse). ``get_theta()`` is the reference-faithful
        pandas frame and collects to the driver.

        theta_columns_naming == 'title' (artm_model.py:503-509): pass the
        corpus ``docs`` and each row gains a ``doc_title`` column joined
        from the corpus ``title`` (the reference keys theta columns by
        item title in this mode; our long layout carries it as a column)."""
        if self.theta is None:
            raise RuntimeError("cache_theta is off; use transform()")
        from pyspark.sql import functions as F

        out = self.theta
        if topic_names is not None:
            out = out.filter(F.col("topic").isin(list(topic_names)))
        if eps is not None:
            out = out.filter(F.col("value") > eps)
        if self.theta_columns_naming == "title" and docs is not None:
            # |titles| == |docs| — same axis as theta, so no forced
            # broadcast; AQE picks the strategy at actual sizes
            titles = docs.select("doc_id", F.col("title").alias("doc_title"))
            titles = titles.dropDuplicates(["doc_id"])
            out = out.join(titles, "doc_id", "left")
        return out

    def get_theta(self, topic_names: list[str] | None = None):
        """Reference get_theta (artm_model.py:875-911): pandas frame,
        topics as rows, one column per document — ids, or titles when
        theta_columns_naming == 'title' (titles captured from the fit
        corpus). Collects to the driver (the reference contract);
        distributed callers use ``get_theta_long()``."""
        import pandas as pd

        if isinstance(topic_names, str):
            topic_names = [topic_names]
        long = self.get_theta_long(topic_names=topic_names)
        if getattr(self, "_parent_model", None) is not None:
            # hierarchy child level: the reference's ARTM_Level.get_theta
            # drops the parent pseudo-doc columns
            # (hierarchy_utils.py:662-681); psi reads them via get_psi()
            from pyspark.sql import functions as F

            long = long.filter(F.col("doc_id") >= 0)
        colkey = "doc_id"
        titles = getattr(self, "_theta_titles", None)
        if self.theta_columns_naming == "title" and titles is not None:
            from pyspark.sql import functions as F

            long = long.join(
                titles.select(
                    "doc_id", F.col("title").alias("doc_title")
                ).dropDuplicates(["doc_id"]),
                "doc_id",
                "left",
            )
            colkey = "doc_title"
        pdf = long.toPandas()
        wide = pdf.pivot_table(
            index="topic", columns=colkey, values="value",
            aggfunc="first", fill_value=0.0,
        )
        rows = [t for t in (topic_names or self.topics) if t in wide.index]
        wide = wide.loc[rows]
        wide.index.name = None
        wide.columns.name = None
        return wide

    def transform_sparse(self, docs: DataFrame, eps: float = 1e-37) -> DataFrame:
        """transform with the sparse retrieval layout
        (artm_model.py:1040-1058; default eps = the retrieval epsilon,
        messages.proto:610)."""
        from pyspark.sql import functions as F

        return self.transform(docs).filter(F.col("value") > eps)

    # -- reference-name properties (artm_model.py:333-534) -----------------
    @property
    def num_topics(self) -> int:
        """artm_model.py:357-359."""
        return len(self.topics)

    @property
    def topic_names(self) -> list[str]:
        """artm_model.py:361-381 / 503-509; the setter renames topics
        in-place. On a fitted model a rename is a pure relabel (the phi
        columns keep their order), unlike reshape_topics which matches
        by NAME (drops/zero-fills)."""
        return list(self.topics)

    @topic_names.setter
    def topic_names(self, names: list[str]) -> None:
        if not names:
            raise ValueError("topic_names must be non-empty")
        if self.pwt is not None and len(names) != len(self.topics):
            raise ValueError(
                "renaming a fitted model needs the same topic count; use "
                "reshape_topics to add/drop topics"
            )
        self.topics = list(names)
        for m in ("pwt", "nwt"):
            mat = getattr(self, m)
            if mat is not None:
                setattr(self, m, PhiMatrix(mat.name, list(names), mat.compact))

    @property
    def class_ids(self) -> dict[str, float] | None:
        """Reference name for the modality-weight map (artm_model.py:383-385)."""
        return self.class_weights

    @class_ids.setter
    def class_ids(self, weights: dict[str, float] | None) -> None:
        self.class_weights = weights

    @property
    def theta_columns_naming(self) -> str:
        """'id' | 'title' (artm_model.py:503-509)."""
        return self._theta_columns_naming

    @theta_columns_naming.setter
    def theta_columns_naming(self, naming: str) -> None:
        if naming not in ("id", "title"):
            raise ValueError("theta_columns_naming should be 'id' or 'title'")
        self._theta_columns_naming = naming

    @property
    def num_phi_updates(self) -> int:
        """How many times phi was recomputed (artm_model.py:419-421)."""
        return self._num_phi_updates

    @property
    def num_online_processed_batches(self) -> int:
        """artm_model.py:423-425 / 488-494."""
        return self._num_online_processed_batches

    @property
    def num_processors(self) -> int:
        """The reference's worker-thread count maps to Spark default
        parallelism (artm_model.py:333-334; read-only here — the cluster
        manager owns task slots, not the model object)."""
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        return spark.sparkContext.defaultParallelism if spark else 0

    # matrix-name surface (artm_model.py:403-421): the reference
    # addresses matrices by string name inside the master component; our
    # named objects are attributes, but the names remain the API keys
    # for save()/get_phi(model_name=...) parity
    @property
    def model_pwt(self) -> str:
        return "pwt"

    @property
    def model_nwt(self) -> str:
        return "nwt"

    @property
    def theta_name(self) -> str:
        return getattr(self, "_theta_name", "theta")

    @property
    def phi_(self):
        """Dense pandas phi, topics as columns (artm_model.py:435-440).
        Collects to the driver — valid for models that fit there (the
        same budget as the broadcast fast path); at larger vocab use
        get_phi_long(), which stays distributed."""
        return self.get_phi()

    def get_phi_dense(
        self,
        topic_names: list[str] | None = None,
        class_ids: list[str] | None = None,
        model_name: str | None = None,
    ):
        """Reference get_phi_dense (artm_model.py:749-786): 3-tuple of
        (nd_array, tokens, topic_names) — data as numpy, rows as
        (class_id, token) tuples, columns as topic names. Driver-side
        by contract (the reference returns an in-process matrix);
        distributed callers use get_phi_long()."""
        import numpy as np

        mat = self._named_matrix(model_name or "p_wt")
        df = mat.compact
        if class_ids is not None:
            from pyspark.sql import functions as F

            df = df.filter(F.col("class_id").isin(list(class_ids)))
        pdf = df.toPandas()
        # reference row order = the model's internal token order, which
        # is the dictionary's order at initialize. When the dictionary
        # was gathered against a vocab file the vocab_order column pins
        # it (dictionary_operations.cc:336-396) — reference scripts that
        # index phi positionally (test_regularizer_biterms.py:66-109)
        # rely on this; without a vocab file the order is arbitrary in
        # both engines.
        if (
            self.dictionary is not None
            and "vocab_order" in self.dictionary.columns
        ):
            order_pdf = self.dictionary.select(
                "class_id", "token", "vocab_order"
            ).toPandas()
            pdf = pdf.merge(order_pdf, on=["class_id", "token"], how="left")
            pdf = pdf.sort_values(
                ["vocab_order", "class_id", "token"],
                na_position="last",
                kind="mergesort",
            ).reset_index(drop=True)
        vals = (
            np.stack(pdf["values"].to_numpy())
            if len(pdf)
            else np.zeros((0, len(self.topics)))
        )
        tokens = list(zip(pdf["class_id"], pdf["token"]))
        cols = list(self.topics)
        if topic_names is not None:
            if isinstance(topic_names, str):
                topic_names = [topic_names]
            keep = [i for i, t in enumerate(cols) if t in set(topic_names)]
            vals = vals[:, keep]
            cols = [cols[i] for i in keep]
        return vals, tokens, cols

    def get_phi_sparse(
        self,
        eps: float = 1e-37,
        class_ids: list[str] | None = None,
        model_name: str | None = None,
    ):
        """(values, row_idx, col_idx, tokens, topics) COO arrays —
        artm_model.py:814-874 returns a scipy csr_matrix; scipy is not a
        dependency here, so the caller feeds these straight into
        scipy.sparse.coo_matrix((values, (row_idx, col_idx))) if they
        have it. Collects only the >eps entries."""
        import numpy as np
        from pyspark.sql import functions as F

        mat = self._named_matrix(model_name or "p_wt")
        df = mat.compact
        if class_ids is not None:
            df = df.filter(F.col("class_id").isin(list(class_ids)))
        pdf = df.select("class_id", "token").toPandas()
        tokens = list(zip(pdf["class_id"], pdf["token"]))
        long = mat.to_long(eps=eps)
        if class_ids is not None:
            long = long.filter(F.col("class_id").isin(list(class_ids)))
        lpdf = long.toPandas()
        row_of = {t: i for i, t in enumerate(tokens)}
        col_of = {t: i for i, t in enumerate(self.topics)}
        rows = np.array(
            [row_of[(c, t)] for c, t in zip(lpdf["class_id"], lpdf["token"])],
            dtype=np.int64,
        )
        cols = np.array([col_of[t] for t in lpdf["topic"]], dtype=np.int64)
        vals = lpdf["value"].to_numpy()
        return vals, rows, cols, tokens, list(self.topics)

    def get_theta_sparse(self, eps: float = 1e-37):
        """(values, doc_ids, topic_idx) COO arrays over the cached theta
        (artm_model.py:912-961); scipy-free, same contract as
        get_phi_sparse."""
        import numpy as np

        pdf = self.get_theta_long(eps=eps).toPandas()
        col_of = {t: i for i, t in enumerate(self.topics)}
        return (
            pdf["value"].to_numpy(),
            pdf["doc_id"].to_numpy(),
            np.array([col_of[t] for t in pdf["topic"]], dtype=np.int64),
        )


class LDA(ARTM):
    """G12 facade: LDA = ARTM + SmoothSparsePhi(beta) + SmoothSparseTheta(alpha)
    (python/artm/lda_model.py:23-380). Regularizers and the three built-in
    scores attach under the reference's internal names
    (lda_theta_reg / lda_phi_reg / perp_score / sp_phi_score /
    sp_theta_score), so the convenience properties and any script poking
    model.regularizers by name line up with upstream."""

    def __init__(
        self,
        num_topics: int,
        alpha: float = 0.01,
        beta: float | list[float] = 0.01,
        **kw,
    ):
        from bigartm_spark.model.api import (
            PerplexityScore,
            SmoothSparsePhiRegularizer,
            SmoothSparseThetaRegularizer,
            SparsityPhiScore,
            SparsityThetaScore,
        )

        if not isinstance(alpha, (int, float)):
            raise ValueError("LDA.alpha should be float")
        if isinstance(beta, list):
            if len(beta) != num_topics:
                raise ValueError(
                    "LDA.beta should have the length equal to num_topics"
                )
        elif not isinstance(beta, (int, float)):
            raise ValueError("LDA.beta should be float or list of floats")

        super().__init__(num_topics=num_topics, **kw)
        self._alpha = alpha
        self._beta = beta
        self.regularizers.add(
            SmoothSparseThetaRegularizer(name="lda_theta_reg", tau=alpha)
        )
        if isinstance(beta, list):
            # per-topic smoothing: one phi regularizer per topic, scoped
            # by topic_names (lda_model.py:90-97 documents beta as a
            # per-topic hyperparameter)
            for i, b in enumerate(beta):
                self.regularizers.add(
                    SmoothSparsePhiRegularizer(
                        name=f"lda_phi_reg_{i}",
                        tau=b,
                        topic_names=[self.topics[i]],
                    )
                )
        else:
            self.regularizers.add(
                SmoothSparsePhiRegularizer(name="lda_phi_reg", tau=beta)
            )
        self.scores.add(PerplexityScore(name="perp_score"))
        self.scores.add(SparsityPhiScore(name="sp_phi_score"))
        self.scores.add(SparsityThetaScore(name="sp_theta_score"))

    # -- convenience properties (lda_model.py:120-183) ---------------------
    @property
    def alpha(self) -> float:
        return self._alpha

    @property
    def beta(self):
        return self._beta

    @property
    def perplexity_value(self) -> list[float]:
        return self.score_tracker["perp_score"].value

    @property
    def perplexity_last_value(self) -> float:
        return self.score_tracker["perp_score"].last_value

    @property
    def sparsity_phi_value(self) -> list[float]:
        return self.score_tracker["sp_phi_score"].value

    @property
    def sparsity_phi_last_value(self) -> float:
        return self.score_tracker["sp_phi_score"].last_value

    @property
    def sparsity_theta_value(self) -> list[float]:
        return self.score_tracker["sp_theta_score"].value

    @property
    def sparsity_theta_last_value(self) -> float:
        return self.score_tracker["sp_theta_score"].last_value

    def get_top_tokens(self, num_tokens: int = 10, with_weights: bool = False):
        """lda_model.py:341-380: list per topic (natural order) of the
        top tokens, or of (token, weight) tuples."""
        from bigartm_spark.operators.topk import top_tokens

        rows = (
            top_tokens(self.pwt.to_long(), k=num_tokens)
            .orderBy("topic", "rank")
            .collect()
        )
        by_topic: dict[str, list] = {t: [] for t in self.topics}
        for r in rows:
            by_topic[r["topic"]].append(
                (r["token"], r["value"]) if with_weights else r["token"]
            )
        return [by_topic[t] for t in self.topics]
