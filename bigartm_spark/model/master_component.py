"""MasterComponent — the reference's low-level Python wrapper surface
(python/artm/master_component.py:237-1007) re-expressed over the Spark
engine.

The reference class marshals protobuf configs into C calls on a master
id; every verb here runs the same operation on the package's DataFrame
plans instead, holding named models (pwt/nwt/rwt), named dictionaries,
score configs and regularizer configs exactly like the C++ master's
instance store (src/artm/core/instance.h). Scripts written against the
wrapper API (python/tests/wrapper/*) port by changing the import line —
see tests/test_wrapper_port.py for test_01 ported verbatim.

Deviations (documented):
- matrices come back as pandas frames (token x topic), not protobuf
  ThetaMatrix/TopicModel messages;
- PerplexityScoreConfig supports both model types: the default
  document-unigram fallback and (model_type=1 + dictionary_name) the
  UnigramCollectionModel dictionary fallback, computed in the same
  kernel pass via a `cp` column (perplexity.cc:159-239); tokens missing
  from the dictionary degrade to the document model;
- attach_model (G9) returns a live driver-side numpy matrix instead of
  a shared-memory mapping: caller edits are folded into the distributed
  phi relation before the next read, and master-side writes refresh the
  same array in place — observably the reference contract, with the
  same vocab x topics driver footprint the reference's dense mapping
  implies.
"""

from __future__ import annotations

from types import SimpleNamespace

import numpy as np
from pyspark.sql import functions as F

from bigartm_spark.model import estep, mstep
from bigartm_spark.model.phi import PhiMatrix
from bigartm_spark.model.regularizers import RegularizeContext, regularize
from bigartm_spark.wrapper import messages_pb2 as messages


def _listify(x):
    if x is None:
        return []
    return list(x) if isinstance(x, (list, tuple)) else [x]


class MasterComponent:
    """Named-model store + the wrapper verb surface."""

    def __init__(
        self,
        library=None,
        topic_names=None,
        class_ids=None,
        transaction_typenames=None,
        scores=None,
        regularizers=None,
        num_processors=None,
        pwt_name=None,
        nwt_name=None,
        num_document_passes=None,
        reuse_theta=None,
        cache_theta=None,
        parent_model_id=None,
        parent_model_weight=None,
    ):
        from bigartm_spark.session import get_spark

        self._lib = library
        self._spark = getattr(library, "_spark", None) or get_spark()
        self._topic_names = list(topic_names) if topic_names else None
        self._class_ids = dict(class_ids) if class_ids else None
        self._transaction_typenames = (
            dict(transaction_typenames) if transaction_typenames else None
        )
        self._pwt_name = pwt_name or "pwt"
        self._nwt_name = nwt_name or "nwt"
        # proto default is 10; an explicit 0 is a valid value (theta
        # stays uniform — topic_seg_test.cc uses it)
        self._num_document_passes = (
            10 if num_document_passes is None else num_document_passes
        )
        self._cache_theta = bool(cache_theta)
        self._reuse_theta = bool(reuse_theta)
        self._models: dict[str, PhiMatrix] = {}
        self._rwt: dict[str, object] = {}  # name -> rwt DataFrame
        self._dictionaries: dict[str, object] = {}  # name -> Dictionary
        self._scores: dict[str, object] = {}  # name -> config message
        self._score_model: dict[str, str] = {}
        self._regularizers: dict[str, object] = {}  # name -> api config
        self._score_cache: dict[str, float] = {}  # summed raw partials
        self._score_arrays: dict[str, list] = {}
        self._theta = None
        self._ptdw = None
        self._attached: dict[str, dict] = {}  # model -> live numpy view
        self._docs_cache: dict[str, object] = {}
        for name, cfg in (scores or {}).items():
            self.create_score(name, cfg)
        for name, (cfg, tau) in (regularizers or {}).items():
            self.create_regularizer(name, cfg, tau)

    @property
    def master_id(self):
        """The reference's C-side handle is an int; scripts pass it back
        into lib verbs (`lib.ArtmCreateDictionary(master.master_id, ...)`).
        Here the master IS the handle, so those lines work unchanged."""
        return self

    # ------------------------------------------------------------ corpus
    def _docs_for(self, batches_folder=None, batch_filenames=None):
        from bigartm_spark.sources.io import load_batches

        key = batches_folder or "|".join(sorted(batch_filenames or []))
        if key not in self._docs_cache:
            if batches_folder is not None:
                docs = load_batches(self._spark, batches_folder)
            else:
                parts = [
                    load_batches(self._spark, f) for f in batch_filenames
                ]
                docs = parts[0]
                for p in parts[1:]:
                    docs = docs.unionByName(p)
            self._docs_cache[key] = docs.cache()
        return self._docs_cache[key]

    # -------------------------------------------------------- dictionaries
    def gather_dictionary(
        self,
        dictionary_target_name=None,
        data_path=None,
        cooc_file_path=None,
        vocab_file_path=None,
        symmetric_cooc_values=None,
        batches=None,
    ):
        from bigartm_spark.dictionary import Dictionary

        d = Dictionary(name=dictionary_target_name, spark=self._spark)
        d.gather(
            data_path=data_path,
            cooc_file_path=cooc_file_path,
            vocab_file_path=vocab_file_path,
            symmetric_cooc_values=bool(symmetric_cooc_values),
        )
        self._dictionaries[d.name] = d
        return d

    def filter_dictionary(
        self,
        dictionary_name=None,
        dictionary_target_name=None,
        class_id=None,
        min_df=None,
        max_df=None,
        min_df_rate=None,
        max_df_rate=None,
        min_tf=None,
        max_tf=None,
        max_dictionary_size=None,
        recalculate_value=None,
        inplace=None,
    ):
        src = self._dictionaries[dictionary_name]
        to_new = (
            dictionary_target_name is not None
            and dictionary_target_name != dictionary_name
        )
        tgt = src.filter(
            class_id=class_id,
            min_df=min_df,
            max_df=max_df,
            min_df_rate=min_df_rate,
            max_df_rate=max_df_rate,
            min_tf=min_tf,
            max_tf=max_tf,
            max_dictionary_size=max_dictionary_size,
            recalculate_value=bool(recalculate_value),
            inplace=not to_new,
        )
        if to_new:
            tgt._name = dictionary_target_name
        self._dictionaries[tgt.name] = tgt
        return tgt

    def create_dictionary(self, dictionary_data, dictionary_name=None):
        """DictionaryData message -> named dictionary (the wrapper's
        ArtmCreateDictionary)."""
        from bigartm_spark.dictionary import Dictionary

        name = dictionary_name or dictionary_data.name
        n = len(dictionary_data.token)

        def rep(field, default):
            vals = list(getattr(dictionary_data, field))
            return vals if len(vals) == n else [default] * n

        rows = list(
            zip(
                rep("class_id", "@default_class"),
                list(dictionary_data.token),
                rep("token_value", 0.0),
                rep("token_tf", 0.0),
                rep("token_df", 0.0),
            )
        )
        df = self._spark.createDataFrame(
            rows, "class_id string, token string, value double, tf double, df double"
        )
        d = Dictionary(name=name, df=df, spark=self._spark)
        if dictionary_data.cooc_first_index:
            tok = list(dictionary_data.token)
            cooc_rows = [
                (tok[a], tok[b], float(v))
                for a, b, v in zip(
                    dictionary_data.cooc_first_index,
                    dictionary_data.cooc_second_index,
                    dictionary_data.cooc_value,
                )
            ]
            d.cooc = self._spark.createDataFrame(
                cooc_rows, "token_a string, token_b string, value double"
            )
        self._dictionaries[name] = d
        return d

    def get_dictionary(self, dictionary_name):
        """Named dictionary -> DictionaryData message."""
        d = self._dictionaries[dictionary_name]
        rows = d.df.select("class_id", "token", "value", "tf", "df").collect()
        return messages.DictionaryData(
            name=dictionary_name,
            token=[r["token"] for r in rows],
            class_id=[r["class_id"] for r in rows],
            token_value=[float(r["value"] or 0.0) for r in rows],
            token_tf=[float(r["tf"] or 0.0) for r in rows],
            token_df=[float(r["df"] or 0.0) for r in rows],
        )

    def import_dictionary(self, filename, dictionary_name):
        from bigartm_spark.dictionary import Dictionary

        d = Dictionary(name=dictionary_name, spark=self._spark)
        d.load(filename)
        self._dictionaries[dictionary_name] = d
        return d

    def export_dictionary(self, filename, dictionary_name):
        self._dictionaries[dictionary_name].save(filename)

    # ------------------------------------------------------------- models
    def initialize_model(
        self,
        model_name=None,
        topic_names=None,
        dictionary_name=None,
        seed=None,
    ):
        # the wrapper surface mirrors the C++ InitializeModel, whose
        # seeded mt19937 init the wrapper tests' goldens pin — use the
        # bit-exact RNG replica (helpers.cc:79-135), not the portable
        # generator the DataFrame front door defaults to
        from bigartm_spark.model.init import initialize_phi_reference

        name = model_name or self._pwt_name
        if dictionary_name is None and name in self._models:
            # InitializeModelArgs without a dictionary re-seeds an
            # EXISTING model over its own token set, keeping its topics
            # (cpp_interface_test.cc:892-898)
            existing = self._models[name]
            topics = list(topic_names) if topic_names else list(existing.topics)
            phi = initialize_phi_reference(
                existing.compact.select("class_id", "token"),
                topics,
                seed=seed if seed is not None else 0,
                name=name,
            )
            self._models[name] = phi.checkpoint()
            self._model_written(name)
            return self._models[name]
        topics = list(topic_names or self._topic_names)
        self._topic_names = topics
        d = self._dictionaries[dictionary_name]
        ddf = d.df
        if self._class_ids:
            # master-level class_ids restrict the initialized modalities;
            # an empty result is an error, not an empty model
            # (MultipleClasses.InitializeSomeModalities,
            # multiple_classes_test.cc:255-287)
            ddf = ddf.filter(F.col("class_id").isin(list(self._class_ids)))
            if ddf.limit(1).isEmpty():
                raise ValueError(
                    f"InitializeModel: dictionary {dictionary_name!r} has no "
                    "tokens in the configured modalities "
                    f"{sorted(self._class_ids)}"
                )
        phi = initialize_phi_reference(
            ddf, topics, seed=seed if seed is not None else 0,
            name=model_name or self._pwt_name,
        )
        self._models[model_name or self._pwt_name] = phi.checkpoint()
        self._model_written(model_name or self._pwt_name)
        return self._models[model_name or self._pwt_name]

    @staticmethod
    def _reshape_topics(m, target):
        """Column subset/reorder by topic NAME, zero-fill for new names
        (master_component.cc MergeModel / ReconfigureTopicName)."""
        old = {t: i for i, t in enumerate(m.topics)}
        cols = [
            F.col("values")[old[t]] if t in old else F.lit(0.0)
            for t in target
        ]
        return PhiMatrix(
            m.name,
            list(target),
            m.compact.select(
                "class_id", "token", F.array(*cols).alias("values")
            ),
        )

    def reconfigure_topic_name(self, topic_names):
        """ReconfigureTopicName (cpp_interface_test.cc:862-884): rename/
        reorder/extend the master's topics; existing models realign by
        name, new topics get zero columns."""
        target = list(topic_names)
        for name, m in list(self._models.items()):
            if m.topics != target:
                self._models[name] = self._reshape_topics(m, target)
                self._model_written(name)
        self._topic_names = target

    def merge_model(self, models, nwt, topic_names=None, dictionary_name=None):
        """models: dict model_name -> weight (master_component.py:609).
        Missing source models contribute nothing (the reference's online
        loop merges a not-yet-created nwt on the first update).

        topic_names: target topic list — sources align by topic NAME,
        names absent from a source contribute zero columns
        (MergeModelArgs.topic_name, cpp_interface_test.cc:885-910).
        dictionary_name: restrict + order the merged tokens by that
        dictionary; dictionary tokens absent from every source get zero
        rows (MergeModelArgs.dictionary_name, :912-948)."""
        srcs = [
            (self._model_read(m), w) for m, w in models.items()
            if m in self._models
        ]
        if not srcs:
            raise ValueError(f"merge_model: none of {list(models)} exist")
        target = list(topic_names) if topic_names is not None else list(
            srcs[0][0].topics
        )
        srcs = [
            (s if s.topics == target else self._reshape_topics(s, target), w)
            for s, w in srcs
        ]
        merged = mstep.merge_nwt(srcs, name=nwt)
        if dictionary_name is not None:
            d = self._dictionaries[dictionary_name]
            keys = d.df.select("class_id", "token")
            kept = merged.compact.join(
                F.broadcast(keys), ["class_id", "token"], "left_semi"
            )
            missing = keys.join(
                merged.compact.select("class_id", "token"),
                ["class_id", "token"],
                "left_anti",
            ).select(
                "class_id",
                "token",
                F.array(*[F.lit(0.0)] * len(target)).alias("values"),
            )
            merged = PhiMatrix(nwt, target, kept.unionByName(missing))
        self._models[nwt] = merged
        self._model_written(nwt)
        return merged

    def attach_model(self, model):
        """Reference AttachModel (G9; master_component.py:639-676 /
        ArtmAttachModel): returns (info, numpy_matrix) where the matrix
        is a LIVE dense view of the model — caller edits through the
        array are folded into the distributed phi relation before the
        next operation that reads the model, and master-side updates
        (normalize_model, merge_model, import_model) refresh the same
        array object in place, mirroring the reference's shared-memory
        mapping. Scale note: the dense vocab x topics matrix lives on
        the driver — exactly the footprint the reference's attached
        mapping implies, so the contract is inherently driver-bounded;
        everything else in the shim stays distributed."""
        m = self._model_read(model)
        pdf = m.compact.toPandas()
        n_topics = len(m.topics)
        mat = (
            np.stack(pdf["values"].to_numpy())
            if len(pdf)
            else np.zeros((0, n_topics))
        ).astype(np.float64)
        info = SimpleNamespace(
            name=model,
            token=list(pdf["token"]),
            class_id=list(pdf["class_id"]),
            topic_name=list(m.topics),
            num_topics=n_topics,
            num_tokens=len(pdf),
        )
        self._attached[model] = {
            "class_id": pdf["class_id"].to_numpy(),
            "token": pdf["token"].to_numpy(),
            "mat": mat,
            "synced": mat.copy(),
        }
        return info, mat

    def _model_read(self, name):
        """Resolve a named model for reading, first folding any pending
        edits made through an attached numpy view into the phi
        relation (one driver->cluster ship of the vocab-sized matrix,
        only when the array actually changed)."""
        m = self._models[name]
        st = self._attached.get(name)
        if st is not None and not np.array_equal(st["mat"], st["synced"]):
            rows = [
                (str(c), str(t), [float(x) for x in row])
                for c, t, row in zip(st["class_id"], st["token"], st["mat"])
            ]
            df = self._spark.createDataFrame(
                rows, "class_id string, token string, values array<double>"
            )
            m = PhiMatrix(name, list(m.topics), df.localCheckpoint(eager=True))
            self._models[name] = m
            st["synced"] = st["mat"].copy()
        return m

    def _model_written(self, name):
        """After master-side writes, refresh an attached numpy view in
        place (same array object the caller holds) so it keeps tracking
        the model like the reference's shared mapping. If the model's
        row set changed shape (re-initialize over a different
        dictionary), the old view cannot track it — detach."""
        st = self._attached.get(name)
        if st is None:
            return
        m = self._models[name]
        pdf = m.compact.toPandas()
        if len(pdf) != len(st["mat"]):
            del self._attached[name]
            return
        idx = {
            (c, t): i
            for i, (c, t) in enumerate(zip(st["class_id"], st["token"]))
        }
        for c, t, row in zip(pdf["class_id"], pdf["token"], pdf["values"]):
            i = idx.get((c, t))
            if i is not None:
                st["mat"][i, :] = row
        st["synced"] = st["mat"].copy()

    def export_model(self, model, filename):
        from bigartm_spark.sources.io import export_model

        export_model(self._model_read(model), filename)

    def import_model(self, model, filename):
        from bigartm_spark.sources.io import import_model

        phi = import_model(self._spark, filename)
        self._models[model] = PhiMatrix(model, phi.topics, phi.compact)
        self._model_written(model)
        return self._models[model]

    # ----------------------------------------------------- scores / regs
    def create_score(self, name, config, model_name=None):
        self._scores[name] = config
        self._score_model[name] = model_name or self._pwt_name

    def reconfigure_score(self, name, config, model_name=None):
        self.create_score(name, config, model_name)

    def create_regularizer(self, name, config, tau, gamma=None):
        self._regularizers[name] = self._api_regularizer(name, config, tau, gamma)

    def reconfigure_regularizer(self, name, config=None, tau=None, gamma=None):
        if config is not None:
            old_tau = self._regularizers[name].tau
            self._regularizers[name] = self._api_regularizer(
                name, config, tau if tau is not None else old_tau, gamma
            )
            return
        if tau is not None:
            self._regularizers[name].tau = tau
        if gamma is not None:
            self._regularizers[name].gamma = gamma

    def _api_regularizer(self, name, config, tau, gamma=None):
        """Message config -> the package's front-door regularizer class
        (which owns the engine object)."""
        from bigartm_spark.model import api

        def names(field):
            vals = _listify(getattr(config, field, None))
            return vals or None

        t = type(config).__name__
        if t == "SmoothSparsePhiConfig":
            d = (
                self._dictionaries[config.dictionary_name]
                if config.dictionary_name
                else None
            )
            return api.SmoothSparsePhiRegularizer(
                name=name, tau=tau, gamma=gamma,
                topic_names=names("topic_name"),
                class_ids=names("class_id"),
                dictionary=d,
            )
        if t == "SmoothSparseThetaConfig":
            alpha = _listify(getattr(config, "alpha_iter", None)) or None
            titles = names("item_title")
            multipliers = _listify(
                getattr(config, "item_topic_multiplier", None)
            )
            coef = (
                [list(fa.value) for fa in multipliers] if multipliers else None
            )
            return api.SmoothSparseThetaRegularizer(
                name=name, tau=tau,
                topic_names=names("topic_name"),
                alpha_iter=alpha,
                doc_titles=titles,
                doc_topic_coef=coef,
            )
        if t == "DecorrelatorPhiConfig":
            return api.DecorrelatorPhiRegularizer(
                name=name, tau=tau, gamma=gamma,
                topic_names=names("topic_name"),
                class_ids=names("class_id"),
            )
        if t == "LabelRegularizationPhiConfig":
            return api.LabelRegularizationPhiRegularizer(
                name=name, tau=tau,
                topic_names=names("topic_name"),
                class_ids=names("class_id"),
                dictionary=(
                    self._dictionaries[config.dictionary_name]
                    if config.dictionary_name
                    else None
                ),
            )
        if t == "ImproveCoherencePhiConfig":
            return api.ImproveCoherencePhiRegularizer(
                name=name, tau=tau,
                topic_names=names("topic_name"),
                class_ids=names("class_id"),
                # the engine wants the cooc relation of the named dictionary
                dictionary=(
                    self._dictionaries[config.dictionary_name].cooc
                    if config.dictionary_name
                    else None
                ),
            )
        if t == "TopicSelectionThetaConfig":
            return api.TopicSelectionThetaRegularizer(
                name=name, tau=tau, topic_names=names("topic_name"),
                alpha_iter=_listify(getattr(config, "alpha_iter", None)) or None,
                topic_value=names("topic_value"),
            )
        if t == "SmoothPtdwConfig":
            return api.SmoothPtdwRegularizer(
                name=name, tau=tau, window=config.window
            )
        if t == "TopicSegmentationPtdwConfig":
            return api.TopicSegmentationPtdwRegularizer(
                name=name,
                window=config.window,
                threshold=config.threshold,
                background_topic_names=(
                    names("background_topic_names")
                ),
            )
        if t == "NetPlsaPhiConfig":
            vertex_names = names("vertex_name") or []
            firsts = _listify(getattr(config, "first_vertex_index", None))
            seconds = _listify(getattr(config, "second_vertex_index", None))
            weights = _listify(getattr(config, "edge_weight", None))
            edge_weights: dict = {}
            for i, j, w in zip(firsts, seconds, weights):
                edge_weights.setdefault(int(i), {})[int(j)] = float(w)
                if getattr(config, "symmetric_edge_weights", None):
                    edge_weights.setdefault(int(j), {})[int(i)] = float(w)
            vw = _listify(getattr(config, "vertex_weight", None)) or None
            return api.NetPlsaPhiRegularizer(
                name=name, tau=tau,
                class_id=getattr(config, "class_id", None) or "vertex",
                topic_names=names("topic_name"),
                vertex_names=vertex_names,
                vertex_weights=vw,
                edge_weights=edge_weights,
            )
        raise ValueError(f"unsupported regularizer config {t}")

    # ------------------------------------------------------------ E-step
    def clear_score_cache(self):
        self._score_cache = {}

    def clear_score_array_cache(self):
        self._score_arrays = {}

    def clear_theta_cache(self):
        self._theta = None
        self._ptdw = None

    def process_batches(
        self,
        pwt,
        nwt=None,
        num_document_passes=None,
        batches_folder=None,
        batch_filenames=None,
        batch_weights=None,
        reset_scores=None,
        regularizer_name=None,
        regularizer_tau=None,
        class_ids=None,
        class_weights=None,
        find_theta=False,
        transaction_typenames=None,
        reuse_theta=False,
        find_ptdw=False,
        predict_class_id=None,
        cache_theta=False,
        theta_matrix_type=None,
        batches=None,
        _apply_registered_theta=False,
    ):
        """One E-step over the batch store: nwt out of pwt, cumulative
        scores summed (master_component.py:478-567 / ProcessBatches).
        ``batches`` is the reference's list-of-.batch-file-paths kwarg
        (an alias of batch_filenames here)."""
        if batch_filenames is None and batches is not None:
            batch_filenames = list(batches)
        docs = self._docs_for(batches_folder, batch_filenames)
        if reset_scores:
            self.clear_score_cache()
        cw = None
        if class_ids is not None and class_weights is not None:
            cw = dict(zip(class_ids, class_weights))
        elif self._class_ids:
            cw = self._class_ids
        # theta-kind regularizers run inside the E-step; an explicit
        # regularizer_name/tau list (ProcessBatchesArgs) selects and
        # retunes just those FOR THIS CALL — the reference's
        # ProcessBatchesArgs taus are per-call and leave master state
        # untouched, so the stored tau is restored afterwards. A bare
        # process_batches applies none (the reference's raw
        # ProcessBatches runs only explicitly-named theta regularizers);
        # the fit loops opt back into the registered set via
        # _apply_registered_theta.
        restore_taus = []
        if regularizer_name is not None:
            selected = []
            for nm, tau in zip(
                _listify(regularizer_name), _listify(regularizer_tau)
            ):
                cfg = self._regularizers[nm]
                restore_taus.append((cfg, cfg.tau))
                cfg.tau = tau
                selected.append(cfg)
        elif _apply_registered_theta:
            selected = list(self._regularizers.values())
        else:
            selected = []
        theta_agents = []
        theta_cfgs = []
        ptdw_agents = []
        for cfg in selected:
            kind = getattr(cfg, "_kind", None)
            if kind == "theta":
                if hasattr(cfg, "_resolve"):
                    cfg._resolve(self._models[pwt].topics)
                theta_cfgs.append(cfg)
                theta_agents.append(cfg._engine)
            elif kind == "ptdw":
                if hasattr(cfg, "_resolve"):
                    cfg._resolve(self._models[pwt].topics)
                ptdw_agents.append(cfg._engine)
        if theta_cfgs:
            # item_title / item_topic_multiplier scoping -> kernel doc ids
            # (smooth_sparse_theta.cc:389-502; shared with the ARTM path)
            from bigartm_spark.model.api import resolve_doc_scope

            resolve_doc_scope(theta_cfgs, docs)
        want_theta = bool(
            find_theta
            or cache_theta
            or self._cache_theta
            or theta_matrix_type in ("dense_theta", 1, 2, 3)
            or any(
                type(c).__name__ == "ThetaSnippetScoreConfig"
                for c in self._scores.values()
            )
        )
        # ThetaMatrixType_DensePtdw (=4) / find_ptdw: emit the flat
        # p(t|d,w) matrix alongside, cached for get_ptdw_matrix()
        want_ptdw = bool(find_ptdw) or theta_matrix_type in ("dense_ptdw", 4)
        phi = self._model_read(pwt)
        # vocabulary growth (MasterModel.TestReshapeTokens*): when the
        # target nwt was re-initialized over a BIGGER dictionary than
        # pwt, the reference still writes counts for the extra tokens,
        # using a uniform phi row (processor_helpers.cc:564-567
        # p_wt_local = 1.0 when the token is absent from pwt) — i.e.
        # n_wt[new w][t] = sum_d n_dw * theta_td. That is a plain
        # relational aggregate over this pass's theta; no kernel change.
        grow_tokens = None
        if nwt is not None:
            prev_nwt = self._models.get(nwt)
            if prev_nwt is not None and list(prev_nwt.topics) == list(
                phi.topics
            ):
                extra = prev_nwt.compact.select("class_id", "token").join(
                    phi.compact.select("class_id", "token"),
                    ["class_id", "token"],
                    "left_anti",
                )
                if not extra.limit(1).isEmpty():
                    grow_tokens = extra.localCheckpoint(eager=True)
                    want_theta = True
        try:
            kernel = estep.process_batches(
                docs,
                phi,
                num_document_passes=(
                    num_document_passes
                    if num_document_passes is not None
                    else self._num_document_passes
                ),
                class_weights=cw,
                theta_agents=theta_agents or None,
                ptdw_agents=ptdw_agents or None,
                transaction_mode=bool(
                    transaction_typenames or self._transaction_typenames
                ),
                transaction_weights=(
                    transaction_typenames or self._transaction_typenames
                ),
                class_score_breakdown=any(
                    type(c).__name__ == "PerplexityScoreConfig"
                    and _listify(getattr(c, "class_id", None))
                    for c in self._scores.values()
                ),
                emit_nwt=nwt is not None,
                emit_theta=want_theta,
                emit_ptdw=want_ptdw,
                compute_scores=True,
                collection_probs=self._collection_probs(),
            )
            if want_theta or want_ptdw:
                kernel = kernel.cache()
            if nwt is not None:
                agg = estep.aggregate_nwt(kernel, len(phi.topics)).localCheckpoint(
                    eager=True
                )
                if agg.limit(1).isEmpty():
                    # class filter + corpus with empty intersection: the
                    # reference throws rather than producing an empty nwt
                    # (MultipleClasses.ThrowIfNoTokensInEffect). The probe
                    # is on the already-materialized checkpoint — no extra
                    # scan of the corpus.
                    raise ValueError(
                        "ProcessBatches: no tokens in effect — the "
                        "configured class_ids match nothing in the corpus"
                    )
                if grow_tokens is not None:
                    # n_wt[new w] = sum_d n_dw * theta_td (uniform-phi
                    # write, processor_helpers.cc:564-587)
                    theta_long = estep.extract_theta(kernel, phi.topics)
                    weighted = estep.apply_class_weights(docs, cw)
                    extra_occ = weighted.join(
                        F.broadcast(grow_tokens),
                        ["class_id", "token"],
                        "left_semi",
                    ).select("doc_id", "class_id", "token", "weight")
                    grown_long = (
                        extra_occ.join(theta_long, "doc_id")
                        .groupBy("class_id", "token", "topic")
                        .agg(
                            F.sum(
                                F.col("weight") * F.col("value")
                            ).alias("value")
                        )
                    )
                    grown = PhiMatrix.from_long(
                        nwt, list(phi.topics), grown_long
                    ).compact
                    agg = agg.unionByName(grown).localCheckpoint(eager=True)
                # the reference's nwt spans every pwt token — tokens the
                # corpus never weights keep ZERO rows (and survive the
                # normalize), so GetTopicModel keeps the model shape
                # (MultipleClasses.WithoutDefaultClass pins the count).
                # One vocab-sized anti-join + union, never corpus-sized.
                zero_rows = phi.compact.join(
                    agg.select("class_id", "token"),
                    ["class_id", "token"],
                    "left_anti",
                ).select(
                    "class_id",
                    "token",
                    F.array(
                        *[F.lit(0.0)] * len(phi.topics)
                    ).alias("values"),
                )
                checked = agg.unionByName(zero_rows)
                self._models[nwt] = PhiMatrix(
                    nwt, list(phi.topics), checked
                )
                self._model_written(nwt)
                scores = estep.extract_scores(kernel)
            else:
                scores = estep.extract_scores(kernel)
            if want_theta:
                self._theta = estep.extract_theta(
                    kernel, phi.topics
                ).localCheckpoint(eager=True)
            if want_ptdw:
                self._ptdw = estep.extract_ptdw(
                    kernel, phi.topics
                ).localCheckpoint(eager=True)
            if want_theta or want_ptdw:
                kernel.unpersist()
        finally:
            # per-call ProcessBatchesArgs taus never stick
            for cfg, stored_tau in restore_taus:
                cfg.tau = stored_tau
        # accumulate RAW partials (reference score cache semantics: sums
        # across ProcessBatches calls until clear_score_cache). Every raw
        # key accumulates — incl. the dynamic per-transaction-type
        # ("@name") and per-modality ("@cls:name") breakdowns; the
        # derived keys (exp/ratios) are recomputed by _finalize, never
        # summed.
        _derived = ("perplexity_raw", "perplexity_normalizer",
                    "perplexity_zero_words")
        for k, v in scores.items():
            if k == "sparsity_theta" or (
                k.startswith("perplexity") and not k.startswith(_derived)
            ):
                continue
            self._score_cache[k] = self._score_cache.get(k, 0.0) + v
        finalized = self._finalized_scores()
        for name in self._scores:
            self._score_arrays.setdefault(name, []).append(
                self.get_score(name)
            )
        return finalized

    def _collection_probs(self):
        """(class_id, token, cp) when any attached PerplexityScoreConfig
        asks for the UnigramCollectionModel fallback (model_type=1 +
        dictionary_name)."""
        for cfg in self._scores.values():
            if (
                type(cfg).__name__ == "PerplexityScoreConfig"
                and getattr(cfg, "model_type", 0) == 1
                and getattr(cfg, "dictionary_name", None)
            ):
                d = self._dictionaries.get(cfg.dictionary_name)
                if d is not None and d.df is not None:
                    return d.df.select(
                        "class_id", "token", F.col("value").alias("cp")
                    )
        return None

    def _finalized_scores(self):
        # same final transforms as the pass scores (handles the @coll
        # collection-model suffix keys too)
        return estep._finalize_scores(dict(self._score_cache))

    # ------------------------------------------------------------ M-step
    def regularize_model(
        self, pwt, nwt, rwt, regularizer_name, regularizer_tau,
        regularizer_gamma=None,
    ):
        names = _listify(regularizer_name)
        taus = _listify(regularizer_tau)
        gammas = _listify(regularizer_gamma) or [None] * len(names)
        engines = []
        need_totals = False
        # RegularizeModelArgs taus/gammas are per-call: apply them for
        # plan construction (the delta columns bake the literals in
        # immediately), then restore the registered configs — an
        # explicit regularize_model call never mutates master state.
        restore = []
        for n, tau, gamma in zip(names, taus, gammas):
            cfg = self._regularizers[n]
            restore.append((cfg, cfg.tau, getattr(cfg, "gamma", None)))
            cfg.tau = tau
            if gamma is not None:
                cfg.gamma = gamma
            if getattr(cfg, "gamma", None) is not None:
                need_totals = True
            if getattr(cfg, "_kind", "phi") == "phi":
                engines.append(cfg._engine)
        # engines whose delta normalizes against n_t (NetPLSA's KL form,
        # biterms, relative-gamma scaling) need the totals relation
        need_totals = need_totals or any(
            type(e).__name__
            in ("NetPlsaPhi", "BitermsPhi", "LabelRegularizationPhi")
            for e in engines
        )
        try:
            dic = next(iter(self._dictionaries.values())).df if self._dictionaries else None
            ctx = RegularizeContext(
                dictionary=dic,
                topic_totals=(
                    mstep.topic_totals(self._model_read(nwt)) if need_totals else None
                ),
            )
            self._rwt[rwt] = regularize(
                self._model_read(pwt), self._model_read(nwt), engines, ctx
            )
        finally:
            for cfg, stored_tau, stored_gamma in restore:
                cfg.tau = stored_tau
                if stored_gamma is not None or getattr(cfg, "gamma", None) is not None:
                    try:
                        cfg.gamma = stored_gamma
                    except Exception:
                        pass
        return self._rwt[rwt]

    def normalize_model(self, pwt, nwt, rwt=None):
        rwt_df = self._rwt.get(rwt) if rwt is not None else None
        new_pwt = mstep.normalize(self._model_read(nwt), rwt_df, name=pwt)
        old = self._models.get(pwt)
        self._models[pwt] = new_pwt.checkpoint()
        self._model_written(pwt)
        if old is not None:
            try:
                old.compact.unpersist()
            except Exception:
                pass
        return self._models[pwt]

    # --------------------------------------------------------- fit loops
    def fit_offline(
        self, batch_filenames=None, batch_weights=None,
        num_collection_passes=None, batches_folder=None,
    ):
        for _ in range(num_collection_passes or 1):
            self.clear_score_cache()
            self.process_batches(
                self._pwt_name, self._nwt_name,
                self._num_document_passes,
                batches_folder=batches_folder,
                batch_filenames=batch_filenames,
                _apply_registered_theta=True,
            )
            reg_names = [
                n for n, c in self._regularizers.items()
                if getattr(c, "_kind", "phi") == "phi"
            ]
            rwt = None
            if reg_names:
                rwt = "rwt"
                self.regularize_model(
                    self._pwt_name, self._nwt_name, rwt, reg_names,
                    [self._regularizers[n].tau for n in reg_names],
                )
            self.normalize_model(self._pwt_name, self._nwt_name, rwt)

    def fit_online(
        self, batch_filenames=None, batch_weights=None, update_after=None,
        apply_weight=None, decay_weight=None, asynchronous=False,
        batches_folder=None, async_=None,
    ):
        """Online EM with explicit update points and decay/apply weights
        (master_component.py:880-932; ExecuteOnlineAlgorithm /
        ExecuteAsyncOnlineAlgorithm, master_component.cc:1364-1444).

        Reference semantics pinned by the MasterModel.Basic port:
        - the score cache clears at fit start (so GetScore after the fit
          reports this fit's cumulative scores);
        - an absent decay list defaults to 1 - apply_weight
          (check_messages.h:794-803);
        - every update runs Merge -> Regularize -> Normalize, so phi
          regularizers shape the online trajectory exactly as offline;
        - asynchronous=True processes each group with the phi that
          predates the PREVIOUS group's merge (one-update-stale pwt,
          the documented overlap schedule at master_component.cc:1388-1400).
        """
        if async_ is not None:
            asynchronous = bool(async_)
        files = list(batch_filenames or [])
        update_after = list(update_after or [len(files)])
        apply_weight = list(apply_weight or [1.0] * len(update_after))
        decay_weight = list(
            decay_weight
            if decay_weight is not None
            else [1.0 - a for a in apply_weight]
        )
        self.clear_score_cache()

        reg_names = [
            n for n, c in self._regularizers.items()
            if getattr(c, "_kind", "phi") == "phi"
        ]

        def merge_regularize_normalize(hat, aw, dw):
            cur = self._models.get(self._nwt_name)
            if cur is not None and dw != 0.0:
                merged = mstep.merge_nwt(
                    [(cur, dw), (hat, aw)], name=self._nwt_name
                )
            else:
                merged = mstep.merge_nwt([(hat, aw)], name=self._nwt_name)
            self._models[self._nwt_name] = PhiMatrix(
                self._nwt_name, merged.topics,
                merged.compact.localCheckpoint(eager=True),
            )
            rwt = None
            if reg_names:
                rwt = "rwt"
                self.regularize_model(
                    self._pwt_name, self._nwt_name, rwt, reg_names,
                    [self._regularizers[n].tau for n in reg_names],
                )
            self.normalize_model(self._pwt_name, self._nwt_name, rwt)

        start = 0
        pending = None  # (hat, apply, decay) not yet merged (async lag)
        for upto, aw, dw in zip(update_after, apply_weight, decay_weight):
            group = files[start:upto]
            start = upto
            if not group:
                continue
            self.process_batches(
                self._pwt_name, "_nwt_hat", self._num_document_passes,
                batch_filenames=group,
                _apply_registered_theta=True,
            )
            hat = self._models.pop("_nwt_hat")
            if not asynchronous:
                merge_regularize_normalize(hat, aw, dw)
                continue
            # async: the group above was processed with the CURRENT pwt;
            # only now fold in the previous group's counts — every group
            # sees a one-update-stale phi, exactly the overlap schedule
            if pending is not None:
                merge_regularize_normalize(*pending)
            pending = (hat, aw, dw)
        if pending is not None:
            merge_regularize_normalize(*pending)

    def transform(
        self, batches=None, batch_filenames=None, theta_matrix_type=None,
        batches_folder=None,
    ):
        """TransformMasterModelArgs: unlike raw ProcessBatches, the
        master-model Transform applies the registered regularizer agents
        (so e.g. a configured TopicSegmentationPtdw shapes the returned
        ptdw — Regularizer.TopicSegmentationPtdw, topic_seg_test.cc).
        theta_matrix_type 'dense_ptdw' (=4) returns the ptdw matrix."""
        want_ptdw = theta_matrix_type in ("dense_ptdw", 4)
        self.process_batches(
            self._pwt_name, None, self._num_document_passes,
            batches_folder=batches_folder, batch_filenames=batch_filenames,
            find_theta=not want_ptdw,
            find_ptdw=want_ptdw,
            _apply_registered_theta=True,
        )
        if want_ptdw:
            return self.get_ptdw_matrix()
        return self.get_theta_matrix()

    # ----------------------------------------------------------- readout
    def get_score(self, score_name):
        cfg = self._scores[score_name]
        t = type(cfg).__name__
        s = self._finalized_scores()
        if t == "PerplexityScoreConfig":
            tt_scoped = _listify(getattr(cfg, "transaction_typename", None))
            if tt_scoped and any(
                f"perplexity_raw@{nm}" in s for nm in tt_scoped
            ):
                # transaction_typename scoping: combine the transaction
                # kernel's per-type rollup (perplexity.cc tt_name info)
                import math

                raw = sum(
                    s.get(f"perplexity_raw@{nm}", 0.0) for nm in tt_scoped
                )
                norm = sum(
                    s.get(f"perplexity_normalizer@{nm}", 0.0)
                    for nm in tt_scoped
                )
                return SimpleNamespace(
                    value=math.exp(-raw / norm) if norm > 0 else 0.0,
                    raw=raw,
                    normalizer=norm,
                    zero_words=int(s.get("perplexity_zero_words", 0)),
                )
            scoped = _listify(getattr(cfg, "class_id", None))
            if scoped:
                # class_id scoping (perplexity.cc:66-80): combine the
                # kernel's per-modality partials; an empty intersection
                # with the corpus reports zeros — the reference SKIPS the
                # calculation rather than erroring (scores_test.cc:86-95)
                import math

                raw = sum(s.get(f"perplexity_raw@cls:{c}", 0.0) for c in scoped)
                norm = sum(
                    s.get(f"perplexity_normalizer@cls:{c}", 0.0)
                    for c in scoped
                )
                zero = sum(
                    s.get(f"perplexity_zero_words@cls:{c}", 0.0)
                    for c in scoped
                )
                return SimpleNamespace(
                    value=math.exp(-raw / norm) if norm > 0 else 0.0,
                    raw=raw,
                    normalizer=norm,
                    zero_words=int(zero),
                )
            # model_type=1 (UnigramCollectionModel) reads the kernel's
            # dictionary-fallback variant when it rode the pass
            suf = (
                "@coll"
                if getattr(cfg, "model_type", 0) == 1
                and "perplexity@coll" in s
                else ""
            )
            return SimpleNamespace(
                value=s.get(f"perplexity{suf}", float("nan")),
                raw=s.get(f"perplexity_raw{suf}", float("nan")),
                normalizer=s.get(f"perplexity_normalizer{suf}", float("nan")),
                zero_words=int(s.get(f"perplexity_zero_words{suf}", 0)),
            )
        if t == "SparsityThetaScoreConfig":
            return SimpleNamespace(
                value=s.get("sparsity_theta", float("nan")),
                zero_topics=int(s.get("sparsity_theta_zero", 0)),
                total_topics=int(s.get("sparsity_theta_total", 0)),
            )
        if t == "ItemsProcessedScoreConfig":
            return SimpleNamespace(value=int(s.get("items_processed", 0)))
        model = self._models.get(self._score_model[score_name])
        if t == "SparsityPhiScoreConfig":
            from bigartm_spark.model.scores import sparsity_phi

            rows = sparsity_phi(
                model, eps=cfg.eps, class_id=cfg.class_id
            ).collect()
            zero = sum(r["zero_count"] for r in rows)
            total = sum(r["total_count"] for r in rows)
            return SimpleNamespace(
                value=(zero / total) if total else float("nan"),
                zero_tokens=int(zero),
                total_tokens=int(total),
            )
        if t == "TopTokensScoreConfig":
            from bigartm_spark.operators.topk import top_tokens

            long = model.to_long()
            # unset class_id defaults to "@default_class"
            # (messages.proto:350, top_tokens.cc:45-53)
            long = long.filter(
                F.col("class_id") == (cfg.class_id or "@default_class")
            )
            rows = (
                top_tokens(long, k=cfg.num_tokens)
                .orderBy("topic", "rank")
                .collect()
            )
            order = {t_: i for i, t_ in enumerate(model.topics)}
            rows.sort(key=lambda r: (order.get(r["topic"], 1 << 30), r["rank"]))
            return SimpleNamespace(
                num_entries=len(rows),
                topic_index=[order[r["topic"]] for r in rows],
                topic_name=[r["topic"] for r in rows],
                token=[r["token"] for r in rows],
                weight=[float(r["value"]) for r in rows],
            )
        if t == "ThetaSnippetScoreConfig":
            from bigartm_spark.model.scores import theta_snippet

            if self._theta is None:
                raise ValueError(
                    "ThetaSnippet needs a theta: run process_batches first"
                )
            rows = theta_snippet(self._theta, num_items=cfg.num_items).collect()
            order = {t_: i for i, t_ in enumerate(self._topic_names or [])}
            per_doc: dict[int, list] = {}
            for r in rows:
                per_doc.setdefault(int(r["doc_id"]), []).append(
                    (order.get(r["topic"], 1 << 30), float(r["value"]))
                )
            ids = sorted(per_doc)
            return SimpleNamespace(
                item_id=ids,
                values=[
                    [v for _, v in sorted(per_doc[i])] for i in ids
                ],
            )
        if t == "TopicMassPhiScoreConfig":
            from bigartm_spark.model.scores import topic_mass_phi

            rows = topic_mass_phi(model).orderBy("topic").collect()
            order = {t_: i for i, t_ in enumerate(model.topics)}
            rows.sort(key=lambda r: order.get(r["topic"], 1 << 30))
            masses = [float(r["topic_mass"]) for r in rows]
            return SimpleNamespace(
                value=float(sum(masses)),
                topic_name=[r["topic"] for r in rows],
                topic_mass=masses,
                topic_ratio=[float(r["topic_ratio"]) for r in rows],
            )
        if t == "BackgroundTokensRatioScoreConfig":
            from bigartm_spark.model.scores import background_tokens_ratio

            rows = background_tokens_ratio(
                model,
                delta_threshold=cfg.delta_threshold,
                direct_kl=cfg.direct_kl,
            ).collect()
            bg = [r["token"] for r in rows if r["is_background"]]
            return SimpleNamespace(
                value=(len(bg) / len(rows)) if rows else float("nan"),
                tokens=bg if cfg.save_tokens else [],
            )
        raise ValueError(f"unsupported score config {t}")

    def get_score_array(self, score_name):
        return list(self._score_arrays.get(score_name, []))

    def get_phi_info(self, model):
        """Token/topic inventory of a named matrix. Rows come back
        sorted by (class_id, token) — a deterministic order where the
        reference returns its in-memory row order."""
        m = self._model_read(model)
        rows = m.compact.select("class_id", "token").orderBy(
            "class_id", "token"
        ).collect()
        return SimpleNamespace(
            token=[r["token"] for r in rows],
            class_id=[r["class_id"] for r in rows],
            topic_name=list(m.topics),
            num_topics=len(m.topics),
        )

    def get_phi_matrix(
        self, model, topic_names=None, class_ids=None, use_sparse_format=None
    ):
        """pandas (token-index) x topic — the documented deviation from
        the protobuf TopicModel return. One row per (class_id, token),
        matching the reference's paired token/class_id arrays
        (master_component.py:796-826): the same token string in two
        modalities stays two distinct rows. Single-modality models keep
        the plain token index for drop-in ports."""
        import pandas as pd

        m = self._model_read(model)
        long = m.to_long()
        if topic_names is not None:
            long = long.filter(F.col("topic").isin(list(topic_names)))
        if class_ids is not None:
            long = long.filter(F.col("class_id").isin(list(class_ids)))
        pdf = long.toPandas()
        wide = pdf.pivot_table(
            index=["class_id", "token"],
            columns="topic",
            values="value",
            aggfunc="first",
            fill_value=0.0,
        )
        if len(wide) and wide.index.get_level_values("class_id").nunique() == 1:
            wide = wide.droplevel("class_id")
        cols = [t for t in m.topics if t in wide.columns]
        return wide[cols]

    def get_theta_info(self):
        if self._theta is None:
            return SimpleNamespace(item_id=[], topic_name=[])
        ids = [
            r["doc_id"]
            for r in self._theta.select("doc_id").distinct().collect()
        ]
        return SimpleNamespace(
            item_id=sorted(ids), topic_name=list(self._topic_names or [])
        )

    def get_theta_matrix(self, topic_names=None):
        import pandas as pd

        if self._theta is None:
            raise ValueError("no cached theta: run process_batches first")
        pdf = self._theta.toPandas()
        wide = pdf.pivot_table(
            index="doc_id", columns="topic", values="value", fill_value=0.0
        )
        if topic_names is not None:
            wide = wide[[t for t in topic_names if t in wide.columns]]
        elif self._topic_names:
            wide = wide[[t for t in self._topic_names if t in wide.columns]]
        return wide

    def get_ptdw_matrix(self, topic_names=None):
        """Flat p(t|d,w) from the last process_batches(find_ptdw=True)
        call (ThetaMatrixType_DensePtdw=4; Ptdw matrix
        messages.proto:651-658): pandas wide frame indexed by
        (doc_id, pos) with one column per topic."""
        if self._ptdw is None:
            raise ValueError(
                "no cached ptdw: run process_batches(find_ptdw=True) "
                "or theta_matrix_type='dense_ptdw' first"
            )
        pdf = self._ptdw.toPandas()
        wide = pdf.pivot_table(
            index=["doc_id", "pos"], columns="topic", values="value",
            aggfunc="first", fill_value=0.0,
        )
        want = topic_names or self._topic_names
        if want:
            wide = wide[[t for t in want if t in wide.columns]]
        return wide

    def dispose(self):
        """Release cached corpus relations and named matrices (the G14
        lifecycle verb; ARTM.dispose parity for the wrapper surface)."""
        for df in self._docs_cache.values():
            try:
                df.unpersist()
            except Exception:
                pass
        for m in self._models.values():
            try:
                m.compact.unpersist()
            except Exception:
                pass
        self._docs_cache = {}
        self._models = {}
        self._rwt = {}
        self._theta = None
        self._ptdw = None
        self._attached = {}

    def get_info(self):
        return SimpleNamespace(
            model=[
                SimpleNamespace(name=n, num_topics=len(m.topics))
                for n, m in self._models.items()
            ],
            dictionary=[
                SimpleNamespace(name=n) for n in self._dictionaries
            ],
            score=[SimpleNamespace(name=n) for n in self._scores],
            regularizer=[SimpleNamespace(name=n) for n in self._regularizers],
        )
