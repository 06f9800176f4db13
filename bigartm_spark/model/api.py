"""Reference-name configuration front door (python/artm/scores.py,
regularizers.py, score_tracker.py): the class-based API every upstream
user script is written against —

    model = ARTM(num_topics=20,
                 scores=[PerplexityScore(name='p')],
                 regularizers=[SmoothSparsePhiRegularizer(name='s', tau=-0.1)])
    model.scores.add(SparsityPhiScore(name='sp'))
    model.regularizers['s'].tau = -0.5        # live retune between fits
    model.fit_offline(bv, 10)
    model.score_tracker['p'].last_value

Each *Regularizer class is a named wrapper that constructs the matching
engine object (model/regularizers.py) and proxies its tunable fields, so
mutating ``cfg.tau`` between fits changes the next pass exactly like the
reference's reconfigure path (regularizers.py:135-197). Each *Score class
declares what to collect after every phi update; values land in
``model.score_tracker`` as ScoreTrackerList entries that behave as plain
lists (back-compat) AND expose the reference tracker surface
(``.value`` / ``.last_value`` / per-score extra fields with ``last_``
variants, score_tracker.py:78-296).
"""

from __future__ import annotations

from typing import Any

from bigartm_spark.model import regularizers as _engine
from bigartm_spark.model import scores as _scores


# --------------------------------------------------------------- trackers
class ScoreTrackerList(list):
    """A list of per-update score values that also answers the reference
    tracker API. Extra per-score fields (raw, normalizer, zero_tokens,
    ...) are sibling entries named ``<name>__<field>`` in the same
    score_tracker dict; attribute access resolves them lazily."""

    def __init__(self, *args, name: str | None = None, store: dict | None = None):
        super().__init__(*args)
        self._name = name
        self._store = store

    @property
    def value(self) -> list:
        return list(self)

    @property
    def last_value(self):
        if not self:
            raise IndexError(f"score {self._name!r} has no recorded values")
        return self[-1]

    def __getattr__(self, field: str):
        if field.startswith("_") or self._store is None:
            raise AttributeError(field)
        last = field.startswith("last_")
        base = field[5:] if last else field
        key = f"{self._name}__{base}"
        if key not in self._store:
            raise AttributeError(
                f"score {self._name!r} has no field {base!r}"
            )
        vals = self._store[key]
        if last:
            if not vals:
                raise IndexError(f"score {self._name!r} has no recorded values")
            return vals[-1]
        return list(vals)


# ------------------------------------------------------------------ scores
class BaseScore:
    """Named score config (scores.py:99-197). Subclasses implement
    collect(model, pass_scores) -> {'value': v, <extra>: ...}; extras are
    tracked under <name>__<field>."""

    _auto_prefix = "score"
    _n_auto = 0

    def __init__(self, name: str | None = None):
        if name is None:
            BaseScore._n_auto += 1
            name = f"{self._auto_prefix}_{BaseScore._n_auto}"
        self.name = name

    def collect(self, model, pass_scores: dict) -> dict[str, Any]:
        raise NotImplementedError


class PerplexityScore(BaseScore):
    """scores.py:291-352 / score/perplexity.cc. Kernel-side: reads the
    pass's cumulative partials, no extra job.

    class_ids (perplexity.cc:66-80) scopes the sum to those modalities'
    token occurrences. The kernel partials are corpus-wide, so the
    scoped variant recomputes p(w|d) = sum_t phi_wt theta_td over the
    fit corpus — one extra join job per update, needs cache_theta."""

    _auto_prefix = "perplexity"

    def __init__(self, name=None, class_ids=None, dictionary=None,
                 transaction_typenames=None):
        super().__init__(name)
        self.class_ids = class_ids
        self.dictionary = dictionary
        self.transaction_typenames = transaction_typenames

    def collect(self, model, pass_scores):
        if self.class_ids is not None:
            scoped = self._class_scoped(model)
            if scoped is not None:
                return scoped
        if (
            self.dictionary is not None
            and "perplexity@coll" in pass_scores
        ):
            # UnigramCollectionModel: the kernel emitted the
            # dictionary-fallback variant alongside the document model
            return {
                "value": pass_scores["perplexity@coll"],
                "raw": pass_scores.get("perplexity_raw@coll", float("nan")),
                "normalizer": pass_scores.get(
                    "perplexity_normalizer@coll", float("nan")
                ),
                "zero_tokens": pass_scores.get(
                    "perplexity_zero_words@coll", 0.0
                ),
            }
        return {
            "value": pass_scores.get("perplexity", float("nan")),
            "raw": pass_scores.get("perplexity_raw", float("nan")),
            "normalizer": pass_scores.get("perplexity_normalizer", float("nan")),
            "zero_tokens": pass_scores.get("perplexity_zero_words", 0.0),
        }

    def _class_scoped(self, model):
        import math

        from pyspark.sql import functions as F

        docs = getattr(model, "_last_fit_docs", None)
        if docs is None or model.theta is None:
            return None
        sel = list(self.class_ids)
        d = docs.filter(F.col("class_id").isin(sel)).select(
            "doc_id", "class_id", "token", "weight"
        )
        phi_long = model.pwt.to_long().filter(F.col("class_id").isin(sel))
        theta = model.theta.select(
            "doc_id", "topic", F.col("value").alias("_th")
        )
        # route the join through the occurring (doc, token) pairs so the
        # blow-up is occurrences x T (kernel-scale), never vocab x docs
        occ = d.select("doc_id", "class_id", "token").distinct()
        pwd = (
            occ.join(phi_long, ["class_id", "token"])
            .join(theta, ["doc_id", "topic"])
            .groupBy("doc_id", "class_id", "token")
            .agg(F.sum(F.col("value") * F.col("_th")).alias("_pwd"))
        )
        row = (
            d.join(pwd, ["doc_id", "class_id", "token"])
            .agg(
                F.sum(
                    F.when(
                        F.col("_pwd") > 0,
                        F.col("weight") * F.log("_pwd"),
                    ).otherwise(F.lit(0.0))
                ).alias("raw"),
                F.sum("weight").alias("norm"),
                F.sum(
                    F.when(F.col("_pwd") <= 0, F.col("weight")).otherwise(
                        F.lit(0.0)
                    )
                ).alias("zero"),
            )
            .collect()[0]
        )
        raw, norm = -(row["raw"] or 0.0), row["norm"] or 0.0
        return {
            "value": math.exp(raw / norm) if norm > 0 else float("nan"),
            "raw": raw,
            "normalizer": norm,
            "zero_tokens": row["zero"] or 0.0,
        }


class SparsityThetaScore(BaseScore):
    """scores.py:238-287. Kernel-side partials."""

    _auto_prefix = "sparsity_theta"

    def __init__(self, name=None, topic_names=None, eps=None):
        super().__init__(name)
        self.topic_names = topic_names
        self.eps = eps

    def collect(self, model, pass_scores):
        return {
            "value": pass_scores.get("sparsity_theta", float("nan")),
            "zero_topics": pass_scores.get("sparsity_theta_zero", 0.0),
            "total_topics": pass_scores.get("sparsity_theta_total", 0.0),
        }


class ItemsProcessedScore(BaseScore):
    """scores.py:356-377."""

    _auto_prefix = "items_processed"

    def collect(self, model, pass_scores):
        return {"value": pass_scores.get("items_processed", 0.0)}


class SparsityPhiScore(BaseScore):
    """scores.py:198-236: one light aggregate over the fresh p_wt."""

    _auto_prefix = "sparsity_phi"

    def __init__(self, name=None, class_id=None, topic_names=None, eps=None):
        super().__init__(name)
        self.class_id = class_id
        self.topic_names = topic_names
        self.eps = eps

    def collect(self, model, pass_scores):
        from pyspark.sql import functions as F

        eps = self.eps if self.eps is not None else _scores.PHI_EPS
        long = model.pwt.to_long()
        if self.class_id is not None:
            long = long.filter(F.col("class_id") == self.class_id)
        if self.topic_names is not None:
            # per-topic-subset sparsity (scores.py:202-229 topic_names)
            long = long.filter(F.col("topic").isin(list(self.topic_names)))
        row = long.agg(
            F.sum(F.when(F.col("value") < eps, 1).otherwise(0)).alias("z"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        zero, total = row["z"] or 0, row["n"]
        return {
            "value": zero / total if total else 0.0,
            "zero_tokens": float(zero),
            "total_tokens": float(total),
        }


class TopicMassPhiScore(BaseScore):
    """scores.py:550-600: n_t masses from the current n_wt."""

    _auto_prefix = "topic_mass"

    def __init__(self, name=None, class_ids=None, topic_names=None, eps=None):
        super().__init__(name)
        self.class_ids = class_ids
        self.topic_names = topic_names
        self.eps = eps

    def collect(self, model, pass_scores):
        rows = _scores.topic_mass_phi(model.nwt).collect()
        if self.class_ids is not None:
            rows = [r for r in rows if r["class_id"] in self.class_ids]
        mass = {r["topic"]: r["topic_mass"] for r in rows}
        ratio = {r["topic"]: r["topic_ratio"] for r in rows}
        return {
            "value": float(sum(mass.values())),
            "topic_mass": mass,
            "topic_ratio": ratio,
        }


class BackgroundTokensRatioScore(BaseScore):
    """scores.py:604-640 / score/background_tokens_ratio.cc."""

    _auto_prefix = "background_tokens_ratio"

    def __init__(self, name=None, class_id=None, delta_threshold=0.5,
                 save_tokens=True, direct_kl=True):
        super().__init__(name)
        self.class_id = class_id
        self.delta_threshold = delta_threshold
        self.save_tokens = save_tokens
        self.direct_kl = direct_kl

    def collect(self, model, pass_scores):
        df = _scores.background_tokens_ratio(
            model.pwt,
            delta_threshold=self.delta_threshold,
            direct_kl=self.direct_kl,
        )
        if self.class_id is not None:
            from pyspark.sql import functions as F

            df = df.filter(F.col("class_id") == self.class_id)
        rows = df.collect()
        bg = [r["token"] for r in rows if r["is_background"]]
        out = {"value": len(bg) / len(rows) if rows else 0.0}
        if self.save_tokens:
            out["tokens"] = sorted(bg)
        return out


class TopTokensScore(BaseScore):
    """scores.py:381-427: per-topic top tokens (+ coherence with a cooc
    dictionary). value = num tokens extracted; tokens/weights are the
    reference tracker's per-topic dicts."""

    _auto_prefix = "top_tokens"

    def __init__(self, name=None, class_id=None, topic_names=None,
                 num_tokens=10, dictionary=None):
        super().__init__(name)
        self.class_id = class_id
        self.topic_names = topic_names
        self.num_tokens = num_tokens
        self.dictionary = dictionary  # cooc(token_a, token_b, value)

    def collect(self, model, pass_scores):
        from bigartm_spark.operators.topk import top_tokens, top_tokens_coherence

        long = model.pwt.to_long()
        from pyspark.sql import functions as F

        # class_id=None means the proto default "@default_class"
        # (messages.proto TopTokensScoreConfig, top_tokens.cc:45-53) —
        # NOT all modalities
        long = long.filter(
            F.col("class_id") == (self.class_id or "@default_class")
        )
        if self.topic_names is not None:
            long = long.filter(F.col("topic").isin(list(self.topic_names)))
        top = top_tokens(long, k=self.num_tokens).cache()
        rows = top.orderBy("topic", "rank").collect()
        tokens: dict[str, list] = {}
        weights: dict[str, list] = {}
        for r in rows:
            tokens.setdefault(r["topic"], []).append(r["token"])
            weights.setdefault(r["topic"], []).append(r["value"])
        out = {
            "value": float(len(rows)),
            "num_tokens": float(len(rows)),
            "tokens": tokens,
            "weights": weights,
        }
        if self.dictionary is not None:
            coh = top_tokens_coherence(top, self.dictionary, self.num_tokens)
            crows = coh.collect()
            out["coherence"] = {r["topic"]: r["coherence"] for r in crows}
            out["average_coherence"] = (
                sum(out["coherence"].values()) / len(crows) if crows else 0.0
            )
        top.unpersist()
        return out


class TopicKernelScore(BaseScore):
    """scores.py:487-546: kernel size/purity/contrast per topic."""

    _auto_prefix = "topic_kernel"

    def __init__(self, name=None, class_id=None, topic_names=None,
                 probability_mass_threshold=0.1, dictionary=None, eps=None):
        super().__init__(name)
        self.class_id = class_id
        self.topic_names = topic_names
        self.probability_mass_threshold = probability_mass_threshold
        self.dictionary = dictionary
        self.eps = eps

    def collect(self, model, pass_scores):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        rows = _scores.topic_kernel(
            model.pwt,
            threshold=self.probability_mass_threshold,
            cooc=self.dictionary,
        ).collect()
        if self.class_id is not None:
            rows = [r for r in rows if r["class_id"] == self.class_id]
        # kernel membership (score_tracker.py TopicKernel tokens field):
        # W_t = {w : p(t|w) > threshold}, bounded by the kernel sizes
        long = model.pwt.to_long()
        if self.class_id is not None:
            long = long.filter(F.col("class_id") == self.class_id)
        wtok = Window.partitionBy("class_id", "token")
        members = (
            long.withColumn(
                "_ptw", F.col("value") / F.sum("value").over(wtok)
            )
            .filter(F.col("_ptw") > self.probability_mass_threshold)
            .select("topic", "token")
            .collect()
        )
        ker_tokens: dict[str, list] = {}
        for r in members:
            ker_tokens.setdefault(r["topic"], []).append(r["token"])
        for v in ker_tokens.values():
            v.sort()
        size = {r["topic"]: float(r["kernel_size"]) for r in rows}
        purity = {r["topic"]: r["purity"] for r in rows}
        contrast = {r["topic"]: r["contrast"] for r in rows}
        n = len(rows) or 1
        out = {
            "value": sum(size.values()) / n,
            "average_size": sum(size.values()) / n,
            "average_purity": sum(purity.values()) / n,
            "average_contrast": sum(contrast.values()) / n,
            "size": size,
            "purity": purity,
            "contrast": contrast,
            "tokens": ker_tokens,
        }
        if self.dictionary is not None:
            coh = {
                r["topic"]: (r["kernel_coherence"] or 0.0)
                for r in rows
                if "kernel_coherence" in r.asDict()
            }
            out["coherence"] = coh
            out["average_coherence"] = (
                sum(coh.values()) / len(coh) if coh else 0.0
            )
        return out


class ThetaSnippetScore(BaseScore):
    """scores.py:431-460: theta rows of the first num_items docs.
    Requires cache_theta."""

    _auto_prefix = "theta_snippet"

    def __init__(self, name=None, num_items=10):
        super().__init__(name)
        self.num_items = num_items

    def collect(self, model, pass_scores):
        if model.theta is None:
            return {"value": 0.0, "snippet": {}, "document_ids": []}
        rows = _scores.theta_snippet(model.theta, self.num_items).collect()
        snip: dict[int, dict] = {}
        for r in rows:
            snip.setdefault(r["doc_id"], {})[r["topic"]] = r["value"]
        return {
            "value": float(len(snip)),
            "snippet": snip,
            "document_ids": sorted(snip),
        }


class ClassPrecisionScore(BaseScore):
    """scores.py:644-668: argmax-class accuracy. The reference scores
    inside the processor using the batch's true class labels; here the
    labelled corpus must be supplied (docs + truth(doc_id, label)) since
    the fit corpus carries no label column — collection then runs one
    predict job per update, exactly the reference's per-sync cost."""

    _auto_prefix = "class_precision"

    def __init__(self, name=None, docs=None, truth=None,
                 predict_class_id="@default_class"):
        super().__init__(name)
        self.docs = docs
        self.truth = truth
        self.predict_class_id = predict_class_id

    def collect(self, model, pass_scores):
        if self.docs is None or self.truth is None:
            return {"value": float("nan"), "error": float("nan"), "total": 0.0}
        preds = model.predict_class_id(self.docs, self.predict_class_id)
        row = _scores.class_precision(preds, self.truth).collect()[0]
        return {
            "value": row["precision"],
            "error": 1.0 - row["precision"],
            "total": float(row["n_items"]),
        }


class Scores:
    """The model.scores container (scores.py:45-96)."""

    def __init__(self, model):
        self._model = model
        self._data: dict[str, BaseScore] = {}

    def add(self, score: BaseScore, overwrite: bool = False) -> None:
        if score.name in self._data and not overwrite:
            raise AttributeError(
                f"score {score.name!r} already attached; use overwrite=True"
            )
        self._data[score.name] = score

    def __getitem__(self, name: str) -> BaseScore:
        return self._data[name]

    def __setitem__(self, name: str, score: BaseScore) -> None:
        score.name = name
        self.add(score, overwrite=True)

    def __contains__(self, name: str) -> bool:
        return name in self._data

    def __len__(self) -> int:
        return len(self._data)

    def __iter__(self):
        return iter(self._data.values())

    @property
    def size(self) -> int:
        return len(self._data)

    @property
    def data(self) -> dict[str, BaseScore]:
        return dict(self._data)


# ------------------------------------------------------------ regularizers
class BaseRegularizer:
    """Named wrapper over an engine regularizer object
    (regularizers.py:135-197). Tunable fields (tau, gamma, alpha_iter,
    ...) proxy straight onto the engine object, which reads them at
    apply time — so retuning between fits needs no reconfigure call."""

    _auto_prefix = "regularizer"
    _n_auto = 0
    _kind = "phi"  # phi | theta | ptdw | transform
    _PROXIED = (
        "tau", "gamma", "alpha_iter", "topic_names", "class_ids",
        "topic_pairs",
    )

    def __init__(self, name: str | None = None, engine: Any = None):
        if name is None:
            BaseRegularizer._n_auto += 1
            name = f"{self._auto_prefix}_{BaseRegularizer._n_auto}"
        object.__setattr__(self, "name", name)
        object.__setattr__(self, "_engine", engine)

    def __getattr__(self, field):
        eng = object.__getattribute__(self, "_engine")
        if eng is not None and hasattr(eng, field):
            return getattr(eng, field)
        raise AttributeError(field)

    def __setattr__(self, field, value):
        eng = object.__getattribute__(self, "_engine")
        if field in self._PROXIED and eng is not None and hasattr(eng, field):
            setattr(eng, field, value)
        else:
            object.__setattr__(self, field, value)


class SmoothSparsePhiRegularizer(BaseRegularizer):
    """regularizers.py:328-388 -> engine SmoothSparsePhi (H1). tau > 0
    smooths, tau < 0 sparsifies; gamma switches to relative
    regularization."""

    _auto_prefix = "smooth_sparse_phi"

    def __init__(self, name=None, tau=1.0, gamma=None, class_ids=None,
                 topic_names=None, dictionary=None, kl_function_info=None):
        eng = _engine.SmoothSparsePhi(
            tau=tau,
            topic_names=topic_names,
            class_ids=class_ids,
            use_dictionary=dictionary is not None or False,
            transform_function=_to_transform(kl_function_info),
        )
        eng.gamma = gamma
        super().__init__(name, eng)


class SmoothSparseThetaRegularizer(BaseRegularizer):
    """regularizers.py:389-502 -> engine SmoothSparseTheta (H2, a theta
    agent inside the E-step kernel)."""

    _auto_prefix = "smooth_sparse_theta"
    _kind = "theta"

    def __init__(self, name=None, tau=1.0, topic_names=None,
                 alpha_iter=None, kl_function_info=None,
                 doc_titles=None, doc_topic_coef=None):
        eng = _engine.SmoothSparseTheta(
            tau=tau,
            alpha_iter=alpha_iter,
            transform_function=_to_transform(kl_function_info),
        )
        super().__init__(name, eng)
        object.__setattr__(self, "topic_names", topic_names)
        # per-doc scope (regularizers.py:389-502 doc_titles /
        # doc_topic_coef): held on the config — titles resolve to doc
        # ids against the fit corpus, so ARTM re-resolves at every fit
        # (mutating these between fits works like the reference's
        # reconfigure)
        object.__setattr__(self, "doc_titles", doc_titles)
        object.__setattr__(self, "doc_topic_coef", doc_topic_coef)

    def _resolve(self, topics: list[str]) -> None:
        """topic_names -> the engine's positional 0/1 mask (needs the
        model's topic order, known only at attach time)."""
        if self.topic_names is not None:
            import numpy as np

            sel = set(self.topic_names)
            self._engine.topic_mask = np.array(
                [1.0 if t in sel else 0.0 for t in topics]
            )


class DecorrelatorPhiRegularizer(BaseRegularizer):
    """regularizers.py:503-584 -> engine DecorrelatorPhi (H3)."""

    _auto_prefix = "decorrelator_phi"

    def __init__(self, name=None, tau=1.0, gamma=None, class_ids=None,
                 topic_names=None, topic_pairs=None):
        eng = _engine.DecorrelatorPhi(
            tau=tau, topic_names=topic_names, gamma=gamma,
            class_ids=class_ids, topic_pairs=topic_pairs,
        )
        super().__init__(name, eng)


class LabelRegularizationPhiRegularizer(BaseRegularizer):
    """regularizers.py:585-618 -> engine LabelRegularizationPhi (H4)."""

    _auto_prefix = "label_regularization_phi"

    def __init__(self, name=None, tau=1.0, gamma=None, class_ids=None,
                 topic_names=None, dictionary=None):
        eng = _engine.LabelRegularizationPhi(
            tau=tau, topic_names=topic_names, gamma=gamma, class_ids=class_ids
        )
        super().__init__(name, eng)
        object.__setattr__(self, "dictionary", dictionary)


class SpecifiedSparsePhiRegularizer(BaseRegularizer):
    """regularizers.py:619-739 -> specified_sparse_phi_transform (H5 —
    rewrites p_wt in place post-normalize, so it attaches as a phi
    transform, not an additive delta)."""

    _auto_prefix = "specified_sparse_phi"
    _kind = "transform"

    def __init__(self, name=None, tau=1.0, class_id=None, topic_names=None,
                 max_elements_count=20, probability_threshold=0.99,
                 sparse_by_columns=True):
        fn = _engine.specified_sparse_phi_transform(
            max_elements=max_elements_count,
            probability_threshold=probability_threshold,
            by_column=sparse_by_columns,
        )
        super().__init__(name, None)
        object.__setattr__(self, "transform", fn)
        object.__setattr__(self, "tau", tau)
        object.__setattr__(self, "class_id", class_id)
        object.__setattr__(self, "topic_names", topic_names)


class ImproveCoherencePhiRegularizer(BaseRegularizer):
    """regularizers.py:740-774 -> engine ImproveCoherencePhi (H6).
    dictionary = the cooc relation (token_a, token_b, value)."""

    _auto_prefix = "improve_coherence_phi"

    def __init__(self, name=None, tau=1.0, class_ids=None, topic_names=None,
                 dictionary=None):
        if dictionary is None:
            raise ValueError(
                "ImproveCoherencePhiRegularizer needs the cooc dictionary"
            )
        cls = (class_ids[0] if class_ids else "@default_class")
        eng = _engine.ImproveCoherencePhi(
            tau=tau, cooc=dictionary, class_id=cls, topic_names=topic_names
        )
        super().__init__(name, eng)


class SmoothPtdwRegularizer(BaseRegularizer):
    """regularizers.py:775-792 -> engine SmoothPtdw (H7, ptdw agent)."""

    _auto_prefix = "smooth_ptdw"
    _kind = "ptdw"

    def __init__(self, name=None, tau=1.0, window=20):
        super().__init__(name, _engine.SmoothPtdw(tau=tau, window=window))


class TopicSelectionThetaRegularizer(BaseRegularizer):
    """regularizers.py:793-818 -> engine TopicSelectionTheta (H8)."""

    _auto_prefix = "topic_selection_theta"
    _kind = "theta"

    def __init__(self, name=None, tau=1.0, topic_names=None, alpha_iter=None,
                 topic_value=None):
        # topic_value mirrors TopicSelectionThetaConfig.topic_value
        # (topic_selection_theta.cc:108-123): fixed per-topic damping
        # values; when absent the engine computes them batch-locally
        import numpy as np

        eng = _engine.TopicSelectionTheta(
            tau=tau, alpha_iter=alpha_iter,
            topic_value=(
                np.asarray(topic_value, dtype=float)
                if topic_value is not None else None
            ),
        )
        super().__init__(name, eng)
        object.__setattr__(self, "topic_names", topic_names)

    def _resolve(self, topics):
        pass


class BitermsPhiRegularizer(BaseRegularizer):
    """regularizers.py:819-853 -> engine BitermsPhi (H9).
    dictionary = the cooc relation."""

    _auto_prefix = "biterms_phi"

    def __init__(self, name=None, tau=1.0, class_ids=None, topic_names=None,
                 dictionary=None):
        if dictionary is None:
            raise ValueError("BitermsPhiRegularizer needs the cooc dictionary")
        # reference scripts pass the Dictionary facade
        # (test_regularizer_biterms.py:97-103); the engine wants its
        # bundled cooc relation. A raw cooc DataFrame still works.
        cooc = getattr(dictionary, "cooc", None)
        if cooc is None:
            cooc = dictionary
        cls = (class_ids[0] if class_ids else "@default_class")
        eng = _engine.BitermsPhi(
            tau=tau, cooc=cooc, class_id=cls, topic_names=topic_names
        )
        super().__init__(name, eng)


class HierarchySparsingThetaRegularizer(BaseRegularizer):
    """regularizers.py:854-900 -> engine HierarchySparsingTheta (H10)."""

    _auto_prefix = "hierarchy_sparsing_theta"
    _kind = "theta"

    def __init__(self, name=None, tau=1.0, topic_names=None, alpha_iter=None):
        super().__init__(name, _engine.HierarchySparsingTheta(tau=tau))

    def _resolve(self, topics):
        pass


class TopicSegmentationPtdwRegularizer(BaseRegularizer):
    """regularizers.py:901-942 -> engine TopicSegmentationPtdw (H11)."""

    _auto_prefix = "topic_segmentation_ptdw"
    _kind = "ptdw"

    def __init__(self, name=None, window=10, threshold=0.3,
                 background_topic_names=None):
        super().__init__(
            name, _engine.TopicSegmentationPtdw(window=window, threshold=threshold)
        )
        object.__setattr__(
            self, "background_topic_names", background_topic_names
        )

    def _resolve(self, topics) -> None:
        if self.background_topic_names is not None:
            import numpy as np

            sel = set(self.background_topic_names)
            self._engine.background_topic_mask = np.array(
                [t in sel for t in topics], dtype=bool
            )


class SmoothTimeInTopicsPhiRegularizer(BaseRegularizer):
    """regularizers.py:943-1002 -> engine SmoothTimeInTopicsPhi (H12).
    token_order(class_id?, token, order) gives the time axis (the
    reference uses batch item order)."""

    _auto_prefix = "smooth_time_in_topics_phi"

    def __init__(self, name=None, tau=1.0, class_id="@default_class",
                 topic_names=None, token_order=None):
        eng = _engine.SmoothTimeInTopicsPhi(
            tau=tau, token_order=token_order, class_id=class_id,
            topic_names=topic_names,
        )
        super().__init__(name, eng)

    def _resolve(self, topics) -> None:
        pass

    def _resolve_token_order(self, model) -> None:
        """The reference's time axis is the batch's token order
        (smooth_time_in_topics_phi.cc iterates tokens as stored). With
        no explicit token_order relation, derive a deterministic one
        from the model dictionary: vocab_order when the dictionary was
        gathered against a vocab file (E10), else lexicographic."""
        if self._engine.token_order is not None or model.dictionary is None:
            return
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        d = model.dictionary.filter(
            F.col("class_id") == self._engine.class_id
        )
        order_col = (
            "vocab_order" if "vocab_order" in d.columns else "token"
        )
        w = Window.orderBy(order_col)
        self._engine.token_order = d.select(
            "token", F.row_number().over(w).cast("long").alias("ord")
        )


class NetPlsaPhiRegularizer(BaseRegularizer):
    """regularizers.py:1003-1096 -> engine NetPlsaPhi (H13).

    Two equivalent parameterizations:
    - engine form: ``edges`` DataFrame (src, dst, weight) [+
      ``vertex_weights`` DataFrame (token, d)];
    - reference form: ``vertex_names`` list, ``vertex_weights`` list
      aligned with it, and ``edge_weights`` {src_idx: {dst_idx: w}} —
      the relations are built from these, and mutating any of them
      after construction (the upstream test's pattern) rebuilds them."""

    _auto_prefix = "net_plsa_phi"
    _REF_FIELDS = ("vertex_names", "edge_weights")

    def __init__(self, name=None, tau=1.0, class_id="vertex",
                 topic_names=None, edges=None, vertex_weights=None,
                 vertex_names=None, edge_weights=None):
        eng = _engine.NetPlsaPhi(
            tau=tau, edges=edges, class_id=class_id,
            vertex_weights=(
                vertex_weights
                if not isinstance(vertex_weights, (list, tuple))
                else None
            ),
            topic_names=topic_names,
        )
        super().__init__(name, eng)
        object.__setattr__(self, "vertex_names", vertex_names)
        object.__setattr__(self, "edge_weights", edge_weights)
        if isinstance(vertex_weights, (list, tuple)):
            object.__setattr__(self, "_vw_list", list(vertex_weights))
        else:
            object.__setattr__(self, "_vw_list", None)
        self._maybe_build()

    def __setattr__(self, field, value):
        if field == "class_id":
            self._engine.class_id = value
            return
        if field == "vertex_weights" and isinstance(value, (list, tuple)):
            object.__setattr__(self, "_vw_list", list(value))
            self._maybe_build()
            return
        if field in self._REF_FIELDS:
            object.__setattr__(self, field, value)
            self._maybe_build()
            return
        super().__setattr__(field, value)

    def _maybe_build(self) -> None:
        names = object.__getattribute__(self, "vertex_names")
        ew = object.__getattribute__(self, "edge_weights")
        if not names or not ew:
            return
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.getActiveSession()
            or SparkSession.builder.getOrCreate()
        )
        rows = [
            (names[i], names[j], float(w))
            for i, nbrs in ew.items()
            for j, w in nbrs.items()
        ]
        self._engine.edges = spark.createDataFrame(
            rows, "src string, dst string, weight double"
        )
        vw = object.__getattribute__(self, "_vw_list")
        if vw is not None:
            self._engine.vertex_weights = spark.createDataFrame(
                list(zip(names, [float(x) for x in vw])),
                "token string, d double",
            )


class MultiLanguagePhiRegularizer(BaseRegularizer):
    """regularizers.py maps to the reference no-op stub (H14)."""

    _auto_prefix = "multilanguage_phi"

    def __init__(self, name=None, tau=1.0):
        super().__init__(name, _engine.MultiLanguagePhi(tau=tau))


class KlFunctionInfo:
    """regularizers.py:51-84: transform-function spec for SmoothSparse*.
    function_type 'log' (f = ln x) or 'pol' (f = a x^n)."""

    def __init__(self, function_type: str = "log", power_value: float = 2.0,
                 a_value: float = 1.0):
        if function_type not in ("log", "pol"):
            raise ValueError("function_type should be 'log' or 'pol'")
        self.function_type = function_type
        self.power_value = power_value
        self.a_value = a_value


def _to_transform(kl: KlFunctionInfo | None):
    if kl is None:
        return None
    if kl.function_type == "log":
        return _engine.TransformFunction("logarithm")
    return _engine.TransformFunction(
        "polynomial", a=kl.a_value, n=kl.power_value
    )


class Regularizers:
    """The model.regularizers container (regularizers.py:85-134): add
    routes each config to the engine list its kind runs in (phi delta /
    theta agent / ptdw agent / phi transform)."""

    def __init__(self, model):
        self._model = model
        self._data: dict[str, BaseRegularizer] = {}

    def add(self, config: BaseRegularizer, overwrite: bool = False) -> None:
        if config.name in self._data and not overwrite:
            raise AttributeError(
                f"regularizer {config.name!r} already attached; "
                "use overwrite=True"
            )
        if config.name in self._data:
            self._detach(self._data[config.name])
        self._data[config.name] = config
        if hasattr(config, "_resolve"):
            config._resolve(self._model.topics)
        kind = config._kind
        if kind == "phi":
            self._model.phi_regularizers.append(config._engine)
        elif kind == "theta":
            self._model.theta_agents.append(config._engine)
        elif kind == "ptdw":
            self._model.ptdw_agents.append(config._engine)
        elif kind == "transform":
            self._model.phi_transforms.append(config.transform)

    def _detach(self, config: BaseRegularizer) -> None:
        for lst in (
            self._model.phi_regularizers,
            self._model.theta_agents,
            getattr(self._model, "ptdw_agents", []),
        ):
            if config._engine in lst:
                lst.remove(config._engine)
        if config._kind == "transform":
            if config.transform in self._model.phi_transforms:
                self._model.phi_transforms.remove(config.transform)

    def __delitem__(self, name: str) -> None:
        self._detach(self._data.pop(name))

    def __getitem__(self, name: str) -> BaseRegularizer:
        return self._data[name]

    def __setitem__(self, name: str, config: BaseRegularizer) -> None:
        config.name = name
        self.add(config, overwrite=True)

    def __contains__(self, name: str) -> bool:
        return name in self._data

    def __len__(self) -> int:
        return len(self._data)

    def __iter__(self):
        return iter(self._data.values())

    @property
    def size(self) -> int:
        return len(self._data)

    @property
    def data(self) -> dict[str, BaseRegularizer]:
        return dict(self._data)


def resolve_doc_scope(cfgs, docs):
    """Resolve SmoothSparseTheta doc_titles / doc_topic_coef on config
    objects into their engines' doc_ids / per-doc coefficient maps
    against THIS corpus (smooth_sparse_theta.cc:389-502 scoping: empty
    item list = coefficients apply to all items). Shared by
    ARTM._resolve_doc_scoped_agents and the low-level
    MasterComponent.process_batches path."""
    import numpy as np
    from pyspark.sql import functions as F

    scoped = [c for c in cfgs if getattr(c, "doc_titles", None) is not None]
    if not scoped:
        return
    titles = sorted({t for c in scoped for t in c.doc_titles})
    by_title = {}
    if titles:
        rows = (
            docs.filter(F.col("title").isin(titles))
            .select("doc_id", "title")
            .distinct()
            .collect()
        )
        by_title = {r["title"]: r["doc_id"] for r in rows}
    for c in scoped:
        eng = c._engine
        coef = getattr(c, "doc_topic_coef", None)
        if not c.doc_titles:
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
            eng.doc_topic_coef = {
                by_title[t]: np.asarray(cf, dtype=float)
                for t, cf in zip(c.doc_titles, coef)
                if t in by_title
            }
        else:
            eng.doc_topic_coef = np.asarray(coef, dtype=float)
