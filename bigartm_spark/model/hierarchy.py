"""G11 hARTM — hierarchical topic models.

Reference: python/artm/hierarchy_utils.py:18-330 + the parent pseudo-batch
trick (A12, phi_matrix_operations.cc:496-533): to couple level k to level
k-1, the parent Phi is converted into a synthetic batch whose "documents"
are the parent topics (doc t has token w with weight phi_parent[w,t] *
parent_level_weight). Fitting the child on corpus + pseudo-batch makes
theta(pseudo-doc = parent topic) = Psi = p(child topic | parent topic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bigartm_spark.model.artm import ARTM
from bigartm_spark.model.phi import PhiMatrix
from bigartm_spark.schemas import DEFAULT_TRANSACTION


def phi_to_pseudo_batch(
    phi: PhiMatrix,
    parent_level_weight: float = 1.0,
    doc_id_offset: int = -1_000_000,
) -> DataFrame:
    """A12: parent Phi -> synthetic docs. Pseudo doc_ids are negative
    (offset - topic_index) so they never collide with corpus ids."""
    topic_idx = F.map_from_arrays(
        F.array(*[F.lit(t) for t in phi.topics]),
        F.array(*[F.lit(i) for i in range(len(phi.topics))]),
    )
    long = phi.to_long(eps=0.0)
    return long.select(
        (F.lit(doc_id_offset) - topic_idx[F.col("topic")]).alias("doc_id"),
        F.concat(F.lit("@parent_phi_"), F.col("topic")).alias("title"),
        F.lit("@parent").alias("batch_id"),
        "class_id",
        "token",
        (F.col("value") * F.lit(float(parent_level_weight))).alias("weight"),
        F.row_number()
        .over(Window.partitionBy("topic").orderBy("class_id", "token"))
        .cast("int")
        .alias("pos"),
    ).withColumn("transaction_id", F.col("pos")).withColumn(
        "transaction_typename", F.lit(DEFAULT_TRANSACTION)
    )


class HARTM:
    """Hierarchy of ARTM levels (hierarchy_utils.py:18-330). add_level
    fits the new level on corpus ∪ parent-pseudo-batch; psi(level) reads
    the pseudo-docs' theta. Navigation/stacking surface mirrors the
    reference: get_level/del_level/[]/iter/num_levels, whole-hierarchy
    fit_offline / get_theta / get_phi / transform / save / load /
    clone / dispose."""

    def __init__(
        self,
        dictionary=None,
        num_document_passes: int | None = None,
        cache_theta: bool = True,
        theta_columns_naming: str = "id",
        seed: int = 0,
        tmp_files_path: str | None = None,
        num_processors: int | None = None,
        class_ids: dict[str, float] | None = None,
        reuse_theta: bool | None = None,
        **_artm_common,
    ):
        """Reference ctor kwargs (hierarchy_utils.py:18-60) become the
        common model args applied to every level created by the
        deferred add_level style. tmp_files_path is accepted and
        ignored: parent pseudo-batches are DataFrame unions here, no
        temp batch files exist."""
        self.levels: list[ARTM] = []
        self._parent_level_weights: list[float] = []
        self._dictionary = dictionary
        # hierarchy_utils.py:78-81: non-positive seed falls back to 321,
        # and each level gets a DISTINCT derived seed (see _get_seed) —
        # with the token-hash reference init a child level seeded like
        # its parent would start with the parent's exact topics, the
        # degenerate case the reference docs warn about
        self._seed = seed if seed and seed > 0 else 321
        self._common = dict(_artm_common)
        if num_document_passes is not None:
            self._common["num_document_passes"] = num_document_passes
        if class_ids is not None:
            self._common["class_ids"] = class_ids
        if reuse_theta is not None:
            self._common["reuse_theta"] = reuse_theta
        self._common["cache_theta"] = cache_theta
        self._common["theta_columns_naming"] = theta_columns_naming

    def add_level(
        self,
        docs: DataFrame | None = None,
        dictionary: DataFrame | None = None,
        num_topics: int | None = None,
        topic_names: list[str] | None = None,
        num_collection_passes: int = 1,
        parent_level_weight: float = 1.0,
        seed: int | None = None,
        **artm_kwargs,
    ) -> ARTM:
        """Two styles, one verb (hierarchy_utils.py:236-292):

        - reference style (``docs`` omitted): create the level and
          return it UNFITTED — the caller runs ``level.initialize(...)``
          and ``level.fit_offline(batch_vectorizer=...)``, as reference
          scripts do;
        - immediate style (``docs`` given): initialize + parent-wire +
          fit in one call (this package's original surface).
        """
        import warnings

        if topic_names is None:
            if num_topics is None:
                raise ValueError("give num_topics or topic_names")
            topic_names = [
                f"level{len(self.levels)}_topic_{i}" for i in range(num_topics)
            ]
        num_topics = len(topic_names)
        if self.levels and num_topics <= self.levels[-1].num_topics:
            # hierarchy_utils.py:262-265: child levels are expected to
            # refine the parent with MORE topics
            warnings.warn(
                f"adding level with num_topics={num_topics} <= parent "
                f"level's {self.levels[-1].num_topics}"
            )
        kwargs = {**self._common, **artm_kwargs}
        kwargs.setdefault("cache_theta", True)
        # (see _get_seed below for the per-level derivation)
        model = ARTM(
            topic_names=topic_names,
            seed=self._get_seed(len(self.levels)) if seed is None else seed,
            **kwargs,
        )
        if self.levels and self.levels[-1].pwt is not None:
            # child wiring (ARTM_Level, hierarchy_utils.py:535-661):
            # fit_offline unions the parent pseudo-batch itself, and the
            # level answers get_psi() directly. A not-yet-fitted parent
            # defers wiring to HARTM.fit_offline's rewire pass.
            model.set_parent_model(self.levels[-1], parent_level_weight)
        if docs is not None:
            model.initialize(
                dictionary if dictionary is not None else self._dictionary
            )
            model.fit_offline(docs, num_collection_passes)
        self.levels.append(model)
        self._parent_level_weights.append(float(parent_level_weight))
        return model

    # -- navigation (hierarchy_utils.py:293-318) ---------------------------
    @property
    def num_levels(self) -> int:
        return len(self.levels)

    def _get_seed(self, level_idx: int) -> int:
        """Per-level seed, the reference's exact derivation
        (hierarchy_utils.py:233-235): numpy seeded with the hierarchy
        seed, level i takes the i-th draw of randint(10000)."""
        import numpy as np

        rs = np.random.RandomState(self._seed)
        return int(rs.randint(10000, size=level_idx + 1)[-1])

    def get_level(self, level_idx: int) -> ARTM:
        return self.levels[level_idx]

    def del_level(self, level_idx: int) -> None:
        """Remove level level_idx AND every level below it (children are
        coupled to the parent phi, hierarchy_utils.py:293-303)."""
        if level_idx == -1:
            self.levels.pop()
            self._parent_level_weights.pop()
            return
        del self.levels[level_idx:]
        del self._parent_level_weights[level_idx:]

    def __getitem__(self, i: int) -> ARTM:
        return self.levels[i]

    def __iter__(self):
        return iter(self.levels)

    def __len__(self) -> int:
        return len(self.levels)

    def dispose(self) -> None:
        """hierarchy_utils.py:320-338 (also used by __exit__/__del__ in
        the reference; explicit here — no finalizer magic on a JVM-backed
        session)."""
        for level in self.levels:
            level.dispose()
        self.levels = []
        self._parent_level_weights = []

    def clone(self) -> "HARTM":
        out = HARTM()
        out.levels = [level.clone() for level in self.levels]
        out._parent_level_weights = list(self._parent_level_weights)
        return out

    # -- whole-hierarchy verbs (hierarchy_utils.py:340-534) ----------------
    def fit_offline(
        self, docs: DataFrame, num_collection_passes: int = 1
    ) -> "HARTM":
        """Refit every level 0..last in order on the same corpus
        (hierarchy_utils.py:340-357 — the 'added a regularizer / loaded
        from disk' workflow). Non-root levels carry the parent wiring,
        so their fit unions the (freshly refit) parent's pseudo-batch
        automatically."""
        for i, level in enumerate(self.levels):
            if i > 0 and getattr(level, "_parent_model", None) is None:
                # loaded-from-disk levels: re-wire to the refit parent
                level.set_parent_model(
                    self.levels[i - 1], self._parent_level_weights[i]
                )
            level.fit_offline(docs, num_collection_passes)
        return self

    def get_theta_long(
        self, topic_names: list[str] | None = None
    ) -> DataFrame:
        """Level-wise stacked theta, long layout (doc_id, topic, value)
        with pseudo-docs excluded — the distributed variant of
        get_theta (our extension); topic names already carry the level
        prefix, so the stack stays unambiguous."""
        from functools import reduce

        if not self.levels:
            raise RuntimeError("hierarchy has no levels")
        thetas = [
            m.get_theta_long(topic_names=topic_names).filter(
                F.col("doc_id") >= 0
            )
            for m in self.levels
        ]
        return reduce(lambda a, b: a.unionByName(b), thetas)

    def get_theta(self, topic_names: list[str] | None = None):
        """Reference hARTM.get_theta (hierarchy_utils.py:437-464):
        pandas vertical concat of every level's theta over the shared
        document columns (pseudo-docs excluded)."""
        import pandas as pd

        if not self.levels:
            raise RuntimeError("hierarchy has no levels")
        frames = []
        for m in self.levels:
            t = m.get_theta(topic_names=topic_names)
            def _pseudo(c):
                if str(c).startswith("@parent_phi_"):
                    return True
                try:
                    return int(c) < 0
                except (TypeError, ValueError):
                    return False

            keep = [c for c in t.columns if not _pseudo(c)]
            frames.append(t[keep])
        return pd.concat(frames, axis=0)

    def transform(self, docs: DataFrame) -> DataFrame:
        """Stacked theta for NEW documents (hierarchy_utils.py:465-495)."""
        from functools import reduce

        if not self.levels:
            raise RuntimeError("hierarchy has no levels")
        return reduce(
            lambda a, b: a.unionByName(b),
            [m.transform(docs) for m in self.levels],
        )

    def get_phi_long(
        self,
        class_ids: list[str] | None = None,
        model_name: str | None = None,
    ) -> DataFrame:
        """Level-wise stacked phi, long COO layout with a level column —
        the distributed variant of get_phi (our extension)."""
        from functools import reduce

        outs = []
        for idx, m in enumerate(self.levels):
            long = m._named_matrix(model_name or "p_wt").to_long()
            if class_ids is not None:
                long = long.filter(F.col("class_id").isin(list(class_ids)))
            outs.append(long.withColumn("level", F.lit(idx)))
        return reduce(lambda a, b: a.unionByName(b), outs)

    def get_phi(
        self,
        class_ids: list[str] | None = None,
        model_name: str | None = None,
    ):
        """Reference hARTM.get_phi (hierarchy_utils.py:496-521): pandas
        horizontal concat of every level's phi, columns renamed
        level<X>_<topic>."""
        import pandas as pd

        frames = [
            m.get_phi(class_ids=class_ids, model_name=model_name)
            for m in self.levels
        ]
        phi = pd.concat(frames, axis=1)
        phi.columns = pd.Series(
            [
                f"level{idx}"
                for idx, m in enumerate(self.levels)
                for _ in range(len(m.topics))
            ]
        ).str.cat(phi.columns, sep="_")
        return phi

    def save(self, path: str) -> None:
        """Save all levels (hierarchy_utils.py:358-380): per level the
        pwt AND nwt matrices in the reference binary chunk format, plus
        an info.json (num topics + parent weights; JSON, not pickle —
        portable and code-free)."""
        import json
        import os

        os.makedirs(path, exist_ok=True)
        if os.listdir(path):
            raise ValueError("passed path should be empty")
        for i, level in enumerate(self.levels):
            level.save(os.path.join(path, f"level{i}_pwt.model"), "p_wt")
            level.save(os.path.join(path, f"level{i}_nwt.model"), "n_wt")
        info = {
            "num_level_topics": [m.num_topics for m in self.levels],
            "parent_level_weight": self._parent_level_weights[1:],
        }
        with open(os.path.join(path, "info.json"), "w") as f:
            json.dump(info, f)

    def load(self, path: str) -> "HARTM":
        """Rebuild the hierarchy from save() output
        (hierarchy_utils.py:381-436). Reference caveats apply: topic
        names come from the files, score trackers start empty,
        regularizers are NOT restored."""
        import json
        import os

        with open(os.path.join(path, "info.json")) as f:
            info = json.load(f)
        self.levels = []
        self._parent_level_weights = []
        for i, n in enumerate(info["num_level_topics"]):
            model = ARTM(num_topics=n, cache_theta=True)
            model.load(os.path.join(path, f"level{i}_pwt.model"), "p_wt")
            model.load(os.path.join(path, f"level{i}_nwt.model"), "n_wt")
            self.levels.append(model)
            self._parent_level_weights.append(
                1.0 if i == 0 else float(info["parent_level_weight"][i - 1])
            )
        return self

    def psi(self, level: int = -1) -> DataFrame:
        """p(child_topic | parent_topic): theta restricted to pseudo-docs.
        Columns: parent_topic, topic, value."""
        if len(self.levels) < 2:
            raise ValueError("psi needs at least two levels")
        model = self.levels[level]
        parent = self.levels[level - 1 if level > 0 else -2]
        theta = model.get_theta_long()
        mapping = [
            (-1_000_000 - i, t) for i, t in enumerate(parent.topics)
        ]
        map_df = theta.sparkSession.createDataFrame(
            mapping, "doc_id long, parent_topic string"
        )
        return theta.join(F.broadcast(map_df), "doc_id").select(
            "parent_topic", "topic", "value"
        )


# reference spelling (python/artm/__init__.py:5 exports `hARTM` from
# hierarchy_utils; the class at hierarchy_utils.py:18 is lowercase-h)
hARTM = HARTM
