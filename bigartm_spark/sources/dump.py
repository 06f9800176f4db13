"""dump_artm_model / load_artm_model — whole-model folder persistence.

Reference: python/artm/artm_model.py:1154-1291 dumps score tracker
(score_tracker.bin), pwt/nwt matrices (p_wt.bin / n_wt.bin), optional
theta (p_td.bin), and a parameters.json with every constructor knob and
per-regularizer (config, tau, gamma) triples; load_artm_model rebuilds a
fit-ready ARTM from the folder.

Same folder shape here, and the matrix/tracker files use the reference's
own binary wire formats (sources/model_pb.py / tracker_pb.py), so the
p_wt.bin a reference user dumps is the p_wt.bin we write. Differences,
documented rather than papered over:
- parameters are JSON only (the reference also pickles protobuf configs
  into parameters.bin; we have no protobuf configs — regularizer state
  IS the JSON spec).
- theta is a parquet directory (p_td.parquet): theta is doc-indexed and
  can be corpus-sized, so it stays a distributed relation instead of a
  driver-collected binary file.
- relation-backed regularizer args (cooc tables, NetPLSA edge lists,
  token orderings) are dumped as parquet under relations/ and rejoined
  on load — the reference references these by dictionary *name* and
  requires the caller to re-import them; we persist the data itself.
"""

from __future__ import annotations

import datetime
import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession

PWT_FILENAME = "p_wt.bin"
NWT_FILENAME = "n_wt.bin"
PTD_DIRNAME = "p_td.parquet"
SCORE_TRACKER_FILENAME = "score_tracker.bin"
PARAMETERS_FILENAME = "parameters.json"
RELATIONS_DIRNAME = "relations"

FORMAT_VERSION = 1


def _transform_spec(tf) -> dict:
    return {"__transform__": True, "kind": tf.kind, "a": tf.a, "n": tf.n}


def _jsonable(v):
    """JSON-encode a regularizer/agent parameter; None for a DataFrame
    (handled separately as a dumped relation)."""
    from bigartm_spark.model.regularizers import TransformFunction

    if isinstance(v, TransformFunction):
        return _transform_spec(v)
    if isinstance(v, np.ndarray):
        return {"__ndarray__": True, "data": v.tolist()}
    if isinstance(v, (list, tuple)):
        return list(v)
    return v


def _component_spec(obj, relations_dir: str, prefix: str) -> dict:
    """Serialize a regularizer / theta agent: class name + JSON params;
    DataFrame-valued attributes are written to ``relations_dir`` as
    parquet and referenced by file name."""
    params, rels = {}, {}
    for k, v in vars(obj).items():
        if k.startswith("_"):
            continue
        if isinstance(v, DataFrame):
            rel_name = f"{prefix}.{k}.parquet"
            v.write.mode("overwrite").parquet(
                os.path.join(relations_dir, rel_name)
            )
            rels[k] = rel_name
        else:
            params[k] = _jsonable(v)
    return {"class": type(obj).__name__, "params": params, "relations": rels}


def _decode_param(v):
    from bigartm_spark.model.regularizers import TransformFunction

    if isinstance(v, dict) and v.get("__transform__"):
        return TransformFunction(v["kind"], v["a"], v["n"])
    if isinstance(v, dict) and v.get("__ndarray__"):
        return np.asarray(v["data"])
    return v


def _build_component(spark: SparkSession, spec: dict, relations_dir: str):
    from bigartm_spark.model import regularizers as R

    cls = getattr(R, spec["class"], None)
    if cls is None:
        raise ValueError(f"unknown regularizer class {spec['class']!r}")
    kwargs = {k: _decode_param(v) for k, v in spec["params"].items()}
    for k, rel_name in spec.get("relations", {}).items():
        kwargs[k] = spark.read.parquet(os.path.join(relations_dir, rel_name))
    # some attrs live only on the base class (e.g. gamma is set by
    # PhiRegularizer.__init__ but not every subclass ctor re-exposes it):
    # pass what the ctor takes, setattr the rest
    import inspect

    sig = inspect.signature(cls.__init__)
    accepted = set(sig.parameters) - {"self"}
    ctor = {k: v for k, v in kwargs.items() if k in accepted}
    obj = cls(**ctor)
    for k, v in kwargs.items():
        if k not in accepted:
            setattr(obj, k, v)
    return obj


def dump_artm_model(model, data_path: str) -> None:
    """Dump the full model state into ``data_path`` (must not exist —
    artm_model.py:1160-1163 raises on a pre-existing folder)."""
    from bigartm_spark.sources.io import export_model, export_score_tracker

    if os.path.exists(data_path):
        raise IOError(f"Folder {data_path} already exists")
    if getattr(model, "_parent_model", None) is not None:
        import warnings

        warnings.warn(
            "hierarchy parent link is not dumped (the reference's dump "
            "doesn't serialize it either); call set_parent_model again "
            "after load_artm_model",
            stacklevel=2,
        )
    if model.phi_transforms:
        # closures (specified_sparse_phi_transform) carry no declarative
        # spec; failing loudly beats silently dropping them from the dump
        raise ValueError(
            "phi_transforms are arbitrary callables and cannot be dumped; "
            "re-attach them after load_artm_model"
        )
    # validate BEFORE creating anything on disk: a failed dump must not
    # leave a partial folder that makes every retry hit the
    # already-exists guard above
    if model.pwt is None:
        raise RuntimeError("model has no p_wt matrix (not initialized)")
    os.makedirs(data_path)
    relations_dir = os.path.join(data_path, RELATIONS_DIRNAME)

    export_score_tracker(
        model.score_tracker, os.path.join(data_path, SCORE_TRACKER_FILENAME)
    )
    export_model(model.pwt, os.path.join(data_path, PWT_FILENAME))
    # lossless float64 sidecar next to the reference's float32 binary
    # chunks: our engine is float64 end-to-end, so a load must restore
    # the exact matrix (the reference gets bit-equality for free being
    # float32 both sides; the truncated .bin alone would shift a
    # continued fit by ~1e-9)
    model.pwt.compact.write.mode("overwrite").parquet(
        os.path.join(data_path, PWT_FILENAME + ".parquet")
    )
    if model.nwt is not None:
        export_model(model.nwt, os.path.join(data_path, NWT_FILENAME))
        model.nwt.compact.write.mode("overwrite").parquet(
            os.path.join(data_path, NWT_FILENAME + ".parquet")
        )
    if model.theta is not None:
        model.theta.write.mode("overwrite").parquet(
            os.path.join(data_path, PTD_DIRNAME)
        )
    if model.dictionary is not None:
        # extension over the reference (which makes the user re-gather):
        # ctx.dictionary feeds use_dictionary regularizers and the
        # perplexity unigram fallback, so a loaded model keeps fitting
        # without a separate gather_dictionary call
        model.dictionary.write.mode("overwrite").parquet(
            os.path.join(data_path, "dictionary.parquet")
        )

    params = {
        "format_version": FORMAT_VERSION,
        "creation_time": str(datetime.datetime.now()),
        "topic_names": model.topics,
        "num_document_passes": model.num_document_passes,
        "seed": model.seed,
        "class_weights": model.class_weights,
        "cache_theta": model.cache_theta,
        "reuse_theta": model.reuse_theta,
        "theta_cache_path": model.theta_cache_path,
        "num_buckets": model.num_buckets,
        "has_nwt": model.nwt is not None,
        "has_theta": model.theta is not None,
        "has_dictionary": model.dictionary is not None,
        "phi_regularizers": [
            _component_spec(r, relations_dir, f"reg{i}")
            for i, r in enumerate(model.phi_regularizers)
        ],
        "theta_agents": [
            _component_spec(a, relations_dir, f"agent{i}")
            for i, a in enumerate(model.theta_agents)
        ],
    }
    with open(os.path.join(data_path, PARAMETERS_FILENAME), "w") as f:
        json.dump(params, f)


def load_artm_model(spark=None, data_path: str | None = None):
    """Rebuild a fit-ready ARTM from a dump_artm_model folder.

    Reference signature is ``load_artm_model(data_path)``
    (artm_model.py:1294-1317) — a single string argument is taken as
    the path and the session comes from get_spark(); the original
    (spark, data_path) spelling keeps working."""
    from bigartm_spark.model import estep
    from bigartm_spark.model.artm import ARTM
    from bigartm_spark.sources.io import import_model, import_score_tracker

    if isinstance(spark, str) and data_path is None:
        spark, data_path = None, spark
    if spark is None:
        from bigartm_spark.session import get_spark

        spark = get_spark()
    if data_path is None:
        raise TypeError("load_artm_model needs a data_path")

    with open(os.path.join(data_path, PARAMETERS_FILENAME)) as f:
        params = json.load(f)
    if params.get("format_version", 0) > FORMAT_VERSION:
        raise RuntimeError(
            f"dump written by a newer engine (format "
            f"{params['format_version']} > {FORMAT_VERSION})"
        )
    relations_dir = os.path.join(data_path, RELATIONS_DIRNAME)

    model = ARTM(
        topic_names=params["topic_names"],
        num_document_passes=params["num_document_passes"],
        seed=params["seed"],
        class_weights=params["class_weights"],
        phi_regularizers=[
            _build_component(spark, s, relations_dir)
            for s in params["phi_regularizers"]
        ],
        theta_agents=[
            _build_component(spark, s, relations_dir)
            for s in params["theta_agents"]
        ],
        cache_theta=params["cache_theta"],
        reuse_theta=params["reuse_theta"],
        theta_cache_path=params["theta_cache_path"],
        num_buckets=params["num_buckets"],
    )
    model.score_tracker = import_score_tracker(
        os.path.join(data_path, SCORE_TRACKER_FILENAME)
    )
    def _matrix(filename):
        # prefer the lossless float64 parquet sidecar; the reference
        # binary chunks remain the compat fallback (pre-sidecar dumps)
        sidecar = os.path.join(data_path, filename + ".parquet")
        if os.path.exists(sidecar):
            from bigartm_spark.model.phi import PhiMatrix

            return PhiMatrix(
                filename.split(".")[0],
                list(params["topic_names"]),
                spark.read.parquet(sidecar),
            )
        return import_model(spark, os.path.join(data_path, filename))

    model.pwt = _matrix(PWT_FILENAME).cache()
    if params["has_nwt"]:
        model.nwt = _matrix(NWT_FILENAME)
    if params["has_theta"]:
        model.theta = spark.read.parquet(os.path.join(data_path, PTD_DIRNAME))
    if params.get("has_dictionary"):
        model.dictionary = spark.read.parquet(
            os.path.join(data_path, "dictionary.parquet")
        ).cache()
    # re-derive the C1 join strategy exactly as initialize() does
    model._broadcast_phi = estep.should_broadcast_phi(
        model.pwt.compact.count(), len(model.topics)
    )
    return model
