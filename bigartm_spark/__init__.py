"""bigartm_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of BigARTM (reference: bigartm/bigartm).

BigARTM is a regularized multimodal topic-modeling platform; every one of
its stages (corpus parse, dictionary gather/filter, matrix init, EM fit,
regularize, normalize, scores, retrieval) decomposes into relational
operators which this package expresses as Spark DataFrame plans.

Canonical long-format tables (see SURVEY.md §1.1):

- ``docs(doc_id, title, batch_id, class_id, token, weight, pos,
  transaction_id, transaction_typename)``
- ``dictionary(class_id, token, value, tf, df)``
- ``phi / nwt / rwt (class_id, token, topic, value)`` — COO layout
- ``theta(doc_id, topic, value)``

Design stance: DataFrame/SQL expressions everywhere, Catalyst plans the
physical strategy; a single Arrow-batched kernel (``model/estep.py``) for
the per-document inner EM loop, which is the only place row-at-a-time SQL
would be catastrophically slower.
"""

from bigartm_spark.session import get_spark


def version() -> str:
    """Reference front-door artm.version() (artm_model.py:1287-1289)."""
    return __version__


def __getattr__(name):
    # lazy top-level facades (keep `import bigartm_spark` dependency-free):
    # the reference's front-door names resolve to their modules on first use
    if name == "BatchVectorizer":
        from bigartm_spark.sources.batches_utils import BatchVectorizer

        return BatchVectorizer
    if name == "ARTM":
        from bigartm_spark.model.artm import ARTM

        return ARTM
    if name == "LDA":
        from bigartm_spark.model.artm import LDA

        return LDA
    if name == "dump_artm_model":
        from bigartm_spark.sources.dump import dump_artm_model

        return dump_artm_model
    if name == "load_artm_model":
        from bigartm_spark.sources.dump import load_artm_model

        return load_artm_model
    if name == "Dictionary":
        from bigartm_spark.dictionary import Dictionary

        return Dictionary
    if name in ("hARTM", "HARTM"):
        # reference exports the hierarchy facade as `hARTM`
        # (python/artm/__init__.py:5, class hierarchy_utils.py:18)
        from bigartm_spark.model.hierarchy import HARTM

        return HARTM
    if name == "MasterComponent":
        from bigartm_spark.model.master_component import MasterComponent

        return MasterComponent
    if name == "messages":
        # reference: `from .wrapper import messages_pb2 as messages`
        from bigartm_spark.wrapper import messages_pb2

        return messages_pb2
    if name == "wrapper":
        import bigartm_spark.wrapper as wrapper

        return wrapper
    if name in _API_NAMES:
        from bigartm_spark.model import api

        return getattr(api, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


# reference front-door config classes (python/artm/{scores,regularizers}.py)
_API_NAMES = frozenset(
    [
        "PerplexityScore",
        "SparsityPhiScore",
        "SparsityThetaScore",
        "ItemsProcessedScore",
        "TopTokensScore",
        "ThetaSnippetScore",
        "TopicKernelScore",
        "TopicMassPhiScore",
        "ClassPrecisionScore",
        "BackgroundTokensRatioScore",
        "SmoothSparsePhiRegularizer",
        "SmoothSparseThetaRegularizer",
        "DecorrelatorPhiRegularizer",
        "LabelRegularizationPhiRegularizer",
        "SpecifiedSparsePhiRegularizer",
        "ImproveCoherencePhiRegularizer",
        "SmoothPtdwRegularizer",
        "TopicSelectionThetaRegularizer",
        "BitermsPhiRegularizer",
        "HierarchySparsingThetaRegularizer",
        "TopicSegmentationPtdwRegularizer",
        "SmoothTimeInTopicsPhiRegularizer",
        "NetPlsaPhiRegularizer",
        "MultiLanguagePhiRegularizer",
        "KlFunctionInfo",
    ]
)


__all__ = [
    "get_spark",
    "version",
    "ARTM",
    "Dictionary",
    "LDA",
    "BatchVectorizer",
    "dump_artm_model",
    "load_artm_model",
]
__version__ = "0.1.0"
