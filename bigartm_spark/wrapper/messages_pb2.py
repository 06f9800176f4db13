"""Message classes of the reference's wrapper surface — plain Python
with protobuf repeated-field semantics (``batch.token.append(...)``,
``item = batch.item.add()``), no protobuf dependency.

Field names and defaults follow src/artm/messages.proto (Batch/Item
:26-74, DictionaryData :555-568, score and regularizer configs). Only
the fields the Python front door and the wrapper tests touch are
declared; unknown kwargs raise, like protobuf does.
"""

from __future__ import annotations


class RepeatedComposite(list):
    """``repeated Message`` field: ``add(**kw)`` constructs and appends."""

    def __init__(self, cls):
        super().__init__()
        self._cls = cls

    def add(self, **kwargs):
        el = self._cls(**kwargs)
        self.append(el)
        return el


class Message:
    # name -> default for optional scalars; None means proto2 "unset"
    _SCALARS: dict = {}
    _REPEATED: tuple = ()
    _COMPOSITES: dict = {}  # name -> element message class

    def __init__(self, **kwargs):
        for name, default in self._SCALARS.items():
            setattr(self, name, default)
        for name in self._REPEATED:
            setattr(self, name, [])
        for name, cls in self._COMPOSITES.items():
            setattr(self, name, RepeatedComposite(cls))
        for k, v in kwargs.items():
            if k in self._SCALARS:
                setattr(self, k, v)
            elif k in self._REPEATED:
                getattr(self, k).extend(v)
            elif k in self._COMPOSITES:
                for el in v:
                    getattr(self, k).append(el)
            else:
                raise ValueError(
                    f"{type(self).__name__} has no field {k!r}"
                )

    def __repr__(self):
        fields = list(self._SCALARS) + list(self._REPEATED) + list(
            self._COMPOSITES
        )
        inner = ", ".join(f"{f}={getattr(self, f)!r}" for f in fields)
        return f"{type(self).__name__}({inner})"


class Item(Message):
    """messages.proto:26-41."""

    _SCALARS = {"id": 0, "title": None}
    _REPEATED = (
        "token_id",
        "token_weight",
        "transaction_start_index",
        "transaction_typename_id",
    )


class Batch(Message):
    """messages.proto:65-74."""

    _SCALARS = {"id": None, "description": None}
    _REPEATED = ("token", "class_id", "transaction_typename")
    _COMPOSITES = {"item": Item}

    def SerializeToString(self) -> bytes:
        """Proto2 wire bytes of this batch — reference scripts write
        `.batch` files with `fout.write(batch.SerializeToString())`."""
        from bigartm_spark.sources.batch_pb import serialize_batch

        return serialize_batch(batch_to_dict(self))

    def ParseFromString(self, buf: bytes) -> "Batch":
        from bigartm_spark.sources.batch_pb import parse_batch

        d = parse_batch(buf)
        self.id = d.get("id")
        self.description = d.get("description")
        self.token[:] = d.get("token", [])
        self.class_id[:] = d.get("class_id", [])
        self.transaction_typename[:] = d.get("transaction_typename", [])
        del self.item[:]
        for it in d.get("item", []):
            el = self.item.add()
            el.id = it.get("id", 0)
            el.title = it.get("title")
            el.token_id[:] = it.get("token_id", [])
            el.token_weight[:] = it.get("token_weight", [])
            el.transaction_start_index[:] = it.get(
                "transaction_start_index", []
            )
            el.transaction_typename_id[:] = it.get(
                "transaction_typename_id", []
            )
        return self


def batch_to_dict(batch: Batch) -> dict:
    """Batch message -> the dict shape sources/batch_pb.py serializes."""
    return {
        "id": batch.id,
        "description": batch.description,
        "token": list(batch.token),
        "class_id": list(batch.class_id),
        "transaction_typename": list(batch.transaction_typename),
        "item": [
            {
                "id": it.id,
                "title": it.title,
                "token_id": list(it.token_id),
                "token_weight": list(it.token_weight),
                "transaction_start_index": list(it.transaction_start_index),
                "transaction_typename_id": list(it.transaction_typename_id),
            }
            for it in batch.item
        ],
    }


class DictionaryData(Message):
    """messages.proto:555-568 — COO dictionary + cooc payload."""

    _SCALARS = {"name": None, "num_items_in_collection": None}
    _REPEATED = (
        "token",
        "class_id",
        "token_value",
        "token_tf",
        "token_df",
        "cooc_first_index",
        "cooc_second_index",
        "cooc_value",
        "cooc_tf",
        "cooc_df",
    )


# ---------------------------------------------------------------- scores
class PerplexityScoreConfig(Message):
    """messages.proto PerplexityScoreConfig: model_type selects the
    zero-p(w|d) fallback (document unigram is the proto default)."""

    _SCALARS = {"model_type": 0, "dictionary_name": None}
    _REPEATED = ("class_id", "transaction_typename")


class SparsityThetaScoreConfig(Message):
    _SCALARS = {"eps": 1e-37}
    _REPEATED = ("topic_name",)


class SparsityPhiScoreConfig(Message):
    _SCALARS = {"eps": 1e-37, "class_id": None}
    _REPEATED = ("topic_name",)


class ItemsProcessedScoreConfig(Message):
    _SCALARS = {}


class TopTokensScoreConfig(Message):
    _SCALARS = {"num_tokens": 10, "class_id": None, "cooccurrence_dictionary_name": None}
    _REPEATED = ("topic_name",)


class ThetaSnippetScoreConfig(Message):
    _SCALARS = {"num_items": 10}


class TopicKernelScoreConfig(Message):
    _SCALARS = {
        "eps": 1e-37,
        "probability_mass_threshold": 0.1,
        "class_id": None,
        "cooccurrence_dictionary_name": None,
    }
    _REPEATED = ("topic_name",)


class TopicMassPhiScoreConfig(Message):
    _SCALARS = {"eps": 1e-37, "class_id": None}
    _REPEATED = ("topic_name",)


class ClassPrecisionScoreConfig(Message):
    _SCALARS = {}


class BackgroundTokensRatioScoreConfig(Message):
    _SCALARS = {"delta_threshold": 0.5, "save_tokens": True, "direct_kl": True, "class_id": None}


# ----------------------------------------------------------- regularizers
class FloatArray(Message):
    """messages.proto FloatArray: repeated float value."""

    _REPEATED = ("value",)


class NetPlsaPhiConfig(Message):
    """messages.proto NetPlsaPhiConfig (regularizer H13)."""

    _SCALARS = {"class_id": None, "symmetric_edge_weights": None}
    _REPEATED = (
        "topic_name",
        "vertex_name",
        "vertex_weight",
        "first_vertex_index",
        "second_vertex_index",
        "edge_weight",
    )


class SmoothSparseThetaConfig(Message):
    _SCALARS = {"transform_function": None}
    _REPEATED = ("topic_name", "alpha_iter", "item_title")
    _COMPOSITES = {"item_topic_multiplier": FloatArray}


class SmoothSparsePhiConfig(Message):
    _SCALARS = {"dictionary_name": None, "transform_function": None}
    _REPEATED = ("topic_name", "class_id")


class DecorrelatorPhiConfig(Message):
    _SCALARS = {}
    _REPEATED = ("topic_name", "class_id")


class LabelRegularizationPhiConfig(Message):
    _SCALARS = {"dictionary_name": None}
    _REPEATED = ("topic_name", "class_id")


class SpecifiedSparsePhiConfig(Message):
    _SCALARS = {"class_id": None, "max_elements_count": 20, "probability_threshold": 0.99, "mode": 0}
    _REPEATED = ("topic_name",)


class ImproveCoherencePhiConfig(Message):
    _SCALARS = {"dictionary_name": None}
    _REPEATED = ("topic_name", "class_id")


class SmoothPtdwConfig(Message):
    _SCALARS = {"window": 5, "threshold": 1.0}


class TopicSegmentationPtdwConfig(Message):
    """messages.proto:200-204."""

    _SCALARS = {"window": 10, "threshold": 0.5}
    _REPEATED = ("background_topic_names",)


class TopicSelectionThetaConfig(Message):
    _SCALARS = {}
    _REPEATED = ("topic_name", "topic_value", "alpha_iter")
