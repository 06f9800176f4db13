"""Ports of the reference's C++ MultipleClasses gtest suite
(src/artm_tests/multiple_classes_test.cc) — modality-filter edge
semantics on deterministic batches.

PORT(data): Helpers::GenerateBatch draws background counts with glibc
rand(); this port substitutes the deterministic (item_id + token_id) % 5
+ 1 rule (the same substitution the reference's own python wrapper test
test_01_synthetic_collection.py:55-62 uses), keeping every structural
assertion intact — the C++ assertions here are shape/relationship
checks, not value goldens.
"""

from __future__ import annotations

import tempfile
import uuid

import pytest


def _generate_batch(n_tokens, n_docs, class1, class2):
    """Helpers::GenerateBatch (test_mother.cc:18-44) with deterministic
    background counts; tokens alternate class1/class2 by parity."""
    import bigartm_spark.wrapper.messages_pb2 as messages

    batch = messages.Batch()
    batch.id = str(uuid.uuid4())
    for i in range(n_tokens):
        batch.token.append(f"token{i}")
        batch.class_id.append(class1 if i % 2 == 0 else class2)
    for d in range(n_docs):
        item = batch.item.add()
        item.id = d
        for t in range(n_tokens):
            background = (d + t) % 5 + 1 if t > 40 else 0
            topical = 10 if (t < 40 and (t % 10) == (d % 10)) else 0
            w = float(background + topical)
            if w > 0:
                item.token_id.append(t)
                item.token_weight.append(w)
    return batch


def _generate_dictionary(n_tokens, class1, class2):
    """Helpers::GenerateDictionary (test_mother.cc:46-59): skips tokens
    whose class would be empty."""
    import bigartm_spark.wrapper.messages_pb2 as messages

    d = messages.DictionaryData()
    for i in range(n_tokens):
        cls = class1 if i % 2 == 0 else class2
        if not cls:
            continue
        d.token.append(f"token{i}")
        d.class_id.append(cls)
    return d


def test_initialize_some_modalities(spark):
    """MultipleClasses.InitializeSomeModalities
    (multiple_classes_test.cc:255-287): master class_ids restrict the
    initialized tokens; a dictionary with no matching modality raises."""
    import bigartm_spark.model.master_component as mc_mod
    import bigartm_spark.wrapper.messages_pb2 as messages

    master = mc_mod.MasterComponent(
        topic_names=[f"Topic{i}" for i in range(10)],
        class_ids={"@default_class": 1.0, "__custom_class": 1.0},
    )
    d1 = messages.DictionaryData(name="d1")
    d1.class_id.append("@default_class"); d1.token.append("t1")
    d1.class_id.append("not present"); d1.token.append("t2")
    master.create_dictionary(d1)
    d2 = messages.DictionaryData(name="d2")
    d2.class_id.append("not present"); d2.token.append("t2")
    master.create_dictionary(d2)

    master.initialize_model(model_name="pwt", dictionary_name="d1")
    phi = master.get_phi_matrix("pwt")
    assert list(phi.index) == ["t1"]

    with pytest.raises(ValueError, match="no tokens"):
        master.initialize_model(model_name="m2", dictionary_name="d2")


def test_throw_if_no_tokens_in_effect(spark):
    """MultipleClasses.ThrowIfNoTokensInEffect
    (multiple_classes_test.cc:289-315): reconfiguring the master to a
    class absent from the corpus makes the fit raise, not produce an
    empty model."""
    import bigartm_spark.model.master_component as mc_mod
    import bigartm_spark.wrapper as wrapper

    batch = _generate_batch(60, 100, "@default_class", "__custom_class")
    folder = tempfile.mkdtemp()
    lib = wrapper.LibArtm()
    lib.ArtmSaveBatch(folder, batch)

    master = mc_mod.MasterComponent(
        lib,
        topic_names=[f"Topic{i}" for i in range(10)],
        class_ids={"@default_class": 0.5, "__custom_class": 2.0},
    )
    master.gather_dictionary(
        dictionary_target_name="dictionary", data_path=folder
    )
    master.initialize_model(model_name="pwt", dictionary_name="dictionary")

    # the Reconfigure analog: swap the master's class map
    master._class_ids = {"__unknown_class": 1.0}
    with pytest.raises(ValueError, match="no tokens in effect"):
        master.fit_offline(batches_folder=folder)


def test_without_default_class(spark):
    """MultipleClasses.WithoutDefaultClass
    (multiple_classes_test.cc:363-430): a corpus with only named
    modalities — per-modality model sizes, TopTokens class scoping
    (incl. the @default_class proto default matching nothing), score
    plumbing."""
    import bigartm_spark.model.master_component as mc_mod
    import bigartm_spark.wrapper as wrapper
    import bigartm_spark.wrapper.messages_pb2 as messages

    n_tokens, n_docs = 60, 100
    batch = _generate_batch(n_tokens, n_docs, "class_one", "class_two")
    folder = tempfile.mkdtemp()
    lib = wrapper.LibArtm()
    lib.ArtmSaveBatch(folder, batch)
    topics = [f"Topic{i}" for i in range(10)]

    scores = {
        "default_class": messages.TopTokensScoreConfig(num_tokens=4),
        "tts_class_one": messages.TopTokensScoreConfig(
            num_tokens=4, class_id="class_one"
        ),
        "tts_class_two": messages.TopTokensScoreConfig(
            num_tokens=4, class_id="class_two"
        ),
        "theta_snippet": messages.ThetaSnippetScoreConfig(num_items=5),
        "perplexity": messages.PerplexityScoreConfig(),
        "items_processed": messages.ItemsProcessedScoreConfig(),
    }

    # master 1: class_one only, initialized from the 30-token dictionary
    master = mc_mod.MasterComponent(
        lib, topic_names=topics, cache_theta=True,
        class_ids={"class_one": 2.0}, scores=scores,
    )
    master.create_dictionary(
        _generate_dictionary(n_tokens, "class_one", ""), "dictionary"
    )
    master.initialize_model(model_name="pwt", dictionary_name="dictionary")

    # master 2: both modalities, gathered dictionary
    master2 = mc_mod.MasterComponent(
        lib, topic_names=topics, cache_theta=True,
        class_ids={"class_one": 2.0, "class_two": 0.5}, scores=scores,
    )
    master2.gather_dictionary(
        dictionary_target_name="dictionary", data_path=folder
    )
    master2.initialize_model(model_name="pwt", dictionary_name="dictionary")

    for _ in range(5):
        master.fit_offline(batches_folder=folder)
        master2.fit_offline(batches_folder=folder)

    assert len(master.get_phi_matrix("pwt").index) == 30
    assert len(master2.get_phi_matrix("pwt").index) == 60

    # unset class_id = "@default_class" which matches nothing here
    assert master.get_score("default_class").num_entries == 0
    assert master.get_score("tts_class_one").num_entries > 0
    assert master.get_score("tts_class_two").num_entries == 0
    assert master2.get_score("default_class").num_entries == 0
    assert master2.get_score("tts_class_one").num_entries > 0
    assert master2.get_score("tts_class_two").num_entries > 0

    p1 = master.get_score("perplexity").value
    p2 = master2.get_score("perplexity").value
    assert p1 > 0 and p2 > 0 and p1 != p2

    assert len(master.get_score("theta_snippet").item_id) == 5
    assert master.get_score("items_processed").value == n_docs
