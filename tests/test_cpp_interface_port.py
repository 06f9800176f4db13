"""Ports of the reference's C++ CppInterface gtest suite
(src/artm_tests/cpp_interface_test.cc) — the deterministic dictionary /
topic-reshape / merge semantics:

- CppInterface.Dictionaries (:728-789): gather over 5 generated batches
  -> 50 tokens with positive df/tf/value; max_df=4 filter -> exactly 32;
  binary .dict export/import round trip keeps the 32.
- CppInterface.ReconfigureTopics (:862-910): topic rename/reorder keeps
  columns by NAME, new topics get zeros; MergeModel with topic_name
  aligns by name; InitializeModel without a dictionary re-seeds an
  existing model over its own token set.
- CppInterface.MergeModelWithDictionary (:912-948): dictionary-scoped
  merge — union by (class_id, token), sum overlaps, zero-fill
  dictionary tokens absent from every source, drop tokens outside the
  dictionary.

TestMother::GenerateBatches is deterministic (test_mother.cc:105-141),
so the pinned counts (50 gathered, 32 after max_df=4) carry over
exactly.
"""

from __future__ import annotations

import tempfile

import pytest


@pytest.fixture()
def generated_batches_folder():
    import bigartm_spark.wrapper as wrapper
    import bigartm_spark.wrapper.messages_pb2 as messages

    folder = tempfile.mkdtemp()
    lib = wrapper.LibArtm()
    for b in range(5):
        batch = messages.Batch()
        batch.id = f"b{b}"
        for i in range(50):
            batch.token.append(f"token{i}")
        item = batch.item.add()
        item.id = b
        for t in range(50):
            if t == 0 or (t + b + (t + 1) * (b + 1)) % 3 == 0:
                item.token_id.append(t)
                item.token_weight.append(1.0)
        lib.ArtmSaveBatch(folder, batch)
    return lib, folder


def test_dictionaries_port(spark, generated_batches_folder):
    """CppInterface.Dictionaries: gather -> filter(max_df=4) -> export ->
    import, with the reference's exact token counts (50 -> 32 -> 32)."""
    import bigartm_spark.model.master_component as mc_mod

    lib, folder = generated_batches_folder
    master = mc_mod.MasterComponent(lib)
    master.gather_dictionary(
        dictionary_target_name="gathered_dictionary", data_path=folder
    )
    d = master.get_dictionary("gathered_dictionary")
    assert len(d.token) == 50
    assert d.token_df[0] > 0 and d.token_tf[0] > 0 and d.token_value[0] > 0

    master.filter_dictionary(
        dictionary_name="gathered_dictionary",
        dictionary_target_name="filtered_dictionary",
        max_df=4,
    )
    d2 = master.get_dictionary("filtered_dictionary")
    assert len(d2.token) == 32
    assert d2.token_df[0] > 0 and d2.token_tf[0] > 0 and d2.token_value[0] > 0

    fn = tempfile.mktemp(suffix=".dict")
    master.export_dictionary(fn, "filtered_dictionary")
    master.import_dictionary(fn, "imported_dictionary")
    d3 = master.get_dictionary("imported_dictionary")
    assert len(d3.token) == 32
    assert d3.token_df[0] > 0 and d3.token_tf[0] > 0 and d3.token_value[0] > 0


def test_reconfigure_topics_port(spark):
    """CppInterface.ReconfigureTopics: columns follow topic NAMES through
    rename/reorder/merge; re-init over an existing model's tokens."""
    import bigartm_spark.model.master_component as mc_mod
    import bigartm_spark.wrapper.messages_pb2 as messages

    mm = mc_mod.MasterComponent(topic_names=["t1", "t2", "t3"])
    dd = messages.DictionaryData(name="d")
    dd.token.append("token")
    mm.create_dictionary(dd)
    mm.initialize_model(model_name="pwt", dictionary_name="d")
    m1 = mm.get_phi_matrix("pwt")
    assert m1.columns.tolist() == ["t1", "t2", "t3"]

    mm.reconfigure_topic_name(["t3", "t1", "t4"])
    m2 = mm.get_phi_matrix("pwt")
    assert m2.columns.tolist() == ["t3", "t1", "t4"]
    assert m2.iloc[0]["t3"] == m1.iloc[0]["t3"]
    assert m2.iloc[0]["t1"] == m1.iloc[0]["t1"]
    assert m2.iloc[0]["t4"] == 0

    # MergeModel with topic_name ['t4'] — name-aligned projection
    mm.merge_model({"pwt": 1.0}, "tmp", topic_names=["t4"])
    # InitializeModel without a dictionary: re-seed 'tmp' over its own
    # token set, keeping its topics
    mm.initialize_model(model_name="tmp")
    m3 = mm.get_phi_matrix("tmp")
    assert m3.columns.tolist() == ["t4"]
    assert m3.iloc[0, 0] != 0

    mm.merge_model({"pwt": 1.0, "tmp": 1.0}, "pwt")
    m4 = mm.get_phi_matrix("pwt")
    assert m4.columns.tolist() == ["t3", "t1", "t4"]
    assert m4.iloc[0]["t3"] == m2.iloc[0]["t3"]
    assert m4.iloc[0]["t1"] == m2.iloc[0]["t1"]
    assert m4.iloc[0]["t4"] == m3.iloc[0, 0]


def test_merge_model_with_dictionary_port(spark):
    """CppInterface.MergeModelWithDictionary: the dictionary defines the
    merged token set — overlaps sum, absent tokens zero-fill, tokens
    outside the dictionary drop."""
    import bigartm_spark.model.master_component as mc_mod
    import bigartm_spark.wrapper.messages_pb2 as messages

    mm = mc_mod.MasterComponent(topic_names=["t1"])
    for nm, toks in (
        ("d1", ["t1", "t2"]),
        ("d2", ["t3", "t1"]),
        ("d3", ["t1", "t4", "t2"]),
    ):
        dd = messages.DictionaryData(name=nm)
        dd.token.extend(toks)
        mm.create_dictionary(dd)
    mm.initialize_model(model_name="m1", dictionary_name="d1")
    mm.initialize_model(model_name="m2", dictionary_name="d2")
    p1 = mm.get_phi_matrix("m1")
    p2 = mm.get_phi_matrix("m2")

    mm.merge_model({"m1": 1.0, "m2": 1.0}, "m", dictionary_name="d3")
    pm = mm.get_phi_matrix("m")

    assert sorted(pm.index.tolist()) == ["t1", "t2", "t4"]
    assert abs(
        pm.loc["t1"].iloc[0] - (p1.loc["t1"].iloc[0] + p2.loc["t1"].iloc[0])
    ) < 1e-9
    assert pm.loc["t4"].iloc[0] == 0.0
    assert pm.loc["t2"].iloc[0] == p1.loc["t2"].iloc[0]
