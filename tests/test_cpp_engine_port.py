"""Ports of the reference's C++ engine gtest suite — the pinned-value
tests that run on fully deterministic generated data (no rand()):

- RepeatableResult.TokenHasher / .RandomGenerator
  (src/artm_tests/repeatable_result_test.cc:66-88) — exact float goldens
  of the seeded init RNG.
- Regularizers.TopicSelection (regularizers_test.cc:16-58) — pinned
  10-topic theta after 3 fits with configured topic_value.
- Regularizers.SmoothSparseTheta (regularizers_test.cc:61-195) — pinned
  3x4 theta under item_title scoping (part 1) and item_topic_multiplier
  masks (part 2).
- Regularizers.NetPlsa (regularizers_test.cc:197-310) — pinned theta
  column under two NetPlsa regularizers on the @time_class vertices.
- Regularizers.RelativeRegularization (regularizers_test.cc:311-380) —
  the full 20-pass SparsityPhi trajectory under gamma=0.5 relative
  SmoothSparsePhi, every value pinned at 1e-3.

Batches are built exactly as the C++ tests build them (TestMother /
inline batch construction, test_mother.cc:105-141); the phi init is the
bit-exact reference-RNG replica, so the goldens carry over at the
reference's own tolerances. These ports exposed and now pin two engine
fixes: zero-occurrence batch-vocab tokens get zero-stat dictionary
entries (dictionary_operations.cc:316-325), and item_title /
item_topic_multiplier scoping works through the low-level
MasterComponent path.
"""

from __future__ import annotations

import tempfile
import uuid

import numpy as np
import pytest


def _save_batch(batch):
    import bigartm_spark.wrapper as wrapper

    folder = tempfile.mkdtemp()
    lib = wrapper.LibArtm()
    lib.ArtmSaveBatch(folder, batch)
    return lib, folder


def _master(lib, topics, folder, scores=None):
    import bigartm_spark.model.master_component as mc_mod

    master = mc_mod.MasterComponent(lib, cache_theta=True, scores=scores)
    master.gather_dictionary(
        dictionary_target_name="dictionary", data_path=folder
    )
    master.initialize_model(
        model_name="pwt", topic_names=topics, dictionary_name="dictionary"
    )
    return master


def test_token_hasher_port():
    """RepeatableResult.TokenHasher: six exact goldens of
    GenerateRandomVector(3, Token(class_id, keyword))[0]."""
    from bigartm_spark.model.init import (
        reference_random_vector,
        reference_token_hash,
    )

    cases = [
        ("class_id_1", "", 0.245338),
        ("1_class_id", "", 0.319662),
        ("", "token_1", 0.341962),
        ("", "1_token", 0.315842),
        ("class_id_1", "token_1", 0.318573),
        ("class_id_2", "token_2", 0.410061),
    ]
    for class_id, keyword, want in cases:
        got = reference_random_vector(
            3, reference_token_hash(class_id, keyword)
        )[0]
        assert abs(float(got) - want) < 1e-4, (class_id, keyword, got)


def test_random_generator_port():
    """RepeatableResult.RandomGenerator: same seed -> identical vector;
    consecutive elements differ."""
    from bigartm_spark.model.init import reference_random_vector

    num, seed = 10, 5
    first = reference_random_vector(num, seed)
    second = reference_random_vector(num, seed)
    assert len(first) == num and len(second) == num
    for i in range(1, num):
        assert first[i] == second[i]
        assert first[i - 1] != first[i]


def _generate_batches_batch(n_tokens):
    """TestMother::GenerateBatches(1, nTokens) replica
    (test_mother.cc:105-141): 1 batch, one item, token kept iff
    iToken == 0 or (iToken + (iToken+1)) % 3 == 0, weight 1."""
    import bigartm_spark.wrapper.messages_pb2 as messages

    batch = messages.Batch()
    batch.id = str(uuid.uuid4())
    for i in range(n_tokens):
        batch.token.append(f"token{i}")
    item = batch.item.add()
    item.id = 0
    for t in range(n_tokens):
        if t == 0 or (t + (t + 1)) % 3 == 0:
            item.token_id.append(t)
            item.token_weight.append(1.0)
    return batch


def test_topic_selection_port(spark):
    """Regularizers.TopicSelection: pinned theta (ASSERT_NEAR 1e-5)."""
    import bigartm_spark.wrapper.messages_pb2 as messages

    lib, folder = _save_batch(_generate_batches_batch(5))
    topics = [f"Topic{i}" for i in range(10)]
    master = _master(lib, topics, folder)

    cfg = messages.TopicSelectionThetaConfig()
    for i in range(10):
        cfg.topic_value.append(i / 10.0)
    master.create_regularizer("TopicSelectionRegularizer", cfg, tau=0.5)

    for _ in range(3):
        master.fit_offline(batches_folder=folder)

    got = master.get_theta_matrix().loc[0].tolist()
    expected = [
        0.41836, 0.262486, 0.160616, 0.0845677, 0.032849,
        0.022987, 0.0103793, 0.0040327, 0.00267936, 0.00104289,
    ]
    for g, w in zip(got, expected):
        assert abs(g - w) < 1e-5, (got, expected)


def _sst_batch():
    """regularizers_test.cc:66-88: 5 tokens x 3 titled items, weight 1."""
    import bigartm_spark.wrapper.messages_pb2 as messages

    batch = messages.Batch()
    batch.id = str(uuid.uuid4())
    for i in range(5):
        batch.token.append(f"token{i}")
    for d in range(3):
        item = batch.item.add()
        item.id = d
        item.title = f"item_{d}"
        for t in range(5):
            item.token_id.append(t)
            item.token_weight.append(1.0)
    return batch


def test_smooth_sparse_theta_port(spark):
    """Regularizers.SmoothSparseTheta parts 1+2: pinned 3x4 thetas."""
    import bigartm_spark.wrapper.messages_pb2 as messages

    lib, folder = _save_batch(_sst_batch())
    topics = [f"Topic{i}" for i in range(4)]

    # part 1: item_title scope, tau=-100 suppresses items 0 and 2
    master = _master(lib, topics, folder)
    cfg = messages.SmoothSparseThetaConfig()
    cfg.item_title.extend(["item_0", "item_2"])
    master.create_regularizer("SSTRegularizer_1", cfg, tau=-100.0)
    master.fit_offline(batches_folder=folder)
    theta = master.get_theta_matrix()
    expected = [
        [0.0, 0.0, 0.0, 0.0],
        [0.265, 0.224, 0.247, 0.264],
        [0.0, 0.0, 0.0, 0.0],
    ]
    for d in range(3):
        for j in range(4):
            assert abs(theta.iloc[d, j] - expected[d][j]) < 1e-3, theta

    # part 2: item_topic_multiplier masks, tau=+100
    master2 = _master(lib, topics, folder)
    cfg2 = messages.SmoothSparseThetaConfig()
    cfg2.item_title.append("item_0")
    fa = cfg2.item_topic_multiplier.add()
    fa.value.extend([1.0, 0.0, 1.0, 0.0])
    cfg2.item_title.append("item_2")
    fa2 = cfg2.item_topic_multiplier.add()
    fa2.value.extend([-1.0, -1.0, -1.0, -1.0])
    master2.create_regularizer("SSTRegularizer_1", cfg2, tau=100.0)
    master2.fit_offline(batches_folder=folder)
    theta2 = master2.get_theta_matrix()
    expected2 = [
        [0.5, 0.0, 0.5, 0.0],
        [0.265, 0.224, 0.247, 0.264],
        [0.0, 0.0, 0.0, 0.0],
    ]
    for d in range(3):
        for j in range(4):
            assert abs(theta2.iloc[d, j] - expected2[d][j]) < 1e-3, theta2


def test_netplsa_port(spark):
    """Regularizers.NetPlsa: theta column Topic2 pinned to
    [0, 0, 0, 0, 0.999] after 2 fits under two NetPlsa regularizers."""
    import bigartm_spark.wrapper.messages_pb2 as messages

    batch = messages.Batch()
    batch.id = "11972762-6a23-4524-b089-7122816aff72"
    for i in range(10):
        batch.token.append(f"token{i}")
        batch.class_id.append("@default_class")
    batch.token.append("time_1")
    batch.class_id.append("@time_class")
    batch.token.append("time_2")
    batch.class_id.append("@time_class")
    for d in range(5):
        item = batch.item.add()
        item.id = d
        # nTokens=10 keeps the background branch (iToken > 40) dead, so
        # the C++ batch is deterministic despite its rand() call
        for t in range(10):
            item.token_id.append(t)
            item.token_weight.append(10.0 if (t % 10) == (d % 10) else 0.0)
        if d < 2:
            item.token_id.append(10)
            item.token_weight.append(1.0)
        elif d == 2:
            item.token_id.append(11)
            item.token_weight.append(1.0)

    lib, folder = _save_batch(batch)
    topics = [f"Topic{i}" for i in range(8)]
    master = _master(lib, topics, folder)

    c1 = messages.NetPlsaPhiConfig(
        class_id="@time_class",
        vertex_name=["time_1", "time_2"],
        vertex_weight=[2.0, 1.0],
        first_vertex_index=[0],
        second_vertex_index=[1],
        edge_weight=[3.0],
        symmetric_edge_weights=True,
    )
    master.create_regularizer("NetPlsaRegularizer_1", c1, tau=2.0)
    c2 = messages.NetPlsaPhiConfig(
        class_id="@time_class",
        vertex_name=["time_1", "time_2"],
        first_vertex_index=[0, 1],
        second_vertex_index=[1, 0],
        edge_weight=[-3.0, 8.0],
        symmetric_edge_weights=False,
    )
    master.create_regularizer("NetPlsaRegularizer_2", c2, tau=-2.0)

    for _ in range(2):
        master.fit_offline(batches_folder=folder)

    got = master.get_theta_matrix()["Topic2"].tolist()
    expected = [0.0, 0.0, 0.0, 0.0, 0.999]
    for g, w in zip(got, expected):
        assert abs(g - w) < 1e-3, got


def test_relative_regularization_port(spark):
    """Regularizers.RelativeRegularization: the 20-pass SparsityPhi
    trajectory under gamma=0.5 relative SmoothSparsePhi, every value
    pinned at 1e-3 (regularizers_test.cc:311-380)."""
    import bigartm_spark.wrapper.messages_pb2 as messages

    batch = messages.Batch()
    batch.id = str(uuid.uuid4())
    for i in range(50):
        batch.token.append(f"token{i}")
    for d in range(100):
        item = batch.item.add()
        item.id = d
        item.title = f"item_{d}"
        for t in range(50):
            item.token_id.append(t)
            item.token_weight.append(1.0)

    lib, folder = _save_batch(batch)
    topics = [f"Topic{i}" for i in range(50)]
    master = _master(
        lib, topics, folder,
        scores={"SparsityPhi": messages.SparsityPhiScoreConfig()},
    )
    master.create_regularizer(
        "SparsePhi", messages.SmoothSparsePhiConfig(), tau=-0.5, gamma=0.5
    )

    true_score = [
        0.244, 0.380, 0.478, 0.544, 0.588, 0.627, 0.665, 0.694, 0.716,
        0.734, 0.750, 0.768, 0.781, 0.790, 0.804, 0.814, 0.824, 0.830,
        0.836, 0.839,
    ]
    for want in true_score:
        master.fit_offline(batches_folder=folder)
        got = master.get_score("SparsityPhi").value
        assert abs(got - want) < 1e-3, (got, want)


def test_offline_repeatable_port(spark):
    """RepeatableResult.Offline: two identical runs produce identical
    phi and theta (runOfflineTest, repeatable_result_test.cc:22-64)."""
    import bigartm_spark.wrapper.messages_pb2 as messages

    def run():
        # TestMother::GenerateBatches(2, 10): 2 batches, shared 10-token
        # vocab, one item per batch with the somewhat_random keep rule
        lib = None
        folder = tempfile.mkdtemp()
        import bigartm_spark.wrapper as wrapper

        lib = wrapper.LibArtm()
        for b in range(2):
            batch = messages.Batch()
            batch.id = f"batch_{b}"
            for i in range(10):
                batch.token.append(f"token{i}")
            item = batch.item.add()
            item.id = b
            for t in range(10):
                somewhat_random = t + b + (t + 1) * (b + 1)
                if t == 0 or somewhat_random % 3 == 0:
                    item.token_id.append(t)
                    item.token_weight.append(1.0)
            lib.ArtmSaveBatch(folder, batch)
        topics = [f"Topic{i}" for i in range(5)]
        master = _master(lib, topics, folder)
        for _ in range(3):
            master.fit_offline(batches_folder=folder)
        phi = master.get_phi_matrix("pwt").sort_index()
        theta = master.get_theta_matrix().sort_index()
        return phi.to_string(), theta.to_string()

    first = run()
    second = run()
    assert first == second


def test_topic_segmentation_ptdw_port(spark):
    """Regularizer.TopicSegmentationPtdw (topic_seg_test.cc:16-113):
    deterministic 9-position document, 4 fits with num_document_passes=0
    (theta stays uniform — an explicit 0 is honored, not coerced to the
    default), then the registered segmentation agent one-hots the
    transform's ptdw: positions 0-6 -> Topic0, positions 7-8 -> Topic4."""
    import bigartm_spark.wrapper.messages_pb2 as messages
    import bigartm_spark.model.master_component as mc_mod
    import bigartm_spark.wrapper as wrapper

    batch = messages.Batch()
    batch.id = str(uuid.uuid4())
    for t in ["aaaa0", "bbbb1", "cccc2", "dddd3", "eeee4", "ffff5"]:
        batch.token.append(t)
    item = batch.item.add()
    item.id = 0
    item.title = "doc0"
    for e in [0, 1, 2, 0, 3, 2, 1, 4, 5]:
        item.token_id.append(e)
        item.token_weight.append(1.0)

    folder = tempfile.mkdtemp()
    lib = wrapper.LibArtm()
    lib.ArtmSaveBatch(folder, batch)
    topics = [f"Topic{i}" for i in range(5)]

    master = mc_mod.MasterComponent(
        lib, cache_theta=True, num_document_passes=0
    )
    master.gather_dictionary(
        dictionary_target_name="dictionary", data_path=folder
    )
    master.initialize_model(
        model_name="pwt", topic_names=topics, dictionary_name="dictionary"
    )
    for _ in range(4):
        master.fit_offline(batches_folder=folder)

    cfg = messages.TopicSegmentationPtdwConfig(window=3, threshold=0.2)
    cfg.background_topic_names.extend(["Topic0", "Topic1"])
    master.create_regularizer(
        "TopicSegmentationPtdwRegularizer", cfg, tau=0.0
    )
    ptdw = master.transform(
        batches_folder=folder, theta_matrix_type="dense_ptdw"
    )
    rows = ptdw.reset_index().sort_values("pos")
    for i in range(9):
        row = rows.iloc[i]
        want_topic = "Topic0" if i < 7 else "Topic4"
        for t in topics:
            assert row[t] == (1.0 if t == want_topic else 0.0), (i, row)
