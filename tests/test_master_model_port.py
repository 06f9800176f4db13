"""Port of the reference's C++ MasterModel.Basic gtest
(src/artm_tests/master_model_test.cc:17-151) — the flagship engine
golden: the full regularized EM loop (SmoothSparseTheta tau=-0.2 +
SmoothSparsePhi tau=-0.1 over 20 deterministic TestMother batches)
reproduces the reference's pinned perplexity trajectories at its own
ASSERT_APPROX_EQ tolerance for

- four OFFLINE passes:            29.9952, 26.1885, 25.9853, 24.5419
- four SYNCHRONOUS online passes: 26.5443, 26.3197, 26.2796, 26.2426
  (Robbins-Monro apply-weight schedule, decay = 1 - apply)
- four ASYNCHRONOUS online passes: 27.2682, 26.3178, 26.2775, 26.2407
  (the one-update-stale-phi overlap schedule,
  master_component.cc:1388-1400)

plus the score-array cache sizes and the transform shape.
"""

from __future__ import annotations

import os
import tempfile

import pytest


@pytest.fixture(scope="module")
def basic_setup():
    import bigartm_spark.wrapper as wrapper
    import bigartm_spark.wrapper.messages_pb2 as messages

    n_batches, n_tokens = 20, 30
    folder = tempfile.mkdtemp()
    lib = wrapper.LibArtm()
    dictdata = messages.DictionaryData(name="dictionary")
    for i in range(n_tokens):
        dictdata.token.append(f"token{i}")
    files = []
    for b in range(n_batches):
        batch = messages.Batch()
        batch.id = f"batch_{b:02d}"
        for i in range(n_tokens):
            batch.token.append(f"token{i}")
        item = batch.item.add()
        item.id = b
        for t in range(n_tokens):
            if t == 0 or (t + b + (t + 1) * (b + 1)) % 3 == 0:
                item.token_id.append(t)
                item.token_weight.append(1.0)
        lib.ArtmSaveBatch(folder, batch)
        files.append(os.path.join(folder, batch.id + ".batch"))
    return lib, folder, files, dictdata


def _approx(a, b):
    # ASSERT_APPROX_EQ(a, b) = ASSERT_NEAR(a, b, (a + b) / 1e5)
    assert abs(a - b) <= (a + b) / 1e5, (a, b)


def test_master_model_basic_port(spark, basic_setup):
    import bigartm_spark.model.master_component as mc_mod
    import bigartm_spark.wrapper.messages_pb2 as messages

    lib, folder, files, dictdata = basic_setup
    n_batches = len(files)
    topics = ["topic1", "topic2"]
    master = mc_mod.MasterComponent(
        lib, topic_names=topics, num_processors=2,
        scores={
            "Perplexity": messages.PerplexityScoreConfig(),
            "SparsityPhi": messages.SparsityPhiScoreConfig(),
        },
        regularizers={
            "SparseTheta": (messages.SmoothSparseThetaConfig(), -0.2),
            "SparsePhi": (messages.SmoothSparsePhiConfig(), -0.1),
        },
    )
    master.create_dictionary(dictdata)
    master.initialize_model(
        model_name="pwt", topic_names=topics, dictionary_name="dictionary"
    )

    # offline: pinned per-pass perplexities + score arrays
    expected = [29.9952, 26.1885, 25.9853, 24.5419]
    for p, want in enumerate(expected):
        master.fit_offline(batch_filenames=files)
        score = master.get_score("Perplexity")
        _approx(score.value, want)
        perp_array = master.get_score_array("Perplexity")
        assert len(perp_array) == p + 1
        _approx(perp_array[-1].value, score.value)
        assert len(master.get_score_array("SparsityPhi")) == p + 1

    master.clear_score_array_cache()

    # online: Robbins-Monro schedule; sync then async, both pinned
    update_every, tau0, kappa = 2, 1024, 0.7
    for is_async, expected_online in (
        (False, [26.5443, 26.3197, 26.2796, 26.2426]),
        (True, [27.2682, 26.3178, 26.2775, 26.2407]),
    ):
        master.initialize_model(
            model_name="pwt", topic_names=topics,
            dictionary_name="dictionary",
        )
        master._models.pop("nwt", None)
        master.clear_score_array_cache()
        total_update_count = 0
        for p, want in enumerate(expected_online):
            update_after, apply_weight = [], []
            ua = 0
            while ua < n_batches:
                total_update_count += 1
                ua += update_every
                update_after.append(min(ua, n_batches))
                apply_weight.append(
                    1.0
                    if total_update_count == 1
                    else (tau0 + total_update_count) ** (-kappa)
                )
            master.fit_online(
                batch_filenames=files, update_after=update_after,
                apply_weight=apply_weight, asynchronous=is_async,
            )
            _approx(master.get_score("Perplexity").value, want)
            if not is_async:
                n_updates = (p + 1) * n_batches // update_every
                assert len(master.get_score_array("Perplexity")) == n_updates
                assert len(master.get_score_array("SparsityPhi")) == n_updates

        # transform over the full store: one item per batch, T topics
        theta = master.transform(batches_folder=folder)
        assert theta.shape == (n_batches, len(topics))


def test_empty_master_model_port(spark):
    """MasterModel.TestEmptyMasterModel (:153-160): a master with no
    models answers info() without erroring."""
    import bigartm_spark.model.master_component as mc_mod

    master = mc_mod.MasterComponent(num_processors=0)
    info = master.get_info()
    assert info is not None


def test_reshape_tokens_port(spark, basic_setup):
    """MasterModel.TestReshapeTokens* (master_model_test.cc:229-340):
    re-initializing nwt over a BIGGER dictionary grows the model on the
    next fit — new tokens get n_wt = sum_d n_dw * theta_td (the uniform-
    phi write, processor_helpers.cc:564-587) — with the reference's
    exact pinned values for the last token."""
    import bigartm_spark.model.master_component as mc_mod
    import bigartm_spark.wrapper.messages_pb2 as messages

    lib, folder, files, full_dict = basic_setup
    n_tokens = len(full_dict.token)
    topics = ["topic1", "topic2"]

    small = messages.DictionaryData(name="dictionary")
    for i in range(0, n_tokens, 2):
        small.token.append(f"token{i}")

    master = mc_mod.MasterComponent(
        lib, topic_names=topics, num_processors=2,
        scores={"Perplexity": messages.PerplexityScoreConfig()},
        regularizers={"SmoothPhi": (messages.SmoothSparsePhiConfig(), 0.1)},
    )
    master.create_dictionary(small)
    master.initialize_model(
        model_name="pwt", topic_names=topics, dictionary_name="dictionary"
    )
    for _ in range(4):
        master.fit_offline(batch_filenames=files)
    assert len(master.get_phi_matrix("nwt").index) == len(small.token)

    full = messages.DictionaryData(name="full_dict")
    for t in full_dict.token:
        full.class_id.append("@default_class")
        full.token.append(t)
    master.create_dictionary(full)
    master.initialize_model(model_name="nwt", dictionary_name="full_dict")
    assert len(master.get_phi_matrix("nwt").index) == n_tokens
    assert len(master.get_phi_matrix("pwt").index) == len(small.token)

    master.fit_offline(batch_filenames=files)
    nwt = master.get_phi_matrix("nwt")
    pwt = master.get_phi_matrix("pwt")
    assert len(nwt.index) == n_tokens and len(pwt.index) == n_tokens
    assert (nwt.values > 0).all() and (pwt.values > 0).all()

    def approx(a, b):
        assert abs(a - b) <= (a + b) / 1e5, (a, b)

    last = f"token{n_tokens - 1}"
    approx(nwt.loc[last].iloc[0], 1.39982)
    approx(nwt.loc[last].iloc[1], 5.60018)
    approx(pwt.loc[last].iloc[0], 0.0075085)
    approx(pwt.loc[last].iloc[1], 0.0330261)
