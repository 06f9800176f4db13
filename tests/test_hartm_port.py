"""The reference's python/tests/artm/test_hartm.py user workflow ported
to `import bigartm_spark as artm` — the drop-in acceptance test for the
front-door surface (VERDICT r4 next-round #2 + #7).

Edits vs the reference script, each marked `# PORT:`:
- the downloaded kos corpus is replaced by a deterministic synthetic
  UCI pair written to tmp (the sandbox is offline — documented blocker,
  VERDICT r4 "What's missing" #3);
- `get_phi` matches the reference pandas return directly (no PORT
  edit needed anymore); psi pivots through pandas;
- the python27/python35 RNG-specific psi support constants become
  structural assertions (psi is a proper conditional distribution),
  plus a golden-shape perplexity assertion per level.
Everything else — verbs, kwargs, call order — is the reference script.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

import bigartm_spark as artm  # the one-line change a reference user makes

# constants (scaled from the reference's kos sizes to the in-repo corpus)
num_documents = 120
vocabulary_size = 80
num_document_passes = 5
num_collection_passes = 3
num_topics_level_0 = 5
num_topics_level_1 = 8
parent_level_weight = 1
regularizer_tau = 10**5


def _write_uci_corpus(data_path):
    """PORT: deterministic stand-in for the downloaded kos corpus —
    same weight-rule family as the reference's synthetic wrapper test
    (topical tokens + background tokens)."""
    triples = []
    for item_id in range(num_documents):
        for token_id in range(vocabulary_size):
            if token_id < 50:
                w = 8 if (token_id % 5) == (item_id % 5) else 0
            else:
                w = (item_id + token_id) % 4
            if w:
                triples.append((item_id + 1, token_id + 1, w))
    with open(os.path.join(data_path, "docword.kos.txt"), "w") as f:
        f.write(f"{num_documents}\n{vocabulary_size}\n{len(triples)}\n")
        for d, t, w in triples:
            f.write(f"{d} {t} {w}\n")
    with open(os.path.join(data_path, "vocab.kos.txt"), "w") as f:
        for token_id in range(vocabulary_size):
            f.write(f"word_{token_id}\n")


@pytest.mark.usefixtures("spark")
def test_func():
    data_path = tempfile.mkdtemp()
    batches_folder = tempfile.mkdtemp()
    parent_batch_folder = tempfile.mkdtemp()
    hierarchy_model_folder = tempfile.mkdtemp()
    os.rmdir(batches_folder)  # PORT: save_batches wants a fresh dir
    os.rmdir(hierarchy_model_folder)
    os.makedirs(hierarchy_model_folder)

    try:
        _write_uci_corpus(data_path)

        batch_vectorizer = artm.BatchVectorizer(
            data_path=data_path,
            data_format="bow_uci",
            collection_name="kos",
            target_folder=batches_folder,
        )

        dictionary = artm.Dictionary()
        dictionary.gather(data_path=batch_vectorizer.data_path)

        hierarchy = artm.hARTM(
            dictionary=dictionary,
            cache_theta=True,
            num_document_passes=num_document_passes,
            tmp_files_path=parent_batch_folder,
            theta_columns_naming="title",
        )

        level_0 = hierarchy.add_level(num_topics=num_topics_level_0)
        level_0.initialize(dictionary=dictionary)
        level_0.fit_offline(
            batch_vectorizer=batch_vectorizer,
            num_collection_passes=num_collection_passes,
        )

        phi_0 = hierarchy.get_level(0).get_phi()
        assert phi_0.shape == (vocabulary_size, num_topics_level_0)

        theta_0 = hierarchy.get_level(0).get_theta()
        assert theta_0.shape == (num_topics_level_0, num_documents)

        # golden-shape trajectory (VERDICT r4 #7): strictly improving EM
        traj0 = level_0.score_tracker["perplexity"]
        assert len(traj0) == num_collection_passes
        assert traj0[-1] <= traj0[0]
        # PORT (VERDICT r6 #5): pinned level-0 trajectory at the fixed
        # seed on the in-repo corpus — catches an EM/weighting
        # regression, not just a shape change (tolerances as in
        # test_master_model_port.py)
        for got, want in zip(traj0, [76.9575739828, 61.7659310883, 40.4142181758]):
            assert got == pytest.approx(want, rel=1e-6), traj0

        level_1 = hierarchy.add_level(
            num_topics=num_topics_level_1,
            parent_level_weight=parent_level_weight,
        )
        level_1.initialize(dictionary=dictionary)
        level_1.regularizers.add(
            artm.HierarchySparsingThetaRegularizer(
                name="HierSparsTheta", tau=regularizer_tau
            )
        )
        level_1.fit_offline(
            batch_vectorizer=batch_vectorizer,
            num_collection_passes=num_collection_passes,
        )

        phi_1 = hierarchy.get_level(1).get_phi()
        assert phi_1.shape == (vocabulary_size, num_topics_level_1)

        psi = hierarchy.get_level(1).get_psi()
        assert psi.shape == (num_topics_level_1, num_topics_level_0)

        # PORT: the reference pins RNG-specific support constants
        # (0.0978 / 0.1522); structurally psi is p(child | parent):
        # each parent column sums to 1 and every child has support
        col_sums = psi.sum(axis=0)
        assert ((col_sums - 1.0).abs() < 1e-6).all(), col_sums
        support = psi.values.max(axis=1).min()
        assert support > 0.0
        # PORT (VERDICT r6 #5): pinned level-1 trajectory + psi support
        # at the fixed seed — a parent_level_weight or
        # HierarchySparsingTheta regression moves these immediately
        traj1 = level_1.score_tracker["perplexity"]
        for got, want in zip(traj1, [76.606607188, 60.7533324535, 42.4098321547]):
            assert got == pytest.approx(want, rel=1e-6), traj1
        assert support == pytest.approx(0.1410630457, rel=1e-6)

        assert level_0.clone() is not None
        assert level_1.clone() is not None
        assert hierarchy.clone() is not None

        # Test save and load methods
        hierarchy.save(hierarchy_model_folder)

        hierarchy_load = artm.hARTM()
        hierarchy_load.load(hierarchy_model_folder)

        assert level_0.num_topics == hierarchy_load.get_level(0).num_topics
        assert (
            (phi_0 - hierarchy_load.get_level(0).get_phi())
            .abs().max().max() < 1e-3
        )

        assert level_1.num_topics == hierarchy_load.get_level(1).num_topics
        assert (
            (phi_1 - hierarchy_load.get_level(1).get_phi())
            .abs().max().max() < 1e-3
        )

        # Test add_level method with topic_names instead of num_topics
        hierarchy_new = artm.hARTM(
            dictionary=dictionary,
            cache_theta=True,
            num_document_passes=num_document_passes,
            tmp_files_path=parent_batch_folder,
            theta_columns_naming="title",
        )

        level_0_new = hierarchy_new.add_level(topic_names=level_0.topic_names)
        level_0_new.initialize(dictionary=dictionary)
        level_0_new.fit_offline(
            batch_vectorizer=batch_vectorizer,
            num_collection_passes=num_collection_passes,
        )

        phi_0_new = hierarchy_new.get_level(0).get_phi()
        assert (phi_0 - phi_0_new).abs().max().max() < 1e-3

        level_1_new = hierarchy_new.add_level(topic_names=level_1.topic_names)
        level_1_new.initialize(dictionary=dictionary)
        level_1_new.regularizers.add(
            artm.HierarchySparsingThetaRegularizer(
                name="HierSparsTheta", tau=regularizer_tau
            )
        )
        level_1_new.fit_offline(
            batch_vectorizer=batch_vectorizer,
            num_collection_passes=num_collection_passes,
        )

        phi_1_new = hierarchy_new.get_level(1).get_phi()
        assert (phi_1 - phi_1_new).abs().max().max() < 1e-3

        psi_new = hierarchy_new.get_level(1).get_psi()
        assert (psi - psi_new).abs().max().max() < 1e-3

        # Same functionality with plain ARTM; psi must match exactly
        level_0_plain = artm.ARTM(
            # PORT: reference passes num_topics (its default topic names
            # match across hARTM and ARTM); ours carry a level prefix,
            # so pass the names for the pandas index alignment below
            topic_names=level_0.topic_names,
            num_document_passes=num_document_passes,
            cache_theta=True,
            seed=level_0.seed,
            theta_columns_naming="title",
        )
        level_0_plain.initialize(dictionary=dictionary)
        level_0_plain.fit_offline(
            num_collection_passes=num_collection_passes,
            batch_vectorizer=batch_vectorizer,
        )

        phi_0_plain = level_0_plain.get_phi()
        assert (phi_0 - phi_0_plain).abs().max().max() < 1e-3

        level_1_plain = artm.ARTM(
            topic_names=level_1.topic_names,  # PORT: see level_0_plain
            num_document_passes=num_document_passes,
            parent_model=level_0_plain,
            parent_model_weight=parent_level_weight,
            cache_theta=True,
            seed=level_1.seed,
            theta_columns_naming="title",
        )
        level_1_plain.initialize(dictionary=dictionary)
        level_1_plain.regularizers.add(
            artm.HierarchySparsingThetaRegularizer(
                name="HierSparsTheta", tau=regularizer_tau
            )
        )
        level_1_plain.fit_offline(
            num_collection_passes=num_collection_passes,
            batch_vectorizer=batch_vectorizer,
        )

        phi_1_plain = level_1_plain.get_phi()
        assert (phi_1 - phi_1_plain).abs().max().max() < 1e-3

        psi_plain = level_1_plain.get_parent_psi()
        assert (psi - psi_plain).abs().max().max() < 1e-3

    finally:
        shutil.rmtree(data_path)
        shutil.rmtree(batches_folder, ignore_errors=True)
        shutil.rmtree(parent_batch_folder, ignore_errors=True)
        shutil.rmtree(hierarchy_model_folder, ignore_errors=True)
