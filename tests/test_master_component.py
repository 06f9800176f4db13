"""MasterComponent shim unit coverage beyond the ported wrapper tests:
dictionary message round trips, regularized M-step, merge, model
export/import, fit loops, theta readout, score arrays."""

from __future__ import annotations

import numpy as np
import pytest

import bigartm_spark.model.master_component as mc
import bigartm_spark.wrapper.messages_pb2 as messages


@pytest.fixture()
def corpus_folder(spark, tmp_path):
    from bigartm_spark.sources.io import save_batches

    rows = []
    for d in range(40):
        for t in range(12):
            w = (d + t) % 4 + (3 if t % 4 == d % 4 else 0)
            if w:
                rows.append(
                    (d, str(d), str(d % 3), "@default_class", f"tok{t}",
                     float(w), t, t, "@default_transaction")
                )
    docs = spark.createDataFrame(
        rows,
        "doc_id long, title string, batch_id string, class_id string, "
        "token string, weight double, pos int, transaction_id int, "
        "transaction_typename string",
    )
    folder = str(tmp_path / "batches")
    save_batches(docs, folder)
    return folder


def _master(corpus_folder, **kw):
    scores = kw.pop("scores", {"Ppl": messages.PerplexityScoreConfig()})
    m = mc.MasterComponent(scores=scores, **kw)
    m.gather_dictionary(dictionary_target_name="dict", data_path=corpus_folder)
    m.initialize_model(
        model_name="pwt", topic_names=["a", "b", "c"], dictionary_name="dict"
    )
    return m


def test_create_and_get_dictionary_roundtrip(spark):
    m = mc.MasterComponent()
    dd = messages.DictionaryData(
        name="d0",
        token=["x", "y"],
        class_id=["@default_class"] * 2,
        token_value=[0.25, 0.75],
        token_tf=[1.0, 3.0],
        token_df=[1.0, 2.0],
        cooc_first_index=[0],
        cooc_second_index=[1],
        cooc_value=[0.5],
    )
    m.create_dictionary(dd)
    out = m.get_dictionary("d0")
    got = dict(zip(out.token, out.token_value))
    assert got == {"x": 0.25, "y": 0.75}
    assert m._dictionaries["d0"].cooc.count() == 1


def test_regularize_model_changes_pwt(spark, corpus_folder):
    m = _master(corpus_folder)
    m.create_regularizer(
        "smsp", messages.SmoothSparsePhiConfig(), tau=0.0
    )
    m.process_batches("pwt", "nwt", 3, corpus_folder)
    # tau=0 -> rwt contributes nothing
    m.regularize_model("pwt", "nwt", "rwt", "smsp", 0.0)
    base = m.normalize_model("pwt", "nwt", "rwt").compact.collect()
    # strong smoothing pulls rows toward uniform
    m.regularize_model("pwt", "nwt", "rwt", "smsp", 50.0)
    smoothed = m.normalize_model("pwt", "nwt", "rwt").compact.collect()
    v0 = {(r["token"]): r["values"] for r in base}
    v1 = {(r["token"]): r["values"] for r in smoothed}
    assert any(
        abs(a - b) > 1e-9 for k in v0 for a, b in zip(v0[k], v1[k])
    )
    spread0 = np.mean([np.std(v) for v in v0.values()])
    spread1 = np.mean([np.std(v) for v in v1.values()])
    assert spread1 < spread0  # smoothing flattens the rows


def test_merge_model_weights(spark, corpus_folder):
    m = _master(corpus_folder)
    m.process_batches("pwt", "nwt", 2, corpus_folder)
    m.merge_model({"nwt": 2.0}, nwt="nwt2")
    a = {r["token"]: r["values"] for r in m._models["nwt"].compact.collect()}
    b = {r["token"]: r["values"] for r in m._models["nwt2"].compact.collect()}
    for k in a:
        np.testing.assert_allclose(np.array(b[k]), 2 * np.array(a[k]), rtol=1e-12)


def test_export_import_model_roundtrip(spark, corpus_folder, tmp_path):
    m = _master(corpus_folder)
    path = str(tmp_path / "pwt.model")
    m.export_model("pwt", path)
    m.import_model("pwt2", path)
    a = {r["token"]: r["values"] for r in m._models["pwt"].compact.collect()}
    b = {r["token"]: r["values"] for r in m._models["pwt2"].compact.collect()}
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=1e-6)  # float32 file


def test_fit_offline_decreases_perplexity(spark, corpus_folder):
    m = _master(corpus_folder)
    m.fit_offline(batches_folder=corpus_folder, num_collection_passes=4)
    arr = m.get_score_array("Ppl")
    assert len(arr) == 4
    vals = [s.value for s in arr]
    assert all(np.isfinite(vals))
    assert vals[-1] <= vals[0]


def test_fit_online_update_points(spark, corpus_folder, tmp_path):
    import os
    import shutil

    # split the batch store into two folders = two "batch files"
    m0 = _master(corpus_folder)
    f1 = str(tmp_path / "g1")
    f2 = str(tmp_path / "g2")
    from bigartm_spark.sources.io import load_batches, save_batches

    docs = load_batches(m0._spark, corpus_folder)
    save_batches(docs.filter("doc_id < 20"), f1)
    save_batches(docs.filter("doc_id >= 20"), f2)

    m = _master(corpus_folder)
    m.fit_online(
        batch_filenames=[f1, f2],
        update_after=[1, 2],
        apply_weight=[1.0, 0.5],
        decay_weight=[0.0, 0.5],
    )
    assert "pwt" in m._models and "nwt" in m._models
    vals = np.array(
        [v for r in m._models["pwt"].compact.collect() for v in r["values"]]
    )
    assert np.isfinite(vals).all() and (vals >= 0).all()


def test_transform_and_theta_matrix(spark, corpus_folder):
    m = _master(corpus_folder)
    m.fit_offline(batches_folder=corpus_folder, num_collection_passes=1)
    theta = m.transform(batches_folder=corpus_folder)
    assert theta.shape == (40, 3)
    np.testing.assert_allclose(theta.sum(axis=1).to_numpy(), 1.0, atol=1e-9)
    info = m.get_theta_info()
    assert len(info.item_id) == 40


def test_reconfigure_regularizer_tau(spark, corpus_folder):
    m = _master(corpus_folder)
    m.create_regularizer("smsp", messages.SmoothSparsePhiConfig(), tau=1.0)
    m.reconfigure_regularizer("smsp", tau=-5.0)
    assert m._regularizers["smsp"].tau == -5.0


def test_attach_model_live_view(spark, corpus_folder):
    """G9 AttachModel: edits through the attached numpy array are seen
    by the next E-step, and master-side writes refresh the same array."""
    m = _master(corpus_folder)
    info, mat = m.attach_model("pwt")
    assert mat.shape == (12, 3) and info.num_topics == 3
    mat[:, 1] = 0.0  # kill topic b through the attached view
    m.process_batches("pwt", "nwt", 2, corpus_folder, find_theta=True)
    m.normalize_model("pwt", "nwt")
    theta = m.get_theta_matrix()
    assert theta["b"].max() == 0.0
    # the caller's array object tracked the normalize write
    assert mat[:, 1].max() == 0.0 and mat.sum() > 0


def test_get_info_inventory(spark, corpus_folder):
    m = _master(corpus_folder)
    info = m.get_info()
    assert [x.name for x in info.model] == ["pwt"]
    assert [x.name for x in info.dictionary] == ["dict"]
    assert [x.name for x in info.score] == ["Ppl"]


def test_dispose_releases_state(spark, corpus_folder):
    m = _master(corpus_folder)
    m.process_batches("pwt", "nwt", 1, corpus_folder)
    assert m._models and m._docs_cache
    m.dispose()
    assert m._models == {} and m._docs_cache == {}


def test_per_call_tau_leaves_registered_config(spark, corpus_folder):
    """ProcessBatchesArgs / RegularizeModelArgs taus are per-call in the
    reference (master_component.py:478-567) — an explicit tau on the
    call must not overwrite the registered config's stored tau."""
    m = _master(corpus_folder)
    m.create_regularizer("ssp", messages.SmoothSparsePhiConfig(), tau=1.5)
    m.create_regularizer("sst", messages.SmoothSparseThetaConfig(), tau=0.25)
    m.process_batches(
        "pwt", "nwt", 2, corpus_folder,
        regularizer_name="sst", regularizer_tau=-9.0,
    )
    assert m._regularizers["sst"].tau == 0.25
    m.regularize_model("pwt", "nwt", "rwt", "ssp", 42.0)
    assert m._regularizers["ssp"].tau == 1.5


def test_bare_process_batches_skips_registered_theta(spark, corpus_folder):
    """The reference's raw ProcessBatches applies only explicitly-named
    theta regularizers; registered ones ride along only through the fit
    loops. A registered strong sparsifier must not change a bare
    process_batches E-step."""
    plain = _master(corpus_folder)
    plain.process_batches("pwt", "nwt", 2, corpus_folder, find_theta=True)
    base = plain.get_theta_matrix().to_numpy()

    reg = _master(corpus_folder)
    reg.create_regularizer("sst", messages.SmoothSparseThetaConfig(), tau=-40.0)
    reg.process_batches("pwt", "nwt", 2, corpus_folder, find_theta=True)
    np.testing.assert_allclose(reg.get_theta_matrix().to_numpy(), base, atol=1e-12)

    # explicitly named on the call -> it applies
    reg.process_batches(
        "pwt", "nwt", 2, corpus_folder, find_theta=True,
        regularizer_name="sst", regularizer_tau=-40.0,
    )
    assert np.abs(reg.get_theta_matrix().to_numpy() - base).max() > 1e-6


def test_find_ptdw_returns_ptdw_matrix(spark, corpus_folder):
    m = _master(corpus_folder)
    m.process_batches("pwt", None, 2, corpus_folder, find_ptdw=True)
    ptdw = m.get_ptdw_matrix()
    assert ptdw.shape[1] == 3
    # each (doc, pos) row is a distribution over topics
    np.testing.assert_allclose(ptdw.sum(axis=1).to_numpy(), 1.0, atol=1e-9)
    # ThetaMatrixType_DensePtdw (=4) routes the same way
    m2 = _master(corpus_folder)
    m2.process_batches("pwt", None, 2, corpus_folder, theta_matrix_type=4)
    assert m2._ptdw is not None


def test_get_phi_matrix_keeps_modalities_separate(spark):
    """The same token string in two modalities is two rows in the
    reference's TopicModel return (one (class_id, token) pair each) —
    the pandas pivot must not average them together."""
    m = mc.MasterComponent()
    dd = messages.DictionaryData(
        name="d0",
        token=["shared", "shared", "only_a"],
        class_id=["@class_a", "@class_b", "@class_a"],
        token_value=[0.3, 0.4, 0.3],
        token_tf=[3.0, 4.0, 3.0],
        token_df=[2.0, 2.0, 1.0],
    )
    m.create_dictionary(dd)
    m.initialize_model(
        model_name="pwt", topic_names=["a", "b"], dictionary_name="d0"
    )
    phi = m.get_phi_matrix("pwt")
    assert len(phi) == 3  # one row per (class_id, token), not 2 merged
    assert ("@class_a", "shared") in phi.index
    assert ("@class_b", "shared") in phi.index


def test_duplicate_dictionary_rows_cannot_alter_training(spark, corpus_folder):
    """ADVICE r5 (medium): a UnigramCollectionModel perplexity score whose
    dictionary carries duplicate (class_id, token) rows must not fan out
    corpus rows through the cp broadcast join — attaching a score can
    never change n_wt."""
    clean = _master(corpus_folder)
    clean.process_batches("pwt", "nwt", 2, corpus_folder)
    base = {
        r["token"]: r["values"]
        for r in clean._models["nwt"].compact.collect()
    }

    dup = messages.DictionaryData(
        name="dupdict",
        token=[f"tok{t}" for t in range(12)] * 2,  # every row twice
        class_id=["@default_class"] * 24,
        token_value=[1.0 / 12] * 24,
        token_tf=[5.0] * 24,
        token_df=[5.0] * 24,
    )
    scored = _master(
        corpus_folder,
        scores={
            "Ppl": messages.PerplexityScoreConfig(
                model_type=1, dictionary_name="dupdict"
            )
        },
    )
    scored.create_dictionary(dup)
    scored.process_batches("pwt", "nwt", 2, corpus_folder)
    got = {
        r["token"]: r["values"]
        for r in scored._models["nwt"].compact.collect()
    }
    assert base.keys() == got.keys()
    for k in base:
        np.testing.assert_allclose(got[k], base[k], rtol=1e-9)
    assert np.isfinite(scored.get_score("Ppl").value)
