"""dump_artm_model / load_artm_model round trips (artm_model.py:1154-1291).

The folder must rebuild a *fit-ready* model: same matrices, same score
history, same regularizer stack — and continuing training from the
loaded model must land on exactly the matrices the original would have
produced (fitting is deterministic for a fixed seed)."""

from __future__ import annotations

import pytest

from bigartm_spark.model.artm import ARTM
from bigartm_spark.model.regularizers import (
    DecorrelatorPhi,
    SmoothSparsePhi,
    SmoothSparseTheta,
    TransformFunction,
)
from bigartm_spark.operators.dictionary import gather_dictionary
from bigartm_spark.sources.dump import dump_artm_model, load_artm_model


@pytest.fixture(scope="module")
def tmpdir_mod(tmp_path_factory):
    return tmp_path_factory.mktemp("dump")


def _phi_dict(phi):
    return {
        (r.class_id, r.token, r.topic): r.value
        for r in phi.to_long().collect()
    }


def _make_model(d):
    return ARTM(
        num_topics=4,
        num_document_passes=3,
        seed=11,
        cache_theta=True,
        phi_regularizers=[
            SmoothSparsePhi(
                0.05,
                use_dictionary=True,
                transform_function=TransformFunction("polynomial", a=2.0, n=1.5),
            ),
            DecorrelatorPhi(1e-4),
        ],
        theta_agents=[SmoothSparseTheta(0.01, alpha_iter=[1.0, 0.5, 0.25])],
    ).initialize(d)


def test_dump_load_roundtrip_and_continue(spark, docs, tmpdir_mod):
    d = gather_dictionary(docs)
    model = _make_model(d)
    model.fit_offline(docs, num_collection_passes=2)
    path = str(tmpdir_mod / "model_dump")
    dump_artm_model(model, path)

    back = load_artm_model(spark, path)
    assert back.topics == model.topics
    # tracker rides the reference's binary wire format (float32 cells),
    # so equality is to float32 precision
    assert back.score_tracker.keys() == model.score_tracker.keys()
    for k, vals in model.score_tracker.items():
        assert back.score_tracker[k] == pytest.approx(vals, rel=1e-6)
    assert back.num_document_passes == model.num_document_passes
    assert back.seed == model.seed
    # regularizer stack reconstructed with params intact
    assert [type(r).__name__ for r in back.phi_regularizers] == [
        "SmoothSparsePhi",
        "DecorrelatorPhi",
    ]
    tf = back.phi_regularizers[0].transform_function
    assert (tf.kind, tf.a, tf.n) == ("polynomial", 2.0, 1.5)
    assert back.theta_agents[0].alpha_iter == [1.0, 0.5, 0.25]

    a, b = _phi_dict(model.pwt), _phi_dict(back.pwt)
    assert a.keys() == b.keys()
    assert all(abs(a[k] - b[k]) < 1e-9 for k in a)

    # theta came back as a distributed relation
    assert back.theta is not None
    assert back.theta.count() == model.theta.count()

    # continuing training must match the original bit-for-bit semantics
    model.fit_offline(docs, num_collection_passes=1)
    back.fit_offline(docs, num_collection_passes=1)
    a, b = _phi_dict(model.pwt), _phi_dict(back.pwt)
    assert a.keys() == b.keys()
    assert all(abs(a[k] - b[k]) < 1e-7 for k in a)
    assert back.score_tracker["perplexity"] == pytest.approx(
        model.score_tracker["perplexity"], rel=1e-6
    )


def test_dump_refuses_existing_folder(spark, docs, tmpdir_mod):
    d = gather_dictionary(docs)
    model = ARTM(num_topics=2, num_document_passes=1, seed=3).initialize(d)
    model.fit_offline(docs, num_collection_passes=1)
    path = str(tmpdir_mod / "exists")
    dump_artm_model(model, path)
    with pytest.raises(IOError):
        dump_artm_model(model, path)


def test_dump_relation_backed_regularizer(spark, docs, tmpdir_mod):
    """DataFrame-valued regularizer args (cooc) ride along as parquet."""
    from bigartm_spark.model.regularizers import ImproveCoherencePhi
    from bigartm_spark.operators.cooc import cooc_gather

    d = gather_dictionary(docs)
    from pyspark.sql import functions as F

    cooc = cooc_gather(docs, window=3).select(
        "token_a", "token_b", F.col("cooc_tf").alias("value")
    )
    model = ARTM(
        num_topics=3,
        num_document_passes=2,
        seed=4,
        phi_regularizers=[ImproveCoherencePhi(0.01, cooc=cooc)],
    ).initialize(d)
    model.fit_offline(docs, num_collection_passes=1)
    path = str(tmpdir_mod / "with_cooc")
    dump_artm_model(model, path)
    back = load_artm_model(spark, path)
    reg = back.phi_regularizers[0]
    assert type(reg).__name__ == "ImproveCoherencePhi"
    assert reg.cooc.count() == cooc.count()
    back.fit_offline(docs, num_collection_passes=1)
    model.fit_offline(docs, num_collection_passes=1)
    a, b = _phi_dict(model.pwt), _phi_dict(back.pwt)
    assert all(abs(a[k] - b[k]) < 1e-7 for k in a)


def test_failed_dump_leaves_no_partial_folder(spark, tmp_path):
    """Validation precedes any disk write: a dump of an uninitialized
    model must not create the folder (a partial folder would make every
    retry fail the already-exists guard)."""
    import os

    from bigartm_spark.model.artm import ARTM

    m = ARTM(num_topics=2, seed=0)  # never initialized
    path = str(tmp_path / "never")
    with pytest.raises(RuntimeError):
        dump_artm_model(m, path)
    assert not os.path.exists(path)
