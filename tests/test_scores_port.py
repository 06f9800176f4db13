"""Port of the reference's C++ Scores.Perplexity gtest
(src/artm_tests/scores_test.cc:17-145) — PerplexityScore scoping
semantics:

- transaction_typename scoping over a transaction-typed master equals
  the unscoped score (master_0);
- class_id scoping to a modality absent from the model reports zeros —
  the calculation is SKIPPED, not an error (master_1);
- with master-level class weights: unscoped == scoped-to-all-classes
  (double-eq), single-class and partially-missing scopes stay positive
  with raw < 0 and normalizer > 0 (master_2, master_3).

PORT(data): Helpers::GenerateBatch draws background counts with glibc
rand(); deterministic (item_id + token_id) % 5 + 1 substitution (same
as the reference's own python test_01 weight rule). All ported
assertions are relationships, not value goldens, so they carry over.
"""

from __future__ import annotations

import tempfile
import uuid

import pytest


def _gen_batch(n_tokens, n_docs, class1, class2):
    import bigartm_spark.wrapper.messages_pb2 as messages

    b = messages.Batch()
    b.id = str(uuid.uuid4())
    for i in range(n_tokens):
        b.token.append(f"token{i}")
        b.class_id.append(class1 if i % 2 == 0 else class2)
    for d in range(n_docs):
        it = b.item.add()
        it.id = d
        for t in range(n_tokens):
            bg = (d + t) % 5 + 1 if t > 40 else 0
            tp = 10 if (t < 40 and t % 10 == d % 10) else 0
            w = bg + tp
            if w:
                it.token_id.append(t)
                it.token_weight.append(float(w))
    return b


@pytest.fixture(scope="module")
def perplexity_corpus():
    import bigartm_spark.wrapper as wrapper
    import bigartm_spark.wrapper.messages_pb2 as messages

    batch = _gen_batch(60, 10, "@default_class", "@some_class")
    folder = tempfile.mkdtemp()
    lib = wrapper.LibArtm()
    lib.ArtmSaveBatch(folder, batch)
    dictdata = messages.DictionaryData(name="dictionary")
    for i in range(60):
        dictdata.token.append(f"token{i}")
        dictdata.class_id.append(
            "@default_class" if i % 2 == 0 else "@some_class"
        )
    return lib, folder, dictdata


def _master(lib, dictdata, scores, **kwargs):
    import bigartm_spark.model.master_component as mc_mod

    master = mc_mod.MasterComponent(
        lib, topic_names=[f"Topic{i}" for i in range(10)],
        cache_theta=True, scores=scores, **kwargs,
    )
    master.create_dictionary(dictdata)
    master.initialize_model(model_name="pwt", dictionary_name="dictionary")
    return master


def test_perplexity_transaction_typename_scope(spark, perplexity_corpus):
    """master_0 (scores_test.cc:20-83): tt-scoped == unscoped, both > 0."""
    import bigartm_spark.wrapper.messages_pb2 as messages

    lib, folder, dictdata = perplexity_corpus
    master = _master(
        lib, dictdata,
        scores={
            "perplexity_1": messages.PerplexityScoreConfig(
                transaction_typename=["@default_transaction"]
            ),
            "perplexity_2": messages.PerplexityScoreConfig(),
        },
        transaction_typenames={"@default_transaction": 1.0},
    )
    master.fit_offline(batches_folder=folder)
    v1 = master.get_score("perplexity_1").value
    v2 = master.get_score("perplexity_2").value
    assert v1 > 0 and v2 > 0
    assert abs(v1 - v2) < 1e-9


def test_perplexity_missing_class_reports_zero(spark, perplexity_corpus):
    """master_1 (scores_test.cc:86-95): a score scoped to a class absent
    from the model is skipped — all-zero report, no error."""
    import bigartm_spark.wrapper.messages_pb2 as messages

    lib, folder, dictdata = perplexity_corpus
    master = _master(
        lib, dictdata,
        scores={
            "perplexity": messages.PerplexityScoreConfig(
                class_id=["@error_class"]
            )
        },
    )
    master.fit_offline(batches_folder=folder)
    sc = master.get_score("perplexity")
    assert sc.value == 0.0
    assert sc.raw == 0.0
    assert sc.normalizer == 0.0
    assert sc.zero_words == 0


def test_perplexity_class_scopes(spark, perplexity_corpus):
    """master_2 + master_3 (scores_test.cc:98-145): unscoped equals
    scoped-to-all under class weights; partial scopes stay sound."""
    import bigartm_spark.wrapper.messages_pb2 as messages

    lib, folder, dictdata = perplexity_corpus
    master = _master(
        lib, dictdata,
        scores={
            "perplexity_1": messages.PerplexityScoreConfig(),
            "perplexity_2": messages.PerplexityScoreConfig(
                class_id=["@default_class", "@some_class"]
            ),
            "perplexity_3": messages.PerplexityScoreConfig(
                class_id=["@default_class"]
            ),
            "perplexity_4": messages.PerplexityScoreConfig(
                class_id=["@error_class", "@some_class"]
            ),
        },
        class_ids={"@default_class": 1.0, "@some_class": 2.0},
    )
    master3 = _master(
        lib, dictdata,
        scores={"perplexity": messages.PerplexityScoreConfig()},
    )
    for _ in range(5):
        master.fit_offline(batches_folder=folder)
        master3.fit_offline(batches_folder=folder)

    s1 = master.get_score("perplexity_1")
    s2 = master.get_score("perplexity_2")
    assert s1.value > 0 and s1.raw < 0 and s1.normalizer > 0
    assert s2.value > 0 and s2.raw < 0 and s2.normalizer > 0
    assert s1.zero_words == 0 and s2.zero_words == 0
    assert abs(s1.value - s2.value) < 1e-9

    s3 = master.get_score("perplexity_3")
    assert s3.value > 0 and s3.raw < 0 and s3.normalizer > 0
    assert s3.zero_words == 0

    s4 = master.get_score("perplexity_4")
    assert s4.value > 0 and s4.raw < 0 and s4.normalizer > 0
    assert s4.zero_words == 0

    sp = master3.get_score("perplexity")
    assert sp.value > 0 and sp.raw < 0 and sp.normalizer > 0
