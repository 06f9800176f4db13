"""Dictionary facade parity (python/artm/dictionary.py:26-236): gather,
filter chains, text / pandas / binary / parquet round trips, and the
facade flowing straight into ARTM.initialize."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

import bigartm_spark as bs
from bigartm_spark.dictionary import Dictionary, unwrap_dictionary


@pytest.fixture(scope="module")
def gathered(spark, docs):
    sub = docs.filter(F.col("doc_id") < 400).cache()
    d = Dictionary(name="test_dict", spark=spark).gather(sub)
    return d, sub


def test_gather_matches_operator(spark, gathered):
    from bigartm_spark.operators.dictionary import gather_dictionary

    d, sub = gathered
    assert d.name == "test_dict"
    assert d.num_items_in_collection == sub.select("doc_id").distinct().count()
    direct = gather_dictionary(sub)
    assert d.df.count() == direct.count()
    assert unwrap_dictionary(d) is d.df
    assert unwrap_dictionary(d.df) is d.df
    with pytest.raises(TypeError):
        unwrap_dictionary(42)


def test_filter_inplace_and_copy(gathered):
    d, _ = gathered
    n0 = d.df.count()
    cutoff = d.df.approxQuantile("df", [0.5], 0.0)[0]
    copy = d.filter(min_df=cutoff + 0.5, inplace=False)
    assert copy is not d
    assert 0 < copy.df.count() < n0
    assert d.df.count() == n0  # source untouched
    capped = d.filter(max_dictionary_size=50, inplace=False)
    assert capped.df.count() == 50


def test_text_roundtrip(gathered, tmp_path):
    d, _ = gathered
    path = str(tmp_path / "dict.txt")
    d.save_text(path)
    with open(path) as f:
        header = f.readline()
    assert header.startswith("name: test_dict num_items:")

    d2 = Dictionary()
    d2.load_text(path)
    assert d2.name == "test_dict"
    assert d2.num_items_in_collection == d.num_items_in_collection
    assert d2.df.count() == d.df.count()
    a = {r["token"]: r["tf"] for r in d.df.collect()}
    b = {r["token"]: r["tf"] for r in d2.df.collect()}
    assert a.keys() == b.keys()
    for k in a:
        # text format goes through float32 (reference FIELD_DTYPES)
        assert abs(a[k] - b[k]) <= abs(a[k]) * 1e-6 + 1e-6


def test_pandas_roundtrip(gathered):
    d, _ = gathered
    pdf = d.save_dataframe()
    assert list(pdf.columns) == [
        "token", "class_id", "token_value", "token_tf", "token_df",
    ]
    assert str(pdf["token_value"].dtype) == "float32"
    d3 = Dictionary().create(pdf)
    assert d3.df.count() == len(pdf)
    assert abs(
        d3.df.agg(F.sum("value")).collect()[0][0] - 1.0
    ) < 1e-5


def test_binary_and_parquet_roundtrip(gathered, tmp_path):
    d, _ = gathered
    bin_path = str(tmp_path / "d.dict")
    d.save(bin_path)
    d2 = Dictionary(dictionary_path=bin_path)
    assert d2.name == "test_dict"
    assert d2.num_items_in_collection == d.num_items_in_collection
    assert d2.df.count() == d.df.count()

    pq_path = str(tmp_path / "d_store")
    d.save(pq_path)
    d3 = Dictionary(dictionary_path=pq_path)
    assert d3.df.count() == d.df.count()


def test_facade_feeds_artm(spark, gathered):
    d, sub = gathered
    m = bs.ARTM(num_topics=2, num_document_passes=1, seed=3)
    m.initialize(d)  # the facade, not a DataFrame
    m.fit_offline(sub, 1)
    assert np.isfinite(m.score_tracker["perplexity"][-1])


def test_context_manager_dispose(gathered):
    d, _ = gathered
    tmp = d.filter(min_df=1.0, inplace=False)
    with tmp as t:
        assert t.df is not None
    assert tmp.df is None and tmp.cooc is None


def test_filter_recalculate_value_sums_to_one(gathered):
    """test_dictionary.py value-sum discipline: after filter with
    recalculate_value=True, token values renormalize to 1 per class."""
    d, _ = gathered
    cutoff = d.df.approxQuantile("df", [0.5], 0.0)[0]
    out = d.filter(min_df=cutoff, recalculate_value=True, inplace=False)
    assert out.df.count() < d.df.count()
    total = out.df.agg(F.sum("value")).collect()[0][0]
    assert abs(total - 1.0) < 1e-9
    # without recalculate_value, the kept values no longer sum to 1
    raw = d.filter(min_df=cutoff, inplace=False)
    assert raw.df.agg(F.sum("value")).collect()[0][0] < 1.0 - 1e-6


def test_gather_with_vocab_and_cooc_files(spark, docs, tmp_path):
    """dictionary.py gather(cooc_file_path=, vocab_file_path=): vocab
    order pins export order and drops out-of-vocab tokens; the cooc file
    loads as the bundled relation and survives a save/load round trip."""
    sub = docs.filter(F.col("doc_id") < 200)
    toks = sorted(
        r["token"] for r in sub.select("token").distinct().collect()
    )
    kept = toks[: len(toks) // 2]
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("".join(f"{t}\n" for t in kept))
    cooc = tmp_path / "cooc.txt"
    cooc.write_text(f"{kept[0]} {kept[1]} 3.5\n{kept[1]} {kept[2]} 1.25\n")

    d = Dictionary(name="vc", spark=spark).gather(
        sub,
        vocab_file_path=str(vocab),
        cooc_file_path=str(cooc),
    )
    got = {r["token"] for r in d.df.select("token").collect()}
    assert got <= set(kept)  # out-of-vocab tokens dropped
    assert "vocab_order" in d.df.columns
    # vocab_order follows the file order
    rows = {r["token"]: r["vocab_order"] for r in d.df.collect()}
    ordered = sorted(rows, key=lambda t: rows[t])
    assert ordered == [t for t in kept if t in rows]
    cc = {(r["token_a"], r["token_b"]): r["value"] for r in d.cooc.collect()}
    assert cc[(kept[0], kept[1])] == 3.5

    # bundled cooc rides through the parquet store round trip
    store = str(tmp_path / "store")
    d.save(store)
    d2 = Dictionary(dictionary_path=store)
    assert d2.cooc is not None and d2.cooc.count() == 2
