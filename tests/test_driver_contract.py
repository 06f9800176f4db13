"""Driver-contract safety net: a representative slice of the
queries()/oracle_sql() pairs replayed against DuckDB at sf0.001 inside
the normal test run (the full 50-pair sweep lives in
tools/check_oracle.py at sf0.01)."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

REPRESENTATIVE = [
    "d1_gather_dictionary",
    "g1e5_initialize_and_ranking",
    "d2g5_estep_mstep_pass",
    "d14f4_cooc_ppmi_filtered",
    "e1_top_tokens",
    "dedup_minhash_signatures",
    "ann_topk_composite",
    "text_lang_quality",
    "ev_sessionize",
    "sample_split_pack",
    "sample_domain_mixture",
    "text_repetition_pii",
    "doc_ppl_quality",
    "semantic_dedup_survivors",
    "dedup_jaccard_verify",
    "h3h4_regularizer_deltas",
]


@pytest.fixture(scope="module")
def contract(spark):
    import __spark_entry__ as entry

    return entry.queries(), entry.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    from tools.check_oracle import duck_con

    return duck_con("/root/testdata/sf0.001")


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_oracle_pair(spark, contract, duck, name):
    from tools.check_oracle import compare

    queries, oracles = contract
    sp = queries[name](spark, "/root/testdata/sf0.001").toPandas()
    du = duck.execute(oracles[name]).fetchdf()
    problems = compare(sp, du)
    assert not problems, problems


def test_every_query_has_oracle_or_is_flagged(contract):
    queries, oracles = contract
    # every registered query currently ships an oracle; if a future
    # non-SQL-expressible op drops one, this documents the decision
    missing = sorted(set(queries) - set(oracles))
    assert missing == [], f"queries without oracle (rows-only check): {missing}"


def test_entry_smoke(spark):
    import __spark_entry__ as entry

    df = entry.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"topic", "token", "value", "rank"}
