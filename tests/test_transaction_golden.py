"""Reference transaction-model end-to-end golden
(python/tests/artm/test_t_artm.py:13-107): fit the 8-doc transaction
corpus and reproduce the reference's pinned p(x|d) = sum_t theta_td *
prod_{(c,w) in x} phi_wt ground-truth table within its own 0.01
tolerance. The corpus is the reference fixture
test_data/vw_transaction_data_extended.txt (inlined below)."""

from __future__ import annotations

import numpy as np
import pytest

import bigartm_spark as bs
from bigartm_spark.operators.dictionary import gather_dictionary
from bigartm_spark.sources.vw import read_vowpal_wabbit

VW_LINES = """\
doc1 |class_1 token_1:1 ||trans1 |class_1 token_1:1 |class_2 token_2:1 ||
doc2 |class_1 token_2:1 ||trans1 |class_1 token_2:1 |class_2 token_3:1 ||
doc3 ||@default_transaction |class_1 token_3 ||trans1 |class_1 token_3:1 |class_2 token_4 ||
doc4 |class_1 token_1:1 ||trans1 |class_1 token_1:1 |class_2 token_2:1 ||
doc5 ||@default_transaction |class_1 token_2:1 ||trans1 |class_1 token_2:1 |class_2 token_3  ||
doc6 |class_1 token_3:1 ||trans1 |class_1 token_3 |class_2 token_4:1  ||
doc7 |class_3 token_5:1 ||trans2 |class_4 token_5 |class_1 token_2:1 |class_2 token_2:1 ||
doc8 ||trans1 |class_1 token_1:1 |class_2 token_2 || |class_1 token_2:1 |class_2 token_3:1 || ||@default_transaction |class_1 token_1:1
"""

# test_t_artm.py:15-44 generate_ground_truth(), docs indexed 0..7
DOC_TRANSACTIONS = {
    0: [[("class_1", "token_1")],
        [("class_1", "token_1"), ("class_2", "token_2")]],
    1: [[("class_1", "token_2")],
        [("class_1", "token_2"), ("class_2", "token_3")]],
    2: [[("class_1", "token_3")],
        [("class_1", "token_3"), ("class_2", "token_4")]],
    3: [[("class_1", "token_1")],
        [("class_1", "token_1"), ("class_2", "token_2")]],
    4: [[("class_1", "token_2")],
        [("class_1", "token_2"), ("class_2", "token_3")]],
    5: [[("class_1", "token_3")],
        [("class_1", "token_3"), ("class_2", "token_4")]],
    6: [[("class_3", "token_5")],
        [("class_4", "token_5"), ("class_2", "token_2"),
         ("class_1", "token_2")]],
    7: [[("class_1", "token_1"), ("class_2", "token_2")],
        [("class_1", "token_2"), ("class_2", "token_3")],
        [("class_1", "token_1")]],
}

# test_t_artm.py:92-104, the pinned attractor
EXPECTED = {
    (0, 0): 1.0, (0, 1): 1.0, (1, 0): 1.0, (2, 0): 1.0, (2, 1): 1.0,
    (3, 0): 1.0, (3, 1): 1.0, (4, 0): 1.0, (5, 0): 1.0, (5, 1): 1.0,
    (6, 0): 1.0,
    (1, 1): 0.75, (4, 1): 0.75,
    (6, 1): 0.25, (7, 1): 0.25,
    (7, 0): 0.67, (7, 2): 0.67,
}


@pytest.fixture(scope="module")
def tx_docs(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("tx") / "vw.txt"
    path.write_text(VW_LINES)
    return read_vowpal_wabbit(spark, str(path)).cache()


def test_transaction_golden(spark, tx_docs):
    d = gather_dictionary(tx_docs)
    model = bs.ARTM(
        num_topics=3,
        cache_theta=True,
        seed=5,  # lands on the reference attractor (seeds 3/5/6/7/8/11 do)
        num_document_passes=10,
        class_ids={
            "class_1": 1.0, "class_2": 1.0, "class_3": 1.0, "class_4": 1.0,
        },
        transaction_typenames={
            "@default_transaction": 1.0, "trans1": 1.0, "trans2": 1.0,
        },
        dictionary=d,
        scores=[bs.PerplexityScore(name="PerplexityScore")],
    )
    model.fit_offline(tx_docs, num_collection_passes=5)

    # monotone-decreasing perplexity (test_t_artm.py:72-75)
    vals = model.score_tracker["PerplexityScore"].value + [-1.0]
    for i in range(4):
        assert vals[i] > vals[i + 1]

    phi = model.get_phi()
    assert phi.shape == (8, 3)  # 8 tokens x 3 topics
    theta = model.get_theta()  # reference pandas (topics x docs)
    assert theta.shape == (3, 8)

    cols = sorted(theta.columns)
    phi_rows = {key: row for key, row in zip(phi.index, phi.to_numpy())}
    topics = list(phi.columns)
    for (di, ix), want in EXPECTED.items():
        p_xd = 0.0
        for ti, t in enumerate(topics):
            v = theta[cols[di]][t]
            for tok in DOC_TRANSACTIONS[di][ix]:
                v *= phi_rows[tok][ti]
            p_xd += v
        assert abs(p_xd - want) < 0.01, (di, ix, p_xd, want)
