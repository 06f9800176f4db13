"""F-SYN-2 'kos-like' trajectory-shape tests (FIXTURES.md §2): on a
Zipf-ish corpus, sparsing regularizers must push phi sparsity up
monotonically while perplexity still falls — the qualitative shape the
reference pins on the real kos corpus (test_artm_model.py golden arrays).
"""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def kos_like_docs(spark):
    rng = np.random.RandomState(99)
    D, W = 300, 600
    rows = []
    for d in range(D):
        n_tokens = max(int(rng.lognormal(3.2, 0.4)), 5)
        # Zipf(s=1.1) token draws
        ranks = rng.zipf(1.1, size=n_tokens * 3)
        ranks = ranks[ranks <= W][:n_tokens]
        uniq, counts = np.unique(ranks, return_counts=True)
        for pos, (t, c) in enumerate(zip(uniq, counts), start=1):
            rows.append(
                (d, str(d), str(d % 8), "@default_class", f"w{t}", float(c),
                 pos, pos, "@default_transaction")
            )
    return spark.createDataFrame(
        rows,
        "doc_id long, title string, batch_id string, class_id string, "
        "token string, weight double, pos int, transaction_id int, "
        "transaction_typename string",
    ).cache()


def test_sparsing_regularizers_shape(spark, kos_like_docs):
    from pyspark.sql import functions as F

    from bigartm_spark.model.artm import ARTM
    from bigartm_spark.model.regularizers import DecorrelatorPhi, SmoothSparsePhi
    from bigartm_spark.operators.dictionary import gather_dictionary

    def phi_sparsity(pwt):
        row = (
            pwt.to_long()
            .agg(F.avg((F.col("value") < 1e-10).cast("double")).alias("s"))
            .collect()[0]
        )
        return row["s"]

    d = gather_dictionary(kos_like_docs)
    m = ARTM(
        num_topics=8,
        num_document_passes=5,
        seed=13,
        phi_regularizers=[
            SmoothSparsePhi(tau=-0.7),
            DecorrelatorPhi(tau=10.0),
        ],
        phi_scores={"sparsity_phi": phi_sparsity},
    )
    m.initialize(d)
    m.fit_offline(kos_like_docs, num_collection_passes=6)

    sp = m.score_tracker["sparsity_phi"]
    px = m.score_tracker["perplexity"]
    assert len(sp) == 6 and len(px) == 6
    # sparsity rises materially and (weakly) monotonically
    assert sp[-1] > sp[0] + 0.1, sp
    assert all(b >= a - 0.02 for a, b in zip(sp, sp[1:])), sp
    # perplexity still falls overall despite the sparsing pressure
    assert px[-1] < px[0], px


def test_plain_plsa_baseline_stays_dense(spark, kos_like_docs):
    from pyspark.sql import functions as F

    from bigartm_spark.model.artm import ARTM
    from bigartm_spark.operators.dictionary import gather_dictionary

    def phi_sparsity(pwt):
        return (
            pwt.to_long()
            .agg(F.avg((F.col("value") < 1e-10).cast("double")).alias("s"))
            .collect()[0]["s"]
        )

    m = ARTM(
        num_topics=8,
        num_document_passes=5,
        seed=13,
        phi_scores={"sparsity_phi": phi_sparsity},
    )
    m.initialize(gather_dictionary(kos_like_docs))
    m.fit_offline(kos_like_docs, num_collection_passes=3)
    # without sparsing regularizers phi keeps (near-)full support
    assert m.score_tracker["sparsity_phi"][-1] < 0.05
