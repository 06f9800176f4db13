"""Capture .explain("formatted") for every bench query -> plans/<tag>/.

Usage: python tools/capture_plans.py <tag> [suffix]
Writes plans/<tag>/<query>_<suffix>.txt (suffix default "before").

The bench's imperative loops (fit_offline) have no single DataFrame; for
those we capture the plan of the relation whose materialization is the
pass's one Spark action (aggregate_nwt over the E-step kernel output).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r08"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(outdir, exist_ok=True)

    from bigartm_spark.corpus import docs_from_lineitem
    from bigartm_spark.model import estep
    from bigartm_spark.model.init import initialize_phi
    from bigartm_spark.operators.cooc import cooc_ppmi
    from bigartm_spark.operators.dedup import (
        exact_dedup,
        lsh_candidate_pairs,
        minhash_signatures,
        simhash,
    )
    from bigartm_spark.operators.dictionary import gather_dictionary, top_k_by_df
    from bigartm_spark.operators.similarity import brute_force_topk
    from bigartm_spark.operators.textstats import quality_score
    from bigartm_spark.session import get_spark

    spark = get_spark("bigartm_spark-plans")
    spark.sparkContext.setLogLevel("ERROR")

    docs = docs_from_lineitem(spark, SF_DIR).cache()
    docs.count()
    d = gather_dictionary(docs).cache()
    d.count()
    documents = spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()
    documents.count()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    emb.count()

    TOPICS = [f"topic_{i}" for i in range(10)]
    phi = initialize_phi(d, TOPICS, seed=42)

    plans = {
        "gather_dictionary": lambda: gather_dictionary(docs),
        "top_k_by_df": lambda: top_k_by_df(d, 100),
        "cooc_ppmi_w2": lambda: cooc_ppmi(docs, window=2),
        "initialize_phi": lambda: phi.compact,
        "estep_nwt": lambda: estep.aggregate_nwt(
            estep.process_batches(
                docs, phi, num_document_passes=10, compute_scores=True
            ),
            len(TOPICS),
        ),
        "dedup_exact": lambda: exact_dedup(documents),
        "dedup_minhash_sigs": lambda: minhash_signatures(documents),
        "dedup_lsh_candidates": lambda: lsh_candidate_pairs(documents),
        "dedup_simhash": lambda: simhash(documents),
        "ann_cosine_topk": lambda: brute_force_topk(emb, 0, 10),
        "text_quality": lambda: quality_score(documents),
    }
    for name, fn in plans.items():
        try:
            txt = explain_str(fn())
        except Exception as e:  # capture the failure, keep going
            txt = f"ERROR capturing plan: {e!r}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} chars)")

    # fit_offline: the per-pass materialized relation (broadcast regime,
    # unregularized -> the action is the nwt collect; capture that plan)
    from bigartm_spark.model.artm import ARTM

    m = ARTM(num_topics=10, num_document_passes=5, seed=42)
    m.initialize(d)
    prepared = estep.prepare_corpus(docs, m.num_buckets or 64)
    try:
        kernel_out = estep.process_batches(
            prepared,
            m.pwt,
            num_document_passes=5,
            compute_scores=True,
            broadcast_phi=True,
            phi_local=getattr(m, "_phi_local", None),
        )
        nwt = estep.aggregate_nwt(kernel_out, len(TOPICS))
        txt = explain_str(nwt)
    except Exception as e:
        txt = f"ERROR capturing plan: {e!r}"
    finally:
        try:
            prepared.unpersist()
        except Exception:
            pass
    with open(os.path.join(outdir, f"fit_offline_pass_{suffix}.txt"), "w") as fh:
        fh.write(txt)
    print(f"wrote fit_offline_pass_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
