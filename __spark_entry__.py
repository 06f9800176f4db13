"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship query at sf0.001 — fit a small ARTM model and
return the top-tokens-per-topic DataFrame.
queries()/oracle_sql(): one entry per implemented operator from
SURVEY.md §2, oracle-checked against DuckDB at sf0.01 (see
bigartm_spark/plans/driver_queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: corpus -> dictionary -> init -> 2-pass EM fit -> top tokens."""
    from bigartm_spark.corpus import docs_from_lineitem
    from bigartm_spark.model.artm import ARTM
    from bigartm_spark.operators.dictionary import gather_dictionary
    from bigartm_spark.operators.topk import top_tokens

    sf_dir = "/root/testdata/sf0.001"
    docs = docs_from_lineitem(spark, sf_dir)
    model = ARTM(num_topics=5, num_document_passes=5, seed=42)
    model.initialize(gather_dictionary(docs))
    model.fit_offline(docs, num_collection_passes=2)
    return top_tokens(model.get_phi_long(), k=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    import bigartm_spark.plans.event_queries  # noqa: F401 — registers
    import bigartm_spark.plans.pipeline_queries  # noqa: F401 — registers
    from bigartm_spark.plans.driver_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    import bigartm_spark.plans.event_queries  # noqa: F401 — registers
    import bigartm_spark.plans.pipeline_queries  # noqa: F401 — registers
    from bigartm_spark.plans.driver_queries import ORACLES

    return dict(ORACLES)
