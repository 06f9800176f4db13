"""bigartm_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of BigARTM (reference: bigartm/bigartm).

BigARTM is a regularized multimodal topic-modeling platform; every one of
its stages (corpus parse, dictionary gather/filter, matrix init, EM fit,
regularize, normalize, scores, retrieval) decomposes into relational
operators which this package expresses as Spark DataFrame plans.

Canonical long-format tables (see SURVEY.md §1.1):

- ``docs(doc_id, title, batch_id, class_id, token, weight, pos,
  transaction_id, transaction_typename)``
- ``dictionary(class_id, token, value, tf, df)``
- ``phi / nwt / rwt (class_id, token, topic, value)`` — COO layout
- ``theta(doc_id, topic, value)``

Design stance: DataFrame/SQL expressions everywhere, Catalyst plans the
physical strategy; a single Arrow-batched kernel (``model/estep.py``) for
the per-document inner EM loop, which is the only place row-at-a-time SQL
would be catastrophically slower.
"""

from bigartm_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
