from bigartm_spark.functions.hashing import (
    char_hash,
    char_hash_sql,
    unit_uniform,
    unit_uniform_sql,
)
from bigartm_spark.functions.timeutil import normalize_ts

__all__ = [
    "char_hash",
    "char_hash_sql",
    "normalize_ts",
    "unit_uniform",
    "unit_uniform_sql",
]
