from bigartm_spark.functions.hashing import (
    char_hash,
    char_hash_sql,
    unit_uniform,
    unit_uniform_sql,
)

__all__ = ["char_hash", "char_hash_sql", "unit_uniform", "unit_uniform_sql"]
