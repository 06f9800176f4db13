"""Portable deterministic hashing / pseudo-RNG.

The reference initializes Phi with a per-token seeded RNG so fits are
exactly repeatable across runs and thread counts
(/root/reference/src/artm/core/helpers.cc:79-135 — Java-style 31*h+c
rolling hash over (class_id, keyword, seed) feeding boost::mt19937).

We keep the same *shape* — a rolling string hash mixed with (topic, seed)
— but use mod-prime arithmetic so the exact same value is computable in
any ANSI-SQL engine (the DuckDB oracle replays it with zero UDFs). Never
``rand()``: non-deterministic across task retries, which silently breaks
reproducibility on a real cluster.

Every op here is a JVM-side Column expression (whole-stage codegen), no
Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_P_HASH = 1_000_000_007  # rolling-hash modulus
_M = 2_147_483_647  # MINSTD modulus (2^31 - 1)
_A = 48_271  # MINSTD multiplier
_TOPIC_MIX = 2_654_435_761  # Knuth multiplicative constant


def char_hash(col: Column | str, init: int = 7) -> Column:
    """Rolling hash h = (h*31 + ascii(c)) mod 1e9+7 over the string.

    Mirrors the reference's 31*h+c loop (helpers.cc:112-131) with a prime
    modulus so 64-bit arithmetic never overflows in either engine.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        F.split(c, ""),
        F.lit(init).cast("long"),
        lambda acc, ch: (acc * F.lit(31) + F.ascii(ch)) % F.lit(_P_HASH),
    )


def char_hash_sql(expr: str, init: int = 7) -> str:
    """DuckDB-SQL replica of :func:`char_hash`."""
    return (
        f"list_reduce(list_prepend(CAST({init} AS BIGINT), "
        f"list_transform(string_split({expr}, ''), c -> CAST(ascii(c) AS BIGINT))), "
        f"(acc, x) -> (acc * 31 + x) % {_P_HASH})"
    )


def _minstd2(g: Column) -> Column:
    u = (g * F.lit(_A)) % F.lit(_M)
    return (u * F.lit(_A)) % F.lit(_M)


def base_hash(class_id: Column | str, token: Column | str) -> Column:
    """Combined (class_id, token) rolling hash. Compute ONCE per row and
    reuse across topics — the string fold is the expensive part."""
    h = (char_hash(class_id) * F.lit(31) + F.lit(255)) % F.lit(_P_HASH)
    return (h * F.lit(31) + char_hash(token)) % F.lit(_P_HASH)


def uniform_from_base(
    hb: Column, topic_idx: Column | int, seed: int = 0
) -> Column:
    """Pseudo-uniform in (0,1) from a precomputed base hash: cheap integer
    mixing only (two MINSTD rounds)."""
    t = F.lit(topic_idx) if isinstance(topic_idx, int) else topic_idx
    g = (hb + t.cast("long") * F.lit(_TOPIC_MIX) + F.lit(seed)) % F.lit(_M - 1) + F.lit(1)
    return _minstd2(g).cast("double") / F.lit(float(_M))


def unit_uniform(
    class_id: Column | str,
    token: Column | str,
    topic_idx: Column | int,
    seed: int = 0,
) -> Column:
    """Deterministic pseudo-uniform in (0, 1) keyed by (class, token, topic, seed).

    token-hash -> mix topic & seed -> two MINSTD (Park-Miller) rounds.
    Exactly reproducible in SQL; see :func:`unit_uniform_sql`. Prefer
    base_hash + uniform_from_base when generating many topics per row.
    """
    return uniform_from_base(base_hash(class_id, token), topic_idx, seed)


def unit_uniform_sql(
    class_id_expr: str, token_expr: str, topic_idx_expr: str, seed: int = 0
) -> str:
    """DuckDB-SQL replica of :func:`unit_uniform` (value-identical)."""
    hc = char_hash_sql(class_id_expr)
    ht = char_hash_sql(token_expr)
    return (
        f"(((((({hc}) * 31 + 255) % {_P_HASH}) * 31 + ({ht})) % {_P_HASH} "
        f"+ CAST({topic_idx_expr} AS BIGINT) * {_TOPIC_MIX} + {seed}) % {_M - 1} + 1) "
        f"* {_A} % {_M} * {_A} % {_M} / {float(_M)}"
    )


def int_uniform(
    key: Column | str, salt: Column | int, seed: int = 0
) -> Column:
    """Column twin of :func:`int_uniform_np` / :func:`int_uniform_sql`:
    pseudo-uniform in (0,1) from a non-negative int64 key + int salt,
    value-identical across Spark / DuckDB / numpy. Pure JVM integer
    arithmetic (whole-stage codegen) — this is the sampling primitive:
    a deterministic per-row coin that never changes under task retry,
    repartitioning, or engine swap, unlike ``rand()``."""
    k = (F.col(key) if isinstance(key, str) else key).cast("long")
    s = (F.lit(salt) if isinstance(salt, int) else salt).cast("long")
    g = (k % F.lit(_P_HASH)) * F.lit(31) + s * F.lit(_TOPIC_MIX) + F.lit(seed)
    g = g % F.lit(_M - 1) + F.lit(1)
    return _minstd2(g).cast("double") / F.lit(float(_M))


def int_uniform_np(keys, salt: int, seed: int = 0):
    """Pseudo-uniform in (0,1) from non-negative int64 keys + an int salt —
    the integer-keyed twin of :func:`unit_uniform` (same MINSTD mixing, no
    string fold). Pure numpy int64 arithmetic: independent of CPython's
    hash(), PYTHONHASHSEED, and platform. All intermediates fit int64:
    key%P ≤ 1e9+6, *31 + salt*TOPIC_MIX stays ≪ 2^63; each MINSTD step is
    < 2^31 * 48271 < 2^47."""
    import numpy as np

    k = np.asarray(keys, dtype=np.int64)
    g = (k % _P_HASH) * 31 + np.int64(salt) * _TOPIC_MIX + np.int64(seed)
    g = g % (_M - 1) + 1
    g = (g * _A) % _M
    g = (g * _A) % _M
    return g.astype(np.float64) / float(_M)


def int_uniform_sql(key_expr: str, salt_expr: str, seed: int = 0) -> str:
    """DuckDB-SQL replica of :func:`int_uniform_np` (value-identical)."""
    return (
        f"((CAST({key_expr} AS BIGINT) % {_P_HASH} * 31 "
        f"+ CAST({salt_expr} AS BIGINT) * {_TOPIC_MIX} + {seed}) % {_M - 1} + 1) "
        f"* {_A} % {_M} * {_A} % {_M} / {float(_M)}"
    )
