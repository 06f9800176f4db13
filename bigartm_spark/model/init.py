"""G1 InitializeModel — deterministic seeded Phi from a dictionary.

Reference: /root/reference/src/artm/core/master_component.cc:587-705
(per-token hash-seeded uniforms, row-normalized); sparse init ranks tokens
by tf and zeroes a share of low-rank rows (E5, master_component.cc:662-697).

We use the portable mod-prime generator (functions/hashing.py) instead of
boost::mt19937 so the DuckDB oracle reproduces values exactly; this is a
documented divergence from bit-parity with the C++ RNG. Never rand():
non-deterministic across task retries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bigartm_spark.functions.hashing import (
    base_hash,
    uniform_from_base,
    unit_uniform,
)
from bigartm_spark.model.phi import PhiMatrix


def initialize_phi(
    dictionary: DataFrame,
    topics: list[str],
    seed: int = 0,
    name: str = "pwt",
    dense_init_rate: float = 1.0,
    guaranteed_zeros_rate: float = 0.0,
) -> PhiMatrix:
    """Row of uniforms per token, normalized over topics (columns follow
    ``topics`` order). Optional sparse init: tokens below the top
    ``dense_init_rate`` share by tf get ``guaranteed_zeros_rate`` of their
    cells zeroed (zero iff u_zero <= rate, mirroring helpers.cc:87-94)."""
    n = len(topics)
    hb = F.col("_hb")
    vals = F.array(*[uniform_from_base(hb, i, seed=seed) for i in range(n)])
    df = (
        dictionary.select("class_id", "token", "tf")
        .withColumn("_hb", base_hash("class_id", "token"))
        .withColumn("_v", vals)
        .drop("_hb")
    )
    if dense_init_rate < 1.0 and guaranteed_zeros_rate > 0.0:
        w = Window.partitionBy("class_id").orderBy(F.desc("tf"), F.asc("token"))
        zero_gate = F.array(
            *[
                unit_uniform("class_id", "token", i + n, seed=seed + 1)
                for i in range(n)
            ]
        )
        df = (
            df.withColumn("_pr", F.percent_rank().over(w))
            .withColumn(
                "_v",
                F.when(
                    F.col("_pr") <= F.lit(dense_init_rate), F.col("_v")
                ).otherwise(
                    F.zip_with(
                        F.col("_v"),
                        zero_gate,
                        lambda v, g: F.when(
                            g <= F.lit(guaranteed_zeros_rate), F.lit(0.0)
                        ).otherwise(v),
                    )
                ),
            )
            .drop("_pr")
        )
    # per-token row of uniforms normalized to sum 1 = the seeded n_wt row
    # (helpers.cc:101-107) ...
    norm = F.aggregate(F.col("_v"), F.lit(0.0), lambda a, x: a + x)
    compact = df.select(
        "class_id",
        "token",
        F.when(
            norm > 0, F.transform(F.col("_v"), lambda x: x / norm)
        )
        .otherwise(F.col("_v"))
        .alias("values"),
    )
    nwt = PhiMatrix(name=name, topics=list(topics), compact=compact)
    # ... then p_wt = column-normalize over tokens per topic (D5), exactly
    # as InitializeModel ends with a Normalize (master_component.cc:699-704)
    from bigartm_spark.model.mstep import normalize

    return normalize(nwt, None, name=name)


# ---------------------------------------------------------------------------
# Bit-exact replica of the reference's seeded init (helpers.cc:79-135):
# Java-style 31*h+c rolling hash over (class_id, keyword, seed) in wrapping
# uint64 -> mt19937 seeded with the low 32 bits -> uniform_real<float>
# draws (float(u32)/float(2^32-1), verified bit-identical against
# std::mt19937 ground truth) -> row normalized by the float32 sum.
# ---------------------------------------------------------------------------
_U64 = (1 << 64) - 1


def reference_token_hash(class_id: str, keyword: str, seed: int = 0) -> int:
    h = 1125899906842597
    if class_id != "@default_class":
        for c in class_id:
            h = (31 * h + ord(c)) & _U64
    h = (31 * h + 255) & _U64
    for c in keyword:
        h = (31 * h + ord(c)) & _U64
    if seed > 0:
        h = (31 * h + seed) & _U64
    return h


_REF_RS = None  # per-process shared RandomState, re-seeded per token


def reference_random_vector(
    size: int, h: int, guaranteed_zeros_rate: float = 0.0
):
    """float32 vector exactly as GenerateRandomVector(size, seed=h).

    Runs once per vocabulary row, so the per-token constant matters:
    a shared RandomState re-seeded with rs.seed(h) replaces per-token
    construction (bit-identical stream, ~70x cheaper — RandomState
    construction alone was 147us/token), and the dense path draws all
    ``size`` uint32s in ONE vectorized randint call (same underlying
    mt19937 stream as per-element draws; both equivalences pinned in
    test_init). Safe to share: every call re-seeds before drawing, and
    Spark Python workers are single-threaded per task. The float32 SUM
    uses np.add.accumulate — ufunc accumulate is sequential by
    definition (every prefix is produced), so it rounds exactly like
    the reference's left-to-right float32 adds, unlike np.sum's
    pairwise accumulation (parity pinned in test_init)."""
    import numpy as np

    global _REF_RS
    if _REF_RS is None:
        _REF_RS = np.random.RandomState(0)
    rs = _REF_RS
    rs.seed(h & 0xFFFFFFFF)
    div = np.float32(0xFFFFFFFF)

    if guaranteed_zeros_rate > 1e-37:
        # sparse init draws TWO uint32s per kept cell conditionally —
        # the stream interleaving forces the scalar formulation
        def draw():
            return np.float32(rs.randint(0, 2**32, dtype=np.uint32)) / div

        out = np.empty(size, dtype=np.float32)
        for i in range(size):
            out[i] = draw() if draw() > guaranteed_zeros_rate else np.float32(0)
    else:
        out = (
            rs.randint(0, 2**32, size=size, dtype=np.uint32).astype(
                np.float32
            )
            / div
        )
    s = np.add.accumulate(out)[-1] if size else np.float32(0.0)
    if s > 0:
        out = (out / s).astype(np.float32)
    return out


def _mt19937_first_outputs(seeds, size: int):
    """First ``size`` genrand_int32 outputs for each 32-bit seed,
    VECTORIZED ACROSS SEEDS — bit-identical to
    ``RandomState(s).randint(0, 2**32, size, dtype=uint32)`` (which is
    init_genrand seeding + first-twist + temper with no rejection step
    for the full 2^32 range).

    Valid only for size <= 227: the twist for output i consumes state
    words (i, i+1, i+397), all still holding their *seeded* values while
    i+397 < 624 — no in-twist dependency to serialize on. The seeding
    recurrence itself is sequential in the 624 state words but each step
    is one numpy op over ALL seeds, so a vocab-sized init is a few
    hundred small array ops instead of a per-token seed+draw loop
    (measured 267ms -> ~7ms for 20k tokens x 10 topics; parity pinned
    against the per-token RandomState path in test_init)."""
    import numpy as np

    mt = np.empty((size + 398, len(seeds)), dtype=np.uint32)
    mt[0] = seeds
    f = np.uint32(1812433253)  # Knuth init_genrand multiplier
    t30 = np.uint32(30)
    for i in range(1, size + 398):
        # in-place into the target row: the expression form allocates 3
        # temporaries per step and is ~7x slower over the 400-step chain
        prev, cur = mt[i - 1], mt[i]
        np.right_shift(prev, t30, out=cur)
        np.bitwise_xor(cur, prev, out=cur)
        np.multiply(cur, f, out=cur)
        np.add(cur, np.uint32(i), out=cur)
    upper, lower = np.uint32(0x80000000), np.uint32(0x7FFFFFFF)
    y = (mt[0:size] & upper) | (mt[1 : size + 1] & lower)
    mag = np.where(
        (y & np.uint32(1)).astype(bool), np.uint32(0x9908B0DF), np.uint32(0)
    )
    out = mt[397 : 397 + size] ^ (y >> np.uint32(1)) ^ mag
    out ^= out >> np.uint32(11)
    out ^= (out << np.uint32(7)) & np.uint32(0x9D2C5680)
    out ^= (out << np.uint32(15)) & np.uint32(0xEFC60000)
    out ^= out >> np.uint32(18)
    return out.T  # (n_seeds, size)


def reference_random_matrix(size: int, hashes) -> "np.ndarray":
    """Dense reference init rows for a whole vocabulary slice: one
    (len(hashes) x size) float64 matrix of GenerateRandomVector rows.
    The mt19937 re-seed per token is vectorized ACROSS tokens
    (_mt19937_first_outputs) for the T <= 227 case every real model hits;
    the per-token RandomState loop stays as the tall-row fallback. Row
    sums are one accumulate over the whole block — no per-element Python.
    Used by both the distributed mapInPandas generator and the
    broadcast-regime driver init (same bit goldens)."""
    import numpy as np

    k = len(hashes)
    if k == 0:
        return np.zeros((0, size))
    div = np.float32(0xFFFFFFFF)
    if size <= 227:
        seeds = np.array(
            [int(h) & 0xFFFFFFFF for h in hashes], dtype=np.uint64
        ).astype(np.uint32)
        block = _mt19937_first_outputs(seeds, size)
    else:
        global _REF_RS
        if _REF_RS is None:
            _REF_RS = np.random.RandomState(0)
        rs = _REF_RS
        block = np.empty((k, size), dtype=np.uint32)
        for i, h in enumerate(hashes):
            rs.seed(int(h) & 0xFFFFFFFF)
            block[i] = rs.randint(0, 2**32, size=size, dtype=np.uint32)
    out = (block.astype(np.float32) / div).astype(np.float32)
    # sequential float32 row sums (reference rounding), one ufunc call
    sums = np.add.accumulate(out, axis=1)[:, -1]
    pos = sums > 0
    out[pos] = (out[pos] / sums[pos, None]).astype(np.float32)
    return out.astype("float64")


def initialize_phi_reference(
    dictionary: DataFrame,
    topics: list[str],
    seed: int = 0,
    name: str = "pwt",
) -> PhiMatrix:
    """G1 with bit-parity to the reference RNG (the ARTM default, so
    ported scripts reproduce reference numbers; the portable generator
    stays for the DuckDB-replayable oracle plans).

    Tiny dictionaries coalesce before the mapInPandas stage (fewer
    Python-worker round trips; the re-seeded-RNG kernel is ~8x cheaper
    per token than the per-construction formulation, so a handful of
    partitions suffices). A driver-side generate+createDataFrame fast
    path was measured SLOWER than this on local[32] (1.48s vs 1.1s at
    20k tokens) and rejected — the distributed path also stays the
    right shape at real vocabulary scale."""
    import pandas as pd

    from bigartm_spark.session import coalesce_if_small, ensure_package_shipped

    n = len(topics)
    dictionary = coalesce_if_small(dictionary, target=8)
    ensure_package_shipped(dictionary.sparkSession)

    def gen(batches):
        for pdf in batches:
            hashes = [
                reference_token_hash(c, t, seed)
                for c, t in zip(pdf["class_id"], pdf["token"])
            ]
            mat = reference_random_matrix(n, hashes)
            yield pd.DataFrame(
                {
                    "class_id": pdf["class_id"],
                    "token": pdf["token"],
                    "values": list(mat),
                }
            )

    from bigartm_spark.schemas import phi_compact_schema

    compact = dictionary.select("class_id", "token").mapInPandas(
        gen, phi_compact_schema()
    )
    nwt = PhiMatrix(name=name, topics=list(topics), compact=compact)
    from bigartm_spark.model.mstep import normalize

    return normalize(nwt, None, name=name)
