"""Pin the bit-stream equivalences reference_random_vector's fast path
relies on (model/init.py): a shared re-seeded RandomState and one
vectorized randint call must reproduce the scalar per-construction
formulation of helpers.cc:79-135 exactly."""

from __future__ import annotations

import numpy as np

from bigartm_spark.model.init import (
    reference_random_vector,
    reference_token_hash,
)


def _scalar_reference(size, h, guaranteed_zeros_rate=0.0):
    # the original (pre-optimization) formulation, kept as the spec
    rs = np.random.RandomState(h & 0xFFFFFFFF)
    div = np.float32(0xFFFFFFFF)

    def draw():
        return np.float32(rs.randint(0, 2**32, dtype=np.uint32)) / div

    out = np.empty(size, dtype=np.float32)
    if guaranteed_zeros_rate > 1e-37:
        for i in range(size):
            out[i] = draw() if draw() > guaranteed_zeros_rate else np.float32(0)
    else:
        for i in range(size):
            out[i] = draw()
    s = np.float32(0.0)
    for i in range(size):
        s = np.float32(s + out[i])
    if s > 0:
        out = (out / s).astype(np.float32)
    return out


def test_fast_path_bit_equals_scalar_spec():
    for cls, tok in [
        ("@default_class", "A"),
        ("@default_class", "token_123"),
        ("@labels", "positive"),
        ("@default_class", ""),
    ]:
        for seed in (0, 1, 99):
            h = reference_token_hash(cls, tok, seed)
            for size in (1, 3, 10, 50):
                got = reference_random_vector(size, h)
                want = _scalar_reference(size, h)
                assert (got == want).all(), (cls, tok, seed, size)


def test_sparse_path_bit_equals_scalar_spec():
    h = reference_token_hash("@default_class", "sparse_tok", 0)
    got = reference_random_vector(10, h, guaranteed_zeros_rate=0.5)
    want = _scalar_reference(10, h, guaranteed_zeros_rate=0.5)
    assert (got == want).all()
    assert (got == 0).any()  # the zero gate actually fired at rate 0.5


def test_matrix_path_bit_equals_scalar_spec():
    from bigartm_spark.model.init import reference_random_matrix

    pairs = [
        ("@default_class", f"tok_{i}") for i in range(37)
    ] + [("@labels", "positive"), ("@default_class", "")]
    for size in (1, 5, 50):
        hashes = [reference_token_hash(c, t, 42) for c, t in pairs]
        mat = reference_random_matrix(size, hashes)
        assert mat.shape == (len(pairs), size)
        assert mat.dtype == np.float64
        for i, h in enumerate(hashes):
            want = _scalar_reference(size, h).astype("float64")
            assert (mat[i] == want).all(), (i, size)
    assert reference_random_matrix(7, []).shape == (0, 7)


def test_normalize_local_parity_with_mstep_normalize(spark):
    """normalize_local is the shared driver twin of mstep.normalize —
    B8 clamp + per-class totals + divide must match the distributed op
    bit-for-bit-ish (float addition order differs; 1e-12 tolerance)."""
    from bigartm_spark.model.mstep import normalize, normalize_local
    from bigartm_spark.model.phi import PhiMatrix

    rng = np.random.default_rng(3)
    rows = []
    cls_np, mats = [], []
    for i in range(40):
        c = "@default_class" if i % 3 else "@labels"
        v = (rng.random(4) - 0.3).tolist()  # negatives exercise the clamp
        rows.append((c, f"t{i}", v))
        cls_np.append(c)
        mats.append(v)
    # one all-negative class: totals <= 0 -> all zeros
    rows.append(("@dead", "d0", [-1.0, -2.0, 0.0, -0.5]))
    cls_np.append("@dead")
    mats.append([-1.0, -2.0, 0.0, -0.5])
    topics = [f"topic_{t}" for t in range(4)]
    nwt = PhiMatrix(
        "nwt",
        topics,
        spark.createDataFrame(
            rows, "class_id string, token string, values array<double>"
        ),
    )
    dist = {
        (r["class_id"], r["token"]): list(r["values"])
        for r in normalize(nwt).compact.collect()
    }
    local = normalize_local(np.array(cls_np), np.array(mats))
    for (c, t, _), lv in zip(rows, local):
        np.testing.assert_allclose(dist[(c, t)], lv, rtol=0, atol=1e-12)
    assert all(v == 0.0 for v in dist[("@dead", "d0")])


def test_calls_are_stateless_despite_shared_rng():
    h1 = reference_token_hash("@default_class", "x", 0)
    h2 = reference_token_hash("@default_class", "y", 0)
    a1 = reference_random_vector(10, h1)
    _ = reference_random_vector(10, h2)
    a2 = reference_random_vector(10, h1)  # re-seeding makes it pure
    assert (a1 == a2).all()


def test_vectorized_mt19937_bit_equals_randomstate():
    """r8 optimization: _mt19937_first_outputs vectorizes the per-token
    seed+draw across the whole vocabulary. Pin raw uint32 parity with
    RandomState at the size boundary (227 = last vectorizable width,
    no in-twist state dependency) and on edge seeds, and pin that
    reference_random_matrix produces identical rows on both sides of
    the vectorize/loop switch."""
    from bigartm_spark.model.init import (
        _mt19937_first_outputs,
        reference_random_matrix,
    )

    rng = np.random.RandomState(7)
    seeds = np.concatenate(
        [
            rng.randint(0, 2**32, size=64, dtype=np.uint32),
            np.array(
                [0, 1, 5489, 0x7FFFFFFF, 0x80000000, 0xFFFFFFFF],
                dtype=np.uint32,
            ),
        ]
    )
    for size in (1, 10, 227):
        got = _mt19937_first_outputs(seeds, size)
        rs = np.random.RandomState(0)
        for i, s in enumerate(seeds):
            rs.seed(int(s))
            want = rs.randint(0, 2**32, size=size, dtype=np.uint32)
            assert (got[i] == want).all(), (i, int(s), size)
    # the loop fallback (size > 227) still matches the scalar spec, so
    # both sides of the vectorize/loop switch share one ground truth
    # (the vectorized side is pinned against the same spec in
    # test_matrix_path_bit_equals_scalar_spec)
    hashes = [int(s) for s in seeds]
    wide = reference_random_matrix(228, hashes[:4])  # loop fallback
    assert wide.shape == (4, 228)
    for i, h in enumerate(hashes[:4]):
        want = _scalar_reference(228, h).astype("float64")
        assert (wide[i] == want).all(), i
