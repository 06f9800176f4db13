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


def test_calls_are_stateless_despite_shared_rng():
    h1 = reference_token_hash("@default_class", "x", 0)
    h2 = reference_token_hash("@default_class", "y", 0)
    a1 = reference_random_vector(10, h1)
    _ = reference_random_vector(10, h2)
    a2 = reference_random_vector(10, h1)  # re-seeding makes it pure
    assert (a1 == a2).all()
