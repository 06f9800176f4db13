"""Gate-replica: the driver's correctness gate runs under a DEFAULT-config
SparkSession (Arrow OFF — the PySpark default), where createDataFrame takes
the strict `_createFromLocal` verifier path that rejects numpy scalars
(round-7 regression: LocalPhiMatrix.compact shipped numpy.float64 into the
values column and d6f1/d2g5 ERR'd in the gate while the repo's Arrow-on
harness measured 50/50).

These tests run the exact failing surfaces under an Arrow-off session so
session-portability bugs are caught in-round, not by the driver.
"""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def plain_spark(spark):
    """A session sharing the JVM but with DEFAULT SQL conf for the knobs
    that change createDataFrame semantics — most importantly Arrow OFF,
    which flips local materialization onto the strict type verifier."""
    s = spark.newSession()
    s.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
    # keep the nanos shim: without it the sf parquet events table is
    # unreadable in ANY session; the gate's session evidently has it too
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    yield s


def test_local_phi_compact_materializes_arrow_off(plain_spark):
    from bigartm_spark.model.phi import LocalPhiMatrix

    rng = np.random.default_rng(7)
    mat = rng.random((13, 4))  # numpy.float64 cells
    cls_np = np.array(["@default_class"] * 13)
    tok_np = np.array([f"tok{i}" for i in range(13)])
    phi = LocalPhiMatrix(
        "pwt", [f"topic_{t}" for t in range(4)], plain_spark, cls_np, tok_np, mat
    )
    pdf = phi.compact.toPandas()
    assert len(pdf) == 13
    got = np.array(sorted(pdf["values"].tolist(), key=lambda v: v[0]))
    want = np.array(sorted(mat.tolist(), key=lambda v: v[0]))
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_broadcast_regime_fit_readout_arrow_off(plain_spark, sf_dir):
    """One broadcast-regime fit_offline pass + every driver-side readout
    that round 7 broke (get_phi path, compact relation, merge) under the
    plain session."""
    import __spark_entry__ as entry

    qs = entry.queries()
    for name in ("d2g5_estep_mstep_pass", "d6f1_merge_models"):
        out = qs[name](plain_spark, sf_dir).limit(5).collect()
        assert len(out) > 0, name


def test_all_driver_queries_arrow_off_smoke(plain_spark, sf_dir):
    """Every gate query must at least PLAN and yield one row under the
    plain session (values are hash-checked elsewhere; this pins the
    session-portability class)."""
    import __spark_entry__ as entry

    qs = entry.queries()
    failures = []
    for name, fn in qs.items():
        try:
            fn(plain_spark, sf_dir).limit(1).collect()
        except Exception as e:  # noqa: BLE001 - collecting all failures
            failures.append(f"{name}: {type(e).__name__}: {str(e)[:160]}")
    assert not failures, "\n".join(failures)
