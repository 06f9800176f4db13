"""SparkSession factory tuned for the engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]``; the same settings are
what we would ship on a multi-executor cluster (AQE, Arrow, sensible
shuffle parallelism). Nothing here is local-mode-specific except the
master URL default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


_SHIPPED: set[str] = set()


def ensure_package_shipped(spark) -> None:
    """Make `bigartm_spark` importable on Python workers for sessions we
    did not create (e.g. the driver's own SparkSession): zip the package
    and addPyFile it. Idempotent per application."""
    sc = spark.sparkContext
    app = sc.applicationId
    if app in _SHIPPED:
        return
    import tempfile
    import zipfile

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # mkstemp: unique 0600 path owned by this process — never trust (or
    # let another local user pre-create) a predictable /tmp name, and
    # never ship a stale zip from an older code state
    fd, zpath = tempfile.mkstemp(prefix="bigartm_spark_pkg_", suffix=".zip")
    with os.fdopen(fd, "wb") as fh:
        with zipfile.ZipFile(fh, "w") as z:
            base = os.path.join(repo_root, "bigartm_spark")
            for root, _, files in os.walk(base):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        z.write(full, os.path.relpath(full, repo_root))
    try:
        sc.addPyFile(zpath)
    except Exception:
        pass  # already added by a previous session against this context
    _SHIPPED.add(app)


def get_spark(
    app_name: str = "bigartm_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    # Python workers (and cluster executors) must be able to import this
    # package — the EM kernel is pickled by reference. Local mode: workers
    # inherit the driver env; cluster mode: spark.executorEnv + addPyFile
    # (callers deploying to a real cluster should also ship a wheel).
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{pkg_root}{os.pathsep}{pp}" if pp else pkg_root

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(int(cpus), 8)
        except ValueError:
            shuffle_partitions = 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # AQE: runtime coalescing of shuffle partitions, skew-join splitting,
        # and dynamic broadcast conversion — the scale-out safety net.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for every pandas_udf / applyInPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # Phi/dictionary tables are small relative to docs; let Catalyst
        # broadcast aggressively (64 MB threshold).
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
        # the driver testdata's events.ts is TIMESTAMP(NANOS), which the
        # vectorized parquet reader rejects; read as long nanos and let
        # corpus helpers convert (DuckDB truncates ns->us the same way)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


# ------------------------------------------------------- small-input path
# A sub-second query on a tiny input pays the full 32-task scheduling +
# shuffle machinery for nothing: coalescing the scan to 1-2 partitions
# turns the aggregation into a (near-)single-stage plan (a groupBy over
# a SinglePartition child needs NO exchange at all). The gate is the
# Catalyst size ESTIMATE (file footer sizes for scans, accurate bytes
# for cached relations) — never a count action, so the gate itself is
# free and the scale path is untouched above the threshold.
SMALL_INPUT_MAX_BYTES = 64 << 20  # tiny even for one executor


def estimated_plan_bytes(df) -> int | None:
    """Catalyst's sizeInBytes estimate for the plan (driver-side, no
    job). None when the estimate is unavailable or unparseable."""
    try:
        sz = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return None
    # Catalyst returns Long.MaxValue-ish sentinels for "unknown"
    return sz if 0 <= sz < (1 << 60) else None


# A file-source sizeInBytes is COMPRESSED on-disk bytes; dictionary/RLE
# parquet packs small rows well under their in-memory width, so a
# row-count derived from it UNDERcounts. Callers sizing per-task work
# from an estimate multiply file-scan estimates by this factor so the
# derived row count errs high (more buckets/splits, never fewer) while
# in-memory relations — whose stats are accurate — stay untouched.
FILE_SCAN_EST_EXPANSION = 4


def plan_reads_files(df) -> bool:
    """True when any leaf of the optimized logical plan is a file/table
    scan (LogicalRelation, DataSourceV2, Hive) — i.e. the plan's
    sizeInBytes is on-disk (compressed) bytes. Cached (InMemoryRelation)
    and driver-local (LocalRelation) leaves report in-memory bytes and
    return False. Unknown/unreachable plans return True (assume the
    less-trusting case)."""
    _MEMORY_LEAVES = {"InMemoryRelation", "LocalRelation", "OneRowRelation"}
    try:
        leaves = df._jdf.queryExecution().optimizedPlan().collectLeaves()
        return any(
            leaves.apply(i).getClass().getSimpleName() not in _MEMORY_LEAVES
            for i in range(leaves.size())
        )
    except Exception:
        return True


def coalesce_if_small(
    df, target: int = 2, max_bytes: int = SMALL_INPUT_MAX_BYTES
):
    """Small-input fast path: coalesce to ``target`` partitions when the
    plan's size estimate is under ``max_bytes``; unchanged otherwise
    (including when no estimate exists — unknown means assume big)."""
    sz = estimated_plan_bytes(df)
    if sz is not None and sz <= max_bytes:
        return df.coalesce(target)
    return df
