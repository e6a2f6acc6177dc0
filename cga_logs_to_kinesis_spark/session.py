"""SparkSession construction and scale-oriented defaults.

The engine never *requires* its own session — every public API takes a
``SparkSession`` argument so it composes with a driver-owned session —
but ``get_session`` builds one with the configs we want for local runs,
and ``tune_session`` applies the runtime-settable subset to a session we
didn't create (e.g. the correctness driver's).

Every value below is sized for local[32] at sf<=0.1; the mapping from
each knob to its ~1000-executor / 100 TB value — and which operator
forced it — is documented in ``docs/cluster_profile.md``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied to any session the engine touches.
# Keys chosen for 100 TB behavior, values sized for local[32] testing:
#   - AQE on: runtime shuffle-partition coalescing + skew-join splitting
#     replaces hand-tuned partition counts when data sizes move 1000x.
#   - nanosAsLong: some fixture generations ship `events.ts` as parquet
#     TIMESTAMP(NANOS), which the vectorized reader rejects; with this
#     on it reads as int64 ns.  Current fixtures are timestamp[us];
#     sources/tables.py branches on the scanned dtype either way.
#   - Arrow on: every toPandas()/pandas_udf boundary is Arrow-batched.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Fixture timestamps are naive; render them as UTC so formatted
    # output matches engines (DuckDB) that treat them as wall-clock.
    "spark.sql.session.timeZone": "UTC",
    # Keep implicit broadcast behavior predictable; operators that want a
    # broadcast say so explicitly with F.broadcast().
    "spark.sql.autoBroadcastJoinThreshold": str(32 * 1024 * 1024),
}

# Session-creation-time confs (cannot be changed after the JVM starts).
BUILD_CONFS: dict[str, str] = {
    # Sized for local[32] at sf<=0.1; a real cluster overrides via
    # spark-submit.  AQE coalesces down from this at runtime.
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
}


# One knob for every repartition() placed ahead of a row-amplifying
# stage (shingle/band explodes in dedup, token explodes in text).
# Unset → the session's defaultParallelism, which is right for
# local[N]; on a cluster, set it to ~2-3x total executor cores (or rely
# on AQE to coalesce afterwards) via --conf at submit time.
EXPLODE_PARALLELISM_CONF = "spark.cga.explode.parallelism"


def explode_parallelism(spark: SparkSession) -> int:
    """Partition width to spread rows across before explode-amplified
    stages (a single-file parquet scan is 1 partition otherwise)."""
    v = spark.conf.get(EXPLODE_PARALLELISM_CONF, None)
    if v:
        return int(v)
    return spark.sparkContext.defaultParallelism


def widen_for_explode(df, *keys: str):
    """Repartition ONLY when the input arrives narrower than the
    explode-parallelism knob.

    The repartition ahead of a shingle/token explode is a
    fixture-scale parallelism crutch: a small parquet file scans as
    one partition, which would pin the whole md5/tokenize fan-out to
    a single task.  A 100 TB scan's natural partitioning is already
    wide, and hashing the entire corpus through an extra exchange
    just to tokenize would be a pure waste — so the exchange is gated
    on the input's actual width (plan-pinned by
    tests/test_plans.py::test_wide_input_fronts_skip_repartition).
    """
    par = explode_parallelism(df.sparkSession)
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par, *keys) if keys else df.repartition(par)


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable inside executor Python workers.

    A driver-owned session (the correctness harness, a notebook) may
    run with a cwd where `cga_logs_to_kinesis_spark` isn't on the
    workers' path; pandas-UDF closures then fail to unpickle.  Zipping
    the package once and `addPyFile`-ing it ships it with every task.
    """
    if getattr(spark, "_cga_pkg_shipped", False):
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    parent = os.path.dirname(pkg_dir)
    zpath = os.path.join(
        tempfile.gettempdir(),
        f"cga_logs_to_kinesis_spark_{os.getpid()}.zip")
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        z.write(full, os.path.relpath(full, parent))
    try:
        spark.sparkContext.addPyFile(zpath)
    except Exception:
        pass  # e.g. Spark Connect without SparkContext access
    spark._cga_pkg_shipped = True


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an existing session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf removed/renamed in a future Spark: never fatal
    _ship_package(spark)
    return spark


def get_session(app_name: str = "cga-logs-to-kinesis-spark",
                master: str | None = None) -> SparkSession:
    """Build (or fetch) a session with engine defaults applied."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]")
    for k, v in {**BUILD_CONFS, **RUNTIME_CONFS}.items():
        builder = builder.config(k, v)
    return tune_session(builder.getOrCreate())
