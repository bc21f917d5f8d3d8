"""SparkSession factory with the engine's required configs."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "atlas-spark", cpus: int | None = None) -> SparkSession:
    # must precede JVM launch: TWS python workers inherit the JVM env
    # (util/pbruntime.py docstring) — harmless no-op if already probed
    from .util.pbruntime import ensure_protobuf_runtime

    ensure_protobuf_runtime()
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    master = f"local[{cpus}]" if cpus else "local[*]"
    # scale-adaptive initial shuffle width: never below the local-bench
    # floor of 32 (AQE coalesces smaller shuffles back down), and never
    # below the executor slot count on a bigger deployment — a constant
    # tuned for local[32] would serialize shuffles on a real cluster
    # (guide §2.2); explicit conf/spark-submit overrides still win
    shuffle_parts = max(32, cpus or (os.cpu_count() or 32))
    builder = (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        # driver testdata events.parquet uses TIMESTAMP(NANOS); read as long
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # skewed band-bucket joins (LSH candidates) and hot series keys
        # split at runtime instead of stalling one task
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.ui.enabled", "false")
        # debug-mode call-site capture wraps EVERY DataFrame API call in
        # 4-5 py4j round-trips (getActiveSession + origin set/clear);
        # disabling it cut a 10-query build sweep 7.3 s -> 5.5 s (r16
        # A/B) at the cost of Python call-site lines in error messages
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def configure_existing(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable configs to a session we didn't create (the
    driver passes its own session to `__spark_entry__.entry`).

    Idempotent per session object: every source factory and operator
    calls this defensively, and each conf.set is a py4j round trip
    (~0.4 ms x 7 confs x ~40 call sites per sweep), so after the first
    application it is a no-op flag check."""
    if getattr(spark, "_atlas_configured", False):
        return spark
    spark._atlas_configured = True
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # scale-adaptive shuffle width (see get_spark): local-bench floor of
    # 32, never below the session's slot count on bigger deployments;
    # AQE coalesces further at runtime
    try:
        slots = spark.sparkContext.defaultParallelism
    except Exception:
        slots = 32
    spark.conf.set("spark.sql.shuffle.partitions", str(max(32, slots)))
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    except Exception:
        pass
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # static conf on some builds; events reads will fail loudly
    try:
        # build-latency: disable per-call debug call-site capture (see
        # get_spark).  The pyspark module caches the flag at the FIRST
        # wrapped DataFrame call, so this only helps when
        # configure_existing runs before the session's first DataFrame
        # op — true for the driver contract (entry/queries call it
        # first thing) — and is harmless otherwise.
        spark.conf.set("spark.python.sql.dataFrameDebugging.enabled", "false")
    except Exception:
        pass
    return spark
