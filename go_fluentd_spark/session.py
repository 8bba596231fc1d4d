"""SparkSession builders.

Local mode is the test harness; the configs are chosen so the same code runs
unchanged on a multi-executor cluster (``spark-submit --py-files``): AQE on
(runtime skew-join + partition coalescing), shuffle partitions sized to the
parallelism level, Arrow enabled for the pandas-UDF slow path, UTC session
time zone so the time-normalization operator (reference
``internal/tagfilters/parser_f.go:121-168``) is deterministic.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_spark(
    app_name: str = "go_fluentd_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a local[N] session. ``cores`` defaults to $SPARK_GRAFT_CPUS or 32.

    On a real cluster the same conf block applies minus ``master``;
    ``spark.sql.shuffle.partitions`` should then be ~2-3x total cores (AQE
    coalesces down), and executors get the memory knobs instead of the driver.
    """
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # GC: measured both ways on the e2e pipeline (BENCH.md) — ParallelGC
        # is ~22% faster at full-box 32 threads but ~30% SLOWER on a pinned
        # 8-core budget; G1 (the JVM default) wins at executor-realistic core
        # counts, so no override here.  Pass it via extra_conf to experiment.
    )
    extra_conf = dict(extra_conf or {})
    # Bigger thread stacks for the driver JVM (inert unless this call
    # actually launches the JVM): Spark's own
    # StreamExecution.isInterruptionException classifies a caught stream
    # error by running a regex over its MESSAGE, and java.util.regex
    # recursion is linear in message length — a long py4j traceback blows
    # the default 1 MiB stream-execution-thread stack (StackOverflowError,
    # observed 3x here; the drain protocol's cooperative stop removes the
    # common trigger, this guards the rest).  Virtual memory only.
    extra_conf.setdefault("spark.driver.extraJavaOptions", "-Xss16m")
    for k, v in extra_conf.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_session_defaults(spark: SparkSession) -> SparkSession:
    """Pin the runtime-settable confs our operators depend on.

    The driver runs ``queries()`` under its own session; time formatting and
    Arrow behavior must not depend on how that session was built.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    return spark
