"""Per-stage monitor counters (reference ``internal/monitor/monitor.go:19-42``:
the /monitor endpoint exposes per-stage message totals and msg/sec rates).

Batch restatement: ``stage_counts`` is the hash-checkable totals table —
rows seen at every pipeline stage plus the discard audit, so the
conservation identity ``concat = parsed + discarded`` is checkable in ONE
query result (composing with ``operators/audit.py``).  ``stage_metrics``
adds wall-clock rates (the msg/sec part — runtime-dependent, so it feeds
the CLI/monitoring table, not the correctness gate).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from go_fluentd_spark.config import DEFAULT_CONFIG, PipelineConfig
from go_fluentd_spark.operators.audit import discard_reasons
from go_fluentd_spark.plans import pipeline as P

#: stage name -> frame builder, in pipeline order (monitor.go tracks the same
#: boundaries: recv -> concator -> acceptor -> tagfilter -> producer)
STAGES = [
    ("ingest", P.ingested),
    ("concat", P.concatted),
    ("accepted", P.accepted),
    ("parsed", P.parsed),
    ("routed", P.routed),
]


def stage_counts(
    spark: SparkSession, sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """(stage, n) totals per pipeline stage + the discard audit.  ``routed``
    counts deliveries (rows x matching sinks), mirroring the reference's
    producer counter which increments per send."""
    parts = [
        df_fn(spark, sf_dir, cfg).agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(name).alias("stage"), "n"
        )
        for name, df_fn in STAGES
    ]
    discarded = (
        discard_reasons(P.concatted(spark, sf_dir, cfg), cfg)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("discarded").alias("stage"), "n")
    )
    out = parts[0]
    for p in parts[1:] + [discarded]:
        out = out.unionByName(p)
    return out


def stage_metrics(
    spark: SparkSession, sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG
) -> list[dict]:
    """Counts + wall seconds + rows/sec per stage (the /monitor msg-per-sec
    analogue).  Each stage is timed as its own action — runtime numbers, not
    part of the oracle gate."""
    out: list[dict] = []
    for name, df_fn in STAGES:
        t0 = time.perf_counter()
        n = df_fn(spark, sf_dir, cfg).count()
        dt = time.perf_counter() - t0
        out.append(
            {
                "stage": name,
                "n": n,
                "sec": round(dt, 3),
                "rows_per_sec": round(n / dt, 1) if dt else None,
            }
        )
    return out
