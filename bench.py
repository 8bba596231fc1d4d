"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...},
 "sf": ..., "rows": ..., "seq_per_sec": ...}

Env knobs:
  SPARK_GRAFT_SF_DIR   input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] (default 32)
  SPARK_GRAFT_SEQ_REP  source replication factor (default 4 -> 600k rows at
                       sf0.1; correctness paths always use rep=1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from go_fluentd_spark.config import DEFAULT_CONFIG
from go_fluentd_spark.operators.acceptor import acceptor_chain
from go_fluentd_spark.operators.concat import concat_sessions
from go_fluentd_spark.operators.dispatcher import route_counts
from go_fluentd_spark.operators.enrich import add_fields, es_index, msgid
from go_fluentd_spark.operators.parser import parse
from go_fluentd_spark.operators.postfilter import post_default
from go_fluentd_spark.plans.pipeline import POST_STRING_COLS
from go_fluentd_spark.session import build_spark
from go_fluentd_spark.sources.synth import sequences_df, with_ingest_columns


def _noop_sink(df) -> int:
    """Force full materialization of every column (write-like work) without
    touching disk: fold all columns through a hash and aggregate."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    # map columns are not hashable in Spark (order-unstable); fold them as keys
    cols = [
        F.map_keys(f.name) if isinstance(f.dataType, T.MapType) else F.col(f.name)
        for f in df.schema.fields
        if not f.name.startswith("_")
    ]
    return (
        df.select((F.xxhash64(*cols) % 1000000007).alias("h"))
        .agg(F.sum("h"))
        .collect()[0][0]
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rep = int(os.environ.get("SPARK_GRAFT_SEQ_REP", "4"))
    extra = {}
    if os.path.isdir("/dev/shm"):
        os.makedirs("/dev/shm/spark-tmp", exist_ok=True)
        extra["spark.local.dir"] = "/dev/shm/spark-tmp"  # shuffle off the data disk
    spark = build_spark("bench", cores=cores, extra_conf=extra)

    def seq():
        return with_ingest_columns(sequences_df(spark, sf_dir, rep=rep))

    n_rows = seq().count()  # warms the JVM + file listing; not timed below

    def full_pipeline():
        df = concat_sessions(seq(), max_len=DEFAULT_CONFIG.concat_max_len)
        df = acceptor_chain(df, DEFAULT_CONFIG)
        df = parse(df, DEFAULT_CONFIG)
        df = add_fields(spark, df, DEFAULT_CONFIG)
        df = post_default(df, DEFAULT_CONFIG, msg_cols=POST_STRING_COLS)
        df = es_index(spark, df, DEFAULT_CONFIG)
        return msgid(df, DEFAULT_CONFIG)

    timings: dict[str, float] = {}

    def timed(name, fn):
        best = None
        for _ in range(2):  # best-of-2: single-JVM GC variance is real
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)

    timed("ingest_scan", lambda: _noop_sink(seq()))
    timed("concat_sessions", lambda: concat_sessions(seq()).count())
    timed(
        "parse_native",
        lambda: parse(
            acceptor_chain(concat_sessions(seq()), DEFAULT_CONFIG), DEFAULT_CONFIG, impl="native"
        ).count(),
    )
    timed(
        "parse_pandas",
        lambda: parse(
            acceptor_chain(concat_sessions(seq()), DEFAULT_CONFIG), DEFAULT_CONFIG, impl="pandas"
        ).count(),
    )
    timed("pipeline_sink_counts", lambda: route_counts(spark, full_pipeline(), DEFAULT_CONFIG).collect())
    timed("pipeline_routed_materialize", lambda: _noop_sink(full_pipeline()))

    total = round(sum(timings.values()), 3)
    e2e = timings["pipeline_routed_materialize"]
    print(
        json.dumps(
            {
                "metric": "total wall sec of headline queries (parse→enrich→route→aggregate over tokenized sequences)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir.rstrip("/").split("sf")[-1],
                "rows": n_rows,
                "cores": cores,
                "rep": rep,
                "seq_per_sec": round(n_rows / e2e, 1) if e2e else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
