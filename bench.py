"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...},
 "sf": ..., "rows": ..., "seq_per_sec": ...}

Env knobs:
  SPARK_GRAFT_SF_DIR   input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] (default 32)
  SPARK_GRAFT_SEQ_REP  source replication factor (default 4 -> 600k rows at
                       sf0.1; correctness paths always use rep=1)
  SPARK_GRAFT_SCALING  "0" disables the embedded pinned 2-vs-8-core scaling
                       pair (default on: the JSON line carries
                       "scaling_pairs" so round-over-round diffs are
                       mechanical; legs run AFTER the main session stops —
                       never two Spark jobs at once)
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

    # training-data operators (documents/embeddings tables at this sf)
    from go_fluentd_spark.operators import dataprep as DP

    timed("dataprep_minhash_lsh_pairs", lambda: DP.minhash_lsh_pairs(spark, sf_dir).count())
    timed("dataprep_dedup_clusters", lambda: DP.dedup_clusters(spark, sf_dir).count())
    timed("dataprep_embed_banded_pairs", lambda: DP.embed_banded_pairs(spark, sf_dir).count())
    timed("dataprep_winnow_fingerprints", lambda: _noop_sink(DP.winnow_fingerprints(spark, sf_dir)))
    timed("dataprep_token_ngram_dup", lambda: DP.token_ngram_dup_stats(spark, sf_dir).count())
    timed("dataprep_sequence_chunks", lambda: DP.sequence_chunks(spark, sf_dir).count())
    timed("dataprep_pii_scrub", lambda: DP.pii_scrub(spark, sf_dir).count())
    timed("dataprep_token_vocab_topk", lambda: DP.token_vocab_topk(spark, sf_dir).count())

    total = round(sum(timings.values()), 3)
    e2e = timings["pipeline_routed_materialize"]
    result = {
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
    spark.stop()

    if os.environ.get("SPARK_GRAFT_SCALING", "1") != "0":
        # the north rule's two-parallelism evidence, embedded in the bench
        # artifact: identical job + input at pinned 2 vs 8 cores (taskset —
        # local[N] alone doesn't bound GC/JIT threads; see BENCH.md for the
        # methodology and the DRAM-bandwidth ceiling above 8 total cores)
        from tools.scaling_bench import run_level

        # rep=8 (1.2M rows): at smaller inputs per-job constant overhead
        # dominates the 2-core leg and understates efficiency (measured
        # 0.60 at rep=2 vs ~0.78 at rep=8 on identical code).  The pair is
        # REPEATED (cross-JVM leg variance is ±15% on this box) and the
        # headline statistic is the efficiency of per-leg bests — the
        # steady-state capability ratio, least polluted by JVM noise
        # (BENCH.md methodology).
        # Hardened: a stalled host leg (observed: the shared VM's memcpy
        # bandwidth collapsing to 0.1 GB/s for minutes) must never cost the
        # whole artifact — every leg/pair failure is caught and recorded,
        # and a wall-clock budget stops adding pairs.
        n_low, n_high = 2, 8
        srep = int(os.environ.get("SPARK_GRAFT_SCALING_REP", "8"))
        n_pairs = int(os.environ.get("SPARK_GRAFT_SCALING_PAIRS", "3"))
        budget_s = int(os.environ.get("SPARK_GRAFT_SCALING_BUDGET", "900"))
        t_start = time.perf_counter()
        pairs = []
        errors = []
        for _ in range(n_pairs):
            if pairs and time.perf_counter() - t_start > budget_s:
                errors.append(f"budget {budget_s}s reached after {len(pairs)} pairs")
                break
            try:
                # best-of-2 per leg (vs the tool's standalone best-of-3):
                # bounds the embedded evidence so the driver's bench run
                # stays well inside any harness timeout
                low = run_level(n_low, sf_dir, srep, n_runs=2)
                high = run_level(n_high, sf_dir, srep, n_runs=2)
            except Exception as e:  # noqa: BLE001 — record, keep the artifact
                errors.append(f"{type(e).__name__}: {e}"[:300])
                continue
            eff = (high["rows_per_sec"] / low["rows_per_sec"]) / (n_high / n_low)
            pairs.append({"low": low, "high": high, "efficiency": round(eff, 3)})
        if pairs:
            best_eff = (
                max(p["high"]["rows_per_sec"] for p in pairs)
                / max(p["low"]["rows_per_sec"] for p in pairs)
            ) / (n_high / n_low)
            effs = sorted(p["efficiency"] for p in pairs)
            median_eff = effs[len(effs) // 2] if len(effs) % 2 else round(
                (effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2, 3
            )
            result["scaling_pairs"] = {
                "pairs": pairs,
                "core_ratio": n_high / n_low,
                "pinned": os.path.exists("/usr/bin/taskset"),
                "rows": pairs[0]["low"]["rows"],
                "best_leg_efficiency": round(best_eff, 3),
                "median_efficiency": median_eff,
                "all_efficiencies": effs,
            }
        if errors:
            result.setdefault("scaling_pairs", {})["errors"] = errors
        # SAME-DAY HOST CONTROL: aggregate pinned-memcpy bandwidth at the
        # same 2 vs 8 parallelism — the DRAM ceiling a memory-bound job
        # cannot exceed on this shared VM.  If the pipeline's efficiency
        # tracks this ceiling, the residual gap to 1.0 is the host, not the
        # code (see BENCH.md "Scaling" for the full methodology).
        try:
            from tools.host_probe import probe

            hc = probe(n_low, n_high, seconds=3.0)
            result["host_control"] = hc
            if pairs and hc["memcpy_efficiency"]:
                result["scaling_pairs"]["efficiency_vs_host_ceiling"] = round(
                    best_eff / hc["memcpy_efficiency"], 3
                )
        except Exception as e:  # noqa: BLE001
            result["host_control"] = {"error": f"{type(e).__name__}: {e}"[:300]}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
