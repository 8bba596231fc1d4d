"""CLI entry point — the ``spark-submit --py-files`` surface.

Package + submit:

    zip -r go_fluentd_spark.zip go_fluentd_spark
    spark-submit --py-files go_fluentd_spark.zip \
        go_fluentd_spark/__main__.py run \
        --sf-dir /data/sequences --out /data/out --buckets 256

Local (no cluster): ``python -m go_fluentd_spark run --out /tmp/out``.

Subcommands:
  run      manifested pipeline run (resumable; rerun after a crash and only
           uncommitted buckets are reprocessed)
  counts   print the per-sink/per-tag aggregate counts (the /monitor analogue)
  stream   run the Structured Streaming variant over a directory source
  curate   run the corpus-curation decision and write kept docs + audit
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="go_fluentd_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    runp = sub.add_parser("run", help="manifested (resumable) pipeline run")
    runp.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    runp.add_argument("--out", required=True)
    runp.add_argument("--buckets", type=int, default=32)
    runp.add_argument("--cores", type=int, default=None)
    runp.add_argument(
        "--monitor", action="store_true",
        help="also write per-stage totals next to the manifest",
    )

    cntp = sub.add_parser("counts", help="per-sink/per-tag counts")
    cntp.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    cntp.add_argument("--cores", type=int, default=None)

    monp = sub.add_parser(
        "monitor", help="per-stage totals + rows/sec (the /monitor analogue)"
    )
    monp.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    monp.add_argument("--out", default=None, help="also write stage_counts parquet here")
    monp.add_argument("--cores", type=int, default=None)

    curp = sub.add_parser(
        "curate", help="corpus-curation decision (keep = rep ∧ quality ∧ lang)"
    )
    curp.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    curp.add_argument("--out", required=True, help="writes kept/ and audit/ parquet")
    curp.add_argument("--cores", type=int, default=None)
    curp.add_argument(
        "--with-media", action="store_true",
        help="fold the multimodal signal in (corpus_curation_mm: geometry "
        "floors + media dedup rep) and ALSO write chunks/ — the final "
        "training-ready curated_chunks table",
    )
    curp.add_argument(
        "--substr-cut", action="store_true",
        help="also write substr/ — the substring-deduplicated sequence "
        "table (substr_dup_spans: duplicated spans >= SUBSTR_CUT_MIN "
        "tokens removed, survivors re-packed)",
    )

    stp = sub.add_parser("stream", help="streaming variant over a dir source")
    stp.add_argument("--src", required=True)
    stp.add_argument("--out", required=True)
    stp.add_argument("--checkpoint", required=True)
    stp.add_argument("--cores", type=int, default=None)

    args = p.parse_args(argv)

    from go_fluentd_spark.session import build_spark

    spark = build_spark("go_fluentd_spark", cores=args.cores)
    try:
        if args.cmd == "run":
            from go_fluentd_spark.plans.manifest import ManifestedRun

            m = ManifestedRun(spark, args.out, n_buckets=args.buckets)
            stats = m.run(args.sf_dir, with_monitor=args.monitor)
            print(json.dumps(stats))
            print(m.stats())
        elif args.cmd == "counts":
            from go_fluentd_spark.plans.pipeline import sink_counts

            for r in sink_counts(spark, args.sf_dir).orderBy("sink", "tag").collect():
                print(f"{r.sink}\t{r.tag}\t{r.n}")
        elif args.cmd == "monitor":
            from go_fluentd_spark.operators.monitor import stage_counts, stage_metrics

            for m in stage_metrics(spark, args.sf_dir):
                print(json.dumps(m))
            if args.out:
                stage_counts(spark, args.sf_dir).write.mode("overwrite").parquet(
                    os.path.join(args.out, "stage_counts")
                )
        elif args.cmd == "curate":
            from pyspark.sql import functions as F

            from go_fluentd_spark.operators.dataprep import (
                corpus_curation,
                corpus_curation_mm,
                curated_chunks,
                docs,
            )

            keep_col = "keep_mm" if args.with_media else "keep"
            decide = corpus_curation_mm if args.with_media else corpus_curation
            audit = decide(spark, args.sf_dir).persist()
            try:
                kept = (
                    docs(spark, args.sf_dir)
                    .join(audit.filter(F.col(keep_col) == 1).select("doc_id"), "doc_id")
                )
                kept.write.mode("overwrite").parquet(os.path.join(args.out, "kept"))
                audit.write.mode("overwrite").parquet(os.path.join(args.out, "audit"))
                stats = {
                    "total": audit.count(),
                    "kept": audit.filter(F.col(keep_col) == 1).count(),
                }
                if args.with_media:
                    # the training-ready output: chunks of sequences whose
                    # linked doc survived the full text+media curation;
                    # the keep list comes from the ALREADY-persisted audit
                    # frame, so the decode+curation lineage (the most
                    # expensive stage) is not recomputed
                    ch = curated_chunks(
                        spark,
                        args.sf_dir,
                        keep=audit.filter(F.col("keep_mm") == 1).select("doc_id"),
                    )
                    ch.write.mode("overwrite").parquet(os.path.join(args.out, "chunks"))
                    stats["chunks"] = spark.read.parquet(
                        os.path.join(args.out, "chunks")
                    ).count()
                if args.substr_cut:
                    from go_fluentd_spark.operators.dataprep import substr_dup_spans

                    sd = substr_dup_spans(spark, args.sf_dir)
                    sd.write.mode("overwrite").parquet(os.path.join(args.out, "substr"))
                    cut = sd.filter(F.col("n_tok_kept") < F.col("n_tok"))
                    stats["substr_cut_seqs"] = cut.count()
                    stats["substr_cut_tokens"] = (
                        sd.agg(
                            F.sum(F.col("n_tok") - F.col("n_tok_kept"))
                        ).collect()[0][0]
                        or 0
                    )
                stats["reject_rate"] = (
                    round(1 - stats["kept"] / stats["total"], 4)
                    if stats["total"]
                    else 0.0
                )
                print(json.dumps(stats))
            finally:
                audit.unpersist()
        elif args.cmd == "stream":
            from go_fluentd_spark.streaming.stream_pipeline import (
                drain_and_stop,
                run_pipeline_stream,
            )

            q = run_pipeline_stream(spark, args.src, args.out, args.checkpoint)
            # availableNow + the stateful concator never self-terminates
            # (empty timeout batches loop) — drain: all input processed,
            # open sessions gap-flushed, then stop.  A drain that hits the
            # idle deadline instead of settling may have TRUNCATED the run
            # (checkpoint stays consistent/resumable) — say so and exit
            # non-zero instead of silently reporting success (ADVICE r5).
            if not drain_and_stop(q):
                print(
                    "stream drain did not settle: input may be only "
                    "partially processed; checkpoint is resumable — re-run "
                    "to continue",
                    file=sys.stderr,
                )
                return 1
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
