"""Structured Streaming pipeline: stateful concat across micro-batches +
foreachBatch sink fan-out, checkpointed restart."""

import os
import shutil

from pyspark.sql import functions as F

from go_fluentd_spark.sources.synth import sequences_df
from go_fluentd_spark.streaming.stream_pipeline import run_pipeline_stream


def _write_batch(spark, sf_dir, dest, part):
    df = sequences_df(spark, sf_dir)
    df = df.filter(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == part)
    df.coalesce(1).write.mode("append").parquet(dest)


def test_stream_two_batches_with_restart(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: half the rows
    _write_batch(spark, sf_dir, src, 0)
    q = run_pipeline_stream(spark, src, out, ckpt)
    q.awaitTermination(120)

    # batch 2: remaining rows; NEW query from the same checkpoint (restart)
    _write_batch(spark, sf_dir, src, 1)
    q2 = run_pipeline_stream(spark, src, out, ckpt)
    q2.awaitTermination(120)

    got = spark.read.parquet(os.path.join(out, "sink=es_general"))
    # the batch pipeline (no streaming gap-flush pending sessions) is the
    # floor: every batch-parsed row routed to es_general must also appear in
    # the streaming output exactly once (no dupes across restart)
    ids = [r.doc_id for r in got.select("doc_id").collect()]
    assert len(ids) == len(set(ids)), "duplicate rows across restarted batches"
    assert len(ids) > 0
    counts = spark.read.parquet(os.path.join(out, "_counts"))
    assert counts.agg(F.sum("n")).collect()[0][0] >= len(ids)
