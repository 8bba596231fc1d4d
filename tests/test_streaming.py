"""Structured Streaming pipeline: stateful concat across micro-batches +
foreachBatch sink fan-out, checkpointed restart."""

import os
import shutil

from pyspark.sql import functions as F

from go_fluentd_spark.sources.synth import sequences_df
from go_fluentd_spark.streaming.stream_pipeline import drain_and_stop, run_pipeline_stream


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
    assert drain_and_stop(q)  # settled drain reports True (ADVICE r5)

    # batch 2: remaining rows; NEW query from the same checkpoint (restart)
    _write_batch(spark, sf_dir, src, 1)
    q2 = run_pipeline_stream(spark, src, out, ckpt)
    assert drain_and_stop(q2)

    got = spark.read.parquet(os.path.join(out, "sink=es_general"))
    # the batch pipeline (no streaming gap-flush pending sessions) is the
    # floor: every batch-parsed row routed to es_general must also appear in
    # the streaming output exactly once (no dupes across restart)
    ids = [r.doc_id for r in got.select("doc_id").collect()]
    assert len(ids) == len(set(ids)), "duplicate rows across restarted batches"
    assert len(ids) > 0
    counts = spark.read.parquet(os.path.join(out, "_counts"))
    assert counts.agg(F.sum("n")).collect()[0][0] >= len(ids)


def test_stream_batch_retry_idempotent(spark, sf_dir, tmp_path):
    """foreachBatch is at-least-once: a crash after the sink writes but
    before the offset commit re-delivers the SAME micro-batch (same
    batch_id) on restart.  Every per-batch write (sink tables, _counts)
    overwrites its own batch_id partition, so the retry leaves row counts
    unchanged — simulated by discarding the checkpoint so the identical
    files re-deliver as batch 0 against the same out_dir."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    _write_batch(spark, sf_dir, src, 0)
    q = run_pipeline_stream(spark, src, out, str(tmp_path / "ck"), with_concat=False)
    drain_and_stop(q)
    sink_n = spark.read.parquet(os.path.join(out, "sink=es_general")).count()
    counts_n = spark.read.parquet(os.path.join(out, "_counts")).agg(
        F.sum("n")
    ).collect()[0][0]

    # retry: fresh checkpoint -> the same input re-delivered as batch_id 0
    q2 = run_pipeline_stream(spark, src, out, str(tmp_path / "ck2"), with_concat=False)
    drain_and_stop(q2)
    assert spark.read.parquet(os.path.join(out, "sink=es_general")).count() == sink_n
    assert (
        spark.read.parquet(os.path.join(out, "_counts")).agg(F.sum("n")).collect()[0][0]
        == counts_n
    )


def test_legacy_flat_layout_refused(spark, tmp_path):
    """A pre-upgrade out_dir with flat (unpartitioned) parquet at a table
    root must be refused, not silently mixed with batch_id=N dirs."""
    import pytest

    from go_fluentd_spark.streaming.stream_pipeline import _write_batch_partition

    path = str(tmp_path / "_counts")
    df = spark.range(3).select(F.lit("t").alias("tag"), F.col("id").alias("n"))
    df.write.mode("append").parquet(path)  # legacy flat layout
    with pytest.raises(ValueError, match="legacy flat"):
        _write_batch_partition(df, path, 0)


def test_stream_lossy_drop_on_overload(spark, sf_dir, tmp_path):
    """LOSSY backpressure (acceptorfilters/pipeline.go:170-180): with the
    shed path armed, a micro-batch delivering more rows for one tag than the
    per-trigger budget drops the excess — deterministically, with the drop
    AUDITED per (batch, tag) — and conservation holds: delivered + shed =
    what an unshedded run delivers."""
    src = str(tmp_path / "src")
    _write_batch(spark, sf_dir, src, 0)
    _write_batch(spark, sf_dir, src, 1)  # both halves -> one fat batch

    # control: same input, no shedding (concat off on both runs: shed
    # operates on parsed rows, and availableNow may split file batches)
    q0 = run_pipeline_stream(
        spark, src, str(tmp_path / "out0"), str(tmp_path / "ck0"), with_concat=False
    )
    drain_and_stop(q0)
    counts0 = spark.read.parquet(str(tmp_path / "out0/_counts"))
    total0 = counts0.agg(F.sum("n")).collect()[0][0]

    cap = 40
    q = run_pipeline_stream(
        spark, src, str(tmp_path / "out1"), str(tmp_path / "ck1"),
        with_concat=False, shed_max_per_tag=cap,
    )
    drain_and_stop(q)
    counts1 = spark.read.parquet(str(tmp_path / "out1/_counts"))
    shed = spark.read.parquet(str(tmp_path / "out1/_shed"))
    delivered = counts1.agg(F.sum("n")).collect()[0][0]
    n_shed = shed.agg(F.sum("n_shed")).collect()[0][0] or 0
    assert n_shed > 0, "cap should actually shed on this input"
    assert delivered + n_shed == total0
    # per (batch, tag) the delivered count never exceeds the budget
    over = counts1.filter(F.col("n") > cap).collect()
    assert not over, over
