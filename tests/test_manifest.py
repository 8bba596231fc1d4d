"""Resume semantics (FIXTURES.md F6): kill after partial commit, rerun,
assert no dupes / no loss vs a clean run."""

import pytest

from go_fluentd_spark.plans.manifest import ManifestedRun


def sink_rows(m, sink):
    df = m.sink_table(sink)
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_clean_run_then_noop_rerun(spark, sf_dir, tmp_path):
    m = ManifestedRun(spark, str(tmp_path / "out"), n_buckets=8)
    s1 = m.run(sf_dir)
    assert s1["buckets"] == 8 and s1["rows"] > 0
    # rerun: everything committed -> zero work, tables unchanged
    before = sink_rows(m, "es_general")
    s2 = m.run(sf_dir)
    assert s2["buckets"] == 0 and s2["skipped"] == 8
    assert sink_rows(m, "es_general") == before


def test_run_with_monitor_writes_stage_counts(spark, sf_dir, tmp_path):
    """monitor.go:19-42 analogue next to the manifest: per-stage totals with
    the conservation identity intact."""
    import os

    out = str(tmp_path / "out")
    m = ManifestedRun(spark, out, n_buckets=4)
    m.run(sf_dir, with_monitor=True)
    got = spark.read.parquet(os.path.join(out, "_monitor", "stage_counts"))
    n = {r.stage: r.n for r in got.collect()}
    assert n["concat"] == n["parsed"] + n["discarded"]
    assert got.columns == ["stage", "n", "run_id"]


def test_crash_before_commit_then_resume(spark, sf_dir, tmp_path):
    ref = ManifestedRun(spark, str(tmp_path / "ref"), n_buckets=8)
    ref.run(sf_dir)
    expected = sink_rows(ref, "es_general")

    m = ManifestedRun(spark, str(tmp_path / "out"), n_buckets=8)
    # crash after the first sink write, BEFORE any manifest commit
    with pytest.raises(RuntimeError, match="injected failure"):
        m.run(sf_dir, fail_after_sinks=1)
    assert m.committed_buckets(f"{sf_dir}#b8", 3) == []  # nothing committed

    s = m.run(sf_dir)  # resume reprocesses everything, idempotently
    assert s["buckets"] == 8
    assert sink_rows(m, "es_general") == expected  # no dupes, no loss


def test_partial_commit_skips_committed_buckets(spark, sf_dir, tmp_path):
    ref = ManifestedRun(spark, str(tmp_path / "ref"), n_buckets=8)
    ref.run(sf_dir)
    expected = {s: sink_rows(ref, s) for s in ("es_general", "kafka_cp")}

    m = ManifestedRun(spark, str(tmp_path / "out"), n_buckets=8)
    first = m.run(sf_dir)
    assert first["buckets"] == 8
    s2 = m.run(sf_dir)
    assert s2["skipped"] == 8 and s2["buckets"] == 0
    for s in expected:
        assert sink_rows(m, s) == expected[s]
