"""Snapshot table: atomic commits, time travel, incremental reads, and a
batch-incremental pipeline run over the delta."""

from pyspark.sql import functions as F

from go_fluentd_spark.config import DEFAULT_CONFIG
from go_fluentd_spark.operators.acceptor import acceptor_chain
from go_fluentd_spark.operators.concat import concat_sessions
from go_fluentd_spark.operators.parser import parse
from go_fluentd_spark.sources.snapshots import IncrementalPosition, SnapshotTable
from go_fluentd_spark.sources.synth import sequences_df, with_ingest_columns


def halves(spark, sf_dir):
    df = sequences_df(spark, sf_dir)
    return (
        df.filter(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0),
        df.filter(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 1),
    )


def test_commit_timetravel_incremental(spark, sf_dir, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    a, b = halves(spark, sf_dir)
    na, nb = a.count(), b.count()

    v1 = t.commit(a)
    v2 = t.commit(b)
    assert (v1, v2) == (1, 2)
    assert t.read(version=1).count() == na          # time travel
    assert t.read().count() == na + nb              # current
    inc = t.read_incremental(from_version=1)
    assert inc.count() == nb                        # only the delta
    assert t.read_incremental(from_version=2) is None


def test_incremental_pipeline_run(spark, sf_dir, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    pos = IncrementalPosition(str(tmp_path / "pos"))
    a, b = halves(spark, sf_dir)

    def process_delta():
        cur = t.current_version()
        delta = t.read_incremental(pos.get(), cur)
        if delta is None:
            return 0
        out = parse(
            acceptor_chain(concat_sessions(with_ingest_columns(delta)), DEFAULT_CONFIG),
            DEFAULT_CONFIG,
        ).count()
        pos.set(cur)
        return out

    t.commit(a)
    n1 = process_delta()
    assert n1 > 0
    assert process_delta() == 0  # nothing new -> no work

    t.commit(b)
    n2 = process_delta()
    assert n2 > 0
    # two increments together == one full run over everything
    full = parse(
        acceptor_chain(
            concat_sessions(with_ingest_columns(t.read())), DEFAULT_CONFIG
        ),
        DEFAULT_CONFIG,
    ).count()
    # concat sessions can merge across the two commits in the full run, so
    # incremental total is >= full (tails processed alone in their delta)
    assert n1 + n2 >= full > 0
