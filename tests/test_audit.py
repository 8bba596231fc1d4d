"""Accounting identity: no silent drops — every concat-stage row is either
parsed through or appears in the discard audit with a reason."""

from pyspark.sql import functions as F

from go_fluentd_spark.config import DEFAULT_CONFIG
from go_fluentd_spark.operators.audit import discard_reasons
from go_fluentd_spark.plans import pipeline as P


def test_conservation(spark, sf_dir):
    con = P.concatted(spark, sf_dir).persist()
    try:
        n_in = con.count()
        from go_fluentd_spark.operators.acceptor import acceptor_chain
        from go_fluentd_spark.operators.parser import parse

        n_parsed = parse(acceptor_chain(con, DEFAULT_CONFIG), DEFAULT_CONFIG).count()
        d = discard_reasons(con, DEFAULT_CONFIG)
        by_reason = {r.reason: r.n for r in d.groupBy("reason").agg(F.count("*").alias("n")).collect()}
        assert n_in == n_parsed + sum(by_reason.values()), (n_in, n_parsed, by_reason)
        # the synthetic corpus exercises these discard sites
        assert by_reason.get("spark_ignore", 0) > 0
        assert by_reason.get("unknown_tag", 0) > 0
        assert by_reason.get("parse_no_match", 0) > 0
        assert by_reason.get("bad_time", 0) > 0
    finally:
        con.unpersist()


def test_stage_counts_conservation(spark, sf_dir):
    """monitor.go:19-42 analogue: the per-stage totals must satisfy the
    pipeline's conservation identities in one query result."""
    from go_fluentd_spark.operators.monitor import stage_counts

    n = {r.stage: r.n for r in stage_counts(spark, sf_dir).collect()}
    assert set(n) == {"ingest", "concat", "accepted", "parsed", "routed", "discarded"}
    assert n["ingest"] >= n["concat"] >= n["accepted"] >= n["parsed"]
    # every concat-stage row is parsed through or discarded with a reason
    assert n["concat"] == n["parsed"] + n["discarded"]
