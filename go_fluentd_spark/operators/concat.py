"""Multiline concat sessionization (reference
``internal/tagfilters/concator_f.go:50-207`` + in-recv variant
``internal/recvs/fluentd.go:399-544``).

Reference semantics: per (tag, identifier) stream, a row matching the tag's
``head_regexp`` starts a record; non-matching rows are APPENDED to the open
head with no separator (``concator_f.go:188-189``), their ids pushed into the
head's ``ExtIds`` (``:190-193``); a non-head row with no open session passes
through unchanged (``:151-157``); a session flushes when the next head
arrives, the buffer exceeds ``max_len`` (``:197-202``), or (streaming only) a
gap timeout fires.

Batch restatement — the classic "last head wins" sessionization, one shuffle:

    grp = max(id) FILTER (is_head) OVER (PARTITION BY tag, identifier
                                         ORDER BY id ROWS UNBOUNDED PRECEDING)

then group by (tag, identifier, grp).  Order within a group is the monotonic
receive ``id`` (batch's definition of arrival order, SURVEY.md §7).

Scale note: the shuffle key is (tag, identifier) — identifier is a
container/pod id with high cardinality, so the window shuffle spreads evenly
even when one tag dominates (the hot-tag-skew reality of
``docs/quickstart.md:122-127``); no salting needed HERE because the window
partitions by identifier, not tag.  AQE handles residual skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from go_fluentd_spark.config import CONCAT_CONFIGS, CONCAT_MAX_MERGED


def _head_expr(configs: dict[str, dict]):
    """is_head when-chain over tag bases; NULL (=> not configured) otherwise."""
    chain = None
    for base, c in configs.items():
        cond = F.col("tag_base") == base
        val = F.col("source").rlike(c["head_regexp"])
        chain = F.when(cond, val) if chain is None else chain.when(cond, val)
    return chain


def concat_sessions(
    df: DataFrame,
    configs: dict[str, dict] | None = None,
    max_len: int | None = None,
    max_merged: int | None = CONCAT_MAX_MERGED,
) -> DataFrame:
    """Fold multiline records.  Input needs columns
    (doc_id, tokens, n_tok, source, tag, tag_base, env, container_id, id);
    output has the same columns plus ``ext_ids`` (lineage of merged tails,
    array<bigint>) and ``n_merged``, with tail rows folded into their heads.

    Tags with no concat config pass through untouched (grp = own id).
    ``max_len``: once the accumulated buffer would exceed it, the session is
    flushed and subsequent tails pass through alone (``concator_f.go:197-202``
    + ``:151-157``).  ``max_merged`` additionally bounds the session's ROW
    count (an at-scale guard: max_len bounds chars, not the number of
    near-empty tails one group's collect_list can accumulate in one task).
    """
    configs = CONCAT_CONFIGS if configs is None else configs
    is_head = _head_expr(configs)
    df = df.withColumn("_is_head", is_head)  # NULL for unconfigured tags

    w = (
        Window.partitionBy("tag", "container_id")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # last head id at-or-before this row; NULL if no head yet (lone tail)
    grp = F.max(F.when(F.col("_is_head"), F.col("id"))).over(w)
    df = df.withColumn(
        "_grp",
        F.when(F.col("_is_head").isNull(), F.col("id")).otherwise(
            F.coalesce(grp, F.col("id"))
        ),
    )

    if max_len is not None or max_merged is not None:
        # running buffer size within the candidate group; a tail whose
        # predecessors already filled the buffer (chars or rows) is evicted
        # to its own group
        wg = (
            Window.partitionBy("tag", "container_id", "_grp")
            .orderBy("id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        evict = F.lit(False)
        if max_len is not None:
            prior_len = F.coalesce(F.sum(F.length("source")).over(wg), F.lit(0))
            evict = evict | (prior_len >= max_len)
        if max_merged is not None:
            evict = evict | (F.count(F.lit(1)).over(wg) >= max_merged)
        df = df.withColumn(
            "_grp", F.when(evict, F.col("id")).otherwise(F.col("_grp"))
        )

    merged = (
        df.groupBy("tag", "container_id", "_grp")
        .agg(
            F.min("id").alias("id"),
            F.min_by("doc_id", "id").alias("doc_id"),
            F.min_by("tokens", "id").alias("tokens"),
            F.min_by("n_tok", "id").alias("n_tok"),
            F.min_by("env", "id").alias("env"),
            F.min_by("tag_base", "id").alias("tag_base"),
            # append with NO separator, in id order (concator_f.go:188-189)
            F.array_sort(F.collect_list(F.struct("id", "source"))).alias("_parts"),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .withColumn(
            "source",
            F.concat_ws("", F.transform(F.col("_parts"), lambda p: p.source)),
        )
        .withColumn(
            # ExtIds: ids of the folded tail rows (concator_f.go:190-193)
            "ext_ids",
            F.filter(
                F.transform(F.col("_parts"), lambda p: p.id),
                lambda i: i != F.col("id"),
            ),
        )
        .drop("_parts", "_grp")
    )
    return merged
