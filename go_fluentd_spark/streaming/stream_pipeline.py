"""Structured Streaming variant of the pipeline (SURVEY.md §2.10).

The reference is a streaming daemon; the batch plan in ``plans/pipeline.py``
is the primary restatement, but every stateless operator (ingest columns,
acceptor chain, parser, enrich) is a plain DataFrame->DataFrame function and
therefore applies UNCHANGED to a streaming DataFrame.  This module adds the
two genuinely streaming-only pieces:

- ``concat_sessions_streaming``: the multiline concator as a custom stateful
  operator (``applyInPandasWithState`` keyed by (tag, container_id)) with the
  reference's flush rules — next-head arrival, ``max_len`` overflow, and the
  ``ConcatorWait`` gap timeout (``internal/recvs/fluentd.go:23,505``,
  ``internal/tagfilters/concator_f.go:64,91-111``) mapped to a processing-time
  state timeout.  State persists in the checkpoint across restarts — the
  streaming twin of the WAL.
- ``run_pipeline_stream``: readStream -> stateless chain -> ``foreachBatch``
  fan-out writing per-sink directories + per-batch counts (the reference's
  per-sender batching, ``internal/senders/*``; micro-batch = the batch/linger
  window).
"""

from __future__ import annotations

import os
import threading
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from go_fluentd_spark.config import CONCAT_CONFIGS, DEFAULT_CONFIG, PipelineConfig
from go_fluentd_spark.operators.acceptor import acceptor_chain
from go_fluentd_spark.operators.enrich import msgid
from go_fluentd_spark.operators.parser import parse
from go_fluentd_spark.sources.synth import with_ingest_columns

# query id -> cooperative-stop flag for its foreachBatch sink; set by
# drain_and_stop once the drain protocol proves the stream empty, so the
# post-settle empty batches run no jobs and stop() never interrupts an
# in-flight py4j write call (see the sink_batch comment).
_STOP_FLAGS: dict[str, threading.Event] = {}

SEQ_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ]
)

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("tag", T.StringType()),
        T.StructField("container_id", T.StringType()),
        T.StructField("id", T.LongType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("env", T.StringType()),
        T.StructField("tag_base", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_merged", T.LongType()),
        T.StructField("ext_ids", T.ArrayType(T.LongType())),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("env", T.StringType()),
        T.StructField("tag_base", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("ext_ids", T.ArrayType(T.LongType())),
    ]
)


def read_sequence_stream(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of tokenized sequences (at scale: the Kafka source
    — ``streaming/kafka_source.py`` — or Iceberg-incremental; same downstream
    plan).  ``max_files_per_trigger`` is the file-source throttle knob (the
    kafka source's ``maxOffsetsPerTrigger`` twin): rate-limits intake at the
    source, the non-lossy analogue of the reference's token bucket
    (``acceptorfilters/pipeline.go:49-61``)."""
    reader = spark.readStream.schema(SEQ_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(src_dir)



_OUT_COLS = [f.name for f in _OUT_SCHEMA.fields]
_BASE_COLS = ["id", "doc_id", "tokens", "n_tok", "env", "tag_base", "source"]


def _concat_fold(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    *,
    compiled: dict,
    max_len: int,
    max_merged: int,
    gap_ms: int,
) -> Iterator[pd.DataFrame]:
    """VECTORIZED sequential-fold restatement (module-level so the no-Spark
    property test can drive it against a sequential reference).  The
    reference folds one row at a time (concator_f.go:140-207); here each
    micro-batch group is sessionized with segmented numpy ops — per-row
    Python only touches actual continuation tails (~2% of rows in the
    reference's traffic mix).  Semantics proof hooks: "last head wins" =
    cumsum(is_head); overflow checks chars/rows ALREADY
    buffered, both nondecreasing within a session, so the first
    overflowing tail and every later one stand alone — exactly the repo's
    batch operator (operators/concat.py wg eviction) and the sequential
    fold the property test pins.  INTENTIONAL DEVIATION from the reference
    (ADVICE r5): concator_f.go:197-202 appends the overflowing tail INTO
    the session and flushes the merged message, i.e. the reference's
    overflowing tail ships inside the flushed session; here (batch and
    streaming alike, kept mutually consistent and oracle-checked) the
    overflowing tail is EVICTED to its own row.  Both bound the buffer;
    the eviction form keeps check-before-append semantics expressible as
    one running-sum window on the batch side."""
    import numpy as np

    tag, container = key
    carry: dict | None = None
    if state.exists:
        s = state.get
        carry = {
            "id": int(s[0]), "doc_id": s[1], "tokens": list(s[2]),
            "n_tok": int(s[3]), "env": s[4], "tag_base": s[5],
            "source": s[6], "ext_ids": list(s[7]),
        }

    def _carry_row() -> dict:
        return {
            "tag": tag, "container_id": container, "id": carry["id"],
            "doc_id": carry["doc_id"], "tokens": carry["tokens"],
            "n_tok": carry["n_tok"], "env": carry["env"],
            "tag_base": carry["tag_base"], "source": carry["source"],
            "n_merged": 1 + len(carry["ext_ids"]),
            "ext_ids": carry["ext_ids"],
        }

    if state.hasTimedOut:
        # ConcatorWait gap flush (concator_f.go:91-111)
        state.remove()
        yield pd.DataFrame(
            [_carry_row()] if carry is not None else [], columns=_OUT_COLS
        )
        return

    chunks = [c for c in pdfs if len(c)]
    if not chunks:  # no new rows: leave state (and its timer) untouched
        yield pd.DataFrame([], columns=_OUT_COLS)
        return
    pdf = pd.concat(chunks, ignore_index=True)
    pdf = pdf.sort_values("id", ignore_index=True)
    rx = compiled.get(pdf["tag_base"].iat[0])  # tag fixed per group

    if rx is None:
        # unconfigured tag: passthrough (no state was ever kept)
        out = pdf[_BASE_COLS].copy()
        out["n_merged"] = 1
        out["ext_ids"] = [[]] * len(out)
        out["tag"], out["container_id"] = tag, container
        yield out[_OUT_COLS]
        return

    n = len(pdf)
    pos = np.arange(n, dtype=np.int64)
    lens = pdf["source"].str.len().to_numpy(dtype=np.int64)
    is_head = pdf["source"].str.match(rx).to_numpy(dtype=bool)

    # sess 0 = rows before the batch's first head (the carried session's
    # tails, or lone tails); k>=1 = the session of the k-th head
    sess = np.cumsum(is_head)
    head_pos = np.flatnonzero(is_head)
    start = np.zeros(n, dtype=np.int64)
    if len(head_pos):
        in_sess = sess >= 1
        start[in_sess] = head_pos[sess[in_sess] - 1]

    # overflow eviction BEFORE append: chars / rows already buffered
    cum_before = np.cumsum(lens) - lens
    prior_len = cum_before - cum_before[start]
    cnt_before = pos - start
    if carry is not None:
        seg0 = sess == 0
        prior_len = prior_len + seg0 * len(carry["source"])
        cnt_before = cnt_before + seg0 * (1 + len(carry["ext_ids"]))
    evict = (~is_head) & ((prior_len >= max_len) | (cnt_before >= max_merged))
    # lone tails (no carry, no head yet) pass through (:151-157)
    individual = evict if carry is not None else (evict | (sess == 0))

    # the session still open at batch end: the last head's (or the
    # carried one if no head arrived) — unless it overflowed mid-batch
    open_label: int | None = (
        int(sess[-1]) if (len(head_pos) or carry is not None) else None
    )
    if open_label is not None and evict[sess == open_label].any():
        open_label = None

    frames: list[pd.DataFrame] = []
    if individual.any():
        ind = pdf.loc[individual, _BASE_COLS].copy()
        ind["n_merged"] = 1
        ind["ext_ids"] = [[]] * len(ind)
        frames.append(ind)

    # merged tails, grouped by session (contiguous runs, id order kept)
    tails_mask = ~individual & ~is_head
    src_map: dict[int, str] = {}
    ext_map: dict[int, list[int]] = {}
    if tails_mask.any():
        t_sess = sess[tails_mask]
        t_ids = pdf.loc[tails_mask, "id"].to_numpy()
        t_src = pdf.loc[tails_mask, "source"].to_numpy(dtype=object)
        uniq, first = np.unique(t_sess, return_index=True)
        bounds = np.append(first, len(t_sess))
        for k, s0 in enumerate(uniq):
            lo, hi = bounds[k], bounds[k + 1]
            src_map[int(s0)] = "".join(t_src[lo:hi])
            ext_map[int(s0)] = [int(x) for x in t_ids[lo:hi]]

    heads = pdf.loc[is_head, _BASE_COLS].copy()
    if len(heads):
        hsess = sess[is_head]  # ascending: 1..len(head_pos)
        n_m = np.ones(len(heads), dtype=np.int64)
        ext_col: list[list[int]] = [[]] * len(heads)
        src_col = heads["source"].to_numpy(dtype=object).copy()
        for s0, ids_ in ext_map.items():
            if s0 == 0:
                continue  # carried session's tails, handled below
            j = int(np.searchsorted(hsess, s0))
            src_col[j] = src_col[j] + src_map[s0]
            ext_col[j] = ids_
            n_m[j] = 1 + len(ids_)
        heads["source"] = src_col
        heads["ext_ids"] = ext_col
        heads["n_merged"] = n_m

    new_state: tuple | None = None
    if carry is not None:
        c_src = carry["source"] + src_map.get(0, "")
        c_ext = carry["ext_ids"] + ext_map.get(0, [])
        if open_label == 0:  # no head this batch: stays open, grown
            new_state = (
                carry["id"], carry["doc_id"], carry["tokens"],
                carry["n_tok"], carry["env"], carry["tag_base"],
                c_src, c_ext,
            )
        else:  # next head arrived (or overflow): flushes now
            carry.update(source=c_src, ext_ids=c_ext)
            frames.append(pd.DataFrame([_carry_row()]))

    if open_label is not None and open_label >= 1:
        h = heads.iloc[-1]  # the last head session is always last
        new_state = (
            int(h["id"]), h["doc_id"], [int(x) for x in h["tokens"]],
            int(h["n_tok"]), h["env"], h["tag_base"], h["source"],
            [int(x) for x in h["ext_ids"]],
        )
        heads = heads.iloc[:-1]
    if len(heads):
        frames.append(heads)

    if new_state is not None:
        state.update(new_state)
        state.setTimeoutDuration(gap_ms)
    elif state.exists:
        state.remove()

    if not frames:
        yield pd.DataFrame([], columns=_OUT_COLS)
        return
    out = pd.concat(frames, ignore_index=True)
    out["tag"], out["container_id"] = tag, container
    yield out[_OUT_COLS]


def concat_sessions_streaming(
    df: DataFrame,
    configs: dict[str, dict] | None = None,
    max_len: int = DEFAULT_CONFIG.concat_max_len,
    max_merged: int = DEFAULT_CONFIG.concat_max_merged,
    gap_ms: int = 5000,
) -> DataFrame:
    """Stateful multiline concat.  Input: ingest-column frame (streaming).
    Output rows appear when a session FLUSHES (next head / max_len / gap
    timeout) — at-least-once with checkpointed state, like the reference's
    in-recv concator backed by the WAL."""
    import re

    configs = CONCAT_CONFIGS if configs is None else configs
    compiled = {base: re.compile(c["head_regexp"]) for base, c in configs.items()}

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        return _concat_fold(
            key, pdfs, state,
            compiled=compiled, max_len=max_len,
            max_merged=max_merged, gap_ms=gap_ms,
        )

    return df.groupBy("tag", "container_id").applyInPandasWithState(
        fold,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def shed_overload(
    batch_df: DataFrame, max_per_tag: int, order_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """LOSSY drop-on-overload — the reference's full-queue message drop
    (``acceptorfilters/pipeline.go:170-180``: a message that cannot enqueue
    within the timeout is discarded and counted), restated per micro-batch:
    each TAG (one queue per tag in the reference) keeps at most
    ``max_per_tag`` rows per trigger; the excess is SHED deterministically
    (lowest ``order_col`` kept — the oldest-first queue drain) and returned
    as an audit frame instead of a log line.

    Scale shape: one rank window partitioned by tag — bounded sort groups,
    no global ordering; the shed audit is a partial-agg count.  Returns
    ``(kept, shed_counts)`` where ``shed_counts`` is ``(tag, n_shed)``."""
    w = Window.partitionBy("tag").orderBy(order_col)
    ranked = batch_df.withColumn("_rk", F.row_number().over(w))
    kept = ranked.filter(F.col("_rk") <= max_per_tag).drop("_rk")
    shed = (
        ranked.filter(F.col("_rk") > max_per_tag)
        .groupBy("tag")
        .agg(F.count(F.lit(1)).alias("n_shed"))
    )
    return kept, shed


def _write_batch_partition(df: DataFrame, path: str, batch_id: int) -> None:
    """Idempotent per-batch write under at-least-once ``foreachBatch``: the
    batch's rows land in a ``batch_id=<n>`` partition via dynamic partition
    overwrite, so a RETRIED micro-batch replaces its own partition instead
    of double-appending (journal dedup semantics, ``journal.go:41,58``).

    Refuses a legacy flat layout: an ``out_dir`` written by the pre-round-5
    ``mode("append")`` path holds unpartitioned files at the table root, and
    mixing those with ``batch_id=N`` dirs makes the directory unreadable as
    one table — resume on an upgraded layout requires a fresh out_dir.
    Scope (ADVICE r5): the refusal checks the LOCAL filesystem only
    (``os.path``) — for a remote ``out_dir`` URI (hdfs://, s3a://) it
    silently no-ops; route the check through the Hadoop FileSystem API
    before pointing this at a remote table."""
    if os.path.isdir(path) and any(f.endswith(".parquet") for f in os.listdir(path)):
        raise ValueError(
            f"{path} holds a legacy flat (unpartitioned) parquet layout; "
            "use a fresh out_dir — per-batch idempotent writes partition "
            "by batch_id"
        )
    (
        df.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)
    )


def drain_and_stop(
    q, timeout_s: float = 120.0, poll_s: float = 0.25, settle_batches: int = 2
) -> bool:
    """Drain an ``availableNow`` pipeline query and stop it.

    With a processing-time-timeout stateful operator in the plan (the
    concator), Spark considers EVERY batch to potentially fire timeouts
    (``shouldRunAnotherBatch`` is unconditionally true for
    ProcessingTimeTimeout), so an availableNow query never self-terminates:
    it loops empty micro-batches forever, ``awaitTermination`` blocks, and —
    measured here — ``processAllAvailable`` never returns either.  The
    working shutdown is to watch committed batch progress: once
    ``settle_batches`` CONSECUTIVE batches commit with zero input rows AND
    an empty state store (every open concat session hit its ConcatorWait gap
    timeout, flushed, and was removed), everything the source had is in the
    sinks and the query is safe to ``stop()``.

    Stateless availableNow pipelines (``with_concat=False``) self-terminate;
    for those the ``q.isActive`` guard exits immediately.  ``timeout_s`` is
    an IDLE deadline, not a whole-run cap (ADVICE r5): every committed
    batch that still carries input rows resets it, so a long backlog drains
    however long it takes while a genuinely stuck stream still times out.
    It must exceed the concat gap (default 5 s).

    Returns ``True`` when the drain SETTLED (all input provably processed
    and the state store empty) — ``False`` means the idle deadline fired
    first and the run may have been truncated; callers that promise "all
    input processed" (the CLI ``stream`` command) must surface that."""
    import time

    deadline = time.monotonic() + timeout_s
    last_batch, streak, settled = -1, 0, False
    while q.isActive and time.monotonic() < deadline:
        p = q.lastProgress
        if p is not None and p.get("batchId", -1) != last_batch:
            last_batch = p.get("batchId", -1)
            state_empty = all(
                so.get("numRowsTotal", 0) == 0
                for so in p.get("stateOperators", [])
            )
            if p.get("numInputRows", 0) == 0 and state_empty:
                streak += 1
                if streak >= settle_batches:
                    settled = True
                    break
            else:
                streak = 0
                # forward progress: a batch with input rows (or residual
                # state) committed — push the idle deadline out instead of
                # force-stopping a healthy drain of a long backlog
                deadline = time.monotonic() + timeout_s
        time.sleep(poll_s)
    # cooperative stop — ONLY on the settled path (every remaining batch is
    # provably empty): flag the foreachBatch sink down to its count()-only
    # form (full state execution, no writes — see the sink_batch comment
    # for why both lighter variants corrupt the checkpoint), give the
    # in-flight full batch a beat to commit, then interrupt.  Wherever the
    # interrupt lands the checkpoint stays consistent: a cancelled count
    # RAISES, failing its batch before the commit log is written.  The
    # possible terminal exception (cancelled empty batch) is harmless noise
    # by construction — every source row was committed batches ago and the
    # state store is empty — so it is tolerated on the settled path only.
    ev = _STOP_FLAGS.pop(str(q.id), None)
    if not settled:
        if q.isActive:
            q.stop()
        q.awaitTermination(60)
        return False
    if ev is not None and q.isActive:
        ev.set()
        time.sleep(max(poll_s, 1.0))
    try:
        if q.isActive:
            q.stop()
        q.awaitTermination(60)
    except Exception:  # noqa: BLE001
        pass
    return True


def run_pipeline_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    with_concat: bool = True,
    max_files_per_trigger: int | None = None,
    shed_max_per_tag: int | None = None,
):
    """readStream -> (stateful concat) -> stateless chain -> foreachBatch
    per-sink writes + counts.  Returns the StreamingQuery (caller triggers
    availableNow or continuous).  ``max_files_per_trigger`` throttles intake
    at the source (see read_sequence_stream); ``shed_max_per_tag`` arms the
    LOSSY drop-on-overload path (see shed_overload) — shed rows land in the
    ``_shed`` audit table, mirroring the reference's drop counter."""
    # refuse a legacy layout where a sink dir holds flat (un-batch_id-
    # partitioned) parquet — same rule _write_batch_partition applies to
    # _counts/_shed, checked once here for the unified sink table
    for name in os.listdir(out_dir) if os.path.isdir(out_dir) else []:
        d = os.path.join(out_dir, name)
        if (
            name.startswith("sink=")
            and os.path.isdir(d)
            and any(f.endswith(".parquet") for f in os.listdir(d))
        ):
            raise ValueError(
                f"{d} holds a legacy flat (unpartitioned) parquet layout; "
                "use a fresh out_dir — per-batch idempotent writes partition "
                "by batch_id"
            )
    df = with_ingest_columns(
        read_sequence_stream(spark, src_dir, max_files_per_trigger)
    )
    if with_concat:
        df = concat_sessions_streaming(df)
    df = acceptor_chain(df, cfg)
    df = parse(df, cfg)
    df = msgid(df, cfg)

    # sink fan-out as ONE column expression: per sink, a WHEN over its tag
    # conditions yields the sink name (NULL = no match); a row duplicates
    # into every matching sink (cp -> 2), rows matching none drop out at the
    # explode.  This turns K per-sink filtered writes (K job launches per
    # micro-batch, each re-reading the persisted batch) into a SINGLE write
    # partitioned by (sink, batch_id) — same on-disk layout
    # (out/sink=<name>/batch_id=<n>), one job.  At cluster scale that is K-1
    # fewer passes over every micro-batch plus K-1 fewer commit rounds.
    sink_whens = []
    for sink in cfg.sinks:
        conds = None
        for t in sink.tags:
            c = (
                (F.col("tag") == t)
                if any(t.endswith("." + e) for e in cfg.envs)
                else (F.col("tag_base") == t)
            )
            conds = c if conds is None else (conds | c)
        sink_whens.append(F.when(conds, F.lit(sink.name)))

    stop_event = threading.Event()

    def _write_fanout(bdf: DataFrame, batch_id: int) -> None:
        fanned = (
            bdf.withColumn(
                "sink",
                F.explode(
                    F.filter(F.array(*sink_whens), lambda x: x.isNotNull())
                ),
            )
            .drop("tokens", "args_map")
            .withColumn("batch_id", F.lit(batch_id))
        )
        (
            fanned.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("sink", "batch_id")
            .parquet(out_dir)
        )

    def sink_batch(batch_df: DataFrame, batch_id: int) -> None:
        # cooperative stop (see drain_and_stop): once the drain protocol has
        # proven the stream empty (consecutive committed zero-input batches
        # with an empty state store), it sets this flag so the endless
        # post-settle empty batches run NO jobs — q.stop()'s interrupt then
        # lands between py4j calls instead of inside an in-flight write.
        # (Stopping mid-write is what tripped SPARK's own
        # StreamExecution.isInterruptionException: its interrupt-detection
        # regex recurses over the py4j error MESSAGE, and a long traceback
        # string blows the stream-execution thread's stack —
        # java.util.regex StackOverflowError, observed 3x at sf0.1.)  Only
        # provably-empty batches skip the persist + write jobs: the flag is
        # set strictly after the settle condition, when the availableNow
        # source is exhausted and the concat state fully flushed.  The
        # count() is NOT optional and must NOT swallow errors — both were
        # tried and are UNSOUND, because Spark 4.1 writes the batch commit
        # log BEFORE the state-store commit validation runs:
        # - return-without-jobs => the batch commits with ZERO state deltas
        #   (validation kills the query only afterwards) => restart dies
        #   with CANNOT_READ_DELTA_FILE_NOT_EXISTS;
        # - count()+swallow => a stop()-cancelled count returns success
        #   over PARTIAL per-partition deltas, same checkpoint corruption.
        # A full count() executes every state partition (commit validation
        # passes, the batch commits consistently), and if the drain's
        # q.stop() cancels it mid-flight the raise fails the batch, so it
        # never commits and a restart replays it — consistent either way.
        if stop_event.is_set():
            batch_df.count()
            return
        # every write below is idempotent per batch (foreachBatch is
        # at-least-once: a retry re-delivers the same batch_id, and dynamic
        # partition overwrite replaces that batch's partition instead of
        # double-appending) — the _shed audit, the unified sink table, AND
        # _counts
        if shed_max_per_tag is not None:
            # the shed path consumes the batch twice (kept + shed audit):
            # persist pays for itself there, and _counts piggybacks on the
            # cached frame exactly as before
            batch_df, shed = shed_overload(batch_df, shed_max_per_tag)
            _write_batch_partition(shed, os.path.join(out_dir, "_shed"), batch_id)
            batch_df = batch_df.persist()
            try:
                _write_fanout(batch_df, batch_id)
                counts = batch_df.groupBy("tag").agg(
                    F.count(F.lit(1)).alias("n")
                )
                _write_batch_partition(
                    counts, os.path.join(out_dir, "_counts"), batch_id
                )
            finally:
                # blocking: consecutive EMPTY batches have identical logical
                # plans, so with the default async unpersist batch N+1's
                # first action can hit batch N's not-yet-dropped cache
                # entry, execute ZERO stateful tasks, and flunk Spark 4's
                # state-store commit validation ("expected K commits but
                # got 0") — a flaky query death observed ~25% of drains.
                batch_df.unpersist(blocking=True)
            return
        # Round 6 (VERDICT r5 #5 — micro-batch fixed cost): the non-shed
        # path runs ONE job per micro-batch instead of persist + fan-out
        # write + a second counts aggregation job.  Per-tag counts ride the
        # write job as a CollectMetrics (Observation) node placed BEFORE
        # the sink explode (so no-sink rows still count, exactly like the
        # old pre-fan-out groupBy); the acceptor whitelist bounds the tag
        # domain to cfg.accept_tags, so one count_if per accepted tag is
        # exhaustive.  A defensive residual counter guards the invariant:
        # if any row carries an out-of-whitelist tag (a future operator
        # change), that batch falls back to the old groupBy job rather
        # than under-counting.  The _counts table layout, values, and
        # per-batch_id idempotent overwrite are unchanged.
        from pyspark.sql import Observation

        obs = Observation(f"counts-{batch_id}")
        tag_counts = [
            F.count_if(F.col("tag") == t).alias(f"t{i}")
            for i, t in enumerate(cfg.accept_tags)
        ]
        other = F.count_if(
            ~F.col("tag").isin(list(cfg.accept_tags))
        ).alias("other")
        observed = batch_df.observe(obs, *tag_counts, other)
        _write_fanout(observed, batch_id)
        got = obs.get
        spark_b = batch_df.sparkSession
        if got["other"]:
            counts = batch_df.groupBy("tag").agg(F.count(F.lit(1)).alias("n"))
        else:
            rows = [
                (t, got[f"t{i}"])
                for i, t in enumerate(cfg.accept_tags)
                if got[f"t{i}"]
            ]
            counts = spark_b.createDataFrame(rows, "tag string, n bigint")
        _write_batch_partition(counts, os.path.join(out_dir, "_counts"), batch_id)

    q = (
        df.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _STOP_FLAGS[str(q.id)] = stop_event
    return q
