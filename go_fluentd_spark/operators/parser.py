"""Regex parsing / extraction (reference ``internal/tagfilters/parser_f.go``).

Reference flow per tag: regex named-group extract -> JSON explode ->
must_include gate -> add fields -> time normalize; groups are trimmed and
empty groups are absent keys (``library/utils.go:60-73``); a non-matching row
is DISCARDED (``parser_f.go:57-63``); unparseable time is DISCARDED
(``parser_f.go:121-168``).

Spark restatement: ONE projection pass.  Every per-tag pattern is compiled
into a when-chain keyed on tag_base, so the whole parser is a single
codegen'd select over one scan — no per-tag branches, no union, no Python.
The alternative pandas-UDF path (``pd.Series.str.extract``, one regex run per
row instead of one per group) lives in ``parse_pandas_udf`` for benchmarking.

Group -> unified column mapping (NULL where a family lacks the field):
time, app, level, thread, class, line, args, message.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from go_fluentd_spark.config import ParserConfig, PipelineConfig

#: unified output fields ("project" is geely's app-like key, kept under the
#: reference's own name — library/utils_test.go:56-73)
FIELDS = ["time", "app", "project", "level", "thread", "class", "line", "args", "message"]


def _family_case(parsers: list[ParserConfig], build) -> Column | None:
    """when(tag_base in parser.tag_bases, build(parser)) chain."""
    chain = None
    for p in parsers:
        cond = F.col("tag_base").isin(list(p.tag_bases))
        val = build(p)
        chain = F.when(cond, val) if chain is None else chain.when(cond, val)
    return chain


def _group_col(p: ParserConfig, field: str) -> Column:
    """Extract one unified field for one parser; trim + empty=>NULL
    (RegexNamedSubMatch semantics, library/utils.go:60-73)."""
    if field not in p.groups:
        return F.lit(None).cast("string")
    idx = p.groups.index(field) + 1
    return F.nullif(F.trim(F.regexp_extract(F.col("source"), p.pattern, idx)), F.lit(""))


def parse(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Single-pass parser over all configured tag families."""
    parsers = cfg.parsers

    matched = _family_case(parsers, lambda p: F.col("source").rlike(p.pattern))
    df = df.filter(F.coalesce(matched, F.lit(False)))  # no parser => discard

    cols = {f: _family_case(parsers, lambda p, f=f: _group_col(p, f)) for f in FIELDS}
    df = df.withColumns(cols)

    # must_include gate (parser_f.go:112-118)
    must_ok = _family_case(
        parsers,
        lambda p: F.col(p.must_include).isNotNull() if p.must_include else F.lit(True),
    )
    df = df.filter(must_ok)

    # JSON explode of the args group (parser_f.go:74-107): known key promoted
    # to a flattened `args__`-prefixed column (FlattenMap "__" convention,
    # library/utils.go:75-85); raw kept only when JSON parse fails; the full
    # dynamic map lands in `args_map` (our declared-schema overflow column).
    json_parsers = [p for p in parsers if p.parse_json_key]
    if json_parsers:
        is_json_family = F.col("tag_base").isin(
            [b for p in json_parsers for b in p.tag_bases]
        )
        parsed_map = F.from_json(F.col("args"), "map<string,string>")
        df = (
            df.withColumn("args_map", F.when(is_json_family, parsed_map))
            .withColumn("args__k", F.try_element_at(F.col("args_map"), F.lit("k")))
            .withColumn(
                "args",
                F.when(F.col("args_map").isNotNull(), F.lit(None)).otherwise(
                    F.col("args")
                ),
            )
        )

    # time normalize (parser_f.go:121-168 + settings.yml:786-795): parse with
    # appended tz, re-emit UTC ISO micros under @timestamp; comma-decimal fix
    # (parser_f.go:147).  Families with time_group=None skip (ramjet's time is
    # already UTC ISO; spark rows carry no structured time).
    def ts_expr(p: ParserConfig) -> Column:
        if p.time_group is None:
            if "time" in p.groups and p.tag_bases == ("ramjet",):
                return F.concat(F.col("time"), F.lit("Z"))
            return F.lit(None).cast("string")
        # try_to_timestamp: NULL on malformed input (ANSI-safe), mirroring
        # the reference's parse-failure-=>-discard instead of erroring
        parsed = F.try_to_timestamp(
            F.concat(
                F.regexp_replace(F.col("time"), ",", "."),
                F.lit(" " + p.append_time_zone),
            ),
            F.lit(p.spark_time_format),
        )
        return F.date_format(parsed, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")

    df = df.withColumn("ts", _family_case(parsers, ts_expr))

    # unparseable time => discard, but only for families that parse time
    time_required = _family_case(
        parsers, lambda p: F.lit(p.time_group is not None)
    )
    df = df.filter(~time_required | F.col("ts").isNotNull())

    # is_remove_orig_log (parser_f.go:67-69)
    drop_log = _family_case(parsers, lambda p: F.lit(p.is_remove_orig_log))
    df = df.withColumn("source", F.when(~drop_log, F.col("source")))
    return df


def parse_pandas_udf(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Alternate slow-path parser: one vectorized ``str.extract`` per family
    (regex compiled once per executor).  Kept for benchmarking against the
    codegen'd `parse`; semantics identical for the unified fields.
    """
    import pandas as pd  # noqa: F401
    from pyspark.sql import types as T

    parsers = cfg.parsers
    out_schema = T.StructType(
        [T.StructField(f, T.StringType()) for f in FIELDS] + [T.StructField("_m", T.BooleanType())]
    )

    # one struct-returning pandas UDF per family would still be N passes; use
    # a single UDF closing over all configs and dispatching on tag_base.
    import re

    compiled = [(set(p.tag_bases), re.compile(p.pattern), p) for p in parsers]

    @F.pandas_udf(out_schema)
    def extract(tag_base: "pd.Series", source: "pd.Series") -> "pd.DataFrame":
        out = pd.DataFrame(index=source.index, columns=FIELDS + ["_m"], dtype=object)
        out["_m"] = False
        for bases, rx, p in compiled:
            mask = tag_base.isin(bases)
            if not mask.any():
                continue
            ext = source[mask].str.extract(rx)
            ext.columns = list(p.groups)[: ext.shape[1]]
            hit = ext.notna().any(axis=1)
            for i, g in enumerate(p.groups):
                vals = ext[g].str.strip().replace("", None)
                out.loc[vals.index, g] = vals
            out.loc[hit.index, "_m"] = hit
        return out

    st = extract(F.col("tag_base"), F.col("source"))
    df = df.withColumn("_p", st).filter(F.col("_p._m"))
    for f in FIELDS:
        df = df.withColumn(f, F.col(f"_p.{f}"))
    return df.drop("_p")
