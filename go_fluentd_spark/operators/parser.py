"""Regex parsing / extraction (reference ``internal/tagfilters/parser_f.go``).

Reference flow per tag: regex named-group extract -> JSON explode ->
must_include gate -> add fields -> time normalize; groups are trimmed and
empty groups are absent keys (``library/utils.go:60-73``); a non-matching row
is DISCARDED (``parser_f.go:57-63``); unparseable time is DISCARDED
(``parser_f.go:121-168``).

Spark restatement: ONE projection pass.  Two interchangeable extraction
backends, selected by ``PipelineConfig.parser_impl`` and benchmarked against
each other in bench.py: ``native`` (codegen'd regexp_extract when-chains —
the regex runs once per group) and ``pandas`` (Arrow batch, ONE compiled
regex pass per family via ``pd.Series.str.extract``).  The shared post
stages (must_include, JSON explode, time normalize) are pure Column exprs.

Group -> unified column mapping (NULL where a family lacks the field):
time, app, level, thread, class, line, args, message.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type-hint resolution needs it
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


def extract_native(df: DataFrame, parsers: list[ParserConfig]) -> DataFrame:
    """JVM extraction: codegen'd regexp_extract per group (the regex runs
    once per group — N+1 runs/row)."""
    matched = _family_case(parsers, lambda p: F.col("source").rlike(p.pattern))
    df = df.filter(F.coalesce(matched, F.lit(False)))  # no parser => discard
    cols = {f: _family_case(parsers, lambda p, f=f: _group_col(p, f)) for f in FIELDS}
    return df.withColumns(cols)


def extract_pandas(df: DataFrame, parsers: list[ParserConfig]) -> DataFrame:
    """Arrow extraction: ONE compiled-regex pass per family via
    ``pd.Series.str.extract`` (regex compiled once per executor, never per
    row — SURVEY.md §2.6's preferred multi-group path).  Semantics identical
    to :func:`extract_native`; pick by measurement (bench.py times both).
    """
    import re

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [T.StructField(f, T.StringType()) for f in FIELDS]
        + [T.StructField("_m", T.BooleanType())]
    )
    compiled = [(list(p.tag_bases), p.pattern, list(p.groups)) for p in parsers]

    @F.pandas_udf(out_schema)
    def extract(tag_base: pd.Series, source: pd.Series) -> pd.DataFrame:
        out = pd.DataFrame(
            {f: pd.Series(None, index=source.index, dtype=object) for f in FIELDS}
        )
        out["_m"] = False
        for bases, pat, groups, in compiled:
            mask = tag_base.isin(bases)
            if not mask.any():
                continue
            rx = re.compile(pat)
            ext = source[mask].str.extract(rx)
            ext.columns = groups[: ext.shape[1]]
            hit = ext.notna().any(axis=1)
            for g in groups:
                vals = ext[g].str.strip()
                vals = vals.where(vals.notna() & (vals != ""), None)
                out.loc[vals.index, g] = vals
            out.loc[hit.index, "_m"] = hit
        return out

    # unpack all fields in ONE projection, then filter on the materialized
    # match flag.  NOTE (measured, rounds 1-2): Catalyst still inlines the
    # UDF into each downstream gate (match/must/ts filters + projection —
    # 4 ArrowEvalPython nodes in the full parse plan).  Alternatives tried
    # and rejected by measurement: (a) asNondeterministic forces a single
    # eval BUT blocks CollapseProject/pushdown downstream — 4.6x slower
    # end-to-end; (b) a nondeterministic barrier column in the unpack
    # projection — node count UNCHANGED (4) and parse 29% slower; (c)
    # dropping the _m filter (redundant when every family has must_include)
    # — node count unchanged.  The repeated eval costs ~25% of this one
    # stage and nothing downstream, so it stays.  (write_sinks persists the
    # parsed frame anyway, so physical sinks never re-parse.)
    st = extract(F.col("tag_base"), F.col("source"))
    df = df.withColumn("_p", st)
    df = df.withColumns(
        {f: F.col(f"_p.{f}") for f in FIELDS} | {"_m": F.col("_p._m")}
    ).drop("_p")
    return df.filter(F.col("_m")).drop("_m")


def parse(df: DataFrame, cfg: PipelineConfig, impl: str | None = None) -> DataFrame:
    """Parser over all configured tag families: extraction (native | pandas)
    + the shared post stages (must_include, JSON explode, time normalize)."""
    parsers = cfg.parsers
    impl = impl or getattr(cfg, "parser_impl", "native")
    df = (extract_pandas if impl == "pandas" else extract_native)(df, parsers)

    # must_include gate (parser_f.go:112-118)
    must_ok = _family_case(
        parsers,
        lambda p: F.col(p.must_include).isNotNull() if p.must_include else F.lit(True),
    )
    df = df.filter(must_ok)

    # JSON explode of the args group (parser_f.go:74-107): the payload is
    # recursively FlattenMap'd (library/utils.go:75-85) so nested objects
    # land as `a__b` keys in `args_map` (our declared-schema overflow
    # column); known keys are promoted to real `args__`-prefixed columns;
    # raw kept only when JSON parse fails.
    from go_fluentd_spark.functions.textops import flatten_json_map

    json_parsers = [p for p in parsers if p.parse_json_key]
    if json_parsers:
        is_json_family = F.col("tag_base").isin(
            [b for p in json_parsers for b in p.tag_bases]
        )
        parsed_map = flatten_json_map(F.col("args"))
        df = df.withColumn("args_map", F.when(is_json_family, parsed_map))
        from go_fluentd_spark.config import PROMOTE_JSON_KEYS

        df = df.withColumns(
            {
                f"args__{key}": F.try_element_at(F.col("args_map"), F.lit(key))
                for key in PROMOTE_JSON_KEYS
            }
        ).withColumn(
            "args",
            F.when(F.col("args_map").isNotNull(), F.lit(None)).otherwise(
                F.col("args")
            ),
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
