"""End-to-end plan builder: the whole reference dataflow
(``acceptor -> acceptpipeline -> journal -> dispatcher -> tagPipeline ->
postFilter -> producer``, settings.yml:56) as ONE logical DataFrame program
that Catalyst plans: scan -> ingest columns -> concat window -> acceptor
predicates -> single-pass parse -> broadcast enrich -> post surgery -> fan-out.

Stage/thread boundaries of the reference become shuffle boundaries here; the
only required shuffle is the concat window's (tag, container_id) hash
partition — everything else is narrow or broadcast (SURVEY.md §3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from go_fluentd_spark.config import DEFAULT_CONFIG, PipelineConfig
from go_fluentd_spark.operators.acceptor import acceptor_chain
from go_fluentd_spark.operators.concat import concat_sessions
from go_fluentd_spark.operators.dispatcher import route, route_counts
from go_fluentd_spark.operators.enrich import add_fields, es_index, msgid
from go_fluentd_spark.operators.parser import parse
from go_fluentd_spark.operators.postfilter import post_default
from go_fluentd_spark.sources.synth import sequences_df, with_ingest_columns

#: message string columns the post default filter operates on — shared with
#: the DuckDB oracle so both sides apply surgery to the same field set
POST_STRING_COLS = [
    "source",
    "time",
    "app",
    "project",
    "level",
    "thread",
    "class",
    "line",
    "args",
    "message",
    "ts",
    "datasource",
]


def ingested(spark: SparkSession, sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    return with_ingest_columns(sequences_df(spark, sf_dir))


def concatted(spark: SparkSession, sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    return concat_sessions(ingested(spark, sf_dir, cfg), max_len=cfg.concat_max_len)


def accepted(spark: SparkSession, sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    return acceptor_chain(concatted(spark, sf_dir, cfg), cfg)


def parsed(spark: SparkSession, sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    return parse(accepted(spark, sf_dir, cfg), cfg)


def enriched(spark: SparkSession, sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    df = add_fields(spark, parsed(spark, sf_dir, cfg), cfg)
    df = post_default(df, cfg, msg_cols=POST_STRING_COLS)
    df = es_index(spark, df, cfg)
    return msgid(df, cfg)


def routed(spark: SparkSession, sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    return route(spark, enriched(spark, sf_dir, cfg), cfg)


def sink_counts(spark: SparkSession, sf_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    return route_counts(spark, enriched(spark, sf_dir, cfg), cfg)
