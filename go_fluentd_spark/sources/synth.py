"""The tokenized-sequence source table.

``BASELINE.json`` fixes the input shape: ``(doc_id string, tokens
array<int32>, n_tok int32, source string)``.  We derive it DETERMINISTICALLY
from the driver's ``orders`` parquet (``o_orderkey`` is dense-unique:
0..N-1; 15k rows at sf0.01, 150k at sf0.1) using pure modular arithmetic and
string concatenation — constructs with identical semantics in Spark SQL and
DuckDB SQL — so the DuckDB oracle (``go_fluentd_spark.oracle``) can rebuild
the exact same table and every downstream pipeline stage is hash-checkable.
An optional replication factor (``rep``) multiplies rows for benchmarking
(``did = o_orderkey*rep + r``, still dense-unique); correctness runs use
rep=1 so the oracle stays a pure-SQL mirror.

The embedded ``source`` log lines reproduce the reference's log-line corpus
(FIXTURES.md F2; formats from ``/root/reference/docs/settings/settings.yml``
comments and ``library/utils_test.go:56-73``), with a Zipf-ish family mix:
~60% spring (hot-tag skew, mirroring ``docs/quickstart.md:122-127`` where one
tag is ~100% of traffic), plus bot/cp retag markers, connector JSON lines,
geely, spark (incl. ignore-regex victims), ramjet, multiline continuations,
unknown-tag rows, and unparseable junk.

Family layout by ``bucket = did % 100``:

| bucket | family        | initial tag base | fate |
|--------|---------------|------------------|------|
| 0-59   | spring head   | spring           | retag app.spring.{env} -> es_general |
| 57     | spring, impossible date | spring | dropped by parser time gate (bad_time) |
| 60-66  | bot marker    | spring           | retag bot.{env} -> es_general |
| 67-72  | cp marker     | spring           | retag cp.{env} -> es_general + kafka_cp |
| 73-79  | connector     | connector        | es_general (half with JSON args) |
| 80-86  | geely         | geely            | prod -> fluentd_backup; sit/uat -> no sink |
| 87-90  | spark         | spark            | even did: ignore_regex drop; odd: es_general |
| 91-93  | ramjet        | ramjet           | es_general |
| 94-95  | continuation  | spring           | concat-folded into spring head (same container) |
| 96-97  | unknown tag   | junkapp          | dropped by accept_tags whitelist |
| 98-99  | corrupt head  | spring           | retag app.spring, dropped by parser (parse_no_match) |

Bucket 98/99 lines are spring-HEAD-shaped (they match the spring
``head_regexp`` so they stand alone as their own concat session instead of
folding into a neighbouring head) but carry only one ``|`` field, so the
connector/spring parser pattern genuinely misses: the parse_no_match
discard path is exercised independently of any other family.

Identity: ``doc_id = '<base>.<env>-c<container:04d>-<seq:08d>'`` — the tag is
recoverable from the doc_id prefix (the reference's
tag-rewrite-from-message-key, ``internal/recvs/fluentd.go:346-361``), the
container segment is the concat/LB identifier (``lb_key: container_id``,
settings.yml:237), and the seq segment is the monotonic receive ``ID``
(``internal/recvs/fluentd.go:384``).

Tokens: ``n_tok = 1 + (did*131071) % 512`` for every 10th row else
``1 + (did*131071) % 64`` (long-tail row-size skew);
``tokens[i] = (did*2654435761 + i*40503) % 50257``.  The pipeline must carry
these untouched — the per-row token-array-equality gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Shared literal fragments (also consumed by the DuckDB oracle builder so the
# two derivations cannot drift).
SPRING_CLASS = "com.laisky.cloud.cp.core.service.impl.CPBusiness.reflectAdapterRequest"
CONNECTOR_CLASS = "com.google.cloud.gateway.core.zuul.filters.post.LogFilter"
GEELY_CLASS = "com.tservice.cc.web.interceptor.MyLoggingOutInterceptor.handleMessage"
RAMJET_PATH = "/go/src/github.com/laisky/go-ramjet/tasks/logrotate/backup/main.go"
CONTINUATION_PREFIX = "at com.example.myproject.Author.getBookIds(Author.java:"

VOCAB = 50257


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _env(did: Column) -> Column:
    # keyed off (did % 50) so every row of one container shares one env (and
    # therefore one tag) — multiline sessions never straddle tags, matching
    # reality: one container logs to one tag
    e = (did % 50) % 3
    return F.when(e == 0, "sit").when(e == 1, "uat").otherwise("prod")


def sequences_df(spark: SparkSession, sf_dir: str, rep: int = 1) -> DataFrame:
    """Build the tokenized-sequence table from ``orders.parquet``.

    Pure Column expressions (whole-stage codegen, no Python in the row path);
    the scan prunes to the single ``o_orderkey`` column.  ``rep`` > 1
    replicates rows for benchmarking (dense-unique ids preserved).
    """
    did = F.col("did")
    env = _env(did)
    b = did % 100
    ms3 = F.lpad((did % 1000).cast("string"), 3, "0")
    ms6 = F.lpad((did % 1000000).cast("string"), 6, "0")
    nexec = ((did % 16) + 1).cast("string")
    dids = did.cast("string")

    spring_line = F.concat(
        F.lit("2018-03-06 16:56:22."), ms3,
        F.lit(" | mscparea | INFO  | http-nio-8080-exec-"), nexec,
        F.lit(" | " + SPRING_CLASS + " | 84: test message "), dids,
    )
    # bucket 57: regex-valid shape but impossible date -> the parser's
    # unparseable-time discard path (parser_f.go:121-168)
    spring_badtime_line = F.concat(
        F.lit("2018-02-30 16:56:22."), ms3,
        F.lit(" | mscparea | INFO  | http-nio-8080-exec-"), nexec,
        F.lit(" | " + SPRING_CLASS + " | 84: bad time "), dids,
    )
    bot_line = F.concat(
        F.lit("2018-03-06 16:56:22."), ms3,
        F.lit(" | ms_bot7 | WARN  | http-nio-8080-exec-"), nexec,
        F.lit(" | com.laisky.svc.BotHandler | 112: bot event "), dids,
    )
    # cp rows keep the spring pipe shape (so they concat under the spring
    # head_regexp like real spring-tagged traffic) but carry the "- ms:cp"
    # marker that fires SpringFilter retag rule 1 (settings.yml:650-652).
    cp_line = F.concat(
        F.lit("2018-02-01 16:15:43."), ms3,
        F.lit(" | mscpsvc | INFO  | http-nio-8080-exec-"), nexec,
        F.lit(" | com.laisky.cp.CpService | 84: handled - ms:cp event "), dids,
    )
    # every other args row carries a NESTED object so the parser's recursive
    # FlattenMap path (args__nested__a) is exercised end-to-end
    connector_args_tail = F.when(
        did % 4 == 0,
        F.concat(F.lit('", "nested": {"a": "'), (did % 7).cast("string"), F.lit('"}}')),
    ).otherwise(F.lit('"}'))
    connector_args_line = F.concat(
        F.lit("2018-04-02 02:02:10."), ms3,
        F.lit(" | sh-datamining | INFO | http-nio-8080-exec-"), nexec,
        F.lit(" | " + CONNECTOR_CLASS + ' | 74 | {"k": "v'), (did % 5).cast("string"),
        connector_args_tail,
        F.lit(": request "), dids,
    )
    connector_plain_line = F.concat(
        F.lit("2018-04-02 02:02:10."), ms3,
        F.lit(" | sh-datamining | INFO | http-nio-8080-exec-"), nexec,
        F.lit(" | " + CONNECTOR_CLASS + " | 74: plain request "), dids,
    )
    geely_line = F.concat(
        F.lit("2018-02-05 10:33:13."), ms3,
        F.lit(" | geely:nlcc | INFO | http-bio-8081-exec-"), ((did % 9) + 1).cast("string"),
        F.lit(" | " + GEELY_CLASS + ":57 - Outbound Message "), dids,
    )
    spark_ignore_line = F.concat(
        F.lit("2018-03-06 16:56:22,"), ms3, F.lit(" [main] something "), dids
    )
    spark_head_line = F.concat(
        F.lit("2018/03/06 16:56:22."), ms3, F.lit(" running task "), dids
    )
    ramjet_line = F.concat(
        F.lit("[2018-08-03T05:42:42."), ms6,
        F.lit("Z - DEBUG - " + RAMJET_PATH + ":129] IsFileReadyToUpload for "),
        dids, F.lit(".log.gz"),
    )
    continuation_line = F.concat(
        F.lit("\t" + CONTINUATION_PREFIX), ((did % 90) + 10).cast("string"), F.lit(")")
    )
    junk_tag_line = F.concat(F.lit("orphan "), dids)
    # head-shaped (matches SPRING_HEAD_REGEX => standalone session) but only
    # one pipe field => the spring/connector parser pattern misses
    junk_body_line = F.concat(
        F.lit("2018-03-06 16:56:22."), ms3, F.lit(" | corrupted "), dids
    )

    base = (
        F.when(b < 73, "spring")
        .when(b < 80, "connector")
        .when(b < 87, "geely")
        .when(b < 91, "spark")
        .when(b < 94, "ramjet")
        .when(b < 96, "spring")
        .when(b < 98, "junkapp")
        .otherwise("spring")
    )
    source = (
        F.when(b == 57, spring_badtime_line)
        .when(b < 60, spring_line)
        .when(b < 67, bot_line)
        .when(b < 73, cp_line)
        .when(b < 80, F.when(did % 2 == 0, connector_args_line).otherwise(connector_plain_line))
        .when(b < 87, geely_line)
        .when(b < 91, F.when(did % 2 == 0, spark_ignore_line).otherwise(spark_head_line))
        .when(b < 94, ramjet_line)
        .when(b < 96, continuation_line)
        .when(b < 98, junk_tag_line)
        .otherwise(junk_body_line)
    )
    n_tok = (
        F.when(did % 10 == 0, 1 + (did * 131071) % 512)
        .otherwise(1 + (did * 131071) % 64)
        .cast("int")
    )
    # container id: 5000 distinct values (realistic pod/container cardinality
    # so the concat window parallelizes), constructed so a continuation row
    # (bucket 94/95) always shares its container with the head rows of the
    # same did-group: (did%50) pins the bucket-pair, floor(did/100)%100
    # spreads groups — both terms are equal for did = 100g+44 vs 100g+94.
    container = (did % 50) * 100 + F.floor(did / 100).cast("bigint") % 100
    doc_id = F.concat(
        base, F.lit("."), env,
        F.lit("-c"), F.lpad(container.cast("string"), 4, "0"),
        F.lit("-"), F.lpad(dids, 8, "0"),
    )
    tokens = F.transform(
        F.sequence(F.lit(0), n_tok - 1),
        lambda i: ((did * 2654435761 + i.cast("bigint") * 40503) % VOCAB).cast("int"),
    )

    docs = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("bigint").alias("ok")
    )
    # the testdata parquet is one small file; spread the 8-byte keys across
    # all cores BEFORE replication/generation so the expensive row synthesis
    # is fully parallel (at real scale the source table has thousands of
    # splits and this repartition is unnecessary)
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    if rep > 1:
        docs = docs.select(
            "ok", F.explode(F.sequence(F.lit(0), F.lit(rep - 1))).alias("r")
        ).select((F.col("ok") * rep + F.col("r")).alias("did"))
    else:
        docs = docs.select(F.col("ok").alias("did"))
    return docs.select(
        doc_id.alias("doc_id"),
        tokens.alias("tokens"),
        n_tok.alias("n_tok"),
        source.alias("source"),
    )


def with_ingest_columns(df: DataFrame) -> DataFrame:
    """Recover routing metadata from the input columns only (no synth
    knowledge): the receive step of the pipeline.

    tag from the doc_id prefix = the reference's tag-rewrite-from-key
    (``internal/recvs/fluentd.go:346-361``); container_id = LB/concat
    identifier (``lb_key``, settings.yml:237); id = monotonic receive ID
    (``internal/recvs/fluentd.go:384``).
    """
    return df.withColumns(
        {
            "tag": F.split_part(F.col("doc_id"), F.lit("-"), F.lit(1)),
            "container_id": F.split_part(F.col("doc_id"), F.lit("-"), F.lit(2)),
            "id": F.split_part(F.col("doc_id"), F.lit("-"), F.lit(3)).cast("bigint"),
        }
    ).withColumns(
        {
            # tag = "<base>.<env>": env is the suffix after the last '.',
            # base everything before it (base itself may contain dots).
            "env": F.regexp_extract(F.col("tag"), r"\.([a-z]+)$", 1),
            "tag_base": F.regexp_replace(F.col("tag"), r"\.[a-z]+$", ""),
        }
    )
