"""Kafka streaming source: wire decode (kafka.go:209-252) + round-trip from
the Kafka SENDER's serialized values, driven through a real Structured
Streaming query via a file-backed stream carrying the kafka wire schema (no
broker in this environment; the reader half only adds broker options)."""


from pyspark.sql import functions as F

from go_fluentd_spark.sources.synth import sequences_df, with_ingest_columns
from go_fluentd_spark.streaming.kafka_source import decode_kafka_wire

WIRE_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset bigint, "
    "timestamp timestamp"
)


def _wire_frame(spark, sf_dir):
    """Sender -> wire: serialize the ingest frame the way the Kafka sender
    marshals values (to_json of the message fields, kafka.go:64-188)."""
    df = with_ingest_columns(sequences_df(spark, sf_dir))
    value = F.to_json(
        F.struct(
            "doc_id",
            "tag",
            F.array_join("tokens", ",").alias("tokens_csv"),
            F.col("n_tok").cast("string").alias("n_tok"),
            "source",
        )
    )
    return df.select(
        F.col("doc_id").cast("binary").alias("key"),
        value.cast("binary").alias("value"),
        F.lit("sequences").alias("topic"),
        F.lit(0).alias("partition"),
        F.col("id").alias("offset"),
        F.current_timestamp().alias("timestamp"),
    )


def test_decode_kafka_wire_roundtrip(spark, sf_dir):
    orig = sequences_df(spark, sf_dir)
    decoded = decode_kafka_wire(_wire_frame(spark, sf_dir))
    assert decoded.count() == orig.count()
    # tokens survive the csv round-trip; tag resolved from the payload
    a = {r.doc_id: (r.tokens, r.n_tok, r.source) for r in orig.collect()}
    b = {r.doc_id: (r.tokens, r.n_tok, r.source) for r in decoded.collect()}
    assert a == b
    tags = decoded.select("tag").distinct().collect()
    assert all("." in r.tag for r in tags)  # real tags, not the default


def test_decode_kafka_wire_bad_rows_discarded(spark):
    rows = [
        (None, b"not json at all", "t", 0, 0),
        (None, b'{"tag": "x.sit"}', "t", 0, 1),  # json but no doc_id
        (None, b'{"doc_id": "d1", "tag": "cp.sit", "tokens_csv": "1,2", "n_tok": "2", "source": "s"}', "t", 0, 2),
    ]
    df = spark.createDataFrame(
        rows, "key binary, value binary, topic string, partition int, offset bigint"
    ).withColumn("timestamp", F.current_timestamp())
    out = decode_kafka_wire(df).collect()
    assert len(out) == 1 and out[0].doc_id == "d1" and out[0].tokens == [1, 2]


def test_decode_kafka_wire_poison_numeric_fields(spark):
    """ANSI mode: a non-numeric token / n_tok must DISCARD-to-NULL (try_cast),
    not throw CAST_INVALID_INPUT — a throwing decode would wedge a restarted
    stream on the same offset forever (kafka.go:226-233 logs and skips)."""
    rows = [
        (None, b'{"doc_id": "p1", "tag": "cp.sit", "tokens_csv": "1,2,x", "n_tok": "nope", "source": "s"}', "t", 0, 0),
        (None, b'{"doc_id": "p2", "tag": "cp.sit", "tokens_csv": "3,4", "n_tok": "2", "source": "s"}', "t", 0, 1),
    ]
    df = spark.createDataFrame(
        rows, "key binary, value binary, topic string, partition int, offset bigint"
    ).withColumn("timestamp", F.current_timestamp())
    out = {r.doc_id: r for r in decode_kafka_wire(df).collect()}
    assert set(out) == {"p1", "p2"}          # no exception, both rows survive
    assert out["p1"].tokens == [1, 2, None]  # bad element nulled, not fatal
    assert out["p1"].n_tok is None
    assert out["p2"].tokens == [3, 4] and out["p2"].n_tok == 2


def test_kafka_wire_stream_through_full_pipeline(spark, sf_dir, tmp_path):
    """The kafka source feeds the REAL pipeline: wire decode -> ingest
    columns (recovered from doc_id, same as the batch scan) -> acceptor ->
    parse -> per-tag counts, as one streaming query.  The routed totals must
    match the batch pipeline over the same rows (concat disabled on both
    sides: kafka delivery order isn't the batch id order)."""
    from go_fluentd_spark.config import DEFAULT_CONFIG
    from go_fluentd_spark.operators.acceptor import acceptor_chain
    from go_fluentd_spark.operators.parser import parse

    src = str(tmp_path / "wire")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _wire_frame(spark, sf_dir).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(WIRE_SCHEMA).parquet(src)
    decoded = with_ingest_columns(
        decode_kafka_wire(stream).drop("tag", "kafka_ts")
    )
    chained = parse(acceptor_chain(decoded, DEFAULT_CONFIG), DEFAULT_CONFIG)
    q = (
        chained.writeStream.foreachBatch(
            lambda b, i: b.groupBy("tag")
            .agg(F.count(F.lit(1)).alias("n"))
            .write.mode("append")
            .parquet(out)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.tag: r.n
        for r in spark.read.parquet(out).groupBy("tag").agg(F.sum("n").alias("n")).collect()
    }
    batch = parse(
        acceptor_chain(
            with_ingest_columns(sequences_df(spark, sf_dir)), DEFAULT_CONFIG
        ),
        DEFAULT_CONFIG,
    )
    expected = {r.tag: r.n for r in batch.groupBy("tag").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == expected


def test_kafka_wire_stream(spark, sf_dir, tmp_path):
    """The decode runs UNCHANGED on a streaming frame: file-backed stream of
    wire rows -> decode -> per-tag counts, availableNow trigger."""
    src = str(tmp_path / "wire")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _wire_frame(spark, sf_dir).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(WIRE_SCHEMA).option(
        "maxFilesPerTrigger", "1"  # the file-source throttle knob under test
    ).parquet(src)
    decoded = decode_kafka_wire(stream)

    q = (
        decoded.writeStream.foreachBatch(
            lambda b, i: b.groupBy("tag")
            .agg(F.count(F.lit(1)).alias("n"))
            .write.mode("append")
            .parquet(out)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    n = got.agg(F.sum("n")).collect()[0][0]
    assert n == sequences_df(spark, sf_dir).count()


def test_kafka_rewrite_tag(spark):
    # kafka.go RewriteTag option: force-overwrites the tag regardless of payload
    from go_fluentd_spark.operators.recv import kafka_json_decode

    df = spark.createDataFrame(
        [(b'{"tag": "orig.sit", "k": "v"}',)], "value binary"
    )
    out = kafka_json_decode(df, rewrite_tag="forced.prod").collect()[0]
    assert out.tag == "forced.prod"
