"""Kafka Structured Streaming source (reference consumer loop
``internal/recvs/kafka.go:123-206``): ``spark.readStream.format("kafka")``
plus the per-message decode ``internal/recvs/kafka.go:209-252`` —
the mapping SURVEY.md §2.1 names.

Split in two so the decode is testable without a broker:

- :func:`kafka_sequence_stream` builds the reader (broker options, offsets,
  ``maxOffsetsPerTrigger``) and applies the decode.  ``maxOffsetsPerTrigger``
  is the throttle analogue of the reference's token bucket
  (``internal/acceptorfilters/pipeline.go:49-61,158``): it caps rows per
  micro-batch, i.e. sustained rows/sec = cap / trigger-interval — the
  NON-LOSSY half of the reference's backpressure (the lossy drop-on-overload
  path remains a documented deviation, CLAUDE.md).
- :func:`decode_kafka_wire` maps the kafka wire schema (key/value binary,
  topic, partition, offset, timestamp) to the tokenized-sequence ingest
  frame; it runs identically on a batch frame, a file-backed stream, or the
  real kafka source — the pytest drives it with a parquet-backed stream of
  the same wire columns (no broker in the test env).

The message VALUE is the JSON the Kafka sender writes
(``__spark_entry__._q_kafka_sink_values``: doc_id/tag/msgid/n_tok — plus
tokens/source for full round-trip), so sender output replays through this
source: the reference's kafka-buffer loop (producer -> kafka -> KafkaRecv).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from go_fluentd_spark.operators.recv import kafka_json_decode

#: JSON value payload: the sender's marshalled message (kafka.go:209-252
#: json mode); tokens ride as a csv string (kafka values are flat strings)
WIRE_VALUE_SCHEMA = "map<string,string>"


def decode_kafka_wire(
    df: DataFrame,
    tag_key: str | None = "tag",
    default_tag: str = "kafkabuf.sit",
) -> DataFrame:
    """Kafka wire frame -> tokenized-sequence ingest frame.

    Reuses :func:`kafka_json_decode` (tag resolve from the payload's tag key,
    JSON body -> map) then projects the sequence columns; rows whose value is
    not valid JSON or lacks doc_id are DISCARDED (kafka.go:226-233 logs and
    skips undecodable messages).  ANSI-safe: try_element_at / try casts.
    """
    df = kafka_json_decode(
        df, value_col="value", schema=WIRE_VALUE_SCHEMA,
        tag_key=tag_key, default_tag=default_tag,
    )
    get = lambda k: F.try_element_at(F.col("msg"), F.lit(k))  # noqa: E731
    # try_cast, not cast: under ANSI mode a poison message ("1,2,x" tokens or
    # a non-numeric n_tok) would throw CAST_INVALID_INPUT and — because the
    # stream re-reads the same offset on restart — wedge the source forever.
    # kafka.go:226-233 logs and SKIPS undecodable messages; try_cast gives the
    # same discard contract (bad element -> NULL, row survives decode).
    out = df.select(
        get("doc_id").alias("doc_id"),
        F.transform(
            F.split(get("tokens_csv"), ","), lambda s: s.try_cast("int")
        ).alias("tokens"),
        get("n_tok").try_cast("int").alias("n_tok"),
        get("source").alias("source"),
        F.col("tag"),
        F.col("timestamp").alias("kafka_ts"),
    )
    return out.filter(F.col("doc_id").isNotNull())


def kafka_sequence_stream(
    spark: SparkSession,
    brokers: str,
    topics: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
    tag_key: str | None = "tag",
    default_tag: str = "kafkabuf.sit",
) -> DataFrame:
    """readStream.format("kafka") -> decoded sequence stream.

    ``max_offsets_per_trigger`` is the throttle knob (token-bucket analogue,
    acceptorfilters/pipeline.go:49-61): with a processing-time trigger of T
    seconds the sustained intake is capped at max_offsets_per_trigger / T
    rows/sec, applied back at the SOURCE (no rows buffered or dropped —
    kafka itself is the buffer, like the reference's kafka-buffer deployment).

    Requires the spark-sql-kafka connector on the classpath at runtime; the
    decode half (:func:`decode_kafka_wire`) is broker-independent and is what
    the tests pin.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return decode_kafka_wire(reader.load(), tag_key=tag_key, default_tag=default_tag)
