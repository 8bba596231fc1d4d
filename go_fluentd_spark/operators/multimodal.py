"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` UDFs.

The Spark-side plumbing (schema, partitioning, UDF signatures, batch shapes)
is real and tested; the actual codec step is STUBBED because no image/audio
libraries ship in this environment: ``decoder="fake"`` is a deterministic
stand-in (dimensions derived from the payload hash), ``decoder="real"``
raises ``NotImplementedError`` where a PIL/ffmpeg call would go.

Scale design: binary payloads never shuffle — decode/feature steps are
narrow ``mapInPandas`` passes; only the (small) extracted features flow into
joins/aggregations.  ``spark.sql.files.maxPartitionBytes`` governs batch
memory for large blobs; for very large media use per-row files + pointers.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("origin", T.StringType()),
                ]
            ),
        ),
    ]
)


def pack_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a media table from ``documents`` (payload = utf8 bytes of text —
    a deterministic opaque blob standing in for real image/audio bytes)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return d.select(
        F.concat(F.lit("m"), F.col("doc_id").cast("string")).alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.when(kind == "image", "image/png")
            .when(kind == "audio", "audio/wav")
            .otherwise("video/mp4")
            .alias("mime"),
            F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(payload: bytes, kind: str) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for a codec: dimensions + an 8-dim feature
    vector derived from the payload digest."""
    h = hashlib.md5(payload).digest()
    width = 64 + h[0]
    height = 64 + h[1]
    n_frames = 1 if kind == "image" else 1 + h[2] % 64
    feature = [round(b / 255.0, 4) for b in h[3:11]]
    return width, height, n_frames, feature


def decode_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches; the codec
    runs once per row inside the batch loop, library handles vectorize-able
    steps).  ``decoder="real"`` marks where PIL/torchaudio/ffmpeg plug in."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg (not in this env); "
                    "use decoder='fake' for the deterministic stand-in"
                )
            rows = [
                (r.media_id, r.kind, *_fake_decode(bytes(r.payload), r.kind))
                for r in pdf.itertuples(index=False)
            ]
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "width", "height", "n_frames", "feature"],
            )

    return df.select("media_id", "kind", "payload").mapInPandas(run, DECODED_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 8) -> DataFrame:
    """Video frame sampling stand-in: split the payload into fixed-size
    chunks ("frames") and keep every n-th — the partition/batch shape of a
    real ffmpeg sampler, pure Column expressions."""
    chunk = 16
    n_chunks = F.greatest((F.length("payload") / chunk).cast("int"), F.lit(1))
    idx = F.filter(
        F.sequence(F.lit(0), n_chunks - 1), lambda i: i % every_n == 0
    )
    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.transform(
            idx, lambda i: F.substring(F.col("payload"), i * chunk + 1, chunk)
        ).alias("frames"),
        F.size(idx).alias("n_sampled"),
    )
