"""Multimodal plumbing: schema, batch shape, deterministic fake decode."""

import pytest

from go_fluentd_spark.operators.multimodal import (
    decode_features,
    frame_sample,
    pack_media,
)


def test_pack_media_schema(spark, sf_dir):
    df = pack_media(spark, sf_dir)
    assert df.schema["payload"].dataType.typeName() == "binary"
    row = df.filter("kind = 'image'").first()
    assert row.meta.mime == "image/png" and row.meta.n_bytes > 0


def test_decode_fake_deterministic(spark, sf_dir):
    df = pack_media(spark, sf_dir).limit(50)
    a = {r.media_id: (r.width, r.height, r.feature) for r in decode_features(df).collect()}
    b = {r.media_id: (r.width, r.height, r.feature) for r in decode_features(df).collect()}
    assert a == b and len(a) == 50
    w, h, feat = next(iter(a.values()))
    assert 64 <= w <= 319 and 64 <= h <= 319 and len(feat) == 8


def test_decode_real_is_stubbed(spark, sf_dir):
    df = pack_media(spark, sf_dir).limit(1)
    with pytest.raises(Exception, match="NotImplementedError|real media decoding"):
        decode_features(df, decoder="real").collect()


def test_frame_sample(spark, sf_dir):
    df = pack_media(spark, sf_dir)
    out = frame_sample(df, every_n=4).first()
    assert out.n_sampled == len(out.frames) >= 1
    assert all(isinstance(f, (bytes, bytearray)) for f in out.frames)
