"""Multimodal plumbing + codecs: schema, batch shape, deterministic fake
decode, and the REAL stdlib BMP/WAV/MP4 decode round-trip."""

import pytest
from pyspark.sql import functions as F

from go_fluentd_spark.operators.multimodal import (
    _decode_mp4,
    _make_bmp,
    _make_mp4,
    _make_wav,
    decode_features,
    frame_sample,
    pack_media,
    pack_media_real,
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


def test_decode_real_roundtrip(spark, sf_dir):
    """REAL containers through the REAL decoder: the stdlib BMP/WAV parse
    must recover the exact geometry the packer embedded, distributed via
    mapInPandas (Arrow batches of binary payloads)."""
    media = pack_media_real(spark, sf_dir).limit(90)
    got = {
        r.media_id: (r.kind, r.width, r.height, r.n_frames, r.feature)
        for r in decode_features(media, decoder="real").collect()
    }
    assert got and {k for _, (k, *_) in got.items()} == {"image", "audio", "video"}
    for media_id, (kind, w, h, nf, feat) in got.items():
        seed = int(media_id[1:])
        if kind == "image":
            _, ew, eh = _make_bmp(seed)
            assert (w, h, nf) == (ew, eh, 1), media_id
        elif kind == "audio":
            _, efr, enf = _make_wav(seed)
            assert (w, h, nf) == (efr, 1, enf), media_id
        else:
            _, ew, eh, enf = _make_mp4(seed)
            assert (w, h, nf) == (ew, eh, enf), media_id
        assert len(feat) == 8 and all(0.0 <= f <= 1.01 for f in feat)


def test_resize_images_roundtrip(spark, sf_dir):
    """Resize through the real containers: resized payloads decode to the
    target geometry; resizing to the source geometry is bit-exact identity."""
    from go_fluentd_spark.operators.multimodal import _resize_bmp, resize_images

    media = pack_media_real(spark, sf_dir).filter("kind = 'image'").limit(20)
    out = resize_images(media, out_w=12, out_h=9)
    decoded = {
        r.media_id: (r.width, r.height)
        for r in decode_features(
            out.withColumn("kind", F.lit("image")), decoder="real"
        ).collect()
    }
    assert decoded and all(v == (12, 9) for v in decoded.values())
    # identity: same-geometry resize reproduces the exact container bytes
    row = media.first()
    seed = int(row.media_id[1:])
    payload, w, h = _make_bmp(seed)
    assert _resize_bmp(payload, w, h) == payload


def test_decode_mp4_rejects_garbage():
    with pytest.raises(ValueError):
        _decode_mp4(b"\x00\x00\x00\x08junk" * 4)
    with pytest.raises(ValueError):
        _decode_mp4(b"")


def test_frame_sample(spark, sf_dir):
    df = pack_media(spark, sf_dir)
    out = frame_sample(df, every_n=4).first()
    assert out.n_sampled == len(out.frames) >= 1
    assert all(isinstance(f, (bytes, bytearray)) for f in out.frames)
