"""Fluentd forward-protocol wire decode: pure-Python msgpack subset codec
(golden bytes both directions) + frame explode via mapInPandas."""

from go_fluentd_spark.sources.fluentd_wire import (
    decode_forward_frames,
    mp_pack,
    mp_unpack,
)


def test_msgpack_golden_bytes():
    # hand-written wire bytes (msgpack spec), NOT produced by mp_pack — so
    # decode is pinned to the spec, not to the encoder's inverse
    golden = bytes(
        [0x93]  # array(3)
        + [0xA3] + list(b"tag")  # fixstr "tag"
        + [0x7F]  # 127 positive fixint
        + [0x82]  # map(2)
        + [0xA1, ord("k")] + [0xA1, ord("v")]
        + [0xA1, ord("n")] + [0xCD, 0x01, 0x00]  # uint16 256
    )
    obj, pos = mp_unpack(golden)
    assert obj == ["tag", 127, {"k": "v", "n": 256}]
    assert pos == len(golden)


def test_msgpack_roundtrip():
    cases = [
        None, True, False, 0, 5, 127, -1, -32, 1 << 40, -(1 << 40), 3.25,
        "", "hello", "x" * 100, b"\x00\xff", [], [1, [2, {"a": "b"}]],
        {"t": 1, "deep": {"s": "v", "f": 1.5}}, list(range(40)),
    ]
    for c in cases:
        got, pos = mp_unpack(mp_pack(c))
        assert got == c and pos == len(mp_pack(c)), c


def test_decode_all_three_wire_variants(spark):
    # fluentd.go:209-342 decodes Message, Forward, and PackedForward modes
    packed_blob = mp_pack([1, {"log": "p1"}]) + mp_pack([2, {"log": "p2"}])
    frames = [
        mp_pack(["t.sit", 10, {"log": "message-mode"}]),  # Message
        mp_pack(["t.sit", [[11, {"log": "fwd"}]], {"chunk": "c1"}]),  # Forward+option
        mp_pack(["t.sit", packed_blob]),  # PackedForward
    ]
    df = spark.createDataFrame([(f,) for f in frames], "frame binary")
    out = sorted(decode_forward_frames(df).collect(), key=lambda r: r.time)
    assert [(r.time, r.record["log"]) for r in out] == [
        (1, "p1"), (2, "p2"), (10, "message-mode"), (11, "fwd"),
    ]
    assert all(r.tag == "t.sit" for r in out)


def test_decode_forward_frames(spark):
    frames = [
        mp_pack(["app.spring.sit", [[1518000000, {"log": "line one", "container_id": "c1"}],
                                    [1518000001, {"log": "line two", "container_id": "c1"}]]]),
        mp_pack(["geely.prod", [[1518000002, {"log": "g", "n": 7}]]]),
        b"\xc1 garbage",  # undecodable frame: dropped
    ]
    df = spark.createDataFrame([(f,) for f in frames], "frame binary")
    out = decode_forward_frames(df).collect()
    assert len(out) == 3
    by_tag = {}
    for r in out:
        by_tag.setdefault(r.tag, []).append(r)
    assert len(by_tag["app.spring.sit"]) == 2
    assert by_tag["app.spring.sit"][0].record["log"] in ("line one", "line two")
    assert by_tag["geely.prod"][0].time == 1518000002
    assert by_tag["geely.prod"][0].record["n"] == "7"  # stringified overflow
