"""Fluentd forward-protocol wire decode (reference
``internal/recvs/fluentd.go`` wire loop, ~:123-206 read path): each frame is
a msgpack message ``[tag, [[time, record], ...]]`` (the public fluentd
Forward spec); the receiver explodes it into one row per event and resolves
the tag.

The environment ships no msgpack library, so the codec is a PURE-PYTHON
msgpack SUBSET (the types the forward protocol uses: nil/bool, ints, float64,
str, bin, array, map) — deterministic, dependency-free, and exercised both
directions in tests (encode->decode round-trip plus hand-written golden
bytes).  Decode runs inside ``mapInPandas`` (Arrow batches of binary frames;
wire parsing is inherently per-row).  At real scale this step belongs in a
connector (the kafka source, ``streaming/kafka_source.py``) or a codegen'd
decoder — the semantics and row shape are what this module pins.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, types as T

# ---------------------------------------------------------------------------
# msgpack subset codec
# ---------------------------------------------------------------------------


def mp_pack(obj) -> bytes:
    """Encode the msgpack subset (used by tests + fixtures)."""
    if obj is None:
        return b"\xc0"
    if obj is True:
        return b"\xc3"
    if obj is False:
        return b"\xc2"
    if isinstance(obj, int):
        if 0 <= obj < 128:
            return struct.pack("B", obj)
        if -32 <= obj < 0:
            return struct.pack("b", obj)
        if obj >= 0:
            return b"\xcf" + struct.pack(">Q", obj)
        return b"\xd3" + struct.pack(">q", obj)
    if isinstance(obj, float):
        return b"\xcb" + struct.pack(">d", obj)
    if isinstance(obj, str):
        b = obj.encode("utf-8")
        if len(b) < 32:
            return struct.pack("B", 0xA0 | len(b)) + b
        return b"\xdb" + struct.pack(">I", len(b)) + b
    if isinstance(obj, (bytes, bytearray)):
        return b"\xc6" + struct.pack(">I", len(obj)) + bytes(obj)
    if isinstance(obj, (list, tuple)):
        if len(obj) < 16:
            head = struct.pack("B", 0x90 | len(obj))
        else:
            head = b"\xdd" + struct.pack(">I", len(obj))
        return head + b"".join(mp_pack(x) for x in obj)
    if isinstance(obj, dict):
        if len(obj) < 16:
            head = struct.pack("B", 0x80 | len(obj))
        else:
            head = b"\xdf" + struct.pack(">I", len(obj))
        return head + b"".join(mp_pack(k) + mp_pack(v) for k, v in obj.items())
    raise TypeError(f"unsupported type: {type(obj)}")


def mp_unpack(buf: bytes, pos: int = 0):
    """Decode one msgpack object at ``pos``; returns (obj, next_pos)."""
    b = buf[pos]
    pos += 1
    if b <= 0x7F:  # positive fixint
        return b, pos
    if b >= 0xE0:  # negative fixint
        return b - 256, pos
    if 0xA0 <= b <= 0xBF:  # fixstr
        n = b & 0x1F
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if 0x90 <= b <= 0x9F:  # fixarray
        return _unpack_array(buf, pos, b & 0x0F)
    if 0x80 <= b <= 0x8F:  # fixmap
        return _unpack_map(buf, pos, b & 0x0F)
    if b == 0xC0:
        return None, pos
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b in (0xC4, 0xC5, 0xC6):  # bin8/16/32
        w = {0xC4: "B", 0xC5: ">H", 0xC6: ">I"}[b]
        n = struct.unpack_from(w, buf, pos)[0]
        pos += struct.calcsize(w)
        return bytes(buf[pos : pos + n]), pos + n
    if b in (0xCC, 0xCD, 0xCE, 0xCF):  # uint8/16/32/64
        w = {0xCC: "B", 0xCD: ">H", 0xCE: ">I", 0xCF: ">Q"}[b]
        return struct.unpack_from(w, buf, pos)[0], pos + struct.calcsize(w)
    if b in (0xD0, 0xD1, 0xD2, 0xD3):  # int8/16/32/64
        w = {0xD0: "b", 0xD1: ">h", 0xD2: ">i", 0xD3: ">q"}[b]
        return struct.unpack_from(w, buf, pos)[0], pos + struct.calcsize(w)
    if b == 0xCA:  # float32
        return struct.unpack_from(">f", buf, pos)[0], pos + 4
    if b == 0xCB:  # float64
        return struct.unpack_from(">d", buf, pos)[0], pos + 8
    if b in (0xD9, 0xDA, 0xDB):  # str8/16/32
        w = {0xD9: "B", 0xDA: ">H", 0xDB: ">I"}[b]
        n = struct.unpack_from(w, buf, pos)[0]
        pos += struct.calcsize(w)
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if b in (0xDC, 0xDD):  # array16/32
        w = {0xDC: ">H", 0xDD: ">I"}[b]
        n = struct.unpack_from(w, buf, pos)[0]
        return _unpack_array(buf, pos + struct.calcsize(w), n)
    if b in (0xDE, 0xDF):  # map16/32
        w = {0xDE: ">H", 0xDF: ">I"}[b]
        n = struct.unpack_from(w, buf, pos)[0]
        return _unpack_map(buf, pos + struct.calcsize(w), n)
    raise ValueError(f"unsupported msgpack byte 0x{b:02x} at {pos - 1}")


def _unpack_array(buf, pos, n):
    out = []
    for _ in range(n):
        v, pos = mp_unpack(buf, pos)
        out.append(v)
    return out, pos


def _unpack_map(buf, pos, n):
    out = {}
    for _ in range(n):
        k, pos = mp_unpack(buf, pos)
        v, pos = mp_unpack(buf, pos)
        out[k] = v
    return out, pos


# ---------------------------------------------------------------------------
# forward-protocol frame -> rows
# ---------------------------------------------------------------------------

WIRE_ROW_SCHEMA = T.StructType(
    [
        T.StructField("tag", T.StringType()),
        T.StructField("time", T.LongType()),
        T.StructField("record", T.MapType(T.StringType(), T.StringType())),
    ]
)


def _frame_events(msg) -> list[tuple]:
    """One decoded Forward message -> [(tag, time, record), ...], handling
    the protocol's THREE wire variants (fluentd.go:209-342):

    - Message mode:       ``[tag, time, record]``
    - Forward mode:       ``[tag, [[time, record], ...]]``
    - PackedForward mode: ``[tag, <binary blob of concatenated msgpack
                            [time, record] entries>]``
    A trailing option element (``[tag, entries, {chunk: ...}]``) is ignored.
    """
    tag = str(msg[0])
    body = msg[1]
    if isinstance(body, (int, float)):  # Message mode: [tag, time, record]
        return [(tag, int(body), msg[2])]
    if isinstance(body, (bytes, bytearray)):  # PackedForward
        out, pos = [], 0
        blob = bytes(body)
        while pos < len(blob):
            entry, pos = mp_unpack(blob, pos)
            out.append((tag, int(entry[0]), entry[1]))
        return out
    return [(tag, int(ts), record) for ts, record in body]  # Forward


def decode_forward_frames(df: DataFrame, frame_col: str = "frame") -> DataFrame:
    """Binary Forward frames -> one row per event (fluentd.go's
    per-connection decode loop; all three wire variants).  Undecodable
    frames are DISCARDED (the reference logs + drops bad wire data); record
    values stringify into the declared map<string,string> overflow."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for frame in pdf[frame_col]:
                try:
                    msg, _ = mp_unpack(bytes(frame))
                    for tag, ts, record in _frame_events(msg):
                        rows.append(
                            (tag, ts, {str(k): str(v) for k, v in record.items()})
                        )
                except Exception:
                    continue  # bad wire data: drop (fluentd.go decode-err path)
            yield pd.DataFrame(rows, columns=["tag", "time", "record"])

    return df.select(frame_col).mapInPandas(run, WIRE_ROW_SCHEMA)
