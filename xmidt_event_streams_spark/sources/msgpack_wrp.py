"""MessagePack edge decoder for WRP envelopes (operator V1/V2).

The reference accepts WRP messages as JSON or MessagePack by
Content-Type (internal/event/request_handler.go:62-77). Spark has no
msgpack codec, so this is the one genuinely custom decode step
(SURVEY.md §7 'what's hard'): a minimal, dependency-free msgpack
subset codec (nil/bool/int/str/bin/array/map -- everything a WRP
envelope uses, per the msgpack spec at msgpack.org) wrapped in an
Arrow-batched mapInPandas so decoding stays at the edge and
everything downstream is columnar.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def msgpack_encode(obj) -> bytes:
    """Encode the WRP-subset object graph (used by tests and the
    round-trip contract; not a general-purpose encoder)."""
    out = bytearray()
    _enc(obj, out)
    return bytes(out)


def _enc(o, out: bytearray) -> None:
    if o is None:
        out.append(0xC0)
    elif o is True:
        out.append(0xC3)
    elif o is False:
        out.append(0xC2)
    elif isinstance(o, int):
        if 0 <= o <= 0x7F:
            out.append(o)
        elif -32 <= o < 0:
            out.append(0x100 + o)
        elif 0 <= o <= 0xFFFFFFFF:
            out.append(0xCE)
            out += struct.pack(">I", o)
        else:
            out.append(0xD3)
            out += struct.pack(">q", o)
    elif isinstance(o, str):
        b = o.encode("utf-8")
        if len(b) <= 31:
            out.append(0xA0 | len(b))
        else:
            out.append(0xDB)
            out += struct.pack(">I", len(b))
        out += b
    elif isinstance(o, (bytes, bytearray)):
        out.append(0xC6)
        out += struct.pack(">I", len(o))
        out += o
    elif isinstance(o, (list, tuple)):
        if len(o) <= 15:
            out.append(0x90 | len(o))
        else:
            out.append(0xDD)
            out += struct.pack(">I", len(o))
        for v in o:
            _enc(v, out)
    elif isinstance(o, dict):
        if len(o) <= 15:
            out.append(0x80 | len(o))
        else:
            out.append(0xDF)
            out += struct.pack(">I", len(o))
        for k, v in o.items():
            _enc(k, out)
            _enc(v, out)
    else:
        raise TypeError(f"unsupported msgpack type {type(o)}")


class MsgpackError(ValueError):
    pass


def msgpack_decode(data: bytes):
    """Decode one msgpack value; raises MsgpackError on malformed
    input (the 400-reject path, request_handler.go:108-119)."""
    try:
        val, pos = _dec(memoryview(data), 0)
    except (IndexError, struct.error) as exc:
        raise MsgpackError(f"truncated msgpack: {exc}") from exc
    if pos != len(data):
        raise MsgpackError(f"trailing bytes after msgpack value: {len(data) - pos}")
    return val


def _dec(b: memoryview, i: int):
    t = b[i]
    i += 1
    if t <= 0x7F:
        return t, i
    if t >= 0xE0:
        return t - 0x100, i
    if 0xA0 <= t <= 0xBF:
        n = t & 0x1F
        return bytes(b[i : i + n]).decode("utf-8"), i + n
    if 0x90 <= t <= 0x9F:
        return _dec_seq(b, i, t & 0x0F)
    if 0x80 <= t <= 0x8F:
        return _dec_map(b, i, t & 0x0F)
    if t == 0xC0:
        return None, i
    if t == 0xC2:
        return False, i
    if t == 0xC3:
        return True, i
    if t in (0xC4, 0xC5, 0xC6):  # bin 8/16/32
        w = {0xC4: 1, 0xC5: 2, 0xC6: 4}[t]
        n = int.from_bytes(b[i : i + w], "big")
        i += w
        return bytes(b[i : i + n]), i + n
    if t in (0xD9, 0xDA, 0xDB):  # str 8/16/32
        w = {0xD9: 1, 0xDA: 2, 0xDB: 4}[t]
        n = int.from_bytes(b[i : i + w], "big")
        i += w
        return bytes(b[i : i + n]).decode("utf-8"), i + n
    if t in (0xCC, 0xCD, 0xCE, 0xCF):  # uint 8/16/32/64
        w = 1 << (t - 0xCC)
        return int.from_bytes(b[i : i + w], "big"), i + w
    if t in (0xD0, 0xD1, 0xD2, 0xD3):  # int 8/16/32/64
        w = 1 << (t - 0xD0)
        return int.from_bytes(b[i : i + w], "big", signed=True), i + w
    if t in (0xDC, 0xDD):  # array 16/32
        w = 2 if t == 0xDC else 4
        n = int.from_bytes(b[i : i + w], "big")
        return _dec_seq(b, i + w, n)
    if t in (0xDE, 0xDF):  # map 16/32
        w = 2 if t == 0xDE else 4
        n = int.from_bytes(b[i : i + w], "big")
        return _dec_map(b, i + w, n)
    if t == 0xCA:  # float32
        return struct.unpack(">f", b[i : i + 4])[0], i + 4
    if t == 0xCB:  # float64
        return struct.unpack(">d", b[i : i + 8])[0], i + 8
    raise MsgpackError(f"unsupported msgpack type byte 0x{t:02x}")


def _dec_seq(b, i, n):
    out = []
    for _ in range(n):
        v, i = _dec(b, i)
        out.append(v)
    return out, i


def _dec_map(b, i, n):
    out = {}
    for _ in range(n):
        k, i = _dec(b, i)
        v, i = _dec(b, i)
        out[k] = v
    return out, i


_WRP_FIELDS = (
    ("msg_type", int),
    ("source", str),
    ("dest", str),
    ("transaction_uuid", str),
    ("content_type", str),
    ("session_id", str),
)


def decode_wrp_msgpack(
    df: DataFrame,
    payload_col: str = "raw",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Arrow-batched msgpack -> WRP columns. Malformed rows surface
    with msg_type = -1 and the error in decode_error (rejects-sink
    pattern instead of task failure). ``keep_cols`` ride along
    unchanged (transport provenance: topic/partition/offset)."""
    from xmidt_event_streams_spark.schema import WRP_SCHEMA

    out_schema = (
        "msg_type int, source string, dest string, transaction_uuid string, "
        "content_type string, session_id string, partner_ids array<string>, "
        "metadata map<string,string>, payload binary, decode_error string"
    )
    assert {f.name for f in WRP_SCHEMA.fields} <= {
        s.split()[0] for s in out_schema.split(", ")
    }
    if keep_cols:
        kept = {f.name: f for f in df.schema.fields}
        out_schema += ", " + ", ".join(
            f"{c} {kept[c].dataType.simpleString()}" for c in keep_cols
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for raw in pdf[payload_col]:
                try:
                    m = msgpack_decode(bytes(raw))
                    if not isinstance(m, dict):
                        raise MsgpackError("top-level value is not a map")
                    row = {}
                    for name, typ in _WRP_FIELDS:
                        v = m.get(name)
                        row[name] = v if isinstance(v, typ) else (
                            int(v) if name == "msg_type" and v is not None else None
                        )
                    row["msg_type"] = row["msg_type"] if row["msg_type"] is not None else 0
                    row["partner_ids"] = [
                        str(p) for p in m.get("partner_ids") or []
                    ]
                    row["metadata"] = {
                        str(k): str(v) for k, v in (m.get("metadata") or {}).items()
                    }
                    p = m.get("payload")
                    row["payload"] = bytes(p) if isinstance(p, (bytes, bytearray)) else (
                        str(p).encode() if p is not None else None
                    )
                    row["decode_error"] = None
                except (MsgpackError, UnicodeDecodeError) as exc:
                    row = {name: None for name, _ in _WRP_FIELDS}
                    row.update(
                        msg_type=-1, partner_ids=[], metadata={}, payload=None,
                        decode_error=str(exc),
                    )
                rows.append(row)
            out = pd.DataFrame(rows)
            for c in keep_cols:
                out[c] = pdf[c].values
            yield out

    return df.select(payload_col, *keep_cols).mapInPandas(batches, out_schema)
