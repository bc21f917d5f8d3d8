"""Smile binary-JSON codec (subset) for publish payloads.

The reference accepts publish payloads as `application/x-jackson-smile`
in addition to JSON (`atlas-pekko/.../CustomDirectives.scala:74-108`
routes by media type into a Smile parser; the payload structure itself is
identical, `PublishPayloads.scala`).  Smile is Jackson's public binary
JSON format (https://github.com/FasterXML/smile-format-specification);
this module implements the subset the publish payloads use — objects,
arrays, strings, integers, doubles, booleans, null — from the public
spec, with a decoder that additionally understands shared-name /
shared-value back references (Jackson enables shared names by default).

Pure-Python by design: a binary wire codec is the legitimate
Python-side case (same policy as the multimodal decoders) and runs
Arrow-batched via `mapInPandas` in `decode_smile_payloads`, never
row-at-a-time through the JVM bridge.
"""

from __future__ import annotations

import struct
from typing import Any

HEADER = b":)\n"

# header flag bits (4th byte, low nibble)
FLAG_SHARED_NAMES = 0x01
FLAG_SHARED_VALUES = 0x02
FLAG_RAW_BINARY = 0x04

_END_STRING = 0xFC


def _zigzag_encode(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _zigzag_decode(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _vint_encode(v: int) -> bytes:
    """Smile VInt: big-endian 7-bit chunks, MSB clear; the FINAL byte has
    MSB set and carries only the low SIX bits."""
    out = [0x80 | (v & 0x3F)]
    v >>= 6
    while v:
        out.append(v & 0x7F)
        v >>= 7
    return bytes(reversed(out))


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.shared_names: list[str] = []
        self.shared_values: list[str] = []

    def byte(self) -> int:
        b = self.data[self.pos]
        self.pos += 1
        return b

    def take(self, n: int) -> bytes:
        b = self.data[self.pos : self.pos + n]
        if len(b) != n:
            raise ValueError("truncated smile payload")
        self.pos += n
        return b

    def vint(self) -> int:
        acc = 0
        while True:
            b = self.byte()
            if b & 0x80:
                return (acc << 6) | (b & 0x3F)
            acc = (acc << 7) | b

    def until_end_marker(self) -> bytes:
        end = self.data.index(_END_STRING, self.pos)
        out = self.data[self.pos : end]
        self.pos = end + 1
        return out

    def seven_bit_chunks(self, n_chunks: int) -> int:
        acc = 0
        for _ in range(n_chunks):
            acc = (acc << 7) | (self.byte() & 0x7F)
        return acc


def _share_name(r: _Reader, name: str) -> str:
    if len(name.encode("utf-8")) <= 64:
        # Jackson resets the table at 1024 entries and restarts indices
        # from 0 (SmileGenerator._findSeenName / SmileParser); without
        # the reset a >1024-name document decodes back references
        # against the wrong slots, silently corrupting tag names.
        if len(r.shared_names) >= 1024:
            r.shared_names.clear()
        r.shared_names.append(name)
    return name


def _share_value(r: _Reader, s: str) -> str:
    if len(s.encode("utf-8")) <= 64:
        if len(r.shared_values) >= 1024:  # same Jackson reset rule
            r.shared_values.clear()
        r.shared_values.append(s)
    return s


def _read_key(r: _Reader, tok: int) -> str:
    if tok == 0x20:
        return ""
    if 0x30 <= tok <= 0x33:  # long shared name reference
        return r.shared_names[((tok & 0x03) << 8) | r.byte()]
    if tok == 0x34:  # long unicode name, end-marked
        return _share_name(r, r.until_end_marker().decode("utf-8"))
    if 0x40 <= tok <= 0x7F:  # short shared name reference
        return r.shared_names[tok - 0x40]
    if 0x80 <= tok <= 0xBF:  # short ASCII name, 1..64 bytes
        return _share_name(r, r.take(tok - 0x80 + 1).decode("ascii"))
    if 0xC0 <= tok <= 0xF7:  # short unicode name, 2..56 bytes
        return _share_name(r, r.take(tok - 0xC0 + 2).decode("utf-8"))
    raise ValueError(f"unsupported smile key token 0x{tok:02X}")


def _read_value(r: _Reader, tok: int) -> Any:
    if 0x01 <= tok <= 0x1F:  # short shared value reference
        return r.shared_values[tok - 1]
    if tok == 0x20:
        return ""
    if tok == 0x21:
        return None
    if tok == 0x22:
        return False
    if tok == 0x23:
        return True
    if tok in (0x24, 0x25):  # 32/64-bit zigzag vint
        return _zigzag_decode(r.vint())
    if tok == 0x28:  # float32: 5 x 7-bit chunks
        return struct.unpack(">f", (r.seven_bit_chunks(5) & 0xFFFFFFFF).to_bytes(4, "big"))[0]
    if tok == 0x29:  # float64: 10 x 7-bit chunks
        bits = r.seven_bit_chunks(10) & 0xFFFFFFFFFFFFFFFF
        return struct.unpack(">d", bits.to_bytes(8, "big"))[0]
    if 0x40 <= tok <= 0x5F:  # tiny ASCII, 1..32 bytes
        return _share_value(r, r.take(tok - 0x40 + 1).decode("ascii"))
    if 0x60 <= tok <= 0x7F:  # small ASCII, 33..64 bytes
        return _share_value(r, r.take(tok - 0x60 + 33).decode("ascii"))
    if 0x80 <= tok <= 0x9F:  # tiny unicode, 2..33 bytes
        return _share_value(r, r.take(tok - 0x80 + 2).decode("utf-8"))
    if 0xA0 <= tok <= 0xBF:  # short unicode, 34..65 bytes
        return _share_value(r, r.take(tok - 0xA0 + 34).decode("utf-8"))
    if 0xC0 <= tok <= 0xDF:  # small int, zigzag in low 5 bits
        return _zigzag_decode(tok - 0xC0)
    if tok == 0xE0:  # long ASCII, end-marked
        return r.until_end_marker().decode("ascii")
    if tok == 0xE4:  # long unicode, end-marked
        return r.until_end_marker().decode("utf-8")
    if 0xEC <= tok <= 0xEF:  # long shared value reference, 10-bit index
        return r.shared_values[((tok & 0x03) << 8) | r.byte()]
    if tok == 0xF8:  # array
        out = []
        while True:
            t = r.byte()
            if t == 0xF9:
                return out
            out.append(_read_value(r, t))
    if tok == 0xFA:  # object
        obj = {}
        while True:
            t = r.byte()
            if t == 0xFB:
                return obj
            key = _read_key(r, t)
            obj[key] = _read_value(r, r.byte())
    raise ValueError(f"unsupported smile value token 0x{tok:02X}")


def smile_decode(data: bytes) -> Any:
    """Decode one Smile document (the publish-payload subset)."""
    if data[:3] != HEADER:
        raise ValueError("not a smile payload (missing :)\\n header)")
    r = _Reader(data)
    r.pos = 4  # header + version/flags byte (flags only affect encoders)
    tok = r.byte()
    if tok == 0xFF:
        return None
    return _read_value(r, tok)


# ------------------------------------------------------------------ encoder


def _write_value(out: bytearray, v: Any) -> None:
    if v is None:
        out.append(0x21)
    elif v is True:
        out.append(0x23)
    elif v is False:
        out.append(0x22)
    elif isinstance(v, int):
        if -16 <= v <= 15:
            out.append(0xC0 + _zigzag_encode(v))
        else:
            out.append(0x24 if -(2**31) <= v < 2**31 else 0x25)
            out.extend(_vint_encode(_zigzag_encode(v)))
    elif isinstance(v, float):
        out.append(0x29)
        bits = struct.unpack(">Q", struct.pack(">d", v))[0]
        for shift in range(63, -1, -7):
            out.append((bits >> shift) & 0x7F)
    elif isinstance(v, str):
        b = v.encode("utf-8")
        if not b:
            out.append(0x20)
        elif v.isascii() and 1 <= len(b) <= 32:
            out.append(0x40 + len(b) - 1)
            out.extend(b)
        elif v.isascii() and len(b) <= 64:
            out.append(0x60 + len(b) - 33)
            out.extend(b)
        elif not v.isascii() and 2 <= len(b) <= 33:
            out.append(0x80 + len(b) - 2)
            out.extend(b)
        elif not v.isascii() and len(b) <= 64:
            out.append(0xA0 + len(b) - 34)
            out.extend(b)
        else:
            out.append(0xE0 if v.isascii() else 0xE4)
            out.extend(b)
            out.append(_END_STRING)
    elif isinstance(v, dict):
        out.append(0xFA)
        for k, val in v.items():
            _write_key(out, str(k))
            _write_value(out, val)
        out.append(0xFB)
    elif isinstance(v, (list, tuple)):
        out.append(0xF8)
        for item in v:
            _write_value(out, item)
        out.append(0xF9)
    else:
        raise TypeError(f"cannot smile-encode {type(v).__name__}")


def _write_key(out: bytearray, k: str) -> None:
    b = k.encode("utf-8")
    if not b:
        out.append(0x20)
    elif k.isascii() and len(b) <= 64:
        out.append(0x80 + len(b) - 1)
        out.extend(b)
    elif not k.isascii() and 2 <= len(b) <= 57:
        out.append(0xC0 + len(b) - 2)
        out.extend(b)
    else:
        out.append(0x34)
        out.extend(b)
        out.append(_END_STRING)


def smile_encode(obj: Any) -> bytes:
    """Encode to Smile with back-references disabled (flags=0) — every
    spec-conforming decoder accepts it; used by the round-trip tests."""
    out = bytearray(HEADER)
    out.append(0x00)  # version 0, no shared names/values, no raw binary
    _write_value(out, obj)
    return bytes(out)


# ------------------------------------------------------- Spark integration

PAYLOAD_FIELDS = "tags map<string,string>, timestamp long, value double"


def decode_smile_payloads(df, payload_col: str = "payload"):
    """Binary Smile publish payloads -> datapoint rows, Arrow-batched.

    Same output columns and common-tag merge semantics as the JSON
    `decode_publish_payloads` (metric tags win on collision; legacy
    start/values accepted; undecodable payloads surface as one all-null
    row for the reject audit path).
    """
    import pandas as pd

    def batches(it):
        for pdf in it:
            tags_out, ts_out, val_out = [], [], []

            def emit(tags, ts, val):
                tags_out.append(tags)
                ts_out.append(ts)
                val_out.append(val)

            for raw in pdf[payload_col]:
                try:
                    doc = smile_decode(bytes(raw))
                    common = doc.get("tags") or {}
                    metrics = doc.get("metrics") or []
                    if not metrics:
                        raise ValueError("no metrics")
                    for m in metrics:
                        tags = {**common, **(m.get("tags") or {})}
                        ts = m.get("timestamp", m.get("start"))
                        val = m.get("value", m.get("values"))
                        if isinstance(val, list):
                            val = val[0] if val else None
                        emit(
                            {str(k): str(v) for k, v in tags.items()},
                            None if ts is None else int(ts),
                            None if val is None else float(val),
                        )
                except Exception:
                    emit(None, None, None)
            yield pd.DataFrame(
                {"tags": tags_out, "timestamp": ts_out, "value": val_out}
            )

    return df.mapInPandas(batches, PAYLOAD_FIELDS)
