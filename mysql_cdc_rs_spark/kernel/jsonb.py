"""MySQL binary JSON (JSONB) decoder — the nested-payload decoder.

Re-implemented from the publicly documented JSONB storage format
(https://dev.mysql.com/doc/dev/mysql-server/latest — json_binary.h layout:
type markers 0x00 small-object, 0x01 large-object, 0x02 small-array,
0x03 large-array, 0x04 literal, 0x05 int16, 0x06 uint16, 0x07 int32,
0x08 uint32, 0x09 int64, 0x0A uint64, 0x0B double, 0x0C utf8 string,
0x0F opaque).
Parity target: /root/reference/binlog/src/column/decoders/json.rs:18-190
(C13) and the path-extraction helpers (:229-305, C14).

Output is a plain Python object (dict/list/scalars) which the Spark layer
serializes with a canonical ``json.dumps`` so oracle and UDF agree byte-wise.
"""

from __future__ import annotations

import json
import struct
from typing import Any

T_SMALL_OBJECT = 0x00
T_LARGE_OBJECT = 0x01
T_SMALL_ARRAY = 0x02
T_LARGE_ARRAY = 0x03
T_LITERAL = 0x04
T_INT16 = 0x05
T_UINT16 = 0x06
T_INT32 = 0x07
T_UINT32 = 0x08
T_INT64 = 0x09
T_UINT64 = 0x0A
T_DOUBLE = 0x0B
T_STRING = 0x0C
T_OPAQUE = 0x0F

LITERAL_NULL = 0x00
LITERAL_TRUE = 0x01
LITERAL_FALSE = 0x02


def parse_jsonb(buf: bytes) -> Any:
    """Top-level JSONB value: 1-byte type marker + payload.

    Empty buffer decodes to None (MySQL stores SQL NULL as empty)."""
    if not buf:
        return None
    return _parse_value(buf[0], buf, 1)


def _read_varlen(buf: bytes, pos: int) -> tuple[int, int]:
    """Variable-length string size: 7 bits per byte, high bit = continuation."""
    n = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7


def _parse_value(vtype: int, buf: bytes, pos: int) -> Any:
    if vtype == T_LITERAL:
        lit = buf[pos]
        return {LITERAL_NULL: None, LITERAL_TRUE: True, LITERAL_FALSE: False}[lit]
    if vtype == T_INT16:
        return struct.unpack_from("<h", buf, pos)[0]
    if vtype == T_UINT16:
        return struct.unpack_from("<H", buf, pos)[0]
    if vtype == T_INT32:
        return struct.unpack_from("<i", buf, pos)[0]
    if vtype == T_UINT32:
        return struct.unpack_from("<I", buf, pos)[0]
    if vtype == T_INT64:
        return struct.unpack_from("<q", buf, pos)[0]
    if vtype == T_UINT64:
        return struct.unpack_from("<Q", buf, pos)[0]
    if vtype == T_DOUBLE:
        return struct.unpack_from("<d", buf, pos)[0]
    if vtype == T_STRING:
        n, pos = _read_varlen(buf, pos)
        return buf[pos : pos + n].decode("utf-8", "replace")
    if vtype in (T_SMALL_OBJECT, T_LARGE_OBJECT):
        return _parse_composite(buf, pos, is_object=True, large=vtype == T_LARGE_OBJECT)
    if vtype in (T_SMALL_ARRAY, T_LARGE_ARRAY):
        return _parse_composite(buf, pos, is_object=False, large=vtype == T_LARGE_ARRAY)
    if vtype == T_OPAQUE:
        n, p2 = _read_varlen(buf, pos + 1)
        return {"_opaque_type": buf[pos], "_hex": buf[p2 : p2 + n].hex()}
    raise ValueError(f"unknown JSONB type 0x{vtype:02x}")


def _parse_composite(buf: bytes, pos: int, is_object: bool, large: bool) -> Any:
    w = 4 if large else 2
    fmt = "<I" if large else "<H"
    count = struct.unpack_from(fmt, buf, pos)[0]
    # total size follows count; not needed for decode but part of the layout
    base = pos
    p = pos + 2 * w

    keys: list[str] = []
    if is_object:
        key_entries = []
        for _ in range(count):
            koff = struct.unpack_from(fmt, buf, p)[0]
            klen = struct.unpack_from("<H", buf, p + w)[0]
            key_entries.append((koff, klen))
            p += w + 2
        keys = [
            buf[base + ko : base + ko + kl].decode("utf-8", "replace")
            for ko, kl in key_entries
        ]

    values: list[Any] = []
    for _ in range(count):
        vtype = buf[p]
        # small scalars are inlined in the value entry; others are offsets
        if vtype in (T_LITERAL, T_INT16, T_UINT16) or (
            large and vtype in (T_INT32, T_UINT32)
        ):
            values.append(_parse_value(vtype, buf, p + 1))
        else:
            # Non-inlined values: the entry stores (type, offset) and the
            # offset points DIRECTLY at the payload — the type lives only in
            # the value entry (json_binary.h layout; no duplicated type byte).
            off = struct.unpack_from(fmt, buf, p + 1)[0]
            values.append(_parse_value(vtype, buf, base + off))
        p += 1 + w

    if is_object:
        return dict(zip(keys, values))
    return values


# ---------------------------------------------------------------------------
# Path extraction (C14): dotted paths with [i] array access, e.g.
# "user.name", "items[0].id" — mirrors JsonUtils::extract_by_path.
# ---------------------------------------------------------------------------

def extract_by_path(value: Any, path: str) -> Any:
    cur = value
    for part in path.split("."):
        while part:
            if "[" in part:
                name, _, rest = part.partition("[")
                idx_s, _, part = rest.partition("]")
                part = part.lstrip(".")
                if name:
                    if not isinstance(cur, dict) or name not in cur:
                        return None
                    cur = cur[name]
                i = int(idx_s)
                if not isinstance(cur, list) or i >= len(cur):
                    return None
                cur = cur[i]
            else:
                if not isinstance(cur, dict) or part not in cur:
                    return None
                cur = cur[part]
                part = ""
    return cur


def canonical_json(value: Any) -> str:
    """Deterministic JSON text — same bytes from UDF and oracle."""
    return json.dumps(value, ensure_ascii=False, sort_keys=True, separators=(",", ":"))


# --- encoder (tests build golden payloads with it) -------------------------

def encode_jsonb(value: Any) -> bytes:
    """Encode a Python object to JSONB bytes (inverse of parse_jsonb)."""
    t, payload = _encode_value(value)
    return bytes([t]) + payload


def _encode_varlen(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode_value(v: Any) -> tuple[int, bytes]:
    if v is None:
        return T_LITERAL, bytes([LITERAL_NULL])
    if v is True:
        return T_LITERAL, bytes([LITERAL_TRUE])
    if v is False:
        return T_LITERAL, bytes([LITERAL_FALSE])
    if isinstance(v, int):
        if -(2**15) <= v < 2**15:
            return T_INT16, struct.pack("<h", v)
        if -(2**31) <= v < 2**31:
            return T_INT32, struct.pack("<i", v)
        return T_INT64, struct.pack("<q", v)
    if isinstance(v, float):
        return T_DOUBLE, struct.pack("<d", v)
    if isinstance(v, str):
        raw = v.encode("utf-8")
        return T_STRING, _encode_varlen(len(raw)) + raw
    if isinstance(v, dict):
        return _encode_composite(v, is_object=True)
    if isinstance(v, (list, tuple)):
        return _encode_composite(list(v), is_object=False)
    raise TypeError(f"cannot encode {type(v)}")


def _encode_composite(v: Any, is_object: bool) -> tuple[int, bytes]:
    # Always use the "small" format (2-byte offsets) — fine for test payloads.
    w = 2
    items = sorted(v.items()) if is_object else [(None, x) for x in v]
    count = len(items)

    header_len = 2 * w + (w + 2) * count if is_object else 2 * w
    value_entries_len = (1 + w) * count
    fixed = header_len + value_entries_len

    key_blob = bytearray()
    key_entries = []
    if is_object:
        for k, _ in items:
            raw = k.encode("utf-8")
            key_entries.append((fixed + len(key_blob), len(raw)))
            key_blob += raw

    val_blob = bytearray()
    val_entries = []
    data_base = fixed + len(key_blob)
    for _, item in items:
        t, payload = _encode_value(item)
        if t in (T_LITERAL, T_INT16, T_UINT16):
            val_entries.append(bytes([t]) + payload.ljust(w, b"\0"))
        else:
            off = data_base + len(val_blob)
            val_entries.append(bytes([t]) + struct.pack("<H", off))
            val_blob += payload  # payload only — type lives in the entry

    total = data_base + len(val_blob)
    out = bytearray(struct.pack("<HH", count, total))
    for ko, kl in key_entries:
        out += struct.pack("<HH", ko, kl)
    for ve in val_entries:
        out += ve
    out += key_blob
    out += val_blob
    # inline entries carry (type, value) not (type, offset); offsets above are
    # relative to the start of this composite (base = its first count byte).
    t = T_SMALL_OBJECT if is_object else T_SMALL_ARRAY
    return t, bytes(out)
