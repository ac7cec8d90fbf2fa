"""Typed row decoding: packed row image -> list of typed cells.

This is the reference's core row loop — null-bitmap read, then per-column
dispatch on (type code, metadata) through the scalar decoders
(/root/reference/binlog/src/row/parser.rs:236-283, parse_cell :732-793;
fixture semantics /root/reference/tests/src/binlog/test_8_0.rs:72-135).
Re-implemented from the public MySQL row-based-replication format.

Used for binlog-style payloads (golden tests mirror the reference fixtures)
and exposed to Spark as a mapInPandas decoder; the web-pipeline hot path
doesn't need it, but reference users decoding actual row events do.
"""

from __future__ import annotations

from typing import Any

from mysql_cdc_rs_spark.kernel import mysql_decimal, temporal, varint
from mysql_cdc_rs_spark.kernel.jsonb import canonical_json, parse_jsonb

# MySQL column type codes (public protocol constants)
T_DECIMAL = 0
T_TINY = 1
T_SHORT = 2
T_LONG = 3
T_FLOAT = 4
T_DOUBLE = 5
T_NULL = 6
T_TIMESTAMP = 7
T_LONGLONG = 8
T_INT24 = 9
T_DATE = 10
T_TIME = 11
T_DATETIME = 12
T_YEAR = 13
T_VARCHAR = 15
T_BIT = 16
T_TIMESTAMP2 = 17
T_DATETIME2 = 18
T_TIME2 = 19
T_JSON = 245
T_NEWDECIMAL = 246
T_ENUM = 247
T_SET = 248
T_TINY_BLOB = 249
T_MEDIUM_BLOB = 250
T_LONG_BLOB = 251
T_BLOB = 252
T_VAR_STRING = 253
T_STRING = 254
T_GEOMETRY = 255

_INT_WIDTH = {T_TINY: 1, T_SHORT: 2, T_INT24: 3, T_LONG: 4, T_LONGLONG: 8}


def decode_row(
    buf: bytes,
    column_types: list[int],
    column_meta: list[int],
    pos: int = 0,
    signedness: list[bool] | None = None,
    charset: str = "utf-8",
) -> tuple[list[Any], int]:
    """Decode one row image. Returns (cells, new_pos).

    column_meta[i]: the per-type metadata word (length for strings, fsp for
    temporal2, (precision<<8)|scale for NEWDECIMAL, length-bytes for BLOB,
    bit count for BIT, packed C17 word for STRING).
    signedness[i]: True = signed (default) — mirrors the reference's
    unsigned split (column_parser.rs:159-191).
    """
    ncols = len(column_types)
    nulls, pos = varint.read_bitmap_le(buf, pos, ncols)
    cells: list[Any] = []
    for i, t in enumerate(column_types):
        if nulls[i]:
            cells.append(None)
            continue
        cell, new_pos = _decode_cell(
            buf,
            pos,
            t,
            column_meta[i],
            signed=(signedness[i] if signedness else True),
            charset=charset,
        )
        if new_pos > len(buf):
            # int.from_bytes on a short slice silently zero-fills; surface
            # truncation as an error instead (the reference's UnexpectedEof,
            # bytes_binlog_reader.rs:94-101) — callers turn it into an
            # error row, never a crash on the hot path
            raise ValueError(f"row payload truncated at column {i}")
        pos = new_pos
        cells.append(cell)
    return cells, pos


def _decode_cell(buf, pos, t, meta, signed, charset):
    if t in _INT_WIDTH:
        w = _INT_WIDTH[t]
        v = int.from_bytes(buf[pos : pos + w], "little", signed=signed)
        return v, pos + w
    if t == T_FLOAT:
        import struct

        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == T_DOUBLE:
        import struct

        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t == T_YEAR:
        return temporal.parse_year(buf, pos)
    if t == T_DATE:
        return temporal.parse_date(buf, pos)
    if t == T_TIME:
        return temporal.parse_time(buf, pos)
    if t == T_TIME2:
        return temporal.parse_time2(buf, pos, meta)
    if t == T_DATETIME:
        return temporal.parse_datetime(buf, pos)
    if t == T_DATETIME2:
        return temporal.parse_datetime2(buf, pos, meta)
    if t == T_TIMESTAMP:
        return temporal.parse_timestamp(buf, pos)
    if t == T_TIMESTAMP2:
        return temporal.parse_timestamp2(buf, pos, meta)
    if t == T_NEWDECIMAL:
        precision, scale = meta >> 8, meta & 0xFF
        return mysql_decimal.parse_decimal(buf, pos, precision, scale)
    if t in (T_VARCHAR, T_VAR_STRING):
        raw, pos = varint.parse_string(buf, pos, meta)
        return raw.decode(charset, "replace"), pos
    if t == T_STRING:
        real_t, length = varint.actual_string_type(meta >> 8, meta & 0xFF)
        if real_t == T_ENUM:
            w = 1 if length < 256 else 2
            return int.from_bytes(buf[pos : pos + w], "little"), pos + w
        if real_t == T_SET:
            return int.from_bytes(buf[pos : pos + length], "little"), pos + length
        raw, pos = varint.parse_string(buf, pos, length)
        return raw.decode(charset, "replace"), pos
    if t == T_BIT:
        nbits = ((meta >> 8) * 8) + (meta & 0xFF)
        return varint.parse_bit(buf, pos, nbits)
    if t in (T_TINY_BLOB, T_MEDIUM_BLOB, T_LONG_BLOB, T_BLOB, T_GEOMETRY):
        len_bytes = meta or {T_TINY_BLOB: 1, T_MEDIUM_BLOB: 3,
                             T_LONG_BLOB: 4, T_BLOB: 2}[t]
        return varint.parse_blob(buf, pos, len_bytes)
    if t == T_JSON:
        raw, pos = varint.parse_blob(buf, pos, meta or 4)
        return canonical_json(parse_jsonb(raw)), pos
    raise ValueError(f"unsupported column type {t}")


# --- encoder (tests build golden row payloads) ------------------------------

def encode_row(
    cells: list[Any],
    column_types: list[int],
    column_meta: list[int],
    signedness: list[bool] | None = None,
    charset: str = "utf-8",
) -> bytes:
    """Inverse of decode_row for the supported fixture types."""
    import struct

    ncols = len(cells)
    nbytes = (ncols + 7) // 8
    bitmap = bytearray(nbytes)
    body = bytearray()
    for i, (v, t) in enumerate(zip(cells, column_types)):
        if v is None:
            bitmap[i >> 3] |= 1 << (i & 7)
            continue
        signed = signedness[i] if signedness else True
        meta = column_meta[i]
        if t in _INT_WIDTH:
            body += int(v).to_bytes(_INT_WIDTH[t], "little", signed=signed)
        elif t == T_FLOAT:
            body += struct.pack("<f", v)
        elif t == T_DOUBLE:
            body += struct.pack("<d", v)
        elif t in (T_VARCHAR, T_VAR_STRING):
            raw = v.encode(charset)
            body += (
                len(raw).to_bytes(1, "little")
                if meta < 256
                else len(raw).to_bytes(2, "little")
            ) + raw
        elif t == T_NEWDECIMAL:
            body += mysql_decimal.encode_decimal(v, meta >> 8, meta & 0xFF)
        elif t == T_YEAR:
            body += bytes([v - 1900])
        elif t == T_DATE:
            y, mo, d = v
            body += ((y << 9) | (mo << 5) | d).to_bytes(3, "little")
        elif t == T_TIME2:
            h, mi, s, micros = v
            body += ((1 << 23) | (h << 12) | (mi << 6) | s).to_bytes(3, "big")
            body += _encode_fractional(micros, meta)
        elif t == T_DATETIME2:
            y, mo, d, h, mi, s, micros = v
            packed = (
                ((y * 13 + mo) << 22) | (d << 17) | (h << 12) | (mi << 6) | s
            )
            body += (packed | (1 << 39)).to_bytes(5, "big")  # sign bit set
            body += _encode_fractional(micros, meta)
        elif t == T_TIMESTAMP2:
            secs, micros = divmod(int(v), 1_000_000)
            body += secs.to_bytes(4, "big") + _encode_fractional(micros, meta)
        elif t == T_STRING:
            real_t, length = varint.actual_string_type(meta >> 8, meta & 0xFF)
            if real_t == T_ENUM:
                w = 1 if length < 256 else 2
                body += int(v).to_bytes(w, "little")
            elif real_t == T_SET:
                body += int(v).to_bytes(length, "little")
            else:
                raw = v.encode(charset)
                body += len(raw).to_bytes(
                    1 if length < 256 else 2, "little"
                ) + raw
        else:
            raise ValueError(f"encode_row: unsupported type {t}")
    return bytes(bitmap) + bytes(body)


def _encode_fractional(micros: int, fsp: int) -> bytes:
    """Inverse of temporal.parse_fractional: (fsp+1)//2 bytes big-endian in
    units of 100^(3-nbytes) — sub-unit precision is truncated, exactly as
    MySQL stores it."""
    nbytes = (fsp + 1) // 2
    if nbytes == 0:
        return b""
    return (int(micros) // (100 ** (3 - nbytes))).to_bytes(nbytes, "big")
