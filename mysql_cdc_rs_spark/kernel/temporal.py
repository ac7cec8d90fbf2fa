"""MySQL packed temporal decoders (DATE, TIME/TIME2, DATETIME/DATETIME2,
TIMESTAMP/TIMESTAMP2, YEAR, fractional seconds).

Re-implemented from the public MySQL internals documentation
(https://dev.mysql.com/doc/refman/8.0/en/storage-requirements.html and the
libbinlogevents field descriptions).  Parity targets:
- parse_year       <- /root/reference/binlog/src/utils.rs:332-334 (C6)
- parse_date       <- /root/reference/binlog/src/utils.rs:336-349 (C7)
- parse_time(2)    <- /root/reference/binlog/src/utils.rs:351-399 (C8)
- parse_datetime(2)<- /root/reference/binlog/src/utils.rs:401-448 (C9)
- parse_timestamp(2)<-/root/reference/binlog/src/utils.rs:450-460 (C10)
- fractional part  <- /root/reference/binlog/src/utils.rs:462-470 (C11)

Outputs are plain tuples/ints (not datetime objects) so the vectorized layer
can keep them in numpy and so invalid in-range-free values (e.g. month 0)
round-trip without exceptions.
"""

from __future__ import annotations


def parse_year(buf: bytes, pos: int) -> tuple[int, int]:
    """YEAR: single byte offset from 1900."""
    return 1900 + buf[pos], pos + 1


def parse_date(buf: bytes, pos: int) -> tuple[tuple[int, int, int], int]:
    """DATE: u24 LE; bits 0-4 day, 5-8 month, 9+ year."""
    v = int.from_bytes(buf[pos : pos + 3], "little")
    return (v >> 9, (v >> 5) & 0x0F, v & 0x1F), pos + 3


def parse_time(buf: bytes, pos: int) -> tuple[tuple[int, int, int], int]:
    """Legacy TIME: i24 LE holding decimal-packed HHMMSS."""
    v = int.from_bytes(buf[pos : pos + 3], "little")
    return (v // 10000, (v // 100) % 100, v % 100), pos + 3


def parse_time2(
    buf: bytes, pos: int, fsp: int
) -> tuple[tuple[int, int, int, int], int]:
    """TIME2: 3-byte big-endian bit-packed + fractional.

    Layout (MSB first): 1 sign bit, 1 reserved? no — documented as
    1 sign, 10 hour, 6 minute, 6 second (total 23 bits of a 24-bit BE int).
    Negative TIME is intentionally unsupported — the reference raises the
    same limitation (/root/reference/binlog/src/utils.rs:354-357,377-386);
    we surface it as ValueError which the row decoder converts to an error
    cell (never a crash).
    """
    v = int.from_bytes(buf[pos : pos + 3], "big")
    pos += 3
    sign = (v >> 23) & 1
    if sign == 0:
        raise ValueError("negative TIME2 unsupported")
    hour = (v >> 12) & 0x3FF
    minute = (v >> 6) & 0x3F
    second = v & 0x3F
    micros, pos = parse_fractional(buf, pos, fsp)
    return (hour, minute, second, micros), pos


def parse_datetime(
    buf: bytes, pos: int
) -> tuple[tuple[int, int, int, int, int, int], int]:
    """Legacy DATETIME: u64 LE decimal-packed YYYYMMDDHHMMSS."""
    v = int.from_bytes(buf[pos : pos + 8], "little")
    d, t = divmod(v, 1_000_000)
    return (
        (d // 10000, (d // 100) % 100, d % 100, t // 10000, (t // 100) % 100, t % 100),
        pos + 8,
    )


def parse_datetime2(
    buf: bytes, pos: int, fsp: int
) -> tuple[tuple[int, int, int, int, int, int, int], int]:
    """DATETIME2: 5-byte big-endian.

    Layout (after clearing the sign bit): 17 bits year*13+month, 5 day,
    5 hour, 6 minute, 6 second; then fractional.
    """
    v = int.from_bytes(buf[pos : pos + 5], "big")
    pos += 5
    v &= (1 << 39) - 1  # clear sign bit (bit 39)
    year_month = (v >> 22) & 0x1FFFF
    year, month = divmod(year_month, 13)
    day = (v >> 17) & 0x1F
    hour = (v >> 12) & 0x1F
    minute = (v >> 6) & 0x3F
    second = v & 0x3F
    micros, pos = parse_fractional(buf, pos, fsp)
    return (year, month, day, hour, minute, second, micros), pos


def parse_timestamp(buf: bytes, pos: int) -> tuple[int, int]:
    """Legacy TIMESTAMP: u32 LE epoch seconds -> epoch millis."""
    return int.from_bytes(buf[pos : pos + 4], "little") * 1000, pos + 4


def parse_timestamp2(buf: bytes, pos: int, fsp: int) -> tuple[int, int]:
    """TIMESTAMP2: u32 BIG-endian epoch seconds + fractional -> epoch micros."""
    secs = int.from_bytes(buf[pos : pos + 4], "big")
    pos += 4
    micros, pos = parse_fractional(buf, pos, fsp)
    return secs * 1_000_000 + micros, pos


def parse_fractional(buf: bytes, pos: int, fsp: int) -> tuple[int, int]:
    """Fractional seconds: (fsp+1)//2 bytes big-endian, scaled to micros.

    Stored value is in units of 100^(3-len); returns microseconds.
    """
    nbytes = (fsp + 1) // 2
    if nbytes == 0:
        return 0, pos
    raw = int.from_bytes(buf[pos : pos + nbytes], "big")
    return raw * (100 ** (3 - nbytes)), pos + nbytes
