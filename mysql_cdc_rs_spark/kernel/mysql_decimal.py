"""MySQL packed NewDecimal decoder with exact string output.

Re-implemented from the publicly documented myisampack decimal layout
(strings of 9 decimal digits packed into 4 bytes big-endian, with a
compressed leading/trailing group, sign encoded by flipping the MSB of the
first byte; negative numbers stored as one's complement).
Parity target: /root/reference/binlog/src/row/decimal.rs:10-106 (C12) — the
reference (and MySQL itself) emits the value as an EXACT canonical string,
which we reproduce character-for-character; byte-parity tests rely on it.
"""

from __future__ import annotations

DIGITS_PER_GROUP = 9
# bytes needed to store N leftover decimal digits (index = N digits)
COMPRESSED_BYTES = [0, 1, 1, 2, 2, 3, 3, 4, 4, 4]


def decimal_binary_size(precision: int, scale: int) -> int:
    intg = precision - scale
    intg_groups, intg_rem = divmod(intg, DIGITS_PER_GROUP)
    frac_groups, frac_rem = divmod(scale, DIGITS_PER_GROUP)
    return (
        intg_groups * 4
        + COMPRESSED_BYTES[intg_rem]
        + frac_groups * 4
        + COMPRESSED_BYTES[frac_rem]
    )


def parse_decimal(buf: bytes, pos: int, precision: int, scale: int) -> tuple[str, int]:
    """Decode a packed decimal cell -> (exact canonical string, new_pos)."""
    size = decimal_binary_size(precision, scale)
    raw = bytearray(buf[pos : pos + size])
    if len(raw) < size:
        raise ValueError("decimal payload truncated")

    negative = (raw[0] & 0x80) == 0
    raw[0] ^= 0x80  # undo sign-bit flip
    if negative:
        for i in range(len(raw)):
            raw[i] ^= 0xFF  # undo one's complement

    intg = precision - scale
    intg_groups, intg_rem = divmod(intg, DIGITS_PER_GROUP)
    frac_groups, frac_rem = divmod(scale, DIGITS_PER_GROUP)

    p = 0
    int_digits = ""
    if intg_rem:
        n = COMPRESSED_BYTES[intg_rem]
        v = int.from_bytes(raw[p : p + n], "big")
        p += n
        int_digits += str(v).zfill(intg_rem)
    for _ in range(intg_groups):
        v = int.from_bytes(raw[p : p + 4], "big")
        p += 4
        int_digits += str(v).zfill(DIGITS_PER_GROUP)

    frac_digits = ""
    for _ in range(frac_groups):
        v = int.from_bytes(raw[p : p + 4], "big")
        p += 4
        frac_digits += str(v).zfill(DIGITS_PER_GROUP)
    if frac_rem:
        n = COMPRESSED_BYTES[frac_rem]
        v = int.from_bytes(raw[p : p + n], "big")
        p += n
        frac_digits += str(v).zfill(frac_rem)

    int_digits = int_digits.lstrip("0") or "0"
    out = int_digits + ("." + frac_digits if scale else "")
    if negative and (int_digits != "0" or any(c != "0" for c in frac_digits)):
        out = "-" + out
    return out, pos + size


def encode_decimal(value: str, precision: int, scale: int) -> bytes:
    """Inverse of parse_decimal — used by tests to build golden payloads."""
    negative = value.startswith("-")
    if negative:
        value = value[1:]
    int_part, _, frac_part = value.partition(".")
    intg = precision - scale
    int_part = int_part.zfill(intg)
    frac_part = frac_part.ljust(scale, "0")
    if len(int_part) > intg or len(frac_part) > scale:
        raise ValueError("value does not fit precision/scale")

    intg_groups, intg_rem = divmod(intg, DIGITS_PER_GROUP)
    frac_groups, frac_rem = divmod(scale, DIGITS_PER_GROUP)

    out = bytearray()
    idx = 0
    if intg_rem:
        out += int(int_part[:intg_rem] or "0").to_bytes(
            COMPRESSED_BYTES[intg_rem], "big"
        )
        idx = intg_rem
    for _ in range(intg_groups):
        out += int(int_part[idx : idx + 9]).to_bytes(4, "big")
        idx += 9
    idx = 0
    for _ in range(frac_groups):
        out += int(frac_part[idx : idx + 9]).to_bytes(4, "big")
        idx += 9
    if frac_rem:
        out += int(frac_part[idx : idx + frac_rem]).to_bytes(
            COMPRESSED_BYTES[frac_rem], "big"
        )
    if negative:
        for i in range(len(out)):
            out[i] ^= 0xFF
    out[0] ^= 0x80
    return bytes(out)
