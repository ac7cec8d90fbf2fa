"""Pure-Column decoders — everything Catalyst can whole-stage-codegen.

These are the JVM-side (zero-Python) equivalents of the kernel's fixed-width
scalar decoders (SURVEY §2.4 C6-C11): bit-packed MySQL date/time/datetime
words decoded with shifts and masks as Column expressions.  Used both by the
pipeline and by driver-contract queries (each has a DuckDB oracle with the
same arithmetic).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def mysql_year(col: Column) -> Column:
    """YEAR byte -> 1900 + v  (kernel C6)."""
    return (F.lit(1900) + col).cast("int")


def mysql_date(col: Column) -> Column:
    """Bit-packed DATE u24 -> DateType: bits 0-4 day, 5-8 month, 9+ year (C7)."""
    return F.make_date(
        F.shiftright(col, 9), F.shiftright(col, 5).bitwiseAND(F.lit(0x0F)),
        col.bitwiseAND(F.lit(0x1F)),
    )


def mysql_time_seconds(col: Column) -> Column:
    """Legacy TIME decimal-packed HHMMSS int -> seconds since midnight (C8)."""
    h = (col / 10000).cast("long")
    m = ((col / 100) % 100).cast("long")
    s = (col % 100).cast("long")
    return (h * 3600 + m * 60 + s).alias("seconds")


def mysql_time2_parts(col: Column) -> tuple[Column, Column, Column]:
    """TIME2 24-bit BE word -> (hour, minute, second) via shifts (C8)."""
    hour = F.shiftright(col, 12).bitwiseAND(F.lit(0x3FF))
    minute = F.shiftright(col, 6).bitwiseAND(F.lit(0x3F))
    second = col.bitwiseAND(F.lit(0x3F))
    return hour, minute, second


def mysql_datetime(col: Column) -> Column:
    """Legacy DATETIME u64 decimal-packed YYYYMMDDHHMMSS -> timestamp (C9)."""
    d = (col / F.lit(1000000)).cast("long")
    t = (col % F.lit(1000000)).cast("long")
    return F.make_timestamp(
        (d / 10000).cast("int"),
        ((d / 100) % 100).cast("int"),
        (d % 100).cast("int"),
        (t / 10000).cast("int"),
        ((t / 100) % 100).cast("int"),
        (t % 100).cast("decimal(8,6)"),
    )


def mysql_datetime2(col: Column) -> Column:
    """DATETIME2 40-bit word (sign cleared) -> timestamp via bit fields (C9)."""
    v = col.bitwiseAND(F.lit((1 << 39) - 1))
    ym = F.shiftright(v, 22).bitwiseAND(F.lit(0x1FFFF))
    return F.make_timestamp(
        (ym / 13).cast("int"),
        (ym % 13).cast("int"),
        F.shiftright(v, 17).bitwiseAND(F.lit(0x1F)).cast("int"),
        F.shiftright(v, 12).bitwiseAND(F.lit(0x1F)).cast("int"),
        F.shiftright(v, 6).bitwiseAND(F.lit(0x3F)).cast("int"),
        v.bitwiseAND(F.lit(0x3F)).cast("decimal(8,6)"),
    )


def mysql_timestamp(col: Column) -> Column:
    """Epoch-seconds u32 -> TimestampType (C10)."""
    return F.timestamp_seconds(col)


def fractional_micros(col: Column, fsp: int) -> Column:
    """Stored fractional value -> microseconds: v * 100^(3-bytes) (C11)."""
    nbytes = (fsp + 1) // 2
    return (col * F.lit(100 ** (3 - nbytes))).cast("long")


def tld_of_url(url: Column) -> Column:
    """https://host.tld/path -> tld (enrichment join key)."""
    host = F.parse_url(url, F.lit("HOST"))
    return F.substring_index(host, ".", -1)


def host_of_url(url: Column) -> Column:
    return F.parse_url(url, F.lit("HOST"))


def salted_key(key: Column, unique: Column, salt_buckets: int) -> Column:
    """Skew salt: composite of the hot key and a deterministic per-row bucket.

    ``unique`` must be a (mostly) row-unique column such as url — salting
    must be deterministic so a resumed stage re-produces the same partitions
    (checkpoint-resume contract, SURVEY §4 custom-work item 3).
    """
    return F.concat_ws(
        "#", key, F.pmod(F.xxhash64(unique), F.lit(salt_buckets)).cast("string")
    )


def classify_sql_col(sql: Column) -> Column:
    """Column-expression twin of kernel.ddl.classify_sql (F4) — keeps the
    cheap DDL/DML/TCL prefilter JVM-side so only DDL rows reach the Python
    parser (the reference's cost dodge, query_parser.rs:25-28)."""
    return (
        F.when(
            sql.rlike(r"^\s*(?i)(CREATE|ALTER|DROP|TRUNCATE|RENAME)\s+(?i)(TABLE|DATABASE|INDEX|VIEW)"),
            "ddl",
        )
        .when(sql.rlike(r"^\s*(?i)(INSERT|UPDATE|DELETE|REPLACE)\b"), "dml")
        .when(sql.rlike(r"^\s*(?i)(BEGIN|COMMIT|ROLLBACK|XA)\b"), "tcl")
        .otherwise("other")
    )
