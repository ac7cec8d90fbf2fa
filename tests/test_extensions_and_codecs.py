"""Tests for the extension registry (§2.12), relay segments (S7/S8/F6),
DDL parsing (P7/F4), WKB geometry (C15), string-meta fixup (C17)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from mysql_cdc_rs_spark.kernel import registry as reg
from mysql_cdc_rs_spark.kernel.ddl import classify_sql, parse_create_table
from mysql_cdc_rs_spark.kernel.decode import decode_page
from mysql_cdc_rs_spark.kernel.geometry import encode_point, parse_mysql_geometry
from mysql_cdc_rs_spark.kernel.varint import actual_string_type
from mysql_cdc_rs_spark.sources import relay_segments as RS


# --- extension registry -------------------------------------------------------

@pytest.fixture(autouse=True)
def _clean_registry():
    reg.clear_extensions()
    yield
    reg.clear_extensions()


def _raw_json_page(body: bytes) -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: application/json\r\n\r\n" + body
    )


def test_custom_mime_decoder_changes_dispatch():
    # built-in: application/json is opaque binary
    assert decode_page(_raw_json_page(b'{"a":1}'))["event_type"] == "binary"

    @reg.register_mime_decoder("application/json")
    def dec(body, charset):
        return {"event_type": "json", "text": body.decode("utf-8")}

    d = decode_page(_raw_json_page(b'{"a":1}'))
    assert (d["event_type"], d["text"]) == ("json", '{"a":1}')
    assert d["route"] == "content_binary"  # unmapped type -> default route
    reg.register_route("json", "content_json")
    assert decode_page(_raw_json_page(b"{}"))["route"] == "content_json"


def test_extension_priority_and_crash_isolation():
    calls = []

    @reg.register_mime_decoder("application/json", priority=1)
    def low(body, charset):
        calls.append("low")
        return {"event_type": "json"}

    @reg.register_mime_decoder("application/json", priority=5)
    def high(body, charset):
        calls.append("high")
        return {"event_type": "json5"}

    assert decode_page(_raw_json_page(b"{}"))["event_type"] == "json5"
    assert calls == ["high"]

    @reg.register_mime_decoder("text/csv")
    def broken(body, charset):
        raise RuntimeError("boom")

    d = decode_page(
        b"HTTP/1.1 200 OK\r\nContent-Type: text/csv\r\n\r\na,b"
    )
    assert d["event_type"] == "error_decode"
    assert d["error"] == "EXTENSION_ERROR:RuntimeError"


def test_extension_works_inside_spark_udf(spark):
    @reg.register_mime_decoder("application/json")
    def dec(body, charset):
        return {"event_type": "json", "text": body.decode("utf-8")}

    from mysql_cdc_rs_spark.functions.udfs import make_decode_udf

    df = spark.createDataFrame([(_raw_json_page(b'{"k":1}'),)], "html binary")
    row = df.select(make_decode_udf()(F.col("html")).alias("d")).select(
        "d.event_type", "d.text"
    ).first()
    assert (row["event_type"], row["text"]) == ("json", '{"k":1}')


# --- relay segments -----------------------------------------------------------

def test_segment_roundtrip_and_rollover(spark):
    with tempfile.TemporaryDirectory() as base:
        w = RS.SegmentWriter(base, segment_bytes=200)
        payloads = [f"payload-{i}".encode() * 3 for i in range(20)]
        for p in payloads:
            w.append(p)
        w.close()
        import glob

        segs = sorted(glob.glob(f"{base}/*.rlsg"))
        assert len(segs) > 1  # rollover happened
        got = []
        for s in segs:
            for payload, err in RS.read_segment(s):
                assert err is None
                got.append(payload)
        assert got == payloads

        # Spark-side distributed read
        df = RS.segments_to_df(spark, base)
        assert df.filter(F.col("error").isNull()).count() == 20


def test_segment_crc_detects_corruption():
    with tempfile.TemporaryDirectory() as base:
        w = RS.SegmentWriter(base)
        w.append(b"hello world")
        w.append(b"second record")
        w.close()
        import glob

        path = glob.glob(f"{base}/*.rlsg")[0]
        data = bytearray(open(path, "rb").read())
        data[-3] ^= 0xFF  # flip a byte inside the second payload
        open(path, "wb").write(bytes(data))
        out = list(RS.read_segment(path))
        assert out[0] == (b"hello world", None)
        assert out[1] == (None, "CRC_MISMATCH")


# --- DDL parse ----------------------------------------------------------------

def test_classify_sql():
    assert classify_sql("CREATE TABLE t (a INT)") == "ddl"
    assert classify_sql("  alter table x add column y int") == "ddl"
    assert classify_sql("INSERT INTO t VALUES (1)") == "dml"
    assert classify_sql("BEGIN") == "tcl"
    assert classify_sql("SET @x = 1") == "other"


def test_parse_create_table():
    # mirrors the reference fixture table (tests/events/5.7/30_write_rows_v2)
    sql = (
        "CREATE TABLE `db1`.`boxercrab` ("
        "id INT UNSIGNED NOT NULL AUTO_INCREMENT, "
        "title VARCHAR(40), "
        "score DECIMAL(10, 2), "
        "PRIMARY KEY (id), "
        "KEY idx_title (title))"
    )
    t = parse_create_table(sql)
    assert (t.schema, t.table) == ("db1", "boxercrab")
    assert [(c.name, c.type_name, c.type_args) for c in t.columns] == [
        ("id", "INT", ()),
        ("title", "VARCHAR", (40,)),
        ("score", "DECIMAL", (10, 2)),
    ]
    assert t.columns[0].unsigned and not t.columns[0].nullable
    assert t.primary_key == ["id"]
    assert parse_create_table("SELECT 1") is None  # prefilter short-circuit


# --- geometry / string meta ----------------------------------------------------

def test_wkb_point_roundtrip():
    g = parse_mysql_geometry(encode_point(12.5, -3.25, srid=4326))
    assert g == {"type": "Point", "coordinates": [12.5, -3.25], "srid": 4326}


def test_wkb_all_shapes_roundtrip():
    """Every shape the reference enumerates (geometry.rs:18-160) survives
    encode -> parse with SRID, including nested Multi*/Collection."""
    from mysql_cdc_rs_spark.kernel.geometry import encode_geometry

    shapes = [
        {"type": "LineString", "coordinates": [[0.0, 0.0], [1.5, 2.5], [3.0, -4.0]]},
        {"type": "Polygon", "coordinates": [
            [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 0.0]],
            [[1.0, 1.0], [2.0, 1.0], [1.0, 2.0], [1.0, 1.0]],  # hole
        ]},
        {"type": "MultiPoint", "coordinates": [[1.0, 2.0], [3.0, 4.0]]},
        {"type": "MultiLineString", "coordinates": [
            [[0.0, 0.0], [1.0, 1.0]], [[2.0, 2.0], [3.0, 3.0]],
        ]},
        {"type": "MultiPolygon", "coordinates": [
            [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]],
        ]},
        {"type": "GeometryCollection", "geometries": [
            {"type": "Point", "coordinates": [9.0, -9.0]},
            {"type": "LineString", "coordinates": [[0.0, 1.0], [2.0, 3.0]]},
        ]},
    ]
    for g in shapes:
        cell = dict(g, srid=4326)
        assert parse_mysql_geometry(encode_geometry(cell)) == cell


def test_wkb_big_endian_decodes():
    import struct

    # big-endian WKB point (byte order flag 0) — parser honors the flag
    wkb = (0).to_bytes(4, "little") + b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", 7.0, 8.0)
    assert parse_mysql_geometry(wkb)["coordinates"] == [7.0, 8.0]


def test_actual_string_type():
    assert actual_string_type(247, 2) == (247, 2)       # ENUM passthrough
    assert actual_string_type(254, 100) == (254, 100)   # CHAR(100)
    assert actual_string_type(254 & ~0x10, 0x2C) == (254, 300)  # CHAR(300)
