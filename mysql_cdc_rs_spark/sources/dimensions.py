"""Dimension tables for broadcast-hash enrichment (SURVEY §2.5 J1/J3).

The reference's schema catalog declares per-table HASH vs BROADCAST
distribution (/root/reference/common/src/schema/schema.rs:92-97); these dims
are the BROADCAST case — tiny, immutable per batch, joined with an explicit
``broadcast()`` hint.  ``lang -> region`` mirrors the charset-id -> encoding
lookup (J3); ``tld -> category`` mirrors the table-id -> TableMap metadata
lookup (J1), including the "missing key -> error route" semantics
(TABLE_MAP_NOT_FOUND, /root/reference/binlog/src/row/parser.rs:24-26).
"""

from __future__ import annotations

LANG_REGION = [
    ("en", "americas", "English"),
    ("de", "emea", "German"),
    ("fr", "emea", "French"),
    ("es", "americas", "Spanish"),
    ("zh", "apac", "Chinese"),
    ("ja", "apac", "Japanese"),
    ("ko", "apac", "Korean"),
    ("ru", "emea", "Russian"),
    ("pt", "americas", "Portuguese"),
    # "it" intentionally ABSENT -> unmatched rows exercise the error route.
]

TLD_CATEGORY = [
    ("com", "commercial"),
    ("org", "nonprofit"),
    ("net", "infrastructure"),
    ("de", "country"),
    ("fr", "country"),
    ("cn", "country"),
    ("jp", "country"),
    ("io", "tech"),
    ("edu", "education"),
    # "gov" intentionally ABSENT -> error-route fodder.
]


def lang_region_df(spark):
    return spark.createDataFrame(
        LANG_REGION, "lang string, region string, lang_name string"
    )


def tld_category_df(spark):
    return spark.createDataFrame(TLD_CATEGORY, "tld string, category string")
