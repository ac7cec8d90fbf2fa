"""Loaders for the driver-generated parquet testdata (TESTDATA.md)."""

from __future__ import annotations

import os

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark, sf_dir: str, table: str):
    if table not in TABLES:
        raise KeyError(table)
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def load_all(spark, sf_dir: str) -> dict:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark, sf_dir: str) -> None:
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
