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


def spread(df):
    """Fan a low-parallelism scan out to the session's cores.

    The driver testdata ships each table as ONE parquet file with ONE row
    group, so the scan stage gets a single effective task — and every
    narrow operation until the first exchange (regex projections, shingle
    explode + md5, higher-order-function folds, Python decode) inherits
    that single task on a 32-core session.  Optimization guide §2.5: one
    huge unsplittable input — repartition immediately after the read.

    Scale-adaptive by construction: the target is the session's
    defaultParallelism (not a constant), and an already-parallel scan
    (enough splittable row groups, or a many-file table at fleet scale)
    passes through untouched.  Round-robin repartition keeps retried tasks
    deterministic (sort-before-repartition stays on).  Apply BELOW the
    expensive work, on scans that feed heavy narrow stages; scans whose
    first downstream op is already an exchange gain nothing.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def load_all(spark, sf_dir: str) -> dict:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark, sf_dir: str) -> None:
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
