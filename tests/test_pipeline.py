"""End-to-end pipeline invariants on the synthetic pages table.

Mirrors the reference's integration tests
(/root/reference/binlog/src/row/parser_integration_test.rs): byte-identical
decode output, exact fan-out counts, routed-row equality, resume semantics.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from mysql_cdc_rs_spark.operators.decode import decode_pages, split_errors
from mysql_cdc_rs_spark.operators.enrich import enrich
from mysql_cdc_rs_spark.operators.route import ROUTES, write_routes
from mysql_cdc_rs_spark.operators import stats as S
from mysql_cdc_rs_spark.plans.pipeline import run_pipeline
from mysql_cdc_rs_spark.sources.catalog import SinkCatalog
from mysql_cdc_rs_spark.sources.pages import pages_df, pages_rows

N = 1500


@pytest.fixture(scope="module")
def pages(spark):
    return pages_df(spark, N, seed=42).cache()


@pytest.fixture(scope="module")
def decoded(spark, pages):
    return decode_pages(pages).cache()


def test_byte_identical_text(decoded):
    """North-rule invariant: UDF-decoded text == generator's kernel text."""
    bad = decoded.filter(~F.col("text").eqNullSafe(F.col("text_expected"))).count()
    assert bad == 0


def test_event_taxonomy_exhaustive(decoded):
    seen = {r["event_type"] for r in decoded.select("event_type").distinct().collect()}
    from mysql_cdc_rs_spark.kernel.decode import EVENT_TYPES

    assert seen <= set(EVENT_TYPES)
    assert decoded.filter(F.col("event_type").isNull()).count() == 0


def test_decode_matches_driver_oracle(decoded):
    """Spark decode counts == pure-Python kernel counts (same rows)."""
    from collections import Counter

    from mysql_cdc_rs_spark.kernel.decode import decode_page

    expected = Counter(
        decode_page(raw)["event_type"] for _, _, raw, _, _ in pages_rows(N, seed=42)
    )
    got = {
        r["event_type"]: r["n"]
        for r in decoded.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert got == dict(expected)


def test_split_errors_partitions_all_rows(decoded):
    ok, err = split_errors(decoded)
    assert ok.count() + err.count() == N
    assert err.filter(F.col("error").isNull() & (F.col("status") < 400)).count() == 0


def test_enrich_missing_key_error_route(spark, decoded):
    enriched = enrich(decoded)
    # 'it' lang and 'gov' tld are absent from dims by design
    unmatched = enriched.filter(F.col("enrich_error").isNotNull())
    assert unmatched.filter(F.col("route") != "errors").count() == 0
    assert (
        unmatched.filter(
            (F.col("lang") != "it") & (F.col("tld") != "gov")
        ).count()
        == 0
    )


def test_routing_fanout_and_equality(spark, pages):
    with tempfile.TemporaryDirectory() as base:
        cat = SinkCatalog(spark, base)
        enriched = enrich(decode_pages(pages))
        counts = write_routes(enriched, cat)
        assert set(counts) <= set(ROUTES)
        assert sum(counts.values()) == N
        routed = cat.read("routed")
        # routed-row equality: same url multiset in == out
        assert routed.select("url").exceptAll(pages.select("url")).count() == 0
        assert pages.select("url").exceptAll(routed.select("url")).count() == 0
        # per-sink manifest counts attest the written data
        m = cat.read_manifest("routes")
        assert m["counts"] == counts and m["total"] == N


def test_iceberg_branch_issues_writeTo_calls(monkeypatch):
    """The Iceberg leg of SinkCatalog, exercised WITHOUT the runtime jar
    (absent in this sandbox): a spy DataFrame/session records exactly which
    DataFrameWriterV2 calls each operation issues against which table
    identifier.  This is the transactional-append parity surface
    (/root/reference/relay_log/src/storage/relay_log_storage.rs:85-124);
    the Parquet leg stays the executed path everywhere else."""
    from mysql_cdc_rs_spark.sources import catalog as C

    calls: list[tuple] = []

    class SpyWriter:
        def __init__(self, ident):
            self.ident = ident

        def partitionedBy(self, *cols):
            calls.append(("partitionedBy", self.ident, cols))
            return self

        def append(self):
            calls.append(("append", self.ident))

        def create(self):
            calls.append(("create", self.ident))

        def overwritePartitions(self):
            calls.append(("overwritePartitions", self.ident))

        def createOrReplace(self):
            calls.append(("createOrReplace", self.ident))

    class SpyDF:
        def writeTo(self, ident):
            calls.append(("writeTo", ident))
            return SpyWriter(ident)

    class SpyCatalog:
        def __init__(self):
            self.tables: set[str] = set()

        def tableExists(self, ident):
            return ident in self.tables

    class SpyRead:
        def table(self, ident):
            calls.append(("read.table", ident))
            return f"df:{ident}"

    class SpySpark:
        def __init__(self):
            self.catalog = SpyCatalog()
            self.read = SpyRead()

    monkeypatch.setattr(C, "_iceberg_available", lambda spark: True)
    with tempfile.TemporaryDirectory() as base:
        spark = SpySpark()
        cat = C.SinkCatalog(spark, base, use_iceberg=True)
        assert cat.use_iceberg  # probe said yes -> branch stays on

        # first append -> create (createOrReplace would drop prior appends)
        cat.append(SpyDF(), "events", partition_by=["route"])
        assert calls == [
            ("writeTo", "sink.events"),
            ("partitionedBy", "sink.events", ("route",)),
            ("create", "sink.events"),
        ]
        calls.clear()

        # table now exists -> subsequent append is a transactional append
        spark.catalog.tables.add("sink.events")
        cat.append(SpyDF(), "events")
        assert calls == [("writeTo", "sink.events"), ("append", "sink.events")]
        calls.clear()

        # overwrite = FULL replace on both legs: createOrReplace is one
        # atomic snapshot swap AND drops partitions absent from df (dynamic
        # overwritePartitions would keep them — the Parquet-leg divergence
        # the round-4 advisory flagged on route.py's partitioned fan-out)
        cat.overwrite(SpyDF(), "events", partition_by=["route"])
        assert calls == [
            ("writeTo", "sink.events"),
            ("partitionedBy", "sink.events", ("route",)),
            ("createOrReplace", "sink.events"),
        ]
        calls.clear()

        # overwrite on a missing table -> same call (createOrReplace creates)
        cat.overwrite(SpyDF(), "metrics")
        assert calls == [
            ("writeTo", "sink.metrics"),
            ("createOrReplace", "sink.metrics"),
        ]
        calls.clear()

        # overwrite_partitions = replace exactly the partitions present in
        # df (the incremental re-run path at scale)
        cat.overwrite_partitions(SpyDF(), "events", partition_by=["route"])
        assert calls == [
            ("writeTo", "sink.events"),
            ("partitionedBy", "sink.events", ("route",)),
            ("overwritePartitions", "sink.events"),
        ]
        calls.clear()

        # overwrite_partitions on a missing table -> create
        cat.overwrite_partitions(SpyDF(), "metrics2")
        assert calls == [
            ("writeTo", "sink.metrics2"),
            ("create", "sink.metrics2"),
        ]
        calls.clear()

        # reads and existence go through the catalog, not the filesystem
        assert cat.read("events") == "df:sink.events"
        assert cat.exists("events") and not cat.exists("nope")


def test_iceberg_probe_falls_back_without_jar(spark):
    """In this sandbox the probe must say no and the catalog must land on
    the executed Parquet leg even when Iceberg is requested."""
    with tempfile.TemporaryDirectory() as base:
        cat = SinkCatalog(spark, base, use_iceberg=True)
        assert not cat.use_iceberg


def test_pipeline_resume(spark, pages):
    with tempfile.TemporaryDirectory() as base:
        cat = SinkCatalog(spark, base)
        r1 = run_pipeline(pages, cat, with_metrics=False)
        r2 = run_pipeline(pages, cat, with_metrics=False)
        assert r1.route_counts == r2.route_counts
        # changed input -> recompute, not stale reuse
        bigger = pages_df(spark, N + 100, seed=42)
        r3 = run_pipeline(bigger, cat, with_metrics=False)
        assert sum(r3.route_counts.values()) == N + 100


def test_stats_consistency(decoded):
    et = {r["event_type"]: r["n_events"] for r in S.event_type_stats(decoded).collect()}
    assert sum(et.values()) == N
    rollup = S.global_rollup(decoded).collect()
    total_row = [r for r in rollup if r["event_type"] is None][0]
    assert total_row["n_events"] == N
    hist = S.size_histogram(decoded).collect()
    assert sum(r["n"] for r in hist) == N


def test_charset_variety(decoded):
    cs = {r["charset"] for r in S.charset_stats(decoded).collect()}
    assert {"utf-8", "latin-1", "gbk"} <= cs


def test_salted_host_stats_equal_direct(decoded):
    """Two-phase salted host aggregation == direct groupBy, exactly."""
    got = {
        r["host"]: (r["n_pages"], r["total_bytes"])
        for r in S.host_stats_salted(decoded).collect()
    }
    direct = {
        r["host"]: (r["n"], r["b"])
        for r in decoded.groupBy("host")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.coalesce(F.col("raw_len"), F.lit(0))).alias("b"),
        )
        .collect()
    }
    assert got == direct
    # the hot hosts really are hot (skew exists to be handled)
    hot = [h for h in got if h.startswith("hot.")]
    assert sum(got[h][0] for h in hot) > 0.2 * N


def test_training_curation_stages(spark):
    """Composed curation pipeline: stage counts are monotone and exact."""
    from mysql_cdc_rs_spark.plans.training_pipeline import curate, curation_report
    from mysql_cdc_rs_spark.sources.pages_from_documents import pages_from_documents

    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    rep = curation_report(pages, min_tokens=20)
    assert rep["input"] >= rep["text_bearing"] >= rep["quality_pass"] >= rep["survivors"]
    assert rep["survivors"] > 0
    # survivors are unique docs and all meet the quality bar
    surv = curate(pages, min_tokens=20)
    assert surv.count() == surv.select("doc_id").distinct().count() == rep["survivors"]


def test_curate_release_unpersists_quality(spark):
    """curate() persists the quality corpus; release() must drop exactly
    that cache so repeated invocations (bench loops, notebooks) don't
    accumulate cached plans for the session lifetime."""
    from mysql_cdc_rs_spark.plans.training_pipeline import curate, release
    from mysql_cdc_rs_spark.sources.pages_from_documents import pages_from_documents

    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    surv = curate(pages, min_tokens=20)
    surv.count()  # materializes the persisted quality corpus
    quality = surv._curate_persisted
    assert quality.storageLevel.useMemory or quality.storageLevel.useDisk
    release(surv)
    sl = quality.storageLevel
    assert not (sl.useMemory or sl.useDisk)  # cache dropped
    release(surv)  # idempotent, and safe on frames without the handle
    release(pages)


def test_spark_submit_py_files_runs():
    """The north rule's exact invocation shape: spark-submit --py-files
    engine.zip — the package must ship itself correctly when imported FROM
    the zip (regression: ship_package crashed re-zipping a zip member)."""
    import json
    import os
    import shutil
    import subprocess
    import tempfile
    import zipfile

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory() as tmp:
        zpath = f"{tmp}/engine.zip"
        with zipfile.ZipFile(zpath, "w") as z:
            pkg = os.path.join(repo, "mysql_cdc_rs_spark")
            for root, _, files in os.walk(pkg):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        z.write(full, os.path.relpath(full, repo))
        spark_submit = shutil.which("spark-submit")
        if spark_submit is None:
            import pytest

            pytest.skip("spark-submit not on PATH")
        out = subprocess.run(
            [spark_submit, "--master", "local[4]", "--py-files", zpath,
             f"{repo}/scripts/run_pipeline.py",
             "--pages", f"{tmp}/pages", "--sink", f"{tmp}/sink",
             "--synthesize", "500"],
            cwd=tmp, capture_output=True, text=True, timeout=300,
        )
        assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
        res = json.loads(out.stdout.strip().splitlines()[-1])
        assert res["total"] == 500
        assert sum(res["route_counts"].values()) == 500


def test_curate_resumable_skips_and_recomputes(spark, tmp_path):
    """Checkpoint-resume for the composed curation pipeline: identical input
    lineage -> both stages SKIP (fn never called again); changed input ->
    recompute; results equal the non-resumable curate()."""
    from mysql_cdc_rs_spark.plans.checkpoint import CheckpointedStage
    from mysql_cdc_rs_spark.plans.training_pipeline import (
        curate,
        curate_resumable,
    )
    from mysql_cdc_rs_spark.sources.catalog import SinkCatalog

    pages = pages_df(spark, 400, seed=42)
    cat = SinkCatalog(spark, str(tmp_path / "cur"))

    surv1 = curate_resumable(pages, cat)
    ids1 = sorted(r["doc_id"] for r in surv1.select("doc_id").collect())
    want = sorted(
        r["doc_id"] for r in curate(pages).select("doc_id").collect()
    )
    assert ids1 == want and len(ids1) > 0

    # generic stage contract: same lineage -> fn NOT called again
    calls = {"n": 0}

    def counting_fn(df):
        calls["n"] += 1
        return df.select("doc_id", "text", "url_bucket")

    stage = CheckpointedStage(cat, "probe_stage")
    q = cat.read("curate_quality")
    stage.run(q, counting_fn)
    stage.run(q, counting_fn)  # identical lineage -> skip
    assert calls["n"] == 1

    # rerun of the full resumable pipeline over identical input: same rows
    surv2 = curate_resumable(pages, cat)
    ids2 = sorted(r["doc_id"] for r in surv2.select("doc_id").collect())
    assert ids2 == ids1

    # changed input (rows removed) -> different bucket histogram -> recompute
    # (deterministic subset — limit() would pick arbitrary rows per run)
    fewer = pages.filter(F.pmod(F.xxhash64("url"), F.lit(4)) != 0)
    surv3 = curate_resumable(fewer, cat)
    ids3 = sorted(r["doc_id"] for r in surv3.select("doc_id").collect())
    want3 = sorted(
        r["doc_id"] for r in curate(fewer).select("doc_id").collect()
    )
    assert ids3 == want3


def test_pipeline_source_format_agnostic(spark, tmp_path):
    """S2 breadth: the decode->enrich pipeline produces IDENTICAL routed
    rows whether pages arrive as Parquet, ORC, or JSON-lines (binary html
    round-trips JSON as base64 — Spark's codec, exercised here).  The
    engine never assumes the source format; schema is the contract."""
    pages = pages_df(spark, 300, seed=42)
    want = (
        enrich(decode_pages(pages))
        .select("url", "route", "region", "text")
    )

    base = str(tmp_path)
    pages.write.parquet(f"{base}/p.parquet")
    pages.write.orc(f"{base}/p.orc")
    pages.write.json(f"{base}/p.json")

    schema = pages.schema
    for fmt, path in [
        ("parquet", f"{base}/p.parquet"),
        ("orc", f"{base}/p.orc"),
        ("json", f"{base}/p.json"),
    ]:
        back = spark.read.format(fmt).schema(schema).load(path)
        got = enrich(decode_pages(back)).select(
            "url", "route", "region", "text"
        )
        assert got.count() == 300, fmt
        assert got.exceptAll(want).count() == 0, fmt
        assert want.exceptAll(got).count() == 0, fmt


def test_curate_verify_jaccard_rescues_lsh_false_positive(spark):
    """Round-5 opt-in exact-verify stage: an LSH band collision with LOW
    true Jaccard (boilerplate-prefix docs — the classic web false positive)
    must drop its doc_b under default candidacy-only curation but SURVIVE
    with ``verify_jaccard`` on, while a true near-dup drops in both modes.
    The pair is deterministic: docs 1/103 share a 33-word prefix (word-
    3-gram Jaccard 0.365, verified in-test) yet collide in >=1 of the 16
    minhash bands; doc 5 is doc 1 plus one word (Jaccard 0.983)."""
    import hashlib as _hl

    from mysql_cdc_rs_spark.operators import dedup as DD
    from mysql_cdc_rs_spark.plans.training_pipeline import curate, release

    def words(seed, n, tag):
        return [
            f"{tag}{_hl.blake2b(f'{seed}|{tag}|{i}'.encode(), digest_size=4).hexdigest()}"
            for i in range(n)
        ]

    base = words(1, 60, "w")
    texts = {
        1: " ".join(base),
        5: " ".join(base) + " tinytail",
        103: " ".join(base[:33] + words(103, 27, "v3_")),
    }

    # precondition: (1,103) IS an LSH candidate yet its exact Jaccard is
    # far below the 0.5 threshold; (1,5) is a true near-dup above it
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    cand = DD.lsh_candidate_pairs(docs)
    ver = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in DD.ngram_jaccard_pairs(docs, candidates=cand).collect()
    }
    assert (1, 103) in ver and ver[(1, 103)] < 0.5
    assert (1, 5) in ver and ver[(1, 5)] > 0.9

    def page(i, text):
        body = f"<html><body>{text}</body></html>".encode()
        raw = (
            f"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body
        return (f"https://ex.com/d/{i}", None, raw, None, "en")

    ddl = "url string, warc_ts timestamp, html binary, text string, lang string"
    pages = spark.createDataFrame([page(i, t) for i, t in texts.items()], ddl)

    # default (candidacy-only): the false positive is over-dropped
    s0 = curate(pages)
    got0 = {r["doc_id"] for r in s0.select("doc_id").collect()}
    release(s0)
    assert got0 == {1}

    # verification on: the false positive survives, the true dup still drops
    s1 = curate(pages, verify_jaccard=0.5)
    got1 = {r["doc_id"] for r in s1.select("doc_id").collect()}
    release(s1)
    assert got1 == {1, 103}


def test_overwrite_partitions_parquet_leg_keeps_absent_partitions(spark):
    """Executed Parquet-leg semantics of the round-5 split: ``overwrite``
    is a FULL replace (partitions absent from the df disappear) while
    ``overwrite_partitions`` replaces exactly the partitions present and
    keeps the rest — per-write dynamic mode, session default untouched."""
    with tempfile.TemporaryDirectory() as base:
        cat = SinkCatalog(spark, base)
        df = spark.createDataFrame(
            [("a", 1), ("a", 2), ("b", 10)], "route string, v int"
        )
        cat.overwrite(df, "t", partition_by=["route"])
        assert cat.read("t").count() == 3

        # dynamic: replace only route=a, keep route=b
        da = spark.createDataFrame([("a", 99)], "route string, v int")
        cat.overwrite_partitions(da, "t", partition_by=["route"])
        got = {(r["route"], r["v"]) for r in cat.read("t").collect()}
        assert got == {("a", 99), ("b", 10)}

        # full replace: route=b vanishes
        cat.overwrite(da, "t", partition_by=["route"])
        got2 = {(r["route"], r["v"]) for r in cat.read("t").collect()}
        assert got2 == {("a", 99)}

        # session default partitionOverwriteMode must still be static
        assert (
            spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC").upper()
            == "STATIC"
        )
