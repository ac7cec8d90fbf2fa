"""SparkSession factory with scale-oriented defaults.

All entry points (tests, bench, driver contract) build sessions here so the
whole engine runs under one config story:

- AQE on (coalesce partitions + skew-join): runtime re-planning replaces the
  reference's hand-tuned ring-buffer/queue sizing
  (/root/reference/binlog/src/relay_log/queue_manager.rs:11).
- Arrow execution on, bounded batch size: replaces the reference's payload
  buffer reuse + object pools
  (/root/reference/binlog/src/decoder/file_binlog_reader.rs:122-137).
- Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle bit-for-bit.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Shuffle partition count sized for local[32] test runs; on a real cluster
# this is overridden via spark-submit conf (AQE coalesces down at runtime).
DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def build_session(
    app_name: str = "mysql_cdc_rs_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with the engine's standard config."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # --- correctness-critical ---
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # --- adaptive execution: runtime re-plan at any scale ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS))
        # --- vectorized decode path sizing (Arrow batches to pandas UDFs) ---
        # 2000-row batches keep the JVM->Python->JVM pipeline full: with one
        # huge batch per task the stage is latency-bound (measured 2.2x
        # slower at local[32]); small batches overlap Arrow IO with decode.
        # This bound is ALSO the Python-worker memory cap for the decode
        # path: a worker holds ~one batch of raw html + one of decoded
        # output (~2-5 MB at 2000 rows of ~1 KB pages), so worker RSS stays
        # flat regardless of task size — relevant to the 12.8M-probe
        # hung-worker incident (BENCH/SOAK.md): an unbounded batch would
        # make worker memory proportional to partition size and OOM-kills
        # would correlate with the largest partitions.  With this bound in
        # place, a dead worker is environmental; speculation (below) is the
        # fleet-scale backstop either way.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2000")
        # --- scan sizing: keep partitions executor-memory-friendly at scale ---
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # broadcast threshold: dimension tables (lang->region, tld->category)
        # are tiny; we also hint broadcast() explicitly at every dim join.
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # Straggler backstop (opt-in locally, mandatory at fleet scale): a dead
    # Python worker leaves its task blocked in epoll forever; speculation
    # re-launches it.  Off by default here because single-attempt timing
    # keeps bench rounds and plan snapshots deterministic — a 10^12-page
    # run should set it (see BENCH/SOAK.md, hung-worker incident).
    if os.environ.get("SPARK_GRAFT_SPECULATION") == "1":
        builder = (
            builder.config("spark.speculation", "true")
            .config("spark.speculation.multiplier", "4")
            .config("spark.speculation.quantile", "0.9")
        )
    # Crash forensics (opt-in): when a Python worker dies mid-task the JVM
    # only reports "worker exited unexpectedly"; the faulthandler makes the
    # worker dump a Python traceback on hard death (segfault/abort) so the
    # failing frame is attributable.  Off by default — it adds a signal
    # handler + temp-file write per worker launch.
    if os.environ.get("SPARK_GRAFT_FAULTHANDLER") == "1":
        builder = builder.config(
            "spark.python.worker.faulthandler.enabled", "true"
        ).config("spark.sql.execution.pyspark.udf.faulthandler.enabled", "true")
    # JVM<->Python worker transport: Unix domain sockets (Spark 4.1+),
    # default ON.  Forensics from a wedged 12.8M soak
    # (BENCH/hang/tcp_retransmit_collapse_batch22.txt) showed the "silent
    # hang" class is a LOOPBACK TCP RETRANSMISSION COLLAPSE: both
    # worker<->JVM pairs sat with 2-3.8 MB retransmitted, dsack_dups 30-70,
    # reordering:32 and rto backed off to 120s+ (backoff:14), every buffer
    # full in both directions — the kernel dropping loopback segments under
    # burst, then exponential backoff freezing the pipe for minutes (the
    # earlier daemon-handshake framing was one symptom of the same wedge).
    # AF_UNIX stream sockets have no retransmission, no congestion control
    # and no rto backoff, so the whole failure class is unrepresentable.
    # NOTE: speculation is NOT a cure in local mode — a speculative copy is
    # never scheduled on the executor already running the attempt, and
    # local[N] has exactly one executor; on a real cluster it still is.
    # SPARK_GRAFT_UNIX_SOCKET=0 restores TCP (e.g. to reproduce forensics).
    if os.environ.get("SPARK_GRAFT_UNIX_SOCKET", "1") == "1":
        builder = builder.config(
            "spark.python.unix.domain.socket.enabled", "true"
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    ship_package(spark)
    return spark


_SHIPPED: set[str] = set()


def ship_package(spark: SparkSession) -> None:
    """Ship this package to executors (addPyFile), once per SparkContext.

    UDF closures reference the package by module, so executor Python workers
    must import it — and they inherit neither the caller's cwd nor its
    sys.path edits.  Keyed on applicationId (id(sc) is recycled across
    session restarts).
    """
    sc = spark.sparkContext
    if sc.applicationId in _SHIPPED:
        return
    import shutil
    import tempfile

    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if os.path.isdir(pkg_root):
        zip_path = shutil.make_archive(
            os.path.join(tempfile.gettempdir(), "mysql_cdc_rs_spark_pkg"),
            "zip",
            root_dir=pkg_root,
            base_dir="mysql_cdc_rs_spark",
        )
        sc.addPyFile(zip_path)
    elif os.path.isfile(pkg_root) and pkg_root.endswith(".zip"):
        # running FROM a zip (spark-submit --py-files engine.zip): executors
        # already receive that zip via --py-files; re-adding the same
        # archive is enough, re-zipping a zip member path would crash.
        sc.addPyFile(pkg_root)
    # else: installed as a wheel/egg-dir the workers share — nothing to ship
    _SHIPPED.add(sc.applicationId)


def get_active_or_build(**kwargs) -> SparkSession:
    active = SparkSession.getActiveSession()
    return active if active is not None else build_session(**kwargs)
