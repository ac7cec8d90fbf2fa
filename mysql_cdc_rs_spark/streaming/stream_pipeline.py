"""Streaming pipeline: the live-replication analog (SURVEY §2.1 S5, §2.11).

The reference's live source is a MySQL replication socket feeding the same
decode path as files (/root/reference/connection/src/binlog/
binlog_subscribe.rs:51-96); exactly-once progress is (file, log_pos, GTID)
checkpointing.  Spark restatement:

- source: ``readStream`` over an arriving-files pages directory (swap for
  Kafka/Iceberg streaming read in production — the transformations are
  shared with the batch pipeline verbatim);
- decode/enrich: the SAME functions as batch (one code path, two runners);
- sink: ``foreachBatch`` fan-out append per route — micro-batch transactional
  writes are the relay-log segment append analog (S7);
- progress: Structured Streaming checkpoint = GTID set (A8);
- watermark + windowed counts = heartbeat/liveness metrics (A9);
- custom stateful operator via ``applyInPandasWithState`` = the reference's
  per-key decoder context (TableMap cache) held in managed state.

Parallelism note: file-arrival (and few-partition Kafka) sources deliver
micro-batches with fewer partitions than cores — one arriving file is ONE
partition — which silently caps every narrow per-batch transformation at
that parallelism.  The foreachBatch sinks here fan the batch out to
``defaultParallelism`` before decoding (conditional: an already-parallel
source is never coalesced).  The windowed/stateful aggregation streams
shuffle at their groupBy anyway; if their upstream decode becomes the
bottleneck on an under-partitioned source, repartition the source stream
once at ingest (``stream_df.repartition(n)``) rather than per operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from mysql_cdc_rs_spark.operators.decode import decode_pages
from mysql_cdc_rs_spark.operators.enrich import enrich
from mysql_cdc_rs_spark.operators.route import route_table

PAGES_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def stream_pages(spark, pages_dir: str, max_files_per_trigger: int = 8) -> DataFrame:
    """File-arrival streaming source over the pages directory."""
    return (
        spark.readStream.schema(PAGES_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )


def stream_pages_rate(
    spark, rows_per_batch: int = 200, seed: int = 42
) -> DataFrame:
    """Socket-style live source analog #2: a ``rate-micro-batch`` stream
    whose monotonically increasing ``value`` seeds the SAME deterministic
    page generator as the batch source — the unbounded replication-dump
    subscribe loop of the reference
    (/root/reference/connection/src/binlog/binlog_subscribe.rs:51-96)
    restated as an always-on source.  Everything downstream (decode,
    enrich, route, metrics) is shared verbatim with the batch pipeline and
    the file-arrival stream; swapping the source line is the whole diff —
    which is the point: Kafka in production is the same one-line swap.
    """
    import pandas as pd

    from mysql_cdc_rs_spark.sources.pages import make_record

    raw = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("startTimestamp", 0)
        .load()
    )

    def gen(batches):
        for pdf in batches:
            rows = [make_record(seed, int(v)) for v in pdf["value"]]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return raw.mapInPandas(gen, schema=PAGES_DDL)


def stream_pages_socket(spark, host: str, port: int) -> DataFrame:
    """Socket-style live source analog #4: the LITERAL socket leg of S5 —
    Spark's built-in TCP socket source stands in for the replication-dump
    byte stream (/root/reference/connection/src/binlog/
    binlog_subscribe.rs:51-96).  Framing: one page per line as
    ``url<TAB>lang<TAB>base64(html)`` — the in-band metadata the reference's
    event stream carries next to the payload; newline framing replaces the
    binlog's length-prefix framing (S4's splitter handles the latter).
    ``warc_ts`` is arrival time — the socket source carries no event time,
    exactly like the reference's live socket.  The plan builds without
    connecting; the connection opens when the stream starts, and everything
    downstream (decode, enrich, route, checkpointing) is shared verbatim
    with the file/rate/Kafka sources."""
    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    parts = F.split(F.col("value"), "\t")
    return raw.select(
        parts.getItem(0).alias("url"),
        F.current_timestamp().alias("warc_ts"),
        F.unbase64(parts.getItem(2)).alias("html"),
        F.lit(None).cast("string").alias("text"),
        parts.getItem(1).alias("lang"),
    )


def stream_pages_kafka(
    spark,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Socket-style live source analog #3: Kafka — the literal one-line
    source swap this module's docstring claims.  The record value carries
    the raw page bytes (the ``html`` column the decode UDF consumes), the
    key carries the url, the broker timestamp stands in for ``warc_ts``;
    everything downstream (decode, enrich, route, metrics, checkpointing)
    is shared verbatim with the file-arrival and rate sources (parity:
    the replication-dump subscribe loop,
    /root/reference/connection/src/binlog/binlog_subscribe.rs:51-96 +
    /root/reference/connection/src/commands/dump_binlog_command.rs:6-30).

    Requires the spark-sql-kafka connector on the classpath; where it is
    absent (this sandbox) ``.load()`` raises and callers treat the source
    as unavailable — the downstream plan is identical either way, which is
    what tests/test_streaming_and_framing.py::test_kafka_source_swap_plan
    pins."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return raw.select(
        F.col("key").cast("string").alias("url"),
        F.col("timestamp").alias("warc_ts"),
        F.col("value").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


def _fan_out(batch_df: DataFrame) -> DataFrame:
    """Fan a foreachBatch micro-batch out to cluster parallelism.

    A file/Kafka source often delivers fewer partitions than cores — one
    arriving file is ONE partition — which silently caps every narrow
    per-batch transformation (decode, minhash) at source parallelism;
    profiled at 3.5x the whole batch's cost.  Conditional: an
    already-parallel source is never coalesced.  Every foreachBatch sink
    in this module routes its batch through here first.
    """
    n_target = batch_df.sparkSession.sparkContext.defaultParallelism
    if batch_df.rdd.getNumPartitions() < n_target:
        return batch_df.repartition(n_target)
    return batch_df


def start_routing_stream(
    stream_df: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """decode -> enrich -> per-route fan-out append, exactly-once via
    checkpoint.  Returns the StreamingQuery.  ``available_now=True`` drains
    a bounded source then stops (tests/backfills); pass False for unbounded
    sources (rate / Kafka) to run continuously."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        routed = route_table(enrich(decode_pages(_fan_out(batch_df))))
        routed.write.mode("append").partitionBy("route").parquet(
            f"{sink_dir}/routed"
        )

    writer = stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_windowed_metrics_stream(
    stream_df: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """A9/heartbeat analog: watermarked event-time windowed per-type counts."""
    decoded = decode_pages(stream_df)
    agg = (
        decoded.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("raw_len").alias("bytes"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "bytes",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", f"{sink_dir}/windowed_metrics")
        .start()
    )


def start_curation_stream(
    stream_df: DataFrame,
    catalog,
    checkpoint_dir: str,
    min_tokens: int = 20,
    available_now: bool = True,
    compact_every: int | None = None,
    compact_n_buckets: int | None = None,
    compact_mode: str = "major",
    compact_max_minors: int = 8,
):
    """ONLINE training-data curation: decode -> quality gate -> incremental
    LSH near-dup drop, one micro-batch at a time — the streaming twin of
    ``plans.training_pipeline.curate`` (keep-first by ARRIVAL instead of by
    doc_id).

    Dedup state is an append-only ``dedup_seen_buckets`` table holding, for
    every QUALITY doc seen so far (not just survivors'), the per-bucket
    MEMBER COUNT per batch: batch keep-first drops a doc that collides with
    ANY earlier quality doc, dropped or not, and the counts let the stream
    apply batch mode's degenerate-bucket cap exactly.

    Per batch, ONE positional rule replaces both the within-batch pair
    explosion and the uncapped membership probe (the round-5 fix — at 1.6M
    the old uncapped probe over-dropped 65 docs living past position
    ``max_bucket`` of boilerplate buckets):

      a doc DROPS iff, in some band bucket, its global arrival position
      p = (prior batches' member count) + (rank within this batch)
      satisfies 2 <= p <= max_bucket.

    Position 1 is the bucket's keeper; positions above the cap survive —
    exactly ``lsh_candidate_pairs``'s capped doc_b drop set when the feed
    arrives in doc_id order, so the stream reproduces batch ``curate()``
    bit-for-bit in that regime (pinned at 1.6M scale in BENCH/SOAK.md).
    And it is CHEAPER than pair generation: a row_number window + one
    aggregate-join on the bucket key, no member arrays, no pair explode.

    Scale shape: state lives in a table, not on the driver or in executor
    memory; the cross-batch probe is one equi-join on (band_id, bucket) —
    at 10^12 docs the bucket is the table's physical partition key and the
    probe prunes to touched buckets.  The probe join strategy is
    deliberately planner-chosen: early in a stream the aggregated state is
    tiny (broadcast is right), mature state is proportional to distinct
    buckets (SMJ is right), and unlike the verify stage's pair x shingle
    intermediates the input here is a real table with real stats, so the
    estimate AQE re-plans on is trustworthy.  Restart safety: each batch's appends
    carry batch_id and a manifest records the last COMPLETED batch, so a
    replayed batch (restart between sink append and checkpoint commit) is
    skipped; a crash inside a batch can leave a partial append, which
    readers drop by filtering batch_id > last-completed (the relay-log
    torn-tail rule, segment.rs:137-140, restated for micro-batches).

    ``compact_every=K`` runs ``compact_seen_buckets`` after every K
    completed batches, INSIDE the stream's serial foreachBatch thread — the
    "between batches" regime the compaction contract requires, with no
    concurrent probe possible.  Why cadence and not a one-off: the probe
    consumes the post-compaction tail with a per-batch aggregate, so tail
    cost grows linearly in batches-since-compaction — the 12.8M soak with
    ONE mid-run compaction spent most of its per-batch budget re-aggregating
    a ~25M-row tail (BENCH/SOAK.md).  A cadence bounds the tail to K
    batches' buckets, making per-batch probe cost independent of stream
    lifetime; the compaction itself stays crash-safe (versioned table +
    atomic pointer flip).  A crash DURING a cadence compaction loses no
    state (the flip is atomic; pre-flip rows stay live) — the batch itself
    was already manifest-committed, so on restart it replays as a skip and
    the missed compaction is simply picked up at the next cadence point,
    with the tail at most 2K batches deep in the interim.
    ``compact_n_buckets`` selects the bucketed layout on the first
    compaction (sticky thereafter); size it to at least cluster cores.
    ``compact_mode="minor"`` makes each cadence point past the first a
    tail-only delta fold — O(K batches) of work instead of a full
    O(history) rewrite, which is what makes a tight cadence affordable at
    fleet scale — auto-promoting to a major merge every
    ``compact_max_minors`` deltas so the probe's generation-join count
    stays bounded (see ``compact_seen_buckets``).
    """
    from mysql_cdc_rs_spark.functions.text import words_of
    from mysql_cdc_rs_spark.operators import dedup as DD

    SEEN, CURATED, MANIFEST = "dedup_seen_buckets", "curated", "stream_curate"
    cap = DD.MAX_BUCKET

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        m = catalog.read_manifest(MANIFEST)
        last = m.get("last_batch_id", -1) if m else -1
        if batch_id <= last:
            return  # replayed after restart: this batch is fully applied
        decoded = decode_pages(_fan_out(batch_df))
        doc_id = F.regexp_extract("url", r"/(\d+)$", 1).cast("long")
        textful = decoded.filter(
            F.col("event_type").isin("html", "plain")
        ).select(doc_id.alias("doc_id"), "text")
        quality = textful.filter(
            F.size(words_of(F.col("text"))) >= min_tokens
        ).persist()
        # Materialize each persisted frame in its OWN job before anything
        # fans out over it.  Without the barrier, the first append's job
        # carries sibling stages that race to build the same cached
        # partition; the loser parks on the block write lock that the
        # winner holds WHILE feeding a Python worker — the exact stall
        # captured in BENCH/hang/jstack_batch4_stall.txt (two stages, both
        # task 11, one in ArrowStreamReader epoll holding the lock, one
        # parked in BlockInfoManager.acquireLock).  Serialized builds keep
        # Python-feeding stages free of cross-stage lock coupling.
        n_quality = quality.count()
        banded = DD.banded_buckets(quality).persist()
        banded.count()
        pos = F.col("p") + F.col("r")
        drops = (
            seen_positions(banded, catalog, last)
            .where((pos >= 2) & (pos <= cap))
            .select("doc_id")
            .distinct()
        )
        survivors = quality.join(drops, "doc_id", "left_anti")
        catalog.append(
            survivors.withColumn("batch_id", F.lit(batch_id)), CURATED
        )
        catalog.append(
            banded.groupBy("band_id", "bucket")
            .agg(F.count("*").alias("n_members"))
            .withColumn("batch_id", F.lit(batch_id)),
            SEEN,
        )
        quality.unpersist()
        banded.unpersist()
        # Input-lineage tripwire (free: n_quality is the persist barrier's
        # return).  A checkpointed source can silently feed an EMPTY batch
        # and never re-offer its data — seen for real when a soak's
        # resume protocol moved a source file a PENDING batch referenced:
        # the re-executed batch read zero rows, committed honestly, and
        # 400k docs vanished from the corpus with every sink invariant
        # green (BENCH/SOAK.md).  The running quality-row total makes that
        # auditable downstream: sum(per-batch quality rows) must equal the
        # batch-mode quality count over the same corpus.
        catalog.write_manifest(
            MANIFEST,
            {
                "last_batch_id": batch_id,
                "quality_rows_total": (
                    (m.get("quality_rows_total", 0) if m else 0) + n_quality
                ),
            },
        )
        if compact_every and (batch_id + 1) % compact_every == 0:
            compact_seen_buckets(
                catalog,
                n_buckets=compact_n_buckets,
                mode=compact_mode,
                max_minors=compact_max_minors,
            )

    writer = stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _gen_tables(m: dict | None) -> list[str]:
    """All compacted-generation table names in a ``seen_compact`` manifest:
    the base generation (``table``) followed by the minor deltas
    (``minors``), oldest first.  Back-compatible: pre-LSM manifests carry
    only ``table``."""
    if not m:
        return []
    return ([m["table"]] if m.get("table") else []) + m.get("minors", [])


def _ensure_compact_table(catalog, m: dict, table: str) -> None:
    """(Re)attach one external bucketed compacted-state table.

    The table's FILES live under ``catalog.base`` (bucket membership is in
    the file names), but its catalog entry is session-scoped under Spark's
    default in-memory catalog — and the dedup state must outlive any one
    session.  The ``seen_compact`` manifest carries everything needed to
    recreate the definition, so a fresh session self-heals with one DDL
    before the first probe (the Hive-metastore/Iceberg-catalog analog of a
    persistent table registration).
    """
    import os

    spark = catalog.spark
    if spark.catalog.tableExists(table):
        return
    loc = os.path.join(os.path.abspath(catalog.base), table)
    cols = m.get("columns", "band_id INT, bucket STRING, n_members BIGINT")
    spark.sql(
        f"CREATE TABLE {table} ({cols}) "
        "USING parquet CLUSTERED BY (band_id, bucket) "
        f"SORTED BY (band_id, bucket) INTO {m['n_buckets']} BUCKETS "
        f"LOCATION '{loc}'"
    )


def _seen_components(catalog, last: int):
    """The physical pieces of the seen-bucket state as of completed batch
    ``last``: ``(compacted_generations, tail, through, manifest)``.

    ``compacted_generations`` — the LIST of bucketed compacted generations
    (each one PRE-AGGREGATED rows per (band_id, bucket); together covering
    batches ``<= through``), empty if no bucketed compaction has run.  The
    list is the base generation plus any minor deltas (LSM levels): a MINOR
    compaction folds only the flat tail into a new delta generation, so its
    cost is O(tail), not O(history) — see ``compact_seen_buckets``.  Every
    generation is a table bucketed+sorted on the probe key, so consumers
    joining on (band_id, bucket) pay NO exchange and NO sort on these — the
    unbounded — sides.  Generations cover DISJOINT batch ranges, so summing
    per bucket across them is exact.

    ``tail`` — the flat append-only rows from batches in ``(through,
    last]``, aggregated to (band_id, bucket, n_members), or None when
    empty/absent.  Parquet min/max stats on batch_id skip the pre-``through``
    files wholesale (each micro-batch appended its own files), so the tail
    scan is proportional to data since the last compaction, not to history.

    All pieces carry the same schema, and summing them per bucket is
    exactly the probe's prior count — the invariant every consumer
    (the per-batch probe, both compaction flavors) is built on.

    The ``seen_compact`` manifest dict (or None) rides along so callers
    don't re-stat it.
    """
    comps, through = [], -1
    m = catalog.read_manifest("seen_compact")
    if m and m.get("through", -1) >= 0:
        through = m["through"]
        for table in _gen_tables(m):
            _ensure_compact_table(catalog, m, table)
            comps.append(
                catalog.spark.table(table).select(
                    "band_id", "bucket", "n_members"
                )
            )
    tail = None
    if catalog.exists("dedup_seen_buckets"):
        tail = (
            catalog.read("dedup_seen_buckets")
            .where(
                (F.col("batch_id") > through) & (F.col("batch_id") <= last)
            )  # exclude compacted-away history AND torn tails
            # replay safety: a crash between a batch's SEEN append and its
            # manifest commit makes the deterministic replay append the
            # SAME (band_id, bucket, n_members, batch_id) rows again.
            # collect_set collapses the identical copies (same batch ->
            # identical struct; different batches -> distinct batch_id), a
            # fold sums the survivors — one aggregate, one exchange, no
            # double-count lifting later members past the drop window (the
            # read_curated dropDuplicates rule, applied to the state
            # table).  Set size is bounded by batches since compaction.
            .groupBy("band_id", "bucket")
            .agg(
                F.aggregate(
                    F.collect_set(F.struct("batch_id", "n_members")),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x["n_members"],
                ).alias("n_members")
            )
        )
    return comps, tail, through, m


def seen_positions(banded: DataFrame, catalog, last: int) -> DataFrame:
    """Rank ``banded`` (doc_id, band_id, bucket) rows by GLOBAL bucket
    position: prior members across all completed batches + arrival rank
    within this batch — the one positional quantity the streaming dedup
    rule consumes (drop iff 2 <= pos <= cap; column ``p`` is the prior
    count, ``r`` the within-batch rank, pos = p + r).

    Scale shape (the round-5 follow-through on "bucket is the table's
    physical partition key"): the prior arrives in per-piece joins instead
    of one union+groupBy so the compacted generations — the pieces that
    grow with corpus history — are consumed AS STORED: pre-aggregated (no
    per-batch groupBy over 10^9+ state rows) and bucketed on the join key
    (no per-batch exchange, no sort; the scan is the whole cost).  With
    minor compaction the state is a short LIST of such generations (base +
    deltas, bounded by ``max_minors``); each adds one exchange-free SMJ —
    the batch side is partitioned once and every join preserves that
    partitioning, so the probe still pays exactly ONE batch-side exchange
    regardless of generation count.  Only the small post-compaction tail
    pays an aggregate+shuffle, and that input is bounded by compaction
    cadence, not corpus size.  Join strategies stay planner-chosen: real
    tables give AQE real stats.

    Measured dead end, kept out deliberately (BENCH/SOAK.md): a
    broadcast-semi-join probe (batch keys broadcast into each generation,
    eliminating the SMJ's state-side re-sort — Spark 4 cannot elide the
    sorted-bucketed scan's sort) benchmarked 3-4x SLOWER at 4M-64M state
    rows; the per-generation sort of pre-aggregated state is already
    cheap at bucket-count parallelism, while the two batch-key broadcasts
    (build + ship ~1.6M string keys per join) dominate.
    """
    from pyspark.sql import Window

    comps, tail, _, m = _seen_components(catalog, last)
    if comps:
        # pre-partition the batch side to the state's bucket count so the
        # rank window and the probe joins share ONE exchange: the window
        # needs (band_id, bucket) clustering anyway, and matching the
        # compacted tables' partitioning count lets every SMJ reuse it
        # instead of inserting a second batch-side shuffle.  NOTE this
        # makes n_buckets the probe stage's task count — size it at least
        # to the cluster's parallelism (see compact_seen_buckets).
        banded = banded.repartition(m["n_buckets"], "band_id", "bucket")
    w = Window.partitionBy("band_id", "bucket").orderBy("doc_id")
    ranked = banded.withColumn("r", F.row_number().over(w))
    zero = F.lit(0).cast("long")
    parts = []
    for i, comp in enumerate(comps):
        col = f"p_c{i}"
        ranked = ranked.join(
            comp.withColumnRenamed("n_members", col),
            ["band_id", "bucket"],
            "left",
        )
        parts.append(col)
    if tail is not None:
        ranked = ranked.join(
            tail.withColumnRenamed("n_members", "p_tail"),
            ["band_id", "bucket"],
            "left",
        )
        parts.append("p_tail")
    p = zero
    for col in parts:
        p = p + F.coalesce(col, zero)
    return ranked.withColumn("p", p).drop(*parts)


def _swap_seen(catalog, df: DataFrame) -> None:
    """Replace the flat ``dedup_seen_buckets`` table with ``df`` behind the
    versioned-name + atomic-pointer-flip protocol (crash on either side of
    the flip leaves a readable, correct table).  The generation counter is
    parsed from the current physical name, so the pointer manifest needs
    no extra fields and ``catalog.flip_pointer`` stays the one flip API.
    """
    import re

    prev = catalog.resolve("dedup_seen_buckets")
    g = re.search(r"__g(\d+)$", prev)
    version = f"dedup_seen_buckets__g{(int(g.group(1)) if g else 0) + 1}"
    # 1. materialize under the version name (overwrite: retries idempotent)
    catalog.overwrite(df, version)
    # 2. the commit: one atomic manifest replace moves the live name
    old = catalog.flip_pointer("dedup_seen_buckets", version)
    # 3. post-commit cleanup (best-effort; an orphan dir is the worst case)
    if old:
        catalog.drop_physical(old)


def compact_seen_buckets(
    catalog,
    n_buckets: int | None = None,
    mode: str = "major",
    max_minors: int = 8,
) -> int:
    """Rewrite ``dedup_seen_buckets`` as one summed row per (band_id,
    bucket).

    The stream appends one file-set per micro-batch and never merges the
    bucket rows across batches; over a long run the table accumulates both
    small files and repeated buckets.  Compaction collapses it to one row
    per bucket with ``n_members`` summed (sum is exactly what the probe
    aggregates at read time, so probe results are unchanged), tagged with
    the last COMPLETED batch id (torn tails from a mid-batch crash are
    dropped by the same batch_id filter the probe uses).  Run it BETWEEN stream runs — the availableNow
    drain-then-stop pattern — never concurrently with one.  At 10^12 docs
    this is the periodic maintenance job that keeps the probe-side join
    input proportional to distinct buckets, not to batches.

    Crash safety (round 5): the compacted rows land under a fresh
    VERSIONED physical table, and the live name moves in ONE atomic
    pointer flip (``catalog.flip_pointer`` -> os.replace of the manifest).
    A crash before the flip leaves the old table live and an orphan
    version dir that the retry overwrites; a crash after the flip leaves
    the new table live and the old dir pending cleanup — there is no
    instant at which ``dedup_seen_buckets`` is unreadable or wrong
    (pinned by test_compact_seen_buckets_crash_safe).  On the Iceberg leg
    ``overwrite`` is already one atomic snapshot swap (createOrReplace),
    so the live name is rewritten directly.

    ``n_buckets`` (parquet leg) selects the BUCKETED layout: the compacted
    generation lands as an EXTERNAL table under ``catalog.base`` (a fresh
    session re-attaches the definition from the manifest — state never
    depends on session-scoped catalog metadata), bucketed AND sorted on
    (band_id, bucket) — the probe's join key — with one file per bucket, and the
    ``seen_compact`` manifest (table name, generation, ``through`` batch
    watermark) moves in the same atomic os.replace commit.  Why this is the
    at-scale layout: the compacted generation is the piece of state that
    grows with corpus history, and every micro-batch joins against it;
    stored pre-aggregated + pre-hashed + pre-sorted, that join needs no
    exchange, no sort, and no groupBy on the unbounded side — the probe's
    per-batch cost over history collapses to a columnar scan (see
    ``seen_positions``).  The consumed flat tail is then dropped (readers
    exclude it by the ``through`` watermark either way, so a crash between
    the manifest commit and the cleanup loses nothing).  The layout is
    sticky: later calls without ``n_buckets`` reuse the recorded bucket
    count, so a flat rewrite can never double-count the compacted
    generation.  On the Iceberg leg the same physical property is declared
    instead of hand-built — a ``bucket(N, ...)`` partition transform plus
    storage-partitioned joins — so ``n_buckets`` is ignored there.

    Sizing ``n_buckets``: it becomes the probe stage's task count (the
    batch side repartitions to it so the rank window and join share one
    exchange), so set it to AT LEAST the cluster's total cores — and high
    enough that one bucket's state slice stays comfortably in an
    executor's memory (distinct_buckets / n_buckets rows per task).
    Too-low n_buckets silently caps probe parallelism the same way an
    under-partitioned source caps decode (see ``_fan_out``).

    ``mode="minor"`` (parquet bucketed layout only) is the LSM answer to
    the 12.8M soak's honest negative — under a cadence, every major
    compaction re-reads and re-writes the ENTIRE accumulated bucket set, so
    below ~16 batches of history the cadence costs more than the tail
    savings it buys.  A minor compaction folds ONLY the flat tail into a
    NEW bucketed delta generation (cost O(batches since last compaction),
    independent of history) and appends it to the manifest's ``minors``
    list; the base and prior deltas are untouched.  The probe then joins
    base + deltas + tail — every generation exchange-free (see
    ``seen_positions``) — so probe cost stays flat while compaction cost
    stops growing with corpus history.  When the delta count reaches
    ``max_minors`` the call PROMOTES itself to a major merge (base + all
    deltas + tail -> one new base), bounding the probe's join count; with
    cadence K and promotion every ``max_minors`` minors, total bytes
    rewritten over B batches drop from O(B²/K) — every cadence point pays
    full history — to O(B²/(K·max_minors)) with the quadratic term's
    constant shrunk by the fan-in (each row is rewritten once per minor it
    enters plus once per major that merges it) — the classic tiered-LSM
    write-amplification trade.  Minor mode
    requires an existing bucketed generation (first call, flat layout and
    the Iceberg leg fall through to the normal path; on Iceberg the
    incremental analog would be MERGE INTO / rewrite_data_files, which the
    runtime jar owns).  Crash safety is unchanged: the delta lands under a
    versioned table first and the ``minors`` list moves in the same single
    atomic manifest replace; a replayed batch below the new ``through``
    watermark is excluded by the probe's batch_id filter either way.

    Returns the distinct bucket count after compaction (for a minor: the
    bucket count of the new delta generation; 0 for a no-op).
    """
    m = catalog.read_manifest("stream_curate")
    last = m.get("last_batch_id", -1) if m else -1
    if last < 0:
        return 0
    comps, tail, _, cm = _seen_components(catalog, last)
    if n_buckets is None and cm:
        n_buckets = cm["n_buckets"]  # sticky layout
    # An EXPLICIT n_buckets that disagrees with the recorded layout forces
    # a major rewrite: a minor would write its delta with the new bucket
    # count while base and earlier deltas keep their old physical
    # bucketing, and the single manifest n_buckets field would then
    # declare a bucket spec that doesn't match those files — the
    # exchange-free sort-merge probe trusts the declaration, so prior
    # counts (and dedup drops) would go silently wrong after a restart.
    # Promoting re-buckets the WHOLE state at the new count in one
    # generation, keeping declaration and files consistent.
    rebucket = bool(cm) and n_buckets is not None and n_buckets != cm["n_buckets"]
    minor = (
        mode == "minor"
        and not rebucket
        and bool(comps)
        and n_buckets is not None
        and not getattr(catalog, "use_iceberg", False)
        and len((cm or {}).get("minors", [])) < max_minors
    )
    if minor and tail is None:
        return 0  # nothing new to fold; no generation bump
    parts = [tail] if minor else comps + ([tail] if tail is not None else [])
    if not parts:
        return 0
    seen = parts[0]
    for extra in parts[1:]:
        seen = seen.unionByName(extra)
    if not minor:  # the tail alone is already one row per bucket
        seen = seen.groupBy("band_id", "bucket").agg(
            F.sum("n_members").alias("n_members")
        )
    seen = seen.withColumn("batch_id", F.lit(last))
    if getattr(catalog, "use_iceberg", False):
        # createOrReplace commits the new snapshot atomically, reading the
        # prior snapshot as input — no pointer dance needed
        catalog.overwrite(seen, "dedup_seen_buckets")
        return catalog.read("dedup_seen_buckets").count()
    if n_buckets is None:
        _swap_seen(catalog, seen)
        return catalog.read("dedup_seen_buckets").count()
    import hashlib
    import os

    from mysql_cdc_rs_spark.operators.bucketing import write_bucketed

    gen = (cm.get("gen", 0) if cm else 0) + 1
    tag = hashlib.md5(os.path.abspath(catalog.base).encode()).hexdigest()[:8]
    table = f"dedup_seen_compact_{tag}_g{gen}"
    body = seen.drop("batch_id")
    # 1. materialize the new generation as an EXTERNAL bucketed table whose
    #    files live under catalog.base (state outlives the session; the
    #    catalog entry is re-attached on demand by _ensure_compact_table).
    #    repartition on the bucket columns uses the same hash as bucketBy,
    #    so each task owns exactly one bucket -> ONE file per bucket; a
    #    crash here leaves an orphan table the retry overwrites.
    write_bucketed(
        body.repartition(n_buckets, "band_id", "bucket"),
        table,
        ["band_id", "bucket"],
        n_buckets,
        sort_cols=["band_id", "bucket"],
        path=os.path.join(os.path.abspath(catalog.base), table),
    )
    # 2. the commit: one atomic manifest replace.  The column DDL rides in
    #    the manifest so a fresh session re-attaches the table with the
    #    schema the files were WRITTEN with, not a hardcoded snapshot.
    columns = ", ".join(
        f"{f.name} {f.dataType.simpleString().upper()}"
        for f in body.schema.fields
    )
    catalog.write_manifest(
        "seen_compact",
        {
            "table": table if not minor else cm["table"],
            "minors": (cm.get("minors", []) + [table]) if minor else [],
            "gen": gen,
            "through": last,
            "n_buckets": n_buckets,
            "columns": columns,
        },
    )
    # 3. post-commit cleanup — every dropped target is already invisible to
    #    readers (the probe takes tail rows with batch_id > through only,
    #    and a major's manifest replace unlists the merged generations),
    #    so a crash anywhere below leaves orphans, never wrong answers
    if not minor and cm:
        for old in _gen_tables(cm):
            catalog.spark.sql(f"DROP TABLE IF EXISTS {old}")
            catalog.drop_physical(old)
    if catalog.exists("dedup_seen_buckets"):
        catalog.drop_physical(catalog.resolve("dedup_seen_buckets"))
    return catalog.spark.table(table).count()


def read_curated(catalog) -> DataFrame:
    """Committed curated corpus: completed batches only (torn-tail rule).

    dropDuplicates(doc_id) makes reads immune to the one remaining replay
    window (crash after the curated append but before the manifest write:
    the deterministic replay appends identical rows under the same
    batch_id)."""
    m = catalog.read_manifest("stream_curate")
    last = m.get("last_batch_id", -1) if m else -1
    return (
        catalog.read("curated")
        .where(F.col("batch_id") <= last)
        .dropDuplicates(["doc_id"])
    )


# --- custom stateful operator (applyInPandasWithState) ----------------------

HOST_STATE_SCHEMA = "n long, bytes long"
HOST_OUT_SCHEMA = "host string, n_total long, bytes_total long"


def _host_stats_fn(key, pdf_iter, state: GroupState):
    """Running per-host totals carried in managed state — the streaming
    analog of the reference's per-key decoder context (TableMap cache,
    /root/reference/binlog/src/row/parser.rs:30-103)."""
    import pandas as pd

    n, b = state.get if state.exists else (0, 0)
    for pdf in pdf_iter:
        n += len(pdf)
        b += int(pdf["raw_len"].fillna(0).sum())
    state.update((n, b))
    yield pd.DataFrame({"host": [key[0]], "n_total": [n], "bytes_total": [b]})


def start_host_stats_stream(stream_df: DataFrame, sink_dir: str, checkpoint_dir: str):
    """Stateful per-host running stats; update-mode memory-friendly output."""
    decoded = decode_pages(stream_df).select("host", "raw_len")
    stats = decoded.groupBy("host").applyInPandasWithState(
        _host_stats_fn,
        outputStructType=HOST_OUT_SCHEMA,
        stateStructType=HOST_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        stats.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(
            # append update rows; totals are monotone so the latest value per
            # host is max(n_total) — readers take the max per key
            lambda df, _id: df.write.mode("append").parquet(
                f"{sink_dir}/host_stats"
            )
        )
        .trigger(availableNow=True)
        .start()
    )


def start_session_window_stream(
    stream_df: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
):
    """W2 streaming analog: session windows per host with an inactivity gap —
    the GTID-opens/XID-closes transaction bracketing restated as event-time
    sessionization (SURVEY §2.7 W2 'streaming: session_window')."""
    decoded = decode_pages(stream_df)
    agg = (
        decoded.withWatermark("warc_ts", watermark)
        .groupBy(F.session_window("warc_ts", gap).alias("sw"), F.col("host"))
        .agg(F.count("*").alias("n_events"), F.sum("raw_len").alias("bytes"))
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "host",
            "n_events",
            "bytes",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", f"{sink_dir}/host_sessions")
        .start()
    )
