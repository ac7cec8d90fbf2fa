"""Training-data curation pipeline: the composition showcase.

decode -> text-quality filter -> near-duplicate removal (minhash-LSH) ->
surviving corpus.  This is what the engine is FOR at 100 TB: every stage is
one of the already-tested operators, chained without any driver-side
materialization:

    pages (binary html)
      -> decode_pages            (vectorized UDF, one pass)
      -> keep text-bearing docs  (event_type html/plain)
      -> quality gate            (token count >= min_tokens, JVM-side)
      -> LSH near-dup pairs      (shingle -> minhash -> band bucket join)
      -> drop the higher doc of every candidate pair (keep-first)
      -> survivors

Scale shape: the only shuffles are the dedup groupBys (doc_id, bucket) —
the quality gate and decode are shuffle-free; candidate-pair generation is
bucket-local (no O(n^2)); the drop set is applied with a plain hash
left-anti join on doc_id.  The drop set is NOT broadcast: its size is
proportional to the corpus's near-dup mass (20-40%+ on web corpora), so a
forced broadcast would OOM the driver exactly when dedup matters most.
Declaring the join and letting AQE pick the strategy gives the best of
both — a runtime broadcast when drops genuinely is small, a shuffled hash
join on the uniform doc_id key otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mysql_cdc_rs_spark.functions.text import words_of
from mysql_cdc_rs_spark.operators import dedup as DD
from mysql_cdc_rs_spark.operators.decode import decode_pages

DEFAULT_MIN_TOKENS = 20


def curate(
    pages: DataFrame,
    doc_id_expr=None,
    min_tokens: int = DEFAULT_MIN_TOKENS,
    verify_jaccard: float | None = None,
    verify_max_pairs: int = 4,
) -> DataFrame:
    """pages -> surviving (doc_id, text) corpus.

    doc_id_expr: Column producing a unique numeric doc id (defaults to
    extracting the trailing integer of the url, which both generators emit).

    verify_jaccard: opt-in exact-verification stage.  By default survivors
    drop on LSH candidacy alone, which over-drops on band collisions
    (bucket agreement without real similarity).  With a threshold set, the
    exact word-3-gram Jaccard is computed for candidate pairs
    (``ngram_jaccard_pairs(candidates=...)``) and only pairs at or above
    the threshold drop their doc_b.  Off (None) leaves the plan
    byte-identical to round 4's.

    verify_max_pairs BOUNDS the verification work: only each doc_b's
    ``verify_max_pairs`` lowest-doc_a candidate pairs are verified (a
    partitioned row_number, no global sort).  This is scale-critical, not
    cosmetic: on a high-dup-mass corpus candidacy is quadratic-ish inside
    the capped buckets — the 200k generator corpus yields 12.77M candidate
    pairs for 151k candidate drops (84 pairs/doc_b), and verifying ALL of
    them is O(|pairs| x shingles/doc) ≈ 4B join rows, which OOM'd a 32-core
    local run and would dominate a fleet job for no recall gain.  The k
    lowest-id partners are the near-dup cluster's core members, so a real
    duplicate verifies against them; a doc_b whose only high-J partner
    falls outside its k window survives (documented under-drop risk,
    favoring keeping data over dropping it).
    """
    decoded = decode_pages(pages)
    if doc_id_expr is None:
        doc_id_expr = F.regexp_extract("url", r"/(\d+)$", 1).cast("long")

    textful = decoded.filter(
        F.col("event_type").isin("html", "plain")
    ).select(doc_id_expr.alias("doc_id"), "text")

    # The quality corpus feeds TWO branches (the LSH drops set and the
    # survivors anti-join); without a persist Spark re-executes the whole
    # decode subtree for each — at 100 TB that doubles the most expensive
    # stage.  MEMORY_AND_DISK spills gracefully on executors that can't
    # hold their slice.
    from pyspark import StorageLevel

    quality = textful.filter(
        F.size(words_of(F.col("text"))) >= min_tokens
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # Materialize the cache in its own job before both branches fan out
    # over it.  The anti-join's first action otherwise runs the drops
    # subtree and the survivors scan as CONCURRENT sibling stages racing
    # to build the same cached partitions: the losing task parks on a
    # block write lock the winner holds while feeding a Python decode
    # worker — the runner stall captured in BENCH/hang/ (and the likely
    # shape of the round-4 12.8M hang).  One extra count() job per
    # curate() call; the decode work itself was owed either way.
    quality.count()

    pairs = DD.lsh_candidate_pairs(quality)
    if verify_jaccard is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("doc_b").orderBy("doc_a")
        bounded = (
            pairs.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= verify_max_pairs)
            .drop("_rn")
        )
        pairs = DD.ngram_jaccard_pairs(
            quality, min_jaccard=verify_jaccard, candidates=bounded
        )
    # keep-first policy: any doc that is the HIGHER member of a candidate
    # pair is a near-duplicate of an earlier doc -> dropped.  No broadcast
    # hint: drops scales with the corpus's dup mass (see module docstring).
    drops = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    survivors = quality.join(drops, "doc_id", "left_anti")
    # hand the persist lifecycle to the caller: release(survivors) after
    # the consuming action, or the cached quality plan outlives the run
    survivors._curate_persisted = quality
    return survivors


def release(survivors: DataFrame) -> None:
    """Unpersist the intermediate quality corpus cached by ``curate``.

    ``curate`` must persist lazily (its result is consumed by callers it
    does not control), so it cannot unpersist itself; call this after the
    consuming action or a long-lived session (bench loop, notebook)
    accumulates one cached plan per invocation."""
    q = getattr(survivors, "_curate_persisted", None)
    if q is not None:
        q.unpersist()


def curate_resumable(
    pages: DataFrame,
    catalog,
    min_tokens: int = DEFAULT_MIN_TOKENS,
) -> DataFrame:
    """Checkpoint-resumable curation: the same decode -> quality gate ->
    LSH near-dup drop as curate(), split into two CheckpointedStage units
    ('curate_quality', 'curate_survivors') whose parquet outputs + lineage
    manifests let a rerun skip completed stages — the batch analog of
    resuming the reference's reader from a GTID checkpoint, and how the
    100 TB job survives a mid-run failure without re-decoding the corpus.

    Stage lineage is keyed on deterministic url-hash buckets, so it is
    stable across runs AND across parallelism levels; any change to the
    input (rows added/removed) changes the bucket histogram and forces a
    recompute of the affected stage and everything after it.
    """
    from mysql_cdc_rs_spark.plans.checkpoint import CheckpointedStage

    pages_b = pages.withColumn(
        "url_bucket", F.pmod(F.xxhash64("url"), F.lit(256)).cast("int")
    )

    def quality_fn(df: DataFrame) -> DataFrame:
        decoded = decode_pages(df.drop("url_bucket"))
        doc_id = F.regexp_extract("url", r"/(\d+)$", 1).cast("long")
        textful = decoded.filter(
            F.col("event_type").isin("html", "plain")
        ).select(doc_id.alias("doc_id"), "text", "url_bucket")
        return textful.filter(F.size(words_of(F.col("text"))) >= min_tokens)

    quality = CheckpointedStage(catalog, "curate_quality").run(
        pages_b, quality_fn
    )

    def survivors_fn(qdf: DataFrame) -> DataFrame:
        pairs = DD.lsh_candidate_pairs(qdf.select("doc_id", "text"))
        drops = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
        return qdf.join(drops, "doc_id", "left_anti")

    return CheckpointedStage(catalog, "curate_survivors").run(
        quality, survivors_fn
    )


def curation_report(pages: DataFrame, min_tokens: int = DEFAULT_MIN_TOKENS) -> dict:
    """Stage-by-stage exact counts (the per-sink metrics analog)."""
    decoded = decode_pages(pages).cache()
    doc_id = F.regexp_extract("url", r"/(\d+)$", 1).cast("long")
    textful = decoded.filter(F.col("event_type").isin("html", "plain")).select(
        doc_id.alias("doc_id"), "text"
    )
    quality = textful.filter(F.size(words_of(F.col("text"))) >= min_tokens)
    survivors = curate(pages, min_tokens=min_tokens)
    out = {
        "input": decoded.count(),
        "text_bearing": textful.count(),
        "quality_pass": quality.count(),
        "survivors": survivors.count(),
    }
    decoded.unpersist()
    release(survivors)
    return out
