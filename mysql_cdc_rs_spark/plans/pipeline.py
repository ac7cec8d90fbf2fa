"""End-to-end pipeline: pages -> decode -> enrich -> route -> aggregate.

Mirrors the reference lifecycle (SURVEY §3.1) as four declarative stages.
The hot path is exactly one vectorized UDF projection + two broadcast joins
+ one partitioned write + metric groupBys — no per-row Python, no driver
loops, no collect() of fact data.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mysql_cdc_rs_spark.operators.decode import decode_pages
from mysql_cdc_rs_spark.operators.enrich import enrich
from mysql_cdc_rs_spark.operators.route import write_routes
from mysql_cdc_rs_spark.operators import stats as S
from mysql_cdc_rs_spark.plans.checkpoint import lineage_summary
from mysql_cdc_rs_spark.sources.catalog import SinkCatalog


@dataclass
class PipelineResult:
    route_counts: dict[str, int]
    metrics: dict[str, object] = field(default_factory=dict)
    elapsed_s: float = 0.0


def build_enriched(pages: DataFrame) -> DataFrame:
    """Lazy plan for decode+enrich (no action)."""
    return enrich(decode_pages(pages))


def run_pipeline(
    pages: DataFrame,
    catalog: SinkCatalog,
    with_metrics: bool = True,
    resume: bool = True,
) -> PipelineResult:
    t0 = time.monotonic()
    enriched = build_enriched(pages)

    if resume:
        # decode+enrich+route is one checkpointable unit; its input lineage
        # is the pages table's deterministic url-bucket histogram.
        pages_lineage_df = pages.select(
            F.pmod(F.xxhash64("url"), F.lit(256)).cast("int").alias("url_bucket")
        )
        input_lineage = lineage_summary(pages_lineage_df)
        manifest = catalog.read_manifest("routed")
        if (
            manifest is not None
            and manifest.get("status") == "complete"
            and manifest.get("input_lineage") == input_lineage
            and catalog.exists("routed")
        ):
            routed = catalog.read("routed")
            counts = {
                r["route"]: r["n"]
                for r in routed.groupBy("route").agg(F.count("*").alias("n")).collect()
            }
        else:
            counts = write_routes(enriched, catalog)
            catalog.write_manifest(
                "routed",
                {
                    "status": "complete",
                    "stage": "routed",
                    "input_lineage": input_lineage,
                    "output_lineage": {"row_count": sum(counts.values())},
                },
            )
            routed = catalog.read("routed")
    else:
        counts = write_routes(enriched, catalog)
        routed = catalog.read("routed")

    metrics: dict[str, object] = {}
    if with_metrics:
        # metrics computed from the PERSISTED routed table (attested counts)
        decoded_cols = routed.withColumn(
            "raw_len", F.coalesce(F.col("body_len"), F.lit(0))
        )
        metrics["per_sink"] = [r.asDict() for r in S.per_sink_metrics(routed).collect()]
        metrics["event_type"] = [
            r.asDict(True)
            for r in S.event_type_stats(
                decoded_cols.withColumn("warc_ts", F.col("warc_ts"))
            ).collect()
        ]
        metrics["errors"] = [r.asDict() for r in S.error_stats(decoded_cols).collect()]
        metrics["top_hosts"] = [
            r.asDict()
            for r in S.host_stats_salted(decoded_cols).limit(20).collect()
        ]
        catalog.write_manifest("metrics", _json_safe(metrics))

    return PipelineResult(
        route_counts=counts,
        metrics=metrics,
        elapsed_s=time.monotonic() - t0,
    )


def _json_safe(obj):
    import datetime

    if isinstance(obj, dict):
        return {k: _json_safe(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_json_safe(v) for v in obj]
    if isinstance(obj, (datetime.datetime, datetime.date)):
        return obj.isoformat()
    return obj
