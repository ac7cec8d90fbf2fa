"""Cadence compaction cost: major-only vs LSM minor+promotion.

The 12.8M streaming soak showed compaction must be a CADENCE (the probe's
flat-tail cost grows with batches since the last compaction), but the 1.6M
cadence run was an honest negative: every major compaction re-reads and
re-writes the ENTIRE accumulated bucket state, so below ~16 batches of
history the rewrites cost more than the tail savings.  ``mode="minor"``
folds only the tail into a new bucketed delta generation (O(tail) per
cadence point) and promotes to a major merge every ``max_minors`` deltas.

This measures exactly that trade on synthetic state with realistic bucket
reuse: B micro-batch state appends, a compaction every K, timed per
compaction under both modes, plus the per-batch probe cost against the
final state of each mode (minor's probe joins base + deltas) and a
drop-set equality check between the two layouts.

Usage: python scripts/bench_compaction.py [batches] [cadence] [rows_per_batch]
Defaults: 24 4 1000000.  Prints one JSON line; numbers go to BENCH/SOAK.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 24
K = int(sys.argv[2]) if len(sys.argv) > 2 else 4
S_BATCH = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000
BANDS = 16
N_BUCKETS = 64
MAX_MINORS = 4
PROBE_DOCS = 100_000
WORK = "/tmp/spark_graft_bench_compaction"


def main() -> None:
    from pyspark.sql import functions as F

    from mysql_cdc_rs_spark.operators import dedup as DD
    from mysql_cdc_rs_spark.session import build_session
    from mysql_cdc_rs_spark.sources.catalog import SinkCatalog
    from mysql_cdc_rs_spark.streaming.stream_pipeline import (
        _gen_tables,
        compact_seen_buckets,
        seen_positions,
    )

    spark = build_session(
        "compaction-bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {
        "metric": "cadence_compaction_major_vs_minor",
        "batches": B,
        "cadence": K,
        "rows_per_batch": S_BATCH,
        "n_buckets": N_BUCKETS,
        "max_minors": MAX_MINORS,
        "host_load_at_start": [round(x, 2) for x in os.getloadavg()],
        "modes": {},
    }

    def batch_state(b: int):
        """Synthetic per-batch bucket census: 75% of a batch's buckets are
        FRESH, 25% repeat the previous batch's range (web-corpus shape:
        template buckets recur across batches, content buckets don't)."""
        lo = b * (S_BATCH * 3 // 4)
        return spark.range(lo, lo + S_BATCH).selectExpr(
            f"cast(id % {BANDS} as int) as band_id",
            "md5(cast(id as string)) as bucket",
            "cast(1 + id % 7 as long) as n_members",
            f"cast({b} as long) as batch_id",
        )

    # a fixed probe batch whose buckets all exist somewhere in the state
    total_rows = (B - 1) * (S_BATCH * 3 // 4) + S_BATCH
    probe = spark.range(PROBE_DOCS * BANDS).selectExpr(
        f"cast(id div {BANDS} as long) as doc_id",
        f"cast(id % {BANDS} as int) as band_id",
        f"md5(cast(id * 2654435761 % {total_rows} as string)) as bucket",
    )
    cap = DD.MAX_BUCKET
    pos = F.col("p") + F.col("r")

    drops: dict = {}
    for mode in ("major", "minor"):
        base = os.path.join(WORK, mode)
        shutil.rmtree(base, ignore_errors=True)
        cat = SinkCatalog(spark, base)
        compact_secs: list[float] = []
        append_sec = 0.0
        for b in range(B):
            t0 = time.monotonic()
            cat.append(batch_state(b), "dedup_seen_buckets")
            cat.write_manifest("stream_curate", {"last_batch_id": b})
            append_sec += time.monotonic() - t0
            if (b + 1) % K == 0:
                t0 = time.monotonic()
                compact_seen_buckets(
                    cat, n_buckets=N_BUCKETS, mode=mode, max_minors=MAX_MINORS
                )
                compact_secs.append(round(time.monotonic() - t0, 3))
        t0 = time.monotonic()
        n_drops = (
            seen_positions(probe, cat, B - 1)
            .where((pos >= 2) & (pos <= cap))
            .select("doc_id")
            .distinct()
            .count()
        )
        probe_sec = time.monotonic() - t0
        m = cat.read_manifest("seen_compact")
        gens = _gen_tables(m)
        out["modes"][mode] = {
            "compact_secs": compact_secs,
            "compact_total_sec": round(sum(compact_secs), 3),
            "append_total_sec": round(append_sec, 3),
            "probe_sec": round(probe_sec, 3),
            "generations": len(gens),
            "state_mb": round(
                sum(
                    os.path.getsize(os.path.join(r, f))
                    for t in gens
                    for r, _, fs in os.walk(os.path.join(base, t))
                    for f in fs
                )
                / 1e6,
                1,
            ),
        }
        drops[mode] = n_drops
        for t in gens:
            spark.sql(f"DROP TABLE IF EXISTS {t}")
    assert drops["major"] == drops["minor"], "modes must agree on drops"
    out["probe_drops"] = drops["major"]
    out["compact_total_speedup"] = round(
        out["modes"]["major"]["compact_total_sec"]
        / out["modes"]["minor"]["compact_total_sec"],
        2,
    )
    out["host_load_at_end"] = [round(x, 2) for x in os.getloadavg()]
    shutil.rmtree(WORK, ignore_errors=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
