"""Serve-latency vs segment count for append-segment tables (r5
VERDICT item 5's measurement half).

Builds the SAME hypertable-rollup partials table twice at
$SPARK_GRAFT_SF_DIR (default sf0.1) — once as ONE compacted segment,
once as N segments (one per event_id slice, the continuous-ingestion
shape before compaction fires) — and times the serving merge
(read_appended → merge_partials → count) warm on each. The delta is
pure read amplification: listing, parquet footer reads and task
scheduling across segment dirs; the merged row count is identical.

Usage: python tools/segment_latency.py [n_segments] (default 50)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from z316_sales_data_pipeline_spark import sinks
from z316_sales_data_pipeline_spark.plans import rollup
from z316_sales_data_pipeline_spark.session import get_spark
from z316_sales_data_pipeline_spark.sources.tables import load_table


def _serve_time(spark, table_dir: str, trials: int = 3) -> float:
    best = None
    for _ in range(trials):
        t0 = time.time()
        rollup.merge_partials(
            sinks.read_appended(spark, table_dir).select(
                "bucket_day", "event_type", "n_partial", "cents_partial"
            )
        ).count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    n_segments = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("segment-latency")
    ev = load_table(spark, sf_dir, "events").localCheckpoint(eager=True)

    root = tempfile.mkdtemp(prefix="seglat-")
    many_dir = os.path.join(root, "many")
    one_dir = os.path.join(root, "one")
    try:
        for i in range(n_segments):
            sinks.append_snapshot(
                rollup.event_partials(ev.filter(F.col("event_id") % n_segments == i)),
                many_dir,
            )
        for i in range(n_segments):
            sinks.append_snapshot(
                rollup.event_partials(ev.filter(F.col("event_id") % n_segments == i)),
                one_dir,
            )
        sinks.compact_appended(spark, one_dir)

        t_many = _serve_time(spark, many_dir)
        t_one = _serve_time(spark, one_dir)
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "n_segments": n_segments,
                    "serve_sec_n_segments": round(t_many, 3),
                    "serve_sec_1_segment": round(t_one, 3),
                    "amplification": round(t_many / t_one, 2) if t_one else None,
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
