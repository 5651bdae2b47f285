"""Count-methodology subset timer for the optimization round.

Times NAMED queries exactly the way bench.py does (same session
factory, same warmup, `.count()` actions, 3 runs each) but over a
subset, so before/after pairs for a targeted change are cheap to
capture in one quiet-session run. Reports every run, not just the
min — run 1 is the cold/compute run; with intra-query persists runs
2-3 ride the session cache exactly as they do under bench.py, so both
numbers are quoted in OPTIMIZATION_r14.md receipts.

Usage: python tools/opt_count.py <tag> [sf_dir] query [query ...]
Prints one JSON line {"tag":..., "results": {q: {"min":s,"runs":[...]}}}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod  # noqa: E402
from z316_sales_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    if os.path.isdir(sys.argv[2]):
        sf_dir, names = sys.argv[2], sys.argv[3:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", sys.argv[2:]
    spark = get_spark("opt_count")
    qs = entrymod.bench_queries()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").groupBy("l_linestatus").count().count()

    results: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        runs = []
        for i in range(3):
            spark.sparkContext.setJobDescription(f"{name} [{tag} run {i}]")
            t0 = time.time()
            fn(spark, sf_dir).count()
            runs.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        results[name] = {"min": min(runs), "runs": runs}
        print(f"  {name}: min {min(runs):.3f}s  runs {runs}", file=sys.stderr)
    print(json.dumps({"tag": tag, "sf_dir": sf_dir, "results": results}))


if __name__ == "__main__":
    main()
