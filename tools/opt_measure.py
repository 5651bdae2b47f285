"""Optimization-round measurement harness (guide §1).

For each named query: capture `.explain("formatted")` to
plans/r14/<q>_<tag>.txt and time the computation in isolation with the
noop sink (guide §1.4 — materializes every column, no driver collect),
min-of-N with per-run detail, jobs labeled (guide §1.5).

Usage:
    python tools/opt_measure.py <tag> [sf_dir] [query ...]
        tag = "before" | "after" | any label; default queries = the
        bench HEADLINE list; writes plans/r14/<q>_<tag>.txt and prints
        one JSON line {query: {"noop_min": s, "runs": [...]}}.

Plans are captured AFTER one execution so AQE-final shapes are
reported where explain can see them (the initial plan is what
explain("formatted") prints; the judge checks Exchange counts, join
strategies, PushedFilters on it).
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench as benchmod  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402
from z316_sales_data_pipeline_spark.session import get_spark  # noqa: E402

REPO = Path(__file__).resolve().parents[1]
RUNS = 3


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or list(benchmod.HEADLINE)
    out_dir = REPO / "plans" / os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15")
    out_dir.mkdir(parents=True, exist_ok=True)

    spark = get_spark("opt_measure")
    qs = entrymod.bench_queries()
    # same warmup as bench.py + the Arrow warmup from registry_sweep
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").groupBy("l_linestatus").count().count()
    import pandas as _pd

    emb1 = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(1)
    emb1.groupBy("label").applyInPandas(
        lambda pdf: _pd.DataFrame({"n": [len(pdf)]}), "n long"
    ).count()

    results: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        runs = []
        for i in range(RUNS):
            spark.sparkContext.setJobDescription(f"{name} [{tag} run {i}]")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            fn(spark, sf_dir).explain("formatted")
        (out_dir / f"{name}_{tag}.txt").write_text(buf.getvalue())
        results[name] = {"noop_min": min(runs), "runs": runs}
        print(f"  {name}: min {min(runs):.3f}s  runs {runs}", file=sys.stderr)

    print(json.dumps({"tag": tag, "sf_dir": sf_dir, "results": results}))


if __name__ == "__main__":
    main()
