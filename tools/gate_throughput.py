"""Per-epoch latency receipts for the at-the-door sinks
(minhash_gate_sink, suffix_span_sink) — the streaming-side companion
of the batch twins' 30× receipts: the contract is per-epoch cost
O(batch + probe-of-at-rest), so epoch latency must stay roughly flat
as the folded corpus grows epoch over epoch (a rising curve would mean
the sink re-pays the corpus).

Feeds the sf documents table in N monotone-id slices and times each
fold; prints ONE JSON line with the per-epoch seconds for both sinks.

Timing run — execute SOLO (the bench discipline).

Usage: python tools/gate_throughput.py [sf_dir] [n_epochs]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from z316_sales_data_pipeline_spark.session import get_spark
from z316_sales_data_pipeline_spark.sources.tables import load_table
from z316_sales_data_pipeline_spark.streaming.pipeline import (
    minhash_gate_sink,
    suffix_span_sink,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = get_spark("gate-throughput")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    n = docs.count()
    step = (n + n_epochs - 1) // n_epochs
    # monotone-id slices, materialized so the fold never re-reads parquet
    slices = [
        docs.filter((F.col("doc_id") >= i * step) & (F.col("doc_id") < (i + 1) * step))
        .localCheckpoint(eager=True)
        for i in range(n_epochs)
    ]

    out: dict = {"sf_dir": sf_dir, "n_docs": n, "n_epochs": n_epochs}
    with tempfile.TemporaryDirectory() as td:
        mg = minhash_gate_sink(
            f"{td}/mhg_state", f"{td}/mhg_acc", f"{td}/mhg_qua", "text", "doc_id"
        )
        times = []
        for i, sl in enumerate(slices):
            t0 = time.time()
            mg(sl, i)
            times.append(round(time.time() - t0, 2))
        out["minhash_gate_sink_epoch_sec"] = times

        ss = suffix_span_sink(f"{td}/sss_state", f"{td}/sss_spans", "text", "doc_id")
        times = []
        for i, sl in enumerate(slices):
            t0 = time.time()
            ss(sl, i)
            times.append(round(time.time() - t0, 2))
        out["suffix_span_sink_epoch_sec"] = times

    print(json.dumps(out))


if __name__ == "__main__":
    main()
