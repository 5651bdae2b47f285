"""Per-epoch latency receipts for the at-the-door sinks
(minhash_gate_sink, suffix_span_sink) — the streaming-side companion
of the batch twins' 30× receipts: the contract is per-epoch cost
O(batch + probe-of-at-rest), so epoch latency must stay roughly flat
as the folded corpus grows epoch over epoch (a rising curve would mean
the sink re-pays the corpus).

Feeds the sf documents table in N monotone-id slices and times each
fold; prints ONE JSON line with the per-epoch seconds for both sinks,
plus the r14 at-rest receipts: committed segment counts per table
(bounded by maybe_compact — run >= 30 epochs to see the fold keep the
count flat where the pre-r14 sinks grew one segment per epoch) and
at-rest bytes, including the window relation's bytes against a
text-keyed equivalent (the pre-r14 layout) — the storage half of the
(hash, pos) re-key.

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
    semantic_gate_sink,
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

    def du(path: str) -> int:
        total = 0
        for root, _dirs, files in os.walk(path):
            for fn in files:
                try:
                    total += os.path.getsize(os.path.join(root, fn))
                except OSError:
                    pass
        return total

    def summarize(times: list[float]) -> list[float]:
        if len(times) <= 8:
            return times
        # head 3 + per-quartile means + tail 3: keeps the JSON line short
        q = len(times) // 4
        means = [
            round(sum(times[i * q:(i + 1) * q]) / q, 2) for i in range(4)
        ]
        return times[:3] + means + times[-3:]

    from z316_sales_data_pipeline_spark import sinks

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
        out["minhash_gate_sink_epoch_sec"] = summarize(times)
        out["mhg_segments"] = {
            t: sinks.committed_segment_count(f"{td}/mhg_{t}")
            for t in ("state/ex", "state/idx", "acc", "qua")
        }

        ss = suffix_span_sink(f"{td}/sss_state", f"{td}/sss_spans", "text", "doc_id")
        times = []
        for i, sl in enumerate(slices):
            t0 = time.time()
            ss(sl, i)
            times.append(round(time.time() - t0, 2))
        out["suffix_span_sink_epoch_sec"] = summarize(times)
        out["sss_segments"] = {
            t: sinks.committed_segment_count(f"{td}/sss_{t}")
            for t in ("state/win", "state/docs", "spans")
        }
        out["sss_bytes"] = {
            "win_hash": du(f"{td}/sss_state/win"),
            "docs": du(f"{td}/sss_state/docs"),
            "spans": du(f"{td}/sss_spans"),
        }
        # the pre-r14 at-rest layout for comparison: every window WITH
        # its text — what the (hash, pos) re-key removed from rest
        from z316_sales_data_pipeline_spark.functions.text import shingles

        text_win = docs.select(
            F.col("doc_id"), F.posexplode(shingles("text", 8)).alias("pos", "__w")
        )
        text_win.write.mode("overwrite").parquet(f"{td}/win_text_equiv")
        out["win_text_equiv_bytes"] = du(f"{td}/win_text_equiv")
        # raw payload channel — the shuffle/memory-bytes proxy parquet
        # compression masks (synthetic window text is dictionary-
        # friendly; real corpora are not): text key bytes vs 8/window
        raw = text_win.agg(
            F.sum(F.octet_length("__w")).alias("tb"), F.count(F.lit(1)).alias("nw")
        ).first()
        out["win_key_raw_bytes"] = {
            "text": int(raw["tb"] or 0),
            "hash": 8 * int(raw["nw"]),
            "n_windows": int(raw["nw"]),
        }

        # semantic gate: embeddings table, frozen model from the first
        # slice's ids (pre-stream corpus arm)
        from z316_sales_data_pipeline_spark.operators import similarity as S

        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding"), "label"
        )
        ne = emb.count()
        estep = (ne + n_epochs - 1) // n_epochs
        corpus_arm = emb.filter(F.col("vec_id") % 5 != 0)
        assign = S.kmeans_assign(corpus_arm, "embedding", "vec_id", "label", n_iters=1)
        cents = S.centroid_table(assign, corpus_arm, "embedding", "vec_id")
        eslices = [
            emb.filter(
                (F.col("vec_id") >= i * estep) & (F.col("vec_id") < (i + 1) * estep)
            ).localCheckpoint(eager=True)
            for i in range(n_epochs)
        ]
        sg = semantic_gate_sink(
            f"{td}/smg_state", f"{td}/smg_acc", f"{td}/smg_qua", "embedding", "vec_id", cents
        )
        times = []
        for i, sl in enumerate(eslices):
            t0 = time.time()
            sg(sl, i)
            times.append(round(time.time() - t0, 2))
        out["semantic_gate_sink_epoch_sec"] = summarize(times)
        out["smg_segments"] = {
            t: sinks.committed_segment_count(f"{td}/smg_{t}")
            for t in ("state/asg", "acc", "qua")
        }

        # composed curation gate: full admission cascade per epoch;
        # eval set frozen at construction, stream carries train only
        from z316_sales_data_pipeline_spark.streaming.pipeline import (
            curation_gate_sink,
        )

        docs_l = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "lang", "source"
        )
        eval_docs = docs_l.filter(F.col("source") == "src0").localCheckpoint(
            eager=True
        )
        train = docs_l.filter(F.col("source") != "src0")
        tslices = [
            train.filter(
                (F.col("doc_id") >= i * step) & (F.col("doc_id") < (i + 1) * step)
            ).localCheckpoint(eager=True)
            for i in range(n_epochs)
        ]
        cg = curation_gate_sink(
            f"{td}/cgs_state",
            f"{td}/cgs_acc",
            f"{td}/cgs_qua",
            "text",
            "doc_id",
            "lang",
            "source",
            eval_docs,
        )
        times = []
        for i, sl in enumerate(tslices):
            t0 = time.time()
            cg(sl, i)
            times.append(round(time.time() - t0, 2))
        out["curation_gate_sink_epoch_sec"] = summarize(times)
        out["cgs_segments"] = {
            t: sinks.committed_segment_count(f"{td}/cgs_{t}")
            for t in ("state/fp", "state/levels", "acc", "qua")
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
