"""LPA skew study (r5 VERDICT item 4's measurement half).

Builds a DELIBERATELY skewed community graph — one template-family hub
whose key carries most of the edge mass, the shape a dup-heavy corpus
gives the pair graph — at a size comparable to the 30× scaling runs,
profiles the degree distribution with the same measurement
skew_profile makes (count per key / mean), picks the hot threshold
from it, and times label_propagation WITH and WITHOUT the
profiler-driven hot/cold split (operators/graph.skew_split_edges).

Both runs use the SAME tuned session (AQE skew-join splitting stays
ON — the comparison is explicit-mitigation vs AQE-only, not vs a
strawman). min-of-2 warm timings; prints ONE JSON line.

Usage: python tools/lpa_skew_study.py [n_nodes] [hub_edges]
Defaults: 200_000 nodes, 4_000_000 hub edges (~83%% of edge mass).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from z316_sales_data_pipeline_spark.operators.graph import label_propagation
from z316_sales_data_pipeline_spark.session import get_spark


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    hub_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
    spark = get_spark("lpa-skew-study")

    nodes = spark.range(n_nodes).select(F.col("id").alias("id")).localCheckpoint(eager=True)
    # hub 0 <-> (id % (n_nodes-1)) + 1: most edge mass on one src key
    hub = spark.range(hub_edges).select(
        F.lit(0).cast("long").alias("src"),
        (F.col("id") % (n_nodes - 1) + 1).alias("dst"),
    )
    ring = spark.range(1, n_nodes - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    half = hub.unionByName(ring)
    edges = (
        half.unionByName(half.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .repartition(64)
        .localCheckpoint(eager=True)
    )

    # the skew_profile measurement, consumed: rows per key vs mean
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("cnt"))
    prof = deg.agg(
        F.max("cnt").alias("max_cnt"),
        (F.sum("cnt") / F.count(F.lit(1))).alias("mean_cnt"),
    ).collect()[0]
    skew_factor = prof["max_cnt"] / prof["mean_cnt"]
    # hot = anything an order of magnitude above the mean
    hot_degree = int(prof["mean_cnt"] * 10)

    def run(hd, auto_broadcast):
        # autoBroadcastJoinThreshold=-1 emulates the 100 TB regime:
        # node-grain labels exceed any broadcast limit, so the
        # neighbour join MUST shuffle (the regime the hot/cold split
        # exists for). Explicit F.broadcast hints — the split's tiny
        # hot-key/hot-label relations — still broadcast.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(auto_broadcast))
        try:
            best = None
            for _ in range(2):
                t0 = time.time()
                label_propagation(edges, nodes, "id", n_iters=3, hot_degree=hd).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            return best
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))

    # arm A — local/test regime: labels fit the broadcast threshold, the
    # neighbour join never shuffles; the split can only add overhead
    t_plain_bcast = run(None, 64 * 1024 * 1024)
    # arm B — 100 TB regime, AQE skew-join only (it stays ON everywhere)
    t_plain_shuffle = run(None, -1)
    # arm C — 100 TB regime + the explicit profiler-driven split
    t_split_shuffle = run(hot_degree, -1)
    # arm D — 100 TB regime + the IN-PLAN decision (hot_degree="auto"
    # profiles degrees and arms the split itself — r12 verdict item 6)
    t_auto_shuffle = run("auto", -1)
    print(
        json.dumps(
            {
                "n_nodes": n_nodes,
                "n_edges": edges.count(),
                "max_degree": prof["max_cnt"],
                "skew_factor": round(skew_factor, 1),
                "hot_degree_threshold": hot_degree,
                "lpa_broadcastable_labels_sec": round(t_plain_bcast, 2),
                "lpa_shuffle_aqe_only_sec": round(t_plain_shuffle, 2),
                "lpa_shuffle_skew_split_sec": round(t_split_shuffle, 2),
                "lpa_shuffle_auto_sec": round(t_auto_shuffle, 2),
                "split_speedup_in_shuffle_regime": (
                    round(t_plain_shuffle / t_split_shuffle, 2) if t_split_shuffle else None
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
