"""Continuous aggregate ("hypertable rollup") over the events stream.

The reference's event tables are queried at bucket grain far more often
than at row grain (SURVEY §2 E-family rollups; the reference recomputes
them per run — e.g. the per-folder recount in
/root/reference/data_validation/api_to_gcs-checker.py). At 100 TB an
events table cannot be rescanned per dashboard query; the lakehouse
answer is TimescaleDB-style continuous aggregates: a MAINTAINED rollup
table of MERGEABLE PARTIALS at (time bucket × dimension) grain that
each ingest micro-batch advances by O(batch), and that serving queries
merge with an O(buckets) aggregate — never touching raw events.

This module expresses that Spark-first on the append-segment snapshot
sink (sinks.append_snapshot / read_appended):

- each segment ``v=N`` holds the PARTIAL aggregates (count, integer-
  cent sum) of ONLY that batch's events — counts and integer sums are
  commutative monoids, so partials merge to exactly the direct answer
  regardless of how events were split across segments (late/out-of-
  order rows simply land their bucket's delta in a later segment);
- ``serve()`` is the merge: one partitioned scan of the segment union
  (the ``v=N`` layout is hive partitioning — no shuffle to read),
  then a hash aggregate over O(buckets × segments) rows, map-side
  combinable. Raw events are never re-read.

Scale shape: the rollup table is ~|buckets × event_types × segments|
rows — bounded by compaction (sinks.compact_appended folds segments
back to one) — versus the unbounded event log. AVG/VAR extend the same
way (sum+count / sum+sum²+count partials); exact medians do not — at
lake scale a mergeable sketch (operators/sketch.histogram_table)
is the continuous-aggregate form for quantiles.

Value sums are integer cents (``round(value*100)`` — the 2dp source
scale is exact), so segment merge order cannot perturb a float sum and
the served table is bit-identical to the direct aggregate — pinned by
the oracle twin and by the streaming maintenance test
(tests/test_streaming.py), which drives the same loop per micro-batch
via foreachBatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from . import pair_graph


def event_partials(events: DataFrame) -> DataFrame:
    """Partial (mergeable) day×type aggregates of one event slice:
    ``(bucket_day, event_type, n_partial, cents_partial)``. Counts and
    integer-cent sums are the monoid state; merging = summing."""
    return events.groupBy(
        F.date_trunc("day", F.col("ts")).alias("bucket_day"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_partial"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents_partial"),
    )


def merge_partials(partials: DataFrame) -> DataFrame:
    """Merge segment partials to the served rollup — the only work a
    serving query does (O(buckets × segments) rows, map-side
    combinable hash agg; raw events are never re-read)."""
    return partials.groupBy("bucket_day", "event_type").agg(
        F.sum("n_partial").alias("n_events"),
        F.sum("cents_partial").alias("value_cents"),
    )


def continuous_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintained rollup table: v=1 = partials of the already-
    ingested base, v=2 = partials of ONLY the arriving slice
    (event_id % 9 == 2 — the same arriving-slice convention as the
    maintained MinHash/SimHash/span/IVF relations), installed with the
    tmp-dir + atomic-rename + ``_LATEST >= 2`` discipline and served
    through read_appended. Falls back to a direct build if the cache
    directory is unusable."""
    recent = F.col("event_id") % 9 == 2

    def partials_of(pred) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        return event_partials(ev.filter(pred))

    try:
        return pair_graph._maintained_two_segments(
            spark,
            sf_dir,
            "ht_rollup",
            "day|cents|v2-seg",
            lambda: partials_of(~recent),
            lambda v1: partials_of(recent),
            src_table="events",
        )
    except OSError:
        return event_partials(load_table(spark, sf_dir, "events"))


def serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The continuous-aggregate serving query: merge the maintained
    segment partials. Equals the direct aggregate over raw events
    bit-for-bit (integer partials; oracle-checked)."""
    return merge_partials(
        continuous_rollup(spark, sf_dir).select(
            "bucket_day", "event_type", "n_partial", "cents_partial"
        )
    )


def value_histogram_partials(
    events: DataFrame, lo: float = 0.0, hi: float = 500.0, n_buckets: int = 64
) -> DataFrame:
    """Per-day histogram-sketch partials over ``value`` — the
    QUANTILE extension of the continuous aggregate: exact medians
    don't merge, but fixed-range bucket counts do (counter addition,
    like the count/sum partials of :func:`event_partials`). One hash
    aggregate; at most n_buckets rows per day per segment."""
    from ..operators import sketch

    return sketch.histogram_table(
        events, "value", F.date_trunc("day", F.col("ts")), lo, hi, n_buckets
    ).withColumnRenamed("part", "bucket_day")


def quantiles_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintained per-day histogram table (same v=1 base + v=2
    arriving-slice convention and atomic install as
    :func:`continuous_rollup`)."""
    recent = F.col("event_id") % 9 == 2

    def partials_of(pred) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        return value_histogram_partials(ev.filter(pred))

    try:
        return pair_graph._maintained_two_segments(
            spark,
            sf_dir,
            "ht_quant",
            "day|hist0-500-64|v2-seg",
            lambda: partials_of(~recent),
            lambda v1: partials_of(recent),
            src_table="events",
        )
    except OSError:
        return value_histogram_partials(load_table(spark, sf_dir, "events"))


def user_sketch_partials(events: DataFrame) -> DataFrame:
    """Per-(day, event_type) HLL sketch partials of distinct users —
    the DISTINCT extension of the continuous aggregate. Exact distinct
    counts don't merge across segments (|A ∪ B| ≠ |A| + |B|), but HLL
    REGISTERS do (register-wise max = set union), so the maintained
    table stores one small binary sketch per bucket per segment and
    serving unions them — the third mergeable-partial family beside
    count/sum (:func:`event_partials`) and histogram counters
    (:func:`value_histogram_partials`). Raw user ids are never
    re-scanned after ingest."""
    return events.groupBy(
        F.date_trunc("day", F.col("ts")).alias("bucket_day"), "event_type"
    ).agg(
        F.hll_sketch_agg("user_id").alias("sk_partial"),
        F.count(F.lit(1)).alias("n_partial"),
    )


def distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintained per-day distinct-user sketch table (same v=1
    base + v=2 arriving-slice convention and atomic install as
    :func:`continuous_rollup`); sketches are BINARY cells riding the
    same append-segment parquet lifecycle."""
    recent = F.col("event_id") % 9 == 2

    def partials_of(pred) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        return user_sketch_partials(ev.filter(pred))

    try:
        return pair_graph._maintained_two_segments(
            spark,
            sf_dir,
            "ht_distinct",
            "day|hll-user|v2-seg",
            lambda: partials_of(~recent),
            lambda v1: partials_of(recent),
            src_table="events",
        )
    except OSError:
        return user_sketch_partials(load_table(spark, sf_dir, "events"))


def serve_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type served from the MAINTAINED sketch
    partials: one HLL union-merge over O(days × types × segments)
    binary cells — never the raw events. Returns (event_type, n_days,
    n_events, users_est)."""
    t = distinct_rollup(spark, sf_dir)
    return t.groupBy("event_type").agg(
        F.count_distinct("bucket_day").alias("n_days"),
        F.sum("n_partial").alias("n_events"),
        F.hll_sketch_estimate(F.hll_union_agg("sk_partial")).alias("users_est"),
    )


def serve_quantiles(
    spark: SparkSession,
    sf_dir: str,
    qs: tuple[float, ...] = (0.5, 0.9),
    lo: float = 0.0,
    hi: float = 500.0,
    n_buckets: int = 64,
) -> DataFrame:
    """Per-day quantile estimates from the maintained histogram
    partials: merge bucket counts, walk each day's cumulative
    distribution (a PARTITIONED window over <= n_buckets rows per
    day), report each quantile as the left edge of the first bucket
    whose cumulative count reaches q*N — deterministic, bit-portable,
    error-bounded by one bucket width. Raw events are never re-read;
    this is what 'continuous aggregate' means for a non-mergeable
    statistic."""
    from pyspark.sql import Window

    width = (hi - lo) / n_buckets
    t = quantiles_rollup(spark, sf_dir).select("bucket_day", "bucket", "c")
    merged = t.groupBy("bucket_day", "bucket").agg(F.sum("c").alias("c"))
    wc = (
        Window.partitionBy("bucket_day")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("bucket_day")
    cum = merged.withColumn("cum", F.sum("c").over(wc)).withColumn("n", F.sum("c").over(wn))
    aggs = [F.max("n").cast("long").alias("n")]
    for q in qs:
        name = f"p{int(q * 100)}_est"
        edge = F.col("bucket") * F.lit(width) + F.lit(lo)
        aggs.append(F.min(F.when(F.col("cum") >= F.lit(q) * F.col("n"), edge)).alias(name))
    return cum.groupBy("bucket_day").agg(*aggs)
