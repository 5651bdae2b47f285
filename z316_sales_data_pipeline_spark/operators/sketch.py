"""Count-min frequency sketching (north-star approximate ops).

The frequency-sketch sibling of the HLL distinct partials
(``hll_partition_rollup``): per-partition count-min partials are the
at-rest relation, merged at query time by elementwise sum (CMS merge =
counter addition), probed with min-over-rows. The hash family is the
engine's portable affine-over-rolling-hash family, so — unlike
library sketches — every counter and every estimate is bit-identical
across engines and run orders: the oracle value-checks the ESTIMATES
themselves, not just self-asserted error verdicts.

Guarantees (classic CMS): estimate >= true count always (counters only
ever add), and estimate <= true + (e/w)·N with probability 1−(1/2)^d.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_P = 2147483647  # 2^31 − 1, shared with the MinHash family


def _rolling_hash(c: Column) -> Column:
    """fold(chars, 0, (acc, ch) -> (acc*31 + codepoint) mod P) — the
    portable polynomial family (same recurrence as operators.dedup)."""
    return F.aggregate(
        F.split(c.cast("string"), ""),
        F.lit(0).cast("long"),
        lambda acc, ch: F.pmod(acc * F.lit(31) + F.ascii(ch), F.lit(_P)),
    )


def _affine(i: int) -> tuple[int, int]:
    return (2654435761 * (i + 1)) % _P, (40503 * i + 1) % _P


def _bucket_entries(h: Column, d: int, w: int) -> Column:
    """Array of (row, bucket) structs for the d hash rows."""
    entries = []
    for i in range(d):
        a, b = _affine(i)
        entries.append(
            F.struct(
                F.lit(i).alias("row"),
                (F.pmod(h * F.lit(a) + F.lit(b), F.lit(_P)) % F.lit(w)).alias("bucket"),
            )
        )
    return F.array(*entries)


def cms_table(
    df: DataFrame, key_col: str, part_col: Column, d: int = 4, w: int = 256
) -> DataFrame:
    """The at-rest CMS partial relation: (partition, row, bucket, c) —
    at most d·w counters per partition value, built in one codegen
    hash aggregate over the exploded (row, bucket) pairs. At 100 TB
    this is the tiny sketch table you store next to each ingest
    partition; raw keys never need rescanning for frequency queries.
    """
    h = _rolling_hash(F.col(key_col))
    return (
        df.select(part_col.alias("part"), F.explode(_bucket_entries(h, d, w)).alias("rb"))
        .groupBy("part", F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_merge(sketch: DataFrame) -> DataFrame:
    """Merge partials across partitions: elementwise counter sum."""
    return sketch.groupBy("row", "bucket").agg(F.sum("c").alias("c"))


def cms_probe(
    merged: DataFrame, keys: DataFrame, key_col: str, d: int = 4, w: int = 256
) -> DataFrame:
    """Point-estimate each probe key: min over the d hash rows of its
    counter. Probe keys are a small relation (heavy-hitter candidates,
    an audit set) — the join is broadcastable; the merged sketch is
    O(d·w) regardless of stream size."""
    h = _rolling_hash(F.col(key_col))
    probe = keys.select(
        F.col(key_col), F.explode(_bucket_entries(h, d, w)).alias("rb")
    ).select(key_col, F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    return (
        probe.join(merged, ["row", "bucket"])
        .groupBy(key_col)
        .agg(F.min("c").alias("cms_estimate"))
    )


def histogram_table(
    df: DataFrame,
    value_col: str,
    part_col: Column,
    lo: float,
    hi: float,
    n_buckets: int = 64,
) -> DataFrame:
    """The at-rest equal-width histogram partial: (partition, bucket,
    c) over a FIXED [lo, hi) range — the mergeable quantile sibling of
    the CMS/HLL partials (merge = counter addition, exactly like CMS).
    Values outside the range clamp to the edge buckets, so the sketch
    never drops NUMERIC mass. NULL policy: NULLs are EXCLUDED before
    bucketing (quantiles are statements about present values) — without
    the explicit filter, floor((NULL-lo)/width) is NULL and
    greatest/least skip NULLs, so every NULL would silently land in
    bucket 0 and skew the low quantiles. One codegen hash aggregate; at
    most n_buckets rows per partition value.

    Fixed range instead of data-dependent min/max: partials built on
    different days stay mergeable without a re-bucketing pass — the
    property a 100 TB rolling-window quantile needs.
    """
    width = (hi - lo) / n_buckets
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.greatest(F.lit(0), F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))),
    ).cast("int")
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(part_col.alias("part"), bucket.alias("bucket"))
        .groupBy("part", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def histogram_quantiles(
    hist: DataFrame,
    qs: list[float],
    lo: float,
    hi: float,
    n_buckets: int = 64,
) -> DataFrame:
    """Quantile estimates from merged histogram partials: merge by
    bucket-sum, walk the cumulative distribution, report each
    requested quantile as the LEFT EDGE of the first bucket whose
    cumulative count reaches q·N (deterministic, no interpolation —
    estimates are bit-portable and error-bounded by one bucket width).

    The whole walk runs over ≤ n_buckets rows — a window over the
    merged sketch, never over data.
    """
    if not qs:
        raise ValueError("histogram_quantiles: qs must name at least one quantile")
    width = (hi - lo) / n_buckets
    from pyspark.sql import Window

    merged = hist.groupBy("bucket").agg(F.sum("c").alias("c"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = merged.withColumn("cum", F.sum("c").over(w)).crossJoin(
        F.broadcast(merged.agg(F.sum("c").alias("n")))
    )
    out = None
    for q in qs:
        hit = (
            cum.filter(F.col("cum") >= F.col("n") * F.lit(q))
            .agg(F.min("bucket").alias("bucket"))
            .select(
                F.lit(q).alias("q"),
                F.round(F.lit(lo) + F.col("bucket") * F.lit(width), 6).alias("estimate"),
            )
        )
        out = hit if out is None else out.unionByName(hit)
    return out


def zone_map_prune_stats(
    df: DataFrame,
    value_col: str,
    layouts: dict[str, Column],
    lo,
    hi,
) -> DataFrame:
    """Zone-map (per-file min/max) data-skipping audit: for each
    candidate physical LAYOUT (a deterministic expression assigning
    every row to a file/block id), build the block-level min/max zone
    maps for ``value_col`` and measure what fraction of blocks a
    ``[lo, hi]`` range predicate could skip — the number that justifies
    clustering / z-ordering a 100 TB table (a block overlaps the range
    iff ``max >= lo AND min <= hi``; everything else is never read).

    This is the measurement behind the engine's sort-on-write sinks
    (sinks.write_clustered): the same scan with a date-clustered layout
    skips ~all non-overlapping blocks while a hash/ingest-order layout
    skips ~none. One narrow pass per layout (the block id is a pure
    row expression), one hash aggregate to the block grain, then a
    3-row summary — the audit never shuffles the fact more than the
    zone-map build itself.
    """
    outs = []
    for name, block in layouts.items():
        zones = (
            df.select(block.alias("block"), F.col(value_col).alias("v"))
            .groupBy("block")
            .agg(F.min("v").alias("zmin"), F.max("v").alias("zmax"))
        )
        outs.append(
            zones.agg(
                F.lit(name).alias("layout"),
                F.count(F.lit(1)).alias("n_blocks"),
                F.sum(
                    ((F.col("zmax") >= F.lit(lo)) & (F.col("zmin") <= F.lit(hi))).cast("long")
                ).alias("n_read"),
                F.sum(
                    ((F.col("zmax") < F.lit(lo)) | (F.col("zmin") > F.lit(hi))).cast("long")
                ).alias("n_skipped"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.select(
        "layout",
        "n_blocks",
        "n_read",
        "n_skipped",
        F.round(F.col("n_skipped") / F.col("n_blocks"), 6).alias("skip_fraction"),
    )
