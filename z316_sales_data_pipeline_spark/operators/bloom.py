"""Explicit distributed bloom filter — the semi-join prune at scale.

Spark's own runtime bloom injection (`spark.sql.optimizer.runtime.
bloomFilter.*`) only fires for inner/semi equi-joins above a 10 GB
application-side scan, and never for the LEFT-outer hit-marking shape
contamination checks use. This is the same idea as an explicit,
composable relation: the filter is a DataFrame of (word, mask) longs —
a bitset of ``m_bits`` bits built with one tiny aggregate over the
small side — broadcast and bit-tested on the big side BEFORE its
expensive distinct/shuffle.

Guarantees: no false negatives (every hashed value sets exactly the
bit later probed), so pruning with it never changes join results when
a downstream exact join drops the false positives. FP rate ≈ n/m_bits
with the single probe hash (a prune wants cheap, not perfect).

Everything is built-in column algebra (xxhash64, pmod, bit_or, shift)
— whole-stage codegen on both sides, zero driver-side data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_bloom(df: DataFrame, col: str | Column, m_bits: int = 1 << 20) -> DataFrame:
    """Bitset relation (word long, mask long) over ``df[col]``:
    ⌈m_bits/64⌉ rows max — broadcastable at any source cardinality."""
    c = F.col(col) if isinstance(col, str) else col
    p = F.pmod(F.xxhash64(c), F.lit(m_bits))
    return (
        df.select(p.alias("__p"))
        .select(
            F.shiftrightunsigned("__p", 6).alias("word"),
            F.expr("shiftleft(1L, cast(pmod(__p, 64) AS INT))").alias("__bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("__bit").alias("mask"))
    )


def bloom_prune(df: DataFrame, col: str | Column, bloom: DataFrame, m_bits: int = 1 << 20) -> DataFrame:
    """Keep only rows whose ``col`` MIGHT be in the set ``bloom`` was
    built from (no false negatives). Broadcast join on the bitset word
    + one bit test — runs below any later shuffle, so the expensive
    aggregation/join downstream sees candidates only."""
    c = F.col(col) if isinstance(col, str) else col
    p = F.pmod(F.xxhash64(c), F.lit(m_bits))
    probed = df.withColumn("__w", F.shiftrightunsigned(p, 6)).withColumn(
        "__b", F.pmod(p, F.lit(64)).cast("int")
    )
    return (
        probed.join(F.broadcast(bloom), F.col("__w") == F.col("word"), "left")
        .filter(
            F.expr("(shiftrightunsigned(coalesce(mask, 0L), __b) & 1L) = 1L")
        )
        .drop("word", "mask", "__w", "__b")
    )
