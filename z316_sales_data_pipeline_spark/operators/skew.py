"""Skew mitigation recipes (100 TB posture).

AQE's skew-join splitting (spark.sql.adaptive.skewJoin) handles most
runtime skew; these are the explicit recipes for when the skew is known
ahead of time — a handful of hot keys carrying a large share of rows
(boilerplate documents, mega-customers, null-ish sentinel keys).

- ``salted_aggregate`` — two-phase aggregation: spray each hot key over
  ``n_salts`` sub-keys, partially aggregate, then combine. The shuffle
  moves n_salts rows per hot key instead of every row of it.
- ``salted_join`` — replicate the small side once per salt so a skewed
  large side joins against co-located replicas.

Both are deterministic (salt = pmod(hash of a row-unique column)) so
results are reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


_COMBINERS = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_aggregate(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[str, Column]],
    salt_col: str,
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase (salted) aggregation equivalent to
    ``df.groupBy(group_cols).agg(...)`` for algebraic aggregates.

    Phase 1 groups on (group_cols, salt) — the hot key's rows split
    across n_salts reducers; phase 2 combines the n_salts partials.
    ``aggs`` maps output name -> (kind, input expression) with kind in
    {sum, count, min, max}; count partials combine by summing.

    Spark's map-side partial aggregation already does this for a plain
    groupBy when the hot key is spread over many input partitions; the
    explicit salt matters when the data arrives pre-partitioned by the
    hot key (e.g. a bucketed table) and the map-side combine can't
    spread it.
    """
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts)))
    phase1 = salted.groupBy(*group_cols, "__salt").agg(
        *[
            getattr(F, kind)(expr).alias(f"__p_{name}")
            for name, (kind, expr) in aggs.items()
        ]
    )
    return phase1.groupBy(*group_cols).agg(
        *[
            _COMBINERS[kind](F.col(f"__p_{name}")).alias(name)
            for name, (kind, expr) in aggs.items()
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_source: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to a skewed key distribution on ``big``.

    The big side gets a deterministic salt from ``salt_source`` (any
    row-unique column); the small side is replicated n_salts times via
    an exploded literal range. The join key becomes (on, salt), so one
    hot key's rows land on n_salts reducers instead of one.

    Prefer ``F.broadcast(small)`` when the small side fits in memory —
    salting is for the mid-size dimension that neither broadcasts nor
    tolerates a single hot reducer.

    Only join types where an unmatched SMALL-side row is never emitted
    are allowed: under 'right'/'full' the n_salts replicas of an
    unmatched small row would each surface as a separate output row.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is not supported — the replicated small side "
            f"would emit unmatched rows n_salts times; use one of {sorted(allowed)}"
        )
    salted_big = big.withColumn("__salt", F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salts)))
    replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>"))
    )
    return salted_big.join(replicated, [on, "__salt"], how).drop("__salt")
