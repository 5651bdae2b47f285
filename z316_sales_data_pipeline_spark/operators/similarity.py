"""Similarity search over embedding columns (north-star ops).

- ``brute_force_top_k`` — exact cosine top-k: one codegen'd scan +
  TakeOrdered (no full sort, no shuffle of payloads). The correctness
  baseline.
- ``lsh_top_k`` — random-hyperplane LSH bucketing: probe only the
  query's bucket(s). The 100 TB path: the scan prunes to matching
  buckets (partition the table by ``bucket`` at rest and Catalyst
  turns it into partition pruning).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vector import cosine, dot, literal_vector


def brute_force_top_k(
    df: DataFrame, vec_col: str, id_col: str, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Exact top-k by cosine to a constant query vector.

    ``orderBy(...).limit(k)`` compiles to TakeOrderedAndProject —
    per-partition heap + driver merge, no global sort shuffle.
    Deterministic tie-break on id.
    """
    q = literal_vector(query_vec)
    return (
        df.select(F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (LCG — no numpy
    dependency at plan-build time, reproducible across engines)."""
    state = seed
    planes = []
    for _ in range(n_planes):
        v = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            # map to (-1, 1)
            v.append((state / float(1 << 64)) * 2.0 - 1.0)
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / n for x in v])
    return planes


def hyperplane_bucket(vec_col: Column | str, dim: int, n_planes: int = 8, seed: int = 42) -> Column:
    """Sign-of-dot-product LSH bucket id (0 .. 2^n_planes - 1)."""
    col = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    planes = _hyperplanes(dim, n_planes, seed)
    acc = F.lit(0)
    for i, p in enumerate(planes):
        bit = F.when(dot(col, literal_vector(p)) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        acc = acc + bit
    return acc


def lsh_top_k(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
    dim: int | None = None,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: restrict the exact scan to the query's bucket.

    Recall < 1 by construction; at rest, write the table partitioned by
    ``bucket`` so this becomes a partition-pruned scan of ~1/2^n_planes
    of the data.
    """
    dim = dim or len(query_vec)
    bucketed = df.withColumn("bucket", hyperplane_bucket(vec_col, dim, n_planes, seed))
    planes = _hyperplanes(dim, n_planes, seed)
    q_bucket = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(query_vec, p)) >= 0:
            q_bucket |= 1 << i
    return brute_force_top_k(bucketed.filter(F.col("bucket") == q_bucket), vec_col, id_col, query_vec, k)
