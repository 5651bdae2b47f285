"""Window recipes (SURVEY §2.H, W1–W4).

The reference has no SQL windows; these are the Spark-native renderings
of its per-group Python semantics. All windows partition on the
business key, so each is exactly one hash-partition shuffle (reused by
any subsequent agg on the same key — plan-level partitioning reuse).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def group_total(df: DataFrame, key: str | list[str], value: Column | str, alias: str) -> DataFrame:
    """W1 — per-group total on every row (unbounded frame analytic sum).

    The building block for proportional allocation (F7,
    sales_to_bq/main.py:157-160): every item row needs its order total.
    """
    keys = [key] if isinstance(key, str) else key
    value = F.col(value) if isinstance(value, str) else value
    return df.withColumn(alias, F.sum(value).over(Window.partitionBy(*keys)))


def proportional_allocation(
    df: DataFrame,
    key: str | list[str],
    item_value: Column | str,
    total_amount: Column | str,
    alias: str = "allocated",
) -> DataFrame:
    """F7/W1 — allocate a group-level amount across rows by value share.

    alloc = total_amount * item_value / sum(item_value) over group.
    Conservation law: sum(alloc) per group == total_amount (tested).
    """
    keys = [key] if isinstance(key, str) else key
    item_value = F.col(item_value) if isinstance(item_value, str) else item_value
    total_amount = F.col(total_amount) if isinstance(total_amount, str) else total_amount
    share = F.try_divide(item_value, F.sum(item_value).over(Window.partitionBy(*keys)))
    return df.withColumn(alias, F.coalesce(total_amount * share, F.lit(0.0)))


def dedup_keep_rule(
    df: DataFrame,
    key: str | list[str],
    order_by: list[Column],
) -> DataFrame:
    """W2 — dedup with a deterministic keep-rule.

    Reference: api_to_gcs-checker.py:141-173 — among duplicate folders
    for one dados_id, keep the minimum real timestamp, preferring
    non-backfill (backfill rows carry a T000000 timestamp); delete the
    rest. Rendered as row_number over (key, order_by) + rn==1.
    """
    keys = [key] if isinstance(key, str) else key
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def pick_first(df: DataFrame, key: str | list[str], order_by: list[Column]) -> DataFrame:
    """W3 — first-match pick (reference takes ``pedidos[0]``)."""
    return dedup_keep_rule(df, key, order_by)


def top_k_per_group(df: DataFrame, key: str | list[str], order_by: list[Column], k: int) -> DataFrame:
    """Top-K per group — rank ≤ K. (Engine surface beyond the reference.)"""
    keys = [key] if isinstance(key, str) else key
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .withColumnRenamed("__rn", "rank_in_group")
    )


def min_by_group(df: DataFrame, key: str | list[str], pick: str, order_col: str) -> DataFrame:
    """W4 — min-by: the ``pick`` value at the minimum ``order_col``.

    Reference: api_to_gcs-checker.py:148-150 (min(folders, key=ts)).
    Plain hash aggregate (min_by) — cheaper than a window when only the
    winner is needed.
    """
    keys = [key] if isinstance(key, str) else key
    return df.groupBy(*keys).agg(
        F.min_by(pick, order_col).alias(pick), F.min(order_col).alias(order_col)
    )
