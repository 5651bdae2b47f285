"""Join recipes (SURVEY §2.D).

The reference performs all joins imperatively (linear ``next()`` probes,
per-item REST lookups). Spark-side every one is a declarative equi-join;
the scale discipline is explicit here:

- dimension lookups broadcast (``F.broadcast``) — zero shuffle;
- fact-fact joins shuffle on the join key and rely on AQE for skew;
- existence semantics use ``left_semi`` / ``left_anti`` so no payload
  columns cross the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def lookup_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Column | str | list[str],
    how: str = "inner",
    broadcast: bool = True,
) -> DataFrame:
    """D1/D2 — enrichment lookup against a dimension.

    ``how='inner'`` reproduces the reference's silent drop-on-miss
    (sales_to_bq/main.py:168-171,221: item skipped when its product is
    missing); ``how='left'`` reproduces tolerated-failure enrichments
    (NFC-e chain, api_to_gcs/main.py:220-231). Broadcasting the
    dimension replaces the reference's O(items × products) linear probe
    with a hash lookup and removes the shuffle entirely.
    """
    return fact.join(F.broadcast(dim) if broadcast else dim, on, how)


def incremental_guard(todo: DataFrame, done: DataFrame, key: str | list[str]) -> DataFrame:
    """D4 — the canonical incremental-load anti-join.

    Reference: backfill/api_to_gcs-backfill.py:120-136,217-240 — skip a
    pedido whose ``dados_id`` was already processed. ``left_anti`` keeps
    only the key columns of ``done`` in flight.
    """
    keys = [key] if isinstance(key, str) else key
    return todo.join(done.select(*keys).distinct(), keys, "left_anti")


def existence_check(df: DataFrame, other: DataFrame, key: str | list[str], exists: bool = True) -> DataFrame:
    """D6 — referential-integrity semi/anti join.

    Reference: api_to_gcs-checker.py:34-57 — every ``itens[].idProduto``
    must have a produto file; violations are the anti-join result.
    """
    keys = [key] if isinstance(key, str) else key
    how = "left_semi" if exists else "left_anti"
    return df.join(other.select(*keys).distinct(), keys, how)


def regroup_pivot(
    df: DataFrame,
    group_col: str,
    type_col: str,
    value_col: str,
    scalar_types: list[str],
    list_types: list[str] | None = None,
) -> DataFrame:
    """D5 — folder-regroup co-group as a pivot-style conditional agg.

    Reference: backfill/gcs_to_pupsub.py:64-92 — group blobs by folder,
    pick the single pdv/pesquisa part and collect all produto parts into
    one composite message. One hash-aggregate shuffle on the group key;
    map-side partial aggregation keeps it scale-safe.
    """
    aggs: list[Column] = []
    for t in scalar_types:
        aggs.append(
            F.max(F.when(F.col(type_col) == t, F.col(value_col))).alias(t)
        )
    for t in list_types or []:
        aggs.append(
            F.sort_array(
                F.collect_list(F.when(F.col(type_col) == t, F.col(value_col)))
            ).alias(f"{t}_list")
        )
    return df.groupBy(group_col).agg(*aggs)
