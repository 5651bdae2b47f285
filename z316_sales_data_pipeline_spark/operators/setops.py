"""Set-operation recipes (SURVEY §2.G) — the reconciliation algebra.

Reference: data_validation/gcs_to_bq-checker.py:37-60 does 10-way
set-differences over Python id sets; here each is a distinct-aware
DataFrame set op. At scale these are shuffle-on-key operations over the
key column ONLY — select the key before the op so nothing else moves.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def ids(df: DataFrame, key: str) -> DataFrame:
    return df.select(key).distinct()


def difference(a: DataFrame, b: DataFrame) -> DataFrame:
    """G1 — set difference (distinct semantics, like Python set ``-``)."""
    return a.exceptAll(b.distinct()).distinct()


def union_sets(*dfs: DataFrame) -> DataFrame:
    """G2 — distinct union (Python ``|``)."""
    return reduce(DataFrame.unionByName, dfs).distinct()


def intersection(a: DataFrame, b: DataFrame) -> DataFrame:
    """G3 — set intersection (Python ``&``)."""
    return a.intersect(b)


def symmetric_difference(a: DataFrame, b: DataFrame) -> DataFrame:
    """G4 — symmetric difference; empty ⇔ the two id sets are equal.

    Reference: api_to_gcs-checker.py:73-79 (pdv_ids != pesquisa_ids).
    """
    return a.exceptAll(b).unionByName(b.exceptAll(a)).distinct()


def union_pages(dfs: list[DataFrame]) -> DataFrame:
    """G5 — concat of paginated scans (pd.concat ≙ unionByName chain).

    Reference: contatos_to_bq/main.py:139-145.
    """
    return reduce(DataFrame.unionByName, dfs)
