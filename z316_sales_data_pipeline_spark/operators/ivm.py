"""Incremental view maintenance + snapshot versioning diffs.

The reference rebuilds its serving tables with truncate-and-reload
(B4) and re-runs full queries to verify (E6); at 100 TB both become
O(history) operations. These operators are the O(delta) discipline
that replaces them:

- ``delta_join_maintain``: a join materialization absorbs a fact
  INSERT batch by joining only the delta against the dimension and
  appending — the classic delta-rule (ΔQ = ΔF ⋈ D for insert-only
  facts over a stable dimension), never re-joining the base.
- ``snapshot_diff``: the row-level audit between two table versions
  (what changed between yesterday's snapshot and today's) — the
  verification query for ANY maintenance path, computed as one full
  outer join on the business key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def delta_join_maintain(
    mv: DataFrame,
    delta: DataFrame,
    dim: DataFrame,
    key: str,
) -> DataFrame:
    """Absorb an insert-only fact ``delta`` into the materialized join
    ``mv`` (= base_fact ⋈ dim): join ONLY the delta against the
    dimension and union — O(|delta|), never O(|base|). Exact under the
    delta rule when the dimension is stable across the batch and the
    fact is insert-only (the streaming-epoch contract of the snapshot
    sinks); dimension updates or fact deletes need the key-scoped
    repair path instead (same trade as scd2_fold_or_repair).

    Plan shape: the base MV passes through untouched (no scan beyond
    the union read); the delta-side join broadcasts the dimension when
    small or shuffles O(|delta|) rows otherwise — AQE decides from
    real sizes.
    """
    return mv.unionByName(delta.join(dim, key))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff between two versions of a keyed table: one row
    per key whose presence or compared columns changed, tagged
    ``added`` / ``removed`` / ``changed``, with the old and new value
    structs flattened to ``<col>_old`` / ``<col>_new``.

    One full outer join on the business key — a single co-partitioned
    shuffle pair at scale (bucket both versions on the key and even
    that disappears; see sinks.write_bucketed). Unchanged keys are
    filtered BEFORE the projection, so the output is change-grain,
    never table-grain. NULL-safe comparison (``eqNullSafe``), so a
    NULL→value transition is a change, not a silent match.
    """
    o = old.select(key, *compare_cols).alias("o")
    n = new.select(key, *compare_cols).alias("n")
    joined = o.join(n, F.col(f"o.{key}").eqNullSafe(F.col(f"n.{key}")), "full_outer")
    o_key, n_key = F.col(f"o.{key}"), F.col(f"n.{key}")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    change = (
        F.when(o_key.isNull(), F.lit("added"))
        .when(n_key.isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
    )
    out_cols = [F.coalesce(o_key, n_key).alias(key), change.alias("change")]
    for c in compare_cols:
        out_cols.append(F.col(f"o.{c}").alias(f"{c}_old"))
        out_cols.append(F.col(f"n.{c}").alias(f"{c}_new"))
    return joined.filter(o_key.isNull() | n_key.isNull() | ~same).select(*out_cols)


def retractable_agg_maintain(
    base_agg: DataFrame,
    snapshot: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str,
    version_col: str,
    group_col: str,
    measures: dict[str, "F.Column"],
) -> DataFrame:
    """Maintain a groupBy aggregate MV under a CDC feed with UPSERTS
    AND DELETES — the retractable half of incremental view
    maintenance that :func:`delta_join_maintain`'s insert-only delta
    rule cannot express: an upsert retracts the key's OLD row from
    its group before adding the new one, a delete only retracts.

    new_agg = base_agg ⊕ agg(+winning upserts) ⊖ agg(snapshot rows of
    every touched key). All three terms are O(changes) except the
    snapshot semi-join, which moves only the touched keys' rows; the
    base MV is never re-aggregated. Counts and sums are signed exact
    integers, so the merge is ONE full-outer join on the group key
    and the result equals re-aggregating the applied snapshot
    bit-for-bit (the oracle states exactly that). Groups whose count
    reaches zero disappear, matching the recompute grain.

    ``base_agg`` must have columns (group_col, n, *measures-aliases)
    as produced by grouping the snapshot with the same ``measures``.
    Winner-per-key semantics are shared with ``sinks.cdc_apply`` via
    ``sinks.cdc_winners`` (version desc, delete-beats-upsert,
    lexicographic payload tiebreak).
    """
    from ..sinks import cdc_winners

    keys = [key]
    payload_cols = [c for c in snapshot.columns if c != key]
    winners = cdc_winners(changes, keys, payload_cols, op_col, version_col)
    inserted = winners.filter(F.col("__w.d") == 0).select(
        F.col(key), *[F.col(f"__w.p.{c}").alias(c) for c in payload_cols]
    )
    # Touched-key semi-join with NO broadcast hint: a steady-state CDC
    # batch's key set is tiny and AQE converts the semi-join to a
    # broadcast on its own from real sizes, but a backfill replay
    # (reference backfill/api_to_gcs-backfill.py:242-259) ships a
    # history-sized batch where "touched keys" == the whole table and a
    # forced hint would OOM the driver — the same anti-pattern removed
    # from bfs_hops/k_core in graph.py.
    removed = snapshot.join(winners.select(key), key, "left_semi")

    def signed(d: DataFrame, sign: int) -> DataFrame:
        return d.select(
            F.col(group_col),
            F.lit(sign).cast("long").alias("__dn"),
            *[(F.lit(sign) * expr).cast("long").alias(f"__d_{a}") for a, expr in measures.items()],
        )

    delta = (
        signed(inserted, 1)
        .unionByName(signed(removed, -1))
        .groupBy(group_col)
        .agg(
            F.sum("__dn").alias("__dn"),
            *[F.sum(f"__d_{a}").alias(f"__d_{a}") for a in measures],
        )
    )
    merged = base_agg.join(delta, group_col, "full_outer").select(
        F.col(group_col),
        (F.coalesce(F.col("n"), F.lit(0)) + F.coalesce(F.col("__dn"), F.lit(0))).alias("n"),
        *[
            (
                F.coalesce(F.col(a), F.lit(0)) + F.coalesce(F.col(f"__d_{a}"), F.lit(0))
            ).alias(a)
            for a in measures
        ],
    )
    return merged.filter(F.col("n") > 0)
