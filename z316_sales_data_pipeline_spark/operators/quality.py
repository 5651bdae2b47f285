"""Declarative data-quality constraint checks (SURVEY §2.C/G lineage).

The reference's data_validation suite (gcs_to_bq-checker.py,
api_to_gcs-checker.py) runs imperative per-check queries; here every
table-level contract — key uniqueness, non-null columns, value ranges —
reduces to ONE aggregate pass over the table plus one anti-join per
foreign key, each emitting violation COUNTS into a single summary row.
Constant-size output at any scale; a scheduler alerts on any non-zero
cell instead of diffing row sets.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def constraint_summary(
    df: DataFrame,
    key_cols: list[str],
    not_null_cols: list[str] = (),
    nonneg_cols: list[str] = (),
) -> DataFrame:
    """One-row violation summary: duplicate keys, null keys, nulls,
    negatives.

    dup_keys counts surplus rows beyond one per key (0 = key is
    unique) over the rows whose key is fully non-null; rows with any
    NULL key column are a separate violation class (null_key_rows) —
    countDistinct drops null tuples, so folding them into dup_keys
    would conflate the two. All checks share a single scan/aggregate.
    """
    any_key_null = F.lit(False)
    for c in key_cols:
        any_key_null = any_key_null | F.col(c).isNull()
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(F.sum(any_key_null.cast("long")), F.lit(0)).alias("null_key_rows"),
        (
            F.coalesce(F.sum((~any_key_null).cast("long")), F.lit(0))
            - F.countDistinct(*[F.col(c) for c in key_cols])
        ).alias("dup_keys"),
    ]
    for c in not_null_cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}"))
    for c in nonneg_cols:
        aggs.append(
            F.sum(F.coalesce((F.col(c) < 0).cast("long"), F.lit(0))).alias(f"neg_{c}")
        )
    return df.agg(*aggs)


def orphan_count(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str, alias: str
) -> DataFrame:
    """One-row count of child rows whose key has no parent (RI
    violation set size) — a key-only anti join."""
    orphans = child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(), child_key, "left_anti"
    )
    return orphans.agg(F.count(F.lit(1)).alias(alias))


BENFORD_EXPECTED = {d: math.log10(1 + 1 / d) for d in range(1, 10)}


def benford_profile(df: DataFrame, amount_cents: Column) -> DataFrame:
    """Benford first-digit audit over a money column — the classic
    fabricated-numbers / data-quality screen: observed share of each
    leading significant digit vs the Benford expectation
    log10(1 + 1/d), with the absolute deviation.

    The leading digit is taken from the DECIMAL RENDERING of the exact
    integer cents (first character of the digit string), never from
    float log10 — a power-of-ten boundary value can round log10 to
    either side of an integer per libm, while the string route is
    bit-exact on every engine. Expected shares are baked in as rounded
    literals on both sides. One hash aggregate to a 9-row profile.
    """
    digit = F.substring(amount_cents.cast("long").cast("string"), 1, 1).cast("int")
    counts = df.select(digit.alias("digit")).filter(F.col("digit") >= 1).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    total = counts.agg(F.sum("n").alias("total"))
    expected = F.create_map(
        *[x for d, p in sorted(BENFORD_EXPECTED.items()) for x in (F.lit(d), F.lit(round(p, 6)))]
    )
    share = F.col("n") / F.col("total")
    exp = expected[F.col("digit")]
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            F.round(share, 6).alias("share"),
            exp.alias("expected"),
            F.round(F.abs(share - exp), 6).alias("abs_dev"),
        )
    )


def near_duplicate_payments(
    orders: DataFrame,
    account_col: str,
    id_col: str,
    date_col: str,
    amount_cents: Column,
    max_days_apart: int = 3,
) -> DataFrame:
    """Duplicate-payment screen (the classic AP fraud/DQ audit): pairs
    of DISTINCT orders on the same account with the IDENTICAL amount
    within ``max_days_apart`` days — double-submits, double-captures
    and replayed webhooks all land here.

    The self-join is EQUI on (account, exact integer cents), so Spark
    plans a hash join whose per-key group is "orders on one account at
    one amount" — tiny everywhere real; the date-window predicate is a
    residual filter on the matched pairs, never a range join. The
    (a < b) id guard halves the output and removes self-pairs. At lake
    scale both sides shuffle once on the same compound key.
    """
    base = orders.select(
        F.col(account_col).alias("acct"),
        F.col(id_col).alias("oid"),
        F.col(date_col).alias("d"),
        amount_cents.cast("long").alias("cents"),
    )
    a = base.select("acct", "cents", F.col("oid").alias("id_a"), F.col("d").alias("d_a"))
    b = base.select("acct", "cents", F.col("oid").alias("id_b"), F.col("d").alias("d_b"))
    return (
        a.join(b, ["acct", "cents"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.datediff(F.col("d_b"), F.col("d_a"))) <= max_days_apart)
        )
        .select(
            "acct",
            "id_a",
            "id_b",
            "cents",
            F.abs(F.datediff(F.col("d_b"), F.col("d_a"))).alias("days_apart"),
        )
    )


def chi_square_cells(
    df: DataFrame,
    row_col: str,
    col_col: str,
) -> DataFrame:
    """Cell-grain chi-square independence audit for two categoricals:
    observed count, expected count (row_total · col_total / N) and the
    (o−e)²/e contribution per cell — the drill-down a data-quality
    dashboard actually shows (the global χ² is the sum the reader can
    take; emitting cells keeps every float a SINGLE expression over
    exact integers, so there is no cross-engine accumulation order to
    defend).

    One contingency hash aggregate (|rows|×|cols| cells), the two
    marginals reduced FROM the cells (never a second fact scan) and
    broadcast back.
    """
    cells = df.groupBy(row_col, col_col).agg(F.count(F.lit(1)).alias("observed"))
    row_tot = cells.groupBy(row_col).agg(F.sum("observed").alias("__rt"))
    col_tot = cells.groupBy(col_col).agg(F.sum("observed").alias("__ct"))
    n_tot = cells.agg(F.sum("observed").alias("__n"))
    e = F.col("__rt") * F.col("__ct") / F.col("__n")
    return (
        cells.join(F.broadcast(row_tot), row_col)
        .join(F.broadcast(col_tot), col_col)
        .crossJoin(F.broadcast(n_tot))
        .select(
            row_col,
            col_col,
            "observed",
            F.round(e, 6).alias("expected"),
            F.round(
                (F.col("observed") - e) * (F.col("observed") - e) / e, 6
            ).alias("chi2_contrib"),
        )
    )


def psi_drift(
    old: DataFrame,
    new: DataFrame,
    value_cents: Column,
    n_buckets: int = 10,
) -> DataFrame:
    """Population-stability-index drift audit between two periods of
    an integer-valued measure, at BUCKET grain: equal-width buckets
    derived from the OLD period's exact integer [min, max] (width =
    max(1, ⌈range/n⌉), bucket = min(n−1, (v−min) div width), out-of-
    range new values clamp into the edge buckets) — every bucket
    assignment is pure integer arithmetic, so the binning is
    engine-exact, unlike quantile edges (interpolation families
    differ across engines). Counts are add-1 smoothed so empty
    buckets stay finite; the per-bucket PSI contribution
    (p_new−p_old)·ln(p_new/p_old) is a single float expression over
    exact integers (emitting cells, not the sum, keeps accumulation
    order out of the comparison — the chi_square_cells discipline).

    Two fact scans (one per period) each reducing straight to the
    n_buckets-row grain; the old-period bounds are a broadcast
    one-row aggregate.
    """
    bounds = old.select(value_cents.alias("__v")).agg(
        F.min("__v").alias("__lo"), F.max("__v").alias("__hi")
    )
    width = F.greatest(
        F.lit(1).cast("long"),
        F.ceil((F.col("__hi") - F.col("__lo") + 1) / F.lit(n_buckets)).cast("long"),
    )
    # TRUE integral division (`div`), not floor(double/double): double
    # division is exact only while (v−lo) stays within 2^53, so the
    # "pure integer arithmetic" guarantee would silently break past
    # that boundary (ADVICE r8). `div` truncates toward zero vs
    # floor's round-down, which differs only for negative numerators —
    # and those clamp to bucket 0 under either rule, so the assignment
    # is unchanged where both are defined and now engine-exact for ALL
    # long inputs.
    bucket = F.least(
        F.lit(n_buckets - 1).cast("long"),
        F.greatest(F.lit(0).cast("long"), F.expr("(__v - __lo) div __w")),
    )

    def per_bucket(d: DataFrame, alias: str) -> DataFrame:
        return (
            d.select(value_cents.alias("__v"))
            .crossJoin(F.broadcast(bounds))
            .withColumn("__w", width)
            .select(bucket.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    spine = old.sparkSession.range(n_buckets).select(F.col("id").alias("bucket"))
    o = per_bucket(old, "n_old")
    n = per_bucket(new, "n_new")
    joined = (
        spine.join(o, "bucket", "left")
        .join(n, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_old", F.lit(0)).alias("n_old"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
    )
    tot = joined.agg(
        (F.sum("n_old") + n_buckets).alias("__to"),
        (F.sum("n_new") + n_buckets).alias("__tn"),
    )
    p_old = (F.col("n_old") + 1) / F.col("__to")
    p_new = (F.col("n_new") + 1) / F.col("__tn")
    return (
        joined.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_old",
            "n_new",
            F.round(p_old, 6).alias("p_old"),
            F.round(p_new, 6).alias("p_new"),
            F.round((p_new - p_old) * F.log(p_new / p_old), 6).alias("psi_contrib"),
        )
    )


def fd_profile(
    df: DataFrame,
    fds: dict[str, tuple["F.Column", "F.Column"]],
) -> DataFrame:
    """Functional-dependency audit over MANY candidate FDs in one
    pass: for each named ``lhs -> rhs`` dependency, how many distinct
    lhs values exist, how many of them violate the dependency (more
    than one distinct rhs observed), the worst fan-out, and the row
    count covered — the data-quality contract check behind "is this
    column a key / a deterministic derivation?".

    Plan: the (fd, lhs, rhs) triples for every candidate STACK into
    one exploded relation (inline array of structs, no extra scan per
    FD), then ONE hash aggregate to (fd, lhs) grain and ONE tiny
    rollup to fd grain — two shuffles total regardless of how many
    FDs are profiled, vs one full scan per FD in the naive loop.
    NULLs: lhs rows with NULL keep their group (NULL is a legitimate
    key value under eqNullSafe semantics — count_distinct skips NULL
    rhs, so an all-NULL rhs group counts 0 distinct and cannot
    violate).
    """
    structs = [
        F.struct(
            F.lit(name).alias("fd"),
            lhs.cast("string").alias("lhs"),
            rhs.cast("string").alias("rhs"),
        )
        for name, (lhs, rhs) in fds.items()
    ]
    exploded = df.select(F.explode(F.array(*structs)).alias("t")).select(
        "t.fd", "t.lhs", "t.rhs"
    )
    per_lhs = exploded.groupBy("fd", "lhs").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("rhs").alias("n_rhs"),
    )
    return per_lhs.groupBy("fd").agg(
        F.count(F.lit(1)).cast("long").alias("n_lhs_values"),
        F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0)).cast("long").alias("n_violating"),
        F.max("n_rhs").cast("long").alias("max_fanout"),
        F.sum("n_rows").cast("long").alias("n_rows"),
    )


def ks_two_sample(
    a: DataFrame,
    b: DataFrame,
    value: Column,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between integer-valued
    samples — the distribution-drift test PSI's fixed bins coarsen
    away, exact by construction: D = max_v |F_a(v) − F_b(v)| =
    max_v |cum_a(v)·n_b − cum_b(v)·n_a| / (n_a·n_b), where the max
    runs over pooled distinct values, the cumulative counts are exact
    integers, and the single division happens once on the argmax row.

    Plan: each side reduces to (value, count) grain, the pooled
    full-outer merge is value-grain, and BOTH cumulative counts come
    from the two-phase global running sum (range shuffle +
    partition-local window + broadcast offsets) — a KS over a
    high-cardinality value column stays value-grain-distributed, never
    a single-task global sort (the fleet window guard's class). The
    answer is one argmax row.
    """
    from . import windows as _windows

    ca = a.select(value.cast("long").alias("v")).groupBy("v").agg(
        F.count(F.lit(1)).alias("ca")
    )
    cb = b.select(value.cast("long").alias("v")).groupBy("v").agg(
        F.count(F.lit(1)).alias("cb")
    )
    merged = (
        ca.join(cb, "v", "full_outer")
        .select(
            "v",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    cum, _ = _windows.two_phase_running_sum(merged, [F.col("v").asc()], "ca", "cum_a")
    cum, _ = _windows.two_phase_running_sum(cum, [F.col("v").asc()], "cb", "cum_b")
    tot = merged.agg(
        F.sum("ca").cast("long").alias("n_a"), F.sum("cb").cast("long").alias("n_b")
    )
    scored = cum.crossJoin(F.broadcast(tot)).select(
        "v",
        "cum_a",
        "cum_b",
        "n_a",
        "n_b",
        F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")).alias("__num"),
    )
    return (
        scored.orderBy(F.col("__num").desc(), F.col("v").asc())
        .limit(1)
        .select(
            F.col("v").alias("argmax_v"),
            F.col("n_a"),
            F.col("n_b"),
            F.col("__num").cast("long").alias("ks_numerator"),
            F.round(
                F.col("__num").cast("double") / (F.col("n_a") * F.col("n_b")), 6
            ).alias("ks_distance"),
        )
    )


def order_totals_reconcile(
    orders: DataFrame,
    lineitem: DataFrame,
    group_col: str = "o_orderstatus",
) -> DataFrame:
    """Header-vs-detail reconciliation audit: does each order's stored
    total equal the sum of its line charges? The E6 count-verify idea
    (reference: data_validation/gcs_to_bq-checker.py row-count
    reconciliation) lifted to VALUE grain — the audit a finance close
    runs before trusting either table.

    Exact end to end: the header total and every line charge
    (price·(1−disc)·(1+tax)) land in integer micro-dollars (all three
    factors are ≤2 dp, so 1e-6 scale is exact — the revenue_waterfall
    grain), the per-order line sum is one hash aggregate, the
    header join is on the order key (same shuffle key), and the
    output is per-``group_col``: order count, exactly-matching count,
    and the max / total absolute discrepancy in micro-dollars. Orders
    with no lines count their full header total as discrepancy (left
    join, zero-fill) — a missing-detail signal, not an error.
    """
    line_micro = F.round(
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax"))
        * 1_000_000
    ).cast("long")
    per_order = lineitem.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.sum(line_micro).alias("lines_micro")
    )
    hdr = orders.select(
        F.col("o_orderkey").alias("ok"),
        F.col(group_col),
        F.round(F.col("o_totalprice") * 1_000_000).cast("long").alias("hdr_micro"),
    )
    joined = hdr.join(per_order, "ok", "left").select(
        group_col,
        (F.col("hdr_micro") - F.coalesce(F.col("lines_micro"), F.lit(0))).alias("__d"),
    )
    return joined.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.when(F.col("__d") == 0, 1).otherwise(0)).cast("long").alias("n_exact"),
        F.max(F.abs(F.col("__d"))).cast("long").alias("max_abs_diff_micro"),
        F.sum(F.abs(F.col("__d"))).cast("long").alias("total_abs_diff_micro"),
    )


def t_closeness(
    df: DataFrame,
    group_cols: list[str],
    bucket_col: Column,
) -> DataFrame:
    """t-closeness audit, completing the k-anonymity / l-diversity
    privacy trio: per quasi-identifier group, the Earth Mover's
    Distance between the group's distribution over an ORDERED
    discrete sensitive attribute and the global distribution —
    EMD = Σᵢ |CDF_group(i) − CDF_all(i)| / (m − 1) over the m
    observed buckets. A group whose EMD exceeds the policy's t leaks
    the sensitive attribute even if it is k-anonymous and l-diverse.

    Exact until the last step: the CDF difference at bucket i
    cross-multiplies counts (cum_g·n_all − cum_all·n_g, exact
    bigints), their |·|-sum divides ONCE by n_g·n_all·(m−1) — the
    single shared float both engines compute identically. Plan: one
    pass to (group, bucket) counts, a tiny group×bucket grid
    (zero-filled) so cumulative sums see every bucket, one
    PARTITIONED window per group (never a global window), group-grain
    output.

    Edge contracts (ADVICE r11): (a) a single observed bucket (m = 1)
    means every group trivially matches the global distribution —
    each group row is EMITTED with t_emd = 0.0, never an empty audit
    frame a policy reader would mistake for "nothing to check";
    (b) NULL sensitive values are FILTERED before bucketing (a NULL
    bucket has no position in the ordered EMD ground metric, and
    Spark/DuckDB disagree on NULL window order — NULLS FIRST vs
    LAST), so ``n`` counts rows with a recorded sensitive value.
    """
    base = df.select(*group_cols, bucket_col.cast("long").alias("__b")).filter(
        F.col("__b").isNotNull()
    )
    gb = base.groupBy(*group_cols, "__b").agg(F.count(F.lit(1)).alias("__c"))
    allb = base.groupBy("__b").agg(F.count(F.lit(1)).alias("__ca"))
    groups = gb.groupBy(*group_cols).agg(F.sum("__c").alias("__ng"))
    totals = allb.agg(
        F.sum("__ca").alias("__na"), F.count(F.lit(1)).alias("__m")
    )
    grid = groups.crossJoin(F.broadcast(allb)).join(gb, [*group_cols, "__b"], "left")
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*group_cols)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.select(
        *group_cols,
        "__ng",
        F.sum(F.coalesce(F.col("__c"), F.lit(0))).over(w).alias("__cg"),
        F.sum("__ca").over(w).alias("__call"),
        F.row_number().over(Window.partitionBy(*group_cols).orderBy("__b")).alias("__i"),
    )
    per_group = (
        cum.crossJoin(F.broadcast(totals))
        # the last bucket's CDF difference is identically 0 — the
        # conditional sum skips it so the (m-1) normalizer matches the
        # summed terms, WITHOUT a row filter (a filter would delete
        # whole groups when m = 1; the group rows must survive)
        .groupBy(*group_cols)
        .agg(
            F.min("__ng").alias("__ng"),
            # decimal(38,0) cross products: cum·n is group_count ×
            # table_count — past int64 already at ~10^10 rows
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("__i") < F.col("__m"),
                        F.abs(
                            F.col("__cg").cast("decimal(19,0)") * F.col("__na")
                            - F.col("__call").cast("decimal(19,0)") * F.col("__ng")
                        ),
                    )
                ),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("__sdiff"),
            F.min("__na").alias("__na"),
            F.min("__m").alias("__m"),
        )
    )
    return per_group.select(
        *group_cols,
        F.col("__ng").cast("long").alias("n"),
        F.when(
            F.col("__m") > F.lit(1),
            F.col("__sdiff").cast("double")
            / (
                F.col("__ng").cast("double")
                * F.col("__na").cast("double")
                * (F.col("__m") - F.lit(1)).cast("double")
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("t_emd"),
    )


def mutual_information(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Mutual information (nats) between two categorical columns, with
    marginal entropies and the geometric-mean normalized MI — the
    feature-relevance / drift-profiling companion to the reference's
    imperative per-column validators (`data_validation/*-checker.py`
    counts one column at a time; this scores the DEPENDENCE between
    two).

    One hash aggregate reduces the fact scan to (x, y) cell counts
    (map-side combined), so the wide relation never crosses the wire;
    marginals are CELL-grain aggregates broadcast back (the stats-join
    pattern — never a window over the cell relation, which for a
    high-cardinality pair would route |X|·|Y| rows through single
    partitions), never a second scan. MI folds one float term per
    cell — the char_entropy precedent: exact integer counts feed
    shared-verbatim double expressions, rounded at the audit grain
    (6dp) on both engines. NULL categories count as their own level
    only if present in BOTH columns' row (rows with a NULL in either
    column are dropped first — complete-case, the mann_whitney rule).

    At 100 TB: cost is the one scan + a shuffle of |X|·|Y| cells;
    output is a single row.
    """
    cells = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(x_col, y_col)
        .agg(F.count(F.lit(1)).alias("__c"))
        .persist()  # cell-grain; multiple marginal consumers (lazy pin)
    )
    mx = cells.groupBy(x_col).agg(F.sum("__c").alias("__nx"))
    my = cells.groupBy(y_col).agg(F.sum("__c").alias("__ny"))
    tot = cells.agg(F.sum("__c").alias("__n"))
    t = (
        cells.join(F.broadcast(mx), x_col)
        .join(F.broadcast(my), y_col)
        .crossJoin(F.broadcast(tot))
        .select("__c", "__nx", "__ny", "__n")
    )
    c = F.col("__c").cast("double")
    nx = F.col("__nx").cast("double")
    ny = F.col("__ny").cast("double")
    n = F.col("__n").cast("double")
    mi_term = (c / n) * F.log((c * n) / (nx * ny))
    # marginal-entropy terms counted once per marginal level: weight
    # each cell's term by c/n_margin so the per-level term sums to
    # exactly -(n_margin/n)*ln(n_margin/n) without a second distinct
    hx_term = -(c / n) * F.log(nx / n)
    hy_term = -(c / n) * F.log(ny / n)
    out = t.agg(
        F.max("__n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.round(F.sum(mi_term), 6).alias("mi_nats"),
        F.sum(hx_term).alias("__hx"),
        F.sum(hy_term).alias("__hy"),
    )
    return out.select(
        "n",
        "n_cells",
        "mi_nats",
        F.round(F.col("__hx"), 6).alias("h_x_nats"),
        F.round(F.col("__hy"), 6).alias("h_y_nats"),
        F.when(
            (F.col("__hx") > 0) & (F.col("__hy") > 0),
            F.round(F.col("mi_nats") / F.sqrt(F.col("__hx") * F.col("__hy")), 6),
        ).alias("nmi"),
    )


def qq_drift(
    df: DataFrame,
    value_col: str,
    id_col: str,
    period_col: str,
    pre_label: str,
    post_label: str,
    n_q: int = 9,
) -> DataFrame:
    """Quantile-quantile drift table between two periods: the exact
    q/10-quantile order statistics of an integer value in each period,
    side by side with their ratio — where in the distribution a shift
    lives (a mean-only drift monitor can't tell "everything moved 5%"
    from "the top decile doubled").

    Quantile positions are exact integer arithmetic (the
    quantile_match_normalize rule): the q-th of n_q cut points in a
    period of n rows is the order statistic at rank
    ``1 + ((n−1)·q) div (n_q+1)`` — no interpolation, no rounding
    seam. Per-period ranks run two-phase (periods are two giant keys
    by construction — the canonical giant-key window); the cut-point
    lookup is a tiny spine join. One shared ratio division.
    """
    from .windows import partitioned_row_number_two_phase

    base = df.select(
        F.col(period_col).alias("__p"),
        F.col(value_col).cast("long").alias("__v"),
        F.col(id_col).alias("__id"),
    ).filter(F.col("__p").isin(pre_label, post_label) & F.col("__v").isNotNull())
    ranked = partitioned_row_number_two_phase(
        base, ["__p"], [F.col("__v").asc(), F.col("__id").asc()], "__r"
    )
    sizes = ranked.groupBy("__p").agg(F.count(F.lit(1)).alias("__n"))
    spine = df.sparkSession.range(1, n_q + 1).select(F.col("id").cast("int").alias("q"))
    picks = (
        sizes.crossJoin(F.broadcast(spine))
        .withColumn("__k", F.lit(1) + F.expr(f"((__n - 1) * q) div {n_q + 1}"))
        # distinct column names before the self-derived join: ranked and
        # picks both descend from `base`, so a bare __p is ambiguous
        .select(F.col("__p").alias("__pp"), "q", "__k")
    )
    cut = ranked.join(
        F.broadcast(picks),
        (ranked["__p"] == picks["__pp"]) & (ranked["__r"] == picks["__k"]),
    ).select(F.col("__pp").alias("__p"), "q", F.col("__v").alias("__cut"))
    pre = cut.filter(F.col("__p") == pre_label).select(
        "q", F.col("__cut").alias("v_pre")
    )
    post = cut.filter(F.col("__p") == post_label).select(
        "q", F.col("__cut").alias("v_post")
    )
    return pre.join(post, "q").select(
        "q",
        "v_pre",
        "v_post",
        F.when(
            F.col("v_pre") != 0,
            F.round(F.col("v_post").cast("double") / F.col("v_pre").cast("double"), 6),
        ).alias("qq_ratio"),
    )


def poisson_dispersion(counts: DataFrame, count_col: str) -> DataFrame:
    """Poisson goodness screen over an integer count distribution
    (basket sizes, daily arrivals): the k-grain observed histogram
    next to the Poisson(λ̂) expectation, with λ̂ = mean and the
    dispersion index var/mean repeated on every row (≈1 = Poisson-
    like; >1 overdispersed → a negative-binomial world; the check
    behind every "can I model arrivals as Poisson" shortcut).

    One exact-decimal-moment aggregate (n, Σk, Σk²) for λ̂ and the
    dispersion; one hash aggregate to k grain for the histogram (k is
    bounded by the max count — dozens of rows); expected counts
    n·e^(−λ̂)·λ̂^k/k! are one shared float expression (``factorial``
    is exact integer on both engines for the k this targets; refuse
    past k = 20 where int64 factorial ends).
    """
    c = F.col(count_col)
    guard = F.assert_true(
        c.isNotNull() & (c >= 0) & (c <= 20),
        F.lit(
            f"poisson_dispersion: {count_col} must be a non-null count in "
            "[0, 20] (int64 factorial ends at 20!; bucket larger counts "
            "upstream)"
        ),
    )
    base = counts.select(F.when(guard.isNull(), c).cast("long").alias("__k"))
    m = base.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__n"),
        F.sum("__k").cast("decimal(38,0)").alias("__s"),
        F.sum(F.col("__k") * F.col("__k")).cast("decimal(38,0)").alias("__ss"),
    )
    hist = base.groupBy("__k").agg(F.count(F.lit(1)).cast("long").alias("observed"))
    d = lambda col: F.col(col).cast("double")  # noqa: E731
    n, s, ss = d("__n"), d("__s"), d("__ss")
    lam = s / n
    disp = (ss - s * s / n) / (n - F.lit(1.0)) / lam
    joined = hist.crossJoin(F.broadcast(m))
    expected = n * F.exp(-lam) * F.pow(lam, F.col("__k").cast("double")) / F.factorial(
        F.col("__k").cast("int")
    ).cast("double")
    return joined.select(
        F.col("__k").cast("long").alias("k"),
        "observed",
        F.round(expected, 6).alias("expected"),
        F.round(lam, 6).alias("lambda_hat"),
        F.when((F.col("__n") > 1) & (lam > 0), F.round(disp, 6)).alias("dispersion"),
    )


def cohens_kappa(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Cohen's kappa between two categorical labelings (a classifier
    vs ground truth, or two annotators): chance-corrected agreement
    kappa = (p_o − p_e)/(1 − p_e) — the honest version of "accuracy"
    when the label distribution is skewed (a constant classifier gets
    p_o = majority share for free; kappa gives it 0).

    Everything reduces to the |A|·|B| confusion-cell relation in one
    hash aggregate; p_o's numerator (the diagonal) and p_e's
    (Σ row_k · col_k over shared categories) are EXACT decimal
    integers, so the two divisions and the kappa ratio are the only
    floats — shared verbatim, round-6. Rows with a NULL on either
    side are dropped (complete-case).
    """
    cells = (
        df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(col_a, col_b)
        .agg(F.count(F.lit(1)).alias("__c"))
        .persist()  # cell-grain; multiple marginal consumers (lazy pin)
    )
    ra = cells.groupBy(col_a).agg(F.sum("__c").cast("decimal(19,0)").alias("__ra"))
    cb = cells.groupBy(col_b).agg(F.sum("__c").cast("decimal(19,0)").alias("__cb"))
    n = cells.agg(F.sum("__c").cast("decimal(38,0)").alias("__n"))
    diag = cells.filter(F.col(col_a) == F.col(col_b)).agg(
        F.coalesce(F.sum("__c"), F.lit(0)).cast("decimal(38,0)").alias("__diag")
    )
    pe_num = (
        ra.join(cb, ra[col_a] == cb[col_b])
        .agg(
            F.coalesce(F.sum(F.col("__ra") * F.col("__cb")), F.lit(0))
            .cast("decimal(38,0)")
            .alias("__pe_num")
        )
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    po = d("__diag") / d("__n")
    pe = d("__pe_num") / (d("__n") * d("__n"))
    return (
        n.crossJoin(F.broadcast(diag))
        .crossJoin(F.broadcast(pe_num))
        .select(
            F.col("__n").cast("long").alias("n"),
            F.round(po, 6).alias("p_observed"),
            F.round(pe, 6).alias("p_expected"),
            F.when(pe < F.lit(1.0), F.round((po - pe) / (F.lit(1.0) - pe), 6)).alias(
                "kappa"
            ),
        )
    )


def cramers_v(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Cramér's V association strength between two categoricals:
    V = sqrt(chi² / (n · min(|X|−1, |Y|−1))) — the [0, 1]-normalized
    companion to :func:`mutual_information` (V is comparable across
    tables of different shapes; MI is not).

    Same plan skeleton as the MI audit: ONE cell-grain hash aggregate,
    margins as cell-grain aggregates broadcast back (stats-join —
    never windows over the cell relation), chi² folding one float term
    per cell at the char_entropy round-6 precedent. Degenerate tables
    (a single level on either side) emit NULL.

    EMPTY cells carry chi² mass too — (0 − e)²/e = e — and a groupBy
    only yields observed cells (the srm_check zero-arm lesson). No
    grid cross-join is needed: total expected over the full grid is
    exactly n, so the empty-cell mass is n − Σ_observed(e), folded in
    as one extra term.
    """
    cells = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(x_col, y_col)
        .agg(F.count(F.lit(1)).alias("__c"))
        .persist()  # cell-grain; multiple marginal consumers (lazy pin)
    )
    rt = cells.groupBy(x_col).agg(F.sum("__c").alias("__rt"))
    ct = cells.groupBy(y_col).agg(F.sum("__c").alias("__ct"))
    tot = cells.agg(
        F.sum("__c").alias("__n"),
        F.count(F.lit(1)).cast("long").alias("__cells"),
    )
    lv = rt.agg(F.count(F.lit(1)).cast("long").alias("__rx")).crossJoin(
        F.broadcast(ct.agg(F.count(F.lit(1)).cast("long").alias("__cy")))
    )
    t = (
        cells.join(F.broadcast(rt), x_col)
        .join(F.broadcast(ct), y_col)
        .crossJoin(F.broadcast(tot))
    )
    o = F.col("__c").cast("double")
    e = (
        F.col("__rt").cast("double")
        * F.col("__ct").cast("double")
        / F.col("__n").cast("double")
    )
    agg = t.agg(
        F.max("__n").cast("long").alias("n"),
        F.round(
            F.sum((o - e) * (o - e) / e)
            + (F.max("__n").cast("double") - F.sum(e)),
            6,
        ).alias("chi2"),
    )
    mind = F.least(F.col("__rx") - 1, F.col("__cy") - 1).cast("double")
    return (
        agg.crossJoin(F.broadcast(lv))
        .select(
            "n",
            F.col("__rx").alias("n_x_levels"),
            F.col("__cy").alias("n_y_levels"),
            "chi2",
            F.when(
                (F.col("__rx") > 1) & (F.col("__cy") > 1),
                F.round(
                    F.sqrt(F.col("chi2") / (F.col("n").cast("double") * mind)), 6
                ),
            ).alias("cramers_v"),
        )
    )


def negative_binomial_fit(counts: DataFrame, count_col: str) -> DataFrame:
    """Negative-binomial method-of-moments fit over an integer count
    distribution — the overdispersion follow-up to
    :func:`poisson_dispersion` (when var > mean, Poisson is the wrong
    arrival model; NB's r_hat = mean²/(var − mean) and
    p_hat = mean/var say HOW overdispersed). One exact-decimal-moment
    aggregate; every float a shared post-aggregation expression. When
    var <= mean (under- or equi-dispersed) the NB fit is undefined and
    r_hat/p_hat emit NULL — the dispersion column still reports.
    """
    c = F.col(count_col)
    base = counts.select(c.cast("long").alias("__k")).filter(F.col("__k").isNotNull())
    m = base.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__n"),
        F.sum("__k").cast("decimal(38,0)").alias("__s"),
        F.sum(F.col("__k").cast("decimal(18,0)") * F.col("__k").cast("decimal(18,0)"))
        .cast("decimal(38,0)")
        .alias("__ss"),
    )
    d = lambda col: F.col(col).cast("double")  # noqa: E731
    n, s, ss = d("__n"), d("__s"), d("__ss")
    mean = s / n
    var = (ss - s * s / n) / (n - F.lit(1.0))
    defined = (F.col("__n") > 1) & (var > mean)
    return m.select(
        F.col("__n").cast("long").alias("n"),
        F.round(mean, 6).alias("mean"),
        F.when(F.col("__n") > 1, F.round(var, 6)).alias("variance"),
        F.when(defined, F.round(mean * mean / (var - mean), 6)).alias("r_hat"),
        F.when(defined, F.round(mean / var, 6)).alias("p_hat"),
    )
