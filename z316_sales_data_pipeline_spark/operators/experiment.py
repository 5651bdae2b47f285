"""Experiment-analysis statistics (A/B testing support): Mann-Whitney
U, CUPED variance reduction, and sample-ratio-mismatch checks.

Extension family beyond the reference's E-ops (reference computes only
sum/count rollups, e.g. ``data_transformation/sales_to_bq/main.py:89-117``
order totals): a sales pipeline that powers pricing/promo experiments needs
the read-side stats too. Engine-portable by the repo's exact-moment
discipline: every accumulation is an exact integer / decimal(38,0)
aggregate, and every float in the output is ONE shared IEEE expression
over those exact moments (the pearson_exact rule), so the DuckDB
oracle can mirror the expression tree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .corpus import hash_bucket
from .windows import two_phase_running_sum


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    group_a: str,
    group_b: str,
    value_int: Column,
) -> DataFrame:
    """Two-sample Mann-Whitney U (rank-sum) test between two groups of
    an INTEGER-VALUED measure, with the normal approximation's
    tie-corrected z and the rank-biserial effect size.

    Rank arithmetic never ranks ROWS: per distinct value v the average
    midrank is (2·below(v) + cnt(v) + 1)/2 where below(v) is the count
    of strictly smaller observations — so everything reduces to the
    distinct-VALUE grain first (one shuffle), the cumulative below()
    comes from :func:`~.windows.two_phase_running_sum` (no
    single-partition window — the named 100 TB scale-killer), and all
    ranks stay exact integers by carrying 2x the midrank. Tie
    correction Σ(t³−t) accumulates as decimal(38,0) (t up to ~1e12
    cubes past int64). Output: one row with n_a, n_b, u_a_x2 (exact
    2·U_a), rank_biserial and z as single shared float expressions.
    """
    # NULL measures are DROPPED (the sibling operators' complete-case
    # rule; self-review r10): ranking NULL as a value would inflate
    # the counts AND diverge cross-engine on NULL sort order
    both = (
        df.filter(F.col(group_col).isin(group_a, group_b))
        .select(F.col(group_col).alias("__g"), value_int.cast("long").alias("__v"))
        .filter(F.col("__v").isNotNull())
    )
    per_v = both.groupBy("__v").agg(
        F.sum(F.when(F.col("__g") == group_a, 1).otherwise(0)).alias("__ca"),
        F.sum(F.when(F.col("__g") == group_b, 1).otherwise(0)).alias("__cb"),
    )
    per_v = per_v.withColumn("__c", F.col("__ca") + F.col("__cb"))
    ranked, _total = two_phase_running_sum(per_v, [F.col("__v")], "__c", "__cum")
    # 2x the midrank of value v: 2*below + cnt + 1 (exact integer)
    ranked = ranked.withColumn(
        "__mr2", 2 * (F.col("__cum") - F.col("__c")) + F.col("__c") + F.lit(1)
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    # rank sums accumulate as decimal(38,0) (self-review r10): ra2 is
    # ~2n² and exits int64 at n ≈ 3e9 rows — ANSI would hard-fail and
    # non-ANSI would silently wrap against the HUGEINT oracle
    m = ranked.agg(
        F.coalesce(F.sum("__ca"), F.lit(0)).cast("long").alias("n_a"),
        F.coalesce(F.sum("__cb"), F.lit(0)).cast("long").alias("n_b"),
        F.coalesce(
            F.sum(dec(F.col("__ca")) * dec(F.col("__mr2"))), F.lit(0).cast("decimal(38,0)")
        ).alias("__ra2"),
        F.coalesce(
            F.sum(
                dec(F.col("__c")) * dec(F.col("__c")) * dec(F.col("__c"))
                - dec(F.col("__c"))
            ),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("__ties"),
    )
    na, nb = F.col("n_a"), F.col("n_b")
    # exact in decimal, emitted as bigint (output contract: U fits
    # int64 for n_a·n_b ≤ ~4.6e18 — group sizes to ~2e9 each)
    u_a_x2_dec = F.col("__ra2") - dec(na) * (dec(na) + F.lit(1).cast("decimal(38,0)"))
    u_a_x2 = u_a_x2_dec.cast("long")
    n = (na + nb).cast("double")
    nad, nbd = na.cast("double"), nb.cast("double")
    # tie-corrected variance of U: na*nb/12 * ((n+1) - ties/(n*(n-1)))
    var_u = (
        nad * nbd / F.lit(12.0)
        * ((n + F.lit(1.0)) - F.col("__ties").cast("double") / (n * (n - F.lit(1.0))))
    )
    z = (u_a_x2.cast("double") / F.lit(2.0) - nad * nbd / F.lit(2.0)) / F.sqrt(var_u)
    # ANSI-safe: an empty group or an all-ties sample has no defined
    # effect size / z — emit NULL (CASE-guarded on both engines), never
    # a DIVIDE_BY_ZERO. The n > 1 guard must sit OUTSIDE (self-review
    # r10): var_u's tie term divides by n·(n−1), and a WHEN condition
    # still EVALUATES its predicate — only the outer branch's value is
    # lazy, so the division must live in a value branch, not a
    # condition, when n ≤ 1.
    return m.select(
        "n_a",
        "n_b",
        u_a_x2.alias("u_a_x2"),
        F.when(na * nb > 0, F.lit(1.0) - u_a_x2.cast("double") / (nad * nbd)).alias(
            "rank_biserial"
        ),
        F.when((na + nb) > F.lit(1), F.when(var_u > F.lit(0.0), z)).alias("z"),
    )


def cuped(df: DataFrame, x_int: Column, y_int: Column) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Experiment Data) variance
    reduction: theta = cov(x, y)/var(x) over an integer pre-period
    covariate x and post-period metric y, plus the population std of y
    and the achieved variance-reduction ratio ρ² = cov²/(vx·vy).

    One full-scan hash aggregate of exact decimal moments (n, Σx, Σy,
    Σx², Σxy, Σy² — the pearson_exact projection discipline: each input
    casts to decimal(18,0) once, products stay in decimal(37,0)); all
    float outputs are single shared expressions over those moments
    (sqrt is IEEE-exact, so std stays engine-identical). std rather
    than raw variance keeps the emission inside the round-budget gate:
    a cents² variance carries ~15 integer digits and would be one
    fractional datum from a cross-engine tie. At 100 TB the whole
    relation reduces to six numbers.
    """
    proj = df.select(
        x_int.cast("decimal(18,0)").alias("__x"),
        y_int.cast("decimal(18,0)").alias("__y"),
    ).filter(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    x, y = F.col("__x"), F.col("__y")
    m = proj.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * x).alias("__sxx"),
        F.sum(x * y).alias("__sxy"),
        F.sum(y * y).alias("__syy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    nd = d("__n")
    cov = nd * d("__sxy") - d("__sx") * d("__sy")
    vx = nd * d("__sxx") - d("__sx") * d("__sx")
    vy = nd * d("__syy") - d("__sy") * d("__sy")
    # ANSI-safe (self-review r10): a constant covariate (vx = 0 — e.g.
    # every unit has zero pre-period revenue) has no defined theta/ρ²;
    # emit NULL via CASE on both engines, never DIVIDE_BY_ZERO
    return m.select(
        F.col("__n").cast("long").alias("n"),
        F.when(nd > F.lit(0.0), d("__sy") / nd).alias("mean_y"),
        F.when(vx > F.lit(0.0), cov / vx).alias("theta"),
        F.when(nd > F.lit(0.0), F.sqrt(vy / (nd * nd))).alias("std_y"),
        F.when(vx * vy > F.lit(0.0), cov * cov / (vx * vy)).alias("var_reduction"),
    )


def srm_check(df: DataFrame, id_col: str, n_arms: int = 2) -> DataFrame:
    """Sample-ratio-mismatch audit for a deterministic hash split:
    assign each unit to an arm with the engine-portable md5 bucket
    (:func:`~.corpus.hash_bucket` — the dataset_split assignment, so
    the audit checks the EXACT split production uses), then emit one
    row per arm with observed count, expected count under equal
    allocation, and the chi-square cell (o−e)²/e.

    Cell-grain output (the chi_square_cells rule): every float is a
    single expression over exact integer counts — the overall SRM
    statistic is the sum of the cells, computed by the reader. One
    distinct + one tiny aggregate; arms are a constant, so the
    expected side is a broadcast-free literal division.

    Zero-unit arms (ADVICE r11): the arm grain is an explicit
    0..n_arms−1 spine (``spark.range``) left-joined with the observed
    counts and zero-filled, so an arm that received NO units — the
    most extreme sample-ratio mismatch — still emits its (o−e)²/e
    cell instead of silently vanishing from the reader's chi-square
    sum. (The r10 shape grouped over observed buckets only.)
    """
    units = df.select(F.col(id_col).alias("__id")).distinct()
    observed = units.groupBy(
        (hash_bucket(F.col("__id"), n_arms)).cast("int").alias("arm")
    ).agg(F.count(F.lit(1)).cast("long").alias("observed"))
    spine = df.sparkSession.range(n_arms).select(F.col("id").cast("int").alias("arm"))
    arms = (
        spine.join(F.broadcast(observed), "arm", "left")
        .select("arm", F.coalesce(F.col("observed"), F.lit(0)).cast("long").alias("observed"))
    )
    # one-row total joined back broadcast (the stats-join pattern) —
    # no unpartitioned WindowExec anywhere, even on the tiny arm grain
    tot = arms.agg(F.sum("observed").cast("long").alias("__total"))
    expected = F.col("__total").cast("double") / F.lit(float(n_arms))
    cell = (F.col("observed").cast("double") - expected) * (
        F.col("observed").cast("double") - expected
    ) / expected
    return arms.crossJoin(F.broadcast(tot)).select(
        "arm",
        "observed",
        expected.alias("expected"),
        cell.alias("chi2_cell"),
    )


def ab_readout(
    df: DataFrame,
    x_int: Column,
    y_int: Column,
    id_col: str,
    n_arms: int = 2,
) -> DataFrame:
    """End-to-end A/B readout (composition of the family): units are
    hash-split into arms (:func:`~.corpus.hash_bucket`, the same
    portable assignment srm_check audits), and each arm's post-period
    mean is reported raw and CUPED-adjusted:
    mean_adj(arm) = mean_y(arm) − theta·(mean_x(arm) − mean_x(all)),
    with theta = cov(x, y)/var(x) POOLED across arms from the
    pre-period covariate — the standard production readout.

    One hash aggregate to arm grain carrying exact decimal moments
    (n, Σx, Σy per arm), one one-row pooled-moment aggregate
    broadcast back (the stats-join pattern), every float a single
    shared expression over exact integers. At 100 TB: the unit-grain
    scan is the only size-linear term; arm grain is ~constant.
    """
    proj = df.select(
        hash_bucket(F.col(id_col), n_arms).cast("int").alias("arm"),
        x_int.cast("decimal(18,0)").alias("__x"),
        y_int.cast("decimal(18,0)").alias("__y"),
    ).filter(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    x, y = F.col("__x"), F.col("__y")
    per_arm = proj.groupBy("arm").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__na"),
        F.sum(x).alias("__sxa"),
        F.sum(y).alias("__sya"),
    )
    pooled = proj.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * x).alias("__sxx"),
        F.sum(x * y).alias("__sxy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    vx = d("__n") * d("__sxx") - d("__sx") * d("__sx")
    theta = (d("__n") * d("__sxy") - d("__sx") * d("__sy")) / vx
    mean_y_arm = d("__sya") / d("__na")
    mean_x_arm = d("__sxa") / d("__na")
    mean_x_all = d("__sx") / d("__n")
    # ANSI-safe (self-review r10): constant pooled covariate (vx = 0)
    # means no adjustment is defined — emit the RAW mean as the
    # adjusted one (theta undefined ⇒ no reduction), never
    # DIVIDE_BY_ZERO; per-arm means are safe (groupBy rows have n ≥ 1)
    return per_arm.crossJoin(F.broadcast(pooled)).select(
        "arm",
        F.col("__na").cast("long").alias("n"),
        mean_y_arm.alias("mean_y"),
        F.when(
            vx > F.lit(0.0), mean_y_arm - theta * (mean_x_arm - mean_x_all)
        )
        .otherwise(mean_y_arm)
        .alias("mean_y_cuped"),
    )


def wilcoxon_signed_rank(
    df: DataFrame,
    x_int: Column,
    y_int: Column,
) -> DataFrame:
    """Wilcoxon signed-rank test over paired integer measures — the
    nonparametric paired twin of :func:`mann_whitney_u` ("did this
    population's metric shift between the two periods?"). Zero
    differences are dropped (the standard treatment); |d| ranks use
    the same distinct-VALUE-grain 2x-midrank arithmetic and two-phase
    cumulative below-count as mann_whitney_u (no single-partition
    window, ranks exact integers); W+ is the rank sum of positive
    differences; z uses the tie-corrected normal approximation
    (mu = n(n+1)/4, var = n(n+1)(2n+1)/24 − Σ(t³−t)/48), emitted as
    ONE shared float expression over exact decimal(38,0) moments.
    """
    d = (y_int.cast("long") - x_int.cast("long")).alias("__d")
    nz = df.select(d).filter(F.col("__d") != 0).select(
        F.abs(F.col("__d")).alias("__v"),
        F.when(F.col("__d") > 0, 1).otherwise(0).alias("__pos"),
    )
    per_v = nz.groupBy("__v").agg(
        F.sum("__pos").alias("__cp"),
        F.count(F.lit(1)).alias("__c"),
    )
    ranked, _ = two_phase_running_sum(per_v, [F.col("__v")], "__c", "__cum")
    ranked = ranked.withColumn(
        "__mr2", 2 * (F.col("__cum") - F.col("__c")) + F.col("__c") + F.lit(1)
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    # coalesce to zeros: an all-zero-differences input leaves per_v
    # empty, and empty sums are NULL — the test's answer is "no
    # evidence" (counts 0, z NULL), not a NULL row
    m = ranked.agg(
        F.coalesce(F.sum("__cp"), F.lit(0)).cast("long").alias("n_pos"),
        F.coalesce(F.sum(F.col("__c") - F.col("__cp")), F.lit(0))
        .cast("long")
        .alias("n_neg"),
        F.coalesce(
            F.sum(dec(F.col("__cp")) * dec(F.col("__mr2"))), F.lit(0).cast("decimal(38,0)")
        ).alias("__wp2"),
        F.coalesce(
            F.sum(
                dec(F.col("__c")) * dec(F.col("__c")) * dec(F.col("__c"))
                - dec(F.col("__c"))
            ),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("__ties"),
    )
    n = (F.col("n_pos") + F.col("n_neg")).cast("double")
    w_plus_x2 = F.col("__wp2").cast("long")
    mu_x2 = n * (n + F.lit(1.0)) / F.lit(2.0)  # 2x the mean n(n+1)/4
    # var of W+ (x2 scale multiplies variance by 4):
    var_x4 = (
        n * (n + F.lit(1.0)) * (F.lit(2.0) * n + F.lit(1.0)) / F.lit(6.0)
        - F.col("__ties").cast("double") / F.lit(12.0)
    )
    z = (w_plus_x2.cast("double") - mu_x2) / F.sqrt(var_x4)
    return m.select(
        "n_pos",
        "n_neg",
        w_plus_x2.alias("w_plus_x2"),
        F.when(var_x4 > F.lit(0.0), z).alias("z"),
    )


def paired_t_test(df: DataFrame, x_int: Column, y_int: Column) -> DataFrame:
    """Paired t-test over integer measures — the parametric companion
    of :func:`wilcoxon_signed_rank`: exact decimal moments of the
    difference d = y − x (n, Σd, Σd²), then mean, sample variance and
    t = mean / sqrt(var/n) as single shared float expressions. One
    full-scan hash aggregate; at 100 TB the relation reduces to three
    numbers.
    """
    proj = df.select(
        (y_int.cast("long") - x_int.cast("long")).cast("decimal(18,0)").alias("__d")
    ).filter(F.col("__d").isNotNull())
    m = proj.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__n"),
        F.sum(F.col("__d")).alias("__sd"),
        F.sum(F.col("__d") * F.col("__d")).alias("__sdd"),
    )
    nd = F.col("__n").cast("double")
    sd = F.col("__sd").cast("double")
    sdd = F.col("__sdd").cast("double")
    var_s = (nd * sdd - sd * sd) / (nd * (nd - F.lit(1.0)))
    t = (sd / nd) / F.sqrt(var_s / nd)
    return m.select(
        F.col("__n").cast("long").alias("n"),
        (sd / nd).alias("mean_d"),
        F.when((nd > F.lit(1.0)) & (var_s > F.lit(0.0)), t).alias("t"),
    )


def auc_exact(
    df: DataFrame,
    label_col: Column,
    score_int: Column,
) -> DataFrame:
    """EXACT ROC-AUC of an integer score against a boolean label,
    distributed: AUC is the probability a positive outranks a random
    negative (ties count half), which is exactly U⁺/(n_pos·n_neg) —
    so the computation IS :func:`mann_whitney_u`'s distinct-value
    midrank machinery (2x-scale integer ranks, two-phase cumulative,
    no row-grain sort, no single-partition window), and the AUC is
    ONE shared float division over exact integers. The builtin
    BinaryClassificationEvaluator trapezoid-sums floats in partition
    order; this is the engine-portable exact form.
    """
    tagged = df.select(
        F.when(label_col, F.lit("__pos")).otherwise(F.lit("__neg")).alias("__g"),
        score_int.alias("__s"),
    )
    u = mann_whitney_u(tagged, "__g", "__pos", "__neg", F.col("__s"))
    return u.select(
        F.col("n_a").alias("n_pos"),
        F.col("n_b").alias("n_neg"),
        F.when(
            F.col("n_a") * F.col("n_b") > 0,
            F.col("u_a_x2").cast("double")
            / (F.lit(2.0) * F.col("n_a").cast("double") * F.col("n_b").cast("double")),
        ).alias("auc"),
    )


def always_valid_pvalue(
    df: DataFrame,
    value_int: Column,
    id_col: str,
    ts_col: str,
    tau2: float,
    n_arms: int = 2,
) -> DataFrame:
    """Sequential A/B monitoring: a day-grain ALWAYS-VALID p-value via
    the two-sample mixture SPRT (mSPRT, Johari et al. 2017) with a
    normal mixture N(0, tau2) on the mean difference — the "peeking
    is safe" readout a dashboard needs (a fixed-horizon t-test's p is
    invalid the moment anyone looks early and stops).

    Per day d over cumulative data through d (arms =
    :func:`~.corpus.hash_bucket` of the unit, the srm_check
    assignment):

        Vn      = sigma2_hat * (1/n0 + 1/n1)   (pooled within-arm var)
        Lambda  = sqrt(Vn / (Vn + tau2))
                  * exp(delta_hat^2 * tau2 / (2 * Vn * (Vn + tau2)))
        p_d     = min(1, min_{m <= d} 1 / Lambda_m)   (running min)

    Exactness: the unit-grain scan reduces ONCE to (day, arm) moments
    (n, sum, sum-of-squares as exact decimals of the integer-scaled
    value — the ab_readout discipline); cumulative moments, the
    Lambda expression and the running min all live on the ~day-count
    relation, shared verbatim with the SQL twin. Days where the
    statistic is undefined (an empty arm, <3 units, zero variance)
    emit a NULL lambda and are skipped by the running min.

    Scale: one size-linear aggregate; everything after is O(days).
    The day-grain windows are single tiny partitions by construction
    (bounded by the calendar, the ewma_forecast precedent) — an
    allowlisted bounded site of the fleet unpartitioned-window guard.

    The mSPRT statistic here is strictly TWO-sample; a multi-arm
    readout needs a per-pair run, so ``n_arms != 2`` is refused
    fail-stop rather than silently dropping units hashed to arms
    2..n-1 and quietly reading arms 0 vs 1 at reduced power.
    """
    from pyspark.sql import Window

    if n_arms != 2:
        raise ValueError(
            "always_valid_pvalue is a two-sample mSPRT; got n_arms="
            f"{n_arms}. Run one call per arm pair instead."
        )
    proj = df.select(
        hash_bucket(F.col(id_col), n_arms).cast("int").alias("arm"),
        F.to_date(F.col(ts_col)).alias("day"),
        value_int.cast("decimal(18,0)").alias("__v"),
    ).filter(F.col("__v").isNotNull() & (F.col("arm") < 2))
    daily = proj.groupBy("day", "arm").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__n"),
        F.sum("__v").alias("__s"),
        F.sum(F.col("__v") * F.col("__v")).alias("__ss"),
    )
    wcum = (
        Window.partitionBy("arm")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = daily.select(
        "day",
        "arm",
        F.sum("__n").over(wcum).alias("__cn"),
        F.sum("__s").over(wcum).alias("__cs"),
        F.sum("__ss").over(wcum).alias("__css"),
    )
    a0 = cum.filter(F.col("arm") == 0).select(
        "day",
        F.col("__cn").alias("__n0"),
        F.col("__cs").alias("__s0"),
        F.col("__css").alias("__ss0"),
    )
    a1 = cum.filter(F.col("arm") == 1).select(
        "day",
        F.col("__cn").alias("__n1"),
        F.col("__cs").alias("__s1"),
        F.col("__css").alias("__ss1"),
    )
    # as-of alignment: a day may have traffic in only one arm; carry
    # the other arm's last cumulative forward via a running last
    both = (
        a0.join(a1, "day", "full")
        .select(
            "day",
            *[
                F.last(c, ignorenulls=True)
                .over(Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0))
                .alias(c)
                for c in ("__n0", "__s0", "__ss0", "__n1", "__s1", "__ss1")
            ],
        )
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    n0, n1 = d("__n0"), d("__n1")
    n = n0 + n1
    delta = d("__s1") / n1 - d("__s0") / n0
    ssw = (d("__ss0") - d("__s0") * d("__s0") / n0) + (
        d("__ss1") - d("__s1") * d("__s1") / n1
    )
    sigma2 = ssw / (n - F.lit(2.0))
    vn = sigma2 * (F.lit(1.0) / n0 + F.lit(1.0) / n1)
    lam = F.sqrt(vn / (vn + F.lit(tau2))) * F.exp(
        delta * delta * F.lit(tau2) / (F.lit(2.0) * vn * (vn + F.lit(tau2)))
    )
    defined = (
        F.col("__n0").isNotNull()
        & F.col("__n1").isNotNull()
        & (n > F.lit(2.0))
    )
    staged = both.select(
        "day",
        F.col("__n0").cast("long").alias("n0"),
        F.col("__n1").cast("long").alias("n1"),
        F.when(defined, F.round(delta, 6)).alias("delta_hat"),
        F.when(defined & (ssw > 0), lam).alias("__lam"),
    )
    wmin = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    mn = F.min(F.lit(1.0) / F.col("__lam")).over(wmin)
    # explicit NULL gate: Spark's least() skips NULL args while
    # DuckDB 1.0's returns NULL only when ALL are NULL — don't let the
    # two conventions meet; a day with no defined Lambda yet is NULL
    return staged.select(
        "day",
        "n0",
        "n1",
        "delta_hat",
        F.when(mn.isNotNull(), F.round(F.least(F.lit(1.0), mn), 6)).alias(
            "p_always_valid"
        ),
    )


def normal_sf_approx(z: Column) -> Column:
    """Upper-tail normal survival function 1 − Φ(z) for z ≥ 0 via the
    Abramowitz-Stegun 7.1.26 erf polynomial (|error| < 1.5e-7) — pure
    column arithmetic, so the IDENTICAL expression runs verbatim on
    Spark and the ANSI oracle (neither engine ships erf; a library
    CDF would be a cross-engine seam). Callers pass |z| and double the
    result for a two-sided p.
    """
    x = z / F.lit(1.4142135623730951)  # z / sqrt(2)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * x)
    poly = t * (
        F.lit(0.254829592)
        + t
        * (
            F.lit(-0.284496736)
            + t * (F.lit(1.421413741) + t * (F.lit(-1.453152027) + t * F.lit(1.061405429)))
        )
    )
    erf = F.lit(1.0) - poly * F.exp(-(x * x))
    return F.lit(0.5) * (F.lit(1.0) - erf)


# SQL rendering of normal_sf_approx(abs(z)) with {z} substituted —
# kept textually parallel to the column version above so the oracle
# computes bit-identical doubles.
NORMAL_SF_SQL = (
    "0.5 * (1.0 - (1.0 - ({t}) * (0.254829592 + ({t}) * (-0.284496736 + ({t}) *"
    " (1.421413741 + ({t}) * (-1.453152027 + ({t}) * 1.061405429))))"
    " * exp(-(({x}) * ({x})))))"
)


def render_normal_sf_sql(z_expr: str) -> str:
    """Render the A&S survival function for a SQL z expression."""
    x = f"({z_expr}) / 1.4142135623730951"
    t = f"1.0 / (1.0 + 0.3275911 * ({x}))"
    return NORMAL_SF_SQL.format(t=t, x=x)


def fdr_bh(df: DataFrame, test_col: str, p_col: str, q: float = 0.05) -> DataFrame:
    """Benjamini-Hochberg FDR control over a battery of m hypothesis
    tests: sort p ascending (ties broken by the test id — the
    engine-portable total order), find the largest rank k with
    p(k) <= q·k/m, reject every test ranked <= k. The multiple-testing
    guard every per-segment metrics battery needs before anyone acts
    on "segment X moved".

    The input is TEST grain (one row per hypothesis) — m is dozens by
    construction (segments x metrics), so the global rank window runs
    over a ~constant relation (an allowlisted bounded site of the
    fleet unpartitioned-window guard, like the top-N coverage curve);
    this operator never touches unit grain. Output: test id, p, rank,
    the BH threshold q·rank/m, and the reject flag.
    """
    from pyspark.sql import Window

    # complete-case: a NULL p (undefined test) must not enter the rank —
    # Spark and ANSI oracles disagree on NULL sort position, and BH's m
    # counts only realized tests
    df = df.filter(F.col(p_col).isNotNull())
    w = Window.orderBy(F.col(p_col).asc(), F.col(test_col).asc())
    m = df.agg(F.count(F.lit(1)).cast("long").alias("__m"))
    ranked = df.crossJoin(F.broadcast(m)).select(
        F.col(test_col),
        F.col(p_col),
        F.row_number().over(w).cast("long").alias("rank"),
        F.col("__m"),
    )
    thr = (
        F.lit(q) * F.col("rank").cast("double") / F.col("__m").cast("double")
    )
    flagged = ranked.withColumn("bh_threshold", thr).withColumn(
        "__hit", F.when(F.col(p_col) <= F.col("bh_threshold"), F.col("rank"))
    )
    kmax = flagged.agg(F.coalesce(F.max("__hit"), F.lit(0)).alias("__k"))
    return (
        flagged.crossJoin(F.broadcast(kmax))
        .select(
            test_col,
            p_col,
            "rank",
            F.round("bh_threshold", 6).alias("bh_threshold"),
            (F.col("rank") <= F.col("__k")).alias("rejected"),
        )
    )


def minimum_detectable_effect(
    df: DataFrame,
    group_cols: list[str],
    value_int: Column,
    alpha_z: float = 1.959964,
    power_z: float = 0.841621,
) -> DataFrame:
    """Per-group minimum detectable effect for a future 50/50 A/B test
    sized like the observed group: MDE = (z_a + z_b)·sqrt(2·s²/(n/2))
    — the "is this segment even testable" screen run before an
    experiment is provisioned. One hash aggregate to group grain with
    exact decimal moments (n, Σv, Σv²); variance and MDE are shared-
    verbatim float expressions, round-6 at the audit grain. Groups
    with n < 2 emit NULL (no variance estimate exists).
    """
    v = value_int.cast("decimal(18,0)")
    per = df.select(*group_cols, v.alias("__v")).filter(F.col("__v").isNotNull())
    agg = per.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__n"),
        F.sum("__v").alias("__s"),
        F.sum(F.col("__v") * F.col("__v")).alias("__ss"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    n = d("__n")
    s2 = (d("__ss") - d("__s") * d("__s") / n) / (n - F.lit(1.0))
    mde = F.lit(alpha_z + power_z) * F.sqrt(F.lit(2.0) * s2 / (n / F.lit(2.0)))
    return agg.select(
        *group_cols,
        F.col("__n").cast("long").alias("n"),
        F.when(F.col("__n") > 1, F.round(s2, 6)).alias("variance"),
        F.when(F.col("__n") > 1, F.round(mde, 6)).alias("mde"),
    )


def stratified_matching_readout(
    facts: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    treat_col: Column,
    covariate_int: Column,
    y_int: Column,
    n_strata: int = 10,
) -> DataFrame:
    """Observational treatment readout by covariate stratification
    (the propensity-decile matching estimator, covariate version):
    dimension rows are ranked into ``n_strata`` exact-ntile strata by
    an integer covariate, facts inherit their dimension's stratum, and
    each stratum reports treated/control counts and the within-stratum
    mean difference — the confounding-adjusted uplift table (compare
    unadjusted: promo parts simply COST more, so raw means confound
    price with promotion).

    Output is STRATUM grain on purpose: the ATT roll-up is a weighted
    sum of ~10 floats whose accumulation order neither engine pins, so
    the operator emits the exact per-stratum cells (counts int64,
    sums exact, ONE shared mean-difference division each) and leaves
    the one-line roll-up to the reader — the srm_check shape.

    Strata come from :func:`~.windows.two_phase_row_number` +
    :func:`~.windows.ntile_from_rank` over the DIMENSION (ntile over a
    dim is cheap; the fact scan never sorts), broadcast back.
    """
    from .windows import ntile_from_rank, two_phase_row_number

    d = dim.select(
        F.col(dim_key).alias("__dk"),
        covariate_int.cast("long").alias("__cov"),
        treat_col.cast("boolean").alias("__treat"),
    )
    ranked, total = two_phase_row_number(
        d, [F.col("__cov").asc(), F.col("__dk").asc()], "__rank"
    )
    strata = ranked.select(
        "__dk", "__treat", ntile_from_rank(F.col("__rank"), n_strata, total).alias("stratum")
    )
    f = facts.select(F.col(fact_key).alias("__dk"), y_int.cast("long").alias("__y"))
    joined = f.join(F.broadcast(strata), "__dk")
    cells = joined.groupBy("stratum").agg(
        F.sum(F.when(F.col("__treat"), 1).otherwise(0)).cast("long").alias("n_treated"),
        F.sum(F.when(~F.col("__treat"), 1).otherwise(0)).cast("long").alias("n_control"),
        F.coalesce(F.sum(F.when(F.col("__treat"), F.col("__y"))), F.lit(0))
        .cast("long")
        .alias("__st"),
        F.coalesce(F.sum(F.when(~F.col("__treat"), F.col("__y"))), F.lit(0))
        .cast("long")
        .alias("__sc"),
    )
    return cells.select(
        "stratum",
        "n_treated",
        "n_control",
        F.when(
            (F.col("n_treated") > 0) & (F.col("n_control") > 0),
            F.col("__st").cast("double") / F.col("n_treated").cast("double")
            - F.col("__sc").cast("double") / F.col("n_control").cast("double"),
        ).alias("mean_diff"),
    )
