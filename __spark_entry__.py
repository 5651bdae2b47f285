"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is a Spark-first implementation of one
operator-semantic from SURVEY.md §2 (reference file:line cited in the
implementing module); ``oracle_sql()`` holds the DuckDB-equivalent ANSI
SQL. Column names and value rounding are kept identical on both sides
(driver hashes values after sorting columns by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from z316_sales_data_pipeline_spark.persistence import persist_fact

from z316_sales_data_pipeline_spark import sinks as sinks_mod
from z316_sales_data_pipeline_spark.functions import scalar, text, vector
from z316_sales_data_pipeline_spark.operators import (
    aggregates,
    bloom,
    corpus,
    dedup,
    experiment,
    graph,
    ivm,
    joins,
    multimodal,
    quality,
    setops,
    similarity,
    sketch,
    skew,
    timeseries,
    windows,
)
from z316_sales_data_pipeline_spark.plans import (
    corpus_pipeline,
    pair_graph,
    reconcile,
    rollup,
    sales_facts,
)
from z316_sales_data_pipeline_spark.plans.sales_facts import (
    ITENS_FACT_SQL,
    PEDIDOS_FACT_SQL,
    SQL_DESCONTO_STR,
    sql_parse_discount,
)
from z316_sales_data_pipeline_spark.sources import json_ingest
from z316_sales_data_pipeline_spark.sources.tables import load_table, register_views
from z316_sales_data_pipeline_spark.streaming import pipeline as streaming_pipeline

# ---------------------------------------------------------------------------
# Flagship entry — smoke-checked by the driver on sf0.001.
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the order-grain sales fact (SURVEY §3.1 step 4)."""
    return sales_facts.pedidos_fact(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# Query implementations (Spark side)
# ---------------------------------------------------------------------------


def _q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style rollup: the E-family aggregate shapes on
    lineitem, in the EXACT integer-scale discipline (r10, flagged by
    the round-budget gate): the old round(sum(double), 4) columns
    were order-dependent float sums presentation-rounded at 12+
    integer digits — the revenue_bridge tie class. Now every sum is
    an exact integer at its natural grain (qty units, price cents,
    disc-price 1e-4 dollars, charge micro-dollars — the
    revenue_waterfall grains) and each average is ONE unrounded
    shared float expression over those exact integers, identical
    IEEE on both engines. Scale contract: per-group micro sums fit
    int64 up to ~9e12 dollars/group."""
    li = load_table(spark, sf_dir, "lineitem")
    price, disc, tax = F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")
    n = F.count(F.lit(1))
    sum_qty = F.sum(F.round(F.col("l_quantity")).cast("long"))
    sum_base = F.sum(F.round(price * 100).cast("long"))
    sum_disc_pct = F.sum(F.round(disc * 100).cast("long"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_qty.alias("sum_qty"),
            sum_base.alias("sum_base_price_cents"),
            F.sum(F.round(price * (1 - disc) * 10_000).cast("long")).alias(
                "sum_disc_price_x10k"
            ),
            F.sum(F.round(price * (1 - disc) * (1 + tax) * 1_000_000).cast("long")).alias(
                "sum_charge_micro"
            ),
            (sum_qty.cast("double") / n.cast("double")).alias("avg_qty"),
            (sum_base.cast("double") / n.cast("double")).alias("avg_price_cents"),
            (sum_disc_pct.cast("double") / n.cast("double")).alias("avg_disc_pct"),
            n.alias("count_order"),
        )
    )


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       cast(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       cast(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
       cast(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS sum_disc_price_x10k,
       cast(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) AS BIGINT)) AS BIGINT) AS sum_charge_micro,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_price_cents,
       CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_disc_pct,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def _d1_item_product_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 — broadcast lookup join, silent drop-on-miss (inner)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return joins.lookup_join(
        li.select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity"),
        part.select("p_partkey", "p_name", "p_retailprice"),
        li.l_partkey == part.p_partkey,
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "p_name",
        F.round(F.col("p_retailprice") * F.col("l_quantity"), 4).alias("custo_item"),
    )


_D1_SQL = """
SELECT l_orderkey, l_linenumber, l_partkey, p_name,
       round(p_retailprice * l_quantity, 4) AS custo_item
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


def _d2_order_customer_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 — left enrichment join (tolerated-miss, nullable attribution)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return joins.lookup_join(
        orders, cust.select("c_custkey", "c_name", "c_mktsegment"), orders.o_custkey == cust.c_custkey, "left"
    ).select("o_orderkey", "o_custkey", "c_name", "c_mktsegment", "o_totalprice")


_D2_SQL = """
SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
"""


def _d4_incremental_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 — anti-join incremental guard: orders with no lineitems yet."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return joins.incremental_guard(
        orders.select(F.col("o_orderkey"), F.col("o_orderstatus")),
        li.select(F.col("l_orderkey").alias("o_orderkey")),
        "o_orderkey",
    )


_D4_SQL = """
SELECT o_orderkey, o_orderstatus FROM orders
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
"""


def _d6_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6 — existence (semi) join: customers that have ordered."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return joins.existence_check(
        cust.select("c_custkey", "c_name"),
        orders.select(F.col("o_custkey").alias("c_custkey")),
        "c_custkey",
        exists=True,
    )


_D6_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def _d5_regroup_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 — folder-regroup as pivot-style conditional aggregation."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).cast("long").alias("n_purchase"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).cast("long").alias("n_error"),
        F.round(F.max(F.when(F.col("event_type") == "purchase", F.col("value"))), 4).alias("max_purchase"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


_D5_SQL = """
SELECT user_id,
       cast(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       cast(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       round(max(CASE WHEN event_type = 'purchase' THEN value END), 4) AS max_purchase,
       round(sum(value), 4) AS total_value
FROM events GROUP BY user_id
"""


def _c1_required_fields_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 — required-fields + type predicate (webhook validation shape)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        F.col("event_id").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("props").isNotNull()
        & (F.col("event_type") == "purchase")
    ).select("event_id", "user_id", "value")


_C1_SQL = """
SELECT event_id, user_id, value FROM events
WHERE event_id IS NOT NULL AND user_id IS NOT NULL AND props IS NOT NULL
  AND event_type = 'purchase'
"""


def _e8_duplicate_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E8 — duplicate detection: (user, type) groups with >1 event."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


_E8_SQL = """
SELECT user_id, event_type, count(*) AS n FROM events
GROUP BY user_id, event_type HAVING count(*) > 1
"""


def _w1_group_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — per-group total on every row (allocation building block)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = windows.group_total(
        li.select("l_orderkey", "l_linenumber", "l_extendedprice"),
        "l_orderkey",
        F.col("l_extendedprice"),
        "order_total",
    )
    return out.select(
        "l_orderkey", "l_linenumber", "l_extendedprice", F.round("order_total", 4).alias("order_total")
    )


_W1_SQL = """
SELECT l_orderkey, l_linenumber, l_extendedprice,
       round(sum(l_extendedprice) OVER (PARTITION BY l_orderkey), 4) AS order_total
FROM lineitem
"""


def _w2_dedup_keeprule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 — keep-rule dedup: earliest event per (user, type)."""
    ev = load_table(spark, sf_dir, "events")
    return windows.dedup_keep_rule(
        ev.select("event_id", "user_id", "event_type", "ts"),
        ["user_id", "event_type"],
        [F.col("ts").asc(), F.col("event_id").asc()],
    )


_W2_SQL = """
SELECT event_id, user_id, event_type, ts FROM (
    SELECT event_id, user_id, event_type, ts,
           row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
    FROM events
) WHERE rn = 1
"""


def _w4_min_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 — min-by: first event id per user (hash agg, no window)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.min_by("event_id", F.struct(F.col("ts"), F.col("event_id"))).alias("first_event_id"),
        F.min("ts").alias("first_ts"),
    )


_W4_SQL = """
SELECT user_id, first_event_id, first_ts FROM (
    SELECT user_id, event_id AS first_event_id,
           min(ts) OVER (PARTITION BY user_id) AS first_ts,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events
) WHERE rn = 1
"""


def _topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group: 3 priciest lineitems per order."""
    li = load_table(spark, sf_dir, "lineitem")
    return windows.top_k_per_group(
        li.select("l_orderkey", "l_linenumber", "l_extendedprice"),
        "l_orderkey",
        [F.col("l_extendedprice").desc(), F.col("l_linenumber").asc()],
        3,
    )


_TOPK_SQL = """
SELECT l_orderkey, l_linenumber, l_extendedprice, cast(rn AS INTEGER) AS rank_in_group FROM (
    SELECT l_orderkey, l_linenumber, l_extendedprice,
           row_number() OVER (PARTITION BY l_orderkey ORDER BY l_extendedprice DESC, l_linenumber) AS rn
    FROM lineitem
) WHERE rn <= 3
"""


def _g1_reconciliation_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return reconcile.reconciliation_summary(spark, sf_dir)


_G1_SQL = """
WITH o AS (SELECT DISTINCT o_orderkey AS id FROM orders),
     l AS (SELECT DISTINCT l_orderkey AS id FROM lineitem),
     c AS (SELECT DISTINCT c_custkey AS id FROM customer),
     oc AS (SELECT DISTINCT o_custkey AS id FROM orders),
     rel1 AS (
        SELECT cast(sum(CASE WHEN l.id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ord_only_a,
               cast(sum(CASE WHEN o.id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ord_only_b,
               cast(sum(CASE WHEN o.id IS NOT NULL AND l.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS ord_common,
               count(*) AS ord_union
        FROM o FULL OUTER JOIN l ON o.id = l.id
     ),
     rel2 AS (
        SELECT cast(sum(CASE WHEN oc.id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS cust_only_a,
               cast(sum(CASE WHEN c.id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS cust_only_b,
               cast(sum(CASE WHEN c.id IS NOT NULL AND oc.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS cust_common,
               count(*) AS cust_union
        FROM c FULL OUTER JOIN oc ON c.id = oc.id
     )
SELECT * FROM rel1 CROSS JOIN rel2
"""


def _g2_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2 — distinct union of two key spaces."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return setops.union_sets(cust, supp)


_G2_SQL = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
"""


def _g3_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 — intersection of two key spaces."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return setops.intersection(cust.distinct(), supp.distinct())


_G3_SQL = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


def _f1_f3_date_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F3 — lenient date reformat (fall-through on failure) + compact ts."""
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    ds = F.when(k % 5 == 0, F.lit("not-a-date")).otherwise(F.date_format("o_orderdate", "dd/MM/yyyy"))
    base = orders.select("o_orderkey", "o_orderdate", ds.alias("data_str"))
    return base.select(
        "o_orderkey",
        "data_str",
        scalar.reformat_date_lenient("data_str").alias("data_iso"),
        scalar.format_compact_ts("o_orderdate").alias("ts_compact"),
        scalar.parse_compact_ts(scalar.format_compact_ts("o_orderdate")).alias("ts_roundtrip"),
    )


_F1_SQL = """
WITH base AS (
    SELECT o_orderkey, o_orderdate,
           CASE WHEN o_orderkey % 5 = 0 THEN 'not-a-date'
                ELSE strftime(o_orderdate, '%d/%m/%Y') END AS data_str
    FROM orders
)
SELECT o_orderkey, data_str,
       coalesce(strftime(try_strptime(data_str, '%d/%m/%Y'), '%Y-%m-%d'), data_str) AS data_iso,
       strftime(o_orderdate, '%Y%m%dT%H%M%S') AS ts_compact,
       try_strptime(strftime(o_orderdate, '%Y%m%dT%H%M%S'), '%Y%m%dT%H%M%S') AS ts_roundtrip
FROM base
"""


def _f5_discount_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 — percent-or-absolute discount parse, clamped, lenient."""
    orders = sales_facts.with_order_discount_str(load_table(spark, sf_dir, "orders"))
    return orders.select(
        "o_orderkey",
        "desconto_str",
        F.round(scalar.parse_discount(F.col("desconto_str"), F.col("o_totalprice")), 4).alias(
            "desconto_valor"
        ),
    )


_F5_SQL = f"""
WITH o AS (SELECT o_orderkey, o_totalprice, {SQL_DESCONTO_STR} AS desconto_str FROM orders)
SELECT o_orderkey, desconto_str,
       round({sql_parse_discount("desconto_str", "o_totalprice")}, 4) AS desconto_valor
FROM o
"""


def _f8_category_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 — ' >> ' category split; secundaria '' when absent."""
    part = sales_facts.with_categoria(load_table(spark, sf_dir, "part"))
    return part.select(
        "p_partkey",
        "categoria",
        scalar.category_principal("categoria").alias("categoria_principal"),
        scalar.category_secundaria("categoria").alias("categoria_secundaria"),
    )


_F8_SQL = """
WITH p AS (
    SELECT p_partkey,
           CASE WHEN p_partkey % 3 <> 0 THEN p_type || ' >> ' || p_brand ELSE p_type END AS categoria
    FROM part
)
SELECT p_partkey, categoria,
       str_split(categoria, ' >> ')[1] AS categoria_principal,
       coalesce(str_split(categoria, ' >> ')[2], '') AS categoria_secundaria
FROM p
"""


def _f9_f10_blob_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9/F10 — filename template build + regex parse roundtrip."""
    orders = load_table(spark, sf_dir, "orders")
    uuid_like = F.md5(F.col("o_orderkey").cast("string"))
    ts = scalar.format_compact_ts("o_orderdate")
    name = F.concat(
        F.lit("z316-tiny-api-"),
        F.col("o_orderkey").cast("string"),
        F.lit("-pdv-"),
        ts,
        F.lit("-"),
        uuid_like,
        F.lit(".json"),
    )
    base = orders.select("o_orderkey", name.alias("blob_name"))
    parsed = scalar.parse_blob_name("blob_name")
    return base.select(
        "o_orderkey",
        "blob_name",
        parsed["dados_id"].alias("dados_id"),
        parsed["data_type"].alias("data_type"),
        parsed["ts"].alias("ts_part"),
        parsed["uuid"].alias("uuid_part"),
    )


_F9_SQL = r"""
WITH base AS (
    SELECT o_orderkey,
           'z316-tiny-api-' || cast(o_orderkey AS VARCHAR) || '-pdv-' ||
           strftime(o_orderdate, '%Y%m%dT%H%M%S') || '-' || md5(cast(o_orderkey AS VARCHAR)) ||
           '.json' AS blob_name
    FROM orders
)
SELECT o_orderkey, blob_name,
       regexp_extract(blob_name, 'z316-tiny-api-(\d+)-(produto|pdv|pesquisa)(?:-(\d+))?-(\d{8}T\d{6})-([a-f0-9-]+)\.json', 1) AS dados_id,
       regexp_extract(blob_name, 'z316-tiny-api-(\d+)-(produto|pdv|pesquisa)(?:-(\d+))?-(\d{8}T\d{6})-([a-f0-9-]+)\.json', 2) AS data_type,
       regexp_extract(blob_name, 'z316-tiny-api-(\d+)-(produto|pdv|pesquisa)(?:-(\d+))?-(\d{8}T\d{6})-([a-f0-9-]+)\.json', 4) AS ts_part,
       regexp_extract(blob_name, 'z316-tiny-api-(\d+)-(produto|pdv|pesquisa)(?:-(\d+))?-(\d{8}T\d{6})-([a-f0-9-]+)\.json', 5) AS uuid_part
FROM base
"""


def _f12_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 — canonical md5 checksum over sorted-field rendering."""
    orders = load_table(spark, sf_dir, "orders")
    canonical = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_orderpriority"),
        F.col("o_orderstatus"),
    )
    return orders.select("o_orderkey", F.md5(canonical).alias("checksum"))


_F12_SQL = """
SELECT o_orderkey,
       md5(cast(o_orderkey AS VARCHAR) || '|' || o_orderpriority || '|' || o_orderstatus) AS checksum
FROM orders
"""


def _f15_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15 — JSON path extraction from the events props payload."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
    )


_F15_SQL = """
SELECT event_id, cast(json_extract_string(props, '$.k') AS BIGINT) AS k_value FROM events
"""


# ---------------------------------------------------------------------------
# North-star training-data operators
# ---------------------------------------------------------------------------


def _dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by md5 of normalized text (min-id keep rule)."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return (
        docs.withColumn("fp", F.md5(norm))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


_DEDUP_EXACT_SQL = r"""
SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
       min(doc_id) AS doc_id, count(*) AS n_copies
FROM documents GROUP BY 1
"""


def _repair_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference checker's full repair loop as one plan — see
    plans/reconcile.py repair_run (detect → keep-rule → B6 anti-join
    delete → independent verify-count). The sink-side twin (snapshot
    version before/after the delete, time travel back to the
    pre-repair state) is exercised in tests/test_enrichment_sinks.py."""
    return reconcile.repair_run(spark, sf_dir)


_REPAIR_RUN_SQL = r"""
WITH t AS (
    SELECT doc_id, source, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
    FROM documents
), r AS (
    SELECT doc_id, source, fp,
           row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
    FROM t
), losers AS (
    SELECT doc_id FROM r WHERE rn > 1
), survivors AS (
    SELECT r.source FROM r ANTI JOIN losers USING (doc_id)
), det AS (
    SELECT source,
           cast(count(*) AS BIGINT) AS n_docs,
           cast(count(DISTINCT CASE WHEN rn > 1 THEN fp END) AS BIGINT) AS n_dup_groups,
           cast(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_losers
    FROM r GROUP BY source
), aft AS (
    SELECT source, cast(count(*) AS BIGINT) AS n_after_delete FROM survivors GROUP BY source
)
SELECT det.source, n_docs, n_dup_groups, n_losers,
       coalesce(n_after_delete, 0) AS n_after_delete,
       CASE WHEN coalesce(n_after_delete, 0) = n_docs - n_losers THEN 1 ELSE 0 END AS verify_ok
FROM det LEFT JOIN aft USING (source)
"""


def _text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text quality metrics: token counts, punct ratio, composite score."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text.char_count("text").alias("n_chars_actual"),
        text.whitespace_token_count("text").cast("long").alias("n_tokens"),
        F.round(text.punct_ratio("text"), 6).alias("punct_ratio"),
        F.round(text.quality_score("text"), 6).alias("quality"),
    )


_TEXT_QUALITY_SQL = r"""
WITH t AS (
    SELECT doc_id, text,
           length(text) AS n_chars_actual,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
           length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS n_punct
    FROM documents
)
SELECT doc_id,
       cast(n_chars_actual AS INTEGER) AS n_chars_actual,
       cast(n_tokens AS BIGINT) AS n_tokens,
       round(CASE WHEN n_chars_actual = 0 THEN 0.0
                  ELSE n_punct / cast(n_chars_actual AS DOUBLE) END, 6) AS punct_ratio,
       round((
           (CASE WHEN n_chars_actual BETWEEN 50 AND 5000 THEN 1.0 ELSE 0.0 END)
         + (CASE WHEN (CASE WHEN n_chars_actual = 0 THEN 0.0
                            ELSE n_punct / cast(n_chars_actual AS DOUBLE) END) < 0.2
                 THEN 1.0 ELSE 0.0 END)
         + (CASE WHEN n_tokens > 0
                      AND n_chars_actual / cast(n_tokens AS DOUBLE) BETWEEN 3.0 AND 12.0
                 THEN 1.0 ELSE 0.0 END)
       ) / 3.0, 6) AS quality
FROM t
"""


def _quality_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality pruning plan: rank every doc inside its
    source by the composite quality score and bucket into quartiles
    (head/middle/tail discipline); keep = not the bottom quartile.
    Deterministic tie-break (quality desc, doc_id asc) keeps ntile
    engine-portable. The per-source sort is the exact eval-scale
    variant; at 100 TB the same plan swaps the window for per-source
    approx_percentile thresholds (one agg + broadcast join, no sort) —
    the keep/drop decision then tolerates the sketch's rank error."""
    docs = load_table(spark, sf_dir, "documents")
    q = docs.select("doc_id", "source", F.round(text.quality_score("text"), 6).alias("quality"))
    w = Window.partitionBy("source").orderBy(F.col("quality").desc(), F.col("doc_id").asc())
    return q.withColumn("qtile", F.ntile(4).over(w)).withColumn(
        "keep", (F.col("qtile") < 4).cast("int")
    )


_QUALITY_PRUNE_SQL = r"""
WITH t AS (
    SELECT doc_id, source,
           length(text) AS n_chars_actual,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
           length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS n_punct
    FROM documents
), q AS (
    SELECT doc_id, source,
           round((
               (CASE WHEN n_chars_actual BETWEEN 50 AND 5000 THEN 1.0 ELSE 0.0 END)
             + (CASE WHEN (CASE WHEN n_chars_actual = 0 THEN 0.0
                                ELSE n_punct / cast(n_chars_actual AS DOUBLE) END) < 0.2
                     THEN 1.0 ELSE 0.0 END)
             + (CASE WHEN n_tokens > 0
                          AND n_chars_actual / cast(n_tokens AS DOUBLE) BETWEEN 3.0 AND 12.0
                     THEN 1.0 ELSE 0.0 END)
           ) / 3.0, 6) AS quality
    FROM t
)
SELECT doc_id, source, quality,
       ntile(4) OVER (PARTITION BY source ORDER BY quality DESC, doc_id ASC) AS qtile,
       CASE WHEN ntile(4) OVER (PARTITION BY source ORDER BY quality DESC, doc_id ASC) < 4
            THEN 1 ELSE 0 END AS keep
FROM q
"""


def _tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fertility eval per language: BPE tokens per
    whitespace word and chars per BPE token under the induced
    3-merge tokenizer (the number that decides whether a tokenizer
    taxes a language — high fertility = more compute per byte of that
    language). Aggregates the bpe_token_count per-doc relation to lang
    grain; the tokenizer itself stays an O(1) broadcast model."""
    # one text scan: the reduced (id, lang, chars, text) relation is
    # checkpointed and feeds BOTH the tokenizer apply and the
    # lang/char metadata join (text would otherwise scan twice)
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "text", F.length("text").alias("__chars"))
        .localCheckpoint(eager=True)  # independent consumers (tokenizer apply + metadata join) race a lazy pin
    )
    per_doc = corpus.bpe_token_count(docs, "text", "doc_id", n_merges=3)
    return (
        per_doc.join(docs.select("doc_id", "lang", "__chars"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("n_words"),
            F.sum("n_bpe_tokens").alias("n_bpe_tokens"),
            F.round(F.sum("n_bpe_tokens") / F.sum("n_words"), 6).alias("fertility"),
            F.round(F.sum("__chars") / F.sum("n_bpe_tokens"), 6).alias("chars_per_bpe"),
        )
    )


def _tokenizer_fertility_sql(n_merges: int = 3) -> str:
    """Fertility oracle: the shared BPE CTE chain -> per-doc counts ->
    lang-grain aggregate (sums cast to BIGINT for the type-sensitive
    driver hash)."""
    return (
        "WITH "
        + _bpe_ctes(n_merges)
        + f""",
tok AS (
  SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS word
  FROM documents
), perdoc AS (
  SELECT tok.doc_id, count(*) AS n_words, sum(len(w{n_merges + 1}.syms)) AS n_bpe_tokens
  FROM tok JOIN w{n_merges + 1} USING (word)
  GROUP BY tok.doc_id
)
SELECT d.lang,
       cast(count(*) AS BIGINT) AS n_docs,
       cast(sum(p.n_words) AS BIGINT) AS n_words,
       cast(sum(p.n_bpe_tokens) AS BIGINT) AS n_bpe_tokens,
       round(sum(p.n_bpe_tokens) / cast(sum(p.n_words) AS DOUBLE), 6) AS fertility,
       round(sum(length(d.text)) / cast(sum(p.n_bpe_tokens) AS DOUBLE), 6) AS chars_per_bpe
FROM perdoc p JOIN documents d USING (doc_id)
GROUP BY d.lang"""
    )


def _token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting (letter runs / digit runs / punct chars)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text.bpe_ish_token_count("text").cast("long").alias("n_bpe_tokens"),
        text.whitespace_token_count("text").cast("long").alias("n_ws_tokens"),
    )


_TOKEN_COUNT_SQL = r"""
SELECT doc_id,
       cast(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_tokens,
       cast(CASE WHEN trim(text) = '' THEN 0
                 ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_ws_tokens
FROM documents
"""


def _lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID by stopword-hit argmax."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", text.language_id("text").alias("lang_pred"))


def _lang_id_sql(select_cols: tuple = ("doc_id",)) -> str:
    """Language-ID oracle CTE. ``select_cols`` are the passthrough
    projection columns carried alongside lang_pred — a parameterized
    template, so dependents (_cohens_kappa_sql) compose it instead of
    string-replacing exact substrings that silently break on reformat."""
    hits = []
    for lang, words in text.STOPWORDS.items():
        arr = "[" + ", ".join(f"'{w}'" for w in words) + "]"
        hits.append(
            f"len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), "
            f"t -> list_contains({arr}, t))) AS hits_{lang}"
        )
    langs = list(text.STOPWORDS)
    greatest = "greatest(" + ", ".join(f"hits_{lang}" for lang in langs) + ")"
    case = "CASE "
    for lang in langs:
        case += f"WHEN hits_{lang} = best AND best > 0 THEN '{lang}' "
    case += "ELSE 'und' END"
    cols = ", ".join(select_cols)
    return f"""
WITH h AS (SELECT {cols}, {', '.join(hits)} FROM documents),
     b AS (SELECT *, {greatest} AS best FROM h)
SELECT {cols}, {case} AS lang_pred FROM b
"""


def _pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over documents; synthetic PII is appended first so
    the masking rules demonstrably fire on every row."""
    docs = load_table(spark, sf_dir, "documents")
    dirty = F.concat(
        F.col("text"),
        F.lit(" contact: user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com cpf 123.456.789-09 tel +55 11 98765-4321"),
    )
    return docs.select(
        "doc_id",
        text.pii_scrub(dirty).alias("clean_text"),
        (F.length(dirty) - F.length(text.pii_scrub(dirty))).alias("n_masked_chars"),
    )


_PII_SCRUB_SQL = r"""
WITH d AS (
  SELECT doc_id,
         text || ' contact: user' || doc_id || '@example.com cpf 123.456.789-09 tel +55 11 98765-4321' AS dirty
  FROM documents
), s AS (
  SELECT doc_id, dirty,
         regexp_replace(
           regexp_replace(
             regexp_replace(dirty, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\d{3}\.\d{3}\.\d{3}-\d{2}', '<CPF>', 'g'),
           '\+?\d[\d()/ .-]{7,}\d', '<PHONE>', 'g') AS clean_text
  FROM d
)
SELECT doc_id, clean_text, length(dirty) - length(clean_text) AS n_masked_chars FROM s
"""


def _curation_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-corpus curation cascade: first failing rule wins —
    too_short → low_quality → lang_unknown → keep. One scan, zero
    shuffles; every rule is a codegen'd column predicate."""
    docs = load_table(spark, sf_dir, "documents")
    quality = text.quality_score("text")
    lang_pred = text.language_id("text")
    decision = (
        F.when(F.length("text") < 50, F.lit("too_short"))
        .when(quality < 0.5, F.lit("low_quality"))
        .when(lang_pred == "und", F.lit("lang_unknown"))
        .otherwise(F.lit("keep"))
    )
    return docs.select(
        "doc_id", "lang", decision.alias("decision"), F.round(quality, 6).alias("quality")
    )


def _curation_sql() -> str:
    hits = []
    for lang, words in text.STOPWORDS.items():
        arr = "[" + ", ".join(f"'{w}'" for w in words) + "]"
        hits.append(
            f"len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), "
            f"t -> list_contains({arr}, t))) AS hits_{lang}"
        )
    best = "greatest(" + ", ".join(f"hits_{lang}" for lang in text.STOPWORDS) + ")"
    return rf"""
WITH t AS (
    SELECT doc_id, lang, text,
           length(text) AS n_chars_a,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
           length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS n_punct,
           {', '.join(hits)}
    FROM documents
), q AS (
    SELECT doc_id, lang, n_chars_a, {best} AS best,
           ((CASE WHEN n_chars_a BETWEEN 50 AND 5000 THEN 1.0 ELSE 0.0 END)
          + (CASE WHEN (CASE WHEN n_chars_a = 0 THEN 0.0
                             ELSE n_punct / cast(n_chars_a AS DOUBLE) END) < 0.2
                  THEN 1.0 ELSE 0.0 END)
          + (CASE WHEN n_tokens > 0
                       AND n_chars_a / cast(n_tokens AS DOUBLE) BETWEEN 3.0 AND 12.0
                  THEN 1.0 ELSE 0.0 END)) / 3.0 AS quality
    FROM t
)
SELECT doc_id, lang,
       CASE WHEN n_chars_a < 50 THEN 'too_short'
            WHEN quality < 0.5 THEN 'low_quality'
            WHEN best = 0 THEN 'lang_unknown'
            ELSE 'keep' END AS decision,
       round(quality, 6) AS quality
FROM q
"""


def _embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding vectors, fully declarative:
    posexplode → (label, pos) aggregate. This is the k-means/IVF
    building block; the position-grain aggregate shuffles (label, pos)
    pairs — dim× more rows than vectors but each tiny, and partial
    aggregation collapses them map-side. Output stays at the scalar
    (label, pos, v) grain — array reassembly is a presentation step
    (r3 lesson: the driver's canonicalizer cannot hash array columns),
    and downstream consumers (kmeans_refine, semantic_dedup) join on
    the exploded grain anyway."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode(F.col("embedding").cast("array<double>")))
        .groupBy("label", "pos")
        .agg(F.round(F.avg("col"), 6).alias("v"), F.count(F.lit(1)).alias("n_vectors"))
    )


_EMBEDDING_CENTROIDS_SQL = """
WITH e AS (
  SELECT label, u.i - 1 AS pos, u.v
  FROM embeddings,
       LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i,
                       unnest(embedding::DOUBLE[]) AS v) u
)
SELECT label, cast(pos AS INTEGER) AS pos, round(avg(v), 6) AS v,
       cast(count(*) AS BIGINT) AS n_vectors
FROM e GROUP BY label, pos
"""


def _dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS (not just pairs): connected components over the
    word-Jaccard pair graph by iterative min-label propagation. The
    oracle replays the closure with a recursive CTE. Since r4 the
    assignment is the MAINTAINED at-rest relation (plans/pair_graph.py
    cluster_labels: snapshot-sink v=1 → incremental CC over the
    arriving batch → v=2), so this query — and cluster_representative,
    leakage_safe_split, dup_rate_by_source — is a pure parquet scan of
    the _LATEST snapshot, not a per-query CC rerun."""
    return pair_graph.cluster_labels(spark, sf_dir, threshold=0.5, shingle_k=1)


_DUP_CLUSTERS_SQL = r"""
WITH RECURSIVE t AS (
    SELECT source, doc_id,
           list_distinct(string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS toks
    FROM documents
), p AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.toks, b.toks)) /
          cast(len(list_distinct(a.toks || b.toks)) AS DOUBLE) >= 0.5
), e AS (
    SELECT id_a AS src, id_b AS dst FROM p
    UNION
    SELECT id_b AS src, id_a AS dst FROM p
), reach(src, dst) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src
)
SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src
"""


def _dup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size distribution of the maintained near-dup assignment
    — the observability rollup a corpus owner tracks per snapshot
    (a fattening tail means a crawler started mirroring something).
    Reads the at-rest cluster_labels relation; two hash aggregates to
    the O(distinct sizes) histogram."""
    cc = pair_graph.cluster_labels(spark, sf_dir, threshold=0.5, shingle_k=1)
    sizes = cc.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        sizes.groupBy("cluster_size")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            (F.count(F.lit(1)) * F.first("cluster_size")).alias("n_docs"),
        )
    )


_DUP_CLUSTER_STATS_SQL = r"""
WITH RECURSIVE t AS (
    SELECT source, doc_id,
           list_distinct(string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS toks
    FROM documents
), p AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.toks, b.toks)) /
          cast(len(list_distinct(a.toks || b.toks)) AS DOUBLE) >= 0.5
), e AS (
    SELECT id_a AS src, id_b AS dst FROM p
    UNION
    SELECT id_b AS src, id_a AS dst FROM p
), reach(src, dst) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src
), cc AS (
    SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src
), sizes AS (
    SELECT cluster_id, cast(count(*) AS BIGINT) AS cluster_size FROM cc GROUP BY cluster_id
)
SELECT cluster_size,
       cast(count(*) AS BIGINT) AS n_clusters,
       cast(count(*) * cluster_size AS BIGINT) AS n_docs
FROM sizes GROUP BY cluster_size
"""


def _span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document span duplication (operators/dedup.py span_dedup):
    per doc, the fraction of its 8-token windows that occur in ≥1
    other document — the hash-windowed stand-in for suffix-array
    substring dedup; catches a copied paragraph inside an
    otherwise-unique page that doc-level near-dup misses. Portable
    rolling hash, so the oracle replays every window hash."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.span_dedup(docs, "text", "doc_id", k=8)


_SPAN_DEDUP_SQL = """
WITH base AS (
  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
  FROM documents
),
w AS (
  SELECT doc_id, [
      list_reduce(list_prepend(CAST(0 AS BIGINT),
          [CAST(ascii(c) AS BIGINT) FOR c IN regexp_split_to_array(array_to_string(toks[i:i+7], ' '), '')]),
        (acc, c) -> (acc * 31 + c) % 2147483647)
      FOR i IN generate_series(1, len(toks) - 7)] AS hs
  FROM base WHERE len(toks) >= 8
),
r AS (SELECT doc_id, unnest(hs) AS h FROM w),
f AS (SELECT h, 1 AS dup FROM r GROUP BY h HAVING count(DISTINCT doc_id) >= 2)
SELECT r.doc_id,
       cast(count(*) AS BIGINT) AS n_windows,
       cast(sum(CASE WHEN f.dup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
       round(sum(CASE WHEN f.dup IS NOT NULL THEN 1 ELSE 0 END) / cast(count(*) AS DOUBLE), 6)
           AS dup_span_frac
FROM r LEFT JOIN f ON r.h = f.h
GROUP BY r.doc_id
"""


def _span_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level member of the incremental-dedup family: new-batch
    docs (doc_id % 5 == 0) probe the AT-REST distinct window-hash
    index (plans/pair_graph.py span_corpus_index) — a copied paragraph
    from the existing corpus is caught without re-hashing the corpus;
    only the batch's (id, hash) rows shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    new_docs = docs.filter(F.col("doc_id") % 5 == 0)
    idx = pair_graph.span_corpus_index(spark, sf_dir, exclude_mod=5, k=8)
    return dedup.span_dedup_incremental(new_docs, idx, "text", "doc_id", k=8)


_SPAN_INCREMENTAL_SQL = """
WITH base AS (
  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
  FROM documents
),
w AS (
  SELECT doc_id, [
      list_reduce(list_prepend(CAST(0 AS BIGINT),
          [CAST(ascii(c) AS BIGINT) FOR c IN regexp_split_to_array(array_to_string(toks[i:i+7], ' '), '')]),
        (acc, c) -> (acc * 31 + c) % 2147483647)
      FOR i IN generate_series(1, len(toks) - 7)] AS hs
  FROM base WHERE len(toks) >= 8
),
r AS (SELECT doc_id, unnest(hs) AS h FROM w),
c AS (SELECT DISTINCT h FROM r WHERE doc_id % 5 <> 0),
n AS (SELECT doc_id, r.h, CASE WHEN c.h IS NOT NULL THEN 1 ELSE 0 END AS dup
      FROM r LEFT JOIN c USING (h) WHERE doc_id % 5 = 0)
SELECT doc_id,
       cast(count(*) AS BIGINT) AS n_windows,
       cast(sum(dup) AS BIGINT) AS n_dup_windows,
       round(sum(dup) / cast(count(*) AS DOUBLE), 6) AS dup_span_frac
FROM n GROUP BY doc_id
"""


def _embedding_top_pc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding table by 3 fixed power
    iterations (similarity.power_iteration_top_pc) — dominant-direction
    extraction for embedding whitening. Round-6 at every stage +
    deterministic all-ones start make the schedule bit-portable; the
    oracle replays it as an unrolled CTE chain."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.power_iteration_top_pc(emb, "embedding", "vec_id", n_iters=3)


def _top_pc_sql(n_iters: int = 3) -> str:
    """Unrolled power-iteration oracle mirroring the Spark schedule."""
    ctes = [
        """ex AS (
    SELECT vec_id, u.pos, u.x
    FROM embeddings,
         LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS pos,
                         unnest(embedding::DOUBLE[]) AS x) u
), m AS (
    SELECT pos, round(avg(x), 6) AS mu FROM ex GROUP BY pos
), cen AS (
    SELECT ex.vec_id, ex.pos, ex.x - m.mu AS xc FROM ex JOIN m USING (pos)
), cov AS (
    SELECT a.pos AS p, b.pos AS q, round(sum(a.xc * b.xc), 6) AS c
    FROM cen a JOIN cen b ON a.vec_id = b.vec_id
    GROUP BY 1, 2
), v0 AS (
    SELECT pos AS q, 1.0 AS v FROM m
)"""
    ]
    for i in range(1, n_iters + 1):
        ctes.append(
            f"""w{i} AS (
    SELECT cov.p, round(sum(cov.c * v{i - 1}.v), 6) AS w
    FROM cov JOIN v{i - 1} ON cov.q = v{i - 1}.q
    GROUP BY cov.p
), n{i} AS (
    SELECT sqrt(sum(w * w)) AS n FROM w{i}
), v{i} AS (
    SELECT p AS q, round(w / n, 6) AS v FROM w{i}, n{i}
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT cast(q - 1 AS INTEGER) AS pos, v AS loading FROM v{n_iters}"
    )


def _embedding_whiten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-component removal (the APPLY half of embedding_top_pc,
    à la all-but-the-top postprocessing): project the dominant
    direction out of every embedding and report the projection and
    norm before/after — the whitening step that improves cosine
    contrast before similarity search. The d-row loading vector is a
    broadcast model table; one exploded join + per-vector aggregates."""
    emb = load_table(spark, sf_dir, "embeddings")
    pc = similarity.power_iteration_top_pc(emb, "embedding", "vec_id", n_iters=3)
    ex = emb.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x")
    )
    return (
        ex.join(F.broadcast(pc), "pos")
        .groupBy("vec_id")
        .agg(
            F.round(F.sum(F.col("x") * F.col("loading")), 6).alias("proj"),
            F.round(F.sqrt(F.sum(F.col("x") * F.col("x"))), 6).alias("norm_before"),
            # greatest(0, ·): for a vector (near-)collinear with the PC the
            # round-6 projection can exceed the true norm — clamp so Spark
            # and the oracle agree (0) instead of NaN-vs-error (ADVICE r3)
            F.round(
                F.sqrt(
                    F.greatest(
                        F.lit(0.0),
                        F.sum(F.col("x") * F.col("x"))
                        - F.pow(F.round(F.sum(F.col("x") * F.col("loading")), 6), F.lit(2.0)),
                    )
                ),
                6,
            ).alias("norm_after"),
        )
    )


def _embedding_whiten_sql() -> str:
    """Apply oracle: the unrolled power-iteration chain + per-vector
    projection/norm arithmetic (norm_after via Pythagoras on the
    ROUNDED projection, mirroring the Spark expression exactly)."""
    chain = _top_pc_sql(3)
    # reuse the WITH chain, swap the final SELECT for the apply step
    with_body = chain.rsplit("\nSELECT", 1)[0]
    return (
        with_body
        + """,
pc AS (
    SELECT q - 1 AS pos, v AS loading FROM v3
), exx AS (
    SELECT vec_id, u.pos - 1 AS pos, u.x
    FROM embeddings,
         LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS pos,
                         unnest(embedding::DOUBLE[]) AS x) u
)
SELECT exx.vec_id,
       round(sum(exx.x * pc.loading), 6) AS proj,
       round(sqrt(sum(exx.x * exx.x)), 6) AS norm_before,
       round(sqrt(greatest(0, sum(exx.x * exx.x) - pow(round(sum(exx.x * pc.loading), 6), 2))), 6)
           AS norm_after
FROM exx JOIN pc USING (pos)
GROUP BY exx.vec_id"""
    )


def _dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication scorecard from the shared at-rest pair
    graph: how many docs participate in ≥1 near-dup pair, and the
    share — the number a corpus owner watches per ingest source (a
    crawler gone wrong shows up here first). A doc participates in a
    pair iff its maintained cluster has ≥2 members (edges exist only
    inside clusters), so this consumes the at-rest cluster_labels
    relation — |docs| rows, cheaper than exploding the pair list whose
    size can be quadratic in cluster width."""
    docs = load_table(spark, sf_dir, "documents")
    cc = pair_graph.cluster_labels(spark, sf_dir, threshold=0.5, shingle_k=1)
    sizes = cc.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("__n"))
    dup_ids = (
        cc.join(sizes.filter(F.col("__n") >= 2), "cluster_id")
        .select("doc_id")
        .withColumn("__dup", F.lit(1))
    )
    return (
        docs.select("doc_id", "source")
        .join(dup_ids, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce("__dup", F.lit(0))).alias("n_dup_docs"),
            F.round(F.sum(F.coalesce("__dup", F.lit(0))) / F.count(F.lit(1)), 6).alias(
                "dup_rate"
            ),
        )
    )


_DUP_RATE_SQL = r"""
WITH t AS (
    SELECT source, doc_id,
           list_distinct(string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS toks
    FROM documents
), p AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.toks, b.toks)) /
          cast(len(list_distinct(a.toks || b.toks)) AS DOUBLE) >= 0.5
), d AS (
    SELECT DISTINCT doc_id FROM (
        SELECT id_a AS doc_id FROM p UNION ALL SELECT id_b FROM p)
)
SELECT s.source,
       cast(count(*) AS BIGINT) AS n_docs,
       cast(sum(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
       round(sum(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END) /
             cast(count(*) AS DOUBLE), 6) AS dup_rate
FROM documents s LEFT JOIN d ON s.doc_id = d.doc_id
GROUP BY s.source
"""


def _cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users cohorted by the ISO week
    of their FIRST event; for each (cohort_week, weeks_since) cell,
    the share of the cohort active that week — the BI table behind
    every retention curve (retention_daily is its day-over-day
    special case). The user→cohort relation is reduced once and
    materialized (it feeds both the activity join and cohort sizes);
    weeks_since is exact integer arithmetic (both weeks are
    Monday-truncated, so the day difference is always a multiple
    of 7)."""
    ev = load_table(spark, sf_dir, "events")
    cohort = (
        ev.groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week"))
        .persist()  # user-grain; activity join + cohort sizes (lazy pin)
    )
    sizes = cohort.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("cohort_size"))
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    ).distinct()
    cells = (
        active.join(cohort, "user_id")
        .withColumn(
            "weeks_since", (F.datediff(F.col("week"), F.col("cohort_week")) / 7).cast("int")
        )
        .groupBy("cohort_week", "weeks_since")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return cells.join(sizes, "cohort_week").select(
        "cohort_week",
        "weeks_since",
        "n_active",
        "cohort_size",
        F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention"),
    )


_COHORT_RETENTION_SQL = """
WITH cohort AS (
  SELECT user_id, cast(date_trunc('week', min(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
), sizes AS (
  SELECT cohort_week, cast(count(*) AS BIGINT) AS cohort_size FROM cohort GROUP BY cohort_week
), active AS (
  SELECT DISTINCT user_id, cast(date_trunc('week', ts) AS DATE) AS week FROM events
), cells AS (
  SELECT c.cohort_week,
         cast(date_diff('day', c.cohort_week, a.week) / 7 AS INTEGER) AS weeks_since,
         cast(count(*) AS BIGINT) AS n_active
  FROM active a JOIN cohort c ON a.user_id = c.user_id
  GROUP BY 1, 2
)
SELECT cells.cohort_week, cells.weeks_since, cells.n_active, sizes.cohort_size,
       round(cells.n_active / cast(sizes.cohort_size AS DOUBLE), 6) AS retention
FROM cells JOIN sizes USING (cohort_week)
"""


def _conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per user, seconds from FIRST view
    to the first purchase after it; one summary row with converted
    count and exact interpolated p50/p90 — the latency companion to
    funnel_conversion (which only counts). Two min-aggregates to user
    grain, a conditional min for the post-view purchase, then a 1-row
    percentile aggregate over the (users-sized) latency relation."""
    ev = load_table(spark, sf_dir, "events")
    per = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        )
        .join(ev.select("user_id", "event_type", "ts"), "user_id")
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("first_view").isNotNull()
            & (F.col("ts") > F.col("first_view"))
        )
        .groupBy("user_id", "first_view")
        .agg(F.min("ts").alias("first_purchase"))
        # microsecond-exact integer latency: casting each timestamp to
        # whole seconds first truncates differently from DuckDB's
        # fractional epoch arithmetic (half-second off at the median)
        .withColumn(
            "latency_us",
            F.unix_micros("first_purchase") - F.unix_micros("first_view"),
        )
    )
    # Exact interpolated percentiles as an INTEGER grain (r11 lint):
    # percentile()/quantile_cont() interpolate in floats with
    # engine-specific op order, and the former round-4 could land on
    # .5 (HALF_UP vs half-even). At q in {0.5, 0.9} the interpolation
    # position (n-1)*q falls on TENTHS, so value*10 =
    # a*(10-f) + b*f over the two order statistics a, b is an exact
    # integer both engines agree on; ONE shared division scales to
    # seconds. The rank is two-phase (no single-task global sort) and
    # n arrives free as the last cumulative offset.
    ranked, n = windows.two_phase_row_number(
        per, [F.col("latency_us").asc(), F.col("user_id").asc()], "rn"
    )
    if n == 0:
        return spark.createDataFrame(
            [], "n_converted long, p50_latency_s double, p90_latency_s double"
        ).agg(
            F.count(F.lit(1)).alias("n_converted"),
            F.first("p50_latency_s").alias("p50_latency_s"),
            F.first("p90_latency_s").alias("p90_latency_s"),
        )
    picks = {}
    for label, num in (("50", 5), ("90", 9)):
        k = num * (n - 1)
        picks[label] = (k // 10 + 1, k // 10 + 2, k % 10)
    val = F.col("latency_us")
    aggs = [F.count(F.lit(1)).alias("n_converted")]
    for label, (lo, hi, _f) in picks.items():
        aggs.append(
            F.coalesce(F.sum(F.when(F.col("rn") == lo, val)), F.lit(0)).alias(f"__a{label}")
        )
        aggs.append(
            F.coalesce(F.sum(F.when(F.col("rn") == hi, val)), F.lit(0)).alias(f"__b{label}")
        )
    out = ranked.agg(*aggs)
    cols = [F.col("n_converted")]
    for label, (_lo, _hi, f) in picks.items():
        x10 = F.col(f"__a{label}") * F.lit(10 - f) + F.col(f"__b{label}") * F.lit(f)
        cols.append((x10.cast("double") / F.lit(1e7)).alias(f"p{label}_latency_s"))
    return out.select(*cols)


_CONVERSION_LATENCY_SQL = """
WITH fv AS (
  SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS first_view
  FROM events GROUP BY user_id
), conv AS (
  SELECT e.user_id, fv.first_view, min(e.ts) AS first_purchase
  FROM events e JOIN fv ON e.user_id = fv.user_id
  WHERE e.event_type = 'purchase' AND fv.first_view IS NOT NULL AND e.ts > fv.first_view
  GROUP BY e.user_id, fv.first_view
), lat AS (
  SELECT epoch_us(first_purchase) - epoch_us(first_view) AS latency_us FROM conv
), ranked AS (
  SELECT latency_us, row_number() OVER (ORDER BY latency_us) AS rn FROM lat
), nn AS (
  SELECT cast(count(*) AS BIGINT) AS n FROM lat
)
-- exact integer interpolation: at q in tenths, value*10 = a*(10-f) + b*f
SELECT cast(count(*) AS BIGINT) AS n_converted,
       CAST(cast(coalesce(sum(CASE WHEN rn = 5 * (n - 1) // 10 + 1 THEN latency_us END), 0) * (10 - 5 * (n - 1) % 10)
          + coalesce(sum(CASE WHEN rn = 5 * (n - 1) // 10 + 2 THEN latency_us END), 0) * (5 * (n - 1) % 10) AS BIGINT) AS DOUBLE) / 1e7 AS p50_latency_s,
       CAST(cast(coalesce(sum(CASE WHEN rn = 9 * (n - 1) // 10 + 1 THEN latency_us END), 0) * (10 - 9 * (n - 1) % 10)
          + coalesce(sum(CASE WHEN rn = 9 * (n - 1) // 10 + 2 THEN latency_us END), 0) * (9 * (n - 1) % 10) AS BIGINT) AS DOUBLE) / 1e7 AS p90_latency_s
FROM ranked CROSS JOIN nn
GROUP BY n
"""


def _pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC product classification: parts ranked by revenue,
    cumulative revenue share, class A ≤ 0.80 < B ≤ 0.95 < C — the
    80/20 inventory analysis every sales star schema serves. One hash
    aggregate reduces the fact to part grain; the cumulative share is
    then a TWO-PHASE prefix sum (windows.two_phase_running_sum:
    range-partition on the sort key, partition-local window, broadcast
    per-partition offsets — the zipWithIndex shape), so no task ever
    sorts the whole part dimension: the r4 verdict's unpartitioned
    global WindowExec is gone while the integer sums stay bit-exact
    (integer addition is associative, so re-associating across range
    partitions cannot change a single cent).
    Revenue is INTEGER-SCALED before summing (price cents × discount
    percent — both 2dp in the data, so the per-row scale is exact):
    the sums are order-independent integers and the cumulative share
    is bit-identical across engines — round-2 float sums flip the
    last cent with accumulation order (measured)."""
    li = load_table(spark, sf_dir, "lineitem")
    scaled = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
    )
    rev = li.groupBy("l_partkey").agg(F.sum(scaled).alias("__rs"))
    cum, total = windows.two_phase_running_sum(
        rev, [F.col("__rs").desc(), F.col("l_partkey").asc()], "__rs", "__cum"
    )
    return (
        cum.withColumn("cum_share", F.round(F.col("__cum") / F.lit(total), 6))
        .withColumn(
            "abc_class",
            F.when(F.col("cum_share") <= 0.80, "A")
            .when(F.col("cum_share") <= 0.95, "B")
            .otherwise("C"),
        )
        .select(
            "l_partkey",
            # no presentation round: rs/1e4 of identical integers is the
            # identical double in both engines, while round-half-up vs
            # half-even would flip x.xx5 cents (measured)
            (F.col("__rs") / 10000.0).alias("revenue"),
            "cum_share",
            "abc_class",
        )
    )


_PARETO_ABC_SQL = """
WITH rev AS (
    SELECT l_partkey,
           cast(sum(cast(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - cast(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS rs
    FROM lineitem GROUP BY l_partkey
), t AS (SELECT cast(sum(rs) AS BIGINT) AS t FROM rev),
c AS (
    SELECT l_partkey, rs,
           round(cast(sum(rs) OVER (ORDER BY rs DESC, l_partkey) AS DOUBLE) / t.t, 6) AS cum_share
    FROM rev, t
)
SELECT l_partkey,
       rs / 10000.0 AS revenue,
       cum_share,
       CASE WHEN cum_share <= 0.80 THEN 'A'
            WHEN cum_share <= 0.95 THEN 'B'
            ELSE 'C' END AS abc_class
FROM c
"""


def _rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary
    quartiles) — the canonical BI deliverable of a sales star schema
    like the reference's. One hash aggregate to customer grain, then
    three quartile assignments over the REDUCED relation (never the
    fact table), each with a deterministic (metric, customer) tie-break
    so quartile boundaries are engine-portable. Each quartile is
    ntile(4) RECONSTRUCTED from a two-phase global rank
    (windows.two_phase_row_number + ntile_from_rank): range-partition
    on the metric, partition-local row_number, broadcast offsets —
    bit-identical to the global-window ntile (pinned in
    test_scale_recipes) with no single-task sort of the customer
    dimension, the r4 verdict's unpartitioned-WindowExec fix. The
    scale trade documented for quality_prune (approx_percentile
    thresholds, sketch rank error) is no longer needed: the exact
    quartiles themselves are now shuffle-parallel."""
    orders = load_table(spark, sf_dir, "orders")
    per = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("o_totalprice"), 2).alias("monetary"),
        )
        .persist()  # customer-grain; three rank passes (lazy pin)
    )
    ranked, n = windows.two_phase_row_number(
        per, [F.col("last_order").desc(), F.col("o_custkey").asc()], "__rr"
    )
    ranked, _ = windows.two_phase_row_number(
        ranked, [F.col("frequency").desc(), F.col("o_custkey").asc()], "__rf"
    )
    ranked, _ = windows.two_phase_row_number(
        ranked, [F.col("monetary").desc(), F.col("o_custkey").asc()], "__rm"
    )
    return ranked.select(
        "o_custkey",
        "last_order",
        "frequency",
        "monetary",
        windows.ntile_from_rank(F.col("__rr"), 4, n).alias("r_quartile"),
        windows.ntile_from_rank(F.col("__rf"), 4, n).alias("f_quartile"),
        windows.ntile_from_rank(F.col("__rm"), 4, n).alias("m_quartile"),
    ).withColumn(
        "segment",
        F.concat(
            F.col("r_quartile").cast("string"),
            F.col("f_quartile").cast("string"),
            F.col("m_quartile").cast("string"),
        ),
    )


_RFM_SQL = """
WITH per AS (
  SELECT o_custkey,
         max(o_orderdate) AS last_order,
         cast(count(*) AS BIGINT) AS frequency,
         round(sum(o_totalprice), 2) AS monetary
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey, last_order, frequency, monetary,
       cast(ntile(4) OVER (ORDER BY last_order DESC, o_custkey) AS INTEGER) AS r_quartile,
       cast(ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS INTEGER) AS f_quartile,
       cast(ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS INTEGER) AS m_quartile,
       cast(ntile(4) OVER (ORDER BY last_order DESC, o_custkey) AS VARCHAR)
       || cast(ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS VARCHAR)
       || cast(ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS VARCHAR) AS segment
FROM per
"""


def _decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift table — customers ranked by lifetime revenue into
    10 equal buckets, with each decile's share of total revenue: the
    'top 10% of customers drive X% of revenue' concentration readout
    that pairs with pareto_abc's part-side view. Second consumer of
    the two-phase global ordering (windows.two_phase_row_number +
    ntile_from_rank): the customer dimension is never sorted in one
    task. Revenue is integer cents (o_totalprice is 2dp, the per-row
    scale is exact), so sums are order-independent bigints and the
    share division of two exact integers is the identical double in
    both engines."""
    orders = load_table(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("__cents")
    )
    ranked, n = windows.two_phase_row_number(
        per, [F.col("__cents").desc(), F.col("o_custkey").asc()], "__r"
    )
    tot = per.agg(F.sum("__cents").alias("__t"))
    return (
        ranked.withColumn("decile", windows.ntile_from_rank(F.col("__r"), 10, n))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("__cents").alias("revenue_cents"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_customers",
            "revenue_cents",
            F.round(F.col("revenue_cents") / F.col("__t"), 6).alias("revenue_share"),
        )
    )


_DECILE_LIFT_SQL = """
WITH per AS (
  SELECT o_custkey,
         cast(sum(cast(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
), d AS (
  SELECT o_custkey, cents,
         cast(ntile(10) OVER (ORDER BY cents DESC, o_custkey) AS INTEGER) AS decile
  FROM per
), t AS (SELECT cast(sum(cents) AS BIGINT) AS tot FROM per)
SELECT decile,
       cast(count(*) AS BIGINT) AS n_customers,
       cast(sum(cents) AS BIGINT) AS revenue_cents,
       round(cast(sum(cents) AS DOUBLE) / t.tot, 6) AS revenue_share
FROM d, t GROUP BY decile, t.tot
"""


def _minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator calibration audit — the eval-family sibling
    of ann_recall_eval, for the dedup index: for EVERY banded candidate
    pair (no threshold filter), the number of agreeing signature
    components (the LSH estimate of Jaccard, E[n_agree/16] = J) binned
    against the exact shingle-set overlap. The output is the ≤17-row
    table an operator reads to decide whether 16 hashes / 8 bands is
    calibrated for the corpus before trusting the S-curve planner
    (minhash_scurve gives theory; this measures it on the data).
    All outputs are EXACT integers (pair counts, summed intersection /
    union sizes) — consumers divide; no float accumulation crosses the
    engine boundary. Signatures derive from the at-rest full-corpus
    shingle table — text is never re-hashed. Scale shape: candidates
    come from the band-bucket self-join (keys-only shuffle), exact
    overlap is the same double-join used by every verified-Jaccard
    path; grouping to 17 rows is a map-side-combinable hash agg."""
    ex = pair_graph.full_shingle_table(spark, sf_dir, shingle_k=3, portable=True)
    n_hashes, n_bands = 16, 8
    aggs = [
        F.min(dedup._perm(F.col("__hp"), i)).alias(f"__m{i}") for i in range(n_hashes)
    ]
    sig = (
        ex.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("__nsh"), *aggs)
        .select(
            "doc_id",
            "__nsh",
            F.array(*[f"__m{i}" for i in range(n_hashes)]).alias("minhash"),
        )
        .localCheckpoint(eager=True)  # signatures feed two joins below
    )
    bands = dedup.lsh_bands(sig, n_bands, n_hashes // n_bands).select(
        "doc_id", "band_id", "band_hash"
    )
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band_id", "band_hash"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    sa = sig.select(
        F.col("doc_id").alias("id_a"),
        F.col("__nsh").alias("__na"),
        F.col("minhash").alias("__ma"),
    )
    sb = sig.select(
        F.col("doc_id").alias("id_b"),
        F.col("__nsh").alias("__nb"),
        F.col("minhash").alias("__mb"),
    )
    agree = F.aggregate(
        F.zip_with("__ma", "__mb", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    ea = ex.select(F.col("doc_id").alias("id_a"), "__h")
    eb = ex.select(F.col("doc_id").alias("id_b"), "__h")
    inter = (
        cand.join(ea, "id_a")
        .join(eb, ["id_b", "__h"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__ninter"))
    )
    return (
        cand.join(inter, ["id_a", "id_b"], "left")
        .na.fill({"__ninter": 0})
        .join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("n_agree", agree.cast("int"))
        .groupBy("n_agree")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("__ninter").alias("sum_inter"),
            F.sum(F.col("__na") + F.col("__nb") - F.col("__ninter")).alias("sum_union"),
        )
    )


_MINHASH_CALIBRATION_SQL = """
WITH base AS (
  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id, list_distinct([
      list_reduce(list_prepend(CAST(0 AS BIGINT),
          [CAST(ascii(c) AS BIGINT) FOR c IN regexp_split_to_array(array_to_string(toks[i:i+2], ' '), '')]),
        (acc, c) -> (acc * 31 + c) % 2147483647)
      FOR i IN generate_series(1, len(toks) - 2)]) AS hs
  FROM base WHERE len(toks) >= 3
),
sig AS (
  SELECT doc_id, hs, len(hs) AS nsh,
    [list_min([(h * ((2654435761 * (i + 1)) % 2147483647) + (40503 * i + 1) % 2147483647) % 2147483647
               FOR h IN hs])
     FOR i IN generate_series(0, 15)] AS mh
  FROM sh
),
bands AS (
  SELECT doc_id, u.b AS band_id, mh[2*u.b + 1] AS m1, mh[2*u.b + 2] AS m2
  FROM sig, unnest(generate_series(0, 7)) AS u(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.m1 = b.m1 AND a.m2 = b.m2
  WHERE a.doc_id < b.doc_id
),
pairs AS (
  SELECT c.id_a, c.id_b,
         list_sum([CASE WHEN sa.mh[i+1] = sb.mh[i+1] THEN 1 ELSE 0 END
                   FOR i IN generate_series(0, 15)]) AS n_agree,
         len(list_intersect(sa.hs, sb.hs)) AS inter,
         sa.nsh + sb.nsh - len(list_intersect(sa.hs, sb.hs)) AS un
  FROM cand c JOIN sig sa ON c.id_a = sa.doc_id JOIN sig sb ON c.id_b = sb.doc_id
)
SELECT cast(n_agree AS INTEGER) AS n_agree,
       cast(count(*) AS BIGINT) AS n_pairs,
       cast(sum(inter) AS BIGINT) AS sum_inter,
       cast(sum(un) AS BIGINT) AS sum_union
FROM pairs GROUP BY n_agree
"""


def _pack_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-grain pack manifest (operators/corpus.py
    pack_assignments): the dataloader-facing detail of sequence_pack —
    same deterministic window, projected at chunk grain with pack id
    and intra-pack offset; aggregating it reproduces sequence_pack
    exactly (pinned by test)."""
    docs = load_table(spark, sf_dir, "documents")
    split_docs = corpus.dataset_split(docs, "doc_id")
    chunks = corpus.chunk_documents(
        split_docs, "text", "doc_id", chunk_tokens=32, stride=24, carry_cols=("split",)
    )
    return corpus.pack_assignments(
        chunks, "split", "doc_id", "chunk_idx", "n_tokens", budget=256, n_shards=4
    )


_PACK_ASSIGNMENTS_SQL = r"""
WITH t AS (
    SELECT doc_id,
           CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 80 THEN 'train'
                WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 90 THEN 'val'
                ELSE 'test' END AS split,
           ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 4 AS shard,
           string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
    FROM documents
), n AS (
    SELECT doc_id, split, shard, toks,
           1 + CAST(floor((greatest(len(toks) - 32, 0) + 23) / 24.0) AS INT) AS n_chunks
    FROM t
), ch AS (
    SELECT doc_id, split, shard, u.c AS chunk_idx,
           len(toks[u.c * 24 + 1 : u.c * 24 + 32]) AS n_tokens
    FROM n, unnest(generate_series(0, n_chunks - 1)) AS u(c)
), s AS (
    SELECT split, shard, doc_id, chunk_idx, n_tokens,
           sum(n_tokens) OVER (
               PARTITION BY split, shard
               ORDER BY doc_id, chunk_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) - n_tokens AS start
    FROM ch
)
SELECT split, shard, doc_id, cast(chunk_idx AS INTEGER) AS chunk_idx,
       cast(n_tokens AS BIGINT) AS n_tokens,
       CAST(floor(start / 256.0) AS BIGINT) AS pack_id,
       cast(start - CAST(floor(start / 256.0) AS BIGINT) * 256 AS BIGINT) AS offset_in_pack
FROM s
"""


def _basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top-20 part pairs bought in the
    same order, with support (the retail analytics the reference's
    sales schema exists to feed). The self-join is ORDER-LOCAL —
    shuffle on l_orderkey, cost Σ|order|² bounded by basket size
    (~7 items), never |parts|²; top-k compiles to
    TakeOrderedAndProject. Deterministic tie-break (n desc, part_a,
    part_b)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), F.col("part_a").asc(), F.col("part_b").asc())
        .limit(20)
    )


_BASKET_PAIRS_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       cast(count(*) AS BIGINT) AS n_orders
FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n_orders DESC, part_a, part_b
LIMIT 20
"""


def _lang_id_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier eval for the lang-ID heuristic: confusion matrix of
    the predicted language against the labeled ``lang`` column, with
    per-(label, prediction) counts and the label-conditional rate —
    the audit you run before trusting a heuristic filter to curate a
    100 TB multilingual corpus (the same prove-the-approximation
    discipline as minhash_eval / dedup_agreement). One scan + one hash
    aggregate; the reduced confusion relation is materialized once."""
    docs = load_table(spark, sf_dir, "documents")
    pred = docs.select("lang", text.language_id("text").alias("lang_pred"))
    conf = (
        pred.groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()  # confusion-grain; totals + rate join (lazy pin)
    )
    tot = conf.groupBy("lang").agg(F.sum("n").alias("__t"))
    return conf.join(tot, "lang").select(
        "lang", "lang_pred", "n", F.round(F.col("n") / F.col("__t"), 6).alias("rate")
    )


def _lang_id_eval_sql() -> str:
    """Confusion-matrix oracle reusing the lang-ID prediction logic."""
    hits = []
    for lang, words in text.STOPWORDS.items():
        arr = "[" + ", ".join(f"'{w}'" for w in words) + "]"
        hits.append(
            f"len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), "
            f"t -> list_contains({arr}, t))) AS hits_{lang}"
        )
    langs = list(text.STOPWORDS)
    greatest = "greatest(" + ", ".join(f"hits_{lang}" for lang in langs) + ")"
    case = "CASE "
    for lang in langs:
        case += f"WHEN hits_{lang} = best AND best > 0 THEN '{lang}' "
    case += "ELSE 'und' END"
    return f"""
WITH h AS (SELECT lang, {', '.join(hits)} FROM documents),
     b AS (SELECT *, {greatest} AS best FROM h),
     p AS (SELECT lang, {case} AS lang_pred FROM b),
     c AS (SELECT lang, lang_pred, cast(count(*) AS BIGINT) AS n FROM p GROUP BY 1, 2),
     t AS (SELECT lang, cast(sum(n) AS BIGINT) AS t FROM c GROUP BY lang)
SELECT c.lang, c.lang_pred, c.n, round(c.n / cast(t.t AS DOUBLE), 6) AS rate
FROM c JOIN t USING (lang)
"""


def _event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user event streams:
    per user, events ordered by (ts, event_id), adjacent event-type
    pairs counted corpus-wide with round-6 row-conditional
    probabilities — the journey-mining summary behind funnel design
    (funnel_conversion checks ONE path; this surfaces all of them).
    One window on user_id + one hash aggregate; the reduced
    (type, type) relation is materialized once (totals derive from it,
    not from a second pass over events)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    pairs = (
        ev.select("user_id", "event_type", F.lead("event_type").over(w).alias("next_type"))
        .filter(F.col("next_type").isNotNull())
    )
    counts = (
        pairs.groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)  # transition-grain reduction;
        # eager — zero-FileScan plan invariant (test_plan_properties)
    )
    tot = counts.groupBy("event_type").agg(F.sum("n").alias("__t"))
    return counts.join(tot, "event_type").select(
        "event_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.col("__t"), 6).alias("p"),
    )


_EVENT_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
), c AS (
  SELECT event_type, next_type, cast(count(*) AS BIGINT) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY 1, 2
), t AS (
  SELECT event_type, cast(sum(n) AS BIGINT) AS t FROM c GROUP BY event_type
)
SELECT c.event_type, c.next_type, c.n,
       round(c.n / cast(t.t AS DOUBLE), 6) AS p
FROM c JOIN t USING (event_type)
"""


def _leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-proof train/val/test split: near-dup CLUSTERS are the
    split unit — every member of a dup cluster lands in the same split,
    so no eval doc has a train-set near-duplicate (the contamination
    mode a doc-level split cannot prevent; cf. contamination_check,
    which AUDITS it — this op prevents it by construction). Clusters
    from CC over the shared at-rest pair graph; the split is the
    seedless md5 bucket of the CLUSTER id (corpus.dataset_split on
    cluster_id), so singleton docs split exactly as before and dup
    groups move atomically."""
    cc = pair_graph.cluster_labels(spark, sf_dir, threshold=0.5, shingle_k=1)
    return corpus.dataset_split(cc, "cluster_id").select("doc_id", "cluster_id", "bucket", "split")


_LEAKAGE_SPLIT_SQL = r"""
WITH RECURSIVE t AS (
    SELECT source, doc_id,
           list_distinct(string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS toks
    FROM documents
), p AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.toks, b.toks)) /
          cast(len(list_distinct(a.toks || b.toks)) AS DOUBLE) >= 0.5
), e AS (
    SELECT id_a AS src, id_b AS dst FROM p
    UNION
    SELECT id_b AS src, id_a AS dst FROM p
), reach(src, dst) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src
), cc AS (
    SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src
)
SELECT doc_id, cluster_id, bucket,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT doc_id, cluster_id,
             ('0x' || substr(md5(cluster_id::VARCHAR), 1, 8))::BIGINT % 100 AS bucket
      FROM cc)
"""


def _contrastive_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contrastive training triples (operators/corpus.py
    contrastive_triples): anchors/positives from the shared at-rest
    near-dup pair graph, negatives from a seedless md5 hash ring over
    the corpus ids (3-slot probe guarantees the negative differs from
    both pair members). Pure function of the ids — other engines and
    re-runs draw identical triples; the oracle replays the ring."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = pair_graph.jaccard_pair_graph(spark, sf_dir, threshold=0.5, shingle_k=1)
    return corpus.contrastive_triples(docs, pairs, "doc_id")


_CONTRASTIVE_SQL = r"""
WITH t AS (
    SELECT source, doc_id,
           list_distinct(string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS toks
    FROM documents
), p AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.toks, b.toks)) /
          cast(len(list_distinct(a.toks || b.toks)) AS DOUBLE) >= 0.5
), ring AS (
    SELECT doc_id AS rid,
           row_number() OVER (
               ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT, doc_id) AS pos
    FROM documents
), n AS (
    SELECT cast(count(*) AS BIGINT) AS n FROM documents
), b AS (
    SELECT id_a, id_b,
           ('0x' || substr(md5(id_a::VARCHAR || '#' || id_b::VARCHAR), 1, 8))::BIGINT AS t0,
           n.n
    FROM p, n
)
SELECT b.id_a, b.id_b,
       CASE WHEN r1.rid <> id_a AND r1.rid <> id_b THEN r1.rid
            WHEN r2.rid <> id_a AND r2.rid <> id_b THEN r2.rid
            ELSE r3.rid END AS neg_id
FROM b
JOIN ring r1 ON r1.pos = (t0 % n) + 1
JOIN ring r2 ON r2.pos = ((t0 + 1) % n) + 1
JOIN ring r3 ON r3.pos = ((t0 + 2) % n) + 1
"""


def _dup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the near-dup graph (operators/graph.py
    triangle_count) over the shared at-rest word-Jaccard pair relation
    (plans/pair_graph.py): triangles, wedges and the global clustering
    coefficient — how clique-like the duplicate structure is. The
    oracle recomputes the same ordered-edge two-join census."""
    pairs = pair_graph.jaccard_pair_graph(spark, sf_dir, threshold=0.5, shingle_k=1)
    return graph.triangle_count(pairs)


_DUP_TRIANGLES_SQL = r"""
WITH t AS (
    SELECT source, doc_id,
           list_distinct(string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS toks
    FROM documents
), p AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.toks, b.toks)) /
          cast(len(list_distinct(a.toks || b.toks)) AS DOUBLE) >= 0.5
), tri AS (
    SELECT cast(count(*) AS BIGINT) AS n_triangles
    FROM p e1
    JOIN p e2 ON e1.id_b = e2.id_a
    JOIN p e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
), deg AS (
    SELECT v, cast(count(*) AS BIGINT) AS d
    FROM (SELECT id_a AS v FROM p UNION ALL SELECT id_b AS v FROM p)
    GROUP BY v
), wed AS (
    SELECT cast(sum((d * (d - 1)) // 2) AS BIGINT) AS n_wedges FROM deg
)
SELECT n_triangles, n_wedges,
       round(3.0 * n_triangles / nullif(n_wedges, 0), 6) AS global_clustering
FROM tri, wed
"""


def _heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency sketch audit (operators/sketch.py): per-day
    CMS partials at rest, merged by counter sum, probed for the top-20
    exact heavy hitters (w=64 against 150 keys, so collisions are real
    and the min-over-rows estimate is genuinely exercised) — (exact, estimate, overestimate) per key.
    The portable affine-over-rolling-hash family makes every counter
    bit-identical across engines, so the oracle value-checks the
    ESTIMATES themselves (overestimate ≥ 0 is the CMS guarantee, and
    both engines must agree on its exact value)."""
    ev = load_table(spark, sf_dir, "events")
    sk = sketch.cms_table(ev, "user_id", F.to_date("ts"), d=4, w=64)
    merged = sketch.cms_merge(sk)
    top = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .orderBy(F.col("exact_count").desc(), F.col("user_id"))
        .limit(20)
        .persist()  # top-20; probe + report join (lazy pin)
    )
    est = sketch.cms_probe(merged, top.select("user_id"), "user_id", d=4, w=64)
    return top.join(est, "user_id").select(
        "user_id",
        "exact_count",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_count")).alias("overestimate"),
    )


def _cms_sql(d: int = 4, w: int = 256) -> str:
    """Oracle generator replaying the CMS schedule: same rolling-hash
    base, same affine row constants, direct (merge-equivalent) global
    counters, min-over-rows estimates for the top-20 keys."""
    fold = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "[CAST(ascii(c) AS BIGINT) FOR c IN regexp_split_to_array(CAST(user_id AS VARCHAR), '')]), "
        "(acc, c) -> (acc * 31 + c) % 2147483647)"
    )
    rb_rows = "\n  UNION ALL\n".join(
        f"  SELECT user_id, {i} AS row, ((hh * {a} + {b}) % 2147483647) % {w} AS bucket FROM h"
        for i, (a, b) in ((i, sketch._affine(i)) for i in range(d))
    )
    return f"""
WITH h AS (
  SELECT user_id, {fold} AS hh FROM events
), rb AS (
{rb_rows}
), s AS (
  SELECT row, bucket, cast(count(*) AS BIGINT) AS c FROM rb GROUP BY 1, 2
), top AS (
  SELECT user_id, cast(count(*) AS BIGINT) AS exact_count
  FROM events GROUP BY user_id ORDER BY exact_count DESC, user_id LIMIT 20
), rbk AS (
  SELECT DISTINCT user_id, row, bucket FROM rb
  WHERE user_id IN (SELECT user_id FROM top)
), est AS (
  SELECT rbk.user_id, min(s.c) AS cms_estimate
  FROM rbk JOIN s USING (row, bucket)
  GROUP BY rbk.user_id
)
SELECT t.user_id, t.exact_count, e.cms_estimate,
       e.cms_estimate - t.exact_count AS overestimate
FROM top t JOIN est e USING (user_id)
"""


def _hll_partition_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-aggregated distinct sketches AT REST: per-(day, event_type)
    DataSketches HLL partials, union-merged across days per event_type —
    the 100 TB distinct-count pattern (store per-partition sketches,
    merge at query time; never rescan raw ids). Oracle pattern as
    approx_profile: each engine asserts its own estimate against its
    own exact answer and the deterministic verdicts are compared;
    tests/test_invariants.py additionally pins merged == direct
    single-pass sketch, the merge-associativity contract itself."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.hll_sketch_agg("user_id").alias("__sk"), F.count(F.lit(1)).alias("__n")
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("__sk")).alias("__est"),
        F.sum("__n").alias("n_events"),
        F.count(F.lit(1)).alias("n_days"),
    )
    exact = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("__eu"))
    return (
        merged.join(exact, "event_type")
        .select(
            "event_type",
            "n_days",
            "n_events",
            (F.abs(F.col("__est") - F.col("__eu")) <= F.col("__eu") * 0.05 + F.lit(1)).alias(
                "merged_users_ok"
            ),
        )
    )


_HLL_ROLLUP_SQL = """
SELECT event_type,
       count(DISTINCT CAST(ts AS DATE)) AS n_days,
       count(*) AS n_events,
       (abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
          <= count(DISTINCT user_id) * 0.05 + 1) AS merged_users_ok
FROM events GROUP BY event_type
"""


def _embedding_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space train/eval contamination (cosine analogue of the
    n-gram contamination_check): per eval vector (vec_id % 10 == 0),
    the max cosine against any same-label train vector, flagged at
    τ=0.3. Label blocking bounds the join exactly like the near-dup
    path; cross-label leakage needs the LSH-bucketed variant. Dot
    products evaluate in array order in both engines, so max/round are
    bit-comparable."""
    from z316_sales_data_pipeline_spark.functions.vector import dot, norm

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        # double-precision products BEFORE accumulation, matching the
        # oracle's DOUBLE[] cast — float-precision products round the
        # 6th decimal differently on boundary values
        "embedding",
        F.col("embedding").cast("array<double>"),
    )
    ev = (
        emb.filter(F.col("vec_id") % 10 == 0)
        .select("label", F.col("vec_id").alias("eval_id"), F.col("embedding").alias("ve"))
        .withColumn("ne", norm("ve"))
    )
    tr = (
        emb.filter(F.col("vec_id") % 10 != 0)
        .select("label", F.col("embedding").alias("vt"))
        .withColumn("nt", norm("vt"))
    )
    cos = dot(F.col("ve"), F.col("vt")) / (F.col("ne") * F.col("nt"))
    return (
        ev.join(tr, "label")
        .groupBy("eval_id")
        .agg(F.max(cos).alias("__mc"))
        .select(
            "eval_id",
            F.round(F.col("__mc"), 6).alias("max_cos"),
            (F.col("__mc") >= 0.3).alias("contaminated"),
        )
    )


_EMB_CONTAMINATION_SQL = """
WITH e AS (SELECT vec_id, label, cast(embedding AS DOUBLE[]) AS emb FROM embeddings),
ev AS (SELECT * FROM e WHERE vec_id % 10 = 0),
tr AS (SELECT * FROM e WHERE vec_id % 10 <> 0),
m AS (
    SELECT ev.vec_id AS eval_id,
           max(list_dot_product(ev.emb, tr.emb) /
               (sqrt(list_dot_product(ev.emb, ev.emb)) * sqrt(list_dot_product(tr.emb, tr.emb)))) AS mc
    FROM ev JOIN tr ON ev.label = tr.label
    GROUP BY ev.vec_id
)
SELECT eval_id, round(mc, 6) AS max_cos, mc >= 0.3 AS contaminated FROM m
"""


def _dq_orders_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-contract check as ONE summary row: key uniqueness, null
    and range violations from a single aggregate pass, RI orphans from
    a key-only anti join — the reference's checker suite
    (api_to_gcs-checker.py:59-89) as declarative violation counts."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    base = quality.constraint_summary(
        orders,
        key_cols=["o_orderkey"],
        not_null_cols=["o_custkey", "o_orderdate"],
        nonneg_cols=["o_totalprice"],
    )
    orphans = quality.orphan_count(orders, customer, "o_custkey", "c_custkey", "orphan_custkeys")
    return base.crossJoin(F.broadcast(orphans))


_DQ_ORDERS_SQL = """
SELECT
    (SELECT count(*) FROM orders) AS n_rows,
    (SELECT cast(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders)
        AS null_key_rows,
    (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders WHERE o_orderkey IS NOT NULL)
        AS dup_keys,
    (SELECT cast(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders)
        AS null_o_custkey,
    (SELECT cast(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders)
        AS null_o_orderdate,
    (SELECT cast(sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT) FROM orders)
        AS neg_o_totalprice,
    (SELECT count(*) FROM orders WHERE o_custkey NOT IN
        (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL)) AS orphan_custkeys
"""


def _doc_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Authority scoring over the near-dup similarity graph (template/
    boilerplate hubs rank high): fixed-iteration integer-scaled
    PageRank — bit-exact across engines, so the iterative algorithm is
    value-checked by unrolled SQL CTEs instead of a rows-only check.
    The pair relation is the shared at-rest graph (plans/pair_graph.py)
    also read by dup_clusters and cluster_representative."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = pair_graph.jaccard_pair_graph(spark, sf_dir, threshold=0.5, shingle_k=1)
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")).unionByName(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    return graph.pagerank_int(edges, docs.select("doc_id"), "doc_id", n_iters=3)


def _doc_pagerank_sql(n_iters: int = 3, damp: int = 85, scale: int = 10**9) -> str:
    head = r"""
WITH t AS (
    SELECT source, doc_id,
           list_distinct(string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS toks
    FROM documents
), p AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.toks, b.toks)) /
          cast(len(list_distinct(a.toks || b.toks)) AS DOUBLE) >= 0.5
), e AS (
    SELECT id_a AS src, id_b AS dst FROM p
    UNION
    SELECT id_b AS src, id_a AS dst FROM p
), deg AS (
    SELECT src, count(*) AS d FROM e GROUP BY src
), nn AS (
    SELECT count(*) AS n FROM documents
), r0 AS (
    SELECT doc_id AS nid, CAST(%(scale)d AS BIGINT) // (SELECT n FROM nn) AS pr FROM documents
)""" % {"scale": scale}
    tele = f"({100 - damp} * CAST({scale} AS BIGINT)) // (100 * (SELECT n FROM nn))"
    for k in range(n_iters):
        head += f""", c{k} AS (
    SELECT e.dst, sum((r.pr * {damp}) // (100 * d.d)) AS inc
    FROM e JOIN r{k} r ON e.src = r.nid JOIN deg d ON e.src = d.src
    GROUP BY e.dst
), r{k + 1} AS (
    SELECT r.nid, {tele} + COALESCE(c.inc, 0) AS pr
    FROM r{k} r LEFT JOIN c{k} c ON r.nid = c.dst
)"""
    return head + f"\nSELECT nid AS doc_id, CAST(pr AS BIGINT) AS pr FROM r{n_iters}"


def _label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection over the near-dup similarity graph via
    3-iteration synchronous label propagation (operators/graph.py
    label_propagation) — the local-structure companion to dup_clusters
    (CC = reachability) and doc_pagerank (authority): template
    families surface as communities even inside one large connected
    component. Every step is exact integer counting with a smallest-
    label tie-break, so the iterative algorithm is value-checked by
    unrolled SQL CTEs, like pagerank. Reads the SAME at-rest pair
    graph as pagerank/dup_clusters — no re-pairing."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = pair_graph.jaccard_pair_graph(spark, sf_dir, threshold=0.5, shingle_k=1)
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")).unionByName(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    return graph.label_propagation(edges, docs.select("doc_id"), "doc_id", n_iters=3)


def _label_propagation_sql(n_iters: int = 3) -> str:
    head = r"""
WITH t AS (
    SELECT source, doc_id,
           list_distinct(string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS toks
    FROM documents
), p AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.toks, b.toks)) /
          cast(len(list_distinct(a.toks || b.toks)) AS DOUBLE) >= 0.5
), e AS (
    SELECT id_a AS src, id_b AS dst FROM p
    UNION
    SELECT id_b AS src, id_a AS dst FROM p
), l0 AS (
    SELECT doc_id AS nid, doc_id AS lbl FROM documents
)"""
    for k in range(n_iters):
        head += f""", c{k} AS (
    SELECT e.dst AS nid, l.lbl, count(*) AS c
    FROM e JOIN l{k} l ON e.src = l.nid
    GROUP BY 1, 2
), p{k} AS (
    SELECT nid, lbl FROM c{k}
    QUALIFY row_number() OVER (PARTITION BY nid ORDER BY c DESC, lbl) = 1
), l{k + 1} AS (
    SELECT l.nid, COALESCE(p.lbl, l.lbl) AS lbl
    FROM l{k} l LEFT JOIN p{k} p USING (nid)
)"""
    return head + f"\nSELECT nid AS doc_id, CAST(lbl AS BIGINT) AS community FROM l{n_iters}"


def _approx_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based profiling: HLL distinct + quantile sketch per
    event_type. At lake scale these replace exact distinct/percentile
    everywhere a 2-5% error is acceptable: fixed memory, one pass, and
    the partial sketches merge associatively across executors.

    Value-checked despite the sketches being engine-specific: each
    engine asserts ITS OWN sketch against ITS OWN exact answer, and the
    query returns the (deterministic) bound verdicts plus the exact
    group count — so the oracle comparison checks the semantic contract
    of an approximate operator (bounded error) value-for-value instead
    of a vacuous rows-only count. Raw sketch values for profiling use
    are the same agg expressions minus the verdict projection."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("__au"),
        F.countDistinct("user_id").alias("__eu"),
        F.percentile_approx("value", [0.5, 0.95, 0.99], 10000).alias("__q"),
        F.expr("percentile(value, array(0.5D, 0.95D, 0.99D))").alias("__eq"),
        F.min("value").alias("__mn"),
        F.max("value").alias("__mx"),
    )
    span = F.col("__mx") - F.col("__mn")
    return agg.select(
        "event_type",
        "n",
        (F.abs(F.col("__au") - F.col("__eu")) <= F.col("__eu") * 0.05 + F.lit(1)).alias(
            "approx_users_ok"
        ),
        (
            (F.col("__q")[0] >= F.col("__mn"))
            & (F.col("__q")[2] <= F.col("__mx"))
            & (F.col("__q")[0] <= F.col("__q")[1])
            & (F.col("__q")[1] <= F.col("__q")[2])
        ).alias("quantiles_ordered_ok"),
        (F.abs(F.col("__q")[0] - F.col("__eq")[0]) <= span * 0.10 + F.lit(1e-9)).alias("p50_ok"),
    )


# Each engine checks its own sketches against its own exact answers —
# the verdict booleans (not the engine-specific estimates) are the
# comparable surface.
_APPROX_PROFILE_SQL = """
SELECT event_type,
       count(*) AS n,
       (abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
          <= count(DISTINCT user_id) * 0.05 + 1) AS approx_users_ok,
       (approx_quantile(value, 0.5) >= min(value)
          AND approx_quantile(value, 0.99) <= max(value)
          AND approx_quantile(value, 0.5) <= approx_quantile(value, 0.95)
          AND approx_quantile(value, 0.95) <= approx_quantile(value, 0.99)) AS quantiles_ordered_ok,
       (abs(approx_quantile(value, 0.5) - quantile_cont(value, 0.5))
          <= (max(value) - min(value)) * 0.10 + 1e-9) AS p50_ok
FROM events GROUP BY event_type
"""


def _ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-level Jaccard similarity for pairs blocked by source."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, "text", "doc_id", "source", threshold=0.5, shingle_k=1)


_NGRAM_JACCARD_SQL = r"""
WITH t AS (
    SELECT source, doc_id,
           list_distinct(string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS toks
    FROM documents
)
SELECT a.source, a.doc_id AS id_a, b.doc_id AS id_b,
       round(len(list_intersect(a.toks, b.toks)) /
             cast(len(list_distinct(a.toks || b.toks)) AS DOUBLE), 6) AS jaccard
FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE len(list_intersect(a.toks, b.toks)) /
      cast(len(list_distinct(a.toks || b.toks)) AS DOUBLE) >= 0.5
"""


def _minhash_near_dup_xxh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs, fast xxhash64 variant (bench/library
    surface: the hash family is engine-specific, not SQL-portable — the
    oracle-checked ``minhash_near_dup`` runs the identical pipeline on
    the portable hash family at a 4×4-band operating point).
    Since r4 the shingle relation comes from the at-rest
    materialization (plans/pair_graph.full_shingle_table) — text is
    hashed once per corpus snapshot, not per query."""
    docs = load_table(spark, sf_dir, "documents")
    ex = pair_graph.full_shingle_table(spark, sf_dir, shingle_k=3, portable=False)
    return dedup.minhash_near_dup_pairs(docs, "text", "doc_id", threshold=0.5, ex=ex)


def _minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs at the high-precision banding point
    (r5 VERDICT item 3: this name is now oracle-checked). Portable hash
    family; 16 hashes as 4 bands × 4 rows puts the S-curve's steep part
    near J≈0.7 — fewer, higher-precision candidates than the 8×2
    recall-oriented point ``minhash_portable`` pins — with exact-Jaccard
    verification at τ=0.6. Same at-rest portable shingle relation; the
    xxhash64 twin (bench_queries: minhash_near_dup_xxhash64) shares the
    whole pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    ex = pair_graph.full_shingle_table(spark, sf_dir, shingle_k=3, portable=True)
    return dedup.minhash_near_dup_pairs(
        docs, "text", "doc_id", threshold=0.6, n_bands=4, portable=True, ex=ex
    )


def _salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (hot-key mitigation); must equal the
    plain GROUP BY, which is exactly what the oracle asserts."""
    li = load_table(spark, sf_dir, "lineitem")
    out = skew.salted_aggregate(
        li,
        ["l_returnflag"],
        {"n": ("count", F.lit(1)), "sum_qty": ("sum", F.col("l_quantity"))},
        salt_col="l_orderkey",
    )
    return out.select("l_returnflag", "n", F.round("sum_qty", 4).alias("sum_qty"))


_SALTED_AGG_SQL = """
SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 4) AS sum_qty
FROM lineitem GROUP BY l_returnflag
"""


def _q18_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18 shape: agg→having→fact-fact join→broadcast dim. The
    order-quantity rollup reduces lineitem to order grain BEFORE any
    join (6M→1.5M rows at sf1; same ratio at 100 TB)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust.select("c_custkey", "c_name")), orders.o_custkey == cust.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
    )


_Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM orders
JOIN (SELECT l_orderkey, round(sum(l_quantity), 4) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 4) > 250) big
  ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def _q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6 shape: pure filtered scan-aggregate — every predicate
    pushes to the parquet scan, one partial+final agg, zero joins. The
    query whose 100 TB cost is exactly one column-pruned scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"))
    )


_Q6_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
FROM lineitem
WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24
"""


def _q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8 shape (market share): 6-way star join, conditional
    aggregation for the share numerator. All dimensions broadcast; the
    fact is reduced to (year, volume, is_target) before the agg."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cust_nat = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region.filter(F.col("r_name") == "EUROPE")), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey")
    )
    supp_nat = supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        li.join(F.broadcast(part.filter(F.col("p_type") == "PROMO")), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .filter((F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01"))
        .join(cust_nat, orders.o_custkey == cust_nat.c_custkey, "left_semi")
        .join(F.broadcast(supp_nat), li.l_suppkey == supp_nat.s_suppkey)
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "supp_nation")
    )
    return base.groupBy("o_year").agg(
        F.round(
            F.try_divide(
                F.sum(F.when(F.col("supp_nation") == "NATION_7", F.col("volume")).otherwise(0.0)),
                F.sum("volume"),
            ),
            6,
        ).alias("mkt_share")
    )


_Q8_SQL = """
SELECT o_year,
       round(sum(CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE 0 END) / sum(volume), 6) AS mkt_share
FROM (
    SELECT year(o_orderdate) AS o_year,
           l_extendedprice * (1 - l_discount) AS volume,
           sn.n_name AS supp_nation
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region ON cn.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
      AND o_orderdate >= '1996-01-01' AND o_orderdate < '1998-01-01'
) GROUP BY o_year
"""


def _q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11 shape: group values filtered against a fraction of the
    GLOBAL mean — the scalar enters as a broadcast 1-row cross join,
    so the 'HAVING > scalar subquery' costs one extra tiny stage. The
    mean-relative threshold (vs TPC-H's fraction-of-total, which is
    1/SF-scaled) keeps the result non-empty at EVERY scale factor."""
    li = load_table(spark, sf_dir, "lineitem")
    val = li.groupBy("l_partkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("value")
    )
    mean = val.agg(F.avg("value").alias("__mean"))
    return (
        val.crossJoin(F.broadcast(mean))
        .filter(F.col("value") > F.col("__mean") * 1.5)
        .select("l_partkey", "value")
    )


_Q11_SQL = """
WITH val AS (
    SELECT l_partkey, round(sum(l_extendedprice * (1 - l_discount)), 4) AS value
    FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, value FROM val
WHERE value > (SELECT avg(value) FROM val) * 1.5
"""


def _q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15 shape: per-supplier quarterly revenue, keep the row(s)
    equal to the max — the 'view + scalar max' pattern as a broadcast
    1-row join (never a global sort)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01"))
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


_Q15_SQL = """
WITH rev AS (
    SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
"""


def _q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2 shape (correlated min subquery, decorrelated): per-part
    minimum unit price among region-filtered suppliers, joined back on
    equality. No partsupp table in the driver data — unit price
    min(l_extendedprice/l_quantity) per (part, supplier) stands in for
    ps_supplycost; the plan shape (decorrelate → broadcast min back) is
    the point. unit_cost stays an UNROUNDED double: it is a MIN of
    deterministic per-row divisions (no summation-order variance),
    and rounding half-boundary doubles diverges between engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    euro_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region.filter(F.col("r_name") == "EUROPE")), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name")
    )
    cost = (
        li.join(F.broadcast(part.filter(F.col("p_size") == 15).select("p_partkey", "p_name")), li.l_partkey == part.p_partkey)
        .join(F.broadcast(euro_supp), li.l_suppkey == euro_supp.s_suppkey)
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name")
        .agg(F.min(F.try_divide(F.col("l_extendedprice"), F.col("l_quantity"))).alias("unit_cost"))
    )
    min_cost = cost.groupBy("p_partkey").agg(F.min("unit_cost").alias("__mc"))
    return (
        cost.join(min_cost, "p_partkey")
        .filter(F.col("unit_cost") == F.col("__mc"))
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "unit_cost")
    )


_Q2_SQL = """
WITH cost AS (
    SELECT p_partkey, p_name, s_suppkey, s_name,
           min(l_extendedprice / l_quantity) AS unit_cost
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE p_size = 15 AND r_name = 'EUROPE'
    GROUP BY p_partkey, p_name, s_suppkey, s_name
)
SELECT p_partkey, p_name, s_suppkey, s_name, unit_cost
FROM cost c
WHERE unit_cost = (SELECT min(unit_cost) FROM cost m WHERE m.p_partkey = c.p_partkey)
"""


def _q20_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20 shape: nested semi-join chain — suppliers who moved
    > 40 units of some PROMO part in 1996. Each hop reduces to keys
    before the next join; the supplier table is only ever probed
    semi-style (no row multiplication)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    heavy = (
        li.filter((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01"))
        .join(
            F.broadcast(part.filter(F.col("p_type") == "PROMO").select("p_partkey")),
            li.l_partkey == part.p_partkey,
            "left_semi",
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.round(F.sum("l_quantity"), 4).alias("qty"))
        .filter(F.col("qty") > 40)
        .select("l_suppkey")
        .distinct()
    )
    return supp.join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


_Q20_SQL = """
SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
      AND l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
    GROUP BY l_suppkey, l_partkey
    HAVING round(sum(l_quantity), 4) > 40
)
"""


def _q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21 shape: EXISTS + NOT EXISTS against the same fact —
    suppliers who were the ONLY late shipper on a multi-supplier order.
    'Late' = shipped > 60 days after the order date (the driver data
    has no commit/receipt dates). Compiles to a semi join plus an anti
    join on (order, supplier) keys — no row explosion."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    pairs = li.select("l_orderkey", "l_suppkey").distinct()
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
        # (order, supplier)-grain reduction consumed by the semi-join
        # probe AND the anti-join build — independent stages, so the
        # pin is eager (grain rule: reductions may localCheckpoint)
        .localCheckpoint(eager=True)
    )
    # Both probe sides are renamed end-to-end (no shared column names with
    # the left) so the self-join predicates resolve by name — avoids the
    # same-lineage `df1.col == df2.col` pattern that Spark disambiguates
    # with a "trivially true equals predicate" WARN and can silently
    # misresolve in edge cases.
    other = pairs.select(
        F.col("l_orderkey").alias("__okey"), F.col("l_suppkey").alias("__skey")
    )
    other_late = late.select(
        F.col("l_orderkey").alias("__okey"), F.col("l_suppkey").alias("__skey")
    )
    exists_other = late.join(
        other,
        (F.col("l_orderkey") == F.col("__okey")) & (F.col("l_suppkey") != F.col("__skey")),
        "left_semi",
    )
    lonely_late = exists_other.join(
        other_late,
        (F.col("l_orderkey") == F.col("__okey")) & (F.col("l_suppkey") != F.col("__skey")),
        "left_anti",
    )
    return (
        lonely_late.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "numwait")
    )


_Q21_SQL = """
WITH pairs AS (
    SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
), late AS (
    SELECT DISTINCT l_orderkey, l_suppkey
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
), lonely AS (
    SELECT l.l_orderkey, l.l_suppkey FROM late l
    WHERE EXISTS (SELECT 1 FROM pairs p
                  WHERE p.l_orderkey = l.l_orderkey AND p.l_suppkey <> l.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late o
                      WHERE o.l_orderkey = l.l_orderkey AND o.l_suppkey <> l.l_suppkey)
)
SELECT s_suppkey, s_name, count(*) AS numwait
FROM lonely JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_suppkey, s_name
"""


def _minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs, portable-hash variant: the rolling
    polynomial shingle hash makes signatures, candidate generation and
    Jaccard all reproducible in ANSI SQL, so this one is value-checked
    (validating the banding/verify pipeline the fast variant shares).
    Reads the portable at-rest shingle relation (same layout, portable
    hash family key)."""
    docs = load_table(spark, sf_dir, "documents")
    ex = pair_graph.full_shingle_table(spark, sf_dir, shingle_k=3, portable=True)
    return dedup.minhash_near_dup_pairs(docs, "text", "doc_id", threshold=0.5, portable=True, ex=ex)


# Mirrors the Spark plan stage by stage: normalize+tokenize → k=3 word
# shingles → distinct rolling hashes → 16 affine-permutation minima →
# 8 bands of 2 rows (joined on the raw slice values: equal slices are
# exactly what equal band hashes encode) → exact Jaccard ≥ τ.
_MINHASH_PORTABLE_SQL = """
WITH base AS (
  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id, list_distinct([
      list_reduce(list_prepend(CAST(0 AS BIGINT),
          [CAST(ascii(c) AS BIGINT) FOR c IN regexp_split_to_array(array_to_string(toks[i:i+2], ' '), '')]),
        (acc, c) -> (acc * 31 + c) % 2147483647)
      FOR i IN generate_series(1, len(toks) - 2)]) AS hs
  FROM base WHERE len(toks) >= 3
),
sig AS (
  SELECT doc_id, hs, len(hs) AS nsh,
    [list_min([(h * ((2654435761 * (i + 1)) % 2147483647) + (40503 * i + 1) % 2147483647) % 2147483647
               FOR h IN hs])
     FOR i IN generate_series(0, 15)] AS mh
  FROM sh
),
bands AS (
  SELECT doc_id, u.b AS band_id, mh[2*u.b + 1] AS m1, mh[2*u.b + 2] AS m2
  FROM sig, unnest(generate_series(0, 7)) AS u(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.m1 = b.m1 AND a.m2 = b.m2
  WHERE a.doc_id < b.doc_id
)
SELECT c.id_a, c.id_b,
       round(CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE) /
             (sa.nsh + sb.nsh - len(list_intersect(sa.hs, sb.hs))), 6) AS jaccard
FROM cand c JOIN sig sa ON c.id_a = sa.doc_id JOIN sig sb ON c.id_b = sb.doc_id
WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE) /
      (sa.nsh + sb.nsh - len(list_intersect(sa.hs, sb.hs))) >= 0.5
"""


# The high-precision 4-bands × 4-rows operating point of the SAME
# portable pipeline (minhash_near_dup): band b carries minima
# mh[4b+1..4b+4]; candidates need a full 4-row band match; exact
# Jaccard ≥ 0.6.
_MINHASH_NEAR_DUP_SQL = """
WITH base AS (
  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id, list_distinct([
      list_reduce(list_prepend(CAST(0 AS BIGINT),
          [CAST(ascii(c) AS BIGINT) FOR c IN regexp_split_to_array(array_to_string(toks[i:i+2], ' '), '')]),
        (acc, c) -> (acc * 31 + c) % 2147483647)
      FOR i IN generate_series(1, len(toks) - 2)]) AS hs
  FROM base WHERE len(toks) >= 3
),
sig AS (
  SELECT doc_id, hs, len(hs) AS nsh,
    [list_min([(h * ((2654435761 * (i + 1)) % 2147483647) + (40503 * i + 1) % 2147483647) % 2147483647
               FOR h IN hs])
     FOR i IN generate_series(0, 15)] AS mh
  FROM sh
),
bands AS (
  SELECT doc_id, u.b AS band_id,
         mh[4*u.b + 1] AS m1, mh[4*u.b + 2] AS m2, mh[4*u.b + 3] AS m3, mh[4*u.b + 4] AS m4
  FROM sig, unnest(generate_series(0, 3)) AS u(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.m1 = b.m1 AND a.m2 = b.m2 AND a.m3 = b.m3 AND a.m4 = b.m4
  WHERE a.doc_id < b.doc_id
)
SELECT c.id_a, c.id_b,
       round(CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE) /
             (sa.nsh + sb.nsh - len(list_intersect(sa.hs, sb.hs))), 6) AS jaccard
FROM cand c JOIN sig sa ON c.id_a = sa.doc_id JOIN sig sb ON c.id_b = sb.doc_id
WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE) /
      (sa.nsh + sb.nsh - len(list_intersect(sa.hs, sb.hs))) >= 0.6
"""


def _minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup: a new batch (doc_id % 5 == 0) checked
    against the at-rest corpus index (shingle_table + minhash_index of
    the rest) AND within itself — the continuous-ingestion dedup path.
    Portable hash family, so the oracle replays the FULL-corpus portable
    pipeline restricted to pairs touching a new id (equality holds
    because banding is deterministic). The corpus shingle/index pair is
    the MAINTAINED append-segment table (plans/pair_graph.py: v=1 base
    + v=2 appended slice through the snapshot pointer, the B2
    streaming-append loop pinned in test_streaming) — the query probes
    a stored, continuously-maintained relation instead of rebuilding
    it, the real continuous-ingestion shape."""
    docs = load_table(spark, sf_dir, "documents")
    new_docs = docs.filter(F.col("doc_id") % 5 == 0)
    ex, idx = pair_graph.minhash_corpus_index(spark, sf_dir, exclude_mod=5, portable=True)
    return dedup.minhash_near_dup_incremental(
        ex, idx, new_docs, "text", "doc_id", threshold=0.5, portable=True
    )


_MINHASH_INCREMENTAL_SQL = (
    _MINHASH_PORTABLE_SQL.rstrip()
    + "\n  AND (c.id_a % 5 = 0 OR c.id_b % 5 = 0)\n"
)


def _minhash_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc keep/drop labels under the keep-first-by-id near-dup
    gate rule (dedup.minhash_dedup_gate): doc d is dropped iff some
    d' < d verifies Jaccard ≥ 0.5 — deliberately non-transitive, the
    BATCH TWIN of streaming/pipeline.minhash_gate_sink (whose pytest
    law pins the stream's accepted/quarantined split equal to this
    relation over every doc folded). Portable hash family over the
    maintained at-rest shingle relation, so the oracle replays the
    whole pipeline value-for-value."""
    docs = load_table(spark, sf_dir, "documents")
    ex = pair_graph.full_shingle_table(spark, sf_dir, shingle_k=3, portable=True)
    return dedup.minhash_dedup_gate(
        docs, "text", "doc_id", threshold=0.5, portable=True, ex=ex
    )


# The portable-pipeline skeleton (normalize → k=3 shingles → rolling
# hashes → 16 minima → 8 bands of 2 joined on raw slices → exact
# Jaccard ≥ 0.5), reduced to the gate's doc-grain labels: drop = "is
# the GREATER side of any verified pair".
_MINHASH_GATE_SQL = """
WITH base AS (
  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id, list_distinct([
      list_reduce(list_prepend(CAST(0 AS BIGINT),
          [CAST(ascii(c) AS BIGINT) FOR c IN regexp_split_to_array(array_to_string(toks[i:i+2], ' '), '')]),
        (acc, c) -> (acc * 31 + c) % 2147483647)
      FOR i IN generate_series(1, len(toks) - 2)]) AS hs
  FROM base WHERE len(toks) >= 3
),
sig AS (
  SELECT doc_id, hs, len(hs) AS nsh,
    [list_min([(h * ((2654435761 * (i + 1)) % 2147483647) + (40503 * i + 1) % 2147483647) % 2147483647
               FOR h IN hs])
     FOR i IN generate_series(0, 15)] AS mh
  FROM sh
),
bands AS (
  SELECT doc_id, u.b AS band_id, mh[2*u.b + 1] AS m1, mh[2*u.b + 2] AS m2
  FROM sig, unnest(generate_series(0, 7)) AS u(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.m1 = b.m1 AND a.m2 = b.m2
  WHERE a.doc_id < b.doc_id
),
dropped AS (
  SELECT DISTINCT c.id_b AS doc_id
  FROM cand c JOIN sig sa ON c.id_a = sa.doc_id JOIN sig sb ON c.id_b = sb.doc_id
  WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE) /
        (sa.nsh + sb.nsh - len(list_intersect(sa.hs, sb.hs))) >= 0.5
)
SELECT d.doc_id, dr.doc_id IS NULL AS keep
FROM documents d LEFT JOIN dropped dr ON d.doc_id = dr.doc_id
"""


def _suffix_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact maximal duplicated-substring spans (dedup.suffix_dedup_spans)
    — the Lee et al. 2022 suffix-array substring dedup as a
    prefix-group plan: repeated L-token windows grouped BY CONTENT,
    merged per doc into maximal [start, end) token spans (the removal
    mask). The oracle replays tokenize → windows → cross-doc dup →
    gaps-and-islands verbatim."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.suffix_dedup_spans(docs, "text", "doc_id", min_tokens=8)


_SUFFIX_SPAN_WIN_SQL = """
base AS (
  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
  FROM documents
),
win AS (
  SELECT doc_id, i - 1 AS pos, array_to_string(toks[i:i+7], ' ') AS w
  FROM base, unnest(generate_series(1, len(toks) - 7)) AS u(i)
  WHERE len(toks) >= 8
),
dup AS (
  SELECT w FROM win GROUP BY w HAVING count(DISTINCT doc_id) >= 2
),
hits AS (SELECT win.doc_id, win.pos FROM win JOIN dup USING (w))
"""

_SUFFIX_DEDUP_SPANS_SQL = (
    "WITH "
    + _SUFFIX_SPAN_WIN_SQL
    + """,
isl AS (
  SELECT doc_id, pos,
         sum(CASE WHEN prev IS NULL OR pos > prev + 8 THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM (SELECT doc_id, pos,
               lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM hits)
)
SELECT doc_id,
       cast(min(pos) AS BIGINT) AS span_start,
       cast(max(pos) + 8 AS BIGINT) AS span_end,
       cast(max(pos) + 8 - min(pos) AS BIGINT) AS span_len
FROM isl GROUP BY doc_id, island
"""
)


def _suffix_spans_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingestion exact substring dedup
    (dedup.suffix_dedup_spans_incremental): the new batch
    (doc_id % 5 == 0) is tokenized and probed against the MAINTAINED
    at-rest HASH-keyed window table (pair_graph warehouse, r14 re-key:
    (id, pos, xxhash64) — 8 bytes a window, never text); candidate
    matches are confirmed by the positional verify arm, which
    re-slices window text from the corpus doc relation for
    hash-matched docs only. Within-batch repeats count too. The ORACLE
    is the full-union pipeline restricted to batch ids — the
    union/duplicate rule makes the incremental fold exactly equal to
    the full recompute on batch docs, checked differentially every
    round."""
    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    corpus_win = pair_graph._materialized(
        spark,
        sf_dir,
        "suffix_window_table",
        "k8h_mod5",
        lambda: dedup.suffix_window_table(corpus, "text", "doc_id", 8),
    )
    return dedup.suffix_dedup_spans_incremental(
        corpus_win, batch, "text", "doc_id", 8, corpus_docs=corpus
    )


# the full-union spans pipeline with the output restricted to batch
# docs — dup flags still derive from ALL docs, which is the exactness
# claim the incremental operator makes
_SUFFIX_SPANS_INCR_SQL = _SUFFIX_DEDUP_SPANS_SQL.replace(
    "hits AS (SELECT win.doc_id, win.pos FROM win JOIN dup USING (w))",
    "hits AS (SELECT win.doc_id, win.pos FROM win JOIN dup USING (w)\n"
    "         WHERE win.doc_id % 5 = 0)",
)


def _intra_doc_repeat_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-document repeated-substring spans, keep-first
    (dedup.intra_doc_repeat_spans) — the self-repetition scrub
    (degenerate generation loops, boilerplate pasted twice into one
    page): every 8-token window occurring ≥ 2 times in the SAME doc
    marks its non-first occurrences for removal. Same hash-only window
    spine + positional verify arm as the cross-doc family; all stages
    key on the doc id — no cross-doc shuffle at all. The synthetic
    corpus has no natural within-doc repeats at audit length, so the
    harness makes the op observable by doubling every 7th document's
    text (a deterministic derivation the oracle replays verbatim) —
    those docs must mask exactly their second copy."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat("text", F.lit(" "), "text")
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return dedup.intra_doc_repeat_spans(docs, "text", "doc_id", min_tokens=8)


_INTRA_DOC_REPEAT_SPANS_SQL = """
WITH src AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' ' || text ELSE text END AS text
  FROM documents
),
base AS (
  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
  FROM src
),
win AS (
  SELECT doc_id, i - 1 AS pos, array_to_string(toks[i:i+7], ' ') AS w
  FROM base, unnest(generate_series(1, len(toks) - 7)) AS u(i)
  WHERE len(toks) >= 8
),
rep AS (
  SELECT doc_id, pos,
         min(pos) OVER (PARTITION BY doc_id, w) AS first_pos,
         count(*) OVER (PARTITION BY doc_id, w) AS n
  FROM win
),
hits AS (SELECT doc_id, pos FROM rep WHERE n >= 2 AND pos > first_pos),
isl AS (
  SELECT doc_id, pos,
         sum(CASE WHEN prev IS NULL OR pos > prev + 8 THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM (SELECT doc_id, pos,
               lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM hits)
)
SELECT doc_id,
       cast(min(pos) AS BIGINT) AS span_start,
       cast(max(pos) + 8 AS BIGINT) AS span_end,
       cast(max(pos) + 8 - min(pos) AS BIGINT) AS span_len
FROM isl GROUP BY doc_id, island
"""


def _suffix_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect→remove on the EXACT channel (dedup.suffix_dedup_spans →
    dedup.apply_span_mask): every token covered by a duplicated
    8-token window is dropped and the survivors re-join — span_scrub's
    exact sibling with the mask decoupled from the removal, so the
    same transform consumes the batch op's, the incremental fold's, or
    the streaming sink's mask. The oracle replays windows → dup →
    islands → indexed token filter."""
    docs = load_table(spark, sf_dir, "documents")
    spans = dedup.suffix_dedup_spans(docs, "text", "doc_id", min_tokens=8)
    return dedup.apply_span_mask(docs, spans, "text", "doc_id")


_SUFFIX_SCRUB_SQL = (
    "WITH "
    + _SUFFIX_SPAN_WIN_SQL
    + """,
isl AS (
  SELECT doc_id, pos,
         sum(CASE WHEN prev IS NULL OR pos > prev + 8 THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM (SELECT doc_id, pos,
               lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM hits)
),
spans AS (
  SELECT doc_id, min(pos) AS s, max(pos) + 8 AS e
  FROM isl GROUP BY doc_id, island
),
mask AS (
  SELECT doc_id, list({'s': s, 'e': e}) AS sps FROM spans GROUP BY doc_id
),
keep AS (
  SELECT b.doc_id, b.toks, m.sps,
         [b.toks[i] FOR i IN generate_series(1, len(b.toks))
            IF m.sps IS NULL
               OR len(list_filter(m.sps, sp -> (i - 1) >= sp.s AND (i - 1) < sp.e)) = 0]
             AS kept
  FROM base b LEFT JOIN mask m USING (doc_id)
)
SELECT doc_id,
       cast(len(toks) AS BIGINT) AS n_tokens,
       cast(len(toks) - len(kept) AS BIGINT) AS n_removed,
       -- DuckDB's array_to_string of an empty list is NULL; Spark's
       -- array_join is '' — a fully-scrubbed doc is an empty string
       coalesce(array_to_string(kept, ' '), '') AS scrubbed_text
FROM keep
"""
)


def _span_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-grain decontamination audit (dedup.eval_span_contamination):
    for each TRAIN doc (source != src0), the maximal token spans whose
    8-token windows occur verbatim in the EVAL set (source = src0) —
    the substring-exact counterpart of contamination_check's n-gram
    fractions, emitting the removal mask apply_span_mask consumes.
    Same train/eval split convention as the contamination family."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.eval_span_contamination(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        "text",
        "doc_id",
        min_tokens=8,
    )


_SPAN_CONTAMINATION_SQL = """
WITH base AS (
  SELECT doc_id, source,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
  FROM documents
),
win AS (
  SELECT doc_id, source, i - 1 AS pos, array_to_string(toks[i:i+7], ' ') AS w
  FROM base, unnest(generate_series(1, len(toks) - 7)) AS u(i)
  WHERE len(toks) >= 8
),
evw AS (SELECT DISTINCT w FROM win WHERE source = 'src0'),
hits AS (
  SELECT win.doc_id, win.pos FROM win JOIN evw USING (w)
  WHERE win.source <> 'src0'
),
isl AS (
  SELECT doc_id, pos,
         sum(CASE WHEN prev IS NULL OR pos > prev + 8 THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM (SELECT doc_id, pos,
               lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM hits)
)
SELECT doc_id,
       cast(min(pos) AS BIGINT) AS span_start,
       cast(max(pos) + 8 AS BIGINT) AS span_end,
       cast(max(pos) + 8 - min(pos) AS BIGINT) AS span_len
FROM isl GROUP BY doc_id, island
"""


def _span_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source decontamination report — the source_data_card
    pattern over span_contamination: for each TRAIN source, docs
    scanned, docs carrying eval-verbatim spans, total tokens the mask
    would remove, and the affected-doc share (exact integer counts;
    the share is one float division, round-6). The one-page summary a
    corpus release reads before deciding scrub-vs-drop."""
    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("source") != "src0")
    spans = dedup.eval_span_contamination(
        train, docs.filter(F.col("source") == "src0"), "text", "doc_id", min_tokens=8
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.sum("span_len").cast("long").alias("__masked")
    )
    return (
        train.select("source", "doc_id")
        .join(per_doc, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("__masked").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_contaminated_docs"),
            F.coalesce(F.sum("__masked"), F.lit(0)).cast("long").alias("tokens_masked"),
        )
        .select(
            "source",
            "n_docs",
            "n_contaminated_docs",
            "tokens_masked",
            # floor-scaled micro-units, not round-6: a ratio of small
            # exact counts can tie at the 6th decimal and HALF_UP vs
            # half-even would diverge (the trigram lesson)
            F.floor(
                F.col("n_contaminated_docs") * F.lit(1_000_000) / F.col("n_docs")
            )
            .cast("long")
            .alias("contaminated_share_micro"),
        )
    )


_SPAN_CONTAMINATION_REPORT_SQL = """
WITH base AS (
  SELECT doc_id, source,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
  FROM documents
),
win AS (
  SELECT doc_id, source, i - 1 AS pos, array_to_string(toks[i:i+7], ' ') AS w
  FROM base, unnest(generate_series(1, len(toks) - 7)) AS u(i)
  WHERE len(toks) >= 8
),
evw AS (SELECT DISTINCT w FROM win WHERE source = 'src0'),
hits AS (
  SELECT win.doc_id, win.pos FROM win JOIN evw USING (w)
  WHERE win.source <> 'src0'
),
isl AS (
  SELECT doc_id, pos,
         sum(CASE WHEN prev IS NULL OR pos > prev + 8 THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM (SELECT doc_id, pos,
               lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM hits)
),
spans AS (
  SELECT doc_id, max(pos) + 8 - min(pos) AS span_len
  FROM isl GROUP BY doc_id, island
),
per_doc AS (SELECT doc_id, sum(span_len) AS masked FROM spans GROUP BY doc_id)
SELECT d.source,
       cast(count(*) AS BIGINT) AS n_docs,
       cast(sum(CASE WHEN p.masked IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_contaminated_docs,
       cast(coalesce(sum(p.masked), 0) AS BIGINT) AS tokens_masked,
       cast((sum(CASE WHEN p.masked IS NOT NULL THEN 1 ELSE 0 END) * 1000000)
            // count(*) AS BIGINT) AS contaminated_share_micro
FROM documents d LEFT JOIN per_doc p USING (doc_id)
WHERE d.source <> 'src0'
GROUP BY d.source
"""


def _suffix_span_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agreement audit between the EXACT substring-dedup channel
    (window text, dedup.suffix_dedup_spans) and the window-HASH
    channel (rolling 64-bit, dedup.span_dedup) over the same corpus —
    the dedup_agreement pattern: before trusting the cheaper hash
    channel at lake scale, measure what it would over-flag (hash
    collisions are the ONLY possible divergence, and only in the
    hash channel's favor). One row: span counts from the exact
    channel, duplicated-window totals from both channels, and the
    collision excess. The exact total counts VERIFIED duplicated
    window POSITIONS directly (dedup.suffix_dup_hits, pre-merge —
    ADVICE r13: deriving it from merged span lengths counted gap
    positions that are not themselves duplicated, which could exceed
    the hash channel and made 'exact <= hash' data-dependent; counted
    this way it is a theorem)."""
    docs = load_table(spark, sf_dir, "documents")
    hits = dedup.suffix_dup_hits(docs, "text", "doc_id", min_tokens=8).persist()
    # hit grain: feeds the position count AND the island merge (lazy pin)
    spans = dedup._merge_window_islands(hits, "doc_id", 8)
    sd = dedup.span_dedup(docs, "text", "doc_id", k=8)
    n_spans = spans.agg(F.count(F.lit(1)).cast("long").alias("n_spans"))
    exact = hits.agg(
        F.count_distinct("doc_id").cast("long").alias("n_docs_with_spans"),
        F.count(F.lit(1)).cast("long").alias("n_dup_windows_exact"),
    ).crossJoin(F.broadcast(n_spans))
    hashed = sd.agg(
        F.sum("n_dup_windows").cast("long").alias("n_dup_windows_hash")
    )
    return exact.crossJoin(F.broadcast(hashed)).select(
        "n_spans",
        "n_docs_with_spans",
        "n_dup_windows_exact",
        "n_dup_windows_hash",
        (F.col("n_dup_windows_hash") - F.col("n_dup_windows_exact"))
        .cast("long")
        .alias("n_collision_windows"),
    )


_SUFFIX_SPAN_AGREEMENT_SQL = (
    "WITH "
    + _SUFFIX_SPAN_WIN_SQL
    + """,
isl AS (
  SELECT doc_id, pos,
         sum(CASE WHEN prev IS NULL OR pos > prev + 8 THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM (SELECT doc_id, pos,
               lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM hits)
),
spans AS (
  SELECT doc_id, min(pos) AS s, max(pos) + 8 AS e
  FROM isl GROUP BY doc_id, island
),
exact AS (
  SELECT cast((SELECT count(*) FROM spans) AS BIGINT) AS n_spans,
         cast(count(DISTINCT doc_id) AS BIGINT) AS n_docs_with_spans,
         cast(count(*) AS BIGINT) AS n_dup_windows_exact
  FROM hits
),
hw AS (
  SELECT doc_id,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
             [CAST(ascii(c) AS BIGINT) FOR c IN regexp_split_to_array(w, '')]),
           (acc, c) -> (acc * 31 + c) % 2147483647) AS h
  FROM win
),
hdup AS (SELECT h FROM hw GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
hashed AS (
  SELECT cast(count(*) AS BIGINT) AS n_dup_windows_hash
  FROM hw JOIN hdup USING (h)
)
SELECT exact.n_spans, exact.n_docs_with_spans, exact.n_dup_windows_exact,
       hashed.n_dup_windows_hash,
       cast(hashed.n_dup_windows_hash - exact.n_dup_windows_exact AS BIGINT)
           AS n_collision_windows
FROM exact CROSS JOIN hashed
"""
)


def _simhash_groups_xxh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup groups, fast xxhash64 variant (bench/library
    surface; the oracle-checked ``simhash_groups`` runs the identical
    pipeline on the portable hash family at 24 bits with the full
    member-list surface)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash_dup_groups(docs, "text", "doc_id").select("simhash", "n")


def _simhash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup GROUPS with their member lists (r5 VERDICT
    item 3: this name is now oracle-checked). Portable hash family at
    24 bits — a finer signature than the 16-bit ``simhash_portable``
    point, so collisions demand closer texts — and the full group
    surface: sorted member ids serialized as a CSV string (the driver's
    hash cannot canonicalize array cells). The xxhash64 twin
    (bench_queries: simhash_groups_xxhash64) shares the pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash_dup_groups(docs, "text", "doc_id", n_bits=24, portable=True).select(
        "simhash",
        "n",
        F.array_join(F.transform(F.col("ids"), lambda x: x.cast("string")), ",").alias("ids"),
    )


def _simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash groups, portable-hash variant: rolling polynomial token
    hash + bit-majority, replayed bit-for-bit by the SQL oracle — the
    value check the xxhash64 variant can't have."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash_dup_groups(docs, "text", "doc_id", portable=True).select("simhash", "n")


def _simhash_portable_sql(n_bits: int = 16, with_ids: bool = False) -> str:
    bit_sums = ",\n           ".join(
        f"sum(CASE WHEN (hh >> {b}) & 1 = 1 THEN 1 ELSE 0 END) AS b{b}" for b in range(n_bits)
    )
    sig = " + ".join(f"(CASE WHEN b{b} * 2 > n THEN {1 << b} ELSE 0 END)" for b in range(n_bits))
    ids = ", array_to_string(list_sort(list(doc_id)), ',') AS ids" if with_ids else ""
    return f"""
WITH t AS (
    SELECT doc_id,
           unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS tok
    FROM documents
), h AS (
    SELECT doc_id,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
               [CAST(ascii(c) AS BIGINT) FOR c IN regexp_split_to_array(tok, '')]),
             (acc, c) -> (acc * 31 + c) % 2147483647) AS hh
    FROM t
), b AS (
    SELECT doc_id, count(*) AS n, {bit_sums}
    FROM h GROUP BY doc_id
), s AS (
    SELECT doc_id, {sig} AS simhash FROM b
)
SELECT simhash, count(*) AS n{ids} FROM s GROUP BY simhash HAVING count(*) > 1
"""


def _quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile estimates from equal-width histogram partials
    (operators/sketch.py histogram_table / histogram_quantiles) — the
    quantile member of the sketch family (HLL distincts, CMS
    frequencies, bloom membership): per-event-type partials over a
    FIXED [0, 512) range merge by counter addition, the quantile walk
    runs over ≤64 sketch rows, and the left-edge estimate is
    bit-portable (error ≤ one bucket width = 8). The oracle replays
    bucketing, merge and walk exactly."""
    ev = load_table(spark, sf_dir, "events")
    partials = sketch.histogram_table(
        ev.filter(F.col("value").isNotNull()), "value", F.col("event_type"), 0.0, 512.0, 64
    )
    return sketch.histogram_quantiles(partials, [0.5, 0.9, 0.99], 0.0, 512.0, 64)


_QUANTILE_SKETCH_SQL = """
WITH b AS (
    SELECT event_type AS part,
           cast(least(63, greatest(0, floor((value - 0.0) / 8.0))) AS INTEGER) AS bucket,
           cast(count(*) AS BIGINT) AS c
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2
), m AS (
    SELECT bucket, cast(sum(c) AS BIGINT) AS c FROM b GROUP BY bucket
), cum AS (
    SELECT bucket, sum(c) OVER (ORDER BY bucket) AS cum, (SELECT sum(c) FROM m) AS n FROM m
), q AS (SELECT cast(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS q)
SELECT q.q, cast(round(0.0 + min(cum.bucket) * 8.0, 6) AS DOUBLE) AS estimate
FROM q JOIN cum ON cum.cum >= cum.n * q.q
GROUP BY q.q
"""


def _minhash_scurve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding S-curve planner: P(candidate | jaccard) =
    1 − (1 − j^r)^b for every (bands, rows) factorization of the
    16-hash signature, over a 0.05-step jaccard grid — the tuning
    table behind the engine's (8 bands × 2 rows) choice (threshold
    j* ≈ (1/b)^(1/r) ≈ 0.35, steep enough at the 0.7 near-dup bar).
    Pure plan-side math (a literal config relation × a range), no
    table input — the planner a corpus owner consults before changing
    the index, evaluated by the same engine that will run it."""
    configs = [(16, 1), (8, 2), (4, 4), (2, 8)]
    cfg = F.explode(
        F.array(
            *[
                F.struct(F.lit(b).alias("n_bands"), F.lit(r).alias("rows_per_band"))
                for b, r in configs
            ]
        )
    ).alias("cfg")
    grid = spark.range(1, 20).select((F.col("id") / 20.0).alias("jaccard"))
    return (
        grid.select("jaccard", cfg)
        .select("jaccard", "cfg.n_bands", "cfg.rows_per_band")
        .withColumn(
            "p_candidate",
            F.round(
                F.lit(1.0)
                - F.pow(
                    F.lit(1.0) - F.pow("jaccard", F.col("rows_per_band")), F.col("n_bands")
                ),
                6,
            ),
        )
    )


_MINHASH_SCURVE_SQL = """
WITH cfg AS (
    SELECT * FROM (VALUES (16, 1), (8, 2), (4, 4), (2, 8)) AS t(n_bands, rows_per_band)
), grid AS (
    SELECT i / 20.0 AS jaccard FROM (SELECT unnest(generate_series(1, 19)) AS i)
)
SELECT jaccard, n_bands, rows_per_band,
       round(1.0 - pow(1.0 - pow(jaccard, rows_per_band), n_bands), 6) AS p_candidate
FROM grid CROSS JOIN cfg
"""


def _simhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash member of the incremental-dedup family: the new batch
    (doc_id % 5 == 0) probes the AT-REST corpus signature table
    (plans/pair_graph.py simhash_corpus_sigs) through the banded
    signature index — equi-join on (band, band_value), exact popcount
    only on candidates; Hamming ≤ 3 over 4 bands has zero false
    negatives by pigeonhole. The corpus is never re-hashed."""
    docs = load_table(spark, sf_dir, "documents")
    new_docs = docs.filter(F.col("doc_id") % 5 == 0)
    corpus_sigs = pair_graph.simhash_corpus_sigs(spark, sf_dir, exclude_mod=5, portable=True)
    return dedup.simhash_near_dup_incremental(
        new_docs, corpus_sigs, "text", "doc_id", n_bits=16, n_bands=4, max_hamming=3, portable=True
    )


def _simhash_incremental_sql(n_bits: int = 16, n_bands: int = 4, max_hamming: int = 3) -> str:
    bit_sums = ",\n           ".join(
        f"sum(CASE WHEN (hh >> {b}) & 1 = 1 THEN 1 ELSE 0 END) AS b{b}" for b in range(n_bits)
    )
    sig = " + ".join(f"(CASE WHEN b{b} * 2 > n THEN {1 << b} ELSE 0 END)" for b in range(n_bits))
    bw = n_bits // n_bands
    mask = (1 << bw) - 1
    return f"""
WITH t AS (
    SELECT doc_id,
           unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS tok
    FROM documents
), h AS (
    SELECT doc_id,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
               [CAST(ascii(c) AS BIGINT) FOR c IN regexp_split_to_array(tok, '')]),
             (acc, c) -> (acc * 31 + c) % 2147483647) AS hh
    FROM t
), b AS (
    SELECT doc_id, count(*) AS n, {bit_sums}
    FROM h GROUP BY doc_id
), s AS (
    SELECT doc_id, {sig} AS simhash FROM b
), nb AS (
    SELECT s.doc_id, s.simhash, g.band, (s.simhash >> (g.band * {bw})) & {mask} AS val
    FROM s, (SELECT unnest(generate_series(0, {n_bands - 1})) AS band) g
    WHERE s.doc_id % 5 = 0
), cb AS (
    SELECT s.doc_id AS corpus_id, s.simhash AS c_sig, g.band,
           (s.simhash >> (g.band * {bw})) & {mask} AS val
    FROM s, (SELECT unnest(generate_series(0, {n_bands - 1})) AS band) g
    WHERE s.doc_id % 5 <> 0
), cand AS (
    SELECT DISTINCT nb.doc_id, nb.simhash, cb.corpus_id, cb.c_sig
    FROM nb JOIN cb ON nb.band = cb.band AND nb.val = cb.val
), ham AS (
    SELECT doc_id, corpus_id, bit_count(xor(simhash, c_sig)) AS hamming FROM cand
), agg AS (
    SELECT doc_id,
           cast(count(*) AS BIGINT) AS n_candidates,
           cast(sum(CASE WHEN hamming <= {max_hamming} THEN 1 ELSE 0 END) AS BIGINT) AS n_near,
           cast(min(CASE WHEN hamming <= {max_hamming} THEN hamming END) AS INTEGER) AS min_hamming,
           cast(min(CASE WHEN hamming <= {max_hamming} THEN corpus_id END) AS BIGINT) AS first_near
    FROM ham GROUP BY doc_id
)
SELECT s.doc_id,
       coalesce(a.n_candidates, 0) AS n_candidates,
       coalesce(a.n_near, 0) AS n_near,
       a.min_hamming, a.first_near
FROM s LEFT JOIN agg a USING (doc_id)
WHERE s.doc_id % 5 = 0
"""


_KNN_QUERY_VEC = [1.0 if i % 2 == 0 else -1.0 for i in range(64)]


def _knn_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k to a constant query vector."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    return similarity.brute_force_top_k(emb, "embedding", "vec_id", _KNN_QUERY_VEC, k=10)


def _knn_sql() -> str:
    vec = "[" + ", ".join(str(v) for v in _KNN_QUERY_VEC) + "]"
    return f"""
SELECT vec_id,
       round(list_dot_product(cast(embedding AS DOUBLE[]), {vec}) /
             (sqrt(list_dot_product(cast(embedding AS DOUBLE[]), cast(embedding AS DOUBLE[]))) *
              sqrt(list_dot_product({vec}::DOUBLE[], {vec}::DOUBLE[]))), 6) AS cos
FROM embeddings
ORDER BY cos DESC, vec_id LIMIT 10
"""


def _bucketed_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings with the shared (label × LSH-bucket) blocking key.

    r5 VERDICT item 2: blocking on ``label`` alone is fixed-cardinality
    — each block is O(n/L) rows and the within-block pair join does
    O((n/L)²) work, still quadratic at 100 TB. The hyperplane bucket
    (similarity.py) is the corpus-growth-bounded half of the key: at
    scale, n_planes ≈ log2(n / target_block) keeps expected block size
    ≈ target_block (~10⁴ vectors ⇒ ~10⁸ in-block pairs per block,
    constant per block as n grows); here n_planes=4 (16 buckets) suits
    the test SFs. A cos≥τ pair split across buckets is missed — the
    standard LSH recall trade; the label-only exact baseline these
    audits compare against lives on in the pytest invariant
    (tests/test_invariants.py)."""
    return (
        load_table(spark, sf_dir, "embeddings")
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
        .withColumn(
            "bucket",
            similarity.hyperplane_bucket("embedding", dim=64, n_planes=4).cast("long"),
        )
    )


def _embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs (cos ≥ 0.3), blocked on label × LSH
    bucket — the corpus-growth-bounded blocking (see
    :func:`_bucketed_embeddings`)."""
    return dedup.embedding_near_dup_pairs(
        _bucketed_embeddings(spark, sf_dir), "embedding", "vec_id", 0.3,
        block_col=["label", "bucket"],
    )


def _emb_bucket_bits_sql() -> str:
    """DuckDB replay of hyperplane_bucket(dim=64, n_planes=4, seed=42):
    the SAME deterministic LCG planes, inlined as literals (the
    lsh_top_k oracle's pattern)."""
    planes = similarity._hyperplanes(64, 4, seed=42)
    return " + ".join(
        f"(CASE WHEN list_dot_product(emb, [{', '.join(repr(x) for x in p)}]::DOUBLE[]) >= 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )


def _emb_near_dup_sql() -> str:
    return f"""
WITH e AS (SELECT vec_id, label, cast(embedding AS DOUBLE[]) AS emb FROM embeddings),
bk AS (SELECT vec_id, label, emb, CAST({_emb_bucket_bits_sql()} AS BIGINT) AS bucket FROM e)
SELECT x.label, x.bucket, x.vec_id AS id_a, y.vec_id AS id_b,
       round(list_dot_product(x.emb, y.emb) /
             (sqrt(list_dot_product(x.emb, x.emb)) * sqrt(list_dot_product(y.emb, y.emb))), 6) AS cos
FROM bk x JOIN bk y ON x.label = y.label AND x.bucket = y.bucket AND x.vec_id < y.vec_id
WHERE list_dot_product(x.emb, y.emb) /
      (sqrt(list_dot_product(x.emb, x.emb)) * sqrt(list_dot_product(y.emb, y.emb))) >= 0.3
"""


def _embedding_near_dup_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked-matmul (applyInPandas + numpy) twin of embedding_near_dup
    — one vectorized matmul per (label × LSH-bucket) block instead of
    n² interpreted dots; same corpus-growth-bounded blocking."""
    return dedup.embedding_near_dup_blocked(
        _bucketed_embeddings(spark, sf_dir), "embedding", "vec_id", 0.3, ["label", "bucket"]
    )


def _emb_blocked_sql() -> str:
    return f"""
WITH e AS (SELECT vec_id, label, cast(embedding AS DOUBLE[]) AS emb FROM embeddings),
bk AS (SELECT vec_id, label, emb, CAST({_emb_bucket_bits_sql()} AS BIGINT) AS bucket FROM e)
SELECT x.vec_id AS id_a, y.vec_id AS id_b,
       round(list_dot_product(x.emb, y.emb) /
             (sqrt(list_dot_product(x.emb, x.emb)) * sqrt(list_dot_product(y.emb, y.emb))), 6) AS cos
FROM bk x JOIN bk y ON x.label = y.label AND x.bucket = y.bucket AND x.vec_id < y.vec_id
WHERE list_dot_product(x.emb, y.emb) /
      (sqrt(list_dot_product(x.emb, x.emb)) * sqrt(list_dot_product(y.emb, y.emb))) >= 0.3
"""


def _lsh_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via hyperplane-LSH bucket probe. Value-checked:
    the oracle replays the bucketing with the SAME four hyperplanes
    (deterministic LCG, inlined as literals) and the query's bucket id,
    then ranks by the same round-6 cosine."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    return similarity.lsh_top_k(emb, "embedding", "vec_id", _KNN_QUERY_VEC, k=10, n_planes=4)


def _lsh_sql() -> str:
    planes = similarity._hyperplanes(64, 4, seed=42)
    q_bucket = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(_KNN_QUERY_VEC, p)) >= 0:
            q_bucket |= 1 << i
    vec = "[" + ", ".join(str(v) for v in _KNN_QUERY_VEC) + "]"
    bits = " + ".join(
        f"(CASE WHEN list_dot_product(v, [{', '.join(repr(x) for x in p)}]::DOUBLE[]) >= 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
b AS (SELECT vec_id, v, {bits} AS bucket FROM e)
SELECT vec_id,
       round(list_dot_product(v, {vec}::DOUBLE[]) /
             (sqrt(list_dot_product(v, v)) *
              sqrt(list_dot_product({vec}::DOUBLE[], {vec}::DOUBLE[]))), 6) AS cos
FROM b WHERE bucket = {q_bucket}
ORDER BY cos DESC, vec_id LIMIT 10
"""


def _tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window aggregate (batch twin of S-extension)."""
    ev = load_table(spark, sf_dir, "events")
    return streaming_pipeline.tumbling_counts(ev)


_TUMBLING_SQL = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n, round(sum(value), 4) AS total_value
FROM events GROUP BY 1, 2
"""


def _session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization by 30-minute inactivity gap (batch twin)."""
    ev = load_table(spark, sf_dir, "events")
    return streaming_pipeline.session_windows(ev)


_SESSION_SQL = """
WITH e AS (
    SELECT user_id, ts, value,
           CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                     OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        > INTERVAL '30 minutes'
                THEN 1 ELSE 0 END AS new_sess,
           event_id
    FROM events
),
s AS (
    SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sess_id
    FROM e
)
SELECT min(ts) AS session_start,
       max(ts) + INTERVAL '30 minutes' AS session_end,
       user_id,
       count(*) AS n_events,
       round(sum(value), 4) AS session_value
FROM s GROUP BY user_id, sess_id
"""


def _sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window aggregate (1h window, 15min slide — batch twin)."""
    ev = load_table(spark, sf_dir, "events")
    return streaming_pipeline.sliding_counts(ev)


# Reproduce Spark's epoch-aligned sliding-window expansion: an event at
# t belongs to every window start k*slide with t-len < k*slide <= t.
_SLIDING_SQL = """
WITH w AS (
    SELECT unnest(generate_series(
               CAST(floor((epoch_us(ts) - 3600000000) / 900000000) AS BIGINT) + 1,
               CAST(floor(epoch_us(ts) / 900000000) AS BIGINT))) AS k,
           event_type, value
    FROM events
)
SELECT make_timestamp(k * 900000000) AS window_start,
       make_timestamp(k * 900000000 + 3600000000) AS window_end,
       event_type, count(*) AS n, round(sum(value), 4) AS total_value
FROM w GROUP BY 1, 2, 3
"""


def _skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg-key skew profiler — the measurement BEHIND the salting
    recipes (operators/skew.py) and AQE skew thresholds: for the
    lineitem order key, the 20 heaviest keys with their row share and
    skew factor (count / mean-rows-per-key). An operator reads this
    before picking a salt fan-out or trusting a broadcast; at 100 TB
    it is one map-side-combinable count aggregate + a 20-row TakeOrdered
    — never a sort of the key space. Shares and factors are divisions
    of exact integers (identical doubles in both engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("cnt"))
    tot = per.agg(
        F.sum("cnt").alias("__rows"), F.count(F.lit(1)).alias("__keys")
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "l_orderkey",
            "cnt",
            F.round(F.col("cnt") / F.col("__rows"), 6).alias("row_share"),
            F.round(F.col("cnt") * F.col("__keys") / F.col("__rows"), 6).alias("skew_factor"),
        )
        .orderBy(F.col("cnt").desc(), F.col("l_orderkey").asc())
        .limit(20)
    )


_SKEW_PROFILE_SQL = """
WITH per AS (
    SELECT l_orderkey, cast(count(*) AS BIGINT) AS cnt FROM lineitem GROUP BY 1
), tot AS (
    SELECT cast(sum(cnt) AS BIGINT) AS rows_, cast(count(*) AS BIGINT) AS keys_ FROM per
)
SELECT l_orderkey, cnt,
       round(cast(cnt AS DOUBLE) / rows_, 6) AS row_share,
       round(cast(cnt AS DOUBLE) * keys_ / rows_, 6) AS skew_factor
FROM per CROSS JOIN tot
ORDER BY cnt DESC, l_orderkey LIMIT 20
"""


def _entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy record linkage over the part dimension — the
    entity-resolution shape (Fellegi-Sunter blocking stage) the
    reference's D-family lookup joins assume has already happened:
    records collapse to name grain (exact-duplicate groups with
    record counts — the cheapest, biggest win on dirty data), a
    BLOCKING key (last name token) restricts comparison to within-
    block pairs, and edit-distance scoring links name variants
    (levenshtein <= 3 with a < b canonical ordering). Output is the
    linkage worklist: block, both names, distance, and how many
    record-level pairs the link implies (n_a x n_b).

    Scale shape: the self-join is on the BLOCK key at name grain —
    vocabulary-sized, not corpus-sized; no all-pairs term ever touches
    record grain. At 100 TB you add more selective blocking (multiple
    keys + meta-blocking union) and the same plan holds; the
    levenshtein filter is evaluated only inside blocks. All outputs
    exact integers."""
    part = load_table(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.count(F.lit(1)).alias("n_rec"))
    b = names.withColumn("blk", F.element_at(F.split("p_name", " "), -1))
    a, c = b.alias("a"), b.alias("b")
    lev = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            c,
            (F.col("a.blk") == F.col("b.blk")) & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .select(
            F.col("a.blk").alias("blk"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            lev.alias("lev"),
            (F.col("a.n_rec") * F.col("b.n_rec")).alias("candidate_pairs"),
        )
        .filter(F.col("lev") <= 3)
    )


_ENTITY_RESOLUTION_SQL = """
WITH names AS (SELECT p_name, count(*) AS n_rec FROM part GROUP BY p_name),
b AS (SELECT p_name, n_rec, str_split(p_name, ' ')[-1] AS blk FROM names)
SELECT a.blk, a.p_name AS name_a, b.p_name AS name_b,
       cast(levenshtein(a.p_name, b.p_name) AS INTEGER) AS lev,
       cast(a.n_rec * b.n_rec AS BIGINT) AS candidate_pairs
FROM b a JOIN b b ON a.blk = b.blk AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 3
"""


def _mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection on the daily event-value series:
    median + MAD (median absolute deviation) flagging, the
    outlier-resistant alternative to mean/stddev z-scores — one
    spiked day cannot drag the threshold the way it drags a mean.
    Day grain is bounded (O(days) rows), so the exact interpolated
    median is a safe sort-aggregate here; at unbounded grain the
    mergeable histogram sketch (operators/sketch.py) is the
    continuous form. Daily sums are integer cents; medians of bigints
    interpolate to exactly representable doubles, so the deviation
    comparison is engine-portable without rounding tricks."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("bucket_day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    med = daily.agg(F.expr("percentile(cents, 0.5)").alias("__med"))
    dev = daily.crossJoin(F.broadcast(med)).withColumn(
        "abs_dev", F.abs(F.col("cents") - F.col("__med"))
    )
    mad = dev.agg(F.expr("percentile(abs_dev, 0.5)").alias("__mad"))
    return (
        dev.crossJoin(F.broadcast(mad))
        .select(
            "bucket_day",
            "cents",
            F.round(F.col("abs_dev"), 2).alias("abs_dev"),
            (F.col("abs_dev") > 3 * F.col("__mad")).cast("int").alias("is_outlier"),
        )
    )


_MAD_OUTLIERS_SQL = """
WITH daily AS (
    SELECT cast(date_trunc('day', ts) AS TIMESTAMP) AS bucket_day,
           cast(sum(cast(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events GROUP BY 1
), med AS (SELECT quantile_cont(cents, 0.5) AS m FROM daily),
dev AS (
    SELECT bucket_day, cents, abs(cents - med.m) AS abs_dev
    FROM daily CROSS JOIN med
), mad AS (SELECT quantile_cont(abs_dev, 0.5) AS m FROM dev)
SELECT bucket_day, cents, round(abs_dev, 2) AS abs_dev,
       cast(abs_dev > 3 * mad.m AS INTEGER) AS is_outlier
FROM dev CROSS JOIN mad
"""


def _l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the companion to k_anonymity: for each
    quasi-identifier group (nation x market segment), the group size k
    AND the number of DISTINCT sensitive values (account-balance
    kilo-band) the group carries. A group can be k-anonymous yet leak
    everything if all members share one sensitive value (l=1); the
    release gate reads min(l) per group. One two-key hash aggregate +
    count_distinct — map-side combinable, no shuffle beyond the
    grouping."""
    cust = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 1000).cast("long")
    return (
        cust.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.countDistinct(band).alias("l"),
        )
    )


_L_DIVERSITY_SQL = """
SELECT c_nationkey, c_mktsegment, cast(count(*) AS BIGINT) AS k,
       cast(count(DISTINCT cast(floor(c_acctbal / 1000) AS BIGINT)) AS BIGINT) AS l
FROM customer GROUP BY 1, 2
"""


def _pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding (operators/similarity.py
    pq_encode): every vector compressed to m=4 subspace codes against
    the deterministic 16-word codebook — the 64×-smaller at-rest
    representation that lets a 100 TB corpus's first-pass ANN index
    fit in memory (pq_recall_eval audits what the compression costs).
    Served from the MAINTAINED at-rest codes table
    (plans/pair_graph.pq_codes_table: v=1 base + v=2 arriving slice
    encoded with the frozen codebook — equality with the inline
    encode pinned in pytest); the oracle replays the same frozen
    codebook, floor-scaled squared-L2 argmin and lowest-code
    tie-break."""
    return pair_graph.pq_codes_table(spark, sf_dir, m=4, n_codes=16).select(
        "vec_id", "sub", "code"
    )


_PQ_CODES_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cb0 AS (
    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, v
    FROM e ORDER BY vec_id LIMIT 16
), s AS (SELECT unnest(range(4)) AS sub),
cb AS (
    SELECT s.sub, cb0.code, cb0.v[s.sub*16+1 : s.sub*16+16] AS cv
    FROM cb0 CROSS JOIN s
), x AS (
    SELECT e.vec_id, s.sub, e.v[s.sub*16+1 : s.sub*16+16] AS sv
    FROM e CROSS JOIN s
)
SELECT vec_id, cast(sub AS INTEGER) AS sub, cast(code AS INTEGER) AS code
FROM (
    SELECT x.vec_id, x.sub, cb.code,
           row_number() OVER (PARTITION BY x.vec_id, x.sub ORDER BY
               CAST(floor((list_dot_product(x.sv, x.sv)
                           - 2 * list_dot_product(x.sv, cb.cv)
                           + list_dot_product(cb.cv, cb.cv)) * 1000000) AS BIGINT),
               cb.code) AS rn
    FROM x JOIN cb USING (sub)
) t WHERE rn = 1
"""


def _pq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the PQ/ADC compressed scan vs exact L2 top-k per
    deterministic query (operators/similarity.py pq_recall_eval) —
    the PQ sibling of ann_recall_eval. Approximate distances are sums
    of bigint micro-unit LUT entries (order-free, engine-portable);
    the exact arm ranks the same floor-scaled squared L2. The audit an
    operator reads before serving retrieval from the codes table —
    and it probes the MAINTAINED at-rest codes (pair_graph.
    pq_codes_table), so the benched cost is the ADC scan + exact arm,
    not a re-encode."""
    emb = load_table(spark, sf_dir, "embeddings")
    codes = pair_graph.pq_codes_table(spark, sf_dir, m=4, n_codes=16).select(
        "vec_id", "sub", "code"
    )
    return similarity.pq_recall_eval(
        emb, "embedding", "vec_id", query_mod=100, k=10, m=4, n_codes=16, codes=codes
    )


_PQ_RECALL_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cb0 AS (
    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, v
    FROM e ORDER BY vec_id LIMIT 16
), s AS (SELECT unnest(range(4)) AS sub),
cb AS (
    SELECT s.sub, cb0.code, cb0.v[s.sub*16+1 : s.sub*16+16] AS cv
    FROM cb0 CROSS JOIN s
), x AS (
    SELECT e.vec_id, s.sub, e.v[s.sub*16+1 : s.sub*16+16] AS sv
    FROM e CROSS JOIN s
), codes AS (
    SELECT vec_id, sub, code FROM (
        SELECT x.vec_id, x.sub, cb.code,
               row_number() OVER (PARTITION BY x.vec_id, x.sub ORDER BY
                   CAST(floor((list_dot_product(x.sv, x.sv)
                               - 2 * list_dot_product(x.sv, cb.cv)
                               + list_dot_product(cb.cv, cb.cv)) * 1000000) AS BIGINT),
                   cb.code) AS rn
        FROM x JOIN cb USING (sub)
    ) t WHERE rn = 1
), q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 100 = 0 AND vec_id < 50000),
qs AS (
    SELECT q.query_id, s.sub, q.qv[s.sub*16+1 : s.sub*16+16] AS qsv
    FROM q CROSS JOIN s
), lut AS (
    SELECT qs.query_id, qs.sub, cb.code,
           CAST(floor((list_dot_product(qs.qsv, qs.qsv)
                       - 2 * list_dot_product(qs.qsv, cb.cv)
                       + list_dot_product(cb.cv, cb.cv)) * 1000000) AS BIGINT) AS ld
    FROM qs JOIN cb USING (sub)
), adc AS (
    SELECT lut.query_id, codes.vec_id, sum(lut.ld) AS adist
    FROM codes JOIN lut USING (sub, code)
    GROUP BY lut.query_id, codes.vec_id
), adc_top AS (
    SELECT query_id, vec_id FROM adc
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY adist, vec_id) <= 10
), exact_top AS (
    SELECT q.query_id, e.vec_id
    FROM q CROSS JOIN e
    QUALIFY row_number() OVER (PARTITION BY q.query_id ORDER BY
        CAST(floor((list_dot_product(q.qv, q.qv)
                    - 2 * list_dot_product(q.qv, e.v)
                    + list_dot_product(e.v, e.v)) * 1000000) AS BIGINT), e.vec_id) <= 10
), h AS (
    SELECT adc_top.query_id, count(*) AS n_hits
    FROM adc_top JOIN exact_top USING (query_id, vec_id)
    GROUP BY adc_top.query_id
)
SELECT q.query_id, cast(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(coalesce(h.n_hits, 0) / 10.0, 6) AS recall_at_k
FROM q LEFT JOIN h USING (query_id)
"""


def _ivf_pq_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ serving, end-to-end at-rest (operators/similarity.py
    ivf_pq_top_k): the cell-partitioned IVF layout prunes the scan to
    4/16 partitions, then the ADC lookup table ranks the surviving
    candidates from the MAINTAINED PQ codes table — query-time work
    touches no raw vector. The composition a 100 TB vector tier
    actually serves: partition pruning × 64×-compressed codes ×
    O(m·n_codes) broadcast LUT. Exact bigint micro-unit distances,
    id tie-break; the oracle replays the full IVF schedule, the
    frozen codebook encode and the same LUT sum."""
    emb = load_table(spark, sf_dir, "embeddings")
    at_rest = pair_graph.ivf_embeddings(spark, sf_dir, n_cells=16)
    codes = pair_graph.pq_codes_table(spark, sf_dir, m=4, n_codes=16).select(
        "vec_id", "sub", "code"
    )
    return similarity.ivf_pq_top_k(
        emb,
        "embedding",
        "vec_id",
        _KNN_QUERY_VEC,
        k=10,
        n_cells=16,
        n_probe=4,
        m=4,
        n_codes=16,
        assigned=at_rest,
        codes=codes,
    )


def _ivf_pq_sql() -> str:
    vec = "[" + ", ".join(str(v) for v in _KNN_QUERY_VEC) + "]"
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (
    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv
    FROM e ORDER BY vec_id LIMIT 16
), d AS (
    SELECT e.vec_id, c.cell, list_dot_product(e.v, c.cv) AS dp FROM e CROSS JOIN c
), a AS (
    SELECT vec_id, cell FROM d
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dp DESC, cell) = 1
), pc AS (
    SELECT cell FROM c ORDER BY list_dot_product({vec}::DOUBLE[], cv) DESC, cell LIMIT 4
), cand AS (
    SELECT a.vec_id FROM a WHERE a.cell IN (SELECT cell FROM pc)
), cb0 AS (
    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, v
    FROM e ORDER BY vec_id LIMIT 16
), s AS (SELECT unnest(range(4)) AS sub),
cb AS (
    SELECT s.sub, cb0.code, cb0.v[s.sub*16+1 : s.sub*16+16] AS cv
    FROM cb0 CROSS JOIN s
), x AS (
    SELECT e.vec_id, s.sub, e.v[s.sub*16+1 : s.sub*16+16] AS sv
    FROM e CROSS JOIN s
), codes AS (
    SELECT vec_id, sub, code FROM (
        SELECT x.vec_id, x.sub, cb.code,
               row_number() OVER (PARTITION BY x.vec_id, x.sub ORDER BY
                   CAST(floor((list_dot_product(x.sv, x.sv)
                               - 2 * list_dot_product(x.sv, cb.cv)
                               + list_dot_product(cb.cv, cb.cv)) * 1000000) AS BIGINT),
                   cb.code) AS rn
        FROM x JOIN cb USING (sub)
    ) t WHERE rn = 1
), qs AS (
    SELECT s.sub, ({vec}::DOUBLE[])[s.sub*16+1 : s.sub*16+16] AS qsv FROM s
), lut AS (
    SELECT qs.sub, cb.code,
           CAST(floor((list_dot_product(qs.qsv, qs.qsv)
                       - 2 * list_dot_product(qs.qsv, cb.cv)
                       + list_dot_product(cb.cv, cb.cv)) * 1000000) AS BIGINT) AS ld
    FROM qs JOIN cb USING (sub)
)
SELECT codes.vec_id, cast(sum(lut.ld) AS BIGINT) AS adist
FROM codes JOIN cand USING (vec_id) JOIN lut USING (sub, code)
GROUP BY codes.vec_id
ORDER BY adist, vec_id LIMIT 10
"""


def _ivf_pq_rerank_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarse-to-fine serving (operators/similarity.ivf_pq_rerank_top_k):
    the IVF-PQ/ADC pass shortlists 50 candidates from the maintained
    cell-partitioned layout + codes table, then exactly re-ranks ONLY
    those 50 from raw vectors — the FAISS/ScaNN refine step. The oracle
    replays the full IVF schedule, the frozen-codebook encode, the ADC
    shortlist and the exact rerank."""
    emb = load_table(spark, sf_dir, "embeddings")
    at_rest = pair_graph.ivf_embeddings(spark, sf_dir, n_cells=16)
    codes = pair_graph.pq_codes_table(spark, sf_dir, m=4, n_codes=16).select(
        "vec_id", "sub", "code"
    )
    return similarity.ivf_pq_rerank_top_k(
        emb,
        "embedding",
        "vec_id",
        _KNN_QUERY_VEC,
        k=10,
        n_short=50,
        n_cells=16,
        n_probe=4,
        m=4,
        n_codes=16,
        assigned=at_rest,
        codes=codes,
    )


def _ivf_pq_rerank_sql() -> str:
    vec = "[" + ", ".join(str(v) for v in _KNN_QUERY_VEC) + "]"
    base = _ivf_pq_sql()
    # reuse the IVF-PQ oracle's CTE chain verbatim; swap its final
    # top-10 ADC select for: ADC top-50 shortlist -> exact rerank
    head, _, tail = base.rpartition("SELECT codes.vec_id")
    assert head and "lut" in head
    return head + f"""
, short AS (
    SELECT codes.vec_id
    FROM codes JOIN cand USING (vec_id) JOIN lut USING (sub, code)
    GROUP BY codes.vec_id
    ORDER BY cast(sum(lut.ld) AS BIGINT), vec_id LIMIT 50
)
SELECT e.vec_id,
       CAST(floor((list_dot_product(e.v, e.v)
                   - 2 * list_dot_product(e.v, {vec}::DOUBLE[])
                   + list_dot_product({vec}::DOUBLE[], {vec}::DOUBLE[])) * 1000000) AS BIGINT) AS d2
FROM e JOIN short USING (vec_id)
ORDER BY d2, vec_id LIMIT 10
"""


def _hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous aggregate / hypertable rollup (plans/rollup.py): the
    day×event_type rollup served from a MAINTAINED table of mergeable
    partials (append-segment snapshot sink), not from raw events. Each
    ingest advances the table by O(batch); this serving query is an
    O(buckets) merge of integer partials — bit-identical to the direct
    aggregate the oracle runs, because counts and integer-cent sums
    are commutative monoids. The 100 TB shape: dashboards hit the
    rollup table; the event log is scanned once, at ingest."""
    return rollup.serve(spark, sf_dir)


_HYPERTABLE_SQL = """
SELECT cast(date_trunc('day', ts) AS TIMESTAMP) AS bucket_day, event_type,
       cast(count(*) AS BIGINT) AS n_events,
       cast(sum(cast(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY 1, 2
"""


def _hypertable_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day p50/p90 estimates served from the MAINTAINED histogram-
    sketch rollup (plans/rollup.py quantiles_rollup / serve_quantiles)
    — the quantile half of the continuous-aggregate story: exact
    medians don't merge, fixed-range bucket counts do, so each ingest
    appends O(buckets) counter partials and serving is a per-day
    cumulative walk over <=64 merged rows (PARTITIONED window — never
    a data-grain sort). Estimates are bucket left edges: deterministic
    integers × an exactly-representable width, bit-portable; the
    oracle replays the same bucketing and walk directly over events."""
    return rollup.serve_quantiles(spark, sf_dir, qs=(0.5, 0.9))


_HYPERTABLE_QUANTILES_SQL = """
WITH b AS (
    SELECT cast(date_trunc('day', ts) AS TIMESTAMP) AS bucket_day,
           cast(least(63, greatest(0, floor(value / 7.8125))) AS INTEGER) AS bucket
    FROM events WHERE value IS NOT NULL
), m AS (
    SELECT bucket_day, bucket, count(*) AS c FROM b GROUP BY 1, 2
), cum AS (
    SELECT bucket_day, bucket, c,
           sum(c) OVER (PARTITION BY bucket_day ORDER BY bucket
                        ROWS UNBOUNDED PRECEDING) AS cum,
           sum(c) OVER (PARTITION BY bucket_day) AS n
    FROM m
)
SELECT bucket_day, cast(max(n) AS BIGINT) AS n,
       min(CASE WHEN cum >= 0.5 * n THEN cast(bucket AS DOUBLE) * 7.8125 END) AS p50_est,
       min(CASE WHEN cum >= 0.9 * n THEN cast(bucket AS DOUBLE) * 7.8125 END) AS p90_est
FROM cum GROUP BY bucket_day
"""


def _hypertable_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type served from the MAINTAINED
    per-(day, type) HLL sketch partials (plans/rollup.py
    distinct_rollup / serve_distinct) — the DISTINCT member of the
    continuous-aggregate family beside the sum rollup and the
    histogram quantiles: exact distincts don't merge across segments,
    HLL registers do (register-max = set union), so each ingest
    appends O(buckets) small binary sketches and serving is one
    union-merge — raw user ids are scanned once, at ingest. Oracle
    pattern as hll_partition_rollup/approx_profile: each engine
    asserts its own estimate against its own exact answer and the
    deterministic verdicts are compared."""
    served = rollup.serve_distinct(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    exact = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("__eu"))
    return served.join(exact, "event_type").select(
        "event_type",
        "n_days",
        "n_events",
        (F.abs(F.col("users_est") - F.col("__eu")) <= F.col("__eu") * 0.05 + F.lit(1)).alias(
            "merged_users_ok"
        ),
    )


_HYPERTABLE_DISTINCT_SQL = """
SELECT event_type,
       count(DISTINCT CAST(ts AS DATE)) AS n_days,
       count(*) AS n_events,
       (abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
          <= count(DISTINCT user_id) * 0.05 + 1) AS merged_users_ok
FROM events GROUP BY event_type
"""


def _doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint (portable polynomial hash)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", text.rolling_fingerprint("text").alias("fp"))


_DOC_FP_SQL = """
SELECT doc_id, list_reduce(
    list_prepend(CAST(0 AS BIGINT),
      [CAST(ascii(c) AS BIGINT)
       FOR c IN regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '')]),
    (acc, c) -> (acc * 31 + c) % 2147483647) AS fp
FROM documents
"""


def _ivf_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-cell-probed approximate nearest neighbours, served from the
    AT-REST cell-partitioned layout (plans/pair_graph.ivf_embeddings):
    the probe's cell filter compiles to partition pruning, so the scan
    reads 4/16 of the files — the 100 TB ANN serving path. Value-
    checked: the oracle replays the full IVF schedule (centroids = 16
    lowest-id vectors, cell = argmax dot with lowest-cell tie-break,
    probe = top 4 cells by query dot, exact round-6 cosine top-10
    within); the layout is equality-tested against the inline
    assignment in tests/test_plan_properties.py."""
    at_rest = pair_graph.ivf_embeddings(spark, sf_dir, n_cells=16)
    cents = similarity._centroids(at_rest, "embedding", "vec_id", 16)
    probe = similarity.probe_cells(cents, _KNN_QUERY_VEC, 4)
    return similarity.brute_force_top_k(
        at_rest.filter(F.col("cell").isin(probe)), "embedding", "vec_id", _KNN_QUERY_VEC, k=10
    )


def _ivf_sql() -> str:
    vec = "[" + ", ".join(str(v) for v in _KNN_QUERY_VEC) + "]"
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (
    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv
    FROM e ORDER BY vec_id LIMIT 16
), d AS (
    SELECT e.vec_id, c.cell, list_dot_product(e.v, c.cv) AS dp FROM e CROSS JOIN c
), a AS (
    SELECT vec_id, cell FROM d
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dp DESC, cell) = 1
), pc AS (
    SELECT cell FROM c ORDER BY list_dot_product({vec}::DOUBLE[], cv) DESC, cell LIMIT 4
)
SELECT e.vec_id,
       round(list_dot_product(e.v, {vec}::DOUBLE[]) /
             (sqrt(list_dot_product(e.v, e.v)) *
              sqrt(list_dot_product({vec}::DOUBLE[], {vec}::DOUBLE[]))), 6) AS cos
FROM e JOIN a USING (vec_id)
WHERE a.cell IN (SELECT cell FROM pc)
ORDER BY cos DESC, vec_id LIMIT 10
"""


def _ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the IVF probe vs exact brute force per query
    (operators/similarity.py ann_recall_eval) — the ANN twin of
    minhash_eval: a fixed deterministic query batch (vec_id % 100)
    audits what the 4-of-16-cell probe misses. The oracle replays the
    full IVF schedule and both top-k arms."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ann_recall_eval(
        emb, "embedding", "vec_id", query_mod=100, k=10, n_cells=16, n_probe=4
    )


_ANN_RECALL_SQL = """
WITH e0 AS (SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings),
c AS (
    SELECT row_number() OVER (ORDER BY vid) - 1 AS cell, v AS cv
    FROM e0 ORDER BY vid LIMIT 16
), a AS (
    SELECT e0.vid, e0.v, c.cell
    FROM e0 CROSS JOIN c
    QUALIFY row_number() OVER (PARTITION BY e0.vid
        ORDER BY list_dot_product(e0.v, c.cv) DESC, c.cell) = 1
), q AS (
    SELECT vid AS query_id, v AS qv FROM e0 WHERE vid % 100 = 0 AND vid < 50000
), probe AS (
    SELECT q.query_id, q.qv, c.cell
    FROM q CROSS JOIN c
    QUALIFY row_number() OVER (PARTITION BY q.query_id
        ORDER BY list_dot_product(q.qv, c.cv) DESC, c.cell) <= 4
), ivf AS (
    SELECT probe.query_id, a.vid
    FROM probe JOIN a USING (cell)
    QUALIFY row_number() OVER (PARTITION BY probe.query_id
        ORDER BY round(list_dot_product(probe.qv, a.v) /
                       (sqrt(list_dot_product(probe.qv, probe.qv)) *
                        sqrt(list_dot_product(a.v, a.v))), 6) DESC, a.vid) <= 10
), brute AS (
    SELECT q.query_id, e0.vid
    FROM q CROSS JOIN e0
    QUALIFY row_number() OVER (PARTITION BY q.query_id
        ORDER BY round(list_dot_product(q.qv, e0.v) /
                       (sqrt(list_dot_product(q.qv, q.qv)) *
                        sqrt(list_dot_product(e0.v, e0.v))), 6) DESC, e0.vid) <= 10
), h AS (
    SELECT ivf.query_id, count(*) AS n_hits
    FROM ivf JOIN brute ON ivf.query_id = brute.query_id AND ivf.vid = brute.vid
    GROUP BY ivf.query_id
)
SELECT q.query_id, cast(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(coalesce(h.n_hits, 0) / 10.0, 6) AS recall_at_k
FROM q LEFT JOIN h USING (query_id)
"""


def _ivf_probe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n_probe tuning table (operators/similarity.py ivf_probe_sweep):
    mean recall@10 at probe counts 1/2/4/8 over the deterministic
    query batch — the knob-sweep an operator reads before serving an
    IVF configuration (ann_recall_eval audits one point; this draws
    the curve). Assignment, brute baseline and the max-probe candidate
    join are computed once and shared; each probe point is a rank
    filter + top-k window over the same candidates. Exact-integer hit
    sums; the mean is a division of exact integers."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_probe_sweep(
        emb, "embedding", "vec_id", query_mod=100, k=10, n_cells=16, probes=(1, 2, 4, 8)
    )


_IVF_PROBE_SWEEP_SQL = """
WITH e0 AS (SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings),
c AS (
    SELECT row_number() OVER (ORDER BY vid) - 1 AS cell, v AS cv
    FROM e0 ORDER BY vid LIMIT 16
), a AS (
    SELECT e0.vid, e0.v, c.cell
    FROM e0 CROSS JOIN c
    QUALIFY row_number() OVER (PARTITION BY e0.vid
        ORDER BY list_dot_product(e0.v, c.cv) DESC, c.cell) = 1
), q AS (
    SELECT vid AS query_id, v AS qv FROM e0 WHERE vid % 100 = 0 AND vid < 50000
), nq AS (SELECT cast(count(*) AS BIGINT) AS n FROM q),
pr AS (
    SELECT q.query_id, q.qv, c.cell,
           row_number() OVER (PARTITION BY q.query_id
               ORDER BY list_dot_product(q.qv, c.cv) DESC, c.cell) AS cell_rank
    FROM q CROSS JOIN c
    QUALIFY cell_rank <= 8
), cand AS (
    SELECT pr.query_id, a.vid, pr.cell_rank,
           round(list_dot_product(pr.qv, a.v) /
                 (sqrt(list_dot_product(pr.qv, pr.qv)) *
                  sqrt(list_dot_product(a.v, a.v))), 6) AS cos
    FROM pr JOIN a USING (cell)
), brute AS (
    SELECT q.query_id, e0.vid
    FROM q CROSS JOIN e0
    QUALIFY row_number() OVER (PARTITION BY q.query_id
        ORDER BY round(list_dot_product(q.qv, e0.v) /
                       (sqrt(list_dot_product(q.qv, q.qv)) *
                        sqrt(list_dot_product(e0.v, e0.v))), 6) DESC, e0.vid) <= 10
), ivf1 AS (
    SELECT 1 AS n_probe, query_id, vid FROM cand WHERE cell_rank <= 1
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vid) <= 10
), ivf2 AS (
    SELECT 2 AS n_probe, query_id, vid FROM cand WHERE cell_rank <= 2
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vid) <= 10
), ivf4 AS (
    SELECT 4 AS n_probe, query_id, vid FROM cand WHERE cell_rank <= 4
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vid) <= 10
), ivf8 AS (
    SELECT 8 AS n_probe, query_id, vid FROM cand WHERE cell_rank <= 8
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vid) <= 10
), allp AS (
    SELECT * FROM ivf1 UNION ALL SELECT * FROM ivf2
    UNION ALL SELECT * FROM ivf4 UNION ALL SELECT * FROM ivf8
), h AS (
    SELECT n_probe, cast(count(*) AS BIGINT) AS sum_hits
    FROM allp JOIN brute USING (query_id, vid) GROUP BY n_probe
)
SELECT cast(p.n_probe AS INTEGER) AS n_probe,
       nq.n AS n_queries,
       cast(coalesce(h.sum_hits, 0) AS BIGINT) AS sum_hits,
       round(cast(coalesce(h.sum_hits, 0) AS DOUBLE) / (nq.n * 10), 6) AS mean_recall_at_k
FROM (VALUES (1), (2), (4), (8)) p(n_probe)
LEFT JOIN h ON h.n_probe = p.n_probe, nq
"""


def _k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the events stream: for each
    quasi-identifier cell (event_type × day), how many distinct users
    share it — a cell with fewer than k=5 users re-identifies its
    members by the QI alone (the privacy gate next to pii_scrub: scrub
    removes direct identifiers, this measures indirect ones). One
    two-key hash aggregate; output is O(|QI cells|)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .withColumn("at_risk", (F.col("n_users") < 5).cast("int"))
    )


_K_ANONYMITY_SQL = """
SELECT event_type, cast(ts AS DATE) AS day,
       cast(count(*) AS BIGINT) AS n_events,
       cast(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CASE WHEN count(DISTINCT user_id) < 5 THEN 1 ELSE 0 END AS at_risk
FROM events
GROUP BY event_type, cast(ts AS DATE)
"""


def _d3_chained_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 — chained tolerated-failure lookups (NFC-e shape): three left
    joins, each nullable on miss."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey, "left")
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left")
        .select("o_orderkey", "c_name", "n_name", "r_name")
    )


_D3_SQL = """
SELECT o_orderkey, c_name, n_name, r_name
FROM orders
LEFT JOIN customer ON o_custkey = c_custkey
LEFT JOIN nation ON c_nationkey = n_nationkey
LEFT JOIN region ON n_regionkey = r_regionkey
"""


def _g4_symmetric_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4 — symmetric difference of two key sets, reported as a one-row
    count summary: when the sets are equal, sym_diff_n = 0 is an
    asserted VALUE rather than a vacuously-matching empty result. One
    full-outer join on distinct keys; constant-size output at any
    scale. (setops.symmetric_difference returns the row set itself and
    stays tested at the operator level.)"""
    cust = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("id"))
        .distinct()
        .withColumn("__a", F.lit(1))
    )
    ocust = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("id"))
        .distinct()
        .withColumn("__b", F.lit(1))
    )
    j = cust.join(ocust, "id", "full_outer")
    only_a = F.sum(F.when(F.col("__b").isNull(), 1).otherwise(0))
    only_b = F.sum(F.when(F.col("__a").isNull(), 1).otherwise(0))
    return j.agg(
        only_a.alias("only_customers"),
        only_b.alias("only_orders"),
        F.sum(F.when(F.col("__a").isNotNull() & F.col("__b").isNotNull(), 1).otherwise(0)).alias(
            "common_n"
        ),
        (only_a + only_b).alias("sym_diff_n"),
    )


_G4_SQL = """
WITH a AS (SELECT DISTINCT c_custkey AS id FROM customer),
     b AS (SELECT DISTINCT o_custkey AS id FROM orders),
     j AS (SELECT a.id AS ida, b.id AS idb FROM a FULL OUTER JOIN b ON a.id = b.id)
SELECT cast(sum(CASE WHEN idb IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS only_customers,
       cast(sum(CASE WHEN ida IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS only_orders,
       cast(sum(CASE WHEN ida IS NOT NULL AND idb IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS common_n,
       cast(sum(CASE WHEN idb IS NULL THEN 1 ELSE 0 END)
         + sum(CASE WHEN ida IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS sym_diff_n
FROM j
"""


def _e7_distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7 — distinct-set extraction over two columns."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select("o_orderstatus", "o_orderpriority").distinct()


_E7_SQL = "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders"


def _w3_pick_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — first-match pick (pedidos[0] analogue): first order per
    customer by date."""
    orders = load_table(spark, sf_dir, "orders")
    return windows.pick_first(
        orders.select("o_custkey", "o_orderkey", "o_orderdate"),
        "o_custkey",
        [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()],
    )


_W3_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate FROM (
    SELECT o_custkey, o_orderkey, o_orderdate,
           row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
    FROM orders
) WHERE rn = 1
"""


def _f2_contact_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 — 'dd/MM/yyyy HH:mm:ss' contact-datetime parse roundtrip."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id", F.date_format("ts", "dd/MM/yyyy HH:mm:ss").alias("data_criacao")
    )
    return base.select(
        "event_id", "data_criacao", scalar.parse_contact_datetime("data_criacao").alias("criado_em")
    )


_F2_SQL = """
WITH base AS (
    SELECT event_id, strftime(ts, '%d/%m/%Y %H:%M:%S') AS data_criacao FROM events
)
SELECT event_id, data_criacao,
       try_strptime(data_criacao, '%d/%m/%Y %H:%M:%S') AS criado_em
FROM base
"""


def _f11_split_name_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 — split-based filename parse: ts = parts[-6],
    uuid = join(parts[-5:]) (api_to_gcs/main.py:141-142)."""
    orders = load_table(spark, sf_dir, "orders")
    m = F.md5(F.col("o_orderkey").cast("string"))
    uuid_dashed = F.concat_ws(
        "-",
        F.substring(m, 1, 8),
        F.substring(m, 9, 4),
        F.substring(m, 13, 4),
        F.substring(m, 17, 4),
        F.substring(m, 21, 12),
    )
    name = F.concat(
        F.lit("z316-tiny-api-"),
        F.col("o_orderkey").cast("string"),
        F.lit("-pdv-"),
        scalar.format_compact_ts("o_orderdate"),
        F.lit("-"),
        uuid_dashed,
        F.lit(".json"),
    )
    base = load_table(spark, sf_dir, "orders").select("o_orderkey", name.alias("file_name"))
    arr = F.split(F.regexp_replace("file_name", r"\.json$", ""), "-")
    n = F.size(arr)
    return base.select(
        "o_orderkey",
        "file_name",
        F.try_element_at(arr, n - F.lit(5)).alias("ts_part"),
        F.array_join(F.slice(arr, n - F.lit(4), 5), "-").alias("uuid_part"),
    )


_F11_SQL = r"""
WITH base AS (
    SELECT o_orderkey,
           'z316-tiny-api-' || cast(o_orderkey AS VARCHAR) || '-pdv-' ||
           strftime(o_orderdate, '%Y%m%dT%H%M%S') || '-' ||
           substr(md5(cast(o_orderkey AS VARCHAR)), 1, 8) || '-' ||
           substr(md5(cast(o_orderkey AS VARCHAR)), 9, 4) || '-' ||
           substr(md5(cast(o_orderkey AS VARCHAR)), 13, 4) || '-' ||
           substr(md5(cast(o_orderkey AS VARCHAR)), 17, 4) || '-' ||
           substr(md5(cast(o_orderkey AS VARCHAR)), 21, 12) || '.json' AS file_name
    FROM orders
),
p AS (
    SELECT o_orderkey, file_name,
           str_split(regexp_replace(file_name, '\.json$', ''), '-') AS parts
    FROM base
)
SELECT o_orderkey, file_name,
       parts[len(parts) - 5] AS ts_part,
       array_to_string(parts[len(parts) - 4:], '-') AS uuid_part
FROM p
"""


def _rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregate (engine surface beyond the reference's E-ops)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        # exact cents (round-budget gate r10): o_totalprice is 2 dp,
        # so the cent sum is an exact bigint — not an order-dependent
        # rounded float sum
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "total_value_cents"
        ),
    )


_ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       cast(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_value_cents
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def _cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregate — all 2^n grouping sets in one pass."""
    orders = load_table(spark, sf_dir, "orders")
    n = F.count(F.lit(1))
    cents = F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        n.alias("n_orders"),
        # ONE unrounded shared float expression over an exact cent sum
        # (round-budget gate r10): round(avg(double), 4) was a rounded
        # order-dependent float division — the revenue_bridge class
        (cents.cast("double") / n.cast("double")).alias("avg_value_cents"),
    )


_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS avg_value_cents
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def _asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest click at-or-before each purchase, per user
    (windowed carry-forward — one shuffle, no range join)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.round("value", 4).alias("purchase_value")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.round("value", 4).alias("click_value")
    )
    out = joins.asof_join(
        purchases, clicks, key="user_id", ts="ts", tiebreak="event_id", carry=["click_value"]
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "purchase_value",
        F.col("ts_r").alias("click_ts"),
        F.col("event_id_r").alias("click_event_id"),
        F.col("click_value_r").alias("click_value"),
    )


# Tie-break pinned to (b.ts, b.event_id) max, matching the Spark
# window's deterministic carry order.
_ASOF_SQL = """
SELECT a.event_id, a.user_id, a.ts, round(a.value, 4) AS purchase_value,
       b.ts AS click_ts, b.event_id AS click_event_id, round(b.value, 4) AS click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') a
JOIN (SELECT * FROM events WHERE event_type = 'click') b
  ON a.user_id = b.user_id AND b.ts <= a.ts
QUALIFY row_number() OVER (PARTITION BY a.event_id ORDER BY b.ts DESC, b.event_id DESC) = 1
"""


def _range_join_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join via time-bucketed equi-join: clicks in the hour
    before each purchase, per user (no nested-loop, no theta join)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("value").alias("click_value")
    )
    paired = joins.range_join_bucketed(
        purchases, clicks, key="user_id", left_ts="ts", right_ts="click_ts", lower_s=3600, upper_s=0
    )
    return paired.groupBy("event_id", "user_id", "ts").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.round(F.sum("click_value"), 4).alias("click_value_sum"),
    )


_RANGE_JOIN_SQL = """
SELECT a.event_id, a.user_id, a.ts, count(*) AS n_clicks,
       round(sum(b.value), 4) AS click_value_sum
FROM (SELECT * FROM events WHERE event_type = 'purchase') a
JOIN (SELECT * FROM events WHERE event_type = 'click') b
  ON a.user_id = b.user_id
 AND b.ts >= a.ts - INTERVAL 1 HOUR AND b.ts < a.ts
GROUP BY a.event_id, a.user_id, a.ts
"""


def _lead_lag_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag sequence analysis: inter-event gap per user and
    session-break flag (gap > 30 min) — one shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    return ev.select("event_id", "user_id", "ts", "event_type").withColumns(
        {
            "gap_s": F.round(gap, 4),
            "is_session_start": F.coalesce(gap > 1800.0, F.lit(True)),
        }
    )


_LEAD_LAG_SQL = """
SELECT event_id, user_id, ts, event_type,
       round(epoch(ts) - lag(epoch(ts)) OVER w, 4) AS gap_s,
       coalesce((epoch(ts) - lag(epoch(ts)) OVER w) > 1800.0, TRUE) AS is_session_start
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
"""


def _session_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization as ID assignment: cumulative sum of gap-breaks
    (> 30 min) per user. Unlike session_window (which aggregates),
    this labels EVERY event with its session — the form downstream
    training pipelines join on. Two window passes, one shuffle (both
    windows share the user_id partitioning)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    is_break = F.when(gap.isNull() | (gap > 1800.0), 1).otherwise(0)
    return (
        ev.select("event_id", "user_id", "ts", is_break.alias("brk"))
        .withColumn(
            "session_seq",
            F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
        .select("event_id", "user_id", "ts", "session_seq")
    )


_SESSION_IDS_SQL = """
WITH g AS (
  SELECT event_id, user_id, ts,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w IS NULL
                OR epoch(ts) - lag(epoch(ts)) OVER w > 1800.0
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
)
SELECT event_id, user_id, ts,
       cast(sum(brk) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
FROM g
"""


def _rolling_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-frame analytic: per customer, each order's trailing-7-day
    order-value sum. RANGE frames need a numeric ordering key in Spark,
    so the frame runs over epoch seconds — semantically identical to
    RANGE BETWEEN INTERVAL 7 DAYS in the oracle."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp(F.col("o_orderdate").cast("timestamp")))
        .rangeBetween(-7 * 86400, 0)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 4).alias("rev_7d"),
    )


_ROLLING_7D_SQL = """
SELECT o_orderkey, o_custkey, o_orderdate,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate
         RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW), 4) AS rev_7d
FROM orders
"""


def _q4_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4 shape: EXISTS → left-semi join, then count by priority.
    The semi join keeps lineitem key-only (no payload shuffle)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    window = orders.filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        window.join(returned, window.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


_Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


def _q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10 shape: fact-fact join reduced by pushed-down filters,
    broadcast dims for customer attribution of returned-item revenue."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    revenue = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
            ).select("o_orderkey", "o_custkey"),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("o_custkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
    )
    return revenue.join(
        F.broadcast(
            cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey).select(
                "c_custkey", "c_name", "c_acctbal", "n_name"
            )
        ),
        revenue.o_custkey == F.col("c_custkey"),
    ).select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")


_Q10_SQL = """
SELECT c_custkey, c_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
"""


def _q12_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12 shape: join + conditional (CASE) counts per class."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter((F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01"))
        .join(orders.select("o_orderkey", "o_orderpriority"), li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


_Q12_SQL = """
SELECT l_returnflag,
       cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
           AS high_line_count,
       cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
           AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_returnflag
"""


def _q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16 shape: distinct-aggregate (count of distinct suppliers
    per part class); the distinct folds into a two-phase aggregate, no
    collect_set blow-up."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(
            F.broadcast(
                part.filter(
                    (F.col("p_brand") != "Brand#45") & F.col("p_size").isin(1, 4, 7)
                ).select("p_partkey", "p_brand", "p_type", "p_size")
            ),
            li.l_partkey == part.p_partkey,
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


_Q16_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#45' AND p_size IN (1, 4, 7)
GROUP BY p_brand, p_type, p_size
"""


def _grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS: the general multi-grain aggregate (rollup/cube are
    its specializations) — one pass over the fact, expand-then-agg."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n,
               cast(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n,
               cast(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def _pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (D5's regroup generalized): order counts per priority,
    one column per status. Explicit value list keeps it single-pass
    (no extra distinct-scan job) and schema-stable at any scale."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("n_f"),
            F.coalesce("O", F.lit(0)).alias("n_o"),
            F.coalesce("P", F.lit(0)).alias("n_p"),
        )
    )


_PIVOT_SQL = """
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
FROM orders GROUP BY o_orderpriority
"""


def _a4_union_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/G5 — paginated full scan as a union of page frames: the
    transport detail (pages) disappears into unionByName + one agg."""
    cust = load_table(spark, sf_dir, "customer")
    pages = [
        cust.filter(F.col("c_custkey") % 3 == p).withColumn("page", F.lit(p + 1))
        for p in range(3)
    ]
    return setops.union_pages(pages).groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("page").alias("n_pages"),
        F.round(F.sum("c_acctbal"), 4).alias("acctbal_total"),
    )


_A4_UNION_SQL = """
SELECT c_mktsegment, count(*) AS n, count(DISTINCT (c_custkey % 3) + 1) AS n_pages,
       round(sum(c_acctbal), 4) AS acctbal_total
FROM customer GROUP BY c_mktsegment
"""


def _f16_url_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F16 — URL assembly + token sanitize (api_to_gcs/main.py:59,205-231):
    build the API URL per order, then strip the token for log output."""
    orders = load_table(spark, sf_dir, "orders")
    url = F.concat(
        F.lit("https://api.example.com/pedido.obter.php?token=SECRET&id="),
        F.col("o_orderkey").cast("string"),
        F.lit("&formato=json"),
    )
    return orders.select(
        "o_orderkey",
        url.alias("url"),
        F.split(url, r"\?token=").getItem(0).alias("safe_url"),
        F.regexp_replace(url, r"token=[^&]*", "token=***").alias("masked_url"),
    )


_F16_SQL = """
SELECT o_orderkey,
       'https://api.example.com/pedido.obter.php?token=SECRET&id=' || o_orderkey || '&formato=json' AS url,
       str_split('https://api.example.com/pedido.obter.php?token=SECRET&id=' || o_orderkey || '&formato=json', '?token=')[1] AS safe_url,
       regexp_replace('https://api.example.com/pedido.obter.php?token=SECRET&id=' || o_orderkey || '&formato=json', 'token=[^&]*', 'token=***') AS masked_url
FROM orders
"""


def _stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for training-data curation:
    md5-hash-mod bucketing keeps ~20% per language stratum, stable
    across runs/engines/cluster sizes (no RNG, no seed coordination —
    the sample is a pure function of the key, so re-runs and late
    arrivals land identically; portable to the DuckDB oracle)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % 100
    return (
        docs.withColumn("bucket", bucket)
        .filter(F.col("bucket") < 20)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            # unrounded shared division of exact integer moments (r11
            # lint: round(avg(int),4) was the cube_agg class)
            (
                F.sum("n_chars").cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("avg_chars"),
        )
    )


_STRATIFIED_SQL = """
SELECT lang, count(*) AS n_sampled,
       CAST(cast(sum(n_chars) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_chars
FROM documents
WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 20
GROUP BY lang
"""


def _dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (md5-hex-mod bucket):
    a pure function of doc_id, so re-runs / backfills / other engines
    assign identically — no RNG, no seed registry. Narrow map."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.dataset_split(docs, "doc_id").select("doc_id", "bucket", "split")


_DATASET_SPLIT_SQL = """
SELECT doc_id, bucket,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT doc_id,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS bucket
      FROM documents)
"""


def _doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (sequence-packing precursor):
    chunk c covers tokens [c*24, c*24+32); narrow explode, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.chunk_documents(docs, "text", "doc_id", chunk_tokens=32, stride=24)


_DOC_CHUNKS_SQL = r"""
WITH t AS (
    SELECT doc_id,
           string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
    FROM documents
), n AS (
    SELECT doc_id, toks,
           1 + CAST(floor((greatest(len(toks) - 32, 0) + 23) / 24.0) AS INT) AS n_chunks
    FROM t
)
SELECT doc_id, u.c AS chunk_idx,
       array_to_string(toks[u.c * 24 + 1 : u.c * 24 + 32], ' ') AS chunk_text,
       len(toks[u.c * 24 + 1 : u.c * 24 + 32]) AS n_tokens
FROM n, unnest(generate_series(0, n_chunks - 1)) AS u(c)
"""


def _sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk → token-budget pack assignment (split/shard-local running
    sum): the step between chunking and writing training shards. The
    shard key bounds every window partition, so packing parallelizes
    at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    split_docs = corpus.dataset_split(docs, "doc_id")
    chunks = corpus.chunk_documents(
        split_docs, "text", "doc_id", chunk_tokens=32, stride=24, carry_cols=("split",)
    )
    return corpus.sequence_pack(
        chunks, "split", "doc_id", "chunk_idx", "n_tokens", budget=256, n_shards=4
    )


_SEQUENCE_PACK_SQL = r"""
WITH t AS (
    SELECT doc_id,
           CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 80 THEN 'train'
                WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 90 THEN 'val'
                ELSE 'test' END AS split,
           ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 4 AS shard,
           string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
    FROM documents
), n AS (
    SELECT doc_id, split, shard, toks,
           1 + CAST(floor((greatest(len(toks) - 32, 0) + 23) / 24.0) AS INT) AS n_chunks
    FROM t
), ch AS (
    SELECT doc_id, split, shard, u.c AS chunk_idx,
           len(toks[u.c * 24 + 1 : u.c * 24 + 32]) AS n_tokens
    FROM n, unnest(generate_series(0, n_chunks - 1)) AS u(c)
), packed AS (
    SELECT split, shard,
           CAST(floor((sum(n_tokens) OVER (
                    PARTITION BY split, shard
                    ORDER BY doc_id, chunk_idx
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) - n_tokens) / 256.0) AS BIGINT) AS pack_id,
           n_tokens
    FROM ch
)
SELECT split, shard, pack_id, count(*) AS n_chunks,
       cast(sum(n_tokens) AS BIGINT) AS pack_tokens
FROM packed GROUP BY split, shard, pack_id
"""


def _bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram LM / tokenizer corpus statistics: top-10 bigrams per
    language with count ≥ 3. The bigram build is an indexed transform
    over the token array (slice guards single-token docs — note
    sequence(1,0) in Spark DESCENDS, so it is not usable as an empty
    guard); one explode, one codegen hash aggregate, and a window over
    the small (lang, bigram) relation. Deterministic (count desc,
    bigram asc) ordering keeps top-k engine-portable."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " ")
    bigrams = F.expr(
        "transform(slice(__t, 1, size(__t) - 1), (x, i) -> concat(x, ' ', element_at(__t, i + 2)))"
    )
    exploded = (
        docs.select("lang", toks.alias("__t"))
        .select("lang", F.explode(bigrams).alias("bigram"))
    )
    counts = exploded.groupBy("lang", "bigram").agg(F.count(F.lit(1)).alias("n")).filter(
        F.col("n") >= 3
    )
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("bigram").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("lang", "rank", "bigram", "n")
    )


_BIGRAM_SQL = r"""
WITH t AS (
    SELECT lang,
           string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
    FROM documents
), bg AS (
    SELECT lang, unnest([toks[i] || ' ' || toks[i + 1]
                         FOR i IN generate_series(1, len(toks) - 1)]) AS bigram
    FROM t
), c AS (
    SELECT lang, bigram, count(*) AS n FROM bg GROUP BY 1, 2 HAVING count(*) >= 3
)
SELECT lang, rank, bigram, n
FROM (SELECT lang, bigram, n,
             row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rank
      FROM c)
WHERE rank <= 10
"""


def _weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sample (∝ n_chars): Efraimidis–Spirbas
    A-ES over the seedless md5 uniform — same sample on every engine
    and every re-run; top-k via TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.weighted_sample(docs, "doc_id", "n_chars", k=20)


_WEIGHTED_SAMPLE_SQL = """
SELECT doc_id, n_chars,
       round(pow((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT + 1.0) / 4294967296.0,
                 1.0 / n_chars), 9) AS __key
FROM documents
ORDER BY __key DESC, doc_id
LIMIT 20
"""


def _tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source top-5 TF-IDF terms: two codegen hash aggregates over
    the exploded token relation + a broadcast group count; deterministic
    (score desc, term asc) tie-break keeps it engine-portable."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.tfidf_top_terms(docs, "text", "source", k=5)


_TFIDF_SQL = r"""
WITH tok AS (
    SELECT source,
           unnest(string_split_regex(trim(regexp_replace(lower(coalesce(text, '')), '\s+', ' ', 'g')), ' ')) AS term
    FROM documents
), tf AS (
    SELECT source, term, count(*) AS tf FROM tok GROUP BY 1, 2
), df_ AS (
    SELECT term, count(DISTINCT source) AS df FROM tok GROUP BY 1
), ng AS (
    SELECT count(DISTINCT source) AS n FROM documents
)
SELECT source, rank, term, tf, df, score
FROM (
    SELECT source, term, tf, df,
           round(tf * ln(n / df), 6) AS score,
           row_number() OVER (
               PARTITION BY source
               ORDER BY round(tf * ln(n / df), 6) DESC, term
           ) AS rank
    FROM tf JOIN df_ USING (term) CROSS JOIN ng
)
WHERE rank <= 5
"""


def _percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (sort-based aggregate;
    use approx_percentile at lake scale when exactness can yield)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90_price"),
    )


_PERCENTILE_SQL = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
FROM lineitem GROUP BY l_returnflag
"""


def _q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-style: filtered 3-way join, revenue top-10."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(
            (F.col("c_mktsegment") == "BUILDING")
            & (F.col("o_orderdate") < "1998-01-01")
            & (F.col("l_shipdate") > "1998-01-01")
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


_Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


def _q5_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-style: multi-dimension join, revenue per nation."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
    )


_Q5_SQL = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


def _json_ingest_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/F14/F15 — nested-JSON ingest: synthesize → from_json →
    explode(itens) → rollup. Oracle computes the same result straight
    from lineitem: equality proves the JSON roundtrip is lossless."""
    return json_ingest.json_ingest_rollup(spark, sf_dir)


_JSON_INGEST_SQL = """
SELECT l_orderkey AS numero, o_orderstatus AS situacao,
       count(*) AS n_itens,
       round(sum(l_extendedprice), 4) AS valor_total,
       round(sum(l_extendedprice * l_quantity), 4) AS base_total
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_orderkey, o_orderstatus
"""


def _c5_validate_or_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 — validate-or-delete sweep: the quarantined (invalid) rows."""
    ev = load_table(spark, sf_dir, "events")
    valid = (
        F.col("event_id").isNotNull()
        & F.col("value").isNotNull()
        & (F.col("value") >= 0)
        & F.col("event_type").isin("purchase", "signup")
    )
    return ev.filter(~valid).select("event_id", "event_type", "value")


_C5_SQL = """
SELECT event_id, event_type, value FROM events
WHERE NOT (event_id IS NOT NULL AND value IS NOT NULL AND value >= 0
           AND event_type IN ('purchase', 'signup'))
"""


def _multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing — binary payload → mapInPandas stub decode.

    The payload is the document text encoded as bytes (stand-in for an
    image blob); every stub feature is a pure function of byte length,
    so the Arrow-batched Pandas path is oracle-checkable in plain SQL.
    """
    return multimodal.extract_features(_synth_media(spark, sf_dir))


_MULTIMODAL_SQL = """
SELECT doc_id AS media_id,
       cast(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       cast(octet_length(encode(text)) % 640 AS INTEGER) AS fake_width,
       cast((octet_length(encode(text)) * 7) % 480 AS INTEGER) AS fake_height,
       cast((octet_length(encode(text)) * 131) % 2147483647 AS BIGINT) AS byte_checksum
FROM documents
"""


def _synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared synthetic media relation for the multimodal entries (text
    bytes standing in for blobs; every downstream stub feature is a
    pure function of octet length, hence SQL-checkable)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("image").alias("media_type"),
        F.concat(F.lit("synth://"), F.col("source")).alias("source_uri"),
    )


def _multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing (operators/multimodal.py
    frame_sample_plan): one row per every-10th frame index of each
    blob — the distribution grain a real decoder would fill with
    pixels; explode keeps it a narrow Generate, no shuffle."""
    return multimodal.frame_sample_plan(_synth_media(spark, sf_dir), every_nth=10)


_MULTIMODAL_FRAMES_SQL = """
WITH m AS (
  SELECT doc_id AS media_id, 'image' AS media_type,
         greatest(cast(floor(octet_length(encode(text)) / 100) AS INTEGER), 1) AS n_frames
  FROM documents
)
SELECT media_id, media_type, cast(g.f AS INTEGER) AS frame_idx
FROM m, LATERAL (SELECT unnest(generate_series(0, n_frames - 1, 10)) AS f) g
"""


def _multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize plan over the stub-decoded dims
    (operators/multimodal.py resize_plan): output geometry + RGB byte
    estimate per blob — the metadata the shard packer consumes; the
    pixel kernel itself is the documented mapInPandas stub shape."""
    return multimodal.resize_plan(_synth_media(spark, sf_dir), target=64)


_MULTIMODAL_RESIZE_SQL = """
WITH d AS (
  SELECT doc_id AS media_id, 'image' AS media_type,
         greatest(octet_length(encode(text)) % 640, 1) AS w0,
         greatest((octet_length(encode(text)) * 7) % 480, 1) AS h0
  FROM documents
), s AS (
  SELECT *, greatest(w0, h0) AS l,
         CASE WHEN greatest(w0, h0) <= 64 THEN w0
              ELSE greatest(floor(w0 * 64 / greatest(w0, h0)), 1) END AS ow,
         CASE WHEN greatest(w0, h0) <= 64 THEN h0
              ELSE greatest(floor(h0 * 64 / greatest(w0, h0)), 1) END AS oh
  FROM d
)
SELECT media_id, media_type,
       cast(w0 AS INTEGER) AS in_width, cast(h0 AS INTEGER) AS in_height,
       cast(ow AS INTEGER) AS out_width, cast(oh AS INTEGER) AS out_height,
       cast(ow * oh * 3 AS BIGINT) AS est_bytes
FROM s
"""


def _f14_pubsub_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14/A6 — Pub/Sub envelope: base64(json) → unbase64 → from_json.

    The envelope is synthesized deterministically (same string in the
    oracle), so the check proves the decode+parse chain, not the synth.
    """
    orders = load_table(spark, sf_dir, "orders")
    payload = F.concat(
        F.lit('{"dados_id": '),
        F.col("o_orderkey").cast("string"),
        F.lit(', "status": "'),
        F.col("o_orderstatus"),
        F.lit('"}'),
    )
    enveloped = orders.select("o_orderkey", F.base64(F.encode(payload, "UTF-8")).alias("data_b64"))
    schema = "dados_id BIGINT, status STRING"
    decoded = enveloped.select(
        "o_orderkey",
        F.from_json(F.unbase64("data_b64").cast("string"), schema).alias("msg"),
    )
    return decoded.select(
        "o_orderkey",
        F.col("msg.dados_id").alias("dados_id"),
        F.col("msg.status").alias("status"),
    )


_F14_SQL = """
WITH env AS (
    SELECT o_orderkey,
           to_base64(encode('{"dados_id": ' || cast(o_orderkey AS VARCHAR) ||
                            ', "status": "' || o_orderstatus || '"}')) AS data_b64
    FROM orders
)
SELECT o_orderkey,
       cast(json_extract_string(decode(from_base64(data_b64)), '$.dados_id') AS BIGINT) AS dados_id,
       json_extract_string(decode(from_base64(data_b64)), '$.status') AS status
FROM env
"""


def _w2_keeprule_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 (full form) — keep-rule dedup with backfill demotion.

    Reference api_to_gcs-checker.py:141-173: duplicates of one dados_id
    keep the MIN real timestamp, but backfill copies (T000000 stamps)
    lose to any real-timestamped copy. Here: events per (user, type),
    rows with minute==0 marked as backfill, order (is_backfill asc,
    ts asc, id asc).
    """
    ev = load_table(spark, sf_dir, "events")
    marked = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.when(F.minute("ts") == 0, F.lit(1)).otherwise(F.lit(0)).alias("is_backfill"),
    )
    return windows.dedup_keep_rule(
        marked,
        ["user_id", "event_type"],
        [F.col("is_backfill").asc(), F.col("ts").asc(), F.col("event_id").asc()],
    )


_W2B_SQL = """
SELECT event_id, user_id, event_type, ts, is_backfill FROM (
    SELECT event_id, user_id, event_type, ts,
           CASE WHEN minute(ts) = 0 THEN 1 ELSE 0 END AS is_backfill,
           row_number() OVER (
               PARTITION BY user_id, event_type
               ORDER BY CASE WHEN minute(ts) = 0 THEN 1 ELSE 0 END, ts, event_id
           ) AS rn
    FROM events
) WHERE rn = 1
"""


def _c2_status_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 — API status-code dispatch as a CASE disposition column.

    Reference api_to_gcs/main.py:76-90: '3'→ok, '2'→hard fail,
    '1'+codigo_erro='1'→auth fail, else retry. Statuses synthesized
    deterministically from the order key.
    """
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    status = F.when(k % 10 < 6, F.lit("3")).when(k % 10 < 8, F.lit("2")).otherwise(F.lit("1"))
    cod = F.when(k % 2 == 0, F.lit("1")).otherwise(F.lit("0"))
    base = orders.select("o_orderkey", status.alias("status_processamento"), cod.alias("codigo_erro"))
    disp = (
        F.when(F.col("status_processamento") == "3", F.lit("ok"))
        .when(F.col("status_processamento") == "2", F.lit("validation_error"))
        .when(
            (F.col("status_processamento") == "1") & (F.col("codigo_erro") == "1"),
            F.lit("auth_error"),
        )
        .otherwise(F.lit("retry"))
    )
    return base.withColumn("disposition", disp)


_C2_SQL = """
WITH base AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 10 < 6 THEN '3'
                WHEN o_orderkey % 10 < 8 THEN '2' ELSE '1' END AS status_processamento,
           CASE WHEN o_orderkey % 2 = 0 THEN '1' ELSE '0' END AS codigo_erro
    FROM orders
)
SELECT o_orderkey, status_processamento, codigo_erro,
       CASE WHEN status_processamento = '3' THEN 'ok'
            WHEN status_processamento = '2' THEN 'validation_error'
            WHEN status_processamento = '1' AND codigo_erro = '1' THEN 'auth_error'
            ELSE 'retry' END AS disposition
FROM base
"""


def _a5_manifest_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — bucket-listing scan: blob manifest → parse names → per-folder
    id sets (gcs_to_bq-checker.py:15-27 shape, driven from orders)."""
    orders = load_table(spark, sf_dir, "orders")
    folder = F.concat(
        scalar.format_compact_ts("o_orderdate"),
        F.lit("-"),
        F.col("o_orderkey").cast("string"),
    )
    manifest = orders.select(folder.alias("folder"))
    return manifest.select(
        "folder",
        F.regexp_extract("folder", r"^(\d{8}T\d{6})-(\d+)$", 1).alias("folder_ts"),
        F.regexp_extract("folder", r"^(\d{8}T\d{6})-(\d+)$", 2).cast("long").alias("dados_id"),
    )


_A5_SQL = r"""
WITH m AS (
    SELECT strftime(o_orderdate, '%Y%m%dT%H%M%S') || '-' || cast(o_orderkey AS VARCHAR) AS folder
    FROM orders
)
SELECT folder,
       regexp_extract(folder, '^(\d{8}T\d{6})-(\d+)$', 1) AS folder_ts,
       cast(regexp_extract(folder, '^(\d{8}T\d{6})-(\d+)$', 2) AS BIGINT) AS dados_id
FROM m
"""


def _table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-extension — order-insensitive table fingerprint: per-row md5
    over a canonical '|'-joined key projection, folded with an
    addition-mod-2^31 (commutative, so partition order can't matter).
    The cross-system reconciliation primitive: two engines agree on a
    table iff the (n_rows, checksum) pair matches — one number to ship
    instead of an id-set exchange. Only integer/string columns enter
    the canonical form (float formatting differs across engines)."""
    orders = load_table(spark, sf_dir, "orders")
    row_h = F.conv(F.substring(F.md5(F.concat_ws("|", "o_orderkey", "o_orderstatus")), 1, 8), 16, 10).cast("long")
    return orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.pmod(F.sum(row_h), F.lit(2147483647)).alias("checksum"),
    )


_TABLE_CHECKSUM_SQL = """
SELECT count(*) AS n_rows,
       cast(sum(('0x' || substr(md5(cast(o_orderkey AS VARCHAR) || '|' || o_orderstatus), 1, 8))::BIGINT)
           % 2147483647 AS BIGINT) AS checksum
FROM orders
"""


def _funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event funnel: per user, first 'view' and the first 'purchase' at
    or after it; converted iff within 72 hours. One aggregate for the
    funnel head, a conditional left join for the tail — both shuffle on
    user_id only (the join condition's ts bound is a residual, so no
    row explosion beyond the user's purchases)."""
    ev = load_table(spark, sf_dir, "events")
    first_view = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    return (
        first_view.join(
            purchases,
            (F.col("user_id") == F.col("p_user")) & (F.col("p_ts") >= F.col("first_view")),
            "left",
        )
        .groupBy("user_id", "first_view")
        .agg(F.min("p_ts").alias("first_purchase"))
        .select(
            "user_id",
            "first_view",
            "first_purchase",
            (F.col("first_purchase") <= F.col("first_view") + F.expr("INTERVAL 72 HOURS")).alias(
                "converted"
            ),
        )
    )


_FUNNEL_SQL = """
WITH fv AS (
    SELECT user_id, min(ts) AS first_view FROM events
    WHERE event_type = 'view' GROUP BY user_id
), fp AS (
    SELECT fv.user_id, fv.first_view, min(e.ts) AS first_purchase
    FROM fv LEFT JOIN events e
      ON e.user_id = fv.user_id AND e.event_type = 'purchase' AND e.ts >= fv.first_view
    GROUP BY fv.user_id, fv.first_view
)
SELECT user_id, first_view, first_purchase,
       first_purchase <= first_view + INTERVAL 72 HOUR AS converted
FROM fp
"""


def _retention_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day retention: of the users active on day d, how many
    are also active on d+1. Distinct (user, day) activity relation,
    self-joined one day forward — the DAU/retention primitive."""
    ev = load_table(spark, sf_dir, "events")
    act = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    nxt = act.select(F.col("user_id").alias("r_user"), F.col("day").alias("r_day"))
    totals = act.groupBy("day").agg(F.count(F.lit(1)).alias("n_active"))
    retained = (
        act.join(
            nxt,
            (F.col("user_id") == F.col("r_user")) & (F.col("r_day") == F.date_add("day", 1)),
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_retained"))
    )
    return (
        totals.join(retained, "day", "left")
        .na.fill({"n_retained": 0})
        .select(
            "day",
            "n_active",
            "n_retained",
            F.round(F.col("n_retained") / F.col("n_active").cast("double"), 6).alias(
                "retention_rate"
            ),
        )
    )


_RETENTION_SQL = """
WITH act AS (
    SELECT DISTINCT user_id, cast(ts AS DATE) AS day FROM events
), tot AS (
    SELECT day, count(*) AS n_active FROM act GROUP BY day
), ret AS (
    SELECT a.day, count(*) AS n_retained
    FROM act a JOIN act b ON a.user_id = b.user_id AND b.day = a.day + 1
    GROUP BY a.day
)
SELECT tot.day, n_active, coalesce(n_retained, 0) AS n_retained,
       round(coalesce(n_retained, 0)::DOUBLE / n_active, 6) AS retention_rate
FROM tot LEFT JOIN ret ON tot.day = ret.day
"""


# ---------------------------------------------------------------------------
# TPC-H-style shapes adapted to the reduced driver schema
# ---------------------------------------------------------------------------


def _q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-style: bilateral trade volume between two nations by
    ship year. Both nation joins broadcast; the disjunctive nation-pair
    predicate prunes rows before the final aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
    )


_Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
"""


def _q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-style profit by supplier nation and order year. The
    driver schema has no partsupp, so unit cost is proxied by
    p_retailprice (documented measure definition, not a quirk)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(amount), 4).alias("sum_profit"))
    )


_Q9_SQL = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity), 4) AS sum_profit
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN part ON l_partkey = p_partkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1, 2
"""


def _q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-style: orders-per-customer histogram. Left join keeps
    zero-order customers; count(o_orderkey) ignores the null rows the
    left join manufactures. Two-level aggregate, both map-side-partial."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


_Q13_SQL = """
WITH c_orders AS (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist FROM c_orders GROUP BY c_count
"""


def _q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-style: promo revenue share for one ship month.
    Conditional aggregate over a broadcast part join; the shipdate
    filter reaches the parquet scan. Revenue is summed as the exact
    integer grain cents x (100 - discount-hundredths) — decimal(18,0)
    factors so products stay on the fast decimal path — and the share
    is ONE unrounded float division both engines compute identically
    (r11 lint: the former round(float-sum ratio, 4) rode
    order-dependent double sums)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev_s = F.round(F.col("l_extendedprice") * 100).cast("decimal(18,0)") * (
        F.lit(100).cast("decimal(18,0)")
        - F.round(F.col("l_discount") * 100).cast("decimal(18,0)")
    )
    return (
        li.filter((F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-02-01"))
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", rev_s).otherwise(
                    F.lit(0).cast("decimal(37,0)")
                )
            ).alias("__sp"),
            F.sum(rev_s).alias("__sa"),
        )
        .select(
            (
                F.lit(100.0) * F.col("__sp").cast("double") / F.col("__sa").cast("double")
            ).alias("promo_share")
        )
    )


_Q14_SQL = """
WITH s AS (
    SELECT cast(sum(CASE WHEN p_type = 'PROMO'
                    THEN CAST(round(l_extendedprice * 100) AS HUGEINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT))
                    ELSE 0 END) AS HUGEINT) AS sp,
           cast(sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS HUGEINT) AS sa
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-02-01 00:00:00'
)
SELECT 100.0 * CAST(sp AS DOUBLE) / CAST(sa AS DOUBLE) AS promo_share FROM s
"""


def _q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-style: revenue from below-average-quantity line items
    of one brand. The correlated subquery is decorrelated by hand into
    a per-part aggregate joined back (both sides tiny after the brand
    filter, so the join broadcasts)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    branded = li.join(
        F.broadcast(part.filter(F.col("p_brand") == "Brand#1").select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
    )
    per_part = branded.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (F.avg("l_quantity") * 0.5).alias("qty_cutoff")
    )
    return (
        branded.join(F.broadcast(per_part), branded.l_partkey == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.col("qty_cutoff"))
        # exact integer cents sum, ONE unrounded shared division (r11
        # lint: the former round(float-sum / 7, 4) rode an
        # order-dependent double sum)
        .agg(
            (
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("decimal(18,0)"))
                .cast("double")
                / F.lit(700.0)
            ).alias("avg_yearly")
        )
    )


_Q17_SQL = """
SELECT CAST(cast(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS HUGEINT) AS DOUBLE) / 700.0 AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (SELECT 0.5 * avg(l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


def _q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-style: disjunction of brand/size/quantity bands. One
    broadcast join; the OR-of-ANDs predicate stays a single codegen
    filter (no union-of-scans)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.filter(band).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue")
    )


_Q19_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


def _q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-style: above-average-balance customers who never
    placed a very large order, grouped by a country code (nationkey
    mod 10 — the driver schema has no phone; every customer here has
    orders, so the anti-join target is the large-order subset).
    Scalar avg broadcast as a 1-row cross join; NOT EXISTS is the
    canonical left_anti join with the filter pushed below it."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("ab"))
    big_orders = orders.filter(F.col("o_totalprice") > 460000.0).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(big_orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy((F.col("c_nationkey") % 10).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
    )


_Q22_SQL = """
SELECT c_nationkey % 10 AS cntrycode, count(*) AS numcust,
       round(sum(c_acctbal), 4) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 460000.0)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Corpus curation: cluster representatives + train/eval contamination
# ---------------------------------------------------------------------------


def _cluster_representative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-doc selection per near-dup cluster: connected
    components over the Jaccard pair graph, then a keep-rule window
    (longest doc wins, doc_id breaks ties). This is the W2 keep-rule
    applied to corpus curation — dedup that KEEPS one survivor instead
    of reporting pairs. The pair relation is the shared at-rest graph
    (plans/pair_graph.py) also read by dup_clusters and doc_pagerank."""
    docs = load_table(spark, sf_dir, "documents")
    cc = pair_graph.cluster_labels(spark, sf_dir, threshold=0.5, shingle_k=1)
    w = Window.partitionBy("cluster_id").orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    return (
        cc.join(docs.select("doc_id", "n_chars"), "doc_id")
        .withColumn("cluster_size", F.count(F.lit(1)).over(Window.partitionBy("cluster_id")))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("cluster_id"),
            F.col("doc_id").alias("rep_doc_id"),
            F.col("n_chars"),
            F.col("cluster_size"),
        )
    )


_CLUSTER_REP_SQL = r"""
WITH RECURSIVE t AS (
    SELECT source, doc_id,
           list_distinct(string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS toks
    FROM documents
), p AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.toks, b.toks)) /
          cast(len(list_distinct(a.toks || b.toks)) AS DOUBLE) >= 0.5
), e AS (
    SELECT id_a AS src, id_b AS dst FROM p
    UNION
    SELECT id_b AS src, id_a AS dst FROM p
), reach(src, dst) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src
), cc AS (
    SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src
)
SELECT cluster_id, doc_id AS rep_doc_id, n_chars,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM cc JOIN documents USING (doc_id)
QUALIFY row_number() OVER (PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id) = 1
"""


def _contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination: for each eval doc (source = src0),
    the fraction of its distinct 3-word shingles that appear anywhere
    in the train split (every other source). At lake scale the train
    side is the 100 TB one, so its shingles are pruned by an EXPLICIT
    bloom filter built from the (small, fixed) eval-shingle set
    (operators/bloom.py) BEFORE the distinct — the massive shuffle
    collapses to candidate shingles only. No false negatives, and
    bloom false positives are dropped by the exact join, so results
    are bit-identical with pruning on or off (asserted in
    tests/test_plan_properties.py)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", "source", F.explode(F.array_distinct(text.shingles("text", 3))).alias("s")
    )
    eval_bloom = bloom.build_bloom(sh.filter(F.col("source") == "src0"), "s")
    train = (
        bloom.bloom_prune(sh.filter(F.col("source") != "src0"), "s", eval_bloom)
        .select("s")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        sh.filter(F.col("source") == "src0")
        .join(train, "s", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce("__hit", F.lit(0))).alias("n_matched"),
            F.round(
                F.sum(F.coalesce("__hit", F.lit(0))) / F.count(F.lit(1)).cast("double"), 6
            ).alias("contamination"),
        )
    )


_CONTAMINATION_SQL = r"""
WITH t AS (
    SELECT doc_id, source,
           string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
    FROM documents
), sh AS (
    SELECT doc_id, source,
           unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 2, 0)),
               i -> array_to_string(toks[i:i+2], ' ')))) AS s
    FROM t
), train AS (
    SELECT DISTINCT s FROM sh WHERE source <> 'src0'
)
SELECT doc_id, count(*) AS n_shingles,
       cast(sum(CASE WHEN train.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
       round(sum(CASE WHEN train.s IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
           AS contamination
FROM sh LEFT JOIN train ON sh.s = train.s
WHERE sh.source = 'src0'
GROUP BY doc_id
"""


def _knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked kNN graph: top-3 cosine neighbors for EVERY vector
    within its label block — the clustering/semantic-dedup building
    block, value-checked against the same ranking in DuckDB. Uses the
    numpy matmul-per-block path; ``similarity.knn_graph`` is the
    expression twin (equivalence pinned in tests)."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    return similarity.knn_graph_blocked(emb, "embedding", "vec_id", k=3, block_col="label")


_KNN_GRAPH_SQL = """
WITH e AS (SELECT vec_id, label, cast(embedding AS DOUBLE[]) AS emb FROM embeddings),
p AS (
    SELECT a.vec_id, b.vec_id AS neighbor_id,
           round(list_dot_product(a.emb, b.emb) /
                 (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))),
                 6) AS cos
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id
)
SELECT vec_id, neighbor_id, cos, rnk FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rnk
    FROM p
) WHERE rnk <= 3
"""


def _repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter signal: the fraction of a doc's
    word bigrams covered by its single most frequent bigram. Explode →
    two codegen aggregates; no per-row Python, no collect_list."""
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select("doc_id", F.explode(text.shingles("text", 2)).alias("g"))
    per_gram = grams.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    return per_gram.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.max("c").alias("top_bigram_count"),
        F.round(F.max("c") / F.sum("c").cast("double"), 6).alias("top_bigram_frac"),
    )


_REPETITION_SQL = r"""
WITH t AS (
    SELECT doc_id,
           string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
    FROM documents
), g AS (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, greatest(len(toks) - 1, 0)),
                                 i -> array_to_string(toks[i:i+1], ' '))) AS g
    FROM t
), pg AS (
    SELECT doc_id, g, count(*) AS c FROM g GROUP BY doc_id, g
)
SELECT doc_id, cast(sum(c) AS BIGINT) AS n_bigrams, max(c) AS top_bigram_count,
       round(max(c)::DOUBLE / sum(c), 6) AS top_bigram_frac
FROM pg GROUP BY doc_id
"""


# One SQL text, two engines: the engine's spark.sql surface runs the
# IDENTICAL string the oracle runs — BigQuery-style SQL consumers of
# the reference can port queries verbatim.
_PORTABLE_SQL = """
SELECT c_mktsegment, c_custkey, rnk FROM (
    SELECT c_mktsegment, c_custkey,
           row_number() OVER (PARTITION BY c_mktsegment
                              ORDER BY c_acctbal DESC, c_custkey) AS rnk
    FROM customer
) t WHERE rnk <= 5
"""


def _sql_surface_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/SQL surface — the engine accepts ANSI SQL verbatim: this
    entry registers the tables as views and runs the exact oracle
    string through spark.sql. Parity by construction."""
    register_views(spark, sf_dir, ["customer"])
    return spark.sql(_PORTABLE_SQL)


def _kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-seeded Lloyd k-means, 2 fixed iterations — the iterative
    sibling of connected components. The DuckDB oracle replays the
    identical schedule (round-6 centroids/distances, lowest-cluster
    tie-break), so the assignment is value-checked, not rows-only."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.kmeans_assign(emb, "embedding", "vec_id", "label", n_iters=2)


_KMEANS_SQL = """
WITH ex AS (
    SELECT vec_id, u.pos, u.x
    FROM embeddings,
         LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS pos,
                         unnest(embedding::DOUBLE[]) AS x) u
), c0 AS (
    SELECT label AS cluster, pos, round(avg(x), 6) AS c
    FROM ex JOIN embeddings USING (vec_id) GROUP BY 1, 2
), d1 AS (
    SELECT vec_id, cluster, sum((x - c) * (x - c)) AS d2
    FROM ex JOIN c0 USING (pos) GROUP BY 1, 2
), a1 AS (
    SELECT vec_id, cluster FROM d1
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY round(d2, 6), cluster) = 1
), c1 AS (
    SELECT cluster, pos, round(avg(x), 6) AS c
    FROM a1 JOIN ex USING (vec_id) GROUP BY 1, 2
), d2_ AS (
    SELECT vec_id, cluster, sum((x - c) * (x - c)) AS d2
    FROM ex JOIN c1 USING (pos) GROUP BY 1, 2
)
SELECT vec_id, cluster FROM d2_
QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY round(d2, 6), cluster) = 1
"""


def _dedup_incremental_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingestion exact dedup: which NEW-batch docs (source
    src0) already exist in the at-rest corpus (every other source) by
    canonical token-set fingerprint. The corpus side — the 100 TB one —
    is pruned by an explicit bloom filter built from the (small) new
    batch BEFORE the join, so the at-rest fingerprint index is probed,
    never rescanned into a shuffle (operators/bloom.py; exact-dedup
    complement of minhash_near_dup_incremental). Bloom FPs die in the
    exact fingerprint join, so results are prune-invariant."""
    docs = load_table(spark, sf_dir, "documents")
    fp = text.token_set_fingerprint("text")
    # the small new-batch side feeds the bloom build AND the probe
    # join — materialize it once instead of re-scanning the corpus
    new = (
        docs.filter(F.col("source") == "src0")
        .select("doc_id", fp.alias("fp"))
        .persist()  # batch-grain; bloom build + probe join (lazy pin)
    )
    corpus = docs.filter(F.col("source") != "src0").select(
        F.col("doc_id").alias("corpus_doc_id"), fp.alias("fp")
    )
    new_bloom = bloom.build_bloom(new, "fp")
    cand = bloom.bloom_prune(corpus, "fp", new_bloom)
    return (
        new.join(cand, "fp")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_corpus_matches"),
            F.min("corpus_doc_id").alias("first_corpus_match"),
        )
    )


_DEDUP_INCREMENTAL_SQL = r"""
WITH f AS (
    SELECT doc_id, source,
           md5(array_to_string(list_sort(list_distinct(
               string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))), ' '))
               AS fp
    FROM documents
)
SELECT a.doc_id, count(*) AS n_corpus_matches, min(b.doc_id) AS first_corpus_match
FROM f a JOIN f b ON a.fp = b.fp AND a.source = 'src0' AND b.source <> 'src0'
GROUP BY a.doc_id
"""


def _boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate signal at n-gram granularity: a 3-gram is
    'boilerplate' when it appears in more than 1% of DISTINCT docs (a
    scale-free threshold — survives SF growth); each doc reports how
    much of it is boilerplate. Two hash aggregates + one broadcast of
    the (tiny) boilerplate set; the corpus is scanned once."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", F.explode(F.array_distinct(text.shingles("text", 3))).alias("s")
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("__nd"))
    boiler = (
        sh.groupBy("s")
        .agg(F.count(F.lit(1)).alias("__ndocs"))
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("__ndocs") > F.col("__nd") * 0.01)
        .select("s")
        .withColumn("__b", F.lit(1))
    )
    return (
        sh.join(F.broadcast(boiler), "s", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce("__b", F.lit(0))).alias("n_boilerplate"),
            F.round(
                F.sum(F.coalesce("__b", F.lit(0))) / F.count(F.lit(1)).cast("double"), 6
            ).alias("boilerplate_frac"),
        )
    )


_BOILERPLATE_SQL = r"""
WITH t AS (
    SELECT doc_id,
           string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
    FROM documents
), sh AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 2, 0)),
               i -> array_to_string(toks[i:i+2], ' ')))) AS s
    FROM t
), c AS (
    SELECT s, count(*) AS ndocs FROM sh GROUP BY s
), boiler AS (
    SELECT s FROM c WHERE ndocs > (SELECT count(*) FROM documents) * 0.01
)
SELECT doc_id, count(*) AS n_shingles,
       cast(sum(CASE WHEN boiler.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boilerplate,
       round(sum(CASE WHEN boiler.s IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
           AS boilerplate_frac
FROM sh LEFT JOIN boiler ON sh.s = boiler.s
GROUP BY doc_id
"""


def _source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-governance overlap matrix: for every source pair, how
    many canonical token-set fingerprints they share, plus the Jaccard
    of their fingerprint sets. One fingerprint relation, one
    equi-self-join on fp (shuffles fingerprints, never text), two tiny
    per-source aggregates broadcast back. Output is O(|sources|²) —
    constant at any corpus scale."""
    docs = load_table(spark, sf_dir, "documents")
    # doc-grain fingerprint relation, materialized once — it feeds the
    # size aggregate AND both self-join sides; without the checkpoint
    # each consumer re-scans the corpus and re-hashes every document
    fps = (
        docs.select("source", text.token_set_fingerprint("text").alias("fp"))
        .distinct()
        .persist()  # doc-grain; size agg + both self-join sides (lazy pin)
    )
    sizes = fps.groupBy("source").agg(F.count(F.lit(1)).alias("n_fp"))
    a = fps.select(F.col("source").alias("src_a"), "fp")
    b = fps.select(F.col("source").alias("src_b"), "fp")
    inter = (
        a.join(b, "fp")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(F.broadcast(sizes.select(F.col("source").alias("src_a"), F.col("n_fp").alias("__na"))), "src_a")
        .join(F.broadcast(sizes.select(F.col("source").alias("src_b"), F.col("n_fp").alias("__nb"))), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_common",
            F.round(
                F.col("n_common") / (F.col("__na") + F.col("__nb") - F.col("n_common")).cast("double"),
                6,
            ).alias("fp_jaccard"),
        )
    )


_SOURCE_OVERLAP_SQL = r"""
WITH f AS (
    SELECT DISTINCT source,
           md5(array_to_string(list_sort(list_distinct(
               string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))), ' '))
               AS fp
    FROM documents
), sz AS (
    SELECT source, count(*) AS n_fp FROM f GROUP BY source
), inter AS (
    SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
    FROM f a JOIN f b ON a.fp = b.fp AND a.source < b.source
    GROUP BY 1, 2
)
SELECT src_a, src_b, n_common,
       round(n_common::DOUBLE / (sa.n_fp + sb.n_fp - n_common), 6) AS fp_jaccard
FROM inter
JOIN sz sa ON sa.source = inter.src_a
JOIN sz sb ON sb.source = inter.src_b
"""


def _lm_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality signal without a neural model: score each
    doc by the corpus bigram LM — sum over its bigram occurrences of
    the INTEGER-scaled conditional probability floor(1e6 · c(w₁w₂) /
    c(w₁·)). Integer multiply + floor-div is bit-exact in both engines
    (the same integer-scaling pattern that makes PageRank value-
    checkable), where a float log-prob would diverge in the last ULP. Low avg_cond_scaled =
    improbable token transitions = low-quality/garbled text.

    Plan shape: per-doc bigram multiplicities (one hash agg), the
    corpus bigram relation joined on the bigram key (the join any
    n-gram LM lookup needs), prefix totals derived FROM the bigram
    relation (no second text pass), one final per-doc agg."""
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select("doc_id", F.explode(text.shingles("text", 2)).alias("g"))
    # grams is deliberately NOT cached and c2 reads the raw explode: the
    # re-tokenize is map-side-combined straight into the count and beat
    # the persist + extra-shuffle variant (c2 from cached per_doc) by
    # ~1.4× at sf0.1 — measured, recorded in docs/PERF.md.
    per_doc = grams.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("m"))
    c2 = grams.groupBy("g").agg(F.count(F.lit(1)).alias("n2"))
    c1 = (
        c2.withColumn("p", F.expr("split_part(g, ' ', 1)"))
        .groupBy("p")
        .agg(F.sum("n2").alias("n1"))
    )
    scored = (
        per_doc.join(c2, "g")
        .withColumn("p", F.expr("split_part(g, ' ', 1)"))
        .join(c1, "p")
        .withColumn("q", F.expr("(1000000L * n2) DIV n1"))
    )
    return scored.groupBy("doc_id").agg(
        F.sum("m").alias("n_bigrams"),
        F.sum(F.col("m") * F.col("q")).alias("lm_score_scaled"),
        F.expr("sum(m * q) DIV sum(m)").alias("avg_cond_scaled"),
    )


_LM_SCORE_SQL = r"""
WITH t AS (
    SELECT doc_id,
           string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
    FROM documents
), bg AS (
    SELECT doc_id, unnest([toks[i] || ' ' || toks[i + 1]
                           FOR i IN generate_series(1, len(toks) - 1)]) AS g
    FROM t
), per_doc AS (
    SELECT doc_id, g, count(*) AS m FROM bg GROUP BY 1, 2
), c2 AS (
    SELECT g, count(*) AS n2 FROM bg GROUP BY g
), c1 AS (
    SELECT split_part(g, ' ', 1) AS p, cast(sum(n2) AS BIGINT) AS n1 FROM c2 GROUP BY 1
)
SELECT doc_id,
       cast(sum(m) AS BIGINT) AS n_bigrams,
       cast(sum(m * ((1000000 * n2) // n1)) AS BIGINT) AS lm_score_scaled,
       cast(sum(m * ((1000000 * n2) // n1)) // sum(m) AS BIGINT) AS avg_cond_scaled
FROM per_doc
JOIN c2 USING (g)
JOIN c1 ON split_part(g, ' ', 1) = c1.p
GROUP BY doc_id
"""


def _dedup_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal dedup diagnostics: over the SAME candidate universe
    (same-source doc pairs), how do the text channel (word-Jaccard ≥
    0.5, read from the at-rest pair graph) and the embedding channel
    (cosine ≥ 0.3 via the doc_id↔vec_id alignment) agree? One-row
    confusion summary — the eval you run before trusting a cheaper
    dedup channel at lake scale. Text pairs come from the shared
    materialization; embedding pairs are block-bounded Σ|block|²
    exact cosines (the documented in-block pattern)."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), F.col("embedding").cast("array<double>").alias("e")
    )
    de = docs.select("doc_id", "source").join(emb, "doc_id")
    a = de.select(F.col("source"), F.col("doc_id").alias("id_a"), F.col("e").alias("ea"))
    b = de.select(F.col("source"), F.col("doc_id").alias("id_b"), F.col("e").alias("eb"))
    emb_pairs = (
        a.join(b, "source")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(vector.cosine("ea", "eb"), 6))
        .filter(F.col("cos") >= 0.3)
        .select("id_a", "id_b")
        .withColumn("__e", F.lit(1))
    )
    # restrict the text channel to the same universe (docs that HAVE an
    # embedding) — at larger SFs embeddings cover a doc subset and an
    # unrestricted text side would inflate n_text_only
    emb_ids = emb.select("doc_id")
    text_pairs = (
        pair_graph.jaccard_pair_graph(spark, sf_dir, threshold=0.5, shingle_k=1)
        .join(emb_ids.select(F.col("doc_id").alias("id_a")), "id_a", "left_semi")
        .join(emb_ids.select(F.col("doc_id").alias("id_b")), "id_b", "left_semi")
        .select("id_a", "id_b")
        .withColumn("__t", F.lit(1))
    )
    j = text_pairs.join(emb_pairs, ["id_a", "id_b"], "full_outer")
    return j.agg(
        F.count(F.lit(1)).alias("n_pairs_flagged"),
        F.coalesce(F.sum(F.when(F.col("__t").isNotNull() & F.col("__e").isNotNull(), 1)), F.lit(0)).alias("n_both"),
        F.coalesce(F.sum(F.when(F.col("__e").isNull(), 1)), F.lit(0)).alias("n_text_only"),
        F.coalesce(F.sum(F.when(F.col("__t").isNull(), 1)), F.lit(0)).alias("n_emb_only"),
    )


_DEDUP_AGREEMENT_SQL = r"""
WITH t AS (
    SELECT source, doc_id,
           list_distinct(string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS toks
    FROM documents
), e AS (
    SELECT vec_id AS doc_id, cast(embedding AS DOUBLE[]) AS emb FROM embeddings
), tp AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE a.doc_id IN (SELECT doc_id FROM e)
      AND b.doc_id IN (SELECT doc_id FROM e)
      AND len(list_intersect(a.toks, b.toks)) /
          cast(len(list_distinct(a.toks || b.toks)) AS DOUBLE) >= 0.5
), ep AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM documents a JOIN documents b ON a.source = b.source AND a.doc_id < b.doc_id
    JOIN e ea ON ea.doc_id = a.doc_id
    JOIN e eb ON eb.doc_id = b.doc_id
    WHERE round(list_dot_product(ea.emb, eb.emb) /
          (sqrt(list_dot_product(ea.emb, ea.emb)) * sqrt(list_dot_product(eb.emb, eb.emb))), 6)
          >= 0.3
), j AS (
    SELECT coalesce(tp.id_a, ep.id_a) AS id_a,
           coalesce(tp.id_b, ep.id_b) AS id_b,
           tp.id_a IS NOT NULL AS in_t, ep.id_a IS NOT NULL AS in_e
    FROM tp FULL OUTER JOIN ep ON tp.id_a = ep.id_a AND tp.id_b = ep.id_b
)
SELECT cast(count(*) AS BIGINT) AS n_pairs_flagged,
       cast(sum(CASE WHEN in_t AND in_e THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
       cast(sum(CASE WHEN NOT in_e THEN 1 ELSE 0 END) AS BIGINT) AS n_text_only,
       cast(sum(CASE WHEN NOT in_t THEN 1 ELSE 0 END) AS BIGINT) AS n_emb_only
FROM j
"""


def _semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): 1-iteration label-seeded k-means
    clusters the embedding space, then within each cluster every vector
    with a cosine ≥ 0.3 lower-id neighbor is dropped — one
    deterministic representative per semantic near-dup chain
    (operators/dedup.py semantic_dedup). Pairwise work is confined to
    the cluster self-join (Σ|cluster|², never n²); the oracle replays
    the identical schedule (round-6 centroids/distances/cosines,
    lowest-cluster and lowest-id tie-breaks)."""
    emb = load_table(spark, sf_dir, "embeddings")
    assign = similarity.kmeans_assign(emb, "embedding", "vec_id", "label", n_iters=1)
    clustered = emb.select("vec_id", "embedding").join(assign, "vec_id")
    return dedup.semantic_dedup(clustered, "embedding", "vec_id", "cluster", threshold=0.3)


_SEMANTIC_DEDUP_SQL = """
WITH ex AS (
    SELECT vec_id, u.pos, u.x
    FROM embeddings,
         LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS pos,
                         unnest(embedding::DOUBLE[]) AS x) u
), c0 AS (
    SELECT label AS cluster, pos, round(avg(x), 6) AS c
    FROM ex JOIN embeddings USING (vec_id) GROUP BY 1, 2
), d1 AS (
    SELECT vec_id, cluster, sum((x - c) * (x - c)) AS d2
    FROM ex JOIN c0 USING (pos) GROUP BY 1, 2
), a1 AS (
    SELECT vec_id, cluster FROM d1
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY round(d2, 6), cluster) = 1
), v AS (
    SELECT a1.vec_id, a1.cluster, e.embedding::DOUBLE[] AS emb
    FROM a1 JOIN embeddings e USING (vec_id)
), dropped AS (
    SELECT DISTINCT a.vec_id
    FROM v a JOIN v b ON a.cluster = b.cluster AND b.vec_id < a.vec_id
    WHERE round(list_dot_product(a.emb, b.emb) /
          (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))), 6)
          >= 0.3
)
SELECT v.vec_id, v.cluster, d.vec_id IS NULL AS keep
FROM v LEFT JOIN dropped d ON v.vec_id = d.vec_id
"""


def _semantic_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingestion SemDeDup: the new batch (vec_id % 5 == 0)
    is assigned to the at-rest cluster model
    (similarity.centroid_table / nearest_centroid_assign) and pruned
    against the at-rest kept representatives AND lower-id batch
    members (operators/dedup.py semantic_dedup_incremental) — the
    embedding-space complement of minhash_incremental. The corpus is
    touched only through its kept-rep relation and the k·dim centroid
    model; the oracle replays the identical schedule."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)
    assign = similarity.kmeans_assign(corpus, "embedding", "vec_id", "label", n_iters=1)
    # materialized once: feeds the batch dedup AND the kept-rep join —
    # without it every lineage reuse re-scans the embeddings parquet
    clustered = (
        corpus.select("vec_id", "embedding").join(assign, "vec_id").persist()
    )  # corpus-grain; batch dedup + kept-rep join (lazy pin)
    flags = dedup.semantic_dedup(clustered, "embedding", "vec_id", "cluster", threshold=0.3)
    kept = clustered.join(flags.filter(F.col("keep")).select("vec_id"), "vec_id")
    # r15: centroids derive from the PINNED clustered relation instead
    # of centroid_table(assign, corpus) — that form re-ran the whole
    # kmeans assignment subtree a second time (assign was unpinned and
    # corpus⨝assign is exactly what `clustered` already holds); same
    # rows, same round-6 means, one InMemoryRelation consumer instead
    # of a duplicate explode+join+aggregate chain (guide §2.4).
    cents = (
        clustered.select(
            "cluster",
            F.posexplode(F.col("embedding").cast("array<double>")).alias("__pos", "__x"),
        )
        .groupBy("cluster", "__pos")
        .agg(F.round(F.avg("__x"), 6).alias("__c"))
    )
    new_assign = similarity.nearest_centroid_assign(new, "embedding", "vec_id", cents)
    new_clustered = new.select("vec_id", "embedding").join(new_assign, "vec_id")
    return dedup.semantic_dedup_incremental(
        kept, new_clustered, "embedding", "vec_id", "cluster", threshold=0.3
    )


_SEMANTIC_DEDUP_INC_SQL = """
WITH ex AS (
    SELECT vec_id, u.pos, u.x
    FROM embeddings,
         LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS pos,
                         unnest(embedding::DOUBLE[]) AS x) u
), exc AS (
    SELECT * FROM ex WHERE vec_id % 5 <> 0
), c0 AS (
    SELECT label AS cluster, pos, round(avg(x), 6) AS c
    FROM exc JOIN embeddings USING (vec_id) GROUP BY 1, 2
), d1 AS (
    SELECT vec_id, cluster, sum((x - c) * (x - c)) AS d2
    FROM exc JOIN c0 USING (pos) GROUP BY 1, 2
), a1 AS (
    SELECT vec_id, cluster FROM d1
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY round(d2, 6), cluster) = 1
), v AS (
    SELECT a1.vec_id, a1.cluster, e.embedding::DOUBLE[] AS emb
    FROM a1 JOIN embeddings e USING (vec_id)
), cdrop AS (
    SELECT DISTINCT a.vec_id
    FROM v a JOIN v b ON a.cluster = b.cluster AND b.vec_id < a.vec_id
    WHERE round(list_dot_product(a.emb, b.emb) /
          (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))), 6)
          >= 0.3
), kept AS (
    SELECT v.vec_id, v.cluster, v.emb
    FROM v LEFT JOIN cdrop d ON v.vec_id = d.vec_id
    WHERE d.vec_id IS NULL
), cent AS (
    SELECT a1.cluster, exc.pos, round(avg(exc.x), 6) AS c
    FROM a1 JOIN exc USING (vec_id) GROUP BY 1, 2
), nd AS (
    SELECT ex.vec_id, cent.cluster, sum((ex.x - cent.c) * (ex.x - cent.c)) AS d2
    FROM ex JOIN cent ON ex.pos = cent.pos
    WHERE ex.vec_id % 5 = 0
    GROUP BY 1, 2
), na AS (
    SELECT vec_id, cluster FROM nd
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY round(d2, 6), cluster) = 1
), nv AS (
    SELECT na.vec_id, na.cluster, e.embedding::DOUBLE[] AS emb
    FROM na JOIN embeddings e USING (vec_id)
), ndrop AS (
    SELECT a.vec_id
    FROM nv a JOIN kept b ON a.cluster = b.cluster
    WHERE round(list_dot_product(a.emb, b.emb) /
          (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))), 6)
          >= 0.3
    UNION
    SELECT a.vec_id
    FROM nv a JOIN nv b ON a.cluster = b.cluster AND b.vec_id < a.vec_id
    WHERE round(list_dot_product(a.emb, b.emb) /
          (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))), 6)
          >= 0.3
)
SELECT nv.vec_id, nv.cluster, d.vec_id IS NULL AS keep
FROM nv LEFT JOIN ndrop d ON nv.vec_id = d.vec_id
"""


def _minhash_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding-recall audit (dedup.minhash_candidate_recall) on the
    deterministic doc_id%2 audit sample: all-pairs exact Jaccard ≥ 0.35
    ground truth vs the raw band-join candidate set. Verified near-dup
    output always has precision 1; what banding can silently lose is
    RECALL — this measures it. Sampling is sound because banding is a
    per-doc pure function (a pair is a candidate iff the two docs share
    a band, independent of every other doc). The id cap bounds the
    audit at ≤500 docs at ANY scale factor — ground truth is quadratic
    by nature, so the sample size must not grow with the corpus."""
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 2 == 0) & (F.col("doc_id") < 1000)
    )
    return dedup.minhash_candidate_recall(docs, "text", "doc_id", true_threshold=0.35)


# Same portable skeleton as _MINHASH_PORTABLE_SQL (rolling shingle
# hashes → 16 affine minima → 8 bands of 2), restricted to the audit
# sample; ground truth joins the shingle sets all-pairs.
_MINHASH_EVAL_SQL = """
WITH base AS (
  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
  FROM documents WHERE doc_id % 2 = 0 AND doc_id < 1000
),
sh AS (
  SELECT doc_id, list_distinct([
      list_reduce(list_prepend(CAST(0 AS BIGINT),
          [CAST(ascii(c) AS BIGINT) FOR c IN regexp_split_to_array(array_to_string(toks[i:i+2], ' '), '')]),
        (acc, c) -> (acc * 31 + c) % 2147483647)
      FOR i IN generate_series(1, len(toks) - 2)]) AS hs
  FROM base WHERE len(toks) >= 3
),
sig AS (
  SELECT doc_id, hs, len(hs) AS nsh,
    [list_min([(h * ((2654435761 * (i + 1)) % 2147483647) + (40503 * i + 1) % 2147483647) % 2147483647
               FOR h IN hs])
     FOR i IN generate_series(0, 15)] AS mh
  FROM sh
),
bands AS (
  SELECT doc_id, u.b AS band_id, mh[2*u.b + 1] AS m1, mh[2*u.b + 2] AS m2
  FROM sig, unnest(generate_series(0, 7)) AS u(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.m1 = b.m1 AND a.m2 = b.m2
  WHERE a.doc_id < b.doc_id
),
t AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
  WHERE round(CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE) /
        (a.nsh + b.nsh - len(list_intersect(a.hs, b.hs))), 6) >= 0.35
),
m AS (
  SELECT (SELECT count(*) FROM t) AS n_true,
         (SELECT count(*) FROM cand) AS n_candidates,
         (SELECT count(*) FROM t JOIN cand USING (id_a, id_b)) AS n_tp
)
SELECT cast(n_true AS BIGINT) AS n_true,
       cast(n_candidates AS BIGINT) AS n_candidates,
       cast(n_tp AS BIGINT) AS n_tp,
       round(n_tp / nullif(n_true, 0), 6) AS recall,
       round(n_tp / nullif(n_candidates, 0), 6) AS candidate_precision
FROM m
"""


def _bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer induction: the first 3 BPE merge rules learned from
    the documents corpus (operators/corpus.py bpe_merges), with the
    corpus symbol count after each rule. Fixed distributed iterations
    over the vocabulary-grain word-count relation; the argmax pair per
    step is an O(1) collected model parameter (IVF-centroid
    precedent); the oracle replays the identical schedule as an
    unrolled CTE chain with the same greedy left-to-right merge fold."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.bpe_merges(docs, "text", n_merges=3)


def _bpe_sql(n_merges: int = 3) -> str:
    """Unrolled-CTE oracle for bpe_merges: per step, pair counts from
    the current word relation, argmax pair, then the identical greedy
    left-to-right merge.

    The merge is a delimiter-string replace: the symbol sequence is
    rendered as D D s1 D D s2 D D … (D = chr(31), never in a token)
    and the pattern D lhs D D rhs D → D lhs·rhs D. Literal replace()
    scans left-to-right non-overlapping — exactly the BPE apply scan —
    and consuming one delimiter from each flank keeps the DD-separator
    invariant, so chained matches ("a a a a" → "aa aa") behave
    correctly. (A list_reduce fold with a struct accumulator — the
    direct mirror of the Spark F.aggregate — silently corrupts rows in
    DuckDB 1.0.0: accumulator state leaks across rows in a vector
    chunk. Negative result; hence the string form.)"""
    return "WITH " + _bpe_ctes(n_merges) + "\n" + "\nUNION ALL\n".join(
        f"SELECT {i} AS step, b{i}.lhs, b{i}.rhs, b{i}.pc AS pair_count,\n"
        f"       (SELECT cast(sum(len(syms) * cnt) AS BIGINT) FROM w{i + 1}) AS symbols_after\n"
        f"FROM b{i}"
        for i in range(1, n_merges + 1)
    )


def _bpe_ctes(n_merges: int) -> str:
    """The shared unrolled training chain (w1 … w{n+1}, p_i, b_i); the
    word column rides along so the apply oracle can join back."""
    dd = "chr(31)||chr(31)"
    ctes = [
        r"""w1 AS (
  SELECT word, cast(count(*) AS BIGINT) AS cnt, regexp_split_to_array(word, '') AS syms
  FROM (SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS word
        FROM documents)
  GROUP BY word
)"""
    ]
    for i in range(1, n_merges + 1):
        ctes.append(
            f"""p{i} AS (
  SELECT u.pr.lhs AS lhs, u.pr.rhs AS rhs, cast(sum(cnt) AS BIGINT) AS pc
  FROM w{i}, unnest(list_transform(generate_series(1, len(syms) - 1),
                                   j -> {{'lhs': syms[j], 'rhs': syms[j + 1]}})) AS u(pr)
  GROUP BY 1, 2
), b{i} AS (
  SELECT lhs, rhs, pc FROM p{i} ORDER BY pc DESC, lhs, rhs LIMIT 1
), w{i + 1} AS (
  SELECT word, cnt, string_split(
      trim(replace(
          {dd} || array_to_string(syms, {dd}) || {dd},
          chr(31) || b{i}.lhs || {dd} || b{i}.rhs || chr(31),
          chr(31) || b{i}.lhs || b{i}.rhs || chr(31)),
        chr(31)),
      {dd}) AS syms
  FROM w{i}, b{i}
)"""
        )
    return ",\n".join(ctes)


def _bpe_token_count_sql(n_merges: int = 3) -> str:
    """Apply oracle: per-doc token stream joined to the trained
    word→symbols relation (w{n+1}) from the shared CTE chain."""
    return (
        "WITH "
        + _bpe_ctes(n_merges)
        + f""",
tok AS (
  SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS word
  FROM documents
)
SELECT tok.doc_id,
       cast(count(*) AS BIGINT) AS n_words,
       cast(sum(len(w{n_merges + 1}.syms)) AS BIGINT) AS n_bpe_tokens
FROM tok JOIN w{n_merges + 1} USING (word)
GROUP BY tok.doc_id"""
    )


def _source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot drift per source (operators/corpus.py
    distribution_drift): total-variation distance between the token
    distributions of two deterministic corpus halves (doc_id parity as
    the snapshot stand-in) over the global top-16 vocabulary + OOV —
    the governance gate before retraining on a new crawl. TV instead
    of KL/JS: bounded, symmetric, defined on empty buckets, and
    log-free (round-6 rational arithmetic is engine-portable)."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "snap", F.when(F.col("doc_id") % 2 == 0, F.lit("new")).otherwise(F.lit("old"))
    )
    return corpus.distribution_drift(docs, "text", "source", "snap", "old", "new", top_n=16)


_SOURCE_DRIFT_SQL = r"""
WITH tok AS (
  SELECT source, CASE WHEN doc_id % 2 = 0 THEN 'new' ELSE 'old' END AS snap,
         unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
  FROM documents
), base AS (
  SELECT source, snap, token, cast(count(*) AS BIGINT) AS cnt FROM tok GROUP BY 1, 2, 3
), vocab AS (
  SELECT token FROM (
    SELECT token, sum(cnt) AS t FROM base GROUP BY token ORDER BY t DESC, token LIMIT 16)
), b AS (
  SELECT source,
         CASE WHEN token IN (SELECT token FROM vocab) THEN token ELSE '<OOV>' END AS bucket,
         cast(sum(CASE WHEN snap = 'old' THEN cnt ELSE 0 END) AS BIGINT) AS c_old,
         cast(sum(CASE WHEN snap = 'new' THEN cnt ELSE 0 END) AS BIGINT) AS c_new
  FROM base GROUP BY 1, 2
), t AS (
  SELECT source, cast(sum(c_old) AS BIGINT) AS t_old, cast(sum(c_new) AS BIGINT) AS t_new
  FROM b GROUP BY source
)
SELECT b.source,
       max(t.t_old) AS n_tokens_old,
       max(t.t_new) AS n_tokens_new,
       round(0.5 * sum(abs(c_old / cast(nullif(t_old, 0) AS DOUBLE)
                           - c_new / cast(nullif(t_new, 0) AS DOUBLE))), 6)
           AS tv_distance
FROM b JOIN t USING (source)
GROUP BY b.source
"""


def _bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the induced tokenizer (operators/corpus.py
    bpe_token_count): per-doc token counts under the first 3 learned
    BPE rules — the train+apply pair to bpe_merges, and the number
    that prices a document in a token-budgeted corpus. The apply side
    is a broadcast join from the token stream to the trained
    word→symbol-count vocabulary; documents are never re-folded."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.bpe_token_count(docs, "text", "doc_id", n_merges=3)


def _source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature (α=0.5) dataset-mixture plan over the documents
    corpus (operators/corpus.py source_mixture): target share ∝
    tokens^α — the knob that keeps a 100 TB web crawl from drowning
    small high-quality sources. One hash aggregate to source grain +
    a broadcast one-row total; output is O(|sources|)."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.source_mixture(docs, "text", "source", alpha=0.5)


_SOURCE_MIXTURE_SQL = r"""
WITH per AS (
  SELECT source,
         cast(count(*) AS BIGINT) AS n_docs,
         cast(sum(CASE WHEN trim(text) = '' THEN 0
                       ELSE len(string_split_regex(trim(text), '\s+')) END) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT cast(sum(n_tokens) AS BIGINT) AS t,
         sum(pow(cast(n_tokens AS DOUBLE), 0.5)) AS tw
  FROM per
)
SELECT source, n_docs, n_tokens,
       round(n_tokens / cast(t AS DOUBLE), 6) AS raw_share,
       round(pow(cast(n_tokens AS DOUBLE), 0.5) / tw, 6) AS target_share,
       round(pow(cast(n_tokens AS DOUBLE), 0.5) / tw * t / n_tokens, 6) AS sample_epochs
FROM per, tot
"""


def _vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocab coverage curve (operators/corpus.py
    vocab_coverage): top-16 tokens by corpus frequency with cumulative
    token-stream coverage. The corpus collapses to vocab grain in one
    hash aggregate; top-n via TakeOrderedAndProject; the running-sum
    window touches only the 16 surviving rows."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.vocab_coverage(docs, "text", top_n=16)


_VOCAB_COVERAGE_SQL = r"""
WITH tok AS (
  SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
  FROM documents
), cnts AS (
  SELECT token, cast(count(*) AS BIGINT) AS cnt FROM tok GROUP BY token
), tot AS (
  SELECT cast(sum(cnt) AS BIGINT) AS t FROM cnts
), top AS (
  SELECT token, cnt, cast(row_number() OVER (ORDER BY cnt DESC, token) AS INTEGER) AS rank
  FROM cnts QUALIFY rank <= 16
)
SELECT rank, token, cnt,
       round(cast(sum(cnt) OVER (ORDER BY rank) AS DOUBLE) / cast(t AS DOUBLE), 6) AS cum_coverage
FROM top, tot
"""


def _bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 documents for a fixed query-term set: one token
    explode feeds doc-length and term-tf hash aggregates; df + corpus
    stats broadcast back; deterministic (score desc, doc_id) top-k via
    TakeOrderedAndProject. The retrieval scorer for mining
    topic-relevant training docs (corpus family, beyond tfidf)."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.bm25_rank(docs, "text", "doc_id", ["spark", "merge", "window"], k=20)


_BM25_SQL = r"""
WITH tok AS (
    SELECT doc_id,
           unnest(string_split_regex(trim(regexp_replace(lower(coalesce(text, '')), '\s+', ' ', 'g')), ' ')) AS term
    FROM documents
), dl AS (
    SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1
), stats AS (
    SELECT cast(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM dl
), tf AS (
    SELECT doc_id, term, cast(count(*) AS BIGINT) AS tf
    FROM tok WHERE term IN ('spark', 'merge', 'window') GROUP BY 1, 2
), dfreq AS (
    SELECT term, cast(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
)
SELECT doc_id,
       round(sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                 * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6) AS bm25,
       cast(count(*) AS BIGINT) AS n_terms
FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
GROUP BY doc_id
ORDER BY bm25 DESC, doc_id
LIMIT 20
"""


def _dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (hashed word-bigram features, 128
    buckets, Laplace-smoothed target-vs-raw log-ratio; target =
    English docs): deterministic top-20 most target-like docs.
    Micro-unit integer weights keep float accumulation order out of
    the cross-engine comparison."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.dsir_weights(docs, "text", "doc_id", F.col("lang") == "en", n_buckets=128, k=20)


_DSIR_SQL = r"""
WITH t AS (
    SELECT doc_id, (lang = 'en') AS tgt,
           string_split_regex(trim(regexp_replace(lower(coalesce(text, '')), '\s+', ' ', 'g')), ' ') AS toks
    FROM documents
), bg AS (
    SELECT doc_id, tgt,
           unnest([toks[i] || ' ' || toks[i + 1] FOR i IN generate_series(1, len(toks) - 1)]) AS bigram
    FROM t
), f AS (
    SELECT doc_id, tgt,
           (('0x' || substr(md5(bigram), 1, 8))::BIGINT) % 128 AS bucket
    FROM bg
), doc_feats AS (
    SELECT doc_id, tgt, bucket, cast(count(*) AS BIGINT) AS n FROM f GROUP BY 1, 2, 3
), models AS (
    SELECT bucket,
           cast(sum(CASE WHEN tgt THEN n ELSE 0 END) AS BIGINT) AS ct,
           cast(sum(n) AS BIGINT) AS cr
    FROM doc_feats GROUP BY 1
), totals AS (
    SELECT cast(sum(ct) AS BIGINT) AS tt, cast(sum(cr) AS BIGINT) AS tr FROM models
), bucket_lr AS (
    SELECT bucket,
           cast(floor(ln(((ct + 1) * (tr + 128)) / (1.0 * (cr + 1) * (tt + 128))) * 1000000.0) AS BIGINT) AS lr_micro
    FROM models CROSS JOIN totals
)
SELECT doc_id,
       cast(sum(n * lr_micro) AS BIGINT) AS weight_micro,
       cast(sum(n) AS BIGINT) AS n_feats
FROM doc_feats JOIN bucket_lr USING (bucket)
GROUP BY doc_id
ORDER BY weight_micro DESC, doc_id
LIMIT 20
"""


def _scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD build from the event stream: per-user event_type
    change compression + validity intervals (valid_from/valid_to,
    is_current). One key-partitioned shuffle; lag and lead share the
    exchange — the CDC history behind a truncate-reload dimension."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    return windows.scd2_history(ev, key="user_id", attr="event_type", ts="ts", tiebreak="event_id")


_SCD2_SQL = """
WITH ordered AS (
    SELECT user_id, event_type, ts, event_id,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
    FROM events
), changed AS (
    SELECT user_id, event_type, ts, event_id FROM ordered
    WHERE prev IS NULL OR event_type <> prev
)
SELECT user_id, event_type, ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       cast(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS INT) AS is_current
FROM changed
"""


def _scd2_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 maintenance: history built from events before
    2024-01-25, then the remaining days folded in as an in-order CDC
    batch via scd2_apply_batch — untouched keys pass through without
    recompute (O(batch keys), the incremental-twin discipline). The
    oracle is the FULL recompute over all events: the driver row is
    green iff fold(base) + batch == recompute(everything)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    cutoff = F.lit("2024-01-25").cast("timestamp")
    # r15: NO pin. The r14 eager persist_fact materialized the FULL
    # derived history per invocation (one extra job + DISK_ONLY write;
    # driver: 0.73 → 1.16 s), and key-pruning buys nothing here —
    # every key has batch events. scd2_apply_batch now consumes the
    # history exactly twice (pass-through + open-row seed, r15 marker
    # join), and the two consumers' window builds share one shuffle
    # via exchange reuse — the shuffle files ARE the materialization,
    # with recompute-on-loss for free (guide §2.4). In a real serving
    # stack this relation is at rest, read not rebuilt.
    base = windows.scd2_history(
        ev.filter(F.col("ts") < cutoff),
        key="user_id", attr="event_type", ts="ts", tiebreak="event_id",
        carry_last=True,
    )
    return windows.scd2_apply_batch(
        base,
        ev.filter(F.col("ts") >= cutoff),
        key="user_id", attr="event_type", ts="ts", tiebreak="event_id",
    ).select("user_id", "event_type", "valid_from", "valid_to", "is_current")


def _scd2_fold_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-order SCD2 maintenance: the MIDDLE ten days of the event
    stream arrive LAST (a backfill window), so the pre-built history
    already folded newer events for many keys. scd2_fold_or_repair
    splits the late batch by the per-key folded (last_ts, last_tb)
    watermark the carry history stores: keys whose late events are
    still strictly newer than their watermark fold in O(batch keys);
    keys with genuinely late events are rebuilt key-scoped from the
    raw log (the reference's backfill semantics,
    backfill/api_to_gcs-backfill.py:138-140). The oracle is the FULL
    recompute over all events — green iff fold+repair == recompute
    across the new/in-order/late/untouched key matrix."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    lo = F.lit("2024-01-10").cast("timestamp")
    hi = F.lit("2024-01-20").cast("timestamp")
    late = (F.col("ts") >= lo) & (F.col("ts") < hi)
    prior = ev.filter(~late)
    # r15: NO pin. The r14 eager persist_fact of the FULL derived
    # history cost more than it saved (driver: 1.33 → 2.64 s), and
    # key-pruning buys nothing — every key has late events. Instead
    # the operator's history consumption is down to TWO subtree
    # references (marker-join fold) sharing one exchange, and the
    # late-key watermark split derives from a cheap MAX aggregate
    # over the raw log (derive_watermarks) rather than a third
    # window-build consumer. At rest in a lake.
    base = windows.scd2_history(
        prior, key="user_id", attr="event_type", ts="ts", tiebreak="event_id",
        carry_last=True,
    )
    return windows.scd2_fold_or_repair(
        base, ev.filter(late), prior,
        key="user_id", attr="event_type", ts="ts", tiebreak="event_id",
        derive_watermarks=True,
    ).select("user_id", "event_type", "valid_from", "valid_to", "is_current")


def _scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment against the SCD2 history — THE consumer
    of a type-2 dimension: each purchase event is joined to the status
    interval (history over the non-purchase event stream) valid at its
    timestamp. Because validity intervals tile per key, the interval
    containing t is exactly the latest valid_from <= t, so the lookup
    compiles to the as-of carry-forward (one shuffle, no range join,
    no per-row search); the oracle states the same thing as an interval
    predicate, which DuckDB resolves independently. The as-of tiebreak
    is the change row's ORIGINAL event_id (scd2_history
    keep_tiebreak=True), so two status changes at the same (user_id,
    ts) resolve to the LATER event — exactly the interval that
    survives the oracle's zero-length-interval exclusion (r7 ADVICE:
    a max-status-string tiebreak would diverge on such ties)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    hist = windows.scd2_history(
        ev.filter(F.col("event_type") != "purchase"),
        key="user_id", attr="event_type", ts="ts", tiebreak="event_id",
        keep_tiebreak=True,
    ).select(
        "user_id",
        F.col("event_type").alias("status"),
        F.col("valid_from").alias("ts"),
        F.col("event_id").alias("change_eid"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    out = joins.asof_join(
        purchases, hist, key="user_id", ts="ts", tiebreak="change_eid", carry=["status"]
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("status_r").alias("status"),
        F.col("ts_r").alias("status_since"),
    )


_SCD2_PIT_SQL = """
WITH ordered AS (
    SELECT user_id, event_type, ts, event_id,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
    FROM events WHERE event_type <> 'purchase'
), hist AS (
    SELECT user_id, event_type AS status, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
    FROM ordered
    WHERE prev IS NULL OR event_type <> prev
)
SELECT p.event_id, p.user_id, p.ts, h.status, h.valid_from AS status_since
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
JOIN hist h
  ON p.user_id = h.user_id
 AND p.ts >= h.valid_from
 AND (h.valid_to IS NULL OR p.ts < h.valid_to)
"""


def _cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CRUD MERGE: a CDC batch (upserts AND deletes) applied to a
    snapshot via sinks.cdc_apply — winner-per-key picked by a
    struct-max hash aggregate (no row_number sort), snapshot rows with
    changed keys dropped by anti-join, winning upserts unioned in.
    Fixture: line 1 of each order is the snapshot; later lines are the
    change feed (R-flag lines are deletes), l_linenumber the version.
    The synthetic lineitem REPEATS line numbers within an order, so
    exact-version ties are real here and resolve by the lexicographic
    payload comparison — stated identically in the oracle's window
    ORDER BY."""
    li = load_table(spark, sf_dir, "lineitem")
    snap = li.filter(F.col("l_linenumber") == 1).select(
        F.col("l_orderkey").alias("k"), "l_quantity", "l_extendedprice"
    )
    changes = li.filter(F.col("l_linenumber") > 1).select(
        F.col("l_orderkey").alias("k"),
        F.col("l_linenumber").alias("v"),
        F.when(F.col("l_returnflag") == "R", F.lit("delete")).otherwise(F.lit("upsert")).alias("op"),
        "l_quantity",
        "l_extendedprice",
    )
    return sinks_mod.cdc_apply(snap, changes, key="k", op_col="op", version_col="v")


_CDC_MERGE_SQL = """
WITH snap AS (
    SELECT l_orderkey AS k, l_quantity, l_extendedprice
    FROM lineitem WHERE l_linenumber = 1
), ch AS (
    SELECT l_orderkey AS k, l_linenumber AS v,
           CASE WHEN l_returnflag = 'R' THEN 'delete' ELSE 'upsert' END AS op,
           l_quantity, l_extendedprice
    FROM lineitem WHERE l_linenumber > 1
), win AS (
    SELECT k, op, l_quantity, l_extendedprice,
           row_number() OVER (
               PARTITION BY k
               ORDER BY v DESC, CASE WHEN op = 'delete' THEN 1 ELSE 0 END DESC,
                        l_quantity DESC, l_extendedprice DESC
           ) AS rn
    FROM ch
)
SELECT s.k, s.l_quantity, s.l_extendedprice
FROM snap s
WHERE NOT EXISTS (SELECT 1 FROM win w WHERE w.k = s.k AND w.rn = 1)
UNION ALL
SELECT k, l_quantity, l_extendedprice
FROM win WHERE rn = 1 AND op <> 'delete'
"""


def _winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization — the feature-prep clip that MAD flagging stops
    short of: per group, prices clipped into [p05, p95] (exact
    interpolated percentiles; swap in approx_percentile at lake scale)
    and the robust mean compared to the raw one. Raw means sum exact
    integer cents (2dp data), clipped sums floor-scale to micro-units
    first — float accumulation order never reaches the comparison.
    Two passes over the fact: a percentile aggregate broadcast back,
    then one clip-and-aggregate."""
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    pct = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.05)").alias("p05"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
    )
    clipped = F.least(F.greatest(F.col("l_extendedprice"), F.col("p05")), F.col("p95"))
    return (
        li.join(F.broadcast(pct), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                ((F.col("l_extendedprice") < F.col("p05")) | (F.col("l_extendedprice") > F.col("p95"))).cast("long")
            ).alias("n_clipped"),
            F.round(F.min("p05"), 4).alias("p05"),
            F.round(F.min("p95"), 4).alias("p95"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("raw_cents"),
            F.sum(F.floor(clipped * 1000000.0).cast("long")).alias("wins_micro"),
        )
        .select(
            "l_returnflag",
            "n",
            "n_clipped",
            "p05",
            "p95",
            F.round(F.col("raw_cents") / 100.0 / F.col("n"), 6).alias("mean_raw"),
            F.round(F.col("wins_micro") / 1000000.0 / F.col("n"), 6).alias("mean_winsorized"),
        )
    )


_WINSOR_SQL = """
WITH pct AS (
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.05) AS p05,
           quantile_cont(l_extendedprice, 0.95) AS p95
    FROM lineitem GROUP BY 1
)
SELECT l.l_returnflag,
       cast(count(*) AS BIGINT) AS n,
       cast(sum(CASE WHEN l.l_extendedprice < p.p05 OR l.l_extendedprice > p.p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
       round(min(p.p05), 4) AS p05,
       round(min(p.p95), 4) AS p95,
       round(cast(sum(cast(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 / count(*), 6) AS mean_raw,
       round(cast(sum(cast(floor(least(greatest(l.l_extendedprice, p.p05), p.p95) * 1000000.0) AS BIGINT)) AS BIGINT) / 1000000.0 / count(*), 6) AS mean_winsorized
FROM lineitem l JOIN pct p USING (l_returnflag)
GROUP BY l.l_returnflag
"""


def _status_dwell_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dwell-time analytics over the SCD2 history: how long users sit
    in each status before changing — per-status interval count and
    mean duration over CLOSED intervals (open ones have no duration
    yet). Durations are exact whole+fractional seconds summed as
    integer microseconds; the history build is the same single
    key-partitioned exchange as scd2_history."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    hist = windows.scd2_history(ev, key="user_id", attr="event_type", ts="ts", tiebreak="event_id")
    dur_micro = (
        F.unix_micros(F.col("valid_to")) - F.unix_micros(F.col("valid_from"))
    )
    return (
        hist.filter(F.col("valid_to").isNotNull())
        .groupBy(F.col("event_type").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            # unrounded shared expression over exact integer micros
            # (r11 lint: round-4 of a rational mean can land on .5)
            (
                (F.sum(dur_micro).cast("double") / F.count(F.lit(1)).cast("double"))
                / 1000000.0
            ).alias("mean_dwell_s"),
        )
    )


_DWELL_SQL = """
WITH ordered AS (
    SELECT user_id, event_type, ts, event_id,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
    FROM events
), hist AS (
    SELECT user_id, event_type, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
    FROM ordered
    WHERE prev IS NULL OR event_type <> prev
)
SELECT event_type AS status,
       cast(count(*) AS BIGINT) AS n_intervals,
       (CAST(sum(epoch_us(valid_to) - epoch_us(valid_from)) AS DOUBLE) / CAST(count(*) AS DOUBLE)) / 1000000.0 AS mean_dwell_s
FROM hist
WHERE valid_to IS NOT NULL
GROUP BY event_type
"""


def _gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable gap-fill + LOCF (windows.gapfill_locf): the sparse
    per-(priority, day) order series densified onto each priority's own
    contiguous daily spine — order counts zero-filled (absent day = no
    orders), the day's max ticket carried forward as exact cents
    (absent day = price level unchanged). The spine explode is a
    narrow Generate; the left join and the LOCF window share one
    key-partitioned exchange."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.to_date("o_orderdate").alias("day"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.max(F.round(F.col("o_totalprice") * 100).cast("long")).alias("mx_cents"),
    )
    return windows.gapfill_locf(
        daily,
        key="priority",
        date_col="day",
        zero_fill={"n_orders": "n_orders"},
        locf={"locf_price_cents": "mx_cents"},
    )


_GAPFILL_SQL = """
WITH daily AS (
    SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
           cast(count(*) AS BIGINT) AS n_orders,
           max(cast(round(o_totalprice * 100) AS BIGINT)) AS mx_cents
    FROM orders GROUP BY 1, 2
), bounds AS (
    SELECT priority, min(day) AS mn, max(day) AS mx FROM daily GROUP BY 1
), spine AS (
    SELECT priority,
           CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS day
    FROM bounds
)
SELECT s.priority, s.day,
       cast(coalesce(d.n_orders, 0) AS BIGINT) AS n_orders,
       last_value(d.mx_cents IGNORE NULLS) OVER (
           PARTITION BY s.priority ORDER BY s.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS locf_price_cents
FROM spine s LEFT JOIN daily d ON s.priority = d.priority AND s.day = d.day
"""


def _assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional association rules over co-purchase baskets
    (aggregates.association_rules): support / confidence / lift for the
    top-20 rules by lift — basket_pairs' co-occurrence counts turned
    into the recommendation-strength signal. Pair counting stays
    ORDER-LOCAL (shuffle on l_orderkey, Σ|basket|² work); item supports
    are an items-sized aggregate broadcast onto the pair relation; all
    ratios divide exact integer counts once, so the doubles are
    bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return aggregates.association_rules(
        li, basket_col="l_orderkey", item_col="l_partkey", k=20, min_pair_count=2
    )


_ASSOC_RULES_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS nb FROM li),
cnt AS (SELECT l_partkey, cast(count(*) AS BIGINT) AS c FROM li GROUP BY 1),
pairs AS (
    SELECT a.l_partkey AS ante, b.l_partkey AS cons, cast(count(*) AS BIGINT) AS pair_n
    FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    GROUP BY 1, 2 HAVING count(*) >= 2
)
SELECT p.ante, p.cons, p.pair_n,
       round(p.pair_n / n.nb, 6) AS support,
       round(p.pair_n / ca.c, 6) AS confidence,
       round((p.pair_n * n.nb) / (ca.c * cc.c), 6) AS lift
FROM pairs p
JOIN cnt ca ON ca.l_partkey = p.ante
JOIN cnt cc ON cc.l_partkey = p.cons
CROSS JOIN n
ORDER BY lift DESC, ante, cons
LIMIT 20
"""


def _dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal profile per event type
    (aggregates.seasonal_index): ISO-weekday share vs a flat 1/7
    baseline with anomaly flags — the pre-forecast seasonality audit.
    One hash aggregate to the 7-rows-per-type grain; the ISO weekday is
    derived portably from Sunday-first dayofweek so the oracle can use
    isodow directly."""
    ev = load_table(spark, sf_dir, "events")
    return aggregates.seasonal_index(
        ev, ts_col="ts", group_col="event_type", anomaly_threshold=0.25
    )


_DOW_SEASONALITY_SQL = """
WITH by_dow AS (
    SELECT event_type, CAST(isodow(ts) AS INTEGER) AS iso_dow,
           cast(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
)
SELECT event_type, iso_dow, n,
       round((n * 7.0) / sum(n) OVER (PARTITION BY event_type), 6) AS seasonal_index,
       abs((n * 7.0) / sum(n) OVER (PARTITION BY event_type) - 1.0) > 0.25 AS is_anomalous
FROM by_dow
"""


def _cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint estimate per event type
    (windows.cusum_changepoint): the day where the running sum of
    deviations from the type's mean daily volume peaks in absolute
    value — the classic level-shift detector over a metrics
    hypertable. The running sum is an ORDER BY window, so its float
    accumulation order is deterministic; the argmax ranks the ROUNDED
    |CUSUM| so a last-ulp engine difference can never flip the winner.
    One (type, day) aggregate, then one type-partitioned exchange
    shared by the mean, running-sum and argmax windows."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type"), F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    return windows.cusum_changepoint(daily, key="event_type", date_col="day", value_col="n")


_CUSUM_SQL = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day, cast(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
), m AS (
    SELECT event_type, day, n,
           sum(n) OVER (PARTITION BY event_type) / count(*) OVER (PARTITION BY event_type) AS mean
    FROM daily
), c AS (
    SELECT event_type, day,
           sum(n - mean) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cusum
    FROM m
), ranked AS (
    SELECT event_type, day, cusum,
           row_number() OVER (
               PARTITION BY event_type ORDER BY round(abs(cusum), 6) DESC, day
           ) AS rn
    FROM c
)
SELECT event_type, day AS changepoint, round(abs(cusum), 6) AS max_abs_cusum
FROM ranked WHERE rn = 1
"""


def _k_core_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-core decomposition (graph.k_core) of the co-purchase
    graph (parts bought together in ≥2 orders): three peel-and-recount
    rounds at k=3 isolate the dense center — the graph-density filter
    that pagerank/label-propagation rankings read downstream. Fixed
    iterations keep the oracle an exact unrolled CTE (the engine's
    iterative-algorithm discipline); each round is one degree aggregate
    plus two survivor semi-joins on localCheckpointed edges."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select("l_orderkey", F.col("l_partkey").alias("src"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("src", "dst")
    )
    return graph.k_core(edges, k=3, n_iters=3)


_K_CORE_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e0 AS (
    SELECT a.l_partkey AS x, b.l_partkey AS y
    FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2 HAVING count(*) >= 2
),
s0 AS (SELECT x AS a, y AS b FROM e0 UNION SELECT y, x FROM e0),
k1 AS (SELECT a FROM s0 GROUP BY a HAVING count(*) >= 3),
s1 AS (SELECT s.a, s.b FROM s0 s JOIN k1 ka ON s.a = ka.a JOIN k1 kb ON s.b = kb.a),
k2 AS (SELECT a FROM s1 GROUP BY a HAVING count(*) >= 3),
s2 AS (SELECT s.a, s.b FROM s1 s JOIN k2 ka ON s.a = ka.a JOIN k2 kb ON s.b = kb.a),
k3 AS (SELECT a FROM s2 GROUP BY a HAVING count(*) >= 3),
s3 AS (SELECT s.a, s.b FROM s2 s JOIN k3 ka ON s.a = ka.a JOIN k3 kb ON s.b = kb.a)
SELECT a AS node, cast(count(*) AS BIGINT) AS core_degree FROM s3 GROUP BY 1
"""


def _sq8_quantize_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization audit
    (similarity.sq8_reconstruction_stats): per-dimension [min, max]
    256-level grids, midpoint reconstruction, and the per-label error
    budget of 4× embedding compression — the SQ sibling of the PQ
    audit (pq_recall_eval). Codes are bit-identical across engines
    (order-insensitive min/max + deterministic IEEE expressions); only
    the error sum is rounded."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.sq8_reconstruction_stats(
        emb, vec_col="embedding", group_col="label"
    )


_SQ8_SQL = """
WITH x AS (
    SELECT label, generate_subscripts(embedding, 1) AS dim,
           unnest(embedding)::DOUBLE AS x
    FROM embeddings
), st AS (
    SELECT dim, min(x) AS lo, max(x) AS hi, (max(x) - min(x)) / 255.0 AS step
    FROM x GROUP BY 1
), e AS (
    SELECT x.label,
           CASE WHEN st.step = 0.0 THEN 0.0
                ELSE x.x - (st.lo + (least(floor((x.x - st.lo) / st.step), 255.0) + 0.5) * st.step)
           END AS err
    FROM x JOIN st ON x.dim = st.dim
)
SELECT label, cast(count(*) AS BIGINT) AS n_values,
       round(sum(err * err), 6) AS sq_err_sum,
       round(max(abs(err)), 9) AS max_abs_err
FROM e GROUP BY label
"""


def _zone_map_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map data-skipping audit (sketch.zone_map_prune_stats): the
    per-block min/max maps a [1994-04-01, 1994-09-30] order-date scan
    would consult, under two physical layouts of the SAME table — a
    64-block md5-hash layout (ingest-order stand-in: every block spans
    the full date range, nothing skips) vs a quarter-clustered layout
    (time-partitioned: all but ~2 blocks skip). The measured
    skip_fraction is the justification for the engine's sort-on-write
    and partitioned sinks — at 100 TB it is the difference between
    scanning everything and scanning one quarter."""
    orders = load_table(spark, sf_dir, "orders")
    day = F.to_date("o_orderdate")
    df = orders.select(
        F.col("o_orderkey"), day.alias("day"),
        (((F.year(day) - F.lit(1992)) * 4) + F.quarter(day) - 1).cast("long").alias("qblock"),
    )
    layouts = {
        "hash_64": corpus.hash_bucket(F.col("o_orderkey"), 64),
        "quarter_clustered": F.col("qblock"),
    }
    import datetime as _dt

    return sketch.zone_map_prune_stats(
        df, value_col="day", layouts=layouts,
        lo=_dt.date(1994, 4, 1), hi=_dt.date(1994, 9, 30),
    )


_ZONE_MAP_SQL = """
WITH base AS (
    SELECT o_orderkey, CAST(o_orderdate AS DATE) AS day,
           ((year(o_orderdate) - 1992) * 4 + quarter(o_orderdate) - 1) AS qblock,
           CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 64 AS hblock
    FROM orders
), z AS (
    SELECT 'hash_64' AS layout, hblock AS block, min(day) AS zmin, max(day) AS zmax
    FROM base GROUP BY 1, 2
    UNION ALL
    SELECT 'quarter_clustered', qblock, min(day), max(day) FROM base GROUP BY 1, 2
)
SELECT layout, cast(count(*) AS BIGINT) AS n_blocks,
       cast(sum(CASE WHEN zmax >= DATE '1994-04-01' AND zmin <= DATE '1994-09-30' THEN 1 ELSE 0 END) AS BIGINT) AS n_read,
       cast(sum(CASE WHEN zmax < DATE '1994-04-01' OR zmin > DATE '1994-09-30' THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped,
       round(sum(CASE WHEN zmax < DATE '1994-04-01' OR zmin > DATE '1994-09-30' THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6) AS skip_fraction
FROM z GROUP BY layout
"""


def _price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part price-elasticity screen (aggregates.ols_slope_exact):
    OLS slope of quantity on unit price (whole dollars) from EXACT
    integer moment sums — 100 TB of line items reduce to four bigint
    moments per part, one hash aggregate, no window, and the single
    float division happens after aggregation (bit-identical across
    engines and run orders). Unit price floors to dollars, not cents,
    to keep nΣx² inside bigint at sf ≥ 1 (bound stated in the operator
    docstring)."""
    li = load_table(spark, sf_dir, "lineitem")
    return aggregates.ols_slope_exact(
        li.select(
            "l_partkey",
            F.floor(F.col("l_extendedprice") / F.col("l_quantity")).alias("px"),
            F.floor(F.col("l_quantity")).alias("qty"),
        ),
        key="l_partkey",
        x_int=F.col("px"),
        y_int=F.col("qty"),
        min_n=5,
    )


_ELASTICITY_SQL = """
WITH pts AS (
    SELECT l_partkey,
           CAST(floor(l_extendedprice / l_quantity) AS BIGINT) AS x,
           CAST(floor(l_quantity) AS BIGINT) AS y
    FROM lineitem
), m AS (
    SELECT l_partkey, cast(count(*) AS BIGINT) AS n,
           cast(sum(x) AS BIGINT) AS sx, cast(sum(y) AS BIGINT) AS sy,
           cast(sum(x * y) AS BIGINT) AS sxy, cast(sum(x * x) AS BIGINT) AS sxx
    FROM pts GROUP BY 1
)
SELECT l_partkey, n,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 8) AS slope,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6) AS intercept
FROM m
WHERE n >= 5 AND (n * sxx - sx * sx) <> 0
"""


def _touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-/last-touch marketing attribution
    (windows.touch_attribution): every purchase credited to the first
    and the most recent non-purchase event strictly before it in the
    user's timeline. Both carries are IGNORE-NULLS first/last over ONE
    user-partitioned window with a [unbounded, 1 preceding] frame —
    one exchange, one sort, no join, nothing quadratic in session
    length."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    return windows.touch_attribution(
        ev, user_col="user_id", ts_col="ts", type_col="event_type",
        conversion="purchase", tiebreak="event_id",
    )


_TOUCH_SQL = """
SELECT event_id, user_id, ts, first_touch, last_touch
FROM (
    SELECT event_id, user_id, ts, event_type,
           first_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_touch,
           last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch
    FROM events
) t WHERE event_type = 'purchase'
"""


def _inventory_runout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inventory-cover audit (windows.running_balance_runout): each
    part's ledger replays signed movements in ship-date order against
    a fixed opening stock (returns restock, sales draw down) and
    reports min balance, first stockout date, closing balance. All
    balances are exact integers over an ORDER BY window — bit-exact on
    any engine with a TOTAL ordering, which the (date, order, line,
    delta) tiebreak chain provides even though the synthetic lineitem
    repeats line numbers (identical rows commute through a running
    sum; differing rows are pinned by the delta term)."""
    li = load_table(spark, sf_dir, "lineitem")
    delta = F.when(
        F.col("l_returnflag") == "R", F.floor(F.col("l_quantity"))
    ).otherwise(-F.floor(F.col("l_quantity")))
    flows = li.select(
        "l_partkey", F.to_date("l_shipdate").alias("d"),
        "l_orderkey", "l_linenumber", delta.alias("delta"),
    )
    return windows.running_balance_runout(
        flows, key="l_partkey", ts_col="d", delta_col=F.col("delta"),
        opening=F.lit(50),
        tiebreaks=[F.col("l_orderkey"), F.col("l_linenumber"), F.col("delta")],
    )


_RUNOUT_SQL = """
WITH flows AS (
    SELECT l_partkey, CAST(l_shipdate AS DATE) AS d, l_orderkey, l_linenumber,
           CASE WHEN l_returnflag = 'R' THEN CAST(floor(l_quantity) AS BIGINT)
                ELSE -CAST(floor(l_quantity) AS BIGINT) END AS delta
    FROM lineitem
), bal AS (
    SELECT l_partkey, d, delta,
           50 + sum(delta) OVER (
               PARTITION BY l_partkey ORDER BY d, l_orderkey, l_linenumber, delta
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS b
    FROM flows
)
SELECT l_partkey,
       cast(min(b) AS BIGINT) AS min_balance,
       min(CASE WHEN b < 0 THEN d END) AS first_stockout,
       cast(50 + sum(delta) AS BIGINT) AS closing_balance
FROM bal GROUP BY 1
"""


def _revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration Gini per market segment
    (aggregates.gini_concentration): how unevenly each segment's
    revenue spreads across its customers. Rank × exact cents keeps
    every sum a bigint, so the one float division is the statistic
    itself; the ranking window partitions by segment (never a global
    sort). The customer dim joins broadcast."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    rev = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select("c_mktsegment", "o_custkey", "o_totalprice")
    return aggregates.gini_concentration(
        rev, group_col="c_mktsegment", unit_col="o_custkey",
        value_cents=F.round(F.col("o_totalprice") * 100).cast("long"),
    )


_GINI_SQL = """
WITH per_unit AS (
    SELECT c_mktsegment, o_custkey,
           cast(sum(cast(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1, 2
), ranked AS (
    SELECT c_mktsegment, cents,
           row_number() OVER (PARTITION BY c_mktsegment ORDER BY cents, o_custkey) AS i
    FROM per_unit
)
SELECT c_mktsegment, cast(count(*) AS BIGINT) AS n_units,
       cast(sum(cents) AS BIGINT) AS total_cents,
       round((2 * sum(i * cents) - (count(*) + 1) * sum(cents))
             / (count(*) * sum(cents)), 6) AS gini
FROM ranked GROUP BY 1
"""


def _benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit screen (quality.benford_profile) over order
    totals — the fabricated-numbers / upstream-corruption audit in the
    engine's DQ family. Leading digit comes from the decimal rendering
    of exact integer cents (never float log10, whose libm rounding at
    power-of-ten boundaries is not engine-portable); expectations are
    shared rounded literals. One hash aggregate to 9 rows."""
    orders = load_table(spark, sf_dir, "orders")
    return quality.benford_profile(
        orders, amount_cents=F.round(F.col("o_totalprice") * 100).cast("long")
    )


def _benford_sql() -> str:
    from z316_sales_data_pipeline_spark.operators.quality import BENFORD_EXPECTED

    case = " ".join(
        f"WHEN {d} THEN {round(p, 6)}" for d, p in sorted(BENFORD_EXPECTED.items())
    )
    return f"""
WITH digits AS (
    SELECT CAST(substring(CAST(cast(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
    FROM orders
), counts AS (
    SELECT digit, cast(count(*) AS BIGINT) AS n FROM digits WHERE digit >= 1 GROUP BY 1
), total AS (SELECT cast(sum(n) AS BIGINT) AS total FROM counts)
SELECT digit, n,
       round(n / CAST(total AS DOUBLE), 6) AS share,
       CAST(CASE digit {case} END AS DOUBLE) AS expected,
       round(abs(n / CAST(total AS DOUBLE) - CAST(CASE digit {case} END AS DOUBLE)), 6) AS abs_dev
FROM counts CROSS JOIN total
"""


_BENFORD_SQL = _benford_sql()


def _abc_xyz_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XYZ demand-variability classes per part
    (aggregates.variability_classes) — the forecastability companion
    to pareto_abc's revenue classes: coefficient of variation of
    monthly demand from exact integer moments, classified on the
    ROUNDED cv so the X/Y/Z boundary is engine-exact. Two hash
    aggregates; observed months only (densify via gapfill_locf when
    calendar-complete variability is wanted)."""
    li = load_table(spark, sf_dir, "lineitem")
    return aggregates.variability_classes(
        li,
        key="l_partkey",
        period_col=(F.year("l_shipdate") * 100 + F.month("l_shipdate")).cast("int"),
        qty_int=F.floor(F.col("l_quantity")),
        min_periods=3,
    )


_ABC_XYZ_SQL = """
WITH demand AS (
    SELECT l_partkey, year(l_shipdate) * 100 + month(l_shipdate) AS p,
           cast(sum(cast(floor(l_quantity) AS BIGINT)) AS BIGINT) AS x
    FROM lineitem GROUP BY 1, 2
), m AS (
    SELECT l_partkey, cast(count(*) AS BIGINT) AS n,
           cast(sum(x) AS BIGINT) AS sx, cast(sum(x * x) AS BIGINT) AS sxx
    FROM demand GROUP BY 1
)
SELECT l_partkey, n AS n_periods, sx AS total_qty,
       round(sqrt((n * sxx - sx * sx) / (n * (n - 1))) / (sx / n), 6) AS cv,
       CASE WHEN round(sqrt((n * sxx - sx * sx) / (n * (n - 1))) / (sx / n), 6) < 0.5 THEN 'X'
            WHEN round(sqrt((n * sxx - sx * sx) / (n * (n - 1))) / (sx / n), 6) < 1.0 THEN 'Y'
            ELSE 'Z' END AS xyz_class
FROM m WHERE n >= 3 AND sx > 0
"""


def _new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning customer split: each order is NEW iff it
    is its customer's first (rank 1 by order date with a key
    tie-break), then one aggregate to the day grain — the
    acquisition/retention series every sales dashboard leads with.
    One customer-partitioned window exchange, then a hash aggregate;
    exact integer counts end to end."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("__rn", F.row_number().over(w))
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum((F.col("__rn") == 1).cast("long")).alias("n_new"),
            F.sum((F.col("__rn") > 1).cast("long")).alias("n_returning"),
        )
    )


_NEW_RETURNING_SQL = """
WITH r AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
    FROM orders
)
SELECT day,
       cast(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       cast(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_returning
FROM r GROUP BY day
"""


def _char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language character-distribution entropy
    (corpus.char_entropy_by_group) — the compression-ratio quality
    proxy. The char grain reduces immediately to (lang, char) counts
    (partial aggregation before the shuffle), so the wide relation
    never crosses the wire; entropy folds ≤ |alphabet| float terms per
    language, rounded at the audit grain."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    return corpus.char_entropy_by_group(docs, text_col="text", group_col="lang")


_CHAR_ENTROPY_SQL = """
WITH chars AS (
    SELECT lang, substring(text, CAST(i AS INTEGER), 1) AS ch
    FROM documents, unnest(generate_series(1, length(text))) AS t(i)
    WHERE length(text) > 0
), counts AS (
    SELECT lang, ch, cast(count(*) AS BIGINT) AS c FROM chars GROUP BY 1, 2
), terms AS (
    SELECT lang, c,
           -((c / CAST(sum(c) OVER (PARTITION BY lang) AS DOUBLE))
             * log2(c / CAST(sum(c) OVER (PARTITION BY lang) AS DOUBLE))) AS term
    FROM counts
)
SELECT lang, cast(sum(c) AS BIGINT) AS n_chars,
       round(sum(term), 6) AS entropy_bits
FROM terms GROUP BY lang
"""


def _promo_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand promotion uplift as a difference-in-differences: PROMO
    vs non-PROMO parts of the same brand, mean line revenue before vs
    after the 1998-01-01 period split (mid-range of the synthetic
    1995-2001 ship dates); uplift = (Δtreat − Δcontrol).
    ONE conditional hash aggregate computes all four cells (no pivot,
    no self-join) from exact integer cents; brands missing any cell are
    excluded rather than served NULL arithmetic. The part dim joins
    broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", (F.col("p_type") == "PROMO").alias("is_promo")
    )
    cut = F.lit("1998-01-01").cast("date")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "p_brand",
        "is_promo",
        (F.to_date("l_shipdate") >= cut).alias("is_after"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )

    def cell(promo: bool, after: bool, what: str):
        cond = (F.col("is_promo") == promo) & (F.col("is_after") == after)
        if what == "sum":
            return F.sum(F.when(cond, F.col("cents")).otherwise(F.lit(0)))
        return F.sum(cond.cast("long"))

    agg = joined.groupBy("p_brand").agg(
        cell(True, False, "sum").alias("s_tb"), cell(True, False, "n").alias("n_tb"),
        cell(True, True, "sum").alias("s_ta"), cell(True, True, "n").alias("n_ta"),
        cell(False, False, "sum").alias("s_cb"), cell(False, False, "n").alias("n_cb"),
        cell(False, True, "sum").alias("s_ca"), cell(False, True, "n").alias("n_ca"),
    ).filter(
        (F.col("n_tb") > 0) & (F.col("n_ta") > 0) & (F.col("n_cb") > 0) & (F.col("n_ca") > 0)
    )
    # unrounded shared expressions over exact integer cells (r11 lint:
    # round-4 of a rational s/n can land on .5 -> HALF_UP/half-even)
    m = {
        c: F.col(f"s_{c}").cast("double") / F.col(f"n_{c}").cast("double") / F.lit(100.0)
        for c in ("tb", "ta", "cb", "ca")
    }
    return agg.select(
        "p_brand",
        m["tb"].alias("mean_treat_before"),
        m["ta"].alias("mean_treat_after"),
        m["cb"].alias("mean_ctrl_before"),
        m["ca"].alias("mean_ctrl_after"),
        ((m["ta"] - m["tb"]) - (m["ca"] - m["cb"])).alias("uplift"),
    )


_PROMO_UPLIFT_SQL = """
WITH j AS (
    SELECT p_brand, p_type = 'PROMO' AS is_promo,
           CAST(l_shipdate AS DATE) >= DATE '1998-01-01' AS is_after,
           cast(round(l_extendedprice * 100) AS BIGINT) AS cents
    FROM lineitem JOIN part ON l_partkey = p_partkey
), agg AS (
    SELECT p_brand,
           cast(sum(CASE WHEN is_promo AND NOT is_after THEN cents ELSE 0 END) AS BIGINT) AS s_tb,
           cast(sum(CASE WHEN is_promo AND NOT is_after THEN 1 ELSE 0 END) AS BIGINT) AS n_tb,
           cast(sum(CASE WHEN is_promo AND is_after THEN cents ELSE 0 END) AS BIGINT) AS s_ta,
           cast(sum(CASE WHEN is_promo AND is_after THEN 1 ELSE 0 END) AS BIGINT) AS n_ta,
           cast(sum(CASE WHEN NOT is_promo AND NOT is_after THEN cents ELSE 0 END) AS BIGINT) AS s_cb,
           cast(sum(CASE WHEN NOT is_promo AND NOT is_after THEN 1 ELSE 0 END) AS BIGINT) AS n_cb,
           cast(sum(CASE WHEN NOT is_promo AND is_after THEN cents ELSE 0 END) AS BIGINT) AS s_ca,
           cast(sum(CASE WHEN NOT is_promo AND is_after THEN 1 ELSE 0 END) AS BIGINT) AS n_ca
    FROM j GROUP BY 1
)
SELECT p_brand,
       CAST(s_tb AS DOUBLE) / CAST(n_tb AS DOUBLE) / 100.0 AS mean_treat_before,
       CAST(s_ta AS DOUBLE) / CAST(n_ta AS DOUBLE) / 100.0 AS mean_treat_after,
       CAST(s_cb AS DOUBLE) / CAST(n_cb AS DOUBLE) / 100.0 AS mean_ctrl_before,
       CAST(s_ca AS DOUBLE) / CAST(n_ca AS DOUBLE) / 100.0 AS mean_ctrl_after,
       (CAST(s_ta AS DOUBLE) / CAST(n_ta AS DOUBLE) / 100.0 - CAST(s_tb AS DOUBLE) / CAST(n_tb AS DOUBLE) / 100.0)
       - (CAST(s_ca AS DOUBLE) / CAST(n_ca AS DOUBLE) / 100.0 - CAST(s_cb AS DOUBLE) / CAST(n_cb AS DOUBLE) / 100.0) AS uplift
FROM agg
WHERE n_tb > 0 AND n_ta > 0 AND n_cb > 0 AND n_ca > 0
"""


def _duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment fraud/DQ screen
    (quality.near_duplicate_payments): repeat orders on one customer in
    the same amount tier within 180 days. Equi hash join on (customer,
    tier) — per-key groups are account×amount sized, so the screen is
    never a range join or a cross product. Operating point: the
    synthetic totals are continuous-uniform (an exact-cents duplicate
    NEVER occurs, measured 0 pairs at every SF), so the entry
    exercises the screen at a $10k tier where the data has real
    collisions; the exact-cents point — the production default — is
    pinned by the unit test instead."""
    orders = load_table(spark, sf_dir, "orders")
    return quality.near_duplicate_payments(
        orders.withColumn("d", F.to_date("o_orderdate")),
        account_col="o_custkey",
        id_col="o_orderkey",
        date_col="d",
        amount_cents=F.floor(F.col("o_totalprice") / 10000).cast("long"),
        max_days_apart=180,
    )


_DUP_PAYMENTS_SQL = """
WITH base AS (
    SELECT o_custkey AS acct, o_orderkey AS oid, CAST(o_orderdate AS DATE) AS d,
           cast(floor(o_totalprice / 10000) AS BIGINT) AS cents
    FROM orders
)
SELECT a.acct, a.oid AS id_a, b.oid AS id_b, a.cents,
       cast(abs(datediff('day', a.d, b.d)) AS INTEGER) AS days_apart
FROM base a JOIN base b ON a.acct = b.acct AND a.cents = b.cents AND a.oid < b.oid
WHERE abs(datediff('day', a.d, b.d)) <= 180
"""


def _churn_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn-rate audit per market segment: a customer is churned iff
    their LAST order predates the corpus horizon (global max order
    date) by more than 90 days. The horizon is a 1-row aggregate
    broadcast back; per-customer last-order is a hash aggregate; the
    segment dim joins broadcast — three reductions, no window."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    last = orders.groupBy("o_custkey").agg(F.max(F.to_date("o_orderdate")).alias("last_d"))
    horizon = orders.agg(F.max(F.to_date("o_orderdate")).alias("h"))
    flagged = last.crossJoin(F.broadcast(horizon)).select(
        "o_custkey", (F.datediff(F.col("h"), F.col("last_d")) > 90).alias("churned")
    )
    return (
        flagged.join(F.broadcast(cust), flagged.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("churned").cast("long")).alias("n_churned"),
        )
        .select(
            "c_mktsegment",
            "n_customers",
            "n_churned",
            F.round(F.col("n_churned") / F.col("n_customers"), 6).alias("churn_rate"),
        )
    )


_CHURN_SQL = """
WITH last AS (
    SELECT o_custkey, max(CAST(o_orderdate AS DATE)) AS last_d FROM orders GROUP BY 1
), h AS (SELECT max(CAST(o_orderdate AS DATE)) AS h FROM orders)
SELECT c_mktsegment,
       cast(count(*) AS BIGINT) AS n_customers,
       cast(sum(CASE WHEN datediff('day', last_d, h.h) > 90 THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
       round(sum(CASE WHEN datediff('day', last_d, h.h) > 90 THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS churn_rate
FROM last JOIN customer ON o_custkey = c_custkey CROSS JOIN h
GROUP BY 1
"""


def _ewma_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dyadic-exact EWMA of daily revenue plus a one-step-ahead
    backtest (timeseries.ewma_forecast): alpha=1/2 weights scaled by
    2^30 keep every accumulated term a bigint, so the smoothed level,
    the forecast and the absolute backtest error are all exact
    integers — zero float summation anywhere. The corpus reduces to a
    day-grain relation first; the k-lag calendar self-join is
    O(days x 31) regardless of corpus size."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    out = timeseries.ewma_forecast(daily, "day", "cents", k=30)
    return out.select(
        "day",
        F.col("value").alias("revenue_cents"),
        F.col("ewma_floor").alias("ewma_cents"),
        F.col("forecast_floor").alias("forecast_cents"),
        F.col("abs_err_floor").alias("abs_err_cents"),
    )


_EWMA_SQL = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
    FROM orders GROUP BY 1
), j AS (
    SELECT a.d, a.x,
           CAST(sum(CASE WHEN datediff('day', b.d, a.d) <= 29
                         THEN b.x * CAST(pow(2, 29 - datediff('day', b.d, a.d)) AS BIGINT) END) AS BIGINT) AS s_now,
           CAST(sum(CASE WHEN datediff('day', b.d, a.d) >= 1
                         THEN b.x * CAST(pow(2, 30 - datediff('day', b.d, a.d)) AS BIGINT) END) AS BIGINT) AS s_prev
    FROM daily a JOIN daily b ON b.d BETWEEN a.d - 30 AND a.d
    GROUP BY 1, 2
)
SELECT d AS day, x AS revenue_cents,
       (s_now // 1073741824) AS ewma_cents,
       (s_prev // 1073741824) AS forecast_cents,
       (abs(x * 1073741824 - s_prev) // 1073741824) AS abs_err_cents
FROM j
"""


def _peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly peak of simultaneously-open orders
    (windows.peak_concurrency): order open = orderdate, close = max
    lineitem shipdate; the sweep-line running sum is exact-integer
    over the total order (date, delta, orderkey) — closes before
    opens on ties — and runs through the range-partitioned two-phase
    primitive, so there is no single-partition WindowExec."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    closes = li.groupBy("l_orderkey").agg(
        F.max(F.to_date("l_shipdate")).alias("close_d")
    )
    iv = orders.select(
        "o_orderkey", F.to_date("o_orderdate").alias("open_d")
    ).join(closes, F.col("o_orderkey") == F.col("l_orderkey"))
    return windows.peak_concurrency(
        iv,
        start_col="open_d",
        end_col="close_d",
        id_col="o_orderkey",
        bucket_of=lambda d: F.date_format(d, "yyyy-MM"),
        bucket_name="month",
    )


_PEAK_CONCURRENCY_SQL = """
WITH iv AS (
    SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS open_d,
           max(CAST(l.l_shipdate AS DATE)) AS close_d
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
), ev AS (
    SELECT open_d AS d, CAST(1 AS BIGINT) AS delta, o_orderkey AS id FROM iv
    UNION ALL
    SELECT close_d + 1, CAST(-1 AS BIGINT), o_orderkey FROM iv
), sw AS (
    SELECT d, CAST(sum(delta) OVER (ORDER BY d, delta, id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS live
    FROM ev
)
SELECT strftime(d, '%Y-%m') AS month, CAST(max(live) AS BIGINT) AS peak_concurrent
FROM sw GROUP BY 1
"""


def _safety_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part reorder point at a 95% service level over a 7-day
    lead time (aggregates.safety_stock): integer daily-demand moments
    per part, one hash aggregate, float math only after aggregation —
    100 TB of line items reduce to three bigints per part."""
    li = load_table(spark, sf_dir, "lineitem")
    demand = li.groupBy(
        "l_partkey", F.to_date("l_shipdate").alias("d")
    ).agg(F.sum(F.floor("l_quantity")).alias("q"))
    return aggregates.safety_stock(
        demand, "l_partkey", F.col("q"), lead_days=7, z_service=1.65, min_days=20
    )


_SAFETY_STOCK_SQL = """
WITH dm AS (
    SELECT l_partkey, CAST(l_shipdate AS DATE) AS d,
           CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS q
    FROM lineitem GROUP BY 1, 2
), m AS (
    SELECT l_partkey, cast(count(*) AS BIGINT) AS n_days,
           cast(sum(q) AS BIGINT) AS sx, cast(sum(q * q) AS BIGINT) AS sxx
    FROM dm GROUP BY 1
)
SELECT l_partkey, n_days,
       round(sx / CAST(n_days AS DOUBLE), 6) AS mean_daily,
       round(sqrt((n_days * sxx - sx * sx) / (CAST(n_days AS DOUBLE) * (n_days - 1.0))), 6) AS std_daily,
       round(sx / CAST(n_days AS DOUBLE) * 7
             + 1.65 * sqrt((n_days * sxx - sx * sx) / (CAST(n_days AS DOUBLE) * (n_days - 1.0))) * sqrt(7.0),
             6) AS reorder_point
FROM m WHERE n_days >= 20
"""


def _kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival of customer repurchase intervals
    (timeseries.kaplan_meier): per-user gaps between consecutive
    purchases, right-censored at the corpus horizon. The subject
    relation collapses to duration grain before any pairwise work, so
    the risk-set and cumulative-product joins are O(distinct
    durations²) — calendar-bounded, corpus-independent."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.to_date("ts").alias("d"), "ts", "event_id")
    )
    nxt = F.lead("d").over(
        Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    )
    horizon = ev.agg(F.max("d").alias("obs_end"))
    durations = (
        ev.withColumn("__nd", nxt)
        .crossJoin(F.broadcast(horizon))
        .select(
            F.datediff(F.coalesce(F.col("__nd"), F.col("obs_end")), F.col("d")).alias(
                "dur"
            ),
            F.when(F.col("__nd").isNotNull(), 1).otherwise(0).alias("ev"),
        )
    )
    return timeseries.kaplan_meier(durations, "dur", "ev")


_KAPLAN_MEIER_SQL = """
WITH p AS (
    SELECT user_id, CAST(ts AS DATE) AS d,
           lead(CAST(ts AS DATE)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nd
    FROM events WHERE event_type = 'purchase'
), mx AS (SELECT max(CAST(ts AS DATE)) AS obs_end FROM events WHERE event_type = 'purchase'),
dur AS (
    SELECT CAST(datediff('day', d, coalesce(nd, obs_end)) AS BIGINT) AS t,
           CASE WHEN nd IS NULL THEN 0 ELSE 1 END AS e
    FROM p CROSS JOIN mx
), per_t AS (
    SELECT t, cast(count(*) AS BIGINT) AS c, cast(sum(e) AS BIGINT) AS d_events
    FROM dur GROUP BY 1
), risk AS (
    SELECT a.t, CAST(sum(b.c) AS BIGINT) AS n_risk
    FROM per_t a JOIN per_t b ON b.t >= a.t GROUP BY 1
), steps AS (
    SELECT a.t, a.d_events, r.n_risk,
           CASE WHEN a.d_events < r.n_risk
                THEN ln(1 - a.d_events / CAST(r.n_risk AS DOUBLE)) END AS lnterm,
           CASE WHEN a.d_events = r.n_risk THEN 1 ELSE 0 END AS zflag
    FROM per_t a JOIN risk r ON r.t = a.t WHERE a.d_events > 0
)
SELECT a.t, a.n_risk, a.d_events,
       round(CASE WHEN max(b.zflag) = 1 THEN 0.0 ELSE exp(sum(b.lnterm)) END, 6) AS survival
FROM steps a JOIN steps b ON b.t <= a.t
GROUP BY 1, 2, 3
"""


def _mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test + Theil-Sen slope of monthly revenue
    per nation (timeseries.mann_kendall_sen): facts reduce to a
    month-grain relation first, so the pairwise sign/slope join is
    O(months² per nation) — a calendar constant. S and n are exact
    integers; tau / z / interpolated median slope are single
    post-aggregation float expressions."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    monthly = (
        orders.join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(
            "n_name",
            (
                (F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate") - 1
            ).alias("t"),
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("v"))
    )
    return timeseries.mann_kendall_sen(monthly, ["n_name"], "t", "v", min_n=8)


_MANN_KENDALL_SQL = """
WITH m AS (
    SELECT n_name,
           CAST((year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1 AS BIGINT) AS t,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    JOIN nation ON n_nationkey = c_nationkey
    GROUP BY 1, 2
), pr AS (
    SELECT a.n_name,
           CAST(sum(CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT) AS s_stat,
           median((b.v - a.v) / CAST(b.t - a.t AS DOUBLE)) AS sen
    FROM m a JOIN m b ON b.n_name = a.n_name AND b.t > a.t
    GROUP BY 1
), c AS (SELECT n_name, cast(count(*) AS BIGINT) AS n_periods FROM m GROUP BY 1)
SELECT c.n_name, c.n_periods, pr.s_stat,
       round(pr.s_stat / (CAST(c.n_periods AS DOUBLE) * (c.n_periods - 1) / 2.0), 6) AS tau,
       round(CASE WHEN pr.s_stat > 0
                  THEN (pr.s_stat - 1) / sqrt(CAST(c.n_periods AS DOUBLE) * (c.n_periods - 1) * (2 * c.n_periods + 5) / 18.0)
                  WHEN pr.s_stat < 0
                  THEN (pr.s_stat + 1) / sqrt(CAST(c.n_periods AS DOUBLE) * (c.n_periods - 1) * (2 * c.n_periods + 5) / 18.0)
                  ELSE 0.0 END, 6) AS z_score,
       round(pr.sen, 6) AS sen_slope
FROM c JOIN pr ON pr.n_name = c.n_name
WHERE c.n_periods >= 8
"""


def _ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 5-gram novelty in corpus order
    (corpus.ngram_novelty): the fraction of a doc's distinct word
    5-grams first seen in THIS doc. Grams hash to the seedless
    md5-long family in the generate stage, so only (doc_id, hash)
    longs shuffle — O(total tokens), the curation-side complement of
    span_dedup's symmetric overlap."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.ngram_novelty(docs, "text", "doc_id", n=5)


_NGRAM_NOVELTY_SQL = r"""
WITH t AS (
    SELECT doc_id,
           string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
    FROM documents
), g AS (
    SELECT DISTINCT doc_id,
           CAST(('0x' || substring(md5(array_to_string(toks[i:i+4], ' ')), 1, 8)) AS BIGINT) AS gh
    FROM t, LATERAL (SELECT unnest(range(1, len(toks) - 3)) AS i) s
    WHERE len(toks) >= 5
), f AS (SELECT gh, min(doc_id) AS first_doc FROM g GROUP BY 1)
SELECT g.doc_id, cast(count(*) AS BIGINT) AS n_grams,
       cast(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       round(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6) AS novelty
FROM g JOIN f ON f.gh = g.gh
GROUP BY 1
"""


def _bfs_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-depth BFS over the co-purchase part graph
    (graph.bfs_hops): shortest hop count from the lowest partkey
    through "bought in the same order" edges, depth ≤ 3 — the
    recommendation-walk / blast-radius primitive, and the engine's
    recursive-query parity surface: the oracle is an exact bounded
    RECURSIVE CTE, value-checked node by node (hop counts are exact
    integers, so an iterative distributed algorithm gets a full
    cross-engine hash check, not a rows-only one). The traversal
    expands through the BIPARTITE (order, part) fact per level
    (graph.bfs_hops_bipartite) — the pairwise co-purchase edge list
    (Σ|basket|² rows) is never materialized; a first draft that built
    and checkpointed it measured 14.7× at the 30× replica with
    repeat-run degradation, the bipartite form stays fact-width."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    seeds = li.agg(F.min("l_partkey").alias("node"))
    return graph.bfs_hops_bipartite(
        li, seeds, max_hops=3, item="l_partkey", group="l_orderkey"
    )


_BFS_REACHABILITY_SQL = """
WITH RECURSIVE li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
    SELECT a.l_partkey AS src, b.l_partkey AS dst
    FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    GROUP BY 1, 2
),
seed AS (SELECT min(l_partkey) AS s FROM lineitem),
bfs AS (
    SELECT s AS node, 0 AS hops FROM seed
    UNION
    SELECT e.dst, bfs.hops + 1 FROM bfs JOIN e ON e.src = bfs.node WHERE bfs.hops < 3
)
SELECT CAST(node AS BIGINT) AS node, CAST(min(hops) AS BIGINT) AS hops
FROM bfs GROUP BY 1
"""


def _item_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative-filtering similarity: top-20 part pairs
    by co-purchase COSINE (n_ab / sqrt(n_a·n_b)) — the normalized
    complement of basket_pairs' raw support and assoc_rules'
    confidence/lift: cosine discounts globally popular items, which is
    what a "customers also bought" ranker actually wants. Pair counts
    come from the order-local self-join (Σ|basket|² bound); the
    item-frequency relation is item-grain, checkpointed once and
    broadcast into both sides of the pair join; top-k compiles to
    TakeOrderedAndProject. Ordering is on the ROUNDED cosine with a
    (part_a, part_b) total tiebreak — fully deterministic across
    engines (single IEEE sqrt + divide on exact integers)."""
    # The EXPENSIVE shared subtree is the distinct itself — consumed by
    # the item-frequency aggregate AND both pair-join sides (the
    # aliased projections defeat exchange reuse), i.e. THREE distinct
    # computations without a pin. Pin it eagerly ONCE (r15): the
    # fact-grain distinct runs a single time, and the derived
    # item-grain aggregate below is a cheap scan of the cache, so its
    # lazy race (driver r14: 2.01 → 3.68 s when everything was lazy)
    # costs at most one re-aggregation of cached data, never a fact
    # rescan.
    li = persist_fact(
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    item_n = (
        li.groupBy(F.col("l_partkey").alias("pk"))
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()  # item-grain over the cached distinct (cheap either way)
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    na = item_n.select(F.col("pk").alias("part_a"), F.col("n").alias("n_a"))
    nb = item_n.select(F.col("pk").alias("part_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(na), "part_a")
        .join(F.broadcast(nb), "part_b")
        .select(
            "part_a",
            "part_b",
            "n_ab",
            "n_a",
            "n_b",
            F.round(
                F.col("n_ab")
                / F.sqrt(F.col("n_a") * F.col("n_b").cast("double")),
                6,
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("part_a").asc(), F.col("part_b").asc())
        .limit(20)
    )


_ITEM_ITEM_COSINE_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n FROM li GROUP BY 1),
p AS (
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(count(*) AS BIGINT) AS n_ab
    FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
)
SELECT part_a, part_b, n_ab, na.n AS n_a, nb.n AS n_b,
       round(n_ab / sqrt(na.n * CAST(nb.n AS DOUBLE)), 6) AS cosine
FROM p
JOIN n na ON na.l_partkey = part_a
JOIN n nb ON nb.l_partkey = part_b
ORDER BY cosine DESC, part_a, part_b
LIMIT 20
"""


def _decayed_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed demand score per part ("trending
    now"), top-20: each shipped quantity is weighted by
    2^-(age half-lives), a 180-day half-life, computed as EXACT dyadic
    integers (qty × 2^(14-h) — 14 half-lives span the whole calendar,
    so every term and the per-part sum is a bigint; no float decay, no
    summation-order dependence — the ewma_forecast weight trick
    applied to the heavy-hitter problem). One scan, a broadcast 1-row
    horizon, one hash aggregate, TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    horizon = li.agg(F.max(F.to_date("l_shipdate")).alias("__mx"))
    h = F.floor(
        F.datediff(F.col("__mx"), F.to_date("l_shipdate")) / F.lit(180)
    ).cast("long")
    w = F.pow(F.lit(2.0), (F.lit(14) - h).cast("double")).cast("long")
    return (
        li.crossJoin(F.broadcast(horizon))
        .groupBy("l_partkey")
        .agg(
            F.sum(F.floor("l_quantity").cast("long") * w).alias("score_scaled"),
            F.sum(F.floor("l_quantity").cast("long")).alias("total_qty"),
        )
        .select(
            "l_partkey",
            "total_qty",
            F.shiftright(F.col("score_scaled"), 14).alias("decayed_qty_floor"),
        )
        .orderBy(F.col("decayed_qty_floor").desc(), F.col("l_partkey").asc())
        .limit(20)
    )


_DECAYED_TRENDING_SQL = """
WITH mx AS (SELECT max(CAST(l_shipdate AS DATE)) AS m FROM lineitem),
s AS (
    SELECT l_partkey,
           CAST(sum(CAST(floor(l_quantity) AS BIGINT)
                    * CAST(pow(2, 14 - floor(datediff('day', CAST(l_shipdate AS DATE), m) / 180)) AS BIGINT)) AS BIGINT) AS score_scaled,
           CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem CROSS JOIN mx
    GROUP BY 1
)
SELECT l_partkey, total_qty,
       (score_scaled // 16384) AS decayed_qty_floor
FROM s
ORDER BY decayed_qty_floor DESC, l_partkey
LIMIT 20
"""


def _forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-comparison backtest: one-step-ahead EWMA (alpha=1/2,
    dyadic-exact) vs the seasonal-naive baseline (same weekday last
    week) on daily revenue, scored by exact integer absolute error
    over the days where BOTH models produce a forecast — the honest
    bake-off a reporting layer runs before trusting a forecast column.
    The day-grain relation is checkpointed once and feeds both arms;
    errors are bigint cents (EWMA's via the floor-scaled backtest
    column, naive's directly), so the comparison is engine-exact end
    to end — the MAE is a truncated integer division at centi-cent
    grain (no float anywhere in the output)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
        # day-grain; both bake-off arms (lazy pin). NO race exists
        # here despite the two arms: ewma_forecast's overflow-guard
        # collect is a driver action that materializes this pin
        # SEQUENTIALLY before the main action (measured r15: an eager
        # checkpoint just added a job, 0.63 → 0.96 s at local[32]).
        .persist()
    )
    ew = timeseries.ewma_forecast(daily, "day", "cents", k=30).select(
        "day", "value", "forecast_floor", "abs_err_floor"
    )
    lag7 = daily.select(
        F.date_add(F.col("day"), 7).alias("day"), F.col("cents").alias("cents_lag7")
    )
    both = (
        ew.join(F.broadcast(lag7), "day")
        .filter(F.col("forecast_floor").isNotNull())
        .select(
            "day",
            "abs_err_floor",
            F.abs(F.col("value") - F.col("cents_lag7")).alias("abs_err_naive"),
        )
        # day-grain derived from the already-materialized daily pin: a
        # lazy race between the two method rows re-joins tiny cached
        # day-grain inputs, never a fact rescan — lazy pin
        .persist()
    )
    ewma_row = both.agg(
        F.lit("ewma").alias("method"),
        F.count(F.lit(1)).alias("n_days"),
        F.sum("abs_err_floor").alias("total_abs_err_cents"),
    )
    naive_row = both.agg(
        F.lit("seasonal_naive").alias("method"),
        F.count(F.lit(1)).alias("n_days"),
        F.sum("abs_err_naive").alias("total_abs_err_cents"),
    )
    return ewma_row.unionAll(naive_row).select(
        "method",
        "n_days",
        "total_abs_err_cents",
        # exact integer MAE at centi-cent grain (round-budget gate
        # r10): round(float_div, 2) was the revenue_bridge tie class;
        # Spark `div` and DuckDB `//` both truncate toward zero
        F.expr("total_abs_err_cents * 100 div n_days").alias("mae_centicents"),
    )


_FORECAST_BACKTEST_SQL = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
    FROM orders GROUP BY 1
), j AS (
    SELECT a.d, a.x,
           CAST(sum(CASE WHEN datediff('day', b.d, a.d) >= 1
                         THEN b.x * CAST(pow(2, 30 - datediff('day', b.d, a.d)) AS BIGINT) END) AS BIGINT) AS s_prev
    FROM daily a JOIN daily b ON b.d BETWEEN a.d - 30 AND a.d
    GROUP BY 1, 2
), both_arms AS (
    SELECT j.d,
           (abs(j.x * 1073741824 - j.s_prev) // 1073741824) AS abs_err_ewma,
           abs(j.x - l.x) AS abs_err_naive
    FROM j JOIN daily l ON l.d = j.d - 7
    WHERE j.s_prev IS NOT NULL
)
SELECT method, n_days, total_abs_err_cents,
       CAST(CAST(total_abs_err_cents AS HUGEINT) * 100 // n_days AS BIGINT) AS mae_centicents
FROM (
    SELECT 'ewma' AS method, CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(abs_err_ewma) AS BIGINT) AS total_abs_err_cents
    FROM both_arms
    UNION ALL
    SELECT 'seasonal_naive', CAST(count(*) AS BIGINT),
           CAST(sum(abs_err_naive) AS BIGINT)
    FROM both_arms
)
"""


def _span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect → REMOVE for cross-document duplicated spans
    (dedup.span_scrub): tokens covered by any 8-token window shared
    with another document are dropped and the survivors re-joined in
    order — the transform that actually produces the deduplicated
    training text span_dedup only scores. Value-checked to the
    reconstructed string against the oracle's independent
    window/flag/anti-join pipeline (string_agg ORDER BY pos)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.span_scrub(docs, "text", "doc_id", k=8)


_SPAN_SCRUB_SQL = r"""
WITH base AS (
  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
  FROM documents
),
w AS (
  SELECT doc_id, i AS wpos,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
             [CAST(ascii(c) AS BIGINT) FOR c IN regexp_split_to_array(array_to_string(toks[i:i+7], ' '), '')]),
           (acc, c) -> (acc * 31 + c) % 2147483647) AS h
  FROM base, LATERAL (SELECT unnest(generate_series(1, len(toks) - 7)) AS i) s
  WHERE len(toks) >= 8
),
f AS (SELECT h FROM w GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
cov AS (
  SELECT DISTINCT d.doc_id, d.wpos + o AS pos
  FROM (SELECT DISTINCT w.doc_id, w.wpos FROM w JOIN f ON f.h = w.h) d,
       LATERAL (SELECT unnest(range(0, 8)) AS o) t
),
tok AS (
  SELECT doc_id, i AS pos, toks[i] AS tk
  FROM base, LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) s2
),
kept AS (
  SELECT t.doc_id, t.pos, t.tk
  FROM tok t LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.pos = t.pos
  WHERE c.pos IS NULL
),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         string_agg(tk, ' ' ORDER BY pos) AS txt
  FROM kept GROUP BY 1
)
SELECT b.doc_id, CAST(len(b.toks) AS BIGINT) AS n_tokens,
       CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
       coalesce(a.txt, '') AS scrubbed_text
FROM base b LEFT JOIN agg a ON a.doc_id = b.doc_id
"""


# ---------------------------------------------------------------------------
# Contract surface
# ---------------------------------------------------------------------------


def _prefix_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity self-join via prefix filtering
    (dedup.prefix_jaccard_join): every document pair with 2-gram-set
    Jaccard >= 0.7, unblocked and lossless — the guarantee MinHash
    can't give (probabilistic) and source-blocking can't give (misses
    cross-source pairs). Candidates come from a self-join on each
    doc's RAREST s-⌈ts⌉+1 grams only (prefix-filter theorem);
    verification is array_intersect on doc-grain gram arrays with an
    integer cross-multiplied threshold. The oracle brute-forces all
    pairs — green iff the pruned join loses nothing."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.prefix_jaccard_join(docs, "text", "doc_id", threshold=0.7, shingle_k=2)


_PREFIX_JACCARD_SQL = r"""
WITH toks AS (
    SELECT doc_id,
           string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS ws
    FROM documents WHERE length(text) > 0
), grams AS (
    SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i + 1] AS g
    FROM toks, unnest(generate_series(1, len(ws) - 1)) AS t(i)
    WHERE len(ws) >= 2
), sz AS (
    SELECT doc_id, count(*) AS s FROM grams GROUP BY 1
), inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, cast(count(*) AS BIGINT) AS n_inter
    FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_inter,
       cast(sa.s + sb.s - n_inter AS BIGINT) AS n_union,
       round(n_inter / cast(sa.s + sb.s - n_inter AS DOUBLE), 6) AS jaccard
FROM inter
JOIN sz sa ON sa.doc_id = doc_a
JOIN sz sb ON sb.doc_id = doc_b
WHERE n_inter * 10 >= (sa.s + sb.s - n_inter) * 7
"""


def _snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Version-to-version table diff (ivm.snapshot_diff): the
    latest-status-per-user image as of 2024-01-20 vs the current one —
    one full outer join on the key, change-grain output (added /
    removed / changed only). The verification query behind every
    snapshot maintenance path; at rest both versions bucket on the key
    and even the join shuffle disappears. Latest = max(struct(ts,
    event_id, status)) — the unique (ts, event_id) orders the payload,
    so the winner is engine-portable."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")

    def latest(d: DataFrame) -> DataFrame:
        return (
            d.groupBy("user_id")
            .agg(F.max(F.struct("ts", "event_id", "event_type")).alias("__m"))
            .select("user_id", F.col("__m.event_type").alias("status"))
        )

    old = latest(ev.filter(F.col("ts") < F.lit("2024-01-20").cast("timestamp")))
    new = latest(ev)
    return ivm.snapshot_diff(old, new, key="user_id", compare_cols=["status"])


_SNAPSHOT_DIFF_SQL = """
WITH old_v AS (
    SELECT user_id, event_type AS status FROM (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '2024-01-20'
    ) WHERE rn = 1
), new_v AS (
    SELECT user_id, event_type AS status FROM (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
)
SELECT coalesce(o.user_id, n.user_id) AS user_id,
       CASE WHEN o.user_id IS NULL THEN 'added'
            WHEN n.user_id IS NULL THEN 'removed'
            ELSE 'changed' END AS change,
       o.status AS status_old, n.status AS status_new
FROM old_v o FULL OUTER JOIN new_v n ON o.user_id = n.user_id
WHERE o.user_id IS NULL OR n.user_id IS NULL OR o.status <> n.status
"""


def _ivm_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a join materialization
    (ivm.delta_join_maintain): the enriched fact MV (lineitem ⋈
    orders) absorbs the post-1999 insert batch by joining ONLY the
    delta against the dimension — O(batch), the base MV passes
    through unscanned. The oracle is the full join over ALL lineitem:
    green iff the delta rule loses nothing. This is the O(Δ)
    replacement for the reference's truncate-and-reload (B4) on a
    join-shaped serving table."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice", "l_shipdate"
    )
    dim = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey", "o_orderdate"
    )
    cutoff = F.lit("1999-01-01").cast("timestamp")
    base_mv = li.filter(F.col("l_shipdate") < cutoff).join(dim, "l_orderkey")
    return ivm.delta_join_maintain(
        base_mv, li.filter(F.col("l_shipdate") >= cutoff), dim, "l_orderkey"
    ).select(
        "l_orderkey", "l_linenumber", "l_partkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_cents"),
        "o_custkey", "o_orderdate",
    )


_IVM_JOIN_SQL = """
SELECT l_orderkey, l_linenumber, l_partkey,
       CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
       o_custkey, o_orderdate
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
"""


def _repurchase_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer purchase cadence: day gaps between consecutive
    orders (lag over ONE key-partitioned exchange), reduced to
    n_orders / mean / max gap for customers with >= 3 orders — the
    lifecycle statistic behind replenishment and churn-risk models.
    Gaps are exact integer days; the mean is one division of exact
    integers."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.withColumn(
        "__gap",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).cast("long"),
    )
    return (
        gaps.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("__gap").alias("__sum_gap"),
            F.max("__gap").alias("max_gap_days"),
        )
        .filter(F.col("n_orders") >= 3)
        .select(
            "o_custkey",
            "n_orders",
            F.round(F.col("__sum_gap") / (F.col("n_orders") - 1), 6).alias("mean_gap_days"),
            "max_gap_days",
        )
    )


_REPURCHASE_SQL = """
WITH g AS (
    SELECT o_custkey,
           date_diff('day',
                     lag(o_orderdate) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey),
                     o_orderdate) AS gap
    FROM orders
)
SELECT o_custkey, cast(count(*) AS BIGINT) AS n_orders,
       round(cast(sum(gap) AS BIGINT) / cast(count(*) - 1 AS DOUBLE), 6) AS mean_gap_days,
       cast(max(gap) AS BIGINT) AS max_gap_days
FROM g GROUP BY 1 HAVING count(*) >= 3
"""


def _price_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-point distribution audit: how line prices distribute over
    their cents-within-dollar ending (psychological-pricing check —
    .99/.00 spikes). One hash aggregate to a <= 100-row relation; the
    share divides exact integer counts by the broadcast one-row total."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = (F.round(F.col("l_extendedprice") * 100).cast("long") % 100).alias("cents_ending")
    counts = li.select(cents).groupBy("cents_ending").agg(F.count(F.lit(1)).alias("n"))
    total = li.agg(F.count(F.lit(1)).alias("__t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "cents_ending", "n", F.round(F.col("n") / F.col("__t"), 6).alias("share")
        )
    )


_PRICE_POINTS_SQL = """
WITH c AS (
    SELECT CAST(round(l_extendedprice * 100) AS BIGINT) % 100 AS cents_ending
    FROM lineitem
)
SELECT cents_ending, cast(count(*) AS BIGINT) AS n,
       round(count(*) / cast((SELECT count(*) FROM lineitem) AS DOUBLE), 6) AS share
FROM c GROUP BY 1
"""


def _measure_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise Pearson matrix over the lineitem measures
    (aggregates.pearson_exact): every moment accumulates as
    decimal(38,0) — no float-summation order anywhere, unlike builtin
    corr — and r is ONE double expression over exact integers, so both
    engines compute the identical IEEE value. One full-scan hash
    aggregate; the 6-pair matrix unfolds from the single moment row.
    max_abs=1e8 engages the long-product fast path (per-row products
    in int64, sums in decimal) — sound because price cents are bounded
    by the 2-dp schema at ~1.1e7 and fail-stop-checked at runtime."""
    li = load_table(spark, sf_dir, "lineitem")
    return aggregates.pearson_exact(
        li,
        {
            "qty": F.round(F.col("l_quantity")),
            "price_cents": F.round(F.col("l_extendedprice") * 100),
            "discount_pct": F.round(F.col("l_discount") * 100),
            "tax_pct": F.round(F.col("l_tax") * 100),
        },
        max_abs=100_000_000,
    )


_MEASURE_CORR_SQL = """
WITH v AS (
    SELECT CAST(round(l_quantity) AS BIGINT) AS q,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
           CAST(round(l_discount * 100) AS BIGINT) AS d,
           CAST(round(l_tax * 100) AS BIGINT) AS t
    FROM lineitem
    -- complete-case (listwise deletion), pinning pearson_exact's
    -- NULL screen: TPC-H measures happen to be NOT NULL, but the
    -- oracle must encode the semantics, not rely on the data
    WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
      AND l_discount IS NOT NULL AND l_tax IS NOT NULL
), m AS (
    SELECT cast(count(*) AS DOUBLE) AS n,
           cast(sum(q) AS DOUBLE) AS sq, cast(sum(p) AS DOUBLE) AS sp,
           cast(sum(d) AS DOUBLE) AS sd, cast(sum(t) AS DOUBLE) AS st,
           cast(sum(q*q) AS DOUBLE) AS qq, cast(sum(p*p) AS DOUBLE) AS pp,
           cast(sum(d*d) AS DOUBLE) AS dd, cast(sum(t*t) AS DOUBLE) AS tt,
           cast(sum(q*p) AS DOUBLE) AS qp, cast(sum(q*d) AS DOUBLE) AS qd,
           cast(sum(q*t) AS DOUBLE) AS qt, cast(sum(p*d) AS DOUBLE) AS pd,
           cast(sum(p*t) AS DOUBLE) AS pt, cast(sum(d*t) AS DOUBLE) AS dt
    FROM v
)
SELECT u.measure_x, u.measure_y, CAST(m.n AS BIGINT) AS n,
       CASE WHEN (m.n * u.sxx - u.sx * u.sx) * (m.n * u.syy - u.sy * u.sy) > 0.0
            THEN round((m.n * u.sxy - u.sx * u.sy)
                       / sqrt((m.n * u.sxx - u.sx * u.sx) * (m.n * u.syy - u.sy * u.sy)), 6) END AS r
FROM m, LATERAL (
    SELECT * FROM (VALUES
        ('qty', 'price_cents', m.qp, m.sq, m.sp, m.qq, m.pp),
        ('qty', 'discount_pct', m.qd, m.sq, m.sd, m.qq, m.dd),
        ('qty', 'tax_pct', m.qt, m.sq, m.st, m.qq, m.tt),
        ('price_cents', 'discount_pct', m.pd, m.sp, m.sd, m.pp, m.dd),
        ('price_cents', 'tax_pct', m.pt, m.sp, m.st, m.pp, m.tt),
        ('discount_pct', 'tax_pct', m.dt, m.sd, m.st, m.dd, m.tt)
    ) AS t(measure_x, measure_y, sxy, sx, sy, sxx, syy)
) AS u
"""


def _rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two retrieval voices over the same
    query (similarity.rrf_fuse): BM25 top-20 and plain TF-IDF top-20
    fused by Σ 1/(60+rank) into one top-10 — the zero-tuning hybrid
    retrieval standard (incommensurable scores never meet, only
    ranks). Ranks assign by (rounded score desc, doc_id), so a
    last-ulp score difference can't flip them cross-engine; the fold
    runs left-to-right over the name-sorted ranker list, matching the
    oracle's explicit bm25-then-tfidf addition. Everything after the
    two corpus scans is k-scale."""
    docs = load_table(spark, sf_dir, "documents")
    terms = ["spark", "merge", "window"]
    bm = corpus.bm25_rank(docs, "text", "doc_id", terms, k=20)
    ti = corpus.tfidf_query_rank(docs, "text", "doc_id", terms, k=20)
    return similarity.rrf_fuse(
        {"bm25": (bm, "bm25"), "tfidf": (ti, "tfidf")}, id_col="doc_id", k0=60, k=10
    )


_RRF_FUSION_SQL = r"""
WITH tok AS (
    SELECT doc_id,
           unnest(string_split_regex(trim(regexp_replace(lower(coalesce(text, '')), '\s+', ' ', 'g')), ' ')) AS term
    FROM documents
), dl AS (
    SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1
), stats AS (
    SELECT cast(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM dl
), tf AS (
    SELECT doc_id, term, cast(count(*) AS BIGINT) AS tf
    FROM tok WHERE term IN ('spark', 'merge', 'window') GROUP BY 1, 2
), dfreq AS (
    SELECT term, cast(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
), bm AS (
    SELECT doc_id,
           round(sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                     * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6) AS s
    FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
    GROUP BY doc_id ORDER BY s DESC, doc_id LIMIT 20
), rb AS (
    SELECT doc_id, cast(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS r FROM bm
), ti AS (
    SELECT doc_id, round(sum(tf * ln(n_docs / cast(df AS DOUBLE))), 6) AS s
    FROM tf JOIN dfreq USING (term) CROSS JOIN stats
    GROUP BY doc_id ORDER BY s DESC, doc_id LIMIT 20
), rt AS (
    SELECT doc_id, cast(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS r FROM ti
)
SELECT coalesce(rb.doc_id, rt.doc_id) AS doc_id,
       round(coalesce(1.0 / (60 + rb.r), 0.0) + coalesce(1.0 / (60 + rt.r), 0.0), 6) AS rrf,
       rb.r AS rank_bm25, rt.r AS rank_tfidf
FROM rb FULL OUTER JOIN rt ON rb.doc_id = rt.doc_id
ORDER BY rrf DESC, doc_id
LIMIT 10
"""


def _ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 of the IVF probe vs the exact cosine ranking per query
    (similarity.ndcg_eval) — the graded companion to ann_recall_eval:
    a hit at the wrong rank now costs. Float-free: the 10^6/log2(r+1)
    discount weights are integer literals shared verbatim with this
    oracle, DCG is an exact integer sum, and the one division is
    dcg/idcg."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ndcg_eval(
        emb, "embedding", "vec_id", query_mod=100, k=10, n_cells=16, n_probe=4
    )


def _ndcg_sql(k: int = 10) -> str:
    import math

    w = [round(1_000_000 / math.log2(r + 1)) for r in range(1, k + 1)]
    idcg = sum((k + 1 - r) * w[r - 1] for r in range(1, k + 1))
    wcase = " ".join(f"WHEN {r} THEN {w[r - 1]}" for r in range(1, k + 1))
    return f"""
WITH e0 AS (SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings),
c AS (
    SELECT row_number() OVER (ORDER BY vid) - 1 AS cell, v AS cv
    FROM e0 ORDER BY vid LIMIT 16
), a AS (
    SELECT e0.vid, e0.v, c.cell
    FROM e0 CROSS JOIN c
    QUALIFY row_number() OVER (PARTITION BY e0.vid
        ORDER BY list_dot_product(e0.v, c.cv) DESC, c.cell) = 1
), q AS (
    SELECT vid AS query_id, v AS qv FROM e0 WHERE vid % 100 = 0 AND vid < 50000
), probe AS (
    SELECT q.query_id, q.qv, c.cell
    FROM q CROSS JOIN c
    QUALIFY row_number() OVER (PARTITION BY q.query_id
        ORDER BY list_dot_product(q.qv, c.cv) DESC, c.cell) <= 4
), ivf AS (
    SELECT probe.query_id, a.vid,
           row_number() OVER (PARTITION BY probe.query_id
        ORDER BY round(list_dot_product(probe.qv, a.v) /
                       (sqrt(list_dot_product(probe.qv, probe.qv)) *
                        sqrt(list_dot_product(a.v, a.v))), 6) DESC, a.vid) AS rank_ret
    FROM probe JOIN a USING (cell)
    QUALIFY rank_ret <= {k}
), brute AS (
    SELECT q.query_id, e0.vid,
           row_number() OVER (PARTITION BY q.query_id
        ORDER BY round(list_dot_product(q.qv, e0.v) /
                       (sqrt(list_dot_product(q.qv, q.qv)) *
                        sqrt(list_dot_product(e0.v, e0.v))), 6) DESC, e0.vid) AS rank_exact
    FROM q CROSS JOIN e0
    QUALIFY rank_exact <= {k}
), d AS (
    SELECT ivf.query_id,
           sum(coalesce({k + 1} - b.rank_exact, 0)
               * (CASE ivf.rank_ret {wcase} END)) AS dcg
    FROM ivf LEFT JOIN brute b
      ON ivf.query_id = b.query_id AND ivf.vid = b.vid
    GROUP BY 1
)
SELECT q.query_id, cast(coalesce(d.dcg, 0) AS BIGINT) AS dcg_micro,
       round(cast(coalesce(d.dcg, 0) AS DOUBLE) / {float(idcg)}, 6) AS ndcg
FROM q LEFT JOIN d USING (query_id)
"""


def _collocation_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 word collocations by document-level PMI
    (corpus.collocation_pmi): unordered token pairs co-occurring in
    >= 5 docs, pmi = ln(n_ab*N/(n_a*n_b)). Pair generation is
    DOC-LOCAL (self-join on doc_id — Σ|doc-vocab|², the basket_pairs
    class, never vocabulary²); counts exact, one ln per surviving
    pair, TakeOrderedAndProject top-k."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.collocation_pmi(docs, "text", "doc_id", min_docs=5, k=20)


_COLLOCATION_SQL = r"""
WITH toks AS (
    SELECT DISTINCT doc_id,
           unnest(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) AS t
    FROM documents WHERE length(text) > 0
), n AS (
    SELECT count(*) AS nd FROM (SELECT DISTINCT doc_id FROM toks)
), uni AS (
    SELECT t, count(*) AS n_t FROM toks GROUP BY 1
), pairs AS (
    SELECT a.t AS token_a, b.t AS token_b, cast(count(*) AS BIGINT) AS n_ab
    FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND a.t < b.t
    GROUP BY 1, 2 HAVING count(*) >= 5
)
SELECT token_a, token_b, n_ab,
       round(ln(cast(n_ab AS DOUBLE) * n.nd / (cast(na.n_t AS DOUBLE) * nb.n_t)), 6) AS pmi
FROM pairs
JOIN uni na ON na.t = token_a
JOIN uni nb ON nb.t = token_b
CROSS JOIN n
ORDER BY pmi DESC, token_a, token_b
LIMIT 20
"""


def _user_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Shannon entropy over the event-type distribution
    (corpus.behavior_entropy, the char_entropy shape at user grain):
    behavioral-diversity profiling for segmentation / bot screening.
    Two hash aggregates; the only float is the <= |event-types|-term
    entropy fold, rounded at the audit grain."""
    ev = load_table(spark, sf_dir, "events")
    return corpus.behavior_entropy(ev, key_col="user_id", cat_col="event_type", min_n=10)


_USER_ENTROPY_SQL = """
WITH c AS (
    SELECT user_id, event_type, count(*) AS c FROM events GROUP BY 1, 2
), tot AS (
    SELECT user_id, cast(sum(c) AS BIGINT) AS n FROM c GROUP BY 1
)
SELECT c.user_id, tot.n AS n_events,
       round(sum(-(c.c / cast(tot.n AS DOUBLE)) * log2(c.c / cast(tot.n AS DOUBLE))), 6)
           AS entropy_bits
FROM c JOIN tot USING (user_id)
GROUP BY c.user_id, tot.n
HAVING tot.n >= 10
"""


def _top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 user-day event paths: each (user, day)'s first five
    event types in (ts, event_id) order joined with '>' — the
    clickstream path-mining staple (which flows dominate). The path
    assembles from array_sort(collect_list(struct)) — grouping only,
    no window, ONE shuffle on (user, day); tie-safe because event_id
    is unique; top-k by (count desc, path) via TakeOrderedAndProject."""
    ev = load_table(spark, sf_dir, "events")
    paths = (
        ev.groupBy("user_id", F.to_date("ts").alias("__d"))
        .agg(
            F.array_join(
                F.slice(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                        lambda s: s["event_type"],
                    ),
                    1,
                    5,
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_user_days"))
        .orderBy(F.col("n_user_days").desc(), F.col("path").asc())
        .limit(20)
    )


_TOP_PATHS_SQL = """
WITH r AS (
    SELECT user_id, CAST(ts AS DATE) AS d, event_type,
           row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                              ORDER BY ts, event_id) AS rn
    FROM events
), p AS (
    SELECT user_id, d, string_agg(event_type, '>' ORDER BY rn) AS path
    FROM r WHERE rn <= 5 GROUP BY 1, 2
)
SELECT path, cast(count(*) AS BIGINT) AS n_user_days
FROM p GROUP BY 1
ORDER BY n_user_days DESC, path
LIMIT 20
"""


def _arrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Goh–Barabási burstiness B = (σ−μ)/(σ+μ) over
    inter-arrival seconds (timeseries.arrival_burstiness): load-model
    statistic for capacity planning. Gaps off one key-partitioned lag
    window; μ/σ from exact decimal moments (the pearson_exact
    discipline); B is one float expression, round-6."""
    ev = load_table(spark, sf_dir, "events")
    return timeseries.arrival_burstiness(ev, key_col="event_type", ts_col="ts", tiebreak="event_id")


_BURSTINESS_SQL = """
WITH g AS (
    SELECT event_type,
           epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY event_type
                                                 ORDER BY ts, event_id)) AS g
    FROM events
), m AS (
    SELECT event_type, cast(count(*) AS DOUBLE) AS n,
           cast(sum(g) AS DOUBLE) AS s,
           cast(sum(CAST(g AS HUGEINT) * g) AS DOUBLE) AS q
    FROM g WHERE g IS NOT NULL GROUP BY 1 HAVING count(*) >= 2
)
SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
       round((s / n) / 1000000.0, 6) AS mean_gap_s,
       round((sqrt(n * q - s * s) / n) / 1000000.0, 6) AS std_gap_s,
       round((sqrt(n * q - s * s) / n - s / n)
             / (sqrt(n * q - s * s) / n + s / n), 6) AS burstiness
FROM m
"""


def _revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period revenue bridge per brand (FP&A's
    price/volume decomposition): 1997 vs 1998 gross revenue split into
    a volume effect ((q1−q0)·avg_price0) and the residual price/mix
    effect. Revenue and quantity totals are exact integers off ONE
    fact scan (conditional sums, no self-join); the dimension join is
    a broadcast. The effects are EXACT integer micro-cents — decimal
    (38,0) numerator `(q1−q0)·rev0_cents·1e6` truncated-div by qty0
    (Spark `div` and DuckDB `//` both truncate toward zero, verified)
    — never a rounded float division: the r9 driver red row was a
    1-ulp HALF_UP-vs-half-even tie on `round(float_div, 6)`
    (portability gotcha #3). Residual = delta·1e6 − volume, so the
    bridge identity holds bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    yr = F.year("l_shipdate")
    per_brand = (
        li.filter(yr.isin(1997, 1998))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.sum(F.when(yr == 1997, F.round(F.col("l_extendedprice") * 100).cast("long")).otherwise(F.lit(0))).alias("rev0_cents"),
            F.sum(F.when(yr == 1998, F.round(F.col("l_extendedprice") * 100).cast("long")).otherwise(F.lit(0))).alias("rev1_cents"),
            F.sum(F.when(yr == 1997, F.round(F.col("l_quantity")).cast("long")).otherwise(F.lit(0))).alias("qty0"),
            F.sum(F.when(yr == 1998, F.round(F.col("l_quantity")).cast("long")).otherwise(F.lit(0))).alias("qty1"),
        )
    )
    delta = F.col("rev1_cents") - F.col("rev0_cents")
    # decimal(38,0) numerator keeps (q1-q0)*rev0*1e6 exact far past
    # int64 (sf100: ~1e28 < 10^38); `div` emits the bigint quotient.
    vol_effect = F.when(
        F.col("qty0") > 0,
        F.expr(
            "CAST(qty1 - qty0 AS DECIMAL(38,0)) * rev0_cents * 1000000 div qty0"
        ),
    )
    return per_brand.select(
        "p_brand", "rev0_cents", "rev1_cents", "qty0", "qty1",
        delta.alias("delta_cents"),
        vol_effect.alias("volume_effect_microcents"),
        F.when(F.col("qty0") > 0, delta * F.lit(1_000_000).cast("long") - vol_effect)
        .alias("price_mix_effect_microcents"),
    )


_REVENUE_BRIDGE_SQL = """
WITH b AS (
    SELECT p_brand,
           cast(sum(CASE WHEN year(l_shipdate) = 1997 THEN CAST(round(l_extendedprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS rev0_cents,
           cast(sum(CASE WHEN year(l_shipdate) = 1998 THEN CAST(round(l_extendedprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS rev1_cents,
           cast(sum(CASE WHEN year(l_shipdate) = 1997 THEN CAST(round(l_quantity) AS BIGINT) ELSE 0 END) AS BIGINT) AS qty0,
           cast(sum(CASE WHEN year(l_shipdate) = 1998 THEN CAST(round(l_quantity) AS BIGINT) ELSE 0 END) AS BIGINT) AS qty1
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE year(l_shipdate) IN (1997, 1998)
    GROUP BY 1
)
SELECT p_brand, rev0_cents, rev1_cents, qty0, qty1,
       rev1_cents - rev0_cents AS delta_cents,
       CASE WHEN qty0 > 0
            THEN CAST(CAST(qty1 - qty0 AS HUGEINT) * rev0_cents * 1000000 // qty0
                      AS BIGINT) END
           AS volume_effect_microcents,
       CASE WHEN qty0 > 0
            THEN CAST(CAST(rev1_cents - rev0_cents AS HUGEINT) * 1000000
                      - CAST(qty1 - qty0 AS HUGEINT) * rev0_cents * 1000000 // qty0
                      AS BIGINT) END
           AS price_mix_effect_microcents
FROM b
"""


def _revenue_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly gross→discount→tax→net waterfall in EXACT micro-dollars
    (1e-6 $): gross is 2 dp, discount amount 4 dp, tax amount 6 dp —
    all exactly representable at the micro grain, so every column is
    an exact integer sum and net ≡ gross − discount + tax holds
    bit-for-bit (the identity price·(1−d)·(1+t) expanded). One hash
    aggregate to month grain."""
    li = load_table(spark, sf_dir, "lineitem")
    gross = F.round(F.col("l_extendedprice") * 1_000_000).cast("long")
    disc = F.round(F.col("l_extendedprice") * F.col("l_discount") * 1_000_000).cast("long")
    tax = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.col("l_tax") * 1_000_000
    ).cast("long")
    return (
        li.groupBy(F.to_date(F.date_trunc("month", "l_shipdate")).alias("month"))
        .agg(
            F.sum(gross).alias("gross_micro"),
            F.sum(disc).alias("discount_micro"),
            F.sum(tax).alias("tax_micro"),
            F.sum(gross - disc + tax).alias("net_micro"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_REVENUE_WATERFALL_SQL = """
SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
       cast(sum(CAST(round(l_extendedprice * 1000000) AS BIGINT)) AS BIGINT) AS gross_micro,
       cast(sum(CAST(round(l_extendedprice * l_discount * 1000000) AS BIGINT)) AS BIGINT) AS discount_micro,
       cast(sum(CAST(round(l_extendedprice * (1 - l_discount) * l_tax * 1000000) AS BIGINT)) AS BIGINT) AS tax_micro,
       cast(sum(CAST(round(l_extendedprice * 1000000) AS BIGINT)
                - CAST(round(l_extendedprice * l_discount * 1000000) AS BIGINT)
                + CAST(round(l_extendedprice * (1 - l_discount) * l_tax * 1000000) AS BIGINT)) AS BIGINT) AS net_micro,
       cast(count(*) AS BIGINT) AS n_lines
FROM lineitem
GROUP BY 1
"""


def _chi_square_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-grain chi-square independence audit: event_type ×
    ISO-weekday contingency with observed, expected and per-cell
    (o−e)²/e (quality.chi_square_cells) — does behavior depend on the
    day? Emitting cells keeps every float a single expression over
    exact integer marginals (no accumulation order); the ISO weekday
    derives portably from Sunday-first dayofweek, as dow_seasonality
    does."""
    ev = load_table(spark, sf_dir, "events")
    iso = ((F.dayofweek("ts") + 5) % 7 + 1).cast("int").alias("iso_dow")
    return quality.chi_square_cells(
        ev.select("event_type", iso), row_col="event_type", col_col="iso_dow"
    )


_CHI_SQUARE_SQL = """
WITH cells AS (
    SELECT event_type, CAST(isodow(ts) AS INTEGER) AS iso_dow,
           cast(count(*) AS BIGINT) AS observed
    FROM events GROUP BY 1, 2
), rt AS (
    SELECT event_type, cast(sum(observed) AS BIGINT) AS rt FROM cells GROUP BY 1
), ct AS (
    SELECT iso_dow, cast(sum(observed) AS BIGINT) AS ct FROM cells GROUP BY 1
), n AS (
    SELECT cast(sum(observed) AS BIGINT) AS n FROM cells
)
SELECT event_type, iso_dow, observed,
       round((rt * ct) / n, 6) AS expected,
       round((observed - (rt * ct) / n) * (observed - (rt * ct) / n)
             / ((rt * ct) / n), 6) AS chi2_contrib
FROM cells JOIN rt USING (event_type) JOIN ct USING (iso_dow) CROSS JOIN n
"""


def _value_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift audit (quality.psi_drift):
    event value distribution before vs after 2024-01-20, in ten
    equal-width buckets derived from the OLD period's exact integer
    cents range — pure integer binning (quantile edges interpolate
    differently across engines), add-1 smoothing, and a bucket-grain
    PSI contribution so no float sum crosses the engine boundary."""
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-20").cast("timestamp")
    cents = F.round(F.col("value") * 100).cast("long")
    return quality.psi_drift(
        ev.filter(F.col("ts") < cutoff),
        ev.filter(F.col("ts") >= cutoff),
        value_cents=cents,
        n_buckets=10,
    )


_PSI_SQL = """
WITH o AS (
    SELECT CAST(round(value * 100) AS BIGINT) AS v FROM events
    WHERE ts < TIMESTAMP '2024-01-20'
), nw AS (
    SELECT CAST(round(value * 100) AS BIGINT) AS v FROM events
    WHERE ts >= TIMESTAMP '2024-01-20'
), b AS (
    SELECT min(v) AS lo,
           greatest(CAST(1 AS BIGINT),
                    CAST(ceil((max(v) - min(v) + 1) / 10) AS BIGINT)) AS wd
    FROM o
), ob AS (
    SELECT least(9, greatest(0, CAST(floor((v - lo) / wd) AS BIGINT))) AS bucket,
           cast(count(*) AS BIGINT) AS n_old
    FROM o CROSS JOIN b GROUP BY 1
), nb AS (
    SELECT least(9, greatest(0, CAST(floor((v - lo) / wd) AS BIGINT))) AS bucket,
           cast(count(*) AS BIGINT) AS n_new
    FROM nw CROSS JOIN b GROUP BY 1
), spine AS (
    SELECT unnest(generate_series(0, 9)) AS bucket
), j AS (
    SELECT spine.bucket, coalesce(ob.n_old, 0) AS n_old, coalesce(nb.n_new, 0) AS n_new
    FROM spine LEFT JOIN ob USING (bucket) LEFT JOIN nb USING (bucket)
), tot AS (
    SELECT cast(sum(n_old) + 10 AS BIGINT) AS t_o,
           cast(sum(n_new) + 10 AS BIGINT) AS t_n
    FROM j
)
SELECT bucket, n_old, n_new,
       round((n_old + 1) / CAST(t_o AS DOUBLE), 6) AS p_old,
       round((n_new + 1) / CAST(t_n AS DOUBLE), 6) AS p_new,
       round(((n_new + 1) / CAST(t_n AS DOUBLE) - (n_old + 1) / CAST(t_o AS DOUBLE))
             * ln(((n_new + 1) / CAST(t_n AS DOUBLE))
                  / ((n_old + 1) / CAST(t_o AS DOUBLE))), 6) AS psi_contrib
FROM j CROSS JOIN tot
"""


def _recs_hit_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recommender backtest: co-purchase top-5 recs trained on
    pre-1999 orders, evaluated on the held-out period — for every
    DIRECTED test co-occurrence (i -> j), a hit means j is in the
    top-5 most co-purchased items of i from TRAIN. One metrics row
    (k, n test co-occurrences, hits, hit rate) — the eval arm every
    "also bought" ranker needs before shipping. Pair counting stays
    order-local on both periods; recs are a key-partitioned top-k
    window on the item-pair relation; the hit join is pair-grain."""
    k = 5
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_shipdate")
    cutoff = F.lit("1999-01-01").cast("timestamp")

    def directed_pairs(d: DataFrame) -> DataFrame:
        dd = d.select("l_orderkey", "l_partkey").distinct()
        a = dd.select("l_orderkey", F.col("l_partkey").alias("i"))
        b = dd.select("l_orderkey", F.col("l_partkey").alias("j"))
        return a.join(b, "l_orderkey").filter(F.col("i") != F.col("j"))

    train = (
        directed_pairs(li.filter(F.col("l_shipdate") < cutoff))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    w = Window.partitionBy("i").orderBy(F.col("n_ab").desc(), F.col("j").asc())
    recs = train.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    test = directed_pairs(li.filter(F.col("l_shipdate") >= cutoff)).select("i", "j").distinct()
    hits = test.join(recs.select("i", "j"), ["i", "j"], "left_semi")
    n_test = test.agg(F.count(F.lit(1)).alias("n_test"))
    n_hits = hits.agg(F.count(F.lit(1)).alias("n_hits"))
    return (
        n_test.crossJoin(F.broadcast(n_hits))
        .select(
            F.lit(k).alias("k"),
            "n_test",
            "n_hits",
            F.round(F.col("n_hits") / F.col("n_test"), 6).alias("hit_rate"),
        )
    )


_RECS_HIT_RATE_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey, l_shipdate >= TIMESTAMP '1999-01-01' AS is_test
            FROM lineitem),
tr AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_shipdate < TIMESTAMP '1999-01-01'),
te AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '1999-01-01'),
train AS (
    SELECT a.l_partkey AS i, b.l_partkey AS j, count(*) AS n_ab
    FROM tr a JOIN tr b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    GROUP BY 1, 2
), recs AS (
    SELECT i, j FROM (
        SELECT i, j, row_number() OVER (PARTITION BY i ORDER BY n_ab DESC, j) AS rn
        FROM train
    ) WHERE rn <= 5
), test AS (
    SELECT DISTINCT a.l_partkey AS i, b.l_partkey AS j
    FROM te a JOIN te b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
), h AS (
    SELECT count(*) AS n_hits FROM test SEMI JOIN recs USING (i, j)
)
SELECT 5 AS k, cast((SELECT count(*) FROM test) AS BIGINT) AS n_test,
       cast(h.n_hits AS BIGINT) AS n_hits,
       round(h.n_hits / cast((SELECT count(*) FROM test) AS DOUBLE), 6) AS hit_rate
FROM h
"""


def _bag_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations (EXCEPT ALL / INTERSECT ALL) —
    the multiplicity-aware SQL surface the distinct set-op family
    (G1–G5) doesn't cover: reconciliation where HOW MANY copies
    differ matters (double-loads, partial replays). Spark's
    exceptAll/intersectAll compile to aggregate-and-generate plans
    (no sort); the result reduces to (key, op, n) so the comparison
    is multiplicity-exact."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_linenumber") <= 3).select("l_partkey")
    b = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    exc = a.exceptAll(b).groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n")).withColumn("op", F.lit("except_all"))
    inter = a.intersectAll(b).groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n")).withColumn("op", F.lit("intersect_all"))
    return exc.unionByName(inter).select("op", "l_partkey", "n")


_BAG_SETOPS_SQL = """
WITH a AS (SELECT l_partkey FROM lineitem WHERE l_linenumber <= 3),
b AS (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'),
exc AS (SELECT l_partkey FROM a EXCEPT ALL SELECT l_partkey FROM b),
inter AS (SELECT l_partkey FROM a INTERSECT ALL SELECT l_partkey FROM b)
SELECT 'except_all' AS op, l_partkey, cast(count(*) AS BIGINT) AS n
FROM exc GROUP BY 2
UNION ALL
SELECT 'intersect_all' AS op, l_partkey, cast(count(*) AS BIGINT) AS n
FROM inter GROUP BY 2
"""


def _unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long UNPIVOT surface parity: the monthly measure matrix
    (qty / gross / discount / tax as exact integer units) melted to
    (month, measure, total) — the shape BI tools and metric stores
    consume. One month-grain aggregate, then Spark's native unpivot
    (an Expand, no shuffle); the oracle states the same melt as
    UNION ALL."""
    li = load_table(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        F.to_date(F.date_trunc("month", "l_shipdate")).alias("month")
    ).agg(
        F.sum(F.round(F.col("l_quantity")).cast("long")).alias("qty"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("gross_cents"),
        F.sum(F.round(F.col("l_extendedprice") * F.col("l_discount") * 1_000_000).cast("long")).alias("discount_micro"),
        F.sum(F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.col("l_tax") * 1_000_000).cast("long")).alias("tax_micro"),
    )
    return monthly.unpivot(
        ids=["month"],
        values=["qty", "gross_cents", "discount_micro", "tax_micro"],
        variableColumnName="measure",
        valueColumnName="total",
    )


_UNPIVOT_SQL = """
WITH m AS (
    SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
           cast(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty,
           cast(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS gross_cents,
           cast(sum(CAST(round(l_extendedprice * l_discount * 1000000) AS BIGINT)) AS BIGINT) AS discount_micro,
           cast(sum(CAST(round(l_extendedprice * (1 - l_discount) * l_tax * 1000000) AS BIGINT)) AS BIGINT) AS tax_micro
    FROM lineitem GROUP BY 1
)
SELECT month, 'qty' AS measure, qty AS total FROM m
UNION ALL SELECT month, 'gross_cents', gross_cents FROM m
UNION ALL SELECT month, 'discount_micro', discount_micro FROM m
UNION ALL SELECT month, 'tax_micro', tax_micro FROM m
"""


def _window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function surface parity in one pass: dense_rank,
    percent_rank and cume_dist of each part's retail price within its
    type, plus a fully tie-broken row_number — all four share ONE
    (p_type)-partitioned sort, so the suite costs a single exchange.
    percent_rank/cume_dist are exact rational formulas over integer
    ranks (deterministic cross-engine); ties on price share rank
    values by definition."""
    p = load_table(spark, sf_dir, "part")
    cents = F.round(F.col("p_retailprice") * 100).cast("long")
    w = Window.partitionBy("p_type").orderBy(cents.asc())
    w_full = Window.partitionBy("p_type").orderBy(cents.asc(), F.col("p_partkey").asc())
    return p.select(
        "p_partkey",
        "p_type",
        cents.alias("price_cents"),
        F.dense_rank().over(w).alias("dense_rk"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.row_number().over(w_full).alias("rn"),
    )


_WINDOW_RANK_SQL = """
SELECT p_partkey, p_type,
       CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
       cast(dense_rank() OVER w AS BIGINT) AS dense_rk,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       cast(row_number() OVER (PARTITION BY p_type
            ORDER BY CAST(round(p_retailprice * 100) AS BIGINT), p_partkey) AS BIGINT) AS rn
FROM part
WINDOW w AS (PARTITION BY p_type ORDER BY CAST(round(p_retailprice * 100) AS BIGINT))
"""


def _embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index hygiene: per-label vector-norm profile (n, min/max
    ‖v‖², and counts outside the [0.5, 2.0] band) — degenerate or
    extreme-norm vectors poison cosine neighborhoods and quantizer
    training. ‖v‖² folds sequentially over the array on BOTH engines
    (deterministic), min/max/threshold-counts are order-free, so no
    float sum ever crosses the engine boundary."""
    emb = load_table(spark, sf_dir, "embeddings")
    n2 = vector.dot(F.col("embedding").cast("array<double>"), F.col("embedding").cast("array<double>"))
    return (
        emb.select("label", n2.alias("__n2"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.min("__n2"), 6).alias("min_norm2"),
            F.round(F.max("__n2"), 6).alias("max_norm2"),
            F.sum((F.col("__n2") < 0.5).cast("long")).alias("n_low"),
            F.sum((F.col("__n2") > 2.0).cast("long")).alias("n_high"),
        )
    )


_EMB_NORM_SQL = """
WITH v AS (
    SELECT label, list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS n2
    FROM embeddings
)
SELECT label, cast(count(*) AS BIGINT) AS n_vecs,
       round(min(n2), 6) AS min_norm2, round(max(n2), 6) AS max_norm2,
       cast(sum(CASE WHEN n2 < 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
       cast(sum(CASE WHEN n2 > 2.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
FROM v GROUP BY 1
"""


def _skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) per part type: parts not
    dominated on (cheaper-or-equal price, larger-or-equal size,
    strict in one) — the multi-criteria shortlist operator SQL lacks
    a native verb for. Compiles to TWO windows sharing one
    (p_type)-keyed exchange: a RANGE frame max(size) over strictly
    cheaper rows, and an equal-price group max — a row survives iff
    it beats the first and ties the second (same-price same-size
    rows co-survive; strict dominance removes the rest). The oracle
    states dominance directly as NOT EXISTS, so the window algebra is
    value-checked against the definition."""
    p = load_table(spark, sf_dir, "part")
    cents = F.round(F.col("p_retailprice") * 100).cast("long")
    base = p.select("p_partkey", "p_type", cents.alias("price_cents"), F.col("p_size").cast("long").alias("size"))
    w_cheaper = (
        Window.partitionBy("p_type")
        .orderBy(F.col("price_cents").asc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_equal = Window.partitionBy("p_type", "price_cents")
    return (
        base.withColumn("__mx_cheaper", F.max("size").over(w_cheaper))
        .withColumn("__mx_equal", F.max("size").over(w_equal))
        .filter(
            (F.col("__mx_cheaper").isNull() | (F.col("size") > F.col("__mx_cheaper")))
            & (F.col("size") == F.col("__mx_equal"))
        )
        .select("p_type", "p_partkey", "price_cents", "size")
    )


_SKYLINE_SQL = """
WITH b AS (
    SELECT p_partkey, p_type, CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
           CAST(p_size AS BIGINT) AS size
    FROM part
)
SELECT p_type, p_partkey, price_cents, size
FROM b p
WHERE NOT EXISTS (
    SELECT 1 FROM b q
    WHERE q.p_type = p.p_type
      AND q.price_cents <= p.price_cents AND q.size >= p.size
      AND (q.price_cents < p.price_cents OR q.size > p.size)
)
"""


def _basket_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 item TRIPLES bought in the same order — the 3-way
    extension of basket_pairs: the self-join chain stays ORDER-LOCAL
    (a < b < c within one order), so the blowup is Σ C(|basket|, 3) —
    bounded by basket size (~7 → 35 per order), never |parts|³;
    TakeOrderedAndProject top-k."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("pb"))
    c = li.select("l_orderkey", F.col("l_partkey").alias("pc"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") < F.col("pb"))
        .join(c, "l_orderkey")
        .filter(F.col("pb") < F.col("pc"))
        .groupBy("pa", "pb", "pc")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "pa", "pb", "pc")
        .limit(10)
    )


_BASKET_TRIPLES_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS pa, b.l_partkey AS pb, c.l_partkey AS pc,
       cast(count(*) AS BIGINT) AS n_orders
FROM li a
JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
JOIN li c ON b.l_orderkey = c.l_orderkey AND b.l_partkey < c.l_partkey
GROUP BY 1, 2, 3
ORDER BY n_orders DESC, pa, pb, pc
LIMIT 10
"""


def _seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality STRENGTH per event type: eta² = SS_between /
    SS_total of daily event counts grouped by ISO weekday — how much
    of the daily variance the weekly cycle explains (the summary
    dow_seasonality's per-cell indices don't give). Every sum of
    squares comes from exact integer moments (daily counts are
    integers; the decimal-moment discipline), so eta² is one float
    expression over exact integers."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.to_date("ts").alias("__d"),
    ).agg(F.count(F.lit(1)).alias("n"))
    iso = ((F.dayofweek("__d") + 5) % 7 + 1).cast("int")
    # pivot the 7 weekdays into ONE exact-integer row per type, so the
    # Σ s_d²/k_d term is a FIXED-ORDER 7-term float expression (a
    # float SUM over the dow rows would expose accumulation order)
    aggs = [F.count(F.lit(1)).alias("n_days"), F.sum("n").alias("S"),
            F.sum(F.col("n") * F.col("n")).alias("Q")]
    for d in range(1, 8):
        aggs.append(F.sum(F.when(iso == d, F.col("n")).otherwise(0)).alias(f"s{d}"))
        aggs.append(F.sum(F.when(iso == d, 1).otherwise(0)).alias(f"k{d}"))
    tot = daily.groupBy("event_type").agg(*aggs)
    n = F.col("n_days").cast("double")
    S, Q = F.col("S").cast("double"), F.col("Q").cast("double")
    term = lambda d: F.when(  # noqa: E731
        F.col(f"k{d}") > 0,
        (F.col(f"s{d}").cast("double") * F.col(f"s{d}")) / F.col(f"k{d}"),
    ).otherwise(F.lit(0.0))
    ssb_part = term(1) + term(2) + term(3) + term(4) + term(5) + term(6) + term(7)
    ss_total = Q - (S * S) / n
    ss_between = ssb_part - (S * S) / n
    return tot.select(
        "event_type",
        F.col("n_days").cast("long").alias("n_days"),
        F.round(ss_between / ss_total, 6).alias("eta2"),
    )


_SEASONAL_STRENGTH_SQL = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS d, cast(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
), tot AS (
    SELECT event_type,
           cast(count(*) AS BIGINT) AS n_days,
           cast(sum(n) AS BIGINT) AS S,
           cast(sum(n * n) AS BIGINT) AS Q,
           cast(sum(CASE WHEN isodow(d) = 1 THEN n ELSE 0 END) AS BIGINT) AS s1,
           cast(sum(CASE WHEN isodow(d) = 1 THEN 1 ELSE 0 END) AS BIGINT) AS k1,
           cast(sum(CASE WHEN isodow(d) = 2 THEN n ELSE 0 END) AS BIGINT) AS s2,
           cast(sum(CASE WHEN isodow(d) = 2 THEN 1 ELSE 0 END) AS BIGINT) AS k2,
           cast(sum(CASE WHEN isodow(d) = 3 THEN n ELSE 0 END) AS BIGINT) AS s3,
           cast(sum(CASE WHEN isodow(d) = 3 THEN 1 ELSE 0 END) AS BIGINT) AS k3,
           cast(sum(CASE WHEN isodow(d) = 4 THEN n ELSE 0 END) AS BIGINT) AS s4,
           cast(sum(CASE WHEN isodow(d) = 4 THEN 1 ELSE 0 END) AS BIGINT) AS k4,
           cast(sum(CASE WHEN isodow(d) = 5 THEN n ELSE 0 END) AS BIGINT) AS s5,
           cast(sum(CASE WHEN isodow(d) = 5 THEN 1 ELSE 0 END) AS BIGINT) AS k5,
           cast(sum(CASE WHEN isodow(d) = 6 THEN n ELSE 0 END) AS BIGINT) AS s6,
           cast(sum(CASE WHEN isodow(d) = 6 THEN 1 ELSE 0 END) AS BIGINT) AS k6,
           cast(sum(CASE WHEN isodow(d) = 7 THEN n ELSE 0 END) AS BIGINT) AS s7,
           cast(sum(CASE WHEN isodow(d) = 7 THEN 1 ELSE 0 END) AS BIGINT) AS k7
    FROM daily GROUP BY 1
)
SELECT event_type, n_days,
       round((((((((CASE WHEN k1 > 0 THEN (CAST(s1 AS DOUBLE) * s1) / k1 ELSE 0.0 END
              + CASE WHEN k2 > 0 THEN (CAST(s2 AS DOUBLE) * s2) / k2 ELSE 0.0 END)
              + CASE WHEN k3 > 0 THEN (CAST(s3 AS DOUBLE) * s3) / k3 ELSE 0.0 END)
              + CASE WHEN k4 > 0 THEN (CAST(s4 AS DOUBLE) * s4) / k4 ELSE 0.0 END)
              + CASE WHEN k5 > 0 THEN (CAST(s5 AS DOUBLE) * s5) / k5 ELSE 0.0 END)
              + CASE WHEN k6 > 0 THEN (CAST(s6 AS DOUBLE) * s6) / k6 ELSE 0.0 END)
              + CASE WHEN k7 > 0 THEN (CAST(s7 AS DOUBLE) * s7) / k7 ELSE 0.0 END)
              - (CAST(S AS DOUBLE) * S) / n_days)
             / (CAST(Q AS DOUBLE) - (CAST(S AS DOUBLE) * S) / n_days), 6) AS eta2
FROM tot
"""


def _ivm_agg_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retractable aggregate-MV maintenance (ivm.retractable_agg_
    maintain): the per-part (count, qty, revenue) rollup absorbs a
    CDC feed WITH DELETES — each winning change retracts its key's
    old row from the group before (for upserts) adding the new one;
    work is O(feed + touched keys), the base MV is never
    re-aggregated. Same winner semantics as cdc_merge
    (sinks.cdc_winners). The oracle re-aggregates the fully applied
    snapshot — green iff the signed-delta algebra is exact."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.round(F.col("l_quantity")).cast("long").alias("qty")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents")
    snap = li.filter(F.col("l_linenumber") == 1).select(
        F.col("l_orderkey").alias("k"), "l_partkey", qty, cents
    )
    changes = li.filter(F.col("l_linenumber") > 1).select(
        F.col("l_orderkey").alias("k"),
        F.col("l_linenumber").alias("v"),
        F.when(F.col("l_returnflag") == "R", F.lit("delete")).otherwise(F.lit("upsert")).alias("op"),
        "l_partkey",
        qty,
        cents,
    )
    measures = {"qty_total": F.col("qty"), "cents_total": F.col("cents")}
    base = snap.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("qty").alias("qty_total"),
        F.sum("cents").alias("cents_total"),
    )
    return ivm.retractable_agg_maintain(
        base, snap, changes, key="k", op_col="op", version_col="v",
        group_col="l_partkey", measures=measures,
    )


_IVM_AGG_RETRACT_SQL = """
WITH snap AS (
    SELECT l_orderkey AS k, l_partkey,
           CAST(round(l_quantity) AS BIGINT) AS qty,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
    FROM lineitem WHERE l_linenumber = 1
), ch AS (
    SELECT l_orderkey AS k, l_linenumber AS v,
           CASE WHEN l_returnflag = 'R' THEN 'delete' ELSE 'upsert' END AS op,
           l_partkey,
           CAST(round(l_quantity) AS BIGINT) AS qty,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
    FROM lineitem WHERE l_linenumber > 1
), win AS (
    SELECT k, op, l_partkey, qty, cents,
           row_number() OVER (
               PARTITION BY k
               ORDER BY v DESC, CASE WHEN op = 'delete' THEN 1 ELSE 0 END DESC,
                        l_partkey DESC, qty DESC, cents DESC
           ) AS rn
    FROM ch
), applied AS (
    SELECT s.l_partkey, s.qty, s.cents FROM snap s
    WHERE NOT EXISTS (SELECT 1 FROM win w WHERE w.k = s.k AND w.rn = 1)
    UNION ALL
    SELECT l_partkey, qty, cents FROM win WHERE rn = 1 AND op <> 'delete'
)
SELECT l_partkey, cast(count(*) AS BIGINT) AS n,
       cast(sum(qty) AS BIGINT) AS qty_total,
       cast(sum(cents) AS BIGINT) AS cents_total
FROM applied GROUP BY 1
"""


def _scd2_agg_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline-grain SCD2→IVM composition (VERDICT r8 item 5): the
    shape a real serving stack runs — a CDC feed folds into an SCD2
    history, and a retractable aggregate MV over the OPEN rows is
    maintained from the history's own current-row diff, never
    re-aggregated. Epoch 1 builds the history and the base MV; epoch
    2 folds via scd2_apply_batch; the MV absorbs
    snapshot_diff(cur_before, cur_after) as a CDC feed through
    ivm.retractable_agg_maintain. Each stage is oracle-checked alone
    elsewhere (scd2_incremental, snapshot_diff, ivm_agg_retract);
    this entry pins the composition against ONE full-recompute
    oracle: group the final open rows directly from all events."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    cut = F.lit("2024-01-15").cast("timestamp")
    scd2_args = dict(key="user_id", attr="event_type", ts="ts", tiebreak="event_id")
    # h1 is referenced by cur1 (×3 below) AND twice inside
    # scd2_apply_batch; cur1 by the base MV, the diff and the
    # retraction semi-join — all INDEPENDENT stages, so the pins are
    # EAGER (a lazy pin is raced and recomputed per consumer; measured
    # 2× slower). Without pins the physical plan re-derived the
    # epoch-1 history ~6× (36 parquet scans, plans/r14).
    h1 = persist_fact(
        windows.scd2_history(ev.filter(F.col("ts") < cut), carry_last=True, **scd2_args)
    )
    cur1 = persist_fact(
        h1.filter(F.col("is_current") == 1).select("user_id", "event_type")
    )
    mv1 = cur1.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("user_id").cast("long").alias("sum_uid"),
    )
    h2 = windows.scd2_apply_batch(h1, ev.filter(F.col("ts") >= cut), **scd2_args)
    cur2 = h2.filter(F.col("is_current") == 1).select("user_id", "event_type")
    diff = ivm.snapshot_diff(cur1, cur2, "user_id", ["event_type"])
    changes = diff.select(
        "user_id",
        F.col("event_type_new").alias("event_type"),
        F.when(F.col("change") == "removed", F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
        F.lit(1).cast("long").alias("ver"),
    )
    changes = persist_fact(changes)  # change-grain; cdc_winners consumes it twice (independent arms)
    mv2 = ivm.retractable_agg_maintain(
        mv1, cur1, changes, key="user_id", op_col="op", version_col="ver",
        group_col="event_type", measures={"sum_uid": F.col("user_id")},
    )
    return mv2.select(
        "event_type",
        F.col("n").cast("long").alias("n_users"),
        F.col("sum_uid").cast("long").alias("sum_uid"),
    )


_SCD2_AGG_MV_SQL = """
WITH last AS (
    SELECT user_id, event_type FROM (
        SELECT user_id, event_type,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM events
    ) WHERE rn = 1
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(user_id) AS BIGINT) AS sum_uid
FROM last GROUP BY 1
"""


def _sorted_neighborhood_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood blocking (dedup.sorted_neighborhood_pairs):
    ONE global range ordering on the blocking key (two-phase row
    number — no single-partition window), each record compared only
    with its next window-1 neighbors via an offset explode + ONE
    equi-join on position, exact levenshtein verify. O(n·w)
    comparisons — the ordering-based complement to hash/LSH blocking
    for near-dups that cluster under a sort (names, codes)."""
    cust = load_table(spark, sf_dir, "customer")
    return dedup.sorted_neighborhood_pairs(
        cust, F.col("c_name"), "c_custkey", window=4, max_dist=2
    ).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "dist",
    )


_SORTED_NEIGHBORHOOD_SQL = """
WITH ranked AS (
    SELECT c_custkey, c_name,
           row_number() OVER (ORDER BY c_name, c_custkey) AS pos
    FROM customer
)
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
FROM ranked a JOIN ranked b
  ON b.pos - a.pos BETWEEN 1 AND 3
WHERE levenshtein(a.c_name, b.c_name) <= 2
"""


def _edit_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact edit-distance<=1 self-join via FastSS deletion
    neighborhoods (dedup.edit_distance_join): each string explodes
    into O(len) single-deletion fingerprints, candidates meet on a
    shared fingerprint (lossless for distance<=k), exact levenshtein
    verifies — never an all-pairs product, identical strings
    collapsed first. The oracle IS the brute-force quadratic join, so
    the driver row proves the pruning lossless on real data."""
    cust = load_table(spark, sf_dir, "customer")
    return dedup.edit_distance_join(cust, "c_name", "c_custkey", k=1).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "dist",
    )


_EDIT_DISTANCE_JOIN_SQL = """
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
"""


def _growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily growth accounting (timeseries.growth_accounting): DAU
    decomposed into new / retained / resurrected (+ churned counted
    on the day after the lapse) with dau = new+retained+resurrected
    by construction. One (user, day) distinct, one user-partitioned
    window serving lag, lead and running-first, one day-grain
    rollup."""
    ev = load_table(spark, sf_dir, "events")
    return timeseries.growth_accounting(ev, "user_id", "ts")


_GROWTH_ACCOUNTING_SQL = """
WITH ud AS (
    SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events
), w AS (
    SELECT u, d,
           lag(d)  OVER (PARTITION BY u ORDER BY d) AS prev_d,
           lead(d) OVER (PARTITION BY u ORDER BY d) AS next_d,
           min(d)  OVER (PARTITION BY u) AS first_d
    FROM ud
), act AS (
    SELECT d,
           CAST(count(*) AS BIGINT) AS dau,
           CAST(sum(CASE WHEN d = first_d THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
           CAST(sum(CASE WHEN d <> first_d AND date_diff('day', prev_d, d) = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
           CAST(sum(CASE WHEN d <> first_d AND date_diff('day', prev_d, d) > 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
    FROM w GROUP BY 1
), ch AS (
    SELECT d + 1 AS d, CAST(count(*) AS BIGINT) AS n_churned
    FROM w WHERE next_d IS NULL OR date_diff('day', d, next_d) > 1
    GROUP BY 1
)
SELECT COALESCE(act.d, ch.d) AS day,
       COALESCE(dau, 0) AS dau,
       COALESCE(n_new, 0) AS n_new,
       COALESCE(n_retained, 0) AS n_retained,
       COALESCE(n_resurrected, 0) AS n_resurrected,
       COALESCE(n_churned, 0) AS n_churned
FROM act FULL OUTER JOIN ch ON act.d = ch.d
"""


def _fd_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit (quality.fd_profile): three
    candidate FDs over lineitem profiled in ONE pass — the (fd, lhs,
    rhs) triples stack via an inline struct array (no per-FD scan),
    one hash aggregate to (fd, lhs) grain, one tiny fd-grain rollup.
    Includes a TRUE dependency ((orderkey, linenumber) -> partkey, 0
    violations expected) and two fan-out violations."""
    li = load_table(spark, sf_dir, "lineitem")
    return quality.fd_profile(
        li,
        {
            "part_to_supp": (F.col("l_partkey"), F.col("l_suppkey")),
            "order_to_status": (F.col("l_orderkey"), F.col("l_linestatus")),
            "line_to_part": (
                F.concat_ws("|", F.col("l_orderkey"), F.col("l_linenumber")),
                F.col("l_partkey"),
            ),
        },
    )


_FD_PROFILE_SQL = """
WITH t AS (
    SELECT 'part_to_supp' AS fd, CAST(l_partkey AS VARCHAR) AS lhs,
           CAST(l_suppkey AS VARCHAR) AS rhs FROM lineitem
    UNION ALL
    SELECT 'order_to_status', CAST(l_orderkey AS VARCHAR), l_linestatus FROM lineitem
    UNION ALL
    SELECT 'line_to_part',
           CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR),
           CAST(l_partkey AS VARCHAR) FROM lineitem
), per AS (
    SELECT fd, lhs, count(*) AS n_rows, count(DISTINCT rhs) AS n_rhs
    FROM t GROUP BY 1, 2
)
SELECT fd,
       CAST(count(*) AS BIGINT) AS n_lhs_values,
       CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
       CAST(max(n_rhs) AS BIGINT) AS max_fanout,
       CAST(sum(n_rows) AS BIGINT) AS n_rows
FROM per GROUP BY 1
"""


def _phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional inverted-index phrase search (corpus.phrase_search):
    the (doc, term, pos) posting relation filtered to the phrase's
    terms, n-1 equi-joins on (doc, pos+i) — at rest the index is
    term-partitioned so a query touches only its own posting lists.
    The repeated-token phrase pins OVERLAPPING-occurrence
    semantics."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.phrase_search(docs, "text", "doc_id", "batch batch")


_PHRASE_SEARCH_SQL = r"""
WITH t AS (
    SELECT doc_id,
           string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
    FROM documents
), m AS (
    SELECT doc_id,
           len([i FOR i IN generate_series(1, len(toks) - 1)
                IF toks[i] = 'batch' AND toks[i + 1] = 'batch']) AS n_matches
    FROM t
)
SELECT doc_id, CAST(n_matches AS BIGINT) AS n_matches FROM m WHERE n_matches > 0
"""


def _lm_trigram_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid-backoff trigram coverage (corpus.lm_trigram_backoff):
    held-out docs (doc_id % 10 == 0) scored against the reference
    corpus's trigram/bigram/unigram sets — per-doc counts of the
    deepest covering n-gram level (l3/l2/l1/OOV), the novelty signal
    an LM pipeline prices new data with. Reference sets reduce to
    vocab grain once and join as int64 fingerprints."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.lm_trigram_backoff(docs, "text", "doc_id", holdout_mod=10)


_LM_TRIGRAM_BACKOFF_SQL = r"""
WITH t AS (
    SELECT doc_id,
           string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
    FROM documents
), g AS (
    SELECT doc_id,
           unnest([{t3: toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2],
                    t2: toks[i+1] || ' ' || toks[i+2],
                    t1: toks[i+2]}
                   FOR i IN generate_series(1, len(toks) - 2)], recursive := true)
    FROM t
), ref3 AS (SELECT DISTINCT t3 FROM g WHERE doc_id % 10 <> 0),
   ref2 AS (SELECT DISTINCT t2 FROM g WHERE doc_id % 10 <> 0),
   ref1 AS (SELECT DISTINCT t1 FROM g WHERE doc_id % 10 <> 0),
   lv AS (
    SELECT g.doc_id,
           CASE WHEN ref3.t3 IS NOT NULL THEN 3
                WHEN ref2.t2 IS NOT NULL THEN 2
                WHEN ref1.t1 IS NOT NULL THEN 1
                ELSE 0 END AS lvl
    FROM g
    LEFT JOIN ref3 ON g.t3 = ref3.t3
    LEFT JOIN ref2 ON g.t2 = ref2.t2
    LEFT JOIN ref1 ON g.t1 = ref1.t1
    WHERE g.doc_id % 10 = 0
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tri,
       CAST(sum(CASE WHEN lvl = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_l3,
       CAST(sum(CASE WHEN lvl = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_l2,
       CAST(sum(CASE WHEN lvl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_l1,
       CAST(sum(CASE WHEN lvl = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       round(CAST(sum(CASE WHEN lvl = 3 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
           AS hit3_rate
FROM lv GROUP BY 1
"""


def _interval_union_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged-interval coverage (timeseries.interval_union_length):
    per user, 30-minute activity intervals merged islands-and-gaps
    style in ONE key-partitioned window pass; exact integer micros
    (unix_micros — whole-second epoch functions shift sub-second
    gaps)."""
    ev = load_table(spark, sf_dir, "events")
    return timeseries.interval_union_length(ev, "user_id", "ts", duration_s=1800)


_INTERVAL_UNION_SQL = """
WITH base AS (
    SELECT user_id AS k, epoch_us(ts) AS s, epoch_us(ts) + 1800000000 AS e
    FROM events
), flagged AS (
    SELECT k, s, e,
           CASE WHEN s > COALESCE(max(e) OVER (
                    PARTITION BY k ORDER BY s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ), -4611686018427387904) THEN 1 ELSE 0 END AS new_island
    FROM base
), numbered AS (
    SELECT k, s, e,
           sum(new_island) OVER (
               PARTITION BY k ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS island
    FROM flagged
), islands AS (
    SELECT k, island, min(s) AS i_s, max(e) AS i_e FROM numbered GROUP BY 1, 2
)
SELECT k AS user_id,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(i_e - i_s) AS BIGINT) AS active_micros
FROM islands GROUP BY 1
"""


def _monetary_unit_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monetary-unit systematic sample (aggregates.monetary_unit_
    sample): deterministic PPS audit sampling by exact integer cents
    laid end to end; the global cumulative sum is the two-phase
    running sum (range shuffle + local window + broadcast offsets, no
    single-partition WindowExec)."""
    li = load_table(spark, sf_dir, "lineitem")
    return aggregates.monetary_unit_sample(
        li,
        [F.col("l_orderkey"), F.col("l_linenumber")],
        F.round(F.col("l_extendedprice") * 100).cast("long"),
        n_picks=200,
    )


_MONETARY_UNIT_SQL = """
WITH t AS (
    SELECT l_orderkey AS k0, l_linenumber AS k1,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
    FROM lineitem WHERE round(l_extendedprice * 100) > 0
), c AS (
    SELECT k0, k1, cents,
           sum(cents) OVER (ORDER BY k0, k1
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM t
), iv AS (
    SELECT greatest(sum(cents) // 200, 1) AS interval FROM t
)
SELECT k0, k1, cents, CAST(cum AS BIGINT) AS cum
FROM c, iv
WHERE (cum - cents) // interval < cum // interval
"""


def _ols_two_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-regressor OLS per group (aggregates.ols_two_feature_exact):
    cents ~ qty + discount_pct per (returnflag, linestatus) via exact
    decimal(38,0) moments and closed-form centered normal equations —
    ONE float expression per coefficient, no iterative fit, 100 TB
    reduces to nine moments per key."""
    li = load_table(spark, sf_dir, "lineitem")
    return aggregates.ols_two_feature_exact(
        li,
        ["l_returnflag", "l_linestatus"],
        F.round(F.col("l_quantity")).cast("long"),
        F.round(F.col("l_discount") * 100).cast("long"),
        F.round(F.col("l_extendedprice") * 100).cast("long"),
    )


_OLS_TWO_FEATURE_SQL = """
WITH m AS (
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS DOUBLE) AS n,
           CAST(sum(x1) AS DOUBLE) AS s1, CAST(sum(x2) AS DOUBLE) AS s2,
           CAST(sum(y) AS DOUBLE) AS sy,
           CAST(sum(x1 * x1) AS DOUBLE) AS s11,
           CAST(sum(x2 * x2) AS DOUBLE) AS s22,
           CAST(sum(x1 * x2) AS DOUBLE) AS s12,
           CAST(sum(CAST(x1 AS HUGEINT) * y) AS DOUBLE) AS s1y,
           CAST(sum(CAST(x2 AS HUGEINT) * y) AS DOUBLE) AS s2y,
           CAST(count(*) AS BIGINT) AS n_out
    FROM (
        SELECT l_returnflag, l_linestatus,
               CAST(round(l_quantity) AS BIGINT) AS x1,
               CAST(round(l_discount * 100) AS BIGINT) AS x2,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        FROM lineitem
    ) GROUP BY 1, 2
)
SELECT l_returnflag, l_linestatus, n_out AS n,
       round(((n * s22 - s2 * s2) * (n * s1y - s1 * sy)
            - (n * s12 - s1 * s2) * (n * s2y - s2 * sy))
           / ((n * s11 - s1 * s1) * (n * s22 - s2 * s2)
            - (n * s12 - s1 * s2) * (n * s12 - s1 * s2)), 6) AS beta1,
       round(((n * s11 - s1 * s1) * (n * s2y - s2 * sy)
            - (n * s12 - s1 * s2) * (n * s1y - s1 * sy))
           / ((n * s11 - s1 * s1) * (n * s22 - s2 * s2)
            - (n * s12 - s1 * s2) * (n * s12 - s1 * s2)), 6) AS beta2
FROM m
WHERE n_out >= 5
  AND (n * s11 - s1 * s1) * (n * s22 - s2 * s2)
    - (n * s12 - s1 * s2) * (n * s12 - s1 * s2) <> 0.0
"""


def _seasonal_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally-adjusted outlier days (timeseries.seasonal_outlier_
    days): a day flags when 2·cents·n_dow > 3·Σ(same-weekday cents) —
    the dow-aware anomaly screen, exact by integer
    cross-multiplication (no float mean, no rounding boundary)."""
    o = load_table(spark, sf_dir, "orders")
    return timeseries.seasonal_outlier_days(
        o, "o_orderdate", F.round(F.col("o_totalprice") * 100).cast("long")
    )


_SEASONAL_OUTLIERS_SQL = """
WITH daily AS (
    SELECT o_orderdate AS day,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY 1
), d2 AS (
    SELECT day, CAST(isodow(day) AS INT) AS iso_dow, cents FROM daily
), prof AS (
    SELECT iso_dow, CAST(count(*) AS BIGINT) AS nd, CAST(sum(cents) AS BIGINT) AS s
    FROM d2 GROUP BY 1
)
SELECT day, d2.iso_dow, cents,
       (2 * cents * nd > 3 * s) AS is_outlier
FROM d2 JOIN prof USING (iso_dow)
"""


def _asof_tolerance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH a staleness tolerance: latest click at-or-
    before each purchase only counts when it is at most 2 hours old —
    the sensor/trading variant where an arbitrarily stale match is
    worse than none. Same one-shuffle carry-forward plan as asof_join
    (the tolerance is a residual filter on the carried row, never a
    range join); matches report their exact gap in integer micros."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.round("value", 4).alias("purchase_value")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.round("value", 4).alias("click_value")
    )
    out = joins.asof_join(
        purchases, clicks, key="user_id", ts="ts", tiebreak="event_id", carry=["click_value"]
    )
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("ts_r"))
    return out.filter(gap <= 2 * 3600 * 1_000_000).select(
        "event_id",
        "user_id",
        "ts",
        "purchase_value",
        F.col("ts_r").alias("click_ts"),
        F.col("event_id_r").alias("click_event_id"),
        F.col("click_value_r").alias("click_value"),
        gap.cast("long").alias("gap_micros"),
    )


_ASOF_TOLERANCE_SQL = """
SELECT a.event_id, a.user_id, a.ts, round(a.value, 4) AS purchase_value,
       b.ts AS click_ts, b.event_id AS click_event_id,
       round(b.value, 4) AS click_value,
       CAST(epoch_us(a.ts) - epoch_us(b.ts) AS BIGINT) AS gap_micros
FROM (SELECT * FROM events WHERE event_type = 'purchase') a
JOIN (SELECT * FROM events WHERE event_type = 'click') b
  ON a.user_id = b.user_id AND b.ts <= a.ts
     AND epoch_us(a.ts) - epoch_us(b.ts) <= 7200000000
QUALIFY row_number() OVER (PARTITION BY a.event_id ORDER BY b.ts DESC, b.event_id DESC) = 1
"""


def _containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shingle-set containment join (dedup.containment_join):
    pairs with |∩|/min(|A|,|B|) >= 0.8 within a language block — the
    quote/subset detector Jaccard misses. Dedupe-first (identical
    gram sets collapse before pairing), the shared-gram equi-join's
    pair aggregate IS the exact intersection, integer
    cross-multiplied threshold."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.containment_join(
        docs, "text", "doc_id", "lang", threshold=0.8, shingle_k=3
    )


_CONTAINMENT_JOIN_SQL = r"""
WITH tk AS (
    SELECT lang, doc_id,
           string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
    FROM documents WHERE len(text) > 0
), t AS (
    SELECT lang, doc_id,
           list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                          FOR i IN generate_series(1, len(toks) - 2)]) AS sh
    FROM tk
)
SELECT a.lang, a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_inter,
       round(len(list_intersect(a.sh, b.sh)) /
             CAST(least(len(a.sh), len(b.sh)) AS DOUBLE), 6) AS containment
FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE len(a.sh) > 0 AND len(b.sh) > 0
  AND 10 * len(list_intersect(a.sh, b.sh)) >= 8 * least(len(a.sh), len(b.sh))
"""


def _ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS distance (quality.ks_two_sample) between two
    sources' document-length distributions — exact: D's numerator is
    the integer max of |cum_a·n_b − cum_b·n_a| over pooled values,
    one float division on the argmax row."""
    docs = load_table(spark, sf_dir, "documents")
    return quality.ks_two_sample(
        docs.filter(F.col("source") == "src0"),
        docs.filter(F.col("source") == "src1"),
        F.col("n_chars"),
    )


_KS_TWO_SAMPLE_SQL = """
WITH ca AS (
    SELECT n_chars AS v, count(*) AS ca FROM documents WHERE source = 'src0' GROUP BY 1
), cb AS (
    SELECT n_chars AS v, count(*) AS cb FROM documents WHERE source = 'src1' GROUP BY 1
), merged AS (
    SELECT COALESCE(ca.v, cb.v) AS v, COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
    FROM ca FULL OUTER JOIN cb ON ca.v = cb.v
), cum AS (
    SELECT v,
           sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
           sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b
    FROM merged
), tot AS (
    SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b FROM merged
)
SELECT v AS argmax_v, n_a, n_b,
       CAST(abs(cum_a * n_b - cum_b * n_a) AS BIGINT) AS ks_numerator,
       round(CAST(abs(cum_a * n_b - cum_b * n_a) AS DOUBLE) / (n_a * n_b), 6) AS ks_distance
FROM cum, tot
ORDER BY abs(cum_a * n_b - cum_b * n_a) DESC, v ASC
LIMIT 1
"""


def _rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day distinct actives per day (timeseries.
    rolling_distinct): distinct counts don't merge across days, so
    the exact shape is (user, day) grain exploded to the <=7 target
    days it supports, then count_distinct per target day — constant
    fan-out, one shuffle, never a per-day rescan or self-join."""
    ev = load_table(spark, sf_dir, "events")
    return timeseries.rolling_distinct(ev, "ts", "user_id", window_days=7)


_ROLLING_DISTINCT_SQL = """
WITH ed AS (
    SELECT DISTINCT user_id AS e, CAST(ts AS DATE) AS d FROM events
), mx AS (SELECT max(d) AS m FROM ed),
ex AS (
    SELECT e,
           CAST(unnest(generate_series(d, least(d + 6, (SELECT m FROM mx)),
                                       INTERVAL 1 DAY)) AS DATE) AS day
    FROM ed
)
SELECT day, CAST(count(DISTINCT e) AS BIGINT) AS active_7d FROM ex GROUP BY 1
"""


def _cohort_revenue_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV triangle (timeseries.cohort_revenue_matrix): revenue
    by first-order week x week age, exact integer cents and epoch-day
    arithmetic; cohort-x-age output is KB-sized at any input scale."""
    o = load_table(spark, sf_dir, "orders")
    return timeseries.cohort_revenue_matrix(
        o, "o_custkey", "o_orderdate", F.round(F.col("o_totalprice") * 100).cast("long")
    )


_COHORT_REVENUE_SQL = """
WITH base AS (
    SELECT o_custkey AS c, CAST(o_orderdate AS DATE) AS d,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
), f AS (
    SELECT c, min(d) AS fd FROM base GROUP BY 1
), j AS (
    SELECT f.fd - CAST(isodow(f.fd) - 1 AS INT) AS cohort_week,
           (base.d - (f.fd - CAST(isodow(f.fd) - 1 AS INT))) // 7 AS week_age,
           cents
    FROM base JOIN f USING (c)
)
SELECT cohort_week, CAST(week_age AS BIGINT) AS week_age,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS cents
FROM j GROUP BY 1, 2
"""


def _bm25_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental BM25 (corpus.bm25_rank_incremental): the base
    corpus's doc-grain partial (dl + pivoted tf — the at-rest index)
    absorbs a new document batch by UNION; only the delta is
    re-tokenized, global stats re-reduce from doc-grain partials.
    Oracle = the full-corpus recompute (identical terms/k to
    bm25_search), so the driver row proves the merge exact."""
    docs = load_table(spark, sf_dir, "documents")
    terms = ["spark", "merge", "window"]
    base = corpus.bm25_per_doc(
        docs.filter(F.col("doc_id") % 5 != 0), "text", "doc_id", terms
    )
    return corpus.bm25_rank_incremental(
        base, docs.filter(F.col("doc_id") % 5 == 0), "text", "doc_id", terms, k=20
    )


def _token_run_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degenerate-repetition audit (corpus.token_run_lengths): longest
    consecutive identical-token run per doc + run counts — the looped-
    generation screen n-gram ratios dilute away. One doc-partitioned
    window pass."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.token_run_lengths(docs, "text", "doc_id")


_TOKEN_RUN_SQL = r"""
WITH tok AS (
    SELECT doc_id,
           unnest([{term: toks[i], pos: i}
                   FOR i IN generate_series(1, len(toks))], recursive := true)
    FROM (
        SELECT doc_id,
               string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
        FROM documents
    )
), flagged AS (
    SELECT doc_id, pos, term,
           CASE WHEN lag(term) OVER (PARTITION BY doc_id ORDER BY pos) IS NOT DISTINCT FROM term
                THEN 0 ELSE 1 END AS new_run
    FROM tok
), numbered AS (
    SELECT doc_id, term,
           sum(new_run) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
    FROM flagged
), runs AS (
    SELECT doc_id, run_id, count(*) AS run_len, max(term) AS term
    FROM numbered GROUP BY 1, 2
), best AS (
    SELECT doc_id, run_len, term,
           row_number() OVER (PARTITION BY doc_id
               ORDER BY run_len DESC, term DESC) AS rn
    FROM runs
), agg AS (
    SELECT doc_id,
           CAST(sum(run_len) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_runs
    FROM runs GROUP BY 1
)
SELECT agg.doc_id, n_tokens, n_runs,
       CAST(best.run_len AS BIGINT) AS max_run,
       best.term AS run_token
FROM agg JOIN best ON agg.doc_id = best.doc_id AND best.rn = 1
"""


def _quantile_disc_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete (type-1) per-group quantiles (aggregates.quantile_disc_
    groups): smallest observed value with cum >= ceil(q*n) — pure
    integer arithmetic, engine-exact where interpolated percentile
    families diverge. p50/p90/p99 of line-item cents by returnflag."""
    li = load_table(spark, sf_dir, "lineitem")
    return aggregates.quantile_disc_groups(
        li, "l_returnflag", F.round(F.col("l_extendedprice") * 100).cast("long")
    )


_QUANTILE_DISC_SQL = """
WITH counts AS (
    SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
           count(*) AS n
    FROM lineitem GROUP BY 1, 2
), cum AS (
    SELECT l_returnflag, v,
           sum(n) OVER (PARTITION BY l_returnflag ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           sum(n) OVER (PARTITION BY l_returnflag) AS n_tot
    FROM counts
), hits AS (
    SELECT l_returnflag, v, q_pct
    FROM cum, (SELECT unnest([50, 90, 99]) AS q_pct)
    WHERE cum >= (q_pct * n_tot + 99) // 100
)
SELECT l_returnflag, CAST(q_pct AS INT) AS q_pct, CAST(min(v) AS BIGINT) AS v
FROM hits GROUP BY 1, 2
"""


def _topk_diverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-constrained top-k (windows.topk_diverse): top-5
    customers by revenue per order priority with AT MOST 2 from any
    one market segment — two stacked key-partitioned window ranks
    (quota first, then global top-k of the survivors)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rev = (
        o.groupBy("o_orderpriority", "o_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
        .join(c.select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment"), "o_custkey")
    )
    out = windows.topk_diverse(
        rev, "o_orderpriority", "c_mktsegment", "o_custkey",
        F.col("cents"), k=5, per_subcat=2,
    )
    return out.select(
        "o_orderpriority", "rank", "o_custkey", "c_mktsegment",
        F.col("score").cast("long").alias("cents"),
    )


_TOPK_DIVERSE_SQL = """
WITH rev AS (
    SELECT o_orderpriority, o_custkey,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY 1, 2
), j AS (
    SELECT r.*, c.c_mktsegment FROM rev r JOIN customer c ON r.o_custkey = c.c_custkey
), quota AS (
    SELECT *, row_number() OVER (
        PARTITION BY o_orderpriority, c_mktsegment
        ORDER BY cents DESC, o_custkey ASC) AS sr
    FROM j
), ranked AS (
    SELECT o_orderpriority, o_custkey, c_mktsegment, cents,
           row_number() OVER (PARTITION BY o_orderpriority
               ORDER BY cents DESC, o_custkey ASC) AS rank
    FROM quota WHERE sr <= 2
)
SELECT o_orderpriority, CAST(rank AS BIGINT) AS rank, o_custkey, c_mktsegment, cents
FROM ranked WHERE rank <= 5
"""


def _hierarchy_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-parent hierarchy rollup (aggregates.hierarchy_shares):
    region → nation revenue tree, each node with exact cents and ONE
    division for its share of the parent (root shares of the grand
    total); ancestor levels reduce from the level below, never a
    second fact scan."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    df = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .select("r_name", "n_name", F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"))
    )
    return aggregates.hierarchy_shares(df, ["r_name", "n_name"], F.col("cents"))


_HIERARCHY_SHARES_SQL = """
WITH leaf AS (
    SELECT r_name, n_name,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY 1, 2
), l1 AS (
    SELECT r_name, CAST(sum(cents) AS BIGINT) AS cents FROM leaf GROUP BY 1
), tot AS (SELECT CAST(sum(cents) AS BIGINT) AS pc FROM l1)
SELECT CAST(2 AS INT) AS level, n_name AS node, r_name AS parent, leaf.cents,
       round(leaf.cents / CAST(l1.cents AS DOUBLE), 6) AS share_of_parent
FROM leaf JOIN l1 USING (r_name)
UNION ALL
SELECT CAST(1 AS INT), r_name, '<total>', l1.cents,
       round(l1.cents / CAST(tot.pc AS DOUBLE), 6)
FROM l1, tot
"""


def _prefix_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-prefix boilerplate groups (dedup.prefix_cluster,
    portable md5 keying — the xxhash64 int64 form is the scale path):
    docs whose first 4 normalized tokens are identical cluster
    together; cluster-grain output with the min doc id canonical."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.prefix_cluster(docs, "text", "doc_id", n_tokens=4, portable=True)


_PREFIX_CLUSTER_SQL = r"""
WITH p AS (
    SELECT doc_id,
           md5(array_to_string(
               (string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))[1:4],
               ' ')) AS prefix_fp
    FROM documents
)
SELECT prefix_fp,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS canonical_id
FROM p GROUP BY 1 HAVING count(*) > 1
"""


def _mann_whitney_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do purchase events carry larger values than clicks? Two-sample
    Mann-Whitney U on value cents (experiment.mann_whitney_u): ranks
    reduce to the distinct-VALUE grain, the cumulative below() count
    is a two-phase running sum (no single-partition window), ranks
    stay exact integers at 2x midrank scale, and rank-biserial / z
    are single shared float expressions over exact moments."""
    ev = load_table(spark, sf_dir, "events")
    return experiment.mann_whitney_u(
        ev, "event_type", "purchase", "click", F.round(F.col("value") * 100)
    )


_MANN_WHITNEY_SQL = """
WITH b AS (
    SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS v
    FROM events WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL
), pv AS (
    SELECT v,
           cast(sum(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
           cast(sum(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS cb,
           cast(count(*) AS BIGINT) AS c
    FROM b GROUP BY 1
), r AS (
    SELECT *, cast(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum FROM pv
), m AS (
    SELECT cast(coalesce(sum(ca), 0) AS BIGINT) AS n_a,
           cast(coalesce(sum(cb), 0) AS BIGINT) AS n_b,
           cast(coalesce(sum(CAST(ca AS HUGEINT) * (2 * (cum - c) + c + 1)), 0) AS HUGEINT) AS ra2,
           cast(coalesce(sum(CAST(c AS HUGEINT) * c * c - c), 0) AS HUGEINT) AS ties
    FROM r
)
SELECT n_a, n_b,
       CAST(ra2 - n_a * (n_a + 1) AS BIGINT) AS u_a_x2,
       CASE WHEN n_a * n_b > 0 THEN
           1.0 - CAST(ra2 - n_a * (n_a + 1) AS DOUBLE)
                 / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) END AS rank_biserial,
       CASE WHEN n_a + n_b > 1 AND CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
                 * ((CAST(n_a + n_b AS DOUBLE) + 1.0)
                    - CAST(ties AS DOUBLE)
                      / (CAST(n_a + n_b AS DOUBLE) * (CAST(n_a + n_b AS DOUBLE) - 1.0))) > 0.0
            THEN
       (CAST(ra2 - n_a * (n_a + 1) AS DOUBLE) / 2.0
        - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0)
       / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
              * ((CAST(n_a + n_b AS DOUBLE) + 1.0)
                 - CAST(ties AS DOUBLE)
                   / (CAST(n_a + n_b AS DOUBLE) * (CAST(n_a + n_b AS DOUBLE) - 1.0)))) END AS z
FROM m
"""


def _cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction over customers: pre-period covariate x
    = 1997 order revenue cents, post metric y = 1998 revenue cents
    (zero-filled conditional sums off ONE orders scan, no self-join);
    theta / var_y / var_y_cuped are single shared float expressions
    over exact decimal moments (experiment.cuped)."""
    orders = load_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.when(yr == 1997, cents).otherwise(F.lit(0))).alias("x"),
        F.sum(F.when(yr == 1998, cents).otherwise(F.lit(0))).alias("y"),
    )
    return experiment.cuped(per_cust, F.col("x"), F.col("y"))


_CUPED_SQL = """
WITH per_cust AS (
    SELECT o_custkey,
           cast(sum(CASE WHEN year(o_orderdate) = 1997
                         THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
           cast(sum(CASE WHEN year(o_orderdate) = 1998
                         THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
    FROM orders GROUP BY 1
), m AS (
    SELECT cast(count(*) AS BIGINT) AS n,
           cast(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
           cast(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
           cast(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
           cast(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
           cast(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
    FROM per_cust
)
SELECT n,
       CASE WHEN CAST(n AS DOUBLE) > 0.0
            THEN CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) END AS mean_y,
       CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
            THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END AS theta,
       CASE WHEN CAST(n AS DOUBLE) > 0.0
            THEN sqrt((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) END AS std_y,
       CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0.0
            THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) END AS var_reduction
FROM m
"""


def _srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch audit of the production hash split
    (experiment.srm_check): customers assigned to 2 arms by the same
    portable md5 bucket dataset_split uses; per-arm observed vs equal
    expected and the chi-square cell, floats as single shared
    expressions over exact counts."""
    cust = load_table(spark, sf_dir, "customer")
    return experiment.srm_check(cust, "c_custkey", n_arms=2)


_SRM_SQL = """
WITH counted AS (
    SELECT CAST(('0x' || substr(md5(c_custkey::VARCHAR), 1, 8))::BIGINT % 2 AS INTEGER) AS arm,
           cast(count(*) AS BIGINT) AS observed
    FROM (SELECT DISTINCT c_custkey FROM customer) GROUP BY 1
), arms AS (
    -- explicit 0..n_arms-1 spine: a zero-unit arm still emits its cell
    SELECT CAST(s.arm AS INTEGER) AS arm,
           cast(coalesce(counted.observed, 0) AS BIGINT) AS observed
    FROM (SELECT unnest(range(2)) AS arm) s LEFT JOIN counted ON s.arm = counted.arm
), tot AS (
    SELECT cast(sum(observed) AS BIGINT) AS total FROM arms
)
SELECT arm, observed,
       CAST(total AS DOUBLE) / 2.0 AS expected,
       (CAST(observed AS DOUBLE) - CAST(total AS DOUBLE) / 2.0)
       * (CAST(observed AS DOUBLE) - CAST(total AS DOUBLE) / 2.0)
       / (CAST(total AS DOUBLE) / 2.0) AS chi2_cell
FROM arms, tot
"""


def _order_totals_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-vs-detail value reconciliation per order status
    (quality.order_totals_reconcile): o_totalprice vs the sum of line
    charges, both in exact integer micro-dollars; per-status order
    count, exact-match count, and max/total absolute discrepancy."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return quality.order_totals_reconcile(orders, li)


_ORDER_RECONCILE_SQL = """
WITH per_order AS (
    SELECT l_orderkey AS ok,
           cast(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) AS BIGINT)) AS BIGINT) AS lines_micro
    FROM lineitem GROUP BY 1
), j AS (
    SELECT o.o_orderstatus,
           CAST(round(o.o_totalprice * 1000000) AS BIGINT)
               - coalesce(p.lines_micro, 0) AS d
    FROM orders o LEFT JOIN per_order p ON o.o_orderkey = p.ok
)
SELECT o_orderstatus,
       cast(count(*) AS BIGINT) AS n_orders,
       cast(sum(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
       cast(max(abs(d)) AS BIGINT) AS max_abs_diff_micro,
       cast(sum(abs(d)) AS BIGINT) AS total_abs_diff_micro
FROM j GROUP BY 1
"""


def _ab_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full A/B readout composition (experiment.ab_readout): customers
    hash-split into 2 arms (the same portable md5 bucket srm_check
    audits), per-arm post-period mean (1998 revenue cents) raw and
    CUPED-adjusted with the pooled pre-period theta (1997 cents) —
    arm-grain exact moments + one broadcast pooled-moment row."""
    orders = load_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.when(yr == 1997, cents).otherwise(F.lit(0))).alias("x"),
        F.sum(F.when(yr == 1998, cents).otherwise(F.lit(0))).alias("y"),
    )
    return experiment.ab_readout(per_cust, F.col("x"), F.col("y"), "o_custkey")


_AB_READOUT_SQL = """
WITH per_cust AS (
    SELECT o_custkey,
           cast(sum(CASE WHEN year(o_orderdate) = 1997
                         THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
           cast(sum(CASE WHEN year(o_orderdate) = 1998
                         THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
    FROM orders GROUP BY 1
), armed AS (
    SELECT CAST(('0x' || substr(md5(o_custkey::VARCHAR), 1, 8))::BIGINT % 2 AS INTEGER) AS arm,
           x, y
    FROM per_cust
), per_arm AS (
    SELECT arm, cast(count(*) AS BIGINT) AS na,
           cast(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sxa,
           cast(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sya
    FROM armed GROUP BY 1
), pooled AS (
    SELECT cast(count(*) AS BIGINT) AS n,
           cast(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
           cast(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
           cast(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
           cast(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
    FROM armed
)
SELECT arm, na AS n,
       CAST(sya AS DOUBLE) / CAST(na AS DOUBLE) AS mean_y,
       CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
            THEN CAST(sya AS DOUBLE) / CAST(na AS DOUBLE)
                 - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   * (CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
            ELSE CAST(sya AS DOUBLE) / CAST(na AS DOUBLE) END AS mean_y_cuped
FROM per_arm, pooled
"""


def _link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction over the STRONG-dup word-Jaccard
    pair graph (threshold 0.8 — non-edges here are pairs just below
    the pairing bar whose neighborhoods overlap, the reviewer's
    should-these-clusters-merge triage list; graph.link_prediction):
    the top-20 NON-edge pairs at distance 2 ranked by neighbor-set
    Jaccard. Exact integer common-neighbor/degree counts; one float
    division per row; top-k compiles to TakeOrderedAndProject. The
    0.8 relation materializes at rest beside the 0.5 one (the
    pair_graph cache is parameter-keyed)."""
    pairs = pair_graph.jaccard_pair_graph(spark, sf_dir, threshold=0.8, shingle_k=1)
    return graph.link_prediction(pairs, "id_a", "id_b", k=20)


_LINK_PREDICTION_SQL = r"""
WITH t AS (
    SELECT source, doc_id,
           list_distinct(string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS toks
    FROM documents
), p AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.toks, b.toks)) /
          cast(len(list_distinct(a.toks || b.toks)) AS DOUBLE) >= 0.8
), e AS (
    SELECT id_a AS src, id_b AS dst FROM p
    UNION
    SELECT id_b AS src, id_a AS dst FROM p
), deg AS (
    SELECT src, cast(count(*) AS BIGINT) AS deg FROM e GROUP BY 1
), cn AS (
    SELECT l.src AS a, r.src AS b, cast(count(*) AS BIGINT) AS n_common
    FROM e l JOIN e r ON l.dst = r.dst AND l.src < r.src
    GROUP BY 1, 2
), cand AS (
    SELECT cn.a, cn.b, cn.n_common FROM cn
    ANTI JOIN p ON cn.a = p.id_a AND cn.b = p.id_b
)
SELECT c.a, c.b, c.n_common,
       CAST(c.n_common AS DOUBLE)
           / CAST(da.deg + db.deg - c.n_common AS DOUBLE) AS neighbor_jaccard
FROM cand c JOIN deg da ON da.src = c.a JOIN deg db ON db.src = c.b
ORDER BY neighbor_jaccard DESC, c.n_common DESC, c.a, c.b
LIMIT 20
"""


def _t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (quality.t_closeness), completing the
    k-anonymity / l-diversity governance trio: per (nation, segment)
    quasi-identifier group, the EMD between the group's account-
    balance bucket distribution (ordered buckets of 1000) and the
    global one — exact cross-multiplied integer CDF differences, one
    shared float division."""
    cust = load_table(spark, sf_dir, "customer")
    return quality.t_closeness(
        cust,
        ["c_nationkey", "c_mktsegment"],
        F.floor(F.col("c_acctbal") / 1000),
    )


_T_CLOSENESS_SQL = """
WITH base AS (
    SELECT c_nationkey, c_mktsegment,
           CAST(floor(c_acctbal / 1000) AS BIGINT) AS b
    FROM customer
    WHERE c_acctbal IS NOT NULL
), gb AS (
    SELECT c_nationkey, c_mktsegment, b, cast(count(*) AS BIGINT) AS c
    FROM base GROUP BY 1, 2, 3
), allb AS (
    SELECT b, cast(count(*) AS BIGINT) AS ca FROM base GROUP BY 1
), groups AS (
    SELECT c_nationkey, c_mktsegment, cast(sum(c) AS BIGINT) AS ng
    FROM gb GROUP BY 1, 2
), tot AS (
    SELECT cast(sum(ca) AS BIGINT) AS na, cast(count(*) AS BIGINT) AS m
    FROM allb
), grid AS (
    SELECT g.c_nationkey, g.c_mktsegment, g.ng, a.b, a.ca,
           coalesce(x.c, 0) AS c
    FROM groups g CROSS JOIN allb a
    LEFT JOIN gb x ON x.c_nationkey = g.c_nationkey
                  AND x.c_mktsegment = g.c_mktsegment AND x.b = a.b
), cum AS (
    SELECT c_nationkey, c_mktsegment, ng,
           cast(sum(c) OVER w AS BIGINT) AS cg,
           cast(sum(ca) OVER w AS BIGINT) AS call,
           row_number() OVER (PARTITION BY c_nationkey, c_mktsegment ORDER BY b) AS i
    FROM grid
    WINDOW w AS (PARTITION BY c_nationkey, c_mktsegment ORDER BY b
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT c_nationkey, c_mktsegment, cast(min(ng) AS BIGINT) AS n,
       CASE WHEN min(tot.m) > 1 THEN
       CAST(cast(coalesce(sum(CASE WHEN i < tot.m THEN abs(CAST(cg AS HUGEINT) * tot.na - CAST(call AS HUGEINT) * ng) END), 0) AS HUGEINT) AS DOUBLE)
           / (CAST(min(ng) AS DOUBLE) * CAST(min(tot.na) AS DOUBLE) * CAST(min(tot.m) - 1 AS DOUBLE))
       ELSE 0.0 END AS t_emd
FROM cum CROSS JOIN tot
GROUP BY 1, 2
"""


def _cust_year_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return orders.groupBy("o_custkey").agg(
        F.sum(F.when(yr == 1997, cents).otherwise(F.lit(0))).alias("x"),
        F.sum(F.when(yr == 1998, cents).otherwise(F.lit(0))).alias("y"),
    )


_CUST_PAIR_CTE = """
per_cust AS (
    SELECT o_custkey,
           cast(sum(CASE WHEN year(o_orderdate) = 1997
                         THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
           cast(sum(CASE WHEN year(o_orderdate) = 1998
                         THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
    FROM orders GROUP BY 1
)"""


def _wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did per-customer revenue shift 1997 → 1998? Wilcoxon signed-rank
    over the paired yearly cents (experiment.wilcoxon_signed_rank):
    zero diffs dropped, |d| midranks at distinct-value grain (two-phase
    cumulative, 2x-scale exact integers), tie-corrected z as one shared
    float expression."""
    return experiment.wilcoxon_signed_rank(
        _cust_year_pair(spark, sf_dir), F.col("x"), F.col("y")
    )


_WILCOXON_SQL = f"""
WITH {_CUST_PAIR_CTE},
dd AS (
    SELECT y - x AS d FROM per_cust WHERE y - x <> 0
), pv AS (
    SELECT abs(d) AS v,
           cast(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS cp,
           cast(count(*) AS BIGINT) AS c
    FROM dd GROUP BY 1
), r AS (
    SELECT *, cast(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum FROM pv
), m AS (
    SELECT cast(coalesce(sum(cp), 0) AS BIGINT) AS n_pos,
           cast(coalesce(sum(c - cp), 0) AS BIGINT) AS n_neg,
           cast(coalesce(sum(CAST(cp AS HUGEINT) * (2 * (cum - c) + c + 1)), 0) AS HUGEINT) AS wp2,
           cast(coalesce(sum(CAST(c AS HUGEINT) * c * c - c), 0) AS HUGEINT) AS ties
    FROM r
)
SELECT n_pos, n_neg, CAST(wp2 AS BIGINT) AS w_plus_x2,
       CASE WHEN CAST(n_pos + n_neg AS DOUBLE) * (CAST(n_pos + n_neg AS DOUBLE) + 1.0)
                 * (2.0 * CAST(n_pos + n_neg AS DOUBLE) + 1.0) / 6.0
                 - CAST(ties AS DOUBLE) / 12.0 > 0.0
            THEN (CAST(wp2 AS DOUBLE)
                  - CAST(n_pos + n_neg AS DOUBLE) * (CAST(n_pos + n_neg AS DOUBLE) + 1.0) / 2.0)
                 / sqrt(CAST(n_pos + n_neg AS DOUBLE) * (CAST(n_pos + n_neg AS DOUBLE) + 1.0)
                        * (2.0 * CAST(n_pos + n_neg AS DOUBLE) + 1.0) / 6.0
                        - CAST(ties AS DOUBLE) / 12.0) END AS z
FROM m
"""


def _paired_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parametric companion of the signed-rank shift test
    (experiment.paired_t_test): exact decimal moments of the yearly
    revenue difference per customer; mean_d and t as single shared
    float expressions."""
    return experiment.paired_t_test(
        _cust_year_pair(spark, sf_dir), F.col("x"), F.col("y")
    )


_PAIRED_T_SQL = f"""
WITH {_CUST_PAIR_CTE},
m AS (
    SELECT cast(count(*) AS BIGINT) AS n,
           cast(sum(CAST(y - x AS HUGEINT)) AS HUGEINT) AS sd,
           cast(sum(CAST(y - x AS HUGEINT) * (y - x)) AS HUGEINT) AS sdd
    FROM per_cust
)
SELECT n,
       CAST(sd AS DOUBLE) / CAST(n AS DOUBLE) AS mean_d,
       CASE WHEN CAST(n AS DOUBLE) > 1.0
                 AND (CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))
                     / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) > 0.0
            THEN (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))
                        / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
                        / CAST(n AS DOUBLE)) END AS t
FROM m
"""


def _auc_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC (experiment.auc_exact): how well does event value
    separate purchases from all other events? AUC is U/(n_pos·n_neg)
    — the Mann-Whitney midrank machinery verbatim (distinct-value
    grain, two-phase cumulative, exact 2x ranks), ties counted half;
    one shared float division. The builtin evaluator trapezoid-sums
    floats in partition order; this is the engine-portable exact
    form."""
    ev = load_table(spark, sf_dir, "events")
    return experiment.auc_exact(
        ev, F.col("event_type") == "purchase", F.round(F.col("value") * 100).cast("long")
    )


_AUC_SQL = """
WITH b AS (
    SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos,
           CAST(round(value * 100) AS BIGINT) AS v
    FROM events WHERE value IS NOT NULL
), pv AS (
    SELECT v,
           cast(sum(pos) AS BIGINT) AS cp,
           cast(count(*) AS BIGINT) AS c
    FROM b GROUP BY 1
), r AS (
    SELECT *, cast(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum FROM pv
), m AS (
    SELECT cast(coalesce(sum(cp), 0) AS BIGINT) AS n_pos,
           cast(coalesce(sum(c - cp), 0) AS BIGINT) AS n_neg,
           cast(coalesce(sum(CAST(cp AS HUGEINT) * (2 * (cum - c) + c + 1)), 0) AS HUGEINT) AS ra2
    FROM r
)
SELECT n_pos, n_neg,
       CASE WHEN n_pos * n_neg > 0
            THEN CAST(ra2 - n_pos * (n_pos + 1) AS DOUBLE)
                 / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) END AS auc
FROM m
"""


def _deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seedless reproducible training order (corpus.deterministic_
    shuffle): (shard, position) is a pure function of the doc id —
    portable md5 shard bucket, within-shard rank over the full md5 hex
    via the two-phase partitioned rank (no per-shard WindowExec: a
    shard at lake scale is tens of GB and must never route through one
    task)."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.deterministic_shuffle(docs, "doc_id", n_shards=8)


_DET_SHUFFLE_SQL = """
WITH h AS (
    SELECT doc_id, md5(doc_id::VARCHAR) AS hx,
           CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 8 AS INTEGER) AS shard
    FROM documents
)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY hx, doc_id) AS BIGINT) AS pos
FROM h
"""


def _token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality-ranked greedy selection under a 3000-token
    budget (corpus.token_budget_select): the curation step that turns
    a mixture share into a document list. Exact integer quality
    (score·3) and token counts; the per-source cumulative sum runs
    through the two-phase partitioned running sum (a source is the
    classic giant-key window hazard)."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.token_budget_select(docs, "text", "doc_id", "source", 3000)


_TOKEN_BUDGET_SQL = r"""
WITH t AS (
    SELECT source, doc_id,
           length(text) AS nc,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
           length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS np
    FROM documents
), q AS (
    SELECT source, doc_id, cast(n_tokens AS BIGINT) AS n_tokens,
           CAST((CASE WHEN nc BETWEEN 50 AND 5000 THEN 1 ELSE 0 END)
              + (CASE WHEN (CASE WHEN nc = 0 THEN 0.0 ELSE np / cast(nc AS DOUBLE) END) < 0.2
                      THEN 1 ELSE 0 END)
              + (CASE WHEN n_tokens > 0 AND nc / cast(n_tokens AS DOUBLE) BETWEEN 3.0 AND 12.0
                      THEN 1 ELSE 0 END) AS INTEGER) AS quality_x3
    FROM t
), c AS (
    SELECT source, doc_id, quality_x3, n_tokens,
           cast(sum(n_tokens) OVER (PARTITION BY source
                                    ORDER BY quality_x3 DESC, doc_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_tokens
    FROM q
)
SELECT source, doc_id, quality_x3, n_tokens, cum_tokens
FROM c WHERE cum_tokens <= 3000
"""


def _curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation attrition funnel
    (plans.corpus_pipeline.curation_funnel): the standard pretraining
    cascade — integer quality gate → language gate → exact dedup
    (min-id per md5 fingerprint) → eval decontamination (bloom-pruned
    8-shingle semi-join vs the raw src0 eval set) → per-source token
    budget — with each stage an already-oracle-checked operator of
    this repo, pinned here in COMPOSITION. One row per stage carrying
    doc count, token mass and two multiset id checksums (sum and
    sum-of-squares of doc_id mod 262139), so the oracle pins the
    exact surviving membership at every stage, not just counts.
    Read-path sibling of run_corpus_pipeline (the pytest-pinned write
    path); stage semantics cross-checked against dedup_exact,
    contamination_check and token_budget_select's oracles."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus_pipeline.curation_funnel(docs, "text", "doc_id", "lang", "source")


# shared CTE chain of the curation-funnel family (batch, incremental
# and per-source report tails all consume the same stage relations)
_CURATION_CTES = r"""
WITH t AS (
    SELECT doc_id, lang, source, text,
           length(text) AS nc,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
           length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS np
    FROM documents
), q AS MATERIALIZED (
    SELECT doc_id, lang, source, text, cast(n_tokens AS BIGINT) AS n_tokens,
           CAST((CASE WHEN nc BETWEEN 50 AND 5000 THEN 1 ELSE 0 END)
              + (CASE WHEN (CASE WHEN nc = 0 THEN 0.0 ELSE np / cast(nc AS DOUBLE) END) < 0.2
                      THEN 1 ELSE 0 END)
              + (CASE WHEN n_tokens > 0 AND nc / cast(n_tokens AS DOUBLE) BETWEEN 3.0 AND 12.0
                      THEN 1 ELSE 0 END) AS INTEGER) AS quality_x3
    FROM t
), p2 AS (
    SELECT * FROM q WHERE quality_x3 >= 3 AND lang = 'en'
), f AS MATERIALIZED (
    SELECT *, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp FROM p2
), w AS (
    SELECT fp, min(doc_id) AS doc_id FROM f GROUP BY 1
), p3 AS MATERIALIZED (
    SELECT f.* FROM f JOIN w ON f.fp = w.fp AND f.doc_id = w.doc_id
), esh AS (
    SELECT DISTINCT unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 7, 0)),
               i -> array_to_string(toks[i:i+7], ' ')))) AS s
    FROM (SELECT string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
                 AS toks
          FROM documents WHERE source = 'src0')
), tsh AS (
    SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 7, 0)),
               i -> array_to_string(toks[i:i+7], ' ')))) AS s
    FROM (SELECT doc_id,
                 string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
                     AS toks
          FROM p3 WHERE source <> 'src0')
), cont AS (
    SELECT DISTINCT tsh.doc_id FROM tsh JOIN esh USING (s)
), p4 AS MATERIALIZED (
    SELECT p3t.* FROM (SELECT * FROM p3 WHERE source <> 'src0') p3t
    ANTI JOIN cont USING (doc_id)
), c AS (
    SELECT doc_id, source, n_tokens,
           sum(n_tokens) OVER (PARTITION BY source ORDER BY quality_x3 DESC, doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM p4
), p5 AS (
    SELECT doc_id, source, n_tokens FROM c WHERE cum <= 200
)
"""


_CURATION_FUNNEL_SQL = _CURATION_CTES + r"""
SELECT 's0_raw' AS stage, cast(count(*) AS BIGINT) AS n_docs,
       cast(coalesce(sum(n_tokens), 0) AS BIGINT) AS n_tokens,
       cast(coalesce(sum(doc_id % 262139), 0) AS BIGINT) AS id_check1,
       cast(coalesce(sum((doc_id % 262139) * (doc_id % 262139)), 0) AS BIGINT) AS id_check2
FROM q
UNION ALL
SELECT 's1_quality', cast(count(*) AS BIGINT), cast(coalesce(sum(n_tokens), 0) AS BIGINT),
       cast(coalesce(sum(doc_id % 262139), 0) AS BIGINT),
       cast(coalesce(sum((doc_id % 262139) * (doc_id % 262139)), 0) AS BIGINT)
FROM q WHERE quality_x3 >= 3
UNION ALL
SELECT 's2_lang', cast(count(*) AS BIGINT), cast(coalesce(sum(n_tokens), 0) AS BIGINT),
       cast(coalesce(sum(doc_id % 262139), 0) AS BIGINT),
       cast(coalesce(sum((doc_id % 262139) * (doc_id % 262139)), 0) AS BIGINT)
FROM p2
UNION ALL
SELECT 's3_exact_dedup', cast(count(*) AS BIGINT), cast(coalesce(sum(n_tokens), 0) AS BIGINT),
       cast(coalesce(sum(doc_id % 262139), 0) AS BIGINT),
       cast(coalesce(sum((doc_id % 262139) * (doc_id % 262139)), 0) AS BIGINT)
FROM p3
UNION ALL
SELECT 's4_decontaminated', cast(count(*) AS BIGINT), cast(coalesce(sum(n_tokens), 0) AS BIGINT),
       cast(coalesce(sum(doc_id % 262139), 0) AS BIGINT),
       cast(coalesce(sum((doc_id % 262139) * (doc_id % 262139)), 0) AS BIGINT)
FROM p4
UNION ALL
SELECT 's5_token_budget', cast(count(*) AS BIGINT), cast(coalesce(sum(n_tokens), 0) AS BIGINT),
       cast(coalesce(sum(doc_id % 262139), 0) AS BIGINT),
       cast(coalesce(sum((doc_id % 262139) * (doc_id % 262139)), 0) AS BIGINT)
FROM p5
"""


def _curation_funnel_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingestion curation
    (plans.corpus_pipeline.curation_funnel_incremental): the at-rest
    corpus (doc_id below the 80% id mark, plus ALL eval-source docs —
    the eval set is frozen upstream of curation) was curated in a
    previous run; the new batch (the remaining non-eval ids, all above
    every at-rest non-eval id — the gate family's monotone-id
    contract, fail-stopped in the fold) folds in through the at-rest
    LEVELS relation, the bloom-probed fingerprint index, the frozen
    eval shingles and the budget family's (selected, cutoff) state —
    the at-rest corpus is never re-scored. Stage 5 is NOT append-only
    (a batch doc can evict an at-rest selected doc), so the union's
    stage-5 row comes from the fold output. The ORACLE is the FULL
    batch-path funnel SQL: the fold must equal the full recompute
    exactly, checked differentially every round."""
    docs = load_table(spark, sf_dir, "documents")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    t = int(max_id * 8 // 10)
    prior = docs.filter((F.col("doc_id") < t) | (F.col("source") == "src0"))
    batch = docs.filter((F.col("doc_id") >= t) & (F.col("source") != "src0"))
    # the at-rest levels relation IS the production at-rest state —
    # materialize once per corpus identity (pair_graph warehouse
    # discipline) so steady-state epochs pay only the fold
    prior_levels = pair_graph._materialized(
        spark,
        sf_dir,
        "curation_levels_prior",
        "t80_en_q3_k8_b200",
        lambda: corpus_pipeline.curation_levels(prior, "text", "doc_id", "lang", "source"),
    )
    return corpus_pipeline.curation_funnel_incremental(
        prior, batch, "text", "doc_id", "lang", "source", prior_levels=prior_levels
    )


def _curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation release report
    (plans.corpus_pipeline.curation_report): survivor counts at every
    funnel stage + raw/selected token mass + selected shares as
    floor-scaled integer ppm (the micro-unit discipline — ratios of
    small exact counts are never emitted as round-6 floats). The eval
    source's zeros past stage 3 are the report's audit value: a
    nonzero eval selection is a pipeline bug. One per-source hash
    aggregate over the shared labeled relation."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus_pipeline.curation_report(docs, "text", "doc_id", "lang", "source")


_CURATION_REPORT_SQL = _CURATION_CTES + r"""
SELECT per.source,
       per.n_docs,
       per.tok_raw,
       coalesce(s1.c, 0) AS n_quality,
       coalesce(s2.c, 0) AS n_lang,
       coalesce(s3.c, 0) AS n_dedup,
       coalesce(s4.c, 0) AS n_decontaminated,
       coalesce(s5.c, 0) AS n_selected,
       coalesce(s5.t, 0) AS tok_selected,
       cast(coalesce(s5.c, 0) * 1000000 // per.n_docs AS BIGINT) AS sel_docs_ppm,
       cast(CASE WHEN per.tok_raw > 0
                 THEN coalesce(s5.t, 0) * 1000000 // per.tok_raw
                 ELSE 0 END AS BIGINT) AS sel_tok_ppm
FROM (SELECT source, cast(count(*) AS BIGINT) AS n_docs,
             cast(coalesce(sum(n_tokens), 0) AS BIGINT) AS tok_raw
      FROM q GROUP BY 1) per
LEFT JOIN (SELECT source, cast(count(*) AS BIGINT) AS c
           FROM q WHERE quality_x3 >= 3 GROUP BY 1) s1 USING (source)
LEFT JOIN (SELECT source, cast(count(*) AS BIGINT) AS c FROM p2 GROUP BY 1) s2
    USING (source)
LEFT JOIN (SELECT source, cast(count(*) AS BIGINT) AS c FROM p3 GROUP BY 1) s3
    USING (source)
LEFT JOIN (SELECT source, cast(count(*) AS BIGINT) AS c FROM p4 GROUP BY 1) s4
    USING (source)
LEFT JOIN (SELECT source, cast(count(*) AS BIGINT) AS c,
                  cast(sum(n_tokens) AS BIGINT) AS t
           FROM p5 GROUP BY 1) s5 USING (source)
"""


def _source_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset card (corpus.source_data_card): doc/token
    counts, mean doc length, top-quality and below-length-floor shares
    — one source-grain hash aggregate, exact integers + three shared
    float divisions."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.source_data_card(docs, "text", "source")


_SOURCE_CARD_SQL = r"""
WITH t AS (
    SELECT source,
           length(text) AS nc,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
           length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS np
    FROM documents
), m AS (
    SELECT source,
           cast(count(*) AS BIGINT) AS n_docs,
           cast(sum(n_tokens) AS BIGINT) AS total_tokens,
           cast(sum(CASE WHEN (CASE WHEN nc BETWEEN 50 AND 5000 THEN 1 ELSE 0 END)
                            + (CASE WHEN (CASE WHEN nc = 0 THEN 0.0 ELSE np / cast(nc AS DOUBLE) END) < 0.2
                                    THEN 1 ELSE 0 END)
                            + (CASE WHEN n_tokens > 0 AND nc / cast(n_tokens AS DOUBLE) BETWEEN 3.0 AND 12.0
                                    THEN 1 ELSE 0 END) = 3
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_top_quality,
           cast(sum(CASE WHEN nc < 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_short
    FROM t GROUP BY 1
)
SELECT source, n_docs, total_tokens,
       CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avg_doc_tokens,
       CAST(n_top_quality AS DOUBLE) / CAST(n_docs AS DOUBLE) AS top_quality_share,
       CAST(n_short AS DOUBLE) / CAST(n_docs AS DOUBLE) AS short_share
FROM m
"""


def _mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical dependence audit (quality.mutual_information):
    MI(lang; source) in nats over documents, with marginal entropies
    and geometric-mean NMI. One map-side-combined aggregate to the
    (lang, source) cell grain; marginals from windows over the tiny
    cell relation; float terms fold per cell at the char_entropy
    precedent (exact integer counts -> shared-verbatim double
    expressions, round-6 at the audit grain)."""
    docs = load_table(spark, sf_dir, "documents")
    return quality.mutual_information(docs, "lang", "source")


_MUTUAL_INFORMATION_SQL = """
WITH cells AS (
    SELECT lang, source, cast(count(*) AS BIGINT) AS c
    FROM documents
    WHERE lang IS NOT NULL AND source IS NOT NULL
    GROUP BY 1, 2
), t AS (
    SELECT c,
           sum(c) OVER (PARTITION BY lang) AS nx,
           sum(c) OVER (PARTITION BY source) AS ny,
           sum(c) OVER () AS n
    FROM cells
), a AS (
    SELECT cast(max(n) AS BIGINT) AS n,
           cast(count(*) AS BIGINT) AS n_cells,
           round(sum((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                     * ln((CAST(c AS DOUBLE) * CAST(n AS DOUBLE))
                          / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)))), 6) AS mi_nats,
           sum(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
               * ln(CAST(nx AS DOUBLE) / CAST(n AS DOUBLE))) AS hx,
           sum(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
               * ln(CAST(ny AS DOUBLE) / CAST(n AS DOUBLE))) AS hy
    FROM t
)
SELECT n, n_cells, mi_nats,
       round(hx, 6) AS h_x_nats,
       round(hy, 6) AS h_y_nats,
       CASE WHEN hx > 0 AND hy > 0
            THEN round(mi_nats / sqrt(hx * hy), 6) END AS nmi
FROM a
"""


def _target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free categorical feature build
    (aggregates.target_encode_loo): each order's market segment
    encoded as the mean total (cents) of every OTHER order in the
    segment. Key-grain aggregate broadcast back over the fact — never
    a window over 5 giant segment partitions; numerator exact int64,
    one shared double division."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey", F.col("c_mktsegment").alias("segment"), "cents"
    )
    return aggregates.target_encode_loo(j, "segment", "cents", "loo_mean_cents").select(
        "o_orderkey", "segment", "loo_mean_cents"
    )


_TARGET_ENCODE_LOO_SQL = """
WITH j AS (
    SELECT o_orderkey, c_mktsegment AS segment,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders JOIN customer ON o_custkey = c_custkey
), t AS (
    SELECT segment, sum(cents) AS tot, count(*) AS nk FROM j GROUP BY 1
)
SELECT o_orderkey, segment,
       CASE WHEN nk > 1
            THEN CAST(tot - cents AS DOUBLE) / CAST(nk - 1 AS DOUBLE)
       END AS loo_mean_cents
FROM j JOIN t USING (segment)
"""


def _jaro_winkler_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-pair scoring (dedup.jaro_winkler_rescore): every customer
    name pair within edit distance 1 (lossless FastSS candidates),
    scored with Jaro-Winkler. The sequential JW kernel runs as an
    Arrow-batched pandas UDF on the surviving pairs only; the oracle
    scores the same pairs with DuckDB's NATIVE
    jaro_winkler_similarity — a true cross-implementation check of
    the scoring kernel (convention pinned in
    tests/test_invariants.py), not a mirrored formula."""
    cust = load_table(spark, sf_dir, "customer")
    return dedup.jaro_winkler_rescore(cust, "c_name", "c_custkey", k=1).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "dist",
        "jw",
    )


_JARO_WINKLER_RESCORE_SQL = """
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist,
       round(jaro_winkler_similarity(a.c_name, b.c_name), 6) AS jw
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
"""


def _recs_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recommender rank-quality backtest: the recs_hit_rate setup
    (co-purchase top-5 trained pre-1999, evaluated on held-out
    directed test co-occurrences) graded by MRR@5 and hits@1 instead
    of flat hit rate. Ranks come from a deterministic INTEGER
    ordering (n_ab desc, j asc), and the reciprocal-rank sum stays
    exact via the LCM trick — sum(60 div rank) in int64 (60 = lcm of
    1..5), ONE shared double division at the end — so the metric
    never rides float-summation order."""
    k = 5
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_shipdate")
    cutoff = F.lit("1999-01-01").cast("timestamp")

    def directed_pairs(d: DataFrame) -> DataFrame:
        dd = d.select("l_orderkey", "l_partkey").distinct()
        a = dd.select("l_orderkey", F.col("l_partkey").alias("i"))
        b = dd.select("l_orderkey", F.col("l_partkey").alias("j"))
        return a.join(b, "l_orderkey").filter(F.col("i") != F.col("j"))

    train = (
        directed_pairs(li.filter(F.col("l_shipdate") < cutoff))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    w = Window.partitionBy("i").orderBy(F.col("n_ab").desc(), F.col("j").asc())
    recs = train.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    test = directed_pairs(li.filter(F.col("l_shipdate") >= cutoff)).select("i", "j").distinct()
    hit = test.join(recs.select("i", "j", "rn"), ["i", "j"], "left")
    return hit.agg(
        F.lit(k).alias("k"),
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.count("rn").cast("long").alias("n_hits"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).cast("long").alias("n_hits_at_1"),
        F.round(
            F.coalesce(F.sum(F.expr("60 div rn")), F.lit(0)).cast("double")
            / (F.lit(60.0) * F.count(F.lit(1)).cast("double")),
            6,
        ).alias("mrr"),
    )


_RECS_MRR_SQL = """
WITH tr AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_shipdate < TIMESTAMP '1999-01-01'),
te AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '1999-01-01'),
train AS (
    SELECT a.l_partkey AS i, b.l_partkey AS j, count(*) AS n_ab
    FROM tr a JOIN tr b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    GROUP BY 1, 2
), recs AS (
    SELECT i, j, rn FROM (
        SELECT i, j, row_number() OVER (PARTITION BY i ORDER BY n_ab DESC, j) AS rn
        FROM train
    ) WHERE rn <= 5
), test AS (
    SELECT DISTINCT a.l_partkey AS i, b.l_partkey AS j
    FROM te a JOIN te b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
), h AS (
    SELECT test.i, test.j, recs.rn
    FROM test LEFT JOIN recs ON test.i = recs.i AND test.j = recs.j
)
SELECT 5 AS k,
       cast(count(*) AS BIGINT) AS n_test,
       cast(count(rn) AS BIGINT) AS n_hits,
       cast(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits_at_1,
       round(CAST(coalesce(sum(60 // rn), 0) AS DOUBLE)
             / (60.0 * CAST(count(*) AS DOUBLE)), 6) AS mrr
FROM h
"""


def _quantile_match_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source score calibration (corpus.quantile_match_normalize):
    each source's n_chars distribution mapped onto the pooled
    distribution's order statistics. Positions are exact integer
    arithmetic (floor-division rank mapping — no interpolation, no
    HALF_UP/half-even seam); within-source AND pooled ranks run
    two-phase (no giant-key or single-task WindowExec)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return corpus.quantile_match_normalize(
        docs, "n_chars", "doc_id", "source", out_col="n_chars_matched"
    )


_QUANTILE_MATCH_SQL = """
WITH base AS (SELECT doc_id, source, n_chars FROM documents),
nn AS (SELECT cast(count(*) AS BIGINT) AS n FROM base),
pooled AS (
    SELECT n_chars AS v, row_number() OVER (ORDER BY n_chars, doc_id) AS g
    FROM base
), ranked AS (
    SELECT doc_id, source, n_chars,
           row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS r,
           count(*) OVER (PARTITION BY source) AS ng
    FROM base
), pos AS (
    SELECT doc_id, source, n_chars,
           CASE WHEN ng > 1 THEN 1 + ((r - 1) * (n - 1)) // (ng - 1)
                ELSE 1 + (n - 1) // 2 END AS k
    FROM ranked CROSS JOIN nn
)
SELECT pos.doc_id, pos.source, pos.n_chars, pooled.v AS n_chars_matched
FROM pos JOIN pooled ON pos.k = pooled.g
"""


def _domain_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap curation (corpus.domain_cap_sample): at most 15
    documents per source, selected by deterministic md5 order (no
    RNG; re-runs and the oracle keep the identical subset). Ranks run
    two-phase — a web crawl's hottest domain is exactly the giant key
    a per-key window would serialize."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return corpus.domain_cap_sample(docs, "doc_id", "source", cap=15)


_DOMAIN_CAP_SQL = """
WITH h AS (
    SELECT doc_id, source,
           ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 1000000007 AS hh
    FROM documents
), r AS (
    SELECT doc_id, source,
           row_number() OVER (PARTITION BY source ORDER BY hh, doc_id) AS kept_rank
    FROM h
)
SELECT doc_id, source, CAST(kept_rank AS BIGINT) AS kept_rank
FROM r WHERE kept_rank <= 15
"""


def _always_valid_pvalue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential A/B monitor (experiment.always_valid_pvalue): mSPRT
    always-valid p-value per day over the events stream, arms =
    portable hash split of user_id, value integer-scaled to cents
    (the mann_whitney grain), tau2 = 10000 cents^2 (a 1-unit prior sd
    on the mean difference)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return experiment.always_valid_pvalue(
        ev,
        F.round(F.col("value") * 100),
        "user_id",
        "ts",
        tau2=10000.0,
    )


_ALWAYS_VALID_SQL = """
WITH proj AS (
    SELECT ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT % 2 AS arm,
           CAST(ts AS DATE) AS day,
           CAST(round(value * 100) AS DECIMAL(18,0)) AS v
    FROM events WHERE value IS NOT NULL
), daily AS (
    SELECT day, arm, count(*) AS n, sum(v) AS s, sum(v * v) AS ss
    FROM proj GROUP BY 1, 2
), cum AS (
    SELECT day, arm,
           sum(n) OVER w AS cn, sum(s) OVER w AS cs, sum(ss) OVER w AS css
    FROM daily
    WINDOW w AS (PARTITION BY arm ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), a0 AS (SELECT day, cn AS rn0, cs AS rs0, css AS rss0 FROM cum WHERE arm = 0),
a1 AS (SELECT day, cn AS rn1, cs AS rs1, css AS rss1 FROM cum WHERE arm = 1),
joined AS (
    SELECT COALESCE(a0.day, a1.day) AS day, rn0, rs0, rss0, rn1, rs1, rss1
    FROM a0 FULL OUTER JOIN a1 ON a0.day = a1.day
), filled AS (
    SELECT day,
           last_value(rn0 IGNORE NULLS) OVER wf AS n0d,
           last_value(rs0 IGNORE NULLS) OVER wf AS s0,
           last_value(rss0 IGNORE NULLS) OVER wf AS ss0,
           last_value(rn1 IGNORE NULLS) OVER wf AS n1d,
           last_value(rs1 IGNORE NULLS) OVER wf AS s1,
           last_value(rss1 IGNORE NULLS) OVER wf AS ss1
    FROM joined
    WINDOW wf AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), stats AS (
    SELECT day,
           CAST(n0d AS BIGINT) AS n0, CAST(n1d AS BIGINT) AS n1,
           CAST(s1 AS DOUBLE) / CAST(n1d AS DOUBLE)
             - CAST(s0 AS DOUBLE) / CAST(n0d AS DOUBLE) AS delta,
           (CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / CAST(n0d AS DOUBLE))
             + (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1d AS DOUBLE)) AS ssw,
           CAST(n0d AS DOUBLE) + CAST(n1d AS DOUBLE) AS n,
           n0d IS NOT NULL AND n1d IS NOT NULL
             AND CAST(n0d AS DOUBLE) + CAST(n1d AS DOUBLE) > 2.0 AS defined
    FROM filled
), lamt AS (
    SELECT day, n0, n1,
           CASE WHEN defined THEN round(delta, 6) END AS delta_hat,
           CASE WHEN defined AND ssw > 0 THEN
             sqrt((ssw / (n - 2.0)) * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))
                  / ((ssw / (n - 2.0)) * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE)) + 10000.0))
             * exp(delta * delta * 10000.0
                   / (2.0 * (ssw / (n - 2.0)) * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))
                      * ((ssw / (n - 2.0)) * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE)) + 10000.0)))
           END AS lam
    FROM stats
)
SELECT day, n0, n1, delta_hat,
       CASE WHEN min(1.0 / lam) OVER wm IS NOT NULL
            THEN round(least(1.0, min(1.0 / lam) OVER wm), 6) END AS p_always_valid
FROM lamt
WINDOW wm AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def _local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Node-grain clustering coefficients (graph.local_clustering)
    over the shared at-rest word-Jaccard pair relation — which dup
    members are clique-core vs chain-bridge. Triangles credit their
    three vertices via one explode; degrees from one union-count;
    exact int64 counts, one shared division."""
    pairs = pair_graph.jaccard_pair_graph(spark, sf_dir, threshold=0.5, shingle_k=1)
    return graph.local_clustering(pairs)


_LOCAL_CLUSTERING_SQL = r"""
WITH t AS (
    SELECT source, doc_id,
           list_distinct(string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS toks
    FROM documents
), p AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.toks, b.toks)) /
          cast(len(list_distinct(a.toks || b.toks)) AS DOUBLE) >= 0.5
), tri AS (
    SELECT e1.id_a AS a, e1.id_b AS b, e2.id_b AS c
    FROM p e1
    JOIN p e2 ON e1.id_b = e2.id_a
    JOIN p e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
), per_v AS (
    SELECT v, cast(count(*) AS BIGINT) AS tt
    FROM (SELECT a AS v FROM tri UNION ALL SELECT b AS v FROM tri
          UNION ALL SELECT c AS v FROM tri)
    GROUP BY v
), deg AS (
    SELECT v, cast(count(*) AS BIGINT) AS degree
    FROM (SELECT id_a AS v FROM p UNION ALL SELECT id_b AS v FROM p)
    GROUP BY v
)
SELECT deg.v, degree,
       cast(coalesce(tt, 0) AS BIGINT) AS n_triangles,
       CASE WHEN degree >= 2
            THEN CAST(2 * coalesce(tt, 0) AS DOUBLE)
                 / CAST(degree * (degree - 1) AS DOUBLE)
            ELSE 0.0 END AS local_clustering
FROM deg LEFT JOIN per_v ON deg.v = per_v.v
"""


def _heaps_law_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve (corpus.heaps_law_curve): cumulative
    tokens vs cumulative distinct types in doc_id scan order. The
    running distinct is a running sum of first-occurrence counts
    (min-doc per type), both cumulative sums exact int64 two-phase."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.heaps_law_curve(docs, "text", "doc_id")


_HEAPS_LAW_SQL = r"""
WITH tok AS (
    SELECT doc_id,
           unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
    FROM documents
), pd AS (
    SELECT doc_id, cast(count(*) AS BIGINT) AS n_tokens FROM tok GROUP BY 1
), ft AS (
    SELECT token, min(doc_id) AS doc_id FROM tok GROUP BY 1
), nt AS (
    SELECT doc_id, cast(count(*) AS BIGINT) AS n_new_types FROM ft GROUP BY 1
), base AS (
    SELECT d.doc_id,
           coalesce(pd.n_tokens, 0) AS n_tokens,
           coalesce(nt.n_new_types, 0) AS n_new_types
    FROM documents d
    LEFT JOIN pd ON d.doc_id = pd.doc_id
    LEFT JOIN nt ON d.doc_id = nt.doc_id
)
SELECT doc_id, n_tokens, n_new_types,
       cast(sum(n_tokens) OVER (ORDER BY doc_id) AS BIGINT) AS cum_tokens,
       cast(sum(n_new_types) OVER (ORDER BY doc_id) AS BIGINT) AS cum_types
FROM base
"""


def _fdr_bh_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple-testing control (experiment.fdr_bh): a 10-test battery
    of per-segment and per-priority Welch z-tests (group vs
    complement, order total cents) corrected with Benjamini-Hochberg
    at q = 0.10. Exact decimal moments per test + one-row totals
    broadcast back; z and the A&S normal tail are shared-verbatim
    float expressions; p is rounded to the 6dp audit grain BEFORE
    ranking so the BH order is engine-portable (ties break on
    test_id)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"), F.col("o_orderpriority").alias("prio"), "cents"
    )
    v = F.col("cents").cast("decimal(18,0)")
    # ONE aggregate pass to the (seg, prio) cell grain (≤ |segs|·|prios|
    # rows); every test arm and the totals roll up from the cells —
    # the old shape unioned two full projections of j and aggregated
    # the doubled rows, then scanned j a third time for the totals
    # (3 passes over the fact for one battery). Decimal moment sums
    # are associative and overflow-capped identically, so every z, p
    # and BH rank is bit-identical (oracle-checked).
    cells = (
        j.groupBy("seg", "prio")
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("__cn"),
            F.sum(v).alias("__cs"),
            F.sum(v * v).alias("__css"),
        )
        .localCheckpoint(eager=True)  # cell-grain reduction; 3 independent consumers
    )
    per = (
        cells.groupBy(F.concat(F.lit("seg:"), F.col("seg")).alias("test_id"))
        .agg(
            F.sum("__cn").cast("decimal(38,0)").alias("__ng"),
            F.sum("__cs").alias("__sg"),
            F.sum("__css").alias("__ssg"),
        )
        .unionByName(
            cells.groupBy(F.concat(F.lit("prio:"), F.col("prio")).alias("test_id")).agg(
                F.sum("__cn").cast("decimal(38,0)").alias("__ng"),
                F.sum("__cs").alias("__sg"),
                F.sum("__css").alias("__ssg"),
            )
        )
    )
    tot = cells.agg(
        F.sum("__cn").cast("decimal(38,0)").alias("__n"),
        F.sum("__cs").alias("__s"),
        F.sum("__css").alias("__ss"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    calc = per.crossJoin(F.broadcast(tot)).select(
        "test_id",
        d("__ng").alias("ngd"),
        d("__sg").alias("sgd"),
        d("__ssg").alias("ssgd"),
        (F.col("__n") - F.col("__ng")).cast("double").alias("nrd"),
        (F.col("__s") - F.col("__sg")).cast("double").alias("srd"),
        (F.col("__ss") - F.col("__ssg")).cast("double").alias("ssrd"),
    )
    ngd, sgd, ssgd = F.col("ngd"), F.col("sgd"), F.col("ssgd")
    nrd, srd, ssrd = F.col("nrd"), F.col("srd"), F.col("ssrd")
    z = (sgd / ngd - srd / nrd) / F.sqrt(
        ((ssgd - sgd * sgd / ngd) / (ngd - F.lit(1.0))) / ngd
        + ((ssrd - srd * srd / nrd) / (nrd - F.lit(1.0))) / nrd
    )
    tests = (
        calc.select(
            "test_id",
            F.when(
                (ngd > F.lit(1.0)) & (nrd > F.lit(1.0)),
                F.round(F.lit(2.0) * experiment.normal_sf_approx(F.abs(z)), 6),
            ).alias("p"),
        )
        .filter(F.col("p").isNotNull())
    )
    return experiment.fdr_bh(tests, "test_id", "p", q=0.10)


_FDR_BH_SQL = """
WITH j AS (
    SELECT c_mktsegment AS seg, o_orderpriority AS prio,
           CAST(round(o_totalprice * 100) AS DECIMAL(18,0)) AS v
    FROM orders JOIN customer ON o_custkey = c_custkey
), st AS (
    SELECT 'seg:' || seg AS test_id, v FROM j
    UNION ALL
    SELECT 'prio:' || prio AS test_id, v FROM j
), per AS (
    SELECT test_id, count(*) AS ng, sum(v) AS sg, sum(v * v) AS ssg
    FROM st GROUP BY 1
), tot AS (
    SELECT count(*) AS n, sum(v) AS s, sum(v * v) AS ss FROM j
), calc AS (
    SELECT test_id,
           CAST(ng AS DOUBLE) AS ngd, CAST(sg AS DOUBLE) AS sgd, CAST(ssg AS DOUBLE) AS ssgd,
           CAST(n - ng AS DOUBLE) AS nrd, CAST(s - sg AS DOUBLE) AS srd, CAST(ss - ssg AS DOUBLE) AS ssrd
    FROM per CROSS JOIN tot
), zt AS (
    SELECT test_id,
           (sgd / ngd - srd / nrd) /
           sqrt(((ssgd - sgd * sgd / ngd) / (ngd - 1.0)) / ngd
                + ((ssrd - srd * srd / nrd) / (nrd - 1.0)) / nrd) AS z
    FROM calc WHERE ngd > 1.0 AND nrd > 1.0
), pt AS (
    SELECT test_id, round(2.0 * {NORMAL_SF}, 6) AS p FROM zt
), ranked AS (
    SELECT test_id, p,
           row_number() OVER (ORDER BY p, test_id) AS rank,
           count(*) OVER () AS m
    FROM pt WHERE p IS NOT NULL
), flagged AS (
    SELECT *, 0.1 * CAST(rank AS DOUBLE) / CAST(m AS DOUBLE) AS thr FROM ranked
), k AS (
    SELECT coalesce(max(CASE WHEN p <= thr THEN rank END), 0) AS k FROM flagged
)
SELECT test_id, p, CAST(rank AS BIGINT) AS rank,
       round(thr, 6) AS bh_threshold, rank <= k AS rejected
FROM flagged CROSS JOIN k
"""

# the A&S normal tail is rendered from the SAME helper the Spark column
# expression uses, so the two expression trees stay textually parallel
_FDR_BH_SQL = _FDR_BH_SQL.replace(
    "{NORMAL_SF}", experiment.render_normal_sf_sql("abs(z)")
)


def _mde_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment sizing screen (experiment.minimum_detectable_effect):
    per event_type, the minimum detectable effect (cents) of a 50/50
    test sized like the observed group at alpha 0.05 / power 0.8. One
    exact-decimal-moment aggregate; variance and MDE are shared
    float expressions at the 6dp audit grain."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return experiment.minimum_detectable_effect(
        ev, ["event_type"], F.round(F.col("value") * 100)
    )


_MDE_POWER_SQL = """
WITH b AS (
    SELECT event_type, CAST(round(value * 100) AS DECIMAL(18,0)) AS v
    FROM events WHERE value IS NOT NULL
), m AS (
    SELECT event_type, count(*) AS n, sum(v) AS s, sum(v * v) AS ss
    FROM b GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CASE WHEN n > 1 THEN round(
           (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
           / (CAST(n AS DOUBLE) - 1.0), 6) END AS variance,
       CASE WHEN n > 1 THEN round(2.801585 * sqrt(2.0 *
           ((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
            / (CAST(n AS DOUBLE) - 1.0)) / (CAST(n AS DOUBLE) / 2.0)), 6) END AS mde
FROM m
"""


def _conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-band honesty audit (timeseries.conformal_residual_
    interval): per event_type, split-conformal quantile of lag-1
    residuals calibrated before 2024-01-22 and coverage on the
    held-out tail. Exact integer order-statistic pick (never an
    interpolated percentile); ONE shared coverage division."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return timeseries.conformal_residual_interval(
        ev, "event_type", "ts", F.round(F.col("value") * 100), "2024-01-22", alpha=0.1
    )


_CONFORMAL_SQL = """
WITH daily AS (
    SELECT event_type AS k, CAST(ts AS DATE) AS d,
           sum(CAST(round(value * 100) AS BIGINT)) AS y
    FROM events WHERE value IS NOT NULL GROUP BY 1, 2
), resid AS (
    SELECT k, d,
           abs(y - lag(y) OVER (PARTITION BY k ORDER BY d)) AS r
    FROM daily
    QUALIFY lag(y) OVER (PARTITION BY k ORDER BY d) IS NOT NULL
), cal AS (
    SELECT * FROM resid WHERE d < DATE '2024-01-22'
), rankedc AS (
    SELECT k, r, row_number() OVER (PARTITION BY k ORDER BY r, d) AS rn FROM cal
), nc AS (
    SELECT k, cast(count(*) AS BIGINT) AS n_cal FROM cal GROUP BY 1
), pick AS (
    SELECT k, n_cal,
           least(n_cal, n_cal + 1 - ((n_cal + 1) * 100) // 1000) AS p
    FROM nc
), q AS (
    SELECT rankedc.k, n_cal, CAST(r AS BIGINT) AS q_cents
    FROM rankedc JOIN pick ON rankedc.k = pick.k AND rankedc.rn = pick.p
), test AS (
    SELECT * FROM resid WHERE d >= DATE '2024-01-22'
)
SELECT q.k AS event_type, n_cal, q_cents,
       cast(count(*) AS BIGINT) AS n_test,
       cast(sum(CASE WHEN test.r <= q_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
       CAST(sum(CASE WHEN test.r <= q_cents THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS coverage
FROM test JOIN q ON test.k = q.k
GROUP BY 1, 2, 3
"""


def _propensity_strata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confounding-adjusted promo readout
    (experiment.stratified_matching_readout): parts stratified into
    retail-price deciles (exact two-phase ntile over the DIMENSION,
    broadcast to facts), each stratum reporting treated/control line
    counts and the within-stratum revenue mean difference. Stratum
    grain on purpose — the ATT roll-up is a 10-float weighted sum
    whose accumulation order neither engine pins."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return experiment.stratified_matching_readout(
        li,
        part,
        "l_partkey",
        "p_partkey",
        F.col("p_type") == "PROMO",
        F.round(F.col("p_retailprice") * 100),
        F.round(F.col("l_extendedprice") * 100),
        n_strata=10,
    )


_PROPENSITY_SQL = """
WITH d AS (
    SELECT p_partkey AS dk, CAST(round(p_retailprice * 100) AS BIGINT) AS cov,
           p_type = 'PROMO' AS treat
    FROM part
), s AS (
    SELECT dk, treat, CAST(ntile(10) OVER (ORDER BY cov, dk) AS INTEGER) AS stratum FROM d
), f AS (
    SELECT l_partkey AS dk, CAST(round(l_extendedprice * 100) AS BIGINT) AS y
    FROM lineitem
), j AS (
    SELECT stratum, treat, y FROM f JOIN s USING (dk)
), c AS (
    SELECT stratum,
           cast(sum(CASE WHEN treat THEN 1 ELSE 0 END) AS BIGINT) AS n_treated,
           cast(sum(CASE WHEN NOT treat THEN 1 ELSE 0 END) AS BIGINT) AS n_control,
           cast(coalesce(sum(CASE WHEN treat THEN y END), 0) AS BIGINT) AS st,
           cast(coalesce(sum(CASE WHEN NOT treat THEN y END), 0) AS BIGINT) AS sc
    FROM j GROUP BY 1
)
SELECT stratum, n_treated, n_control,
       CASE WHEN n_treated > 0 AND n_control > 0
            THEN CAST(st AS DOUBLE) / CAST(n_treated AS DOUBLE)
                 - CAST(sc AS DOUBLE) / CAST(n_control AS DOUBLE)
       END AS mean_diff
FROM c
"""


def _acf_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality fingerprint (timeseries.acf_table): per event_type,
    Pearson autocorrelation of the day-grain cents series at lags
    1..7. Unit scan reduces once to (key, day) exact totals; a 7-row
    lag spine cross-joins and the shifted series arrives by an
    equi-join on day+lag; exact decimal moments per (key, lag), one
    guarded shared expression, round-6."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return timeseries.acf_table(
        ev, "event_type", "ts", F.round(F.col("value") * 100), max_lag=7
    )


_ACF_TABLE_SQL = """
WITH daily AS (
    SELECT event_type AS k, CAST(ts AS DATE) AS d,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DECIMAL(18,0)) AS y
    FROM events WHERE value IS NOT NULL GROUP BY 1, 2
), spine AS (
    SELECT unnest(generate_series(1, 7)) AS lag
), pairs AS (
    SELECT a.k, spine.lag, a.y AS y1, b.y AS y2
    FROM daily a CROSS JOIN spine
    JOIN daily b ON a.k = b.k AND b.d = a.d + CAST(spine.lag AS INTEGER)
), m AS (
    SELECT k, lag, count(*) AS n, sum(y1) AS sx, sum(y2) AS sy,
           sum(y1 * y1) AS sxx, sum(y1 * y2) AS sxy, sum(y2 * y2) AS syy
    FROM pairs GROUP BY 1, 2
)
SELECT k AS event_type, CAST(lag AS INTEGER) AS lag, CAST(n AS BIGINT) AS n_pairs,
       CASE WHEN n >= 3 AND
                 (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0.0
            THEN round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                              * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
       END AS acf
FROM m
"""


def _qq_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-quantile drift (quality.qq_drift): the nine exact
    decile order statistics of order totals pre- vs post-1998, side by
    side with ratios — where in the distribution the shift lives.
    Exact integer cut positions (floor division), two-phase per-period
    ranks (two giant keys by construction), one shared ratio
    division."""
    o = load_table(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"), "pre")
        .otherwise("post")
        .alias("period"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderkey",
    )
    return quality.qq_drift(o, "cents", "o_orderkey", "period", "pre", "post", n_q=9)


_QQ_DRIFT_SQL = """
WITH base AS (
    SELECT CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 'pre' ELSE 'post' END AS p,
           CAST(round(o_totalprice * 100) AS BIGINT) AS v,
           o_orderkey AS id
    FROM orders
), ranked AS (
    SELECT p, v, row_number() OVER (PARTITION BY p ORDER BY v, id) AS r,
           count(*) OVER (PARTITION BY p) AS n
    FROM base
), cut AS (
    SELECT p, CAST(q AS INTEGER) AS q, v AS cutv
    FROM ranked CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS q) s
    WHERE r = 1 + ((n - 1) * q) // 10
)
SELECT pre.q AS q, pre.cutv AS v_pre, post.cutv AS v_post,
       CASE WHEN pre.cutv <> 0
            THEN round(CAST(post.cutv AS DOUBLE) / CAST(pre.cutv AS DOUBLE), 6)
       END AS qq_ratio
FROM (SELECT q, cutv FROM cut WHERE p = 'pre') pre
JOIN (SELECT q, cutv FROM cut WHERE p = 'post') post USING (q)
"""


def _poisson_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrival-model screen (quality.poisson_dispersion): order
    basket-size histogram vs the Poisson(lambda-hat) expectation with
    the dispersion index. Exact decimal moments; expected counts one
    shared float expression (factorial exact int64, fail-stop past
    k=20)."""
    li = load_table(spark, sf_dir, "lineitem")
    cnt = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("basket_k"))
    return quality.poisson_dispersion(cnt, "basket_k")


_POISSON_FIT_SQL = """
WITH c AS (
    SELECT count(*) AS k FROM lineitem GROUP BY l_orderkey
), m AS (
    SELECT count(*) AS n, sum(k) AS s, sum(k * k) AS ss FROM c
), h AS (
    SELECT k, cast(count(*) AS BIGINT) AS observed FROM c GROUP BY 1
)
SELECT CAST(k AS BIGINT) AS k, observed,
       round(CAST(n AS DOUBLE) * exp(-(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
             * pow(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), CAST(k AS DOUBLE))
             / CAST(factorial(CAST(k AS INTEGER)) AS DOUBLE), 6) AS expected,
       round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS lambda_hat,
       CASE WHEN n > 1 AND CAST(s AS DOUBLE) / CAST(n AS DOUBLE) > 0
            THEN round((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                       / (CAST(n AS DOUBLE) - 1.0)
                       / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 6) END AS dispersion
FROM h CROSS JOIN m
"""


def _interarrival_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrival-process screen (timeseries.interarrival_fit): per
    event_type mean gap and CV of successive inter-arrival times
    (CV ~ 1 = memoryless) — the poisson_fit companion at the process
    grain. Exact int64 microsecond gaps via two-phase per-key ranks +
    a (key, rank-1) self-join of the pinned ranked relation."""
    ev = load_table(spark, sf_dir, "events")
    return timeseries.interarrival_fit(ev, "event_type", "ts", "event_id")


_INTERARRIVAL_SQL = """
WITH b AS (
    SELECT event_type AS k, epoch_us(ts) AS m, event_id AS id FROM events
), r AS (
    SELECT k, m, row_number() OVER (PARTITION BY k ORDER BY m, id) AS rn FROM b
), g AS (
    SELECT a.k, a.m - p.m AS gap
    FROM r a JOIN r p ON a.k = p.k AND a.rn = p.rn + 1
), mm AS (
    -- widen before the square (the Spark side squares decimal(18,0)
    -- into decimal(37,0)): multi-hour gaps in microseconds overflow
    -- INT64 squared, and DuckDB's DECIMAL(18) product does not
    -- auto-widen — HUGEINT is its exact 128-bit grain
    SELECT k, count(*) AS n, sum(gap) AS s,
           sum(CAST(gap AS HUGEINT) * CAST(gap AS HUGEINT)) AS ss
    FROM g GROUP BY 1
)
SELECT k AS event_type, CAST(n AS BIGINT) AS n_gaps,
       round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0, 6) AS mean_gap_s,
       CASE WHEN n > 1 AND s > 0.0 THEN
           round(sqrt(greatest((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                               / (CAST(n AS DOUBLE) - 1.0), 0.0))
                 / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 6)
       END AS cv
FROM mm
"""


def _temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture designer (corpus.temperature_mix_weights):
    per-source sampling weights at temperature alpha = 0.3 (natural
    share ^ alpha, normalized) with the low-resource boost factor.
    Exact integer token counts; floats at the char_entropy round-6
    precedent over the ~|sources| relation."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.temperature_mix_weights(docs, "text", "source", alpha=0.3)


_TEMPERATURE_MIX_SQL = r"""
WITH t AS (
    SELECT source,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tok
    FROM documents
), srcs AS (
    SELECT source, cast(count(*) AS BIGINT) AS n_docs,
           cast(sum(n_tok) AS BIGINT) AS n_tokens
    FROM t GROUP BY 1
), tot AS (
    SELECT cast(sum(n_tokens) AS BIGINT) AS tt FROM srcs
), staged AS (
    SELECT source, n_docs, n_tokens,
           CAST(n_tokens AS DOUBLE) / CAST(tt AS DOUBLE) AS p,
           CAST(floor(pow(CAST(n_tokens AS DOUBLE) / CAST(tt AS DOUBLE), 0.3)
                      * 1e15) AS HUGEINT) AS paq
    FROM srcs CROSS JOIN tot
), dn AS (
    SELECT sum(paq) AS d FROM staged
)
SELECT source, n_docs, n_tokens,
       round(p, 6) AS natural_share,
       round(CAST(paq AS DOUBLE) / CAST(d AS DOUBLE), 6) AS sample_weight,
       CASE WHEN p > 0
            THEN round((CAST(paq AS DOUBLE) / CAST(d AS DOUBLE)) / p, 6) END AS boost
FROM staged CROSS JOIN dn
"""


def _lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue distribution table (aggregates.lorenz_deciles):
    customers ranked by order-total cents into exact deciles with
    cumulative revenue share — where the revenue_gini skew lives.
    Two-phase rank + exact ntile; cumulative via a bounded triangular
    self-join on the 10-row bucket relation, never a global window."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    return aggregates.lorenz_deciles(o, "o_custkey", F.col("cents"), n_buckets=10)


_LORENZ_SQL = """
WITH per AS (
    SELECT o_custkey AS id, sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS t
    FROM orders GROUP BY 1
), ranked AS (
    SELECT t, ntile(10) OVER (ORDER BY t, id) AS decile FROM per
), dec AS (
    SELECT CAST(decile AS INTEGER) AS decile,
           cast(count(*) AS BIGINT) AS n_units,
           cast(sum(t) AS BIGINT) AS decile_value
    FROM ranked GROUP BY 1
), tot AS (SELECT cast(sum(decile_value) AS BIGINT) AS tt FROM dec),
cum AS (
    SELECT a.decile, a.n_units, a.decile_value,
           cast(sum(b.decile_value) AS BIGINT) AS cum_value
    FROM dec a JOIN dec b ON b.decile <= a.decile
    GROUP BY 1, 2, 3
)
SELECT decile, n_units, decile_value, cum_value,
       CASE WHEN tt <> 0
            THEN round(CAST(cum_value AS DOUBLE) / CAST(tt AS DOUBLE), 6)
       END AS cum_share
FROM cum CROSS JOIN tot
"""


def _market_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation supplier concentration (aggregates.market_
    concentration): HHI of supplier line revenue + effective supplier
    count. Two stacked exact aggregates; one shared division."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    f = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .select(F.col("n_name").alias("nation"), "l_suppkey", "l_extendedprice")
    )
    return aggregates.market_concentration(
        f, ["nation"], "l_suppkey", F.round(F.col("l_extendedprice") * 100)
    )


_MARKET_HHI_SQL = """
WITH f AS (
    SELECT n_name AS nation, l_suppkey AS sel,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS v
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
), ps AS (
    SELECT nation, sel, CAST(sum(v) AS DECIMAL(18,0)) AS s FROM f GROUP BY 1, 2
), g AS (
    SELECT nation, cast(count(*) AS BIGINT) AS n_sellers,
           sum(s) AS tot,
           sum(CAST(s AS HUGEINT) * CAST(s AS HUGEINT)) AS ss2
    FROM ps GROUP BY 1
)
SELECT nation, n_sellers, CAST(tot AS BIGINT) AS total_value,
       CASE WHEN CAST(tot AS DOUBLE) > 0.0
            THEN round(CAST(ss2 AS DOUBLE) / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)), 6)
       END AS hhi,
       CASE WHEN CAST(tot AS DOUBLE) > 0.0 AND ss2 > 0
            THEN round((CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)) / CAST(ss2 AS DOUBLE), 6)
       END AS effective_sellers
FROM g
"""


def _nb_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overdispersion follow-up (quality.negative_binomial_fit): NB
    method-of-moments r/p over order basket sizes — the model to
    reach for when poisson_fit's dispersion exceeds 1. Exact decimal
    moments; NULL fit when var <= mean."""
    li = load_table(spark, sf_dir, "lineitem")
    cnt = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("basket_k"))
    return quality.negative_binomial_fit(cnt, "basket_k")


_NB_FIT_SQL = """
WITH c AS (
    SELECT count(*) AS k FROM lineitem GROUP BY l_orderkey
), m AS (
    SELECT count(*) AS n, sum(k) AS s,
           sum(CAST(k AS HUGEINT) * CAST(k AS HUGEINT)) AS ss
    FROM c
)
SELECT CAST(n AS BIGINT) AS n,
       round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean,
       CASE WHEN n > 1 THEN round(
           (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
           / (CAST(n AS DOUBLE) - 1.0), 6) END AS variance,
       CASE WHEN n > 1 AND
                 (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(n AS DOUBLE) - 1.0) > CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
            THEN round((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                       / ((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                          / (CAST(n AS DOUBLE) - 1.0) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 6)
       END AS r_hat,
       CASE WHEN n > 1 AND
                 (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(n AS DOUBLE) - 1.0) > CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
            THEN round((CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                       / ((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                          / (CAST(n AS DOUBLE) - 1.0)), 6)
       END AS p_hat
FROM m
"""


def _spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotone association (aggregates.spearman_exact): Spearman rho
    between order total and the customer's account balance — exact
    tie-averaged doubled midranks via two-phase running sums over the
    distinct-value grain (the mann_whitney trick), decimal moments,
    ONE shared guarded float expression."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    return aggregates.spearman_exact(
        j,
        F.round(F.col("o_totalprice") * 100),
        F.round(F.col("c_acctbal") * 100),
    )


_SPEARMAN_SQL = """
WITH b AS (
    SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS x,
           CAST(round(c_acctbal * 100) AS BIGINT) AS y
    FROM orders JOIN customer ON o_custkey = c_custkey
), vx AS (SELECT x, count(*) AS c FROM b GROUP BY 1),
cx AS (SELECT x, c, sum(c) OVER (ORDER BY x) AS cum FROM vx),
mx AS (SELECT x, 2 * (cum - c) + c + 1 AS mrx FROM cx),
vy AS (SELECT y, count(*) AS c FROM b GROUP BY 1),
cy AS (SELECT y, c, sum(c) OVER (ORDER BY y) AS cum FROM vy),
my AS (SELECT y, 2 * (cum - c) + c + 1 AS mry FROM cy),
j AS (SELECT mrx, mry FROM b JOIN mx USING (x) JOIN my USING (y)),
m AS (
    SELECT count(*) AS n,
           sum(CAST(mrx AS HUGEINT)) AS sx, sum(CAST(mry AS HUGEINT)) AS sy,
           sum(CAST(mrx AS HUGEINT) * CAST(mrx AS HUGEINT)) AS sxx,
           sum(CAST(mrx AS HUGEINT) * CAST(mry AS HUGEINT)) AS sxy,
           sum(CAST(mry AS HUGEINT) * CAST(mry AS HUGEINT)) AS syy
    FROM j
)
SELECT CAST(n AS BIGINT) AS n,
       CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0.0
            THEN round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                              * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
       END AS spearman_rho
FROM m
"""


def _cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized association (quality.cramers_v): Cramér's V between
    lang and source over documents — the [0,1]-comparable companion
    to mutual_information, same stats-join plan skeleton."""
    docs = load_table(spark, sf_dir, "documents")
    return quality.cramers_v(docs, "lang", "source")


_CRAMERS_V_SQL = """
WITH cells AS (
    SELECT lang, source, cast(count(*) AS BIGINT) AS c
    FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
    GROUP BY 1, 2
), rt AS (SELECT lang, sum(c) AS rt FROM cells GROUP BY 1),
ct AS (SELECT source, sum(c) AS ct FROM cells GROUP BY 1),
tot AS (SELECT sum(c) AS n FROM cells),
lv AS (SELECT (SELECT cast(count(*) AS BIGINT) FROM rt) AS rx,
              (SELECT cast(count(*) AS BIGINT) FROM ct) AS cy),
t AS (
    SELECT c, rt, ct, n FROM cells
    JOIN rt USING (lang) JOIN ct USING (source) CROSS JOIN tot
), a AS (
    -- empty cells carry (0-e)^2/e = e; their total is n - sum_obs(e)
    SELECT cast(max(n) AS BIGINT) AS n,
           round(sum((CAST(c AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
                     * (CAST(c AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
                     / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)))
                 + (CAST(max(n) AS DOUBLE)
                    - sum(CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))), 6) AS chi2
    FROM t
)
SELECT n, rx AS n_x_levels, cy AS n_y_levels, chi2,
       CASE WHEN rx > 1 AND cy > 1
            THEN round(sqrt(chi2 / (CAST(n AS DOUBLE) * CAST(least(rx - 1, cy - 1) AS DOUBLE))), 6)
       END AS cramers_v
FROM a CROSS JOIN lv
"""


def _cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chance-corrected classifier agreement (quality.cohens_kappa):
    kappa of the stopword-argmax lang-ID prediction against the
    labeled lang column — the honest accuracy for a skewed label mix.
    Diagonal and expected-agreement numerators are exact decimal
    integers; two divisions and the kappa ratio are the only
    floats."""
    docs = load_table(spark, sf_dir, "documents")
    pred = docs.select(
        F.col("lang"), text.language_id("text").alias("lang_pred")
    )
    return quality.cohens_kappa(pred, "lang", "lang_pred")


def _cohens_kappa_sql() -> str:
    # compose the lang_id template with the label as the passthrough
    # column (no textual surgery — the template is parameterized)
    pred_with_label = _lang_id_sql(select_cols=("lang",)).strip()
    return f"""
WITH pred AS ({pred_with_label}),
cells AS (
    SELECT lang, lang_pred, cast(count(*) AS BIGINT) AS c
    FROM pred WHERE lang IS NOT NULL AND lang_pred IS NOT NULL
    GROUP BY 1, 2
), ra AS (SELECT lang AS k, sum(c) AS ra FROM cells GROUP BY 1),
cb AS (SELECT lang_pred AS k, sum(c) AS cb FROM cells GROUP BY 1),
n AS (SELECT sum(c) AS n FROM cells),
diag AS (SELECT coalesce(sum(c), 0) AS d FROM cells WHERE lang = lang_pred),
pe AS (SELECT coalesce(sum(ra * cb), 0) AS pe_num FROM ra JOIN cb USING (k))
SELECT CAST(n AS BIGINT) AS n,
       round(CAST(d AS DOUBLE) / CAST(n AS DOUBLE), 6) AS p_observed,
       round(CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS p_expected,
       CASE WHEN CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) < 1.0
            THEN round((CAST(d AS DOUBLE) / CAST(n AS DOUBLE)
                        - CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                       / (1.0 - CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6)
       END AS kappa
FROM n CROSS JOIN diag CROSS JOIN pe
"""


def _ivf_append_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-index WRITE side (similarity.ivf_append): the new
    batch's (vid, cell) assignments under the frozen corpus-trained
    quantizer — the rows appended partition-by-cell onto the at-rest
    IVF layout. Vector column dropped for the oracle hash (arrays are
    unhashable by the driver canonicalizer)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = similarity._centroids(
        emb.filter(F.col("vec_id") % 5 != 0), "embedding", "vec_id", 16
    )
    return similarity.ivf_append(
        emb.filter(F.col("vec_id") % 5 == 0), "embedding", "vec_id", cents
    ).select("vec_id", "cell")


_IVF_APPEND_ASSIGN_SQL = """
WITH e0 AS (SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings),
c AS (
    SELECT row_number() OVER (ORDER BY vid) - 1 AS cell, v AS cv
    FROM e0 WHERE vid % 5 <> 0 ORDER BY vid LIMIT 16
)
SELECT e0.vid AS vec_id, CAST(c.cell AS INTEGER) AS cell
FROM e0 CROSS JOIN c
WHERE e0.vid % 5 = 0
QUALIFY row_number() OVER (PARTITION BY e0.vid
    ORDER BY list_dot_product(e0.v, c.cv) DESC, c.cell) = 1
"""


def _code_switch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-language screen (corpus.code_switch_audit): per doc the
    argmax language, top/runner-up stopword hit counts, and the
    integer 2*second >= top flag — what single-label lang_id silently
    mislabels."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.code_switch_audit(docs, "text", "doc_id")


def _code_switch_sql() -> str:
    hits = []
    for lang, words in text.STOPWORDS.items():
        arr = "[" + ", ".join(f"'{w}'" for w in words) + "]"
        hits.append(
            f"len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), "
            f"t -> list_contains({arr}, t))) AS hits_{lang}"
        )
    langs = list(text.STOPWORDS)
    n = len(langs)
    sort = "list_sort([" + ", ".join(f"hits_{lang}" for lang in langs) + "])"
    case = "CASE "
    for lang in langs:
        case += f"WHEN hits_{lang} = top AND top > 0 THEN '{lang}' "
    case += "ELSE 'und' END"
    return f"""
WITH h AS (SELECT doc_id, {', '.join(hits)} FROM documents),
b AS (SELECT *, {sort}[{n}] AS top, {sort}[{n - 1}] AS second FROM h)
SELECT doc_id, {case} AS lang_top,
       cast(top AS BIGINT) AS hits_top,
       cast(second AS BIGINT) AS hits_second,
       CAST(CASE WHEN top > 0 AND 2 * second >= top THEN 1 ELSE 0 END AS INTEGER)
           AS is_code_switched
FROM b
"""


def _embedding_outlier_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mis-embedded-document screen (similarity.embedding_outlier_audit):
    per-cell distance²-to-own-centroid moments over micro-quantized
    integers, outliers past 3 sigma — cell-grain output."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.embedding_outlier_audit(
        emb, "embedding", "vec_id", n_cells=16, z_thresh=3.0
    )


_EMBEDDING_OUTLIER_SQL = """
WITH e0 AS (SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings),
c AS (
    SELECT row_number() OVER (ORDER BY vid) - 1 AS cell, v AS cv
    FROM e0 ORDER BY vid LIMIT 16
), a AS (
    SELECT e0.vid, c.cell,
           CAST(floor((list_dot_product(e0.v, e0.v)
                       - 2.0 * list_dot_product(e0.v, c.cv)
                       + list_dot_product(c.cv, c.cv)) * 1000000.0) AS BIGINT) AS d2q
    FROM e0 CROSS JOIN c
    QUALIFY row_number() OVER (PARTITION BY e0.vid
        ORDER BY list_dot_product(e0.v, c.cv) DESC, c.cell) = 1
), s AS (
    SELECT cell, cast(count(*) AS BIGINT) AS n, sum(d2q) AS sm,
           sum(CAST(d2q AS HUGEINT) * d2q) AS ss
    FROM a GROUP BY 1
), st AS (
    SELECT cell, n,
           CAST(sm AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
           sqrt((CAST(ss AS DOUBLE)
                 - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) / CAST(n AS DOUBLE))
                / CAST(n AS DOUBLE)) AS std
    FROM s
), o AS (
    SELECT a.cell, cast(count(*) AS BIGINT) AS n_outliers
    FROM a JOIN st USING (cell)
    WHERE st.std > 0 AND CAST(a.d2q AS DOUBLE) - st.mean > 3.0 * st.std
    GROUP BY 1
)
SELECT st.cell, st.n,
       round(st.mean, 6) AS mean_d2_micro,
       round(st.std, 6) AS std_d2_micro,
       cast(coalesce(o.n_outliers, 0) AS BIGINT) AS n_outliers
FROM st LEFT JOIN o USING (cell)
"""


def _filter_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation-filter ablation audit (corpus.filter_overlap_matrix):
    pairwise kill overlap of the four drop-rules, diagonal = per-rule
    totals — what curation_filter's first-rule-wins log cannot show.
    All predicates exact-integer; one scan + bigram reduce."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.filter_overlap_matrix(docs, "text", "doc_id")


def _filter_overlap_sql() -> str:
    lang = _lang_id_sql().strip()
    names = ["short", "quality", "lang", "repeat"]
    pairs = [(a, b) for i, a in enumerate(names) for b in names[i:]]
    selects = "\nUNION ALL\n".join(
        f"SELECT '{a}' AS rule_a, '{b}' AS rule_b, "
        f"cast(sum(CASE WHEN f_{a} AND f_{b} THEN 1 ELSE 0 END) AS BIGINT) AS n_both "
        "FROM flags"
        for a, b in pairs
    )
    return rf"""
WITH lang AS ({lang}),
t AS (
    SELECT doc_id, length(text) AS nc,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
           length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS np,
           string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
    FROM documents
), q AS (
    SELECT doc_id, nc, toks,
           CAST((CASE WHEN nc BETWEEN 50 AND 5000 THEN 1 ELSE 0 END)
              + (CASE WHEN (CASE WHEN nc = 0 THEN 0.0 ELSE np / cast(nc AS DOUBLE) END) < 0.2
                      THEN 1 ELSE 0 END)
              + (CASE WHEN n_tokens > 0 AND nc / cast(n_tokens AS DOUBLE) BETWEEN 3.0 AND 12.0
                      THEN 1 ELSE 0 END) AS INTEGER) AS q3
    FROM t
), g2 AS (
    SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1]
                           FOR i IN generate_series(1, len(toks) - 1)]) AS g
    FROM t
), c2 AS (
    SELECT doc_id, max(c) AS top_n
    FROM (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2) GROUP BY 1
), flags AS (
    SELECT q.doc_id,
           q.nc < 50 AS f_short,
           q.q3 < 2 AS f_quality,
           lang.lang_pred = 'und' AS f_lang,
           coalesce(5 * c2.top_n > greatest(len(q.toks) - 1, 0) AND len(q.toks) >= 2,
                    FALSE) AS f_repeat
    FROM q JOIN lang USING (doc_id) LEFT JOIN c2 USING (doc_id)
)
{selects}
"""


def _curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seedless curriculum schedule (corpus.curriculum_phases): exact
    ntile(3) over the difficulty ordering (quality desc, length asc)
    plus a deterministic md5 within-phase order — phase boundaries and
    batch sequence are a pure function of the corpus. Both ranks
    two-phase; the oracle keeps plain ntile()/row_number()."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.curriculum_phases(docs, "text", "doc_id", n_phases=3)


_CURRICULUM_PHASES_SQL = r"""
WITH t AS (
    SELECT doc_id,
           length(text) AS nc,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
           length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS np
    FROM documents
), q AS (
    SELECT doc_id, cast(n_tokens AS BIGINT) AS n_tokens,
           CAST((CASE WHEN nc BETWEEN 50 AND 5000 THEN 1 ELSE 0 END)
              + (CASE WHEN (CASE WHEN nc = 0 THEN 0.0 ELSE np / cast(nc AS DOUBLE) END) < 0.2
                      THEN 1 ELSE 0 END)
              + (CASE WHEN n_tokens > 0 AND nc / cast(n_tokens AS DOUBLE) BETWEEN 3.0 AND 12.0
                      THEN 1 ELSE 0 END) AS INTEGER) AS quality_x3,
           md5(cast(doc_id AS VARCHAR)) AS h
    FROM t
), r AS (
    SELECT *, CAST(ntile(3) OVER (ORDER BY quality_x3 DESC, n_tokens, doc_id) AS INTEGER) AS phase
    FROM q
)
SELECT doc_id, quality_x3, n_tokens, phase,
       CAST(row_number() OVER (PARTITION BY phase ORDER BY h, doc_id) AS BIGINT) AS pos
FROM r
"""


def _mix_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture epoch plan (corpus.mix_epoch_plan): given the
    temperature-weighted target shares and a total token budget, how
    many PASSES (epochs) over each source the mix implies, capped at
    max_epochs — the repetition-risk planning table (repeating a
    small source past ~4 epochs degrades models; the cap makes the
    shortfall explicit instead of silent)."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.mix_epoch_plan(
        docs, "text", "source", total_tokens=200_000, alpha=0.3, max_epochs=4.0
    )


_MIX_EPOCH_PLAN_SQL = r"""
WITH t AS (
    SELECT source,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tok
    FROM documents
), srcs AS (
    SELECT source, cast(count(*) AS BIGINT) AS n_docs,
           cast(sum(n_tok) AS BIGINT) AS n_tokens
    FROM t GROUP BY 1
), tot AS (
    SELECT cast(sum(n_tokens) AS BIGINT) AS tt FROM srcs
), staged AS (
    SELECT source, n_docs, n_tokens,
           CAST(floor(pow(CAST(n_tokens AS DOUBLE) / CAST(tt AS DOUBLE), 0.3)
                      * 1e15) AS HUGEINT) AS paq
    FROM srcs CROSS JOIN tot
), dn AS (
    SELECT sum(paq) AS d FROM staged
), w AS (
    SELECT source, n_docs, n_tokens,
           CAST(paq AS DOUBLE) / CAST(d AS DOUBLE) AS wt
    FROM staged CROSS JOIN dn
)
SELECT source, n_docs, n_tokens,
       round(wt, 6) AS sample_weight,
       cast(floor(wt * 200000.0) AS BIGINT) AS target_tokens,
       round(least(wt * 200000.0 / n_tokens, 4.0), 6) AS epochs,
       CASE WHEN wt * 200000.0 / n_tokens > 4.0
            THEN cast(floor(wt * 200000.0 - 4.0 * n_tokens) AS BIGINT)
            ELSE 0 END AS shortfall_tokens
FROM w
"""


def _mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversified top-k (similarity.mmr_rerank): greedy MMR over the
    relevance top-50 pool, lam = 0.7 — ten results that are relevant
    AND spread out, vs the plain cosine list's near-duplicates. The
    oracle UNROLLS the k-step greedy as successive 1-row argmax CTEs
    and must reproduce the selection decision for decision."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.mmr_rerank(
        emb, "embedding", "vec_id", _KNN_QUERY_VEC, k=10, pool=50, lam=0.7
    )


def _mmr_rerank_sql(k: int = 10, pool: int = 50, lam: float = 0.7) -> str:
    vec = "[" + ", ".join(str(v) for v in _KNN_QUERY_VEC) + "]"
    lam_s, one_minus = repr(lam), repr(1.0 - lam)
    steps = []
    for i in range(2, k + 1):
        steps.append(f"""
pick{i} AS (
    SELECT p.vid FROM pool p
    WHERE p.vid NOT IN (SELECT vid FROM selu{i - 1})
    ORDER BY {lam_s} * p.rel - {one_minus} * (
        SELECT max(s.s) FROM sims s JOIN selu{i - 1} t ON s.a = p.vid AND s.b = t.vid
    ) DESC, p.vid
    LIMIT 1
),
selu{i} AS MATERIALIZED (SELECT * FROM selu{i - 1} UNION ALL SELECT {i} AS rank, vid FROM pick{i})""".strip())
    body = ",\n".join(steps)
    return f"""
WITH e0 AS (SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings),
pool AS MATERIALIZED (
    SELECT vid, v,
           round(list_dot_product(v, {vec}) /
                 (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product({vec}, {vec}))), 6) AS rel
    FROM e0 ORDER BY rel DESC, vid LIMIT {pool}
),
sims AS MATERIALIZED (
    SELECT a.vid AS a, b.vid AS b,
           round(list_dot_product(a.v, b.v) /
                 (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS s
    FROM pool a JOIN pool b ON a.vid <> b.vid
),
selu1 AS MATERIALIZED (SELECT 1 AS rank, vid FROM pool ORDER BY rel DESC, vid LIMIT 1),
{body}
SELECT t.rank, t.vid AS vec_id, p.rel
FROM selu{k} t JOIN pool p ON t.vid = p.vid
"""


def _dim_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation audit (similarity.dim_truncation_recall):
    recall@10 of prefix-d cosine rankings (d = 8/16/32) against the
    full 64-dim exact top-k over the deterministic query batch — the
    storage/recall trade table for serving truncated embeddings."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.dim_truncation_recall(
        emb, "embedding", "vec_id", dims=(8, 16, 32), query_mod=100, k=10
    )


def _dim_truncation_recall_sql() -> str:
    arms = []
    for d in (8, 16, 32):
        arms.append(f"""
SELECT {d} AS dim, nq.n_queries, h.n_hits,
       round(CAST(h.n_hits AS DOUBLE) / (CAST(nq.n_queries AS DOUBLE) * 10.0), 6) AS mean_recall
FROM (
    SELECT cast(count(*) AS BIGINT) AS n_hits FROM (
        SELECT c.query_id, c.vid FROM cand c
        QUALIFY row_number() OVER (PARTITION BY c.query_id
            ORDER BY round(list_dot_product(c.qv[1:{d}], c.v[1:{d}]) /
                           (sqrt(list_dot_product(c.qv[1:{d}], c.qv[1:{d}])) *
                            sqrt(list_dot_product(c.v[1:{d}], c.v[1:{d}]))), 6) DESC, c.vid) <= 10
    ) t
    JOIN fullk USING (query_id, vid)
) h CROSS JOIN nq
""".strip())
    body = "\nUNION ALL\n".join(arms)
    return f"""
WITH e0 AS (SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vid AS query_id, v AS qv FROM e0 WHERE vid % 100 = 0 AND vid < 50000),
cand AS (SELECT q.query_id, q.qv, e0.vid, e0.v FROM e0 CROSS JOIN q),
fullk AS (
    SELECT c.query_id, c.vid FROM cand c
    QUALIFY row_number() OVER (PARTITION BY c.query_id
        ORDER BY round(list_dot_product(c.qv, c.v) /
                       (sqrt(list_dot_product(c.qv, c.qv)) *
                        sqrt(list_dot_product(c.v, c.v))), 6) DESC, c.vid) <= 10
),
nq AS (SELECT cast(count(*) AS BIGINT) AS n_queries FROM q)
{body}
"""


def _doc_ngram_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc repetition screen (corpus.doc_ngram_repetition): the
    Gopher-family filter for phrase-looped / templated documents —
    top-bigram token-mass and duplicated-5-gram position share, every
    output an exact count or a floor-scaled integer micro-ratio."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.doc_ngram_repetition(docs, "text", "doc_id", n=5)


_DOC_NGRAM_REPETITION_SQL = r"""
WITH t AS (
    SELECT doc_id,
           string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
    FROM documents
), b AS (
    SELECT doc_id, cast(len(toks) AS BIGINT) AS nt FROM t
), g2 AS (
    SELECT doc_id,
           unnest([toks[i] || ' ' || toks[i+1]
                   FOR i IN generate_series(1, len(toks) - 1)]) AS g
    FROM t
), c2 AS (
    SELECT doc_id, max(c) AS top_n
    FROM (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2) GROUP BY 1
), g5 AS (
    SELECT doc_id,
           unnest([array_to_string(toks[i:i+4], ' ')
                   FOR i IN generate_series(1, len(toks) - 4)]) AS g
    FROM t
), c5 AS (
    SELECT doc_id, sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_n
    FROM (SELECT doc_id, g, count(*) AS c FROM g5 GROUP BY 1, 2) GROUP BY 1
)
SELECT b.doc_id,
       b.nt AS n_tokens,
       cast(greatest(b.nt - 1, 0) AS BIGINT) AS n_bigrams,
       cast(coalesce(c2.top_n, 0) AS BIGINT) AS top_bigram_n,
       CASE WHEN b.nt > 0
            THEN cast(floor((1000000.0 * (2 * coalesce(c2.top_n, 0))) / b.nt) AS BIGINT)
            ELSE 0 END AS rep2_micro,
       cast(greatest(b.nt - 4, 0) AS BIGINT) AS n_ngrams,
       cast(coalesce(c5.dup_n, 0) AS BIGINT) AS dup_ngram_n,
       CASE WHEN greatest(b.nt - 4, 0) > 0
            THEN cast(floor((1000000.0 * coalesce(c5.dup_n, 0)) / (b.nt - 4)) AS BIGINT)
            ELSE 0 END AS repn_micro
FROM b LEFT JOIN c2 USING (doc_id) LEFT JOIN c5 USING (doc_id)
"""


def _ivf_cell_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aged-index occupancy audit (similarity.ivf_cell_drift): how the
    appended batch (vec_id % 5 == 0) distributes over the frozen
    corpus-trained cells vs the corpus itself — per-cell counts on an
    explicit 0..15 spine (empty cells are rows), shares and drift as
    round-6 divisions of exact counts."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_cell_drift(
        emb.filter(F.col("vec_id") % 5 != 0),
        emb.filter(F.col("vec_id") % 5 == 0),
        "embedding",
        "vec_id",
        n_cells=16,
    )


_IVF_CELL_DRIFT_SQL = """
WITH e0 AS (SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings),
c AS (
    SELECT row_number() OVER (ORDER BY vid) - 1 AS cell, v AS cv
    FROM e0 WHERE vid % 5 <> 0 ORDER BY vid LIMIT 16
), a AS (
    SELECT e0.vid, c.cell
    FROM e0 CROSS JOIN c
    QUALIFY row_number() OVER (PARTITION BY e0.vid
        ORDER BY list_dot_product(e0.v, c.cv) DESC, c.cell) = 1
), rest AS (
    SELECT cell, cast(count(*) AS BIGINT) AS n_rest FROM a WHERE vid % 5 <> 0 GROUP BY 1
), nw AS (
    SELECT cell, cast(count(*) AS BIGINT) AS n_new FROM a WHERE vid % 5 = 0 GROUP BY 1
), spine AS (SELECT unnest(generate_series(0, 15)) AS cell),
j AS (
    SELECT spine.cell,
           cast(coalesce(rest.n_rest, 0) AS BIGINT) AS n_rest,
           cast(coalesce(nw.n_new, 0) AS BIGINT) AS n_new
    FROM spine LEFT JOIN rest ON spine.cell = rest.cell
               LEFT JOIN nw ON spine.cell = nw.cell
), tots AS (SELECT sum(n_rest) AS tr, sum(n_new) AS tn FROM j)
SELECT j.cell, j.n_rest, j.n_new,
       round(CAST(j.n_rest AS DOUBLE) / CAST(tots.tr AS DOUBLE), 6) AS rest_share,
       CASE WHEN tots.tn > 0
            THEN round(CAST(j.n_new AS DOUBLE) / CAST(tots.tn AS DOUBLE), 6) END AS new_share,
       CASE WHEN tots.tn > 0
            THEN round(CAST(j.n_new AS DOUBLE) / CAST(tots.tn AS DOUBLE)
                       - CAST(j.n_rest AS DOUBLE) / CAST(tots.tr AS DOUBLE), 6) END AS drift
FROM j CROSS JOIN tots
"""


def _trigram_doc_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality score (corpus.trigram_doc_logprob):
    held-out docs (doc_id % 10 == 0) priced under the reference-split
    stupid-backoff trigram LM — avg log-score per trigram, the
    curation filter that drops gibberish. Every score is one ln on an
    exact int64-count rational, floor-scaled to micro-units BEFORE the
    per-doc sum (dsir discipline), so the oracle replays it digit for
    digit."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.trigram_doc_logprob(docs, "text", "doc_id", holdout_mod=10)


_TRIGRAM_LOGPROB_SQL = r"""
WITH t AS (
    SELECT doc_id,
           string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
    FROM documents
), g AS (
    SELECT doc_id,
           unnest([{t3: toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2],
                    t2p: toks[i] || ' ' || toks[i+1],
                    t2: toks[i+1] || ' ' || toks[i+2],
                    t1p: toks[i+1],
                    t1: toks[i+2]}
                   FOR i IN generate_series(1, len(toks) - 2)], recursive := true)
    FROM t
), ref AS (SELECT * FROM g WHERE doc_id % 10 <> 0),
   m3 AS (SELECT t3, cast(count(*) AS BIGINT) AS c3 FROM ref GROUP BY 1),
   m2p AS (SELECT t2p, cast(count(*) AS BIGINT) AS c2p FROM ref GROUP BY 1),
   m2 AS (SELECT t2, cast(count(*) AS BIGINT) AS c2 FROM ref GROUP BY 1),
   m1p AS (SELECT t1p, cast(count(*) AS BIGINT) AS c1p FROM ref GROUP BY 1),
   m1 AS (SELECT t1, cast(count(*) AS BIGINT) AS c1 FROM ref GROUP BY 1),
   nn AS (SELECT cast(count(*) AS BIGINT) AS n FROM ref),
   s AS (
    SELECT g.doc_id,
           CASE WHEN m3.c3 IS NOT NULL THEN
                    CAST(floor(ln(CAST(m3.c3 AS DOUBLE) / CAST(m2p.c2p AS DOUBLE)) * 1000000.0) AS BIGINT)
                WHEN m2.c2 IS NOT NULL THEN
                    CAST(floor(ln((2.0 * m2.c2) / (5.0 * m1p.c1p)) * 1000000.0) AS BIGINT)
                WHEN m1.c1 IS NOT NULL THEN
                    CAST(floor(ln((4.0 * m1.c1) / (25.0 * nn.n)) * 1000000.0) AS BIGINT)
                ELSE CAST(floor(ln(4.0 / (25.0 * (nn.n + 1.0))) * 1000000.0) AS BIGINT)
           END AS s
    FROM g
    LEFT JOIN m3 ON g.t3 = m3.t3
    LEFT JOIN m2p ON g.t2p = m2p.t2p
    LEFT JOIN m2 ON g.t2 = m2.t2
    LEFT JOIN m1p ON g.t1p = m1p.t1p
    LEFT JOIN m1 ON g.t1 = m1.t1
    CROSS JOIN nn
    WHERE g.doc_id % 10 = 0
)
SELECT doc_id,
       cast(count(*) AS BIGINT) AS n_tri,
       cast(sum(s) AS BIGINT) AS logprob_micro,
       cast(floor(CAST(sum(s) AS DOUBLE) / count(*)) AS BIGINT) AS avg_logprob_micro
FROM s GROUP BY 1
"""


def _token_budget_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingestion curation (corpus.token_budget_select_incremental):
    the at-rest corpus (doc_id % 7 != 0) was selected under the 3000-token
    budget in a previous run; a new batch (doc_id % 7 == 0) folds into the
    selection by gating on the per-source cutoff and re-ranking only
    (prior_selected ∪ surviving batch) — the at-rest corpus is never
    re-read. The ORACLE is the FULL-UNION greedy SQL: by the
    cutoff-carrying prefix rule the incremental fold must equal the full
    recompute exactly, so the differential check proves the exactness on
    real data every round (the cutoff-free fold is NOT exact — see the
    operator docstring's r12-advice counterexample)."""
    docs = load_table(spark, sf_dir, "documents")
    at_rest = docs.filter(F.col("doc_id") % 7 != 0)
    batch = docs.filter(F.col("doc_id") % 7 == 0)
    # the prior selection+cutoff ARE the at-rest relations in production
    # — they materialize once per corpus identity (pair_graph warehouse
    # discipline) so steady-state epochs pay only the fold
    prior = pair_graph._materialized(
        spark,
        sf_dir,
        "token_budget_prior",
        "mod7_b3000",
        lambda: corpus.token_budget_select(at_rest, "text", "doc_id", "source", 3000),
    )
    prior_cut = pair_graph._materialized(
        spark,
        sf_dir,
        "token_budget_prior_cut",
        "mod7_b3000",
        lambda: corpus.token_budget_cutoff(at_rest, "text", "doc_id", "source", 3000),
    )
    return corpus.token_budget_select_incremental(
        prior, batch, "text", "doc_id", "source", 3000, prior_cut
    )


def _ivf_incremental_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aged-index ANN audit (similarity.ivf_incremental_recall): the
    coarse quantizer is frozen from the at-rest corpus (vec_id % 5 != 0,
    16 lowest-id vectors), the batch (vec_id % 5 == 0) is appended via
    ivf_append, and recall@10 of the 4-cell probe is measured per query
    on the GROWN corpus (queries vec_id % 100 == 0 — all of them new
    vectors, the realistic fresh-queries-on-aged-index read). The oracle
    replays the stale-centroid schedule and both top-k arms."""
    emb = load_table(spark, sf_dir, "embeddings")
    at_rest = emb.filter(F.col("vec_id") % 5 != 0)
    batch = emb.filter(F.col("vec_id") % 5 == 0)
    return similarity.ivf_incremental_recall(
        at_rest, batch, "embedding", "vec_id", query_mod=100, k=10, n_cells=16, n_probe=4
    )


def _ivf_retrain_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """When-to-retrain as one oracle-checked plan
    (similarity.ivf_retrain_plan, the repair_run detect→act→verify
    precedent): exact-integer TVD of batch-vs-corpus cell occupancy
    under the frozen quantizer PLUS aged-index recall over the capped
    query batch decide retrain; on retrain the quantizer is rebuilt
    with the batch convention (_centroids over the grown corpus — what
    ivf_top_k would freeze, pinned by the law test) and the fresh
    model's recall is audited on the same queries. Thresholds chosen
    so the recall arm TRIPS at the test SFs (aged 4-of-16 probe recall
    sits below 0.95) — the retrain arm is exercised, not dead code."""
    emb = load_table(spark, sf_dir, "embeddings")
    at_rest = emb.filter(F.col("vec_id") % 5 != 0)
    batch = emb.filter(F.col("vec_id") % 5 == 0)
    return similarity.ivf_retrain_plan(
        at_rest,
        batch,
        "embedding",
        "vec_id",
        n_cells=16,
        n_probe=4,
        k=10,
        query_mod=100,
        query_cap=500,
        drift_thresh_micro=100_000,
        recall_thresh_micro=950_000,
    )


def _ivf_retrain_sql(
    drift_thresh_micro: int = 100_000, recall_thresh_micro: int = 950_000, k: int = 10
) -> str:
    # one recall arm per quantizer: identical schedule, different
    # centroid CTE (cs = stale 16 lowest corpus ids; cf = fresh 16
    # lowest union ids)
    def arm(cents: str, tag: str) -> str:
        return f"""
a{tag} AS (
    SELECT e0.vid, e0.v, {cents}.cell
    FROM e0 CROSS JOIN {cents}
    QUALIFY row_number() OVER (PARTITION BY e0.vid
        ORDER BY list_dot_product(e0.v, {cents}.cv) DESC, {cents}.cell) = 1
), probe{tag} AS (
    SELECT q.query_id, q.qv, {cents}.cell
    FROM q CROSS JOIN {cents}
    QUALIFY row_number() OVER (PARTITION BY q.query_id
        ORDER BY list_dot_product(q.qv, {cents}.cv) DESC, {cents}.cell) <= 4
), ivf{tag} AS (
    SELECT probe{tag}.query_id, a{tag}.vid
    FROM probe{tag} JOIN a{tag} USING (cell)
    QUALIFY row_number() OVER (PARTITION BY probe{tag}.query_id
        ORDER BY round(list_dot_product(probe{tag}.qv, a{tag}.v) /
                       (sqrt(list_dot_product(probe{tag}.qv, probe{tag}.qv)) *
                        sqrt(list_dot_product(a{tag}.v, a{tag}.v))), 6) DESC, a{tag}.vid) <= {k}
), h{tag} AS (
    SELECT ivf{tag}.query_id, count(*) AS n_hits
    FROM ivf{tag} JOIN brute ON ivf{tag}.query_id = brute.query_id AND ivf{tag}.vid = brute.vid
    GROUP BY 1
), r{tag} AS (
    SELECT cast(coalesce(sum(h{tag}.n_hits), 0) AS BIGINT) AS hits,
           cast(count(*) AS BIGINT) AS nq
    FROM q LEFT JOIN h{tag} USING (query_id)
)"""

    return f"""
WITH e0 AS (SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings),
cs AS (
    SELECT row_number() OVER (ORDER BY vid) - 1 AS cell, v AS cv
    FROM e0 WHERE vid % 5 <> 0 ORDER BY vid LIMIT 16
),
cf AS (
    SELECT row_number() OVER (ORDER BY vid) - 1 AS cell, v AS cv
    FROM e0 ORDER BY vid LIMIT 16
),
q AS (SELECT vid AS query_id, v AS qv FROM e0 WHERE vid % 100 = 0 AND vid < 50000),
brute AS (
    SELECT q.query_id, e0.vid
    FROM q CROSS JOIN e0
    QUALIFY row_number() OVER (PARTITION BY q.query_id
        ORDER BY round(list_dot_product(q.qv, e0.v) /
                       (sqrt(list_dot_product(q.qv, q.qv)) *
                        sqrt(list_dot_product(e0.v, e0.v))), 6) DESC, e0.vid) <= {k}
),{arm("cs", "1")},{arm("cf", "2")},
spine AS (SELECT unnest(generate_series(0, 15)) AS cell),
j AS (
    SELECT spine.cell,
           cast(coalesce(r.n_rest, 0) AS BIGINT) AS n_rest,
           cast(coalesce(nw.n_new, 0) AS BIGINT) AS n_new
    FROM spine
    LEFT JOIN (SELECT cell, count(*) AS n_rest FROM a1 WHERE vid % 5 <> 0 GROUP BY 1) r USING (cell)
    LEFT JOIN (SELECT cell, count(*) AS n_new FROM a1 WHERE vid % 5 = 0 GROUP BY 1) nw USING (cell)
),
tots AS (SELECT cast(sum(n_rest) AS BIGINT) AS tr, cast(sum(n_new) AS BIGINT) AS tn FROM j),
sv AS (
    SELECT sum(abs(j.n_new * tots.tr - j.n_rest * tots.tn)) AS s_tvd
    FROM j CROSS JOIN tots
),
dec AS (
    SELECT tots.tr, tots.tn, sv.s_tvd, rs.hits, rs.nq,
           (tots.tn > 0 AND tots.tr > 0
            AND sv.s_tvd * 1000000 > 2 * {drift_thresh_micro} * tots.tn * tots.tr)
               AS drift_exceeded,
           (rs.nq > 0 AND rs.hits * 1000000 < {recall_thresh_micro} * rs.nq * {k})
               AS recall_below
    FROM tots CROSS JOIN sv CROSS JOIN r1 rs
)
SELECT cast(dec.tr AS BIGINT) AS n_corpus,
       cast(dec.tn AS BIGINT) AS n_new,
       CASE WHEN dec.tn > 0 AND dec.tr > 0
            THEN cast((dec.s_tvd * 1000000) // (2 * dec.tn * dec.tr) AS BIGINT) END AS drift_tvd_micro,
       cast(dec.hits AS BIGINT) AS aged_hits,
       cast(dec.nq AS BIGINT) AS n_queries,
       CASE WHEN dec.nq > 0 THEN cast((dec.hits * 1000000) // (dec.nq * {k}) AS BIGINT) END
           AS aged_recall_micro,
       drift_exceeded, recall_below,
       (drift_exceeded OR recall_below) AS retrain,
       CASE WHEN (drift_exceeded OR recall_below) AND rf.nq > 0
            THEN cast((rf.hits * 1000000) // (rf.nq * {k}) AS BIGINT) END
           AS fresh_recall_micro
FROM dec CROSS JOIN r2 rf
"""


_IVF_INCREMENTAL_RECALL_SQL = """
WITH e0 AS (SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings),
c AS (
    SELECT row_number() OVER (ORDER BY vid) - 1 AS cell, v AS cv
    FROM e0 WHERE vid % 5 <> 0 ORDER BY vid LIMIT 16
), a AS (
    SELECT e0.vid, e0.v, c.cell
    FROM e0 CROSS JOIN c
    QUALIFY row_number() OVER (PARTITION BY e0.vid
        ORDER BY list_dot_product(e0.v, c.cv) DESC, c.cell) = 1
), q AS (
    SELECT vid AS query_id, v AS qv FROM e0 WHERE vid % 100 = 0 AND vid < 50000
), probe AS (
    SELECT q.query_id, q.qv, c.cell
    FROM q CROSS JOIN c
    QUALIFY row_number() OVER (PARTITION BY q.query_id
        ORDER BY list_dot_product(q.qv, c.cv) DESC, c.cell) <= 4
), ivf AS (
    SELECT probe.query_id, a.vid
    FROM probe JOIN a USING (cell)
    QUALIFY row_number() OVER (PARTITION BY probe.query_id
        ORDER BY round(list_dot_product(probe.qv, a.v) /
                       (sqrt(list_dot_product(probe.qv, probe.qv)) *
                        sqrt(list_dot_product(a.v, a.v))), 6) DESC, a.vid) <= 10
), brute AS (
    SELECT q.query_id, e0.vid
    FROM q CROSS JOIN e0
    QUALIFY row_number() OVER (PARTITION BY q.query_id
        ORDER BY round(list_dot_product(q.qv, e0.v) /
                       (sqrt(list_dot_product(q.qv, q.qv)) *
                        sqrt(list_dot_product(e0.v, e0.v))), 6) DESC, e0.vid) <= 10
), h AS (
    SELECT ivf.query_id, count(*) AS n_hits
    FROM ivf JOIN brute ON ivf.query_id = brute.query_id AND ivf.vid = brute.vid
    GROUP BY ivf.query_id
)
SELECT q.query_id, cast(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(coalesce(h.n_hits, 0) / 10.0, 6) AS recall_at_k
FROM q LEFT JOIN h USING (query_id)
"""


# -- r14 driver sample (first 50), applied as a reorder at return time:
# new r14 entry + entries whose code changed this round lead, then the
# FULL remaining r07 cohort (27) and the alphabetical head of the r08
# block — 43 of the 50 were last driver-attested <= r9 (VERDICT r13
# item 3). The rest keep registration order. --
_R14_SAMPLE_HEAD = [
    # new r14 entries (never driver-attested)
    "intra_doc_repeat_spans",
    "curation_funnel",
    "curation_funnel_incremental",
    # changed this round (r14): suffix family re-keyed on (hash, pos)
    # with the positional verify arm; agreement exact channel now
    # counts pre-merge hit positions; market_hhi gained the per-seller
    # overflow fail-stop
    "suffix_dedup_spans",
    "suffix_span_agreement",
    "suffix_spans_incremental",
    "suffix_scrub",
    "span_contamination",
    "span_contamination_report",
    "market_hhi",
    # the FULL remaining r07 cohort (r13 verdict item 3)
    "embedding_contamination",
    "ewma_forecast",
    "forecast_backtest",
    "gapfill_daily",
    "hll_partition_rollup",
    "inventory_runout",
    "item_item_cosine",
    "k_core_peel",
    "kaplan_meier",
    "knn_graph",
    "mann_kendall_trend",
    "new_vs_returning",
    "ngram_novelty",
    "peak_concurrency",
    "price_elasticity",
    "promo_uplift",
    "revenue_gini",
    "safety_stock",
    "scd2_history",
    "scd2_incremental",
    "scd2_point_in_time",
    "span_scrub",
    "sq8_quantize_audit",
    "status_dwell_time",
    "touch_attribution",
    "winsorized_stats",
    "zone_map_prune",
    # r08 cohort fill (alphabetical head of the 50-entry block)
    "a4_union_pages",
    "a5_manifest_scan",
    "basket_pairs",
    "c2_status_dispatch",
    "c5_validate_or_delete",
    "cohort_retention",
    "conversion_latency",
    "embedding_centroids",
    "embedding_top_pc",
    "embedding_whiten",
    "event_transitions",
    "f14_pubsub_decode",
    "f16_url_assembly",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    base = _queries_base()
    head = {k: base[k] for k in _R14_SAMPLE_HEAD}
    return head | {k: v for k, v in base.items() if k not in head}


def _queries_base() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # -- registration order (historical); the driver-facing order is
        # the r11 rotation applied in queries() above. --
        "code_switch_audit": _code_switch_audit,
        "embedding_outlier_audit": _embedding_outlier_audit,
        "filter_overlap_matrix": _filter_overlap_matrix,
        "curriculum_phases": _curriculum_phases,
        "mix_epoch_plan": _mix_epoch_plan,
        "ivf_append_assign": _ivf_append_assign,
        "mmr_rerank": _mmr_rerank,
        "dim_truncation_recall": _dim_truncation_recall,
        "doc_ngram_repetition": _doc_ngram_repetition,
        "ivf_cell_drift": _ivf_cell_drift,
        "trigram_doc_logprob": _trigram_doc_logprob,
        "token_budget_incremental": _token_budget_incremental,
        "ivf_incremental_recall": _ivf_incremental_recall,
        "ivf_retrain_plan": _ivf_retrain_plan,
        "lorenz_deciles": _lorenz_deciles,
        "market_hhi": _market_hhi,
        "nb_fit": _nb_fit,
        "spearman_corr": _spearman_corr,
        "cramers_v": _cramers_v,
        "cohens_kappa": _cohens_kappa,
        "temperature_mix": _temperature_mix,
        "interarrival_fit": _interarrival_fit,
        "qq_drift": _qq_drift,
        "poisson_fit": _poisson_fit,
        "acf_table": _acf_table,
        "conformal_interval": _conformal_interval,
        "propensity_strata": _propensity_strata,
        "fdr_bh_segments": _fdr_bh_segments,
        "mde_power": _mde_power,
        "local_clustering": _local_clustering,
        "heaps_law_curve": _heaps_law_curve,
        "quantile_match_normalize": _quantile_match_normalize,
        "domain_cap_sample": _domain_cap_sample,
        "always_valid_pvalue": _always_valid_pvalue,
        "mutual_information": _mutual_information,
        "target_encode_loo": _target_encode_loo,
        "jaro_winkler_rescore": _jaro_winkler_rescore,
        "recs_mrr": _recs_mrr,
        "scd2_agg_mv": _scd2_agg_mv,
        "sorted_neighborhood_dedup": _sorted_neighborhood_dedup,
        "edit_distance_join": _edit_distance_join,
        "growth_accounting": _growth_accounting,
        "fd_profile": _fd_profile,
        "phrase_search": _phrase_search,
        "lm_trigram_backoff": _lm_trigram_backoff,
        "interval_union_length": _interval_union_length,
        "monetary_unit_sample": _monetary_unit_sample,
        "ols_two_feature": _ols_two_feature,
        "seasonal_outliers": _seasonal_outliers,
        "asof_tolerance_join": _asof_tolerance_join,
        "containment_join": _containment_join,
        "ks_two_sample": _ks_two_sample,
        "rolling_distinct_users": _rolling_distinct_users,
        "cohort_revenue_matrix": _cohort_revenue_matrix,
        "bm25_incremental": _bm25_incremental,
        "token_run_lengths": _token_run_lengths,
        "quantile_disc_groups": _quantile_disc_groups,
        "topk_diverse": _topk_diverse,
        "hierarchy_shares": _hierarchy_shares,
        "prefix_cluster": _prefix_cluster,
        "revenue_bridge": _revenue_bridge,
        "measure_correlations": _measure_correlations,
        "g1_reconciliation_summary": _g1_reconciliation_summary,
        "g2_union_distinct": _g2_union_distinct,
        "g3_intersect": _g3_intersect,
        "hypertable_quantiles": _hypertable_quantiles,
        "hypertable_rollup": _hypertable_rollup,
        "ivf_pq_top_k": _ivf_pq_top_k,
        "ivf_probe_sweep": _ivf_probe_sweep,
        "k_anonymity": _k_anonymity,
        "l_diversity": _l_diversity,
        "label_propagation": _label_propagation,
        "leakage_safe_split": _leakage_safe_split,
        "mad_outliers": _mad_outliers,
        "minhash_calibration": _minhash_calibration,
        "minhash_incremental": _minhash_incremental,
        "minhash_gate": _minhash_gate,
        "suffix_dedup_spans": _suffix_dedup_spans,
        "intra_doc_repeat_spans": _intra_doc_repeat_spans,
        "suffix_span_agreement": _suffix_span_agreement,
        "suffix_spans_incremental": _suffix_spans_incremental,
        "suffix_scrub": _suffix_scrub,
        "span_contamination": _span_contamination,
        "span_contamination_report": _span_contamination_report,
        "minhash_portable": _minhash_portable,
        "minhash_scurve": _minhash_scurve,
        "multimodal_frames": _multimodal_frames,
        "multimodal_resize": _multimodal_resize,
        "pareto_abc": _pareto_abc,
        "pq_codes": _pq_codes,
        "pq_recall_eval": _pq_recall_eval,
        "q1_pricing_summary": _q1_pricing_summary,
        "quantile_sketch": _quantile_sketch,
        "rfm_segments": _rfm_segments,
        "simhash_incremental": _simhash_incremental,
        "simhash_portable": _simhash_portable,
        # -- never-attested r10 additions (positions 51+: next in line
        # for the r11 rotation) --
        "mann_whitney_value": _mann_whitney_value,
        "cuped_adjustment": _cuped_adjustment,
        "srm_check": _srm_check,
        "order_totals_reconcile": _order_totals_reconcile,
        "ab_readout": _ab_readout,
        "link_prediction": _link_prediction,
        "t_closeness": _t_closeness,
        "wilcoxon_signed_rank": _wilcoxon_signed_rank,
        "paired_t_test": _paired_t_test,
        "auc_eval": _auc_eval,
        "deterministic_shuffle": _deterministic_shuffle,
        "token_budget_select": _token_budget_select,
        "curation_funnel": _curation_funnel,
        "curation_funnel_incremental": _curation_funnel_incremental,
        "curation_report": _curation_report,
        "source_data_card": _source_data_card,
        # -- stalest-first: remaining r5/r6-attested, then r7, then r8 --
        "skew_profile": _skew_profile,
        "span_dedup_incremental": _span_dedup_incremental,
        "topk_per_group": _topk_per_group,
        "w1_group_total": _w1_group_total,
        "w2_dedup_keeprule": _w2_dedup_keeprule,
        "w3_pick_first": _w3_pick_first,
        "w4_min_by": _w4_min_by,
        "asof_join": _asof_join,
        "bpe_merges": _bpe_merges,
        "bpe_token_count": _bpe_token_count,
        "c1_required_fields_filter": _c1_required_fields_filter,
        "cube_agg": _cube_agg,
        "dedup_exact": _dedup_exact,
        "dedup_incremental_exact": _dedup_incremental_exact,
        "doc_fingerprint": _doc_fingerprint,
        "doc_pagerank": _doc_pagerank,
        "dup_triangles": _dup_triangles,
        "e8_duplicate_groups": _e8_duplicate_groups,
        "embedding_near_dup": _embedding_near_dup,
        "embedding_near_dup_blocked": _embedding_near_dup_blocked,
        "f11_split_name_parse": _f11_split_name_parse,
        "f12_checksum": _f12_checksum,
        "f15_json_extract": _f15_json_extract,
        "f1_f3_date_suite": _f1_f3_date_suite,
        "f2_contact_datetime": _f2_contact_datetime,
        "f5_discount_parse": _f5_discount_parse,
        "f8_category_split": _f8_category_split,
        "f9_f10_blob_names": _f9_f10_blob_names,
        "grouping_sets_agg": _grouping_sets_agg,
        "heavy_hitters_cms": _heavy_hitters_cms,
        "hypertable_distinct": _hypertable_distinct,
        "itens_fact": sales_facts.itens_fact,
        "ivf_pq_rerank_top_k": _ivf_pq_rerank_top_k,
        "ivf_top_k": _ivf_top_k,
        "kmeans_refine": _kmeans_refine,
        "knn_brute_force": _knn_brute_force,
        "lang_id": _lang_id,
        "lsh_top_k": _lsh_top_k,
        "minhash_eval": _minhash_eval,
        "minhash_near_dup": _minhash_near_dup,
        "ngram_jaccard": _ngram_jaccard,
        "pedidos_fact": sales_facts.pedidos_fact,
        "q18_top_customers": _q18_top_customers,
        "range_join_clicks": _range_join_clicks,
        "rollup_agg": _rollup_agg,
        "salted_agg": _salted_agg,
        "semantic_dedup": _semantic_dedup,
        "session_windows": _session_windows,
        "simhash_groups": _simhash_groups,
        "sliding_counts": _sliding_counts,
        "source_drift": _source_drift,
        "span_dedup": _span_dedup,
        "sql_surface_portable": _sql_surface_portable,
        "text_quality": _text_quality,
        "token_count_bpe": _token_count_bpe,
        "tumbling_counts": _tumbling_counts,
        "vocab_coverage": _vocab_coverage,
        "bfs_reachability": _bfs_reachability,
        "item_item_cosine": _item_item_cosine,
        "decayed_trending": _decayed_trending,
        "forecast_backtest": _forecast_backtest,
        "span_scrub": _span_scrub,
        "ewma_forecast": _ewma_forecast,
        "peak_concurrency": _peak_concurrency,
        "safety_stock": _safety_stock,
        "kaplan_meier": _kaplan_meier,
        "mann_kendall_trend": _mann_kendall_trend,
        "ngram_novelty": _ngram_novelty,
        "gapfill_daily": _gapfill_daily,
        "assoc_rules": _assoc_rules,
        "dow_seasonality": _dow_seasonality,
        "cusum_drift": _cusum_drift,
        "k_core_peel": _k_core_peel,
        "sq8_quantize_audit": _sq8_quantize_audit,
        "zone_map_prune": _zone_map_prune,
        "price_elasticity": _price_elasticity,
        "touch_attribution": _touch_attribution,
        "inventory_runout": _inventory_runout,
        "revenue_gini": _revenue_gini,
        "benford_audit": _benford_audit,
        "abc_xyz_class": _abc_xyz_class,
        "new_vs_returning": _new_vs_returning,
        "char_entropy": _char_entropy,
        "promo_uplift": _promo_uplift,
        "duplicate_payments": _duplicate_payments,
        "churn_flags": _churn_flags,
        "bm25_search": _bm25_search,
        "dsir_weights": _dsir_weights,
        "scd2_history": _scd2_history,
        "scd2_incremental": _scd2_incremental,
        "scd2_point_in_time": _scd2_point_in_time,
        "cdc_merge": _cdc_merge,
        "winsorized_stats": _winsorized_stats,
        "status_dwell_time": _status_dwell_time,
        "approx_profile": _approx_profile,
        "bigram_counts": _bigram_counts,
        "boilerplate_ngrams": _boilerplate_ngrams,
        "contamination_check": _contamination_check,
        "curation_filter": _curation_filter,
        "dataset_split": _dataset_split,
        "dedup_agreement": _dedup_agreement,
        "doc_chunks": _doc_chunks,
        "dq_orders_summary": _dq_orders_summary,
        "embedding_contamination": _embedding_contamination,
        "hll_partition_rollup": _hll_partition_rollup,
        "json_ingest_rollup": _json_ingest_rollup,
        "knn_graph": _knn_graph,
        "lm_bigram_score": _lm_bigram_score,
        "multimodal_features": _multimodal_features,
        "pii_scrub": _pii_scrub,
        "q12_priority_classes": _q12_priority_classes,
        "q21_waiting_suppliers": _q21_waiting_suppliers,
        "q2_min_cost_supplier": _q2_min_cost_supplier,
        "q9_profit_by_nation_year": _q9_profit_by_nation_year,
        "repetition_ratio": _repetition_ratio,
        "sequence_pack": _sequence_pack,
        "session_ids": _session_ids,
        "source_mixture": _source_mixture,
        "source_overlap": _source_overlap,
        "stratified_sample": _stratified_sample,
        "table_checksum": _table_checksum,
        "tfidf_top_terms": _tfidf_top_terms,
        "weighted_sample": _weighted_sample,
        "a4_union_pages": _a4_union_pages,
        "a5_manifest_scan": _a5_manifest_scan,
        "basket_pairs": _basket_pairs,
        "c2_status_dispatch": _c2_status_dispatch,
        "c5_validate_or_delete": _c5_validate_or_delete,
        "cohort_retention": _cohort_retention,
        "conversion_latency": _conversion_latency,
        "embedding_centroids": _embedding_centroids,
        "embedding_top_pc": _embedding_top_pc,
        "embedding_whiten": _embedding_whiten,
        "event_transitions": _event_transitions,
        "f14_pubsub_decode": _f14_pubsub_decode,
        "f16_url_assembly": _f16_url_assembly,
        "g4_symmetric_difference": _g4_symmetric_difference,
        "funnel_conversion": _funnel_conversion,
        "lang_id_eval": _lang_id_eval,
        "lead_lag_gaps": _lead_lag_gaps,
        "pack_assignments": _pack_assignments,
        "percentile_prices": _percentile_prices,
        "pivot_status_counts": _pivot_status_counts,
        "q10_returned_revenue": _q10_returned_revenue,
        "q11_important_parts": _q11_important_parts,
        "q13_customer_distribution": _q13_customer_distribution,
        "q14_promo_revenue": _q14_promo_revenue,
        "q15_top_supplier": _q15_top_supplier,
        "q16_supplier_cnt": _q16_supplier_cnt,
        "q17_small_qty_revenue": _q17_small_qty_revenue,
        "q19_disjunctive_revenue": _q19_disjunctive_revenue,
        "q20_promo_suppliers": _q20_promo_suppliers,
        "q22_idle_customers": _q22_idle_customers,
        "q3_shipping_priority": _q3_shipping_priority,
        "q4_priority_count": _q4_priority_count,
        "q5_nation_volume": _q5_nation_volume,
        "q6_forecast_revenue": _q6_forecast_revenue,
        # -- r9-attested (freshest, rotated to the tail) --
        "q7_volume_shipping": _q7_volume_shipping,
        "q8_market_share": _q8_market_share,
        "quality_prune": _quality_prune,
        "repair_run": _repair_run,
        "retention_daily": _retention_daily,
        "rolling_7d_revenue": _rolling_7d_revenue,
        "semantic_dedup_incremental": _semantic_dedup_incremental,
        "tokenizer_fertility": _tokenizer_fertility,
        "w2_keeprule_backfill": _w2_keeprule_backfill,
        "scd2_fold_late": _scd2_fold_late,
        "prefix_jaccard_join": _prefix_jaccard_join,
        "snapshot_diff": _snapshot_diff,
        "ivm_join_delta": _ivm_join_delta,
        "repurchase_intervals": _repurchase_intervals,
        "price_points": _price_points,
        "rrf_fusion": _rrf_fusion,
        "ndcg_eval": _ndcg_eval,
        "collocation_pmi": _collocation_pmi,
        "user_behavior_entropy": _user_behavior_entropy,
        "top_event_paths": _top_event_paths,
        "arrival_burstiness": _arrival_burstiness,
        "revenue_waterfall": _revenue_waterfall,
        "chi_square_dow": _chi_square_dow,
        "value_drift_psi": _value_drift_psi,
        "recs_hit_rate": _recs_hit_rate,
        "bag_setops": _bag_setops,
        "unpivot_measures": _unpivot_measures,
        "window_rank_suite": _window_rank_suite,
        "embedding_norm_audit": _embedding_norm_audit,
        "skyline_parts": _skyline_parts,
        "basket_triples": _basket_triples,
        "seasonal_strength": _seasonal_strength,
        "ivm_agg_retract": _ivm_agg_retract,
        "ann_recall_eval": _ann_recall_eval,
        "cluster_representative": _cluster_representative,
        "contrastive_triples": _contrastive_triples,
        "d1_item_product_lookup": _d1_item_product_lookup,
        "d2_order_customer_left": _d2_order_customer_left,
        "d3_chained_enrichment": _d3_chained_enrichment,
        "d4_incremental_guard": _d4_incremental_guard,
        "d5_regroup_pivot": _d5_regroup_pivot,
        "d6_semi_join": _d6_semi_join,
        "decile_lift": _decile_lift,
        "dup_cluster_stats": _dup_cluster_stats,
        "dup_clusters": _dup_clusters,
        "dup_rate_by_source": _dup_rate_by_source,
        "e7_distinct_values": _e7_distinct_values,
        "entity_resolution": _entity_resolution,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "code_switch_audit": _code_switch_sql(),
        "embedding_outlier_audit": _EMBEDDING_OUTLIER_SQL,
        "filter_overlap_matrix": _filter_overlap_sql(),
        "curriculum_phases": _CURRICULUM_PHASES_SQL,
        "mix_epoch_plan": _MIX_EPOCH_PLAN_SQL,
        "ivf_append_assign": _IVF_APPEND_ASSIGN_SQL,
        "mmr_rerank": _mmr_rerank_sql(),
        "dim_truncation_recall": _dim_truncation_recall_sql(),
        "doc_ngram_repetition": _DOC_NGRAM_REPETITION_SQL,
        "ivf_cell_drift": _IVF_CELL_DRIFT_SQL,
        "trigram_doc_logprob": _TRIGRAM_LOGPROB_SQL,
        "token_budget_incremental": _TOKEN_BUDGET_SQL,
        "ivf_incremental_recall": _IVF_INCREMENTAL_RECALL_SQL,
        "ivf_retrain_plan": _ivf_retrain_sql(),
        "lorenz_deciles": _LORENZ_SQL,
        "market_hhi": _MARKET_HHI_SQL,
        "nb_fit": _NB_FIT_SQL,
        "spearman_corr": _SPEARMAN_SQL,
        "cramers_v": _CRAMERS_V_SQL,
        "cohens_kappa": _cohens_kappa_sql(),
        "temperature_mix": _TEMPERATURE_MIX_SQL,
        "interarrival_fit": _INTERARRIVAL_SQL,
        "qq_drift": _QQ_DRIFT_SQL,
        "poisson_fit": _POISSON_FIT_SQL,
        "acf_table": _ACF_TABLE_SQL,
        "conformal_interval": _CONFORMAL_SQL,
        "propensity_strata": _PROPENSITY_SQL,
        "fdr_bh_segments": _FDR_BH_SQL,
        "mde_power": _MDE_POWER_SQL,
        "local_clustering": _LOCAL_CLUSTERING_SQL,
        "heaps_law_curve": _HEAPS_LAW_SQL,
        "quantile_match_normalize": _QUANTILE_MATCH_SQL,
        "domain_cap_sample": _DOMAIN_CAP_SQL,
        "always_valid_pvalue": _ALWAYS_VALID_SQL,
        "mutual_information": _MUTUAL_INFORMATION_SQL,
        "target_encode_loo": _TARGET_ENCODE_LOO_SQL,
        "jaro_winkler_rescore": _JARO_WINKLER_RESCORE_SQL,
        "recs_mrr": _RECS_MRR_SQL,
        "bfs_reachability": _BFS_REACHABILITY_SQL,
        "item_item_cosine": _ITEM_ITEM_COSINE_SQL,
        "decayed_trending": _DECAYED_TRENDING_SQL,
        "forecast_backtest": _FORECAST_BACKTEST_SQL,
        "span_scrub": _SPAN_SCRUB_SQL,
        "ewma_forecast": _EWMA_SQL,
        "peak_concurrency": _PEAK_CONCURRENCY_SQL,
        "safety_stock": _SAFETY_STOCK_SQL,
        "kaplan_meier": _KAPLAN_MEIER_SQL,
        "mann_kendall_trend": _MANN_KENDALL_SQL,
        "ngram_novelty": _NGRAM_NOVELTY_SQL,
        "gapfill_daily": _GAPFILL_SQL,
        "assoc_rules": _ASSOC_RULES_SQL,
        "dow_seasonality": _DOW_SEASONALITY_SQL,
        "cusum_drift": _CUSUM_SQL,
        "k_core_peel": _K_CORE_SQL,
        "sq8_quantize_audit": _SQ8_SQL,
        "zone_map_prune": _ZONE_MAP_SQL,
        "price_elasticity": _ELASTICITY_SQL,
        "touch_attribution": _TOUCH_SQL,
        "inventory_runout": _RUNOUT_SQL,
        "revenue_gini": _GINI_SQL,
        "benford_audit": _BENFORD_SQL,
        "abc_xyz_class": _ABC_XYZ_SQL,
        "new_vs_returning": _NEW_RETURNING_SQL,
        "char_entropy": _CHAR_ENTROPY_SQL,
        "promo_uplift": _PROMO_UPLIFT_SQL,
        "duplicate_payments": _DUP_PAYMENTS_SQL,
        "churn_flags": _CHURN_SQL,
        "bm25_search": _BM25_SQL,
        "dsir_weights": _DSIR_SQL,
        "scd2_history": _SCD2_SQL,
        "scd2_incremental": _SCD2_SQL,
        "scd2_fold_late": _SCD2_SQL,
        "prefix_jaccard_join": _PREFIX_JACCARD_SQL,
        "snapshot_diff": _SNAPSHOT_DIFF_SQL,
        "ivm_join_delta": _IVM_JOIN_SQL,
        "repurchase_intervals": _REPURCHASE_SQL,
        "price_points": _PRICE_POINTS_SQL,
        "measure_correlations": _MEASURE_CORR_SQL,
        "rrf_fusion": _RRF_FUSION_SQL,
        "ndcg_eval": _ndcg_sql(),
        "collocation_pmi": _COLLOCATION_SQL,
        "user_behavior_entropy": _USER_ENTROPY_SQL,
        "top_event_paths": _TOP_PATHS_SQL,
        "arrival_burstiness": _BURSTINESS_SQL,
        "revenue_bridge": _REVENUE_BRIDGE_SQL,
        "revenue_waterfall": _REVENUE_WATERFALL_SQL,
        "chi_square_dow": _CHI_SQUARE_SQL,
        "value_drift_psi": _PSI_SQL,
        "recs_hit_rate": _RECS_HIT_RATE_SQL,
        "bag_setops": _BAG_SETOPS_SQL,
        "unpivot_measures": _UNPIVOT_SQL,
        "window_rank_suite": _WINDOW_RANK_SQL,
        "embedding_norm_audit": _EMB_NORM_SQL,
        "skyline_parts": _SKYLINE_SQL,
        "basket_triples": _BASKET_TRIPLES_SQL,
        "seasonal_strength": _SEASONAL_STRENGTH_SQL,
        "ivm_agg_retract": _IVM_AGG_RETRACT_SQL,
        "scd2_agg_mv": _SCD2_AGG_MV_SQL,
        "sorted_neighborhood_dedup": _SORTED_NEIGHBORHOOD_SQL,
        "edit_distance_join": _EDIT_DISTANCE_JOIN_SQL,
        "growth_accounting": _GROWTH_ACCOUNTING_SQL,
        "fd_profile": _FD_PROFILE_SQL,
        "phrase_search": _PHRASE_SEARCH_SQL,
        "lm_trigram_backoff": _LM_TRIGRAM_BACKOFF_SQL,
        "interval_union_length": _INTERVAL_UNION_SQL,
        "monetary_unit_sample": _MONETARY_UNIT_SQL,
        "ols_two_feature": _OLS_TWO_FEATURE_SQL,
        "seasonal_outliers": _SEASONAL_OUTLIERS_SQL,
        "asof_tolerance_join": _ASOF_TOLERANCE_SQL,
        "containment_join": _CONTAINMENT_JOIN_SQL,
        "ks_two_sample": _KS_TWO_SAMPLE_SQL,
        "rolling_distinct_users": _ROLLING_DISTINCT_SQL,
        "cohort_revenue_matrix": _COHORT_REVENUE_SQL,
        "bm25_incremental": _BM25_SQL,
        "token_run_lengths": _TOKEN_RUN_SQL,
        "quantile_disc_groups": _QUANTILE_DISC_SQL,
        "topk_diverse": _TOPK_DIVERSE_SQL,
        "hierarchy_shares": _HIERARCHY_SHARES_SQL,
        "prefix_cluster": _PREFIX_CLUSTER_SQL,
        "mann_whitney_value": _MANN_WHITNEY_SQL,
        "cuped_adjustment": _CUPED_SQL,
        "srm_check": _SRM_SQL,
        "order_totals_reconcile": _ORDER_RECONCILE_SQL,
        "ab_readout": _AB_READOUT_SQL,
        "link_prediction": _LINK_PREDICTION_SQL,
        "t_closeness": _T_CLOSENESS_SQL,
        "wilcoxon_signed_rank": _WILCOXON_SQL,
        "paired_t_test": _PAIRED_T_SQL,
        "auc_eval": _AUC_SQL,
        "deterministic_shuffle": _DET_SHUFFLE_SQL,
        "token_budget_select": _TOKEN_BUDGET_SQL,
        "curation_funnel": _CURATION_FUNNEL_SQL,
        # the incremental fold must equal the full batch-path recompute
        "curation_funnel_incremental": _CURATION_FUNNEL_SQL,
        "curation_report": _CURATION_REPORT_SQL,
        "source_data_card": _SOURCE_CARD_SQL,
        "scd2_point_in_time": _SCD2_PIT_SQL,
        "cdc_merge": _CDC_MERGE_SQL,
        "winsorized_stats": _WINSOR_SQL,
        "status_dwell_time": _DWELL_SQL,
        "pedidos_fact": PEDIDOS_FACT_SQL,
        "itens_fact": ITENS_FACT_SQL,
        "q1_pricing_summary": _Q1_SQL,
        "d1_item_product_lookup": _D1_SQL,
        "d2_order_customer_left": _D2_SQL,
        "d4_incremental_guard": _D4_SQL,
        "d5_regroup_pivot": _D5_SQL,
        "d6_semi_join": _D6_SQL,
        "c1_required_fields_filter": _C1_SQL,
        "e8_duplicate_groups": _E8_SQL,
        "w1_group_total": _W1_SQL,
        "w2_dedup_keeprule": _W2_SQL,
        "w4_min_by": _W4_SQL,
        "topk_per_group": _TOPK_SQL,
        "g1_reconciliation_summary": _G1_SQL,
        "g2_union_distinct": _G2_SQL,
        "g3_intersect": _G3_SQL,
        "f1_f3_date_suite": _F1_SQL,
        "f5_discount_parse": _F5_SQL,
        "f8_category_split": _F8_SQL,
        "f9_f10_blob_names": _F9_SQL,
        "f12_checksum": _F12_SQL,
        "f15_json_extract": _F15_SQL,
        "dedup_exact": _DEDUP_EXACT_SQL,
        "text_quality": _TEXT_QUALITY_SQL,
        "token_count_bpe": _TOKEN_COUNT_SQL,
        "lang_id": _lang_id_sql(),
        "ngram_jaccard": _NGRAM_JACCARD_SQL,
        "knn_brute_force": _knn_sql(),
        "ivf_top_k": _ivf_sql(),
        "lsh_top_k": _lsh_sql(),
        "simhash_portable": _simhash_portable_sql(),
        "embedding_near_dup": _emb_near_dup_sql(),
        "embedding_near_dup_blocked": _emb_blocked_sql(),
        "tumbling_counts": _TUMBLING_SQL,
        "session_windows": _SESSION_SQL,
        "sliding_counts": _SLIDING_SQL,
        "doc_fingerprint": _DOC_FP_SQL,
        "minhash_portable": _MINHASH_PORTABLE_SQL,
        "minhash_incremental": _MINHASH_INCREMENTAL_SQL,
        "minhash_gate": _MINHASH_GATE_SQL,
        "suffix_dedup_spans": _SUFFIX_DEDUP_SPANS_SQL,
        "intra_doc_repeat_spans": _INTRA_DOC_REPEAT_SPANS_SQL,
        "suffix_span_agreement": _SUFFIX_SPAN_AGREEMENT_SQL,
        "suffix_spans_incremental": _SUFFIX_SPANS_INCR_SQL,
        "suffix_scrub": _SUFFIX_SCRUB_SQL,
        "span_contamination": _SPAN_CONTAMINATION_SQL,
        "span_contamination_report": _SPAN_CONTAMINATION_REPORT_SQL,
        "salted_agg": _SALTED_AGG_SQL,
        "q18_top_customers": _Q18_SQL,
        "d3_chained_enrichment": _D3_SQL,
        "g4_symmetric_difference": _G4_SQL,
        "repair_run": _REPAIR_RUN_SQL,
        "quality_prune": _QUALITY_PRUNE_SQL,
        "tokenizer_fertility": _tokenizer_fertility_sql(),
        "ann_recall_eval": _ANN_RECALL_SQL,
        "k_anonymity": _K_ANONYMITY_SQL,
        "simhash_incremental": _simhash_incremental_sql(),
        "multimodal_frames": _MULTIMODAL_FRAMES_SQL,
        "multimodal_resize": _MULTIMODAL_RESIZE_SQL,
        "span_dedup_incremental": _SPAN_INCREMENTAL_SQL,
        "minhash_scurve": _MINHASH_SCURVE_SQL,
        "quantile_sketch": _QUANTILE_SKETCH_SQL,
        "pareto_abc": _PARETO_ABC_SQL,
        "dup_cluster_stats": _DUP_CLUSTER_STATS_SQL,
        "e7_distinct_values": _E7_SQL,
        "w3_pick_first": _W3_SQL,
        "f2_contact_datetime": _F2_SQL,
        "f11_split_name_parse": _F11_SQL,
        "rollup_agg": _ROLLUP_SQL,
        "cube_agg": _CUBE_SQL,
        "percentile_prices": _PERCENTILE_SQL,
        "asof_join": _ASOF_SQL,
        "range_join_clicks": _RANGE_JOIN_SQL,
        "lead_lag_gaps": _LEAD_LAG_SQL,
        "session_ids": _SESSION_IDS_SQL,
        "rolling_7d_revenue": _ROLLING_7D_SQL,
        "q4_priority_count": _Q4_SQL,
        "q10_returned_revenue": _Q10_SQL,
        "q12_priority_classes": _Q12_SQL,
        "q16_supplier_cnt": _Q16_SQL,
        "grouping_sets_agg": _GROUPING_SETS_SQL,
        "pivot_status_counts": _PIVOT_SQL,
        "a4_union_pages": _A4_UNION_SQL,
        "f16_url_assembly": _F16_SQL,
        "stratified_sample": _STRATIFIED_SQL,
        "dataset_split": _DATASET_SPLIT_SQL,
        "doc_chunks": _DOC_CHUNKS_SQL,
        "sequence_pack": _SEQUENCE_PACK_SQL,
        "weighted_sample": _WEIGHTED_SAMPLE_SQL,
        "bigram_counts": _BIGRAM_SQL,
        "tfidf_top_terms": _TFIDF_SQL,
        "pii_scrub": _PII_SCRUB_SQL,
        "curation_filter": _curation_sql(),
        "embedding_centroids": _EMBEDDING_CENTROIDS_SQL,
        "dup_clusters": _DUP_CLUSTERS_SQL,
        "cluster_representative": _CLUSTER_REP_SQL,
        "doc_pagerank": _doc_pagerank_sql(),
        "dq_orders_summary": _DQ_ORDERS_SQL,
        "hll_partition_rollup": _HLL_ROLLUP_SQL,
        "contamination_check": _CONTAMINATION_SQL,
        "embedding_contamination": _EMB_CONTAMINATION_SQL,
        "kmeans_refine": _KMEANS_SQL,
        "knn_graph": _KNN_GRAPH_SQL,
        "repetition_ratio": _REPETITION_SQL,
        "sql_surface_portable": _PORTABLE_SQL,
        "funnel_conversion": _FUNNEL_SQL,
        "retention_daily": _RETENTION_SQL,
        "table_checksum": _TABLE_CHECKSUM_SQL,
        "q7_volume_shipping": _Q7_SQL,
        "q9_profit_by_nation_year": _Q9_SQL,
        "q13_customer_distribution": _Q13_SQL,
        "q14_promo_revenue": _Q14_SQL,
        "q17_small_qty_revenue": _Q17_SQL,
        "q19_disjunctive_revenue": _Q19_SQL,
        "q22_idle_customers": _Q22_SQL,
        "q2_min_cost_supplier": _Q2_SQL,
        "q6_forecast_revenue": _Q6_SQL,
        "q8_market_share": _Q8_SQL,
        "q11_important_parts": _Q11_SQL,
        "q15_top_supplier": _Q15_SQL,
        "q20_promo_suppliers": _Q20_SQL,
        "q21_waiting_suppliers": _Q21_SQL,
        "q3_shipping_priority": _Q3_SQL,
        "q5_nation_volume": _Q5_SQL,
        "json_ingest_rollup": _JSON_INGEST_SQL,
        "c5_validate_or_delete": _C5_SQL,
        "multimodal_features": _MULTIMODAL_SQL,
        "f14_pubsub_decode": _F14_SQL,
        "w2_keeprule_backfill": _W2B_SQL,
        "c2_status_dispatch": _C2_SQL,
        "a5_manifest_scan": _A5_SQL,
        "approx_profile": _APPROX_PROFILE_SQL,
        "dedup_incremental_exact": _DEDUP_INCREMENTAL_SQL,
        "boilerplate_ngrams": _BOILERPLATE_SQL,
        "source_overlap": _SOURCE_OVERLAP_SQL,
        "lm_bigram_score": _LM_SCORE_SQL,
        "dedup_agreement": _DEDUP_AGREEMENT_SQL,
        "semantic_dedup": _SEMANTIC_DEDUP_SQL,
        "semantic_dedup_incremental": _SEMANTIC_DEDUP_INC_SQL,
        "minhash_eval": _MINHASH_EVAL_SQL,
        "source_mixture": _SOURCE_MIXTURE_SQL,
        "vocab_coverage": _VOCAB_COVERAGE_SQL,
        "bpe_merges": _bpe_sql(3),
        "dup_triangles": _DUP_TRIANGLES_SQL,
        "span_dedup": _SPAN_DEDUP_SQL,
        "bpe_token_count": _bpe_token_count_sql(3),
        "heavy_hitters_cms": _cms_sql(4, 64),
        "source_drift": _SOURCE_DRIFT_SQL,
        "contrastive_triples": _CONTRASTIVE_SQL,
        "leakage_safe_split": _LEAKAGE_SPLIT_SQL,
        "event_transitions": _EVENT_TRANSITIONS_SQL,
        "lang_id_eval": _lang_id_eval_sql(),
        "basket_pairs": _BASKET_PAIRS_SQL,
        "pack_assignments": _PACK_ASSIGNMENTS_SQL,
        "rfm_segments": _RFM_SQL,
        "decile_lift": _DECILE_LIFT_SQL,
        "hypertable_rollup": _HYPERTABLE_SQL,
        "pq_codes": _PQ_CODES_SQL,
        "pq_recall_eval": _PQ_RECALL_SQL,
        "entity_resolution": _ENTITY_RESOLUTION_SQL,
        "mad_outliers": _MAD_OUTLIERS_SQL,
        "l_diversity": _L_DIVERSITY_SQL,
        "ivf_pq_top_k": _ivf_pq_sql(),
        "label_propagation": _label_propagation_sql(),
        "hypertable_quantiles": _HYPERTABLE_QUANTILES_SQL,
        "skew_profile": _SKEW_PROFILE_SQL,
        "minhash_calibration": _MINHASH_CALIBRATION_SQL,
        "ivf_probe_sweep": _IVF_PROBE_SWEEP_SQL,
        "conversion_latency": _CONVERSION_LATENCY_SQL,
        "cohort_retention": _COHORT_RETENTION_SQL,
        "dup_rate_by_source": _DUP_RATE_SQL,
        "embedding_top_pc": _top_pc_sql(3),
        "embedding_whiten": _embedding_whiten_sql(),
        "minhash_near_dup": _MINHASH_NEAR_DUP_SQL,
        "simhash_groups": _simhash_portable_sql(n_bits=24, with_ids=True),
        "ivf_pq_rerank_top_k": _ivf_pq_rerank_sql(),
        "hypertable_distinct": _HYPERTABLE_DISTINCT_SQL,
        # Every queries() entry has a value-check oracle — 168/168. The
        # xxhash64 dedup twins (minhash_near_dup_xxhash64 /
        # simhash_groups_xxhash64) live on the library + bench surface
        # (see bench_queries()): their hash family is not SQL-portable;
        # the portable operating points above value-check the shared
        # banding/verify pipelines value-for-value.
    }


def bench_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Library-surface operators benchmarked but not oracle-checked:
    engine-specific xxhash64 hash families whose portable operating
    points carry the value check in queries() under the canonical
    names (minhash_near_dup / simhash_groups)."""
    return {
        **queries(),
        "minhash_near_dup_xxhash64": _minhash_near_dup_xxh,
        "simhash_groups_xxhash64": _simhash_groups_xxh,
    }
