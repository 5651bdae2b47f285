"""Tests for the batched-enrichment pattern (A3) and MERGE-upsert sink."""

from __future__ import annotations

from pyspark.sql import functions as F

from z316_sales_data_pipeline_spark import sinks
from z316_sales_data_pipeline_spark.sources.enrichment import batched_lookup_enrich
from z316_sales_data_pipeline_spark.sources.tables import load_table


def test_batched_enrich_matches_column_algebra(spark, sf_dir):
    """The mapInPandas enrichment with a deterministic fake service
    equals the same derivation done in column algebra."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice").limit(500)

    def fake_fetch(keys):
        # one call per Arrow batch; the closure ships to Python workers
        return {"status": [f"s{k % 3}" for k in keys]}

    got = batched_lookup_enrich(
        orders,
        "o_orderkey",
        fake_fetch,
        "o_orderkey bigint, o_totalprice double, status string",
    )
    want = orders.withColumn("status", F.concat(F.lit("s"), (F.col("o_orderkey") % 3)))
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}


def test_merge_upsert_newest_wins(spark):
    existing = spark.createDataFrame(
        [(1, 1, "old"), (2, 1, "keep")], "id long, v long, payload string"
    )
    updates = spark.createDataFrame(
        [(1, 2, "new"), (3, 1, "insert"), (1, 2, "dup-same-version")],
        "id long, v long, payload string",
    )
    out = {r["id"]: (r["v"], r["payload"]) for r in
           sinks.merge_upsert(existing, updates, "id", "v").collect()}
    assert out[2] == (1, "keep")      # untouched row survives
    assert out[3] == (1, "insert")    # new key inserted
    assert out[1][0] == 2             # newest version won
    assert len(out) == 3              # one row per key


def test_merge_upsert_duplicate_updates_deterministic(spark):
    """Two updates sharing (key, max version) must pick the SAME winner
    on every run regardless of partitioning/task order — the window has
    a stable payload-hash tiebreak past (version, source)."""
    existing = spark.createDataFrame([(1, 0, "orig")], "id long, v long, payload string")
    dup_updates = [(1, 5, "b"), (1, 5, "a"), (1, 5, "c")]
    winners = set()
    for order in (dup_updates, dup_updates[::-1]):
        for n_parts in (1, 7):
            updates = spark.createDataFrame(order, "id long, v long, payload string").repartition(
                n_parts
            )
            rows = sinks.merge_upsert(existing, updates, "id", "v").collect()
            assert len(rows) == 1
            winners.add(rows[0]["payload"])
    assert len(winners) == 1


def test_merge_upsert_idempotent(spark):
    """Re-applying the same updates changes nothing (B7 re-trigger)."""
    existing = spark.createDataFrame([(1, 1, "a"), (2, 2, "b")], "id long, v long, p string")
    updates = spark.createDataFrame([(1, 3, "c")], "id long, v long, p string")
    once = sinks.merge_upsert(existing, updates, "id", "v")
    twice = sinks.merge_upsert(once, updates, "id", "v")
    assert {tuple(r) for r in once.collect()} == {tuple(r) for r in twice.collect()}


def test_repair_run_sink_side_round_trip(spark, tmp_path):
    """VERDICT r3 item 7, sink side: the repair loop against the
    versioned snapshot sink — snapshot the dirty corpus (v=1), detect
    losers with the keep-rule plan, DELETE them into a new snapshot
    (v=2), verify-count like the reference checker, and time-travel
    back to the pre-repair state."""
    from z316_sales_data_pipeline_spark.plans.reconcile import repair_plan

    rows = [
        (1, "src0", "the same text"),
        (2, "src0", "the   SAME text "),  # normalizes equal to doc 1 -> loser
        (3, "src1", "the same text"),     # cross-source dup -> loser
        (4, "src1", "unique text"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    t = str(tmp_path / "docs_snap")
    sinks.write_snapshot(docs, t)  # v=1: dirty corpus

    tagged, losers = repair_plan(docs)
    assert {r["doc_id"] for r in losers.collect()} == {2, 3}

    repaired = sinks.anti_join_delete(
        sinks.read_snapshot(spark, t), losers.select("doc_id"), "doc_id"
    )
    v2 = sinks.write_snapshot(repaired, t)
    assert v2 == 2
    # verify-count (reference api_to_gcs-checker.py:121-128): deleted
    # rows really gone from the live table
    live = sinks.read_snapshot(spark, t)
    assert live.filter(F.col("doc_id").isin(2, 3)).count() == 0
    assert live.count() == 2
    # time travel: pre-repair snapshot intact
    assert sinks.read_snapshot(spark, t, version=1).count() == 4


def test_append_snapshot_segments_and_time_travel(spark, tmp_path):
    """Append-segment sink contract: each append_snapshot lands ONLY
    the new rows as an immutable v=N segment + one pointer flip;
    read_appended(version) returns the union of segments 1..version —
    O(batch) per append (never a table rewrite) with the same atomic
    visibility and time travel as the full-image snapshot sink."""
    import os

    from z316_sales_data_pipeline_spark import sinks

    t = str(tmp_path / "seg")
    assert sinks.append_snapshot(spark.range(0, 3).withColumn("b", F.lit(1)), t) == 1
    assert sinks.append_snapshot(spark.range(3, 5).withColumn("b", F.lit(2)), t) == 2
    assert sinks.append_snapshot(spark.range(5, 9).withColumn("b", F.lit(3)), t) == 3

    assert sinks.read_appended(spark, t).count() == 9  # _LATEST = all segments
    assert sinks.read_appended(spark, t, version=2).count() == 5  # time travel
    assert sinks.read_appended(spark, t, version=1).count() == 3
    # each segment dir holds only its batch (append is O(batch), not a rewrite)
    assert spark.read.parquet(f"{t}/v=3").count() == 4
    with open(f"{t}/_LATEST") as f:
        assert int(f.read().strip()) == 3
    assert sorted(d for d in os.listdir(t) if d.startswith("v=")) == ["v=1", "v=2", "v=3"]


def test_compact_appended_preserves_rows_and_removes_segments(spark, tmp_path):
    """Compaction contract: the union of N segments is rewritten as
    ONE new segment, the pointer flips to it, old segment dirs are
    gone, and read_appended returns the identical rows — the
    small-files rewrite of the append lifecycle (appends stay
    O(batch); compaction bounds segment count)."""
    import os

    from z316_sales_data_pipeline_spark import sinks

    t = str(tmp_path / "seg")
    sinks.append_snapshot(spark.range(0, 3).withColumn("b", F.lit(1)), t)
    sinks.append_snapshot(spark.range(3, 5).withColumn("b", F.lit(2)), t)
    sinks.append_snapshot(spark.range(5, 9).withColumn("b", F.lit(3)), t)
    before = {tuple(r) for r in sinks.read_appended(spark, t).collect()}

    new_v = sinks.compact_appended(spark, t)
    assert new_v == 4
    assert sorted(d for d in os.listdir(t) if d.startswith("v=")) == ["v=4"]
    after = {tuple(r) for r in sinks.read_appended(spark, t).collect()}
    assert after == before and len(after) == 9
    # appends keep working after compaction
    sinks.append_snapshot(spark.range(9, 11).withColumn("b", F.lit(4)), t)
    assert sinks.read_appended(spark, t).count() == 11


def test_vacuum_refuses_append_segment_tables(spark, tmp_path):
    """Footgun guard: vacuum_snapshots deletes superseded full-table
    images, but on an append-segment table every version IS data —
    vacuuming one would silently drop its rows. The _KIND marker makes
    vacuum refuse and point at compact_appended."""
    import pytest as _pytest

    from z316_sales_data_pipeline_spark import sinks

    t = str(tmp_path / "seg")
    sinks.append_snapshot(spark.range(0, 3), t)
    sinks.append_snapshot(spark.range(3, 5), t)
    sinks.append_snapshot(spark.range(5, 9), t)
    with _pytest.raises(ValueError, match="compact_appended"):
        sinks.vacuum_snapshots(t, keep_last=1)
    assert sinks.read_appended(spark, t).count() == 9  # nothing was deleted

    # full-image snapshot tables still vacuum normally
    t2 = str(tmp_path / "img")
    for hi in (3, 5, 9):
        sinks.write_snapshot(spark.range(0, hi), t2)
    assert sinks.vacuum_snapshots(t2, keep_last=1) == [1, 2]


def test_two_phase_handles_empty_and_single_partition_input(spark):
    """Edge pins for the global-ordering primitive: empty input yields
    an empty frame and total 0; a 1-row relation ranks 1/total 1."""
    from z316_sales_data_pipeline_spark.operators import windows as W

    empty = spark.createDataFrame([], "id long, v long")
    out, total = W.two_phase_row_number(empty, [F.col("id").asc()], "r")
    assert total == 0 and out.count() == 0
    out2, tot2 = W.two_phase_running_sum(empty, [F.col("id").asc()], "v", "rs")
    assert tot2 == 0 and out2.count() == 0

    one = spark.createDataFrame([(7, 3)], "id long, v long")
    got, n = W.two_phase_row_number(one, [F.col("id").asc()], "r")
    assert n == 1 and [tuple(r) for r in got.collect()] == [(7, 3, 1)]


def test_two_phase_running_sums_matches_chained_single(spark):
    """Law for the r14 multi-column variant: ONE two-phase pass over
    several value columns is bit-identical to chaining the
    single-column primitive per column (same total order, same
    offsets arithmetic), including negatives, zeros, empty input and
    the per-column grand totals."""
    import random

    from z316_sales_data_pipeline_spark.operators import windows as W

    rnd = random.Random(7)
    rows = [(i, rnd.randint(-5, 9), rnd.randint(0, 3)) for i in range(257)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    order = [F.col("id").asc()]
    multi, totals = W.two_phase_running_sums(
        df, order, {"ca": F.col("a"), "cb": F.col("b")}, num_partitions=7
    )
    s1, ta = W.two_phase_running_sum(df, order, F.col("a"), "ca1", num_partitions=7)
    s2, tb = W.two_phase_running_sum(s1, order, F.col("b"), "cb1", num_partitions=7)
    got = {r["id"]: (r["ca"], r["cb"]) for r in multi.collect()}
    want = {r["id"]: (r["ca1"], r["cb1"]) for r in s2.collect()}
    assert got == want
    assert totals == {"ca": ta, "cb": tb}

    empty = spark.createDataFrame([], "id long, a long, b long")
    out, tot = W.two_phase_running_sums(empty, order, {"ca": "a", "cb": "b"})
    assert out.count() == 0 and tot == {"ca": 0, "cb": 0}


def test_append_snapshot_exactly_once_under_replay(spark, sf_dir, tmp_path):
    """foreachBatch is at-least-once: the same epoch can be re-delivered
    after a crash. With txn_key, a replayed append is a no-op against
    the committed segment, and an uncommitted crash orphan (segment
    written, pointer never flipped) is detected and replaced — the
    Delta txnAppId/txnVersion contract on the append-segment sink."""
    import os
    import shutil

    from z316_sales_data_pipeline_spark import sinks
    from z316_sales_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    base = ev.filter(F.col("event_id") % 3 == 0)
    b1 = ev.filter(F.col("event_id") % 3 == 1)
    b2 = ev.filter(F.col("event_id") % 3 == 2)
    d = str(tmp_path / "t")

    sinks.append_snapshot(base, d)
    v = sinks.append_snapshot(b1, d, txn_key="epoch-1")
    assert v == 2
    n_after_first = sinks.read_appended(spark, d).count()

    # replay of the SAME epoch: no new segment, same rows
    v_replay = sinks.append_snapshot(b1, d, txn_key="epoch-1")
    assert v_replay == 2
    assert sinks.read_appended(spark, d).count() == n_after_first
    assert len([x for x in os.listdir(d) if x.startswith("v=")]) == 2

    # forge a crash: segment written for epoch-2 but pointer never
    # flipped (copy v=2's files as an orphan v=3)
    shutil.copytree(f"{d}/v=2", f"{d}/v=3")
    with open(f"{d}/v=3/_TXN", "w") as f:
        f.write("epoch-2")
    assert int(open(f"{d}/_LATEST").read()) == 2  # reader never sees v=3

    # the replayed epoch-2 append must discard the orphan and commit
    v2 = sinks.append_snapshot(b2, d, txn_key="epoch-2")
    assert v2 == 3
    got = {r["event_id"] for r in sinks.read_appended(spark, d).select("event_id").collect()}
    want = {r["event_id"] for r in ev.select("event_id").collect()}
    assert got == want


def test_compact_appended_removes_crash_orphans_first(spark, tmp_path):
    """r5 ADVICE: an orphan segment ABOVE _LATEST (crash between segment
    write and pointer flip) must be deleted BEFORE compaction numbers
    the new segment — otherwise the compacted segment lands at-or-below
    the orphan and read_appended starts serving never-committed rows."""
    import os
    import shutil

    from z316_sales_data_pipeline_spark import sinks

    t = str(tmp_path / "seg")
    sinks.append_snapshot(spark.range(0, 3).withColumn("b", F.lit(1)), t)
    sinks.append_snapshot(spark.range(3, 5).withColumn("b", F.lit(2)), t)
    # forge the crash: v=3 exists on disk but the pointer still says 2
    shutil.copytree(f"{t}/v=2", f"{t}/v=3")
    assert int(open(f"{t}/_LATEST").read()) == 2

    new_v = sinks.compact_appended(spark, t)
    got = {tuple(r) for r in sinks.read_appended(spark, t).collect()}
    # the orphan's rows (a copy of segment 2) must NOT appear twice;
    # the live table is exactly the 5 committed rows
    assert len(got) == 5
    assert sinks.read_appended(spark, t).count() == 5
    assert sorted(d for d in os.listdir(t) if d.startswith("v=")) == [f"v={new_v}"]


def test_exactly_once_survives_compaction(spark, tmp_path):
    """r5 ADVICE: compaction deletes the folded segments' _TXN markers,
    so committed epoch keys must live on in the table-level _TXNS log —
    an at-least-once replay of a pre-compaction epoch stays a no-op."""
    import os

    from z316_sales_data_pipeline_spark import sinks

    t = str(tmp_path / "seg")
    sinks.append_snapshot(spark.range(0, 3).withColumn("b", F.lit(1)), t, txn_key="epoch-1")
    sinks.append_snapshot(spark.range(3, 5).withColumn("b", F.lit(2)), t, txn_key="epoch-2")
    sinks.compact_appended(spark, t)
    n = sinks.read_appended(spark, t).count()

    # replay of a pre-compaction epoch: no new segment, same rows
    v = sinks.append_snapshot(spark.range(3, 5).withColumn("b", F.lit(2)), t, txn_key="epoch-2")
    assert sinks.read_appended(spark, t).count() == n == 5
    assert v == int(open(f"{t}/_LATEST").read())
    assert len([d for d in os.listdir(t) if d.startswith("v=")]) == 1

    # a genuinely NEW epoch still appends
    sinks.append_snapshot(spark.range(5, 9).withColumn("b", F.lit(3)), t, txn_key="epoch-3")
    assert sinks.read_appended(spark, t).count() == 9
    # and the _TXNS log itself survives a second compaction
    sinks.compact_appended(spark, t)
    sinks.append_snapshot(spark.range(0, 3).withColumn("b", F.lit(1)), t, txn_key="epoch-1")
    assert sinks.read_appended(spark, t).count() == 9


def test_compact_appended_preserves_partition_layout(spark, tmp_path):
    """r5 ADVICE: compacting a hive-partitioned append table (the IVF
    cell layout) must keep the inner partition_by — auto-detected from
    the existing segments — so partition pruning survives compaction
    and later partitioned appends keep a consistent leaf depth."""
    import os

    from z316_sales_data_pipeline_spark import sinks

    t = str(tmp_path / "seg")
    df1 = spark.range(0, 6).withColumn("cell", (F.col("id") % 3).cast("int"))
    df2 = spark.range(6, 10).withColumn("cell", (F.col("id") % 3).cast("int"))
    sinks.append_snapshot(df1, t, partition_by="cell")
    sinks.append_snapshot(df2, t, partition_by="cell")
    before = {tuple(r) for r in sinks.read_appended(spark, t).select("id", "cell").collect()}

    new_v = sinks.compact_appended(spark, t)  # partition_by auto-detected
    seg = f"{t}/v={new_v}"
    assert any(e.startswith("cell=") for e in os.listdir(seg)), "partition layout lost"
    after_df = sinks.read_appended(spark, t)
    assert {tuple(r) for r in after_df.select("id", "cell").collect()} == before
    # pruning still compiles: a cell filter reads only that leaf
    plan = after_df.filter(F.col("cell") == 1)._jdf.queryExecution().executedPlan().toString()
    assert "cell" in plan
    # a subsequent partitioned append keeps the read working (consistent depth)
    sinks.append_snapshot(
        spark.range(10, 12).withColumn("cell", (F.col("id") % 3).cast("int")), t,
        partition_by="cell",
    )
    assert sinks.read_appended(spark, t).count() == 12


def test_pair_graph_fresh_tmp_and_stale_sweep(tmp_path):
    """r5 ADVICE: a crashed build's .tmp-{pid} dir must not pollute a
    later build under a reused pid (_fresh_tmp starts EMPTY), and a
    successful install sweeps dead siblings' leaked disk."""
    import os

    from z316_sales_data_pipeline_spark.plans.pair_graph import _fresh_tmp, _sweep_stale_tmp

    out = str(tmp_path / "table")
    stale = f"{out}.tmp-{os.getpid()}"
    os.makedirs(f"{stale}/v=1")
    with open(f"{stale}/v=1/junk", "w") as f:
        f.write("stale half-built segment")

    tmp = _fresh_tmp(out)
    assert tmp == stale and not os.path.exists(tmp)  # reused pid starts clean

    import time

    os.makedirs(f"{out}.tmp-99999")
    os.makedirs(f"{out}.tmp-12345/v=1")
    with open(f"{out}.tmp-12345/v=1/part", "w") as f:
        f.write("dead segment")
    os.makedirs(f"{out}.tmp-55555")  # a LIVE concurrent builder's dir
    # a long single write phase: the TOP dir's mtime went stale while
    # the live writer kept creating task files under an existing subdir
    os.makedirs(f"{out}.tmp-77777/v=1")
    with open(f"{out}.tmp-77777/v=1/task-file", "w") as f:
        f.write("live write in progress")
    old = time.time() - 7200
    for d in ("99999", "12345"):
        for root, dirs, files in os.walk(f"{out}.tmp-{d}"):
            for name in dirs + files:
                os.utime(os.path.join(root, name), (old, old))
        os.utime(f"{out}.tmp-{d}", (old, old))
    os.utime(f"{out}.tmp-77777", (old, old))  # top stale, nested file fresh
    _sweep_stale_tmp(out)
    assert not os.path.exists(f"{out}.tmp-99999")
    assert not os.path.exists(f"{out}.tmp-12345")
    # r6 ADVICE: a fresh (recently-touched) sibling is a live builder
    # mid-write — the sweep must leave it alone, not fail its write
    assert os.path.exists(f"{out}.tmp-55555")
    # r7 ADVICE: liveness = newest mtime across the TREE, not the top
    # dir — a stale top with a fresh nested task file is a live writer
    assert os.path.exists(f"{out}.tmp-77777")


def test_compaction_marker_closes_double_serve_window(spark, tmp_path, monkeypatch):
    """r6 ADVICE: between compact_appended's pointer flip and its
    old-segment cleanup, a reader of the NEW pointer used to union the
    folded segments PLUS the compacted one — every row twice. The
    _COMPACTED_THROUGH marker (written inside the compacted segment
    BEFORE the flip) makes read_appended skip the folded dirs, so the
    window — and a crash inside it — serves each row exactly once."""
    import os
    import shutil

    from z316_sales_data_pipeline_spark import sinks

    t = str(tmp_path / "seg")
    sinks.append_snapshot(spark.range(0, 3).withColumn("b", F.lit(1)), t)
    sinks.append_snapshot(spark.range(3, 5).withColumn("b", F.lit(2)), t)
    before = {tuple(r) for r in sinks.read_appended(spark, t).collect()}

    # forge the crash-inside-the-window: compaction flips the pointer
    # but dies before any old segment dir is removed
    monkeypatch.setattr(shutil, "rmtree", lambda *a, **k: None)
    new_v = sinks.compact_appended(spark, t)
    monkeypatch.undo()
    assert sorted(d for d in os.listdir(t) if d.startswith("v=")) == ["v=1", "v=2", f"v={new_v}"]
    assert int(open(f"{t}/_LATEST").read()) == new_v
    assert open(f"{t}/v={new_v}/_COMPACTED_THROUGH").read().strip() == "2"

    got = [tuple(r) for r in sinks.read_appended(spark, t).collect()]
    assert len(got) == 5, "folded segments double-served alongside the compacted one"
    assert set(got) == before
    # a later append over the crashed-cleanup state still serves once
    sinks.append_snapshot(spark.range(5, 7).withColumn("b", F.lit(3)), t)
    assert sinks.read_appended(spark, t).count() == 7
    # and the NEXT compaction folds everything (leaked dirs included) cleanly
    v2 = sinks.compact_appended(spark, t)
    assert sorted(d for d in os.listdir(t) if d.startswith("v=")) == [f"v={v2}"]
    assert sinks.read_appended(spark, t).count() == 7


def test_zero_row_first_segment_keeps_partition_detection(spark, tmp_path):
    """r6 ADVICE: append_snapshot of an EMPTY partitioned batch writes
    a marker-only segment (no col=value subdirs). Partition
    auto-detection must scan past it to the first segment with data —
    otherwise compaction flattens a genuinely partitioned table and
    later partitioned appends leave inconsistent leaf depths."""
    import os

    from z316_sales_data_pipeline_spark import sinks

    t = str(tmp_path / "seg")
    empty = spark.range(0).withColumn("cell", (F.col("id") % 3).cast("int"))
    sinks.append_snapshot(empty, t, partition_by="cell")  # zero-row v=1
    df = spark.range(0, 6).withColumn("cell", (F.col("id") % 3).cast("int"))
    sinks.append_snapshot(df, t, partition_by="cell")
    assert sinks._detect_segment_partitioning(t, ["v=1", "v=2"]) == "cell"

    new_v = sinks.compact_appended(spark, t)  # auto-detect must say "cell"
    assert any(e.startswith("cell=") for e in os.listdir(f"{t}/v={new_v}")), (
        "zero-row first segment flattened a partitioned table"
    )
    # later partitioned appends keep a consistent leaf depth under basePath
    sinks.append_snapshot(
        spark.range(6, 9).withColumn("cell", (F.col("id") % 3).cast("int")), t,
        partition_by="cell",
    )
    assert sinks.read_appended(spark, t).count() == 9
    # a truly flat table (data files, no hive dirs) still detects as flat
    t2 = str(tmp_path / "flat")
    sinks.append_snapshot(spark.range(0, 4), t2)
    assert sinks._detect_segment_partitioning(t2, ["v=1"]) is None


def test_cdc_apply_full_crud(spark):
    """CDC MERGE contract: insert (new key), update (newest version
    wins), delete (key removed), delete-beats-upsert at equal version,
    and a no-op delete of an absent key; exact-version upsert ties
    resolve by the lexicographic payload comparison on every run."""
    snap = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id long, p string, q long"
    )
    changes = spark.createDataFrame(
        [
            (2, "upsert", 1, "b1", 21),   # update, loses to v=2 below
            (2, "upsert", 2, "b2", 22),   # update winner
            (3, "delete", 1, None, None),  # delete existing
            (4, "upsert", 1, "d", 40),    # insert new key
            (5, "delete", 1, None, None),  # delete absent key: no-op
            (6, "upsert", 3, "t-lo", 60),  # equal-version tie ...
            (6, "delete", 3, None, None),  # ... delete wins it
            (7, "upsert", 1, "x", 70),    # equal-version payload tie ...
            (7, "upsert", 1, "y", 71),    # ... lexicographic max wins
        ],
        "id long, op string, v long, p string, q long",
    )
    out = {r["id"]: (r["p"], r["q"]) for r in
           sinks.cdc_apply(snap, changes, key="id", op_col="op", version_col="v").collect()}
    assert out == {1: ("a", 10), 2: ("b2", 22), 4: ("d", 40), 7: ("y", 71)}

    # task-order independence of the tie outcome
    for n_parts in (1, 7):
        out2 = {r["id"]: (r["p"], r["q"]) for r in
                sinks.cdc_apply(snap, changes.repartition(n_parts), "id", "op", "v").collect()}
        assert out2 == out
