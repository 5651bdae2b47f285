"""Multimodal plumbing + sink semantics tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from z316_sales_data_pipeline_spark import sinks
from z316_sales_data_pipeline_spark.operators import multimodal
from z316_sales_data_pipeline_spark.sources.tables import load_table


def _media(spark):
    data = [
        (1, b"x" * 640, "image", "synth://a"),
        (2, b"y" * 100, "audio", "synth://b"),
        (3, None, "image", "synth://c"),
    ]
    return spark.createDataFrame(data, multimodal.MEDIA_SCHEMA)


def test_extract_features_arrow_path(spark):
    out = {r["media_id"]: r for r in multimodal.extract_features(_media(spark)).collect()}
    assert out[1]["n_bytes"] == 640
    assert out[1]["fake_width"] == 0  # 640 % 640
    assert out[2]["n_bytes"] == 100
    assert out[2]["byte_checksum"] == (100 * 131) % 2147483647
    assert out[3]["n_bytes"] is None  # null payload tolerated


def test_extract_features_matches_stub_decode(spark):
    """The vectorized batch kernel must stay value-identical to the
    per-row stub_decode contract."""
    rows = {r["media_id"]: r for r in multimodal.extract_features(_media(spark)).collect()}
    for mid, payload in [(1, b"x" * 640), (2, b"y" * 100)]:
        expected = multimodal.stub_decode(payload)
        for k, v in expected.items():
            assert rows[mid][k] == v, (mid, k)


def test_real_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        multimodal.real_decode(b"")


def test_frame_sample_plan(spark):
    out = multimodal.frame_sample_plan(_media(spark).filter("media_id = 1"), every_nth=2)
    rows = out.collect()
    # 640 bytes -> 6 frames, sampled every 2nd -> indices 0,2,4
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    """B3 — day-partitioned write; reading one day scans one partition."""
    ev = load_table(spark, sf_dir, "events").limit(500)
    out = str(tmp_path / "events_table")
    sinks.write_partitioned(
        sinks.with_day_partition(ev, "ts"), out, "day", cluster_cols=["user_id"]
    )
    re_read = spark.read.parquet(out)
    one_day = re_read.filter(F.col("day") == "2024-01-01")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert one_day.count() > 0
    # partition pruning shows in the file scan's partition filters
    assert "day" in plan


def test_run_sales_pipeline_multi_sink(spark, sf_dir, tmp_path):
    """S6 — one facts DAG fanned out to two partitioned sinks (SURVEY §3.1)."""
    from z316_sales_data_pipeline_spark.plans.pipeline import run_sales_pipeline

    counts = run_sales_pipeline(spark, sf_dir, str(tmp_path / "out"))
    assert counts["pedidos"] > 0
    assert counts["itens_pedido"] >= counts["pedidos"]
    pedidos = spark.read.parquet(str(tmp_path / "out" / "pedidos"))
    # lineage columns present (C6); day partition column exists (B3)
    for c in ("uuid", "source_id", "update_timestamp", "pedido_dia"):
        assert c in pedidos.columns


def test_snapshot_write_time_travel(spark, tmp_path):
    """Versioned overwrite: the latest pointer flips atomically, every
    old version stays readable (time travel), and a third write never
    rewrites prior snapshots."""
    tbl = str(tmp_path / "dim")
    v1 = sinks.write_snapshot(spark.range(10).withColumnRenamed("id", "k"), tbl)
    v2 = sinks.write_snapshot(spark.range(3).withColumnRenamed("id", "k"), tbl)
    assert (v1, v2) == (1, 2)
    assert sinks.read_snapshot(spark, tbl).count() == 3  # latest = v2
    assert sinks.read_snapshot(spark, tbl, version=1).count() == 10  # time travel
    v3 = sinks.write_snapshot(spark.range(7).withColumnRenamed("id", "k"), tbl)
    assert v3 == 3 and sinks.read_snapshot(spark, tbl).count() == 7
    assert sinks.read_snapshot(spark, tbl, version=1).count() == 10  # v1 untouched


def test_merge_into_snapshot_acid_with_concurrent_reader(spark, tmp_path):
    """MERGE against the snapshot sink: snapshot v1 → merge (update one
    key + insert a new key) → v2, while a reader that bound to v1
    BEFORE the merge still collects the original rows afterwards, and
    time travel to v1 returns the pre-merge table."""
    tbl = str(tmp_path / "dim")
    base = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 1)], "k long, payload string, ver long"
    )
    v1 = sinks.write_snapshot(base, tbl)
    assert v1 == 1

    reader_v1 = sinks.read_snapshot(spark, tbl)  # bound before the merge

    updates = spark.createDataFrame(
        [(2, "b2", 2), (4, "d", 1)], "k long, payload string, ver long"
    )
    v2 = sinks.merge_into_snapshot(spark, tbl, updates, key="k", version_col="ver")
    assert v2 == 2

    merged = {
        (r["k"], r["payload"], r["ver"])
        for r in sinks.read_snapshot(spark, tbl).collect()
    }
    assert merged == {(1, "a", 1), (2, "b2", 2), (3, "c", 1), (4, "d", 1)}
    # the concurrent reader's files were never touched
    pre = {(r["k"], r["payload"], r["ver"]) for r in reader_v1.collect()}
    assert pre == {(1, "a", 1), (2, "b", 1), (3, "c", 1)}
    # and explicit time travel agrees
    old = {
        (r["k"], r["payload"], r["ver"])
        for r in sinks.read_snapshot(spark, tbl, version=1).collect()
    }
    assert old == pre


def test_stats_manifest_covers_every_file(spark, sf_dir, tmp_path):
    """The manifest has one row per physical file, row counts sum to
    the table count, and min/max bound the file contents (the pruning
    contract an external planner relies on)."""
    import glob

    ev = load_table(spark, sf_dir, "events").limit(2000)
    out = str(tmp_path / "tbl")
    ev.repartition(4).write.parquet(out)
    n_written = spark.read.parquet(out).count()
    man = {r["file"]: r for r in sinks.stats_manifest(spark, out, ["user_id", "value"]).collect()}
    files = {f"file://{p}" for p in glob.glob(f"{out}/*.parquet")}
    assert set(man) == files
    assert sum(r["n_rows"] for r in man.values()) == n_written > 0
    g = spark.read.parquet(out).agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).collect()[0]
    assert min(r["min_user_id"] for r in man.values()) == g[0]
    assert max(r["max_user_id"] for r in man.values()) == g[1]
    assert min(r["min_value"] for r in man.values()) == g[2]
    assert max(r["max_value"] for r in man.values()) == g[3]


def test_overwrite_dimension(spark, tmp_path):
    out = str(tmp_path / "dim")
    df1 = spark.range(10).withColumnRenamed("id", "k")
    df2 = spark.range(3).withColumnRenamed("id", "k")
    sinks.overwrite_dimension(df1, out)
    sinks.overwrite_dimension(df2, out)
    assert spark.read.parquet(out).count() == 3  # B4 truncate-and-reload


def test_vacuum_snapshots_retention(spark, tmp_path):
    """Vacuum keeps the newest keep_last versions (always including
    _LATEST), deletes the rest, reports what it deleted; time travel
    within the retention window still works and the latest read is
    undisturbed."""
    import pytest as _pytest

    from z316_sales_data_pipeline_spark import sinks

    t = str(tmp_path / "snap")
    for i in range(4):
        df = spark.createDataFrame([(i, f"val{i}")], "id long, v string")
        sinks.write_snapshot(df, t)
    deleted = sinks.vacuum_snapshots(t, keep_last=2)
    assert deleted == [1, 2]
    # latest (v=4) and the retained v=3 read fine
    assert sinks.read_snapshot(spark, t).collect()[0]["v"] == "val3"
    assert sinks.read_snapshot(spark, t, version=3).collect()[0]["v"] == "val2"
    # vacuumed versions are gone
    import os

    assert not os.path.exists(f"{t}/v=1") and not os.path.exists(f"{t}/v=2")
    with _pytest.raises(ValueError):
        sinks.vacuum_snapshots(t, keep_last=0)


def test_vacuum_snapshots_degraded_pointer_states(spark, tmp_path):
    """ADVICE r3 hardening: a missing _LATEST degrades to keeping the
    max version (no crash); a stale non-max _LATEST keeps the pinned
    version in addition to the newest keep_last."""
    import os

    from z316_sales_data_pipeline_spark import sinks

    t = str(tmp_path / "snap")
    for i in range(4):
        df = spark.createDataFrame([(i,)], "id long")
        sinks.write_snapshot(df, t)
    # missing pointer: keep_last=1 keeps only the max version
    os.remove(f"{t}/_LATEST")
    assert sinks.vacuum_snapshots(t, keep_last=1) == [1, 2, 3]
    assert os.path.exists(f"{t}/v=4")
    # rebuild, then a stale pointer at v=1: pinned version survives
    t2 = str(tmp_path / "snap2")
    for i in range(4):
        sinks.write_snapshot(spark.createDataFrame([(i,)], "id long"), t2)
    with open(f"{t2}/_LATEST", "w") as f:
        f.write("1")
    assert sinks.vacuum_snapshots(t2, keep_last=1) == [2, 3]
    assert os.path.exists(f"{t2}/v=1") and os.path.exists(f"{t2}/v=4")
    assert sinks.read_snapshot(spark, t2).collect()[0]["id"] == 0
