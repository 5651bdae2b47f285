"""Sink semantics (SURVEY §2.B) — partitioned append, overwrite refresh,
delete emulation.

The reference's BigQuery sink behaviors, re-expressed for a Parquet
lake (Delta would add ACID DELETE/MERGE; vanilla Parquet emulates):

- B2/B3: append into a day-partitioned table, clustering approximated
  by ``sortWithinPartitions`` (Parquet row-group min/max stats then
  give data skipping on the cluster keys).
- B4: truncate-and-reload = ``mode("overwrite")``.
- B6: targeted DELETE = anti-join rewrite + overwrite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_col: str,
    cluster_cols: list[str] | None = None,
    mode: str = "append",
) -> None:
    """B2/B3 — day-partitioned, cluster-sorted append.

    Reference: gcs_to_bq/main.py:193-205 (TimePartitioning DAY) and
    sales_to_bq/main.py:360-363 (clustering_fields). Sorting within
    partitions before write is the Parquet stand-in for BigQuery
    clustering: row-group stats on the sort keys → scan skipping.
    """
    out = df
    if cluster_cols:
        out = out.sortWithinPartitions(*cluster_cols)
    out.write.mode(mode).partitionBy(partition_col).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """B3 (co-location form) — hash-bucketed, bucket-sorted table.

    The other half of BigQuery clustering that ``sortWithinPartitions``
    cannot express: two tables bucketed on the SAME key into the SAME
    bucket count are join-co-located — Catalyst proves the required
    hash distribution from the bucketing metadata and plans the join
    with ZERO Exchange (asserted in tests/test_plan_properties.py).
    At 100 TB this is THE fact-to-fact join strategy: pay the shuffle
    once at write time, amortize it over every subsequent join/agg on
    the bucket key. Requires ``saveAsTable`` (bucket metadata lives in
    the catalog, not the parquet footers).
    """
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    w = w.sortBy(*(sort_cols or [bucket_col]))
    w.format("parquet").saveAsTable(table)


def overwrite_dimension(df: DataFrame, path: str) -> None:
    """B4 — truncate-and-reload full refresh
    (contatos_to_bq/main.py:97-129)."""
    df.write.mode("overwrite").parquet(path)


def delete_where(table: DataFrame, condition: Column) -> DataFrame:
    """B6 — targeted DELETE as a filter rewrite.

    Reference: api_to_gcs-checker.py:106-128 (DELETE WHERE uuid=…, then
    verify count==0). Caller persists the result with overwrite; the
    verification count is ``result.filter(condition).count() == 0``.
    """
    return table.filter(~condition)


def anti_join_delete(table: DataFrame, bad: DataFrame, key: str | list[str]) -> DataFrame:
    """B6 (set form) — remove all rows whose key appears in ``bad``."""
    keys = [key] if isinstance(key, str) else key
    return table.join(bad.select(*keys).distinct(), keys, "left_anti")


def with_day_partition(df: DataFrame, ts_col: str, alias: str = "day") -> DataFrame:
    """Day partition column (BigQuery DAY time-partitioning analogue)."""
    return df.withColumn(alias, F.to_date(F.col(ts_col)))


def merge_upsert(
    existing: DataFrame, updates: DataFrame, key: str | list[str], version_col: str
) -> DataFrame:
    """Idempotent MERGE emulation: newest version per key wins.

    The reference reprocesses events by re-firing the same payload
    through the pipeline (B7, gcs_to_bq-checker.py:62-79) and relies on
    later dedup to repair; a lake sink does it properly — union the
    updates, keep the max-``version_col`` row per key (ties: update
    wins via a source-rank tiebreak; two updates sharing key AND
    version fall through to a stable payload-hash tiebreak so repeated
    runs pick the same winner). Caller overwrites the table with the
    result (Delta's MERGE INTO would do this in place).
    """
    keys = [key] if isinstance(key, str) else key
    from pyspark.sql import Window

    tagged = existing.withColumn("__src", F.lit(0)).unionByName(
        updates.withColumn("__src", F.lit(1))
    )
    payload_cols = [c for c in existing.columns if c not in {*keys, version_col}]
    w = Window.partitionBy(*keys).orderBy(
        F.col(version_col).desc(),
        F.col("__src").desc(),
        # deterministic final tiebreak: without it, duplicate updates
        # (same key, same max version) pick an arbitrary task-order
        # winner and repeated runs can emit different payloads
        F.xxhash64(*payload_cols) if payload_cols else F.lit(0),
    )
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def write_snapshot(
    df: DataFrame,
    table_dir: str,
    partition_by: str | None = None,
    meta: dict[str, str] | None = None,
) -> int:
    """Versioned overwrite: write a NEW immutable snapshot directory
    (``v=N``) and flip the ``_LATEST`` pointer — readers of the old
    version are never disturbed mid-overwrite, and any version can be
    re-read (time travel). This is the atomic-swap half of what Delta's
    log provides, emulated on plain parquet (reference's B4
    truncate-and-reload, contatos_to_bq/main.py:97-129, made safe):
    the vulnerable window shrinks from "whole rewrite" to "one pointer
    file rename". ``partition_by`` lays each version out hive-style on
    that column, so consumers' filters compile to partition pruning
    (the at-rest IVF layout). ``meta`` files (name → content,
    underscore-prefixed names recommended so the parquet scan ignores
    them) land INSIDE the version dir BEFORE the pointer flip — the
    hook exactly-once maintainers need: provenance (e.g. a folded
    epoch id) commits atomically with the snapshot it describes, so a
    crash can never publish a snapshot whose marker says otherwise.
    Returns the new version number.
    """
    import os

    os.makedirs(table_dir, exist_ok=True)
    versions = [
        int(d.split("=", 1)[1])
        for d in os.listdir(table_dir)
        if d.startswith("v=") and d.split("=", 1)[1].isdigit()
    ]
    new_v = max(versions, default=0) + 1
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(f"{table_dir}/v={new_v}")
    for name, content in (meta or {}).items():
        with open(f"{table_dir}/v={new_v}/{name}", "w") as f:
            f.write(content)
    tmp = f"{table_dir}/_LATEST.tmp"
    with open(tmp, "w") as f:
        f.write(str(new_v))
    os.replace(tmp, f"{table_dir}/_LATEST")  # atomic pointer flip
    return new_v


def append_snapshot(
    df: DataFrame,
    table_dir: str,
    partition_by: str | None = None,
    txn_key: str | None = None,
) -> int:
    """B2 streaming append through the versioned pointer: land ``df``
    as a NEW immutable ``v=N`` SEGMENT holding ONLY the appended rows
    and flip ``_LATEST`` — the per-micro-batch cost is O(batch), old
    segments are never rewritten (contrast :func:`write_snapshot`,
    whose versions are full-table images). The logical table at
    version N is the UNION of segments 1..N (:func:`read_appended`);
    the pointer flip keeps the append atomic for readers, exactly the
    add-files half of a Delta/Iceberg commit. Segment tables are
    compacted by :func:`compact_appended` (union → one new segment),
    never by :func:`vacuum_snapshots` — deleting an old segment would
    drop its rows, not an old image — a ``_KIND`` marker makes the
    sink refuse that mistake. Returns the version number holding the
    rows (the new one, or the already-committed one on a replay).

    ``txn_key`` makes the append EXACTLY-ONCE under replays —
    foreachBatch is at-least-once, so a crashed trigger re-delivers
    its epoch and a naive append would double the segment (Delta
    solves this with the ``txnAppId``/``txnVersion`` log entry; the
    marker file is that entry here). With a key (e.g. the epoch id):

    - a segment at-or-below _LATEST carrying the same key is the
      committed result of a previous attempt → no-op, return it;
    - any segment ABOVE _LATEST is an uncommitted orphan from a crash
      between the segment write and the pointer flip — readers have
      never seen it (read_appended cuts at _LATEST) → removed, then
      the append re-runs. The key lands inside the segment dir BEFORE
      the pointer flip, so every committed segment's provenance is on
      disk (underscore-prefixed — invisible to the parquet scan).

    Single-writer-per-table, like every sink here; idempotency is
    against REPLAY of the same logical batch, not concurrent writers."""
    import os
    import shutil

    os.makedirs(table_dir, exist_ok=True)
    latest = 0
    try:
        with open(os.path.join(table_dir, "_LATEST")) as f:
            latest = int(f.read().strip())
    except (OSError, ValueError):
        pass
    segs = {
        int(d.split("=", 1)[1]): d
        for d in os.listdir(table_dir)
        if d.startswith("v=") and d.split("=", 1)[1].isdigit()
    }
    if txn_key is not None:
        for v, d in segs.items():
            if v <= latest:
                try:
                    with open(os.path.join(table_dir, d, "_TXN")) as f:
                        if f.read() == txn_key:
                            return v  # replayed epoch: already committed
                except OSError:
                    pass
        # compaction folds segments (and their _TXN markers) into one new
        # segment; the folded keys live on in the table-level _TXNS log —
        # without this check an at-least-once replay of a pre-compaction
        # epoch would re-append rows the compacted segment already holds
        if txn_key in _committed_txns(table_dir):
            return latest
    for v, d in segs.items():
        if v > latest:  # crash orphan: written but never committed
            shutil.rmtree(os.path.join(table_dir, d), ignore_errors=True)

    new_v = latest + 1
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(f"{table_dir}/v={new_v}")
    if txn_key is not None:
        with open(f"{table_dir}/v={new_v}/_TXN", "w") as f:
            f.write(txn_key)
    tmp = f"{table_dir}/_LATEST.tmp"
    with open(tmp, "w") as f:
        f.write(str(new_v))
    os.replace(tmp, f"{table_dir}/_LATEST")  # atomic commit
    kind = os.path.join(table_dir, "_KIND")
    if not os.path.exists(kind):
        with open(kind, "w") as f:
            f.write("append")
    return new_v


def read_appended(spark, table_dir: str, version: int | None = None) -> DataFrame:
    """Read an append-segment table (:func:`append_snapshot`) AT
    ``version`` (default: _LATEST): the union of segment dirs
    ``v=1..version`` — time travel for append tables. The ``v=N``
    layout IS hive partitioning, so the whole table is ONE partitioned
    scan with ``basePath``: the version cut compiles to a partition
    filter on ``v`` (a time-travel read touches no newer segment's
    files), and any inner ``partition_by`` layout (e.g. the IVF
    ``cell``) keeps pruning through the same scan. No shuffle.

    Compaction awareness (r6 ADVICE): a compacted segment carries a
    ``_COMPACTED_THROUGH`` marker naming the highest version it
    folded. Segments at-or-below the highest applicable marker are
    EXCLUDED from the union — they are the folded originals, already
    represented inside the compacted segment. This closes the
    double-serve window between :func:`compact_appended`'s pointer
    flip and its old-segment cleanup (and makes a crash inside that
    window serve correctly forever, not just until cleanup): a reader
    of the new pointer sees marker+compacted segment and skips the
    not-yet-deleted originals, instead of unioning every row twice.
    The marker scan is O(committed segments) tiny-file reads on the
    driver — the same order as the ``_LATEST`` read itself."""
    import os

    if version is None:
        with open(f"{table_dir}/_LATEST") as f:
            version = int(f.read().strip())
    folded_through = 0
    try:
        seg_vs = [
            int(d.split("=", 1)[1])
            for d in os.listdir(table_dir)
            if d.startswith("v=") and d.split("=", 1)[1].isdigit()
        ]
    except OSError:
        seg_vs = []
    for v in seg_vs:
        if v > version:
            continue  # a newer compaction does not rewrite history below the cut
        try:
            with open(os.path.join(table_dir, f"v={v}", "_COMPACTED_THROUGH")) as f:
                folded_through = max(folded_through, int(f.read().strip()))
        except (OSError, ValueError):
            pass
    cond = F.col("v") <= version
    if folded_through:
        cond = cond & (F.col("v") > folded_through)
    return spark.read.option("basePath", table_dir).parquet(table_dir).filter(cond).drop("v")


def _committed_txns(table_dir: str) -> set[str]:
    """The table-level log of txn keys whose segments were folded away
    by compaction (one key per line in ``_TXNS``). Empty if absent."""
    import os

    try:
        with open(os.path.join(table_dir, "_TXNS")) as f:
            return {line for line in f.read().splitlines() if line}
    except OSError:
        return set()


def _record_txns(table_dir: str, keys: set[str]) -> None:
    """Merge ``keys`` into the ``_TXNS`` log atomically (read-merge-
    replace — single-writer-per-table, like every sink here)."""
    import os

    merged = _committed_txns(table_dir) | keys
    if not merged:
        return
    tmp = os.path.join(table_dir, "_TXNS.tmp")
    with open(tmp, "w") as f:
        f.write("\n".join(sorted(merged)) + "\n")
    os.replace(tmp, os.path.join(table_dir, "_TXNS"))


def _detect_segment_partitioning(table_dir: str, seg_dirs: list[str]) -> str | None:
    """Infer the inner hive partition column of an append-segment
    table from the committed segments' layout: exactly one
    ``col=value`` subdirectory level → that column (e.g. the IVF
    ``cell`` layout). Flat segments → None.

    Scans ALL segments and answers from the first that holds data
    (r6 ADVICE): a zero-row segment (``partitionBy`` of an empty
    batch writes only ``_SUCCESS``, no ``col=value`` subdirs) must
    not make a genuinely partitioned table auto-detect as flat —
    compaction would then flatten it and later partitioned appends
    would leave inconsistent leaf depths under the basePath read."""
    import os

    for d in seg_dirs:
        seg = os.path.join(table_dir, d)
        try:
            entries = os.listdir(seg)
        except OSError:
            continue
        cols = {
            e.split("=", 1)[0]
            for e in entries
            if "=" in e and not e.startswith("_") and os.path.isdir(os.path.join(seg, e))
        }
        if len(cols) == 1:
            return cols.pop()
        if len(cols) > 1:
            return None  # multi-level layout: let the caller pass it explicitly
        # no hive subdirs: flat only if the segment actually has data
        # files; a marker-only (zero-row) segment says nothing — keep
        # scanning
        if any(not e.startswith("_") and not e.startswith(".") for e in entries):
            return None
    return None


def compact_appended(
    spark, table_dir: str, partition_by: str | None = None, transform=None
) -> int:
    """Compaction for an append-segment table: rewrite the union of
    all segments as ONE new segment at version N+1 and delete the old
    segment dirs — the rewrite-half of the append lifecycle
    (:func:`append_snapshot` keeps appends O(batch); unbounded segment
    count eventually costs listing/open overhead, exactly the
    small-files problem OPTIMIZE solves on Delta). Readers are never
    disturbed: the compacted segment lands and the pointer flips
    BEFORE old segments are removed, and read_appended on the new
    pointer sees only the compacted segment (the union of 1..N+1 where
    1..N are gone degrades to exactly segment N+1's rows; a
    mid-compaction reader of the OLD pointer still has its immutable
    dirs until the post-flip cleanup). Time travel to pre-compaction
    versions is traded away — the same trade Delta's VACUUM makes.

    Crash-orphan discipline (r5 ADVICE): any segment ABOVE _LATEST was
    written but never committed (crash between segment write and
    pointer flip) — it is removed FIRST, so the compacted segment's
    number can never land at-or-above an orphan and start serving its
    uncommitted rows.

    Exactly-once across compaction (r5 ADVICE): the _TXN markers of
    the folded segments are merged into the table-level ``_TXNS`` log
    BEFORE the old dirs are deleted, so :func:`append_snapshot` still
    recognizes a replayed pre-compaction epoch as committed.

    Partition layout (r5 ADVICE): ``partition_by`` (or, by default,
    the column auto-detected from the existing segments' hive layout)
    is passed through to the compacted write, so compacting e.g. the
    cell-partitioned IVF table preserves partition pruning and keeps
    future partitioned appends at a consistent leaf depth for the
    basePath read.

    Double-serve closure (r6 ADVICE): the compacted segment carries a
    ``_COMPACTED_THROUGH`` marker (the highest folded version),
    written INSIDE the segment dir before the pointer flip, and
    :func:`read_appended` excludes marker-covered segments from the
    union. So a reader of the NEW pointer in the window between the
    flip and the old-segment cleanup — or after a crash inside that
    window — serves each row exactly once; a reader of the OLD
    pointer keeps its immutable dirs as before. The ``_TXNS`` merge
    also moves BEFORE the flip now: a crash after it leaves folded
    keys present in both the log and the still-live ``_TXN`` markers
    (idempotent), never in neither.

    ``transform`` (r14): an optional DataFrame→DataFrame applied to
    the union before the compacted write — the REBUILD form of
    compaction (e.g. the IVF retrain sink reassigns every folded
    vector to a fresh quantizer's cells in the same atomic
    fold-and-flip; all the crash/replay discipline above applies
    unchanged because the rewrite is still one new segment + marker +
    pointer flip). The transform must preserve row identity for the
    _TXNS replay contract to stay meaningful (relabel/reproject,
    never filter).

    Returns the new version number."""
    import os
    import shutil

    with open(f"{table_dir}/_LATEST") as f:
        latest = int(f.read().strip())
    segs = {
        int(d.split("=", 1)[1]): d
        for d in os.listdir(table_dir)
        if d.startswith("v=") and d.split("=", 1)[1].isdigit()
    }
    for v, d in segs.items():
        if v > latest:  # crash orphan: written but never committed
            shutil.rmtree(os.path.join(table_dir, d), ignore_errors=True)
    old = [d for v, d in sorted(segs.items()) if v <= latest]
    if partition_by is None:
        partition_by = _detect_segment_partitioning(table_dir, old)
    folded_txns = set()
    for d in old:
        try:
            with open(os.path.join(table_dir, d, "_TXN")) as f:
                folded_txns.add(f.read())
        except OSError:
            pass
    # localCheckpoint pins the union's rows before any segment dir is
    # touched (the write below must not lazily re-read dirs mid-delete)
    merged = read_appended(spark, table_dir, version=latest)
    if transform is not None:
        merged = transform(merged)
    merged = merged.localCheckpoint(eager=True)
    new_v = latest + 1
    w = merged.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(f"{table_dir}/v={new_v}")
    # marker + txn log land before the flip: from the instant the new
    # pointer is visible, readers already know to skip the folded dirs
    with open(f"{table_dir}/v={new_v}/_COMPACTED_THROUGH", "w") as f:
        f.write(str(latest))
    _record_txns(table_dir, folded_txns)
    tmp = f"{table_dir}/_LATEST.tmp"
    with open(tmp, "w") as f:
        f.write(str(new_v))
    os.replace(tmp, f"{table_dir}/_LATEST")  # atomic commit
    for d in old:
        shutil.rmtree(f"{table_dir}/{d}", ignore_errors=True)
    return new_v


def committed_segment_count(table_dir: str) -> int:
    """Number of committed segments (``v<=_LATEST`` dirs) of an
    append-segment table — the read-amplification factor a
    :func:`read_appended` pays in scheduling + parquet-footer reads."""
    import os

    try:
        with open(os.path.join(table_dir, "_LATEST")) as f:
            latest = int(f.read().strip())
    except (OSError, ValueError):
        return 0
    return sum(
        1
        for d in os.listdir(table_dir)
        if d.startswith("v=") and d.split("=", 1)[1].isdigit() and int(d.split("=", 1)[1]) <= latest
    )


def maybe_compact(
    spark, table_dir: str, max_segments: int = 16, partition_by: str | None = None
) -> int | None:
    """Read-amplification bound for append-segment tables (r5 VERDICT
    item 5): every append adds one segment, and a serve-side
    :func:`read_appended` unions them all — without a policy the
    segment count (and with it listing, footer reads and task-launch
    overhead) grows without bound under continuous ingestion. Policy:
    fold when the committed segment count EXCEEDS ``max_segments``.
    The rewrite is O(table) but amortized to one per ``max_segments``
    appends, so amortized maintenance stays O(batch) while serve reads
    touch ≤ max_segments + 1 segment dirs. Delta/Iceberg OPTIMIZE
    scheduling makes the same trade; exactly-once txn keys survive the
    fold through the table-level ``_TXNS`` log. Called from the same
    single writer that appends (e.g. the foreachBatch maintenance
    loop, after its append). Returns the new version when a compaction
    ran, else None."""
    if committed_segment_count(table_dir) <= max_segments:
        return None
    return compact_appended(spark, table_dir, partition_by=partition_by)


def merge_into_snapshot(
    spark,
    table_dir: str,
    updates: DataFrame,
    key: str | list[str],
    version_col: str,
) -> int:
    """Transactional MERGE emulation on the snapshot sink: read the
    _LATEST snapshot, apply :func:`merge_upsert`, write it as a NEW
    immutable ``v=N+1`` and flip the pointer. Completes the emulated
    ACID story (reference: api_to_gcs-checker.py:106-128
    delete-and-verify): concurrent readers of v=N are never disturbed —
    their files are immutable — and time travel to any prior version
    still works. The merge itself is one shuffle (the row_number window
    over the key); the snapshot write is append-only at the directory
    level, so a crashed merge leaves _LATEST untouched and is simply
    retried. Returns the new version number.
    """
    existing = read_snapshot(spark, table_dir)
    merged = merge_upsert(existing, updates, key, version_col)
    return write_snapshot(merged, table_dir)


def read_snapshot(spark, table_dir: str, version: int | None = None) -> DataFrame:
    """Read a snapshot table at ``version`` (default: the _LATEST
    pointer) — the time-travel read path for :func:`write_snapshot`."""
    if version is None:
        with open(f"{table_dir}/_LATEST") as f:
            version = int(f.read().strip())
    return spark.read.parquet(f"{table_dir}/v={version}")


def vacuum_snapshots(table_dir: str, keep_last: int = 2) -> list[int]:
    """Retention for the snapshot sink: delete all but the newest
    ``keep_last`` versions (the VACUUM half of the emulated Delta
    lifecycle — unbounded version history is a storage leak at lake
    scale). The version the _LATEST pointer names is always retained
    regardless of ``keep_last``; a missing _LATEST (e.g. crash before
    the first pointer flip) degrades to keeping the max version. The
    contiguous-suffix guarantee holds when _LATEST points at the max
    version (the only state :func:`write_snapshot` produces); a stale
    non-max pointer — possible only after manual rollback — keeps that
    pinned version as an extra island, by design: the pointed-at
    snapshot must stay readable. Deletion walks oldest-first so a crash
    mid-vacuum still leaves every kept version readable. Returns the
    deleted version numbers.
    """
    import os
    import shutil

    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    kind = os.path.join(table_dir, "_KIND")
    if os.path.exists(kind):
        with open(kind) as f:
            if f.read().strip() == "append":
                raise ValueError(
                    "vacuum_snapshots on an append-segment table would DELETE"
                    " DATA (old versions are segments, not superseded images);"
                    " use compact_appended to bound segment count instead"
                )
    versions = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(table_dir)
        if d.startswith("v=") and d.split("=", 1)[1].isdigit()
    )
    try:
        with open(f"{table_dir}/_LATEST") as f:
            latest = int(f.read().strip())
    except FileNotFoundError:
        latest = max(versions, default=None)
    keep = set(versions[len(versions) - keep_last :]) if versions else set()
    if latest is not None:
        keep.add(latest)
    doomed = [v for v in versions if v not in keep]
    for v in doomed:
        shutil.rmtree(f"{table_dir}/v={v}")
    return doomed


def stats_manifest(spark, path: str, stat_cols: list[str]) -> DataFrame:
    """Per-file statistics manifest for a written parquet table: one
    row per physical file with row count and min/max of ``stat_cols``.

    The seed of a lakehouse table format (Delta/Iceberg keep exactly
    this in their logs): an external planner reads the manifest instead
    of footers to prune files. Built as ONE scan grouped by
    ``input_file_name()`` — distributed, no driver file loop; at lake
    scale the scan is metadata-cheap because only ``stat_cols`` are
    read.
    """
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in stat_cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.groupBy(F.input_file_name().alias("file")).agg(*aggs)


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton (Z-order) key: bit-interleave ``bits`` top bits of each
    already-normalized integer column (callers scale values to
    [0, 2^bits)). Pure shift/mask column arithmetic — codegen, no UDF.

    Bit j of column c lands at position j*n_cols + c, so sorting by the
    key clusters rows that are close in EVERY dimension — each parquet
    file then has tight min/max stats on all z-columns at once, where a
    single-column sort gives tight stats on one column only.
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(
            f"zorder_key: {n} cols × {bits} bits = {n * bits} interleaved bits "
            "overflows the 63-bit positive long range (keys would go negative "
            "and break the clustering sort order); reduce bits to "
            f"<= {63 // n}"
        )
    key = F.lit(0).cast("long")
    for c_idx, c in enumerate(cols):
        for j in range(bits):
            bit = F.shiftright(c.cast("long"), j).bitwiseAND(F.lit(1).cast("long"))
            key = key + F.shiftleft(bit, j * n + c_idx)
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    bits: int = 16,
    n_files: int | None = None,
) -> None:
    """Z-order clustered write: multi-dimensional data skipping.

    BigQuery clustering / Delta Z-ORDER analogue for a plain Parquet
    lake: scale each cluster column to a ``bits``-bit rank via its
    global min/max (one tiny agg, broadcast back), bit-interleave into
    a Morton key, range-partition + sort by it, write. Every file then
    covers a small hyper-rectangle of the key space, so a predicate on
    ANY z-column prunes most files from their row-group stats — the
    property a single-column ``sortWithinPartitions`` only gives the
    leading column.

    One pass for stats + one shuffle (the range partitioner), same cost
    shape as the sort a clustered write needs anyway.
    """
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"__mn_{c}") for c in zorder_cols],
        *[F.max(c).cast("double").alias(f"__mx_{c}") for c in zorder_cols],
    )
    scaled_cols = []
    top = (1 << bits) - 1
    for c in zorder_cols:
        mn, mx = F.col(f"__mn_{c}"), F.col(f"__mx_{c}")
        span = F.when(mx > mn, mx - mn).otherwise(F.lit(1.0))
        scaled_cols.append(
            F.least(
                F.floor((F.col(c).cast("double") - mn) / span * (top + 1)).cast("long"),
                F.lit(top).cast("long"),
            )
        )
    keyed = df.crossJoin(F.broadcast(stats)).withColumn(
        "__zkey", zorder_key(scaled_cols, bits)
    )
    parts = n_files or df.sparkSession.sparkContext.defaultParallelism
    (
        keyed.repartitionByRange(parts, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey", *[f"__mn_{c}" for c in zorder_cols], *[f"__mx_{c}" for c in zorder_cols])
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_partitions(
    df: DataFrame,
    path: str,
    partition_col: str,
    target_rows_per_file: int = 1_000_000,
) -> None:
    """Small-file compaction: rewrite with file counts sized to the data.

    Streaming appends (B2) leave one file per micro-batch per partition;
    at lake scale that is millions of kilobyte files and scan startup
    dominates. Rewrite each day-partition into
    ceil(rows / target_rows_per_file) files by repartitioning on
    (partition, deterministic hash slot) — no global sort, one shuffle,
    output file count independent of input file count. The slot is
    pmod(xxhash64(whole row), n_files) rather than rand(): per-task
    rand re-seeding skews slot distribution on task retry, while the
    hash slot is a pure function of the data (same rows → same files,
    retried or not).
    """
    per_part = df.groupBy(partition_col).count()
    # driver-side only the (partition, n_files) pairs — O(#partitions),
    # not O(rows); the row data itself never leaves the executors
    plan = {
        r[0]: max(1, -(-r[1] // target_rows_per_file)) for r in per_part.collect()
    }
    n_files = F.coalesce(
        *[
            F.when(F.col(partition_col) == p, F.lit(n)).otherwise(F.lit(None))
            for p, n in plan.items()
        ]
    ) if plan else F.lit(1)
    salted = df.withColumn(
        "__slot", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), n_files)
    )
    (
        salted.repartition(F.col(partition_col), F.col("__slot"))
        .drop("__slot")
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(path)
    )


def snapshot_meta(table_dir: str, name: str, version: int | None = None) -> str | None:
    """Read a ``meta`` file written by :func:`write_snapshot` from the
    ``version`` (default: _LATEST) snapshot dir; None if absent."""
    import os

    try:
        if version is None:
            with open(os.path.join(table_dir, "_LATEST")) as f:
                version = int(f.read().strip())
        with open(os.path.join(table_dir, f"v={version}", name)) as f:
            return f.read()
    except (OSError, ValueError):
        return None


def cdc_apply(
    snapshot: DataFrame,
    changes: DataFrame,
    key: str | list[str],
    op_col: str,
    version_col: str,
) -> DataFrame:
    """Apply a CDC change batch (upserts AND deletes) to a snapshot —
    the full MERGE WHEN MATCHED THEN UPDATE/DELETE WHEN NOT MATCHED
    THEN INSERT semantics :func:`merge_upsert` lacks (it has no delete
    arm). ``changes`` rows carry ``op_col`` in ('upsert', 'delete')
    plus the full payload; per key the max-``version_col`` change wins
    (ties: delete beats upsert — the conservative reading of an
    ambiguous feed — then a stable payload-hash tiebreak, same
    discipline as merge_upsert).

    Shape at scale: ONE key-partitioned reduction of the change batch
    (a struct-max hash aggregate — the LPA lesson: no row_number sort
    for a single extreme row), then an anti-join to drop every
    snapshot row whose key changed and a union of the winning upserts.
    O(snapshot + changes), no window sort, no per-key loop. Caller
    overwrites the table with the result (Delta's MERGE INTO in
    place); reference B6/B7 do the delete/re-trigger halves
    imperatively (api_to_gcs-checker.py:106-128).
    """
    keys = [key] if isinstance(key, str) else key
    payload_cols = [c for c in snapshot.columns if c not in keys]
    winners = cdc_winners(changes, keys, payload_cols, op_col, version_col)
    upserts = winners.filter(F.col("__w.d") == 0).select(
        *keys, *[F.col(f"__w.p.{c}").alias(c) for c in payload_cols]
    )
    untouched = snapshot.join(winners.select(*keys), keys, "left_anti")
    return untouched.unionByName(upserts.select(*snapshot.columns))


def cdc_winners(
    changes: DataFrame,
    keys: list[str],
    payload_cols: list[str],
    op_col: str,
    version_col: str,
) -> DataFrame:
    """One winning change row per key, as (keys..., __w struct): max of
    (version, is_delete, payload-struct) — losing changes die inside
    the aggregate (no row_number sort); deletes outrank upserts at
    equal version, and exact-version ties fall to the lexicographic
    payload comparison (engine-portable, unlike a hash tiebreak: an
    oracle can state the same ordering as ORDER BY the payload
    columns). Shared by :func:`cdc_apply` and the retractable-MV
    maintenance in ``operators/ivm.py``."""
    pick = F.max(
        F.struct(
            F.col(version_col).alias("v"),
            (F.col(op_col) == "delete").cast("int").alias("d"),
            F.struct(*[F.col(c) for c in payload_cols]).alias("p"),
        )
    ).alias("__w")
    return changes.groupBy(*keys).agg(pick)
