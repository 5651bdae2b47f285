"""Structured Streaming drivers (SURVEY §2.I).

The reference is an event-driven system (webhook → GCS event → Pub/Sub
→ loaders). Spark-side that is ONE streaming query per stage group:
file-source readStream → the SAME batch transforms → foreachBatch
multi-sink. Batch/stream share code verbatim (S3: backfill is the same
query under Trigger.AvailableNow).

Windowed aggregations over the ``events`` table (tumbling/sliding/
session + watermark) are the engine's extension beyond the reference
(which defers all time bucketing to BigQuery day partitions).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _read_commit(path: str) -> tuple[int, int] | None:
    """(epoch, max_id) from a gate-sink commit marker: ONE file whose
    single line is ``epoch:maxid``. The pair advances together in one
    atomic ``os.replace`` (ADVICE r13, medium): with two separate
    marker files a crash between the maxid and epoch writes left the
    maxid at the crashed epoch's own maximum while the epoch marker
    still named the previous epoch — every replay of the crashed epoch
    then tripped the late/reordered-id refusal against its OWN ids and
    wedged the stream, contradicting the documented replay contract.
    Missing/corrupt file reads as None (fresh state)."""
    try:
        with open(path) as f:
            ep, mx = f.read().strip().split(":")
            return int(ep), int(mx)
    except (OSError, ValueError):
        return None


def _write_commit(path: str, epoch: int, max_id: int) -> None:
    """Atomically commit a gate epoch: epoch marker and folded-maximum
    id land in one ``os.replace`` so no crash window can separate
    them (the _LATEST pointer discipline)."""
    import os

    tmp = f"{path}.tmp"
    with open(tmp, "w") as f:
        f.write(f"{int(epoch)}:{int(max_id)}")
    os.replace(tmp, path)


def file_stream(spark: SparkSession, path: str, schema, fmt: str = "json") -> DataFrame:
    """A2 — file-notification source (GCS-finalize analogue).

    ``maxFilesPerTrigger`` is the engine's rate limiting (S5) — the
    declarative replacement for the reference's sleep()-based pacing.
    """
    return (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", 1000)
        .load(path)
    )


def run_multi_sink(
    stream_df: DataFrame,
    sinks: dict[str, Callable[[DataFrame], None]],
    checkpoint: str,
    available_now: bool = True,
):
    """S6 — one source fanned out to N sinks inside foreachBatch.

    Reference: gcs_to_bq/main.py:351-372 (one Pub/Sub message → pdv +
    produto×N + pesquisa tables). foreachBatch gives exactly-once per
    sink when each write is idempotent (overwrite-by-partition or
    dedup-keyed append).
    """

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.persist()
        try:
            for _, write in sinks.items():
                write(batch_df)
        finally:
            batch_df.unpersist()

    writer = stream_df.writeStream.foreachBatch(_process).option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_stream(stream_df: DataFrame, key_cols: list[str], event_time: str, watermark: str) -> DataFrame:
    """S2 — exactly-once-ish ingest guard.

    The reference's pre-publish dedup (backfill/api_to_gcs-backfill.py
    :120-126) becomes watermarked dropDuplicates: state is bounded by
    the watermark horizon instead of an unbounded Python set.
    """
    return stream_df.withWatermark(event_time, watermark).dropDuplicates(key_cols)


def interval_join_stream(
    purchases: DataFrame,
    clicks: DataFrame,
    key: str = "user_id",
    lower_s: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: each purchase joined to same-user
    clicks in the preceding ``lower_s`` seconds.

    The time-range condition plus BOTH watermarks lets Spark bound the
    join state on each side (clicks older than purchase-watermark −
    lower_s are evicted) — without them a stream-stream join's state
    grows forever. Batch twin: operators.joins.range_join_bucketed
    (tested equal). Columns: purchases(event_id, user_id, ts),
    clicks(user_id, click_ts, click_value).
    """
    p = purchases.withWatermark("ts", watermark)
    c = clicks.withWatermark("click_ts", watermark)
    cond = (
        (p[key] == c[key])
        & (F.col("click_ts") >= F.col("ts") - F.expr(f"INTERVAL {lower_s} SECOND"))
        & (F.col("click_ts") < F.col("ts"))
    )
    return p.join(c, cond, "inner").select(
        p[key].alias(key), "event_id", "ts", "click_ts", "click_value"
    )


def tumbling_counts(events: DataFrame, window_len: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window aggregate over the events stream.

    Works identically on a batch DataFrame (window() is just an
    expression) — the batch twin is what the oracle checks.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_len).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("event_type"),
            F.col("n"),
            F.col("total_value"),
        )
    )


def running_user_totals(stream_df: DataFrame) -> DataFrame:
    """Custom stateful operator: cumulative per-user count/total across
    micro-batches, via ``applyInPandasWithState``.

    The pattern for operators Spark's built-ins can't express (running
    aggregates emitted every batch, custom eviction, session models
    beyond session_window): state lives per group key in the state
    store, the function sees Arrow-batched pandas frames, and output
    mode 'update' emits one row per touched key per batch. State is a
    single (n, total) tuple per user — O(keys), not O(events).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id bigint, n_events bigint, total_value double"
    state_schema = "n bigint, total double"

    def fn(key: tuple, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
        )

    return stream_df.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def session_totals_with_timeout(stream_df: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Custom sessionizer with EXPLICIT state eviction — the
    applyInPandasWithState timeout contract that ``session_window``
    hides: per-user session state (start, end, n, total) emits ONE
    closed-session row when the event-time watermark passes the last
    event + gap, then the state is removed. Event-time timeouts (not
    wall clock) keep the behavior deterministic and replayable.

    State is O(active users); emission is append-mode (closed sessions
    only), so the sink sees each session exactly once.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "user_id bigint, session_start timestamp, session_end timestamp, "
        "n_events bigint, total_value double"
    )
    state_schema = "start timestamp, end timestamp, n bigint, total double"
    gap_ms = gap_minutes * 60 * 1000

    gap_delta = pd.Timedelta(milliseconds=gap_ms)

    def fn(key: tuple, pdfs, state: GroupState):
        if state.hasTimedOut:
            start, end, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [start],
                    "session_end": [end],
                    "n_events": [n],
                    "total_value": [round(total, 4)],
                }
            )
            return
        # Sessions must split on the gap WITHIN a batch too, or output
        # would depend on micro-batch alignment: sort by event time,
        # break a segment wherever consecutive events are > gap apart,
        # emit every closed segment now, and keep only the trailing open
        # segment in state (its timeout closes it when the watermark
        # passes end + gap).
        rows = pd.concat(list(pdfs))
        rows = rows.assign(__ts=pd.to_datetime(rows["ts"])).sort_values("__ts")
        seg_id = (rows["__ts"].diff() > gap_delta).cumsum()
        segs = [
            (g["__ts"].iloc[0], g["__ts"].iloc[-1], len(g), float(g["value"].sum()))
            for _, g in rows.groupby(seg_id, sort=True)
        ]
        if state.exists:
            start, end, n, total = state.get
            f_start, f_end, f_n, f_total = segs[0]
            if f_start - pd.Timestamp(end) <= gap_delta:
                segs[0] = (min(pd.Timestamp(start), f_start), max(pd.Timestamp(end), f_end),
                           n + f_n, total + f_total)
            else:
                segs.insert(0, (pd.Timestamp(start), pd.Timestamp(end), n, total))
        *closed, (o_start, o_end, o_n, o_total) = segs
        state.update((o_start, o_end, o_n, o_total))
        # evict when the watermark passes the open session's last event + gap
        state.setTimeoutTimestamp(int(o_end.timestamp() * 1000) + gap_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "session_start": [c[0] for c in closed],
                    "session_end": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                    "total_value": [round(c[3], 4) for c in closed],
                }
            )

    return (
        stream_df.withWatermark("ts", "0 seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def sliding_counts(
    events: DataFrame,
    window_len: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked sliding-window aggregate (overlapping windows).

    Each event lands in window_len/slide windows; Spark expands the
    row per window epoch-aligned to the slide. Batch twin = the same
    expression, which is what the oracle checks (DuckDB reproduces the
    expansion with generate_series over the slide index).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_len, slide).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col("event_type"),
            F.col("n"),
            F.col("total_value"),
        )
    )


def session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Sessionization via session_window (stateful in streaming; plain
    aggregate in batch)."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("session_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            F.col("user_id"),
            F.col("n_events"),
            F.col("session_value"),
        )
    )


def scd2_history_sink(
    table_dir: str,
    key: str,
    attr: str,
    ts: str,
    tiebreak: str,
    events_dir: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch maintainer for an AT-REST SCD2 history: each
    micro-batch folds into the versioned snapshot table via
    :func:`~..operators.windows.scd2_apply_batch` — O(batch keys) per
    trigger, untouched keys pass through; the first batch (or a
    missing table) seeds the history from scratch.

    Exactly-once under at-least-once foreachBatch: epochs are
    monotonic, and the folded epoch id is committed as a ``meta`` file
    INSIDE the snapshot version dir before the pointer flip
    (:func:`~..sinks.write_snapshot`), so the marker can never
    disagree with the published snapshot. A replayed epoch (<= the
    latest snapshot's marker) is a no-op — double-folding a batch
    would corrupt the history because the fold's in-order contract
    treats the batch as strictly-newer data (the Delta
    txnAppId/txnVersion pattern on the full-image sink, sibling of
    append_snapshot's ``txn_key``).

    The stored history carries the per-key fold watermark
    (``last_ts``/``last_tb``, scd2_history ``carry_last=True``), so a
    same-timestamp event straddling an epoch boundary folds exactly
    where the full recompute would put it (the r8 fix — the NULL-seed
    fold silently reordered equal-ts events across epochs). Consumers
    wanting the plain 5-column history drop the two watermark columns.

    Without ``events_dir`` the source must deliver each key's events
    strictly above its folded ``(ts, tiebreak)`` watermark (the
    streaming-CDC in-order contract on scd2_apply_batch); a genuinely
    late event would corrupt the fold. WITH ``events_dir`` the sink
    also maintains a raw event log (one ``epoch=N`` partition per
    micro-batch, overwritten on replay so it is exactly-once too) and
    routes late keys through scd2_fold_or_repair — a key-scoped
    recompute from the log, matching the reference's backfill
    semantics (backfill/api_to_gcs-backfill.py:138-140). The log is
    written BEFORE the fold's epoch marker commits, so a crash between
    the two replays the epoch into the same partition (idempotent).
    """
    from .. import sinks
    from ..operators import windows as W

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        last = sinks.snapshot_meta(table_dir, "_SCD2_EPOCH")
        if last is not None and int(epoch_id) <= int(last):
            return  # replayed epoch: already folded into _LATEST
        batch = batch_df.select(key, attr, ts, tiebreak)
        if events_dir is not None:
            # raw-log append first: epoch-partition overwrite is
            # idempotent under replay, and the fold below reads only
            # STRICTLY OLDER epochs, so the current write never feeds
            # its own fold
            batch.withColumn("epoch", F.lit(int(epoch_id))).write.mode(
                "overwrite"
            ).partitionBy("epoch").option(
                "partitionOverwriteMode", "dynamic"
            ).parquet(events_dir)
        first_epoch = sinks.snapshot_meta(table_dir, "_SCD2_FIRST_EPOCH")
        try:
            hist = sinks.read_snapshot(spark, table_dir)
            if events_dir is not None:
                # Completeness guard (ADVICE r8): the repair path
                # rebuilds late keys from the raw log, which is only
                # sound if the log covers the table's WHOLE history.
                # If the snapshot's first folded epoch predates the
                # log's earliest partition (events_dir enabled on a
                # pre-existing table), a rebuild would silently drop
                # the missing epochs — refuse instead; warn when the
                # first-epoch provenance marker is absent (table
                # created before this guard existed).
                import os as _os
                import warnings as _warnings

                log_epochs = [
                    int(d.split("=", 1)[1])
                    for d in _os.listdir(events_dir)
                    if d.startswith("epoch=") and d.split("=", 1)[1].isdigit()
                ]
                log_min = min(log_epochs) if log_epochs else int(epoch_id)
                if first_epoch is None:
                    _warnings.warn(
                        "scd2 sink: snapshot has no _SCD2_FIRST_EPOCH marker; "
                        "cannot prove the raw event log covers the table's "
                        "full history — repair results for late keys may be "
                        "incomplete. Set events_dir from epoch 0.",
                        stacklevel=2,
                    )
                elif int(first_epoch) < log_min:
                    raise ValueError(
                        f"scd2 sink: raw event log at {events_dir} starts at "
                        f"epoch {log_min} but the snapshot's history began at "
                        f"epoch {first_epoch} — the log is incomplete and a "
                        "key-scoped repair would silently drop the missing "
                        "epochs. events_dir must be enabled from epoch 0."
                    )
                prior = (
                    spark.read.parquet(events_dir)
                    .filter(F.col("epoch") < int(epoch_id))
                    .drop("epoch")
                )
                new_hist = W.scd2_fold_or_repair(
                    hist, batch, prior, key=key, attr=attr, ts=ts, tiebreak=tiebreak
                )
            else:
                new_hist = W.scd2_apply_batch(
                    hist, batch, key=key, attr=attr, ts=ts, tiebreak=tiebreak
                )
        except OSError:
            new_hist = W.scd2_history(
                batch, key=key, attr=attr, ts=ts, tiebreak=tiebreak, carry_last=True
            )
            if first_epoch is None:
                first_epoch = str(int(epoch_id))
        # pin rows before writing: the fold reads the CURRENT snapshot
        # dir lazily, and although versions are immutable, a retention
        # sweep (vacuum_snapshots) between plan and execution must not
        # be able to pull the input out from under the write
        new_hist = new_hist.localCheckpoint(eager=True)
        meta = {"_SCD2_EPOCH": str(int(epoch_id))}
        if first_epoch is not None:
            # carried forward every fold so the completeness guard
            # above can compare table provenance vs log coverage
            meta["_SCD2_FIRST_EPOCH"] = str(int(first_epoch))
        sinks.write_snapshot(new_hist, table_dir, meta=meta)

    return fold


def scd2_agg_mv_sink(
    hist_dir: str,
    mv_dir: str,
    key: str,
    attr: str,
    ts: str,
    tiebreak: str,
    measures: dict[str, "F.Column"] | None = None,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch maintainer for the FULL serving-stack composition
    (VERDICT r8 item 5): CDC stream → SCD2 history snapshot → a
    retractable aggregate MV over the history's OPEN rows — both
    tables maintained O(batch) per trigger, neither ever recomputed
    from scratch after epoch 0.

    Per epoch: (1) the history folds through the same path as
    :func:`scd2_history_sink` (in-order apply, epoch-marker
    exactly-once); (2) the MV absorbs ``snapshot_diff(open_before,
    open_after)`` as a CDC feed via
    :func:`~..operators.ivm.retractable_agg_maintain` — an attr
    change retracts the key's old open row from its group and adds
    the new one. Measures default to ``sum(key)`` (a checksum-grade
    exactness witness); ``n`` (open-row count per group) is always
    maintained.

    Exactly-once is per-table: the history keeps its ``_SCD2_EPOCH``
    marker, the MV its own ``_MV_EPOCH``, and the MV fold reads the
    before/after open-row sets from EXPLICIT history versions located
    by their epoch markers — so a crash between the two writes
    replays into the correct delta, and a fully-replayed epoch is a
    no-op on both. Batch-grain twin: ``scd2_agg_mv`` in the registry,
    oracle-checked against one full recompute.
    """
    import os

    from .. import sinks
    from ..operators import ivm

    if measures is None:
        measures = {"sum_uid": F.col(key)}
    hist_fold = scd2_history_sink(hist_dir, key=key, attr=attr, ts=ts, tiebreak=tiebreak)

    def versions_desc() -> list[int]:
        try:
            return sorted(
                (
                    int(d.split("=", 1)[1])
                    for d in os.listdir(hist_dir)
                    if d.startswith("v=") and d.split("=", 1)[1].isdigit()
                ),
                reverse=True,
            )
        except OSError:
            return []

    def open_rows(spark, version: int) -> DataFrame:
        return (
            sinks.read_snapshot(spark, hist_dir, version=version)
            .filter(F.col("is_current") == 1)
            .select(key, attr)
        )

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        mv_last = sinks.snapshot_meta(mv_dir, "_MV_EPOCH")
        if mv_last is not None and int(epoch_id) <= int(mv_last):
            return  # fully replayed epoch: both tables already folded
        hist_fold(batch_df, epoch_id)  # its own marker no-ops replays
        # v_after = the history version this epoch produced; v_before
        # = the version the MV actually reflects (marker == _MV_EPOCH,
        # ADVICE r9) — NOT merely "first version older than epoch_id",
        # which silently skipped any history-ahead-of-MV gap (external
        # folds, crash between the two writes by >1 epoch). The
        # open-row diff between those two versions nets ALL
        # intermediate changes, so a multi-epoch catch-up folds
        # correctly in one delta.
        v_after = v_before = None
        for v in versions_desc():
            marker = sinks.snapshot_meta(hist_dir, "_SCD2_EPOCH", version=v)
            if marker is None:
                continue
            if int(marker) == int(epoch_id) and v_after is None:
                v_after = v
            if mv_last is not None and int(marker) == int(mv_last) and v_before is None:
                v_before = v
            if v_after is not None and (mv_last is None or v_before is not None):
                break  # both located — stop the O(versions) meta scan
        if v_after is None:
            return  # history rejected the batch (e.g. older epoch)
        cur_after = open_rows(spark, v_after)
        if mv_last is None:
            # bootstrap: no MV snapshot yet — full aggregation of the
            # current open rows. Covers both a brand-new pipeline and
            # attaching the sink to a PRE-EXISTING history (ADVICE r9:
            # the old else-branch read_snapshot(mv_dir) raised here).
            mv = cur_after.groupBy(attr).agg(
                F.count(F.lit(1)).alias("n"),
                *[F.sum(e).cast("long").alias(a) for a, e in measures.items()],
            )
        else:
            if v_before is None:
                raise ValueError(
                    f"scd2_agg_mv_sink: the MV's _MV_EPOCH={mv_last} has no "
                    f"matching _SCD2_EPOCH history version under {hist_dir} "
                    "(vacuumed or externally rewritten) — the delta base is "
                    "gone; rebuild the MV by removing its snapshot dir so "
                    "the next epoch bootstraps from the full open-row set."
                )
            cur_before = open_rows(spark, v_before)
            mv_before = sinks.read_snapshot(spark, mv_dir)
            diff = ivm.snapshot_diff(cur_before, cur_after, key, [attr])
            changes = diff.select(
                key,
                F.col(f"{attr}_new").alias(attr),
                F.when(F.col("change") == "removed", F.lit("delete"))
                .otherwise(F.lit("upsert"))
                .alias("__op"),
                F.lit(1).cast("long").alias("__ver"),
            )
            mv = ivm.retractable_agg_maintain(
                mv_before, cur_before, changes, key=key, op_col="__op",
                version_col="__ver", group_col=attr, measures=measures,
            )
        mv = mv.localCheckpoint(eager=True)  # group-grain reduction
        sinks.write_snapshot(mv, mv_dir, meta={"_MV_EPOCH": str(int(epoch_id))})

    return fold


def growth_accounting_sink(
    state_dir: str,
    mv_dir: str,
    user_col: str,
    ts_col: str,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch maintainer for the daily growth-accounting MV
    (batch twin: ``timeseries.growth_accounting``) — the day rows
    (dau / new / retained / resurrected / churned) are derived from a
    USER-GRAIN state snapshot (user → first_d, last_d) instead of the
    full event history, so each epoch costs O(batch + state), never
    O(history).

    Per observed day d in the batch (processed in ascending order):
    new = active users absent from state; retained = state.last_d ==
    d-1; resurrected = state.last_d < d-1; churn is emitted for every
    lapse day x in (last_folded_day, d]: users with state.last_d ==
    x-1 who were not active at x (for x < d the lapse is already
    final; for x == d membership in the day's active set decides).
    Gap days with zero activity still receive their churn rows — the
    same full-outer shape the batch twin emits. The one honest
    difference: the batch twin's FINAL (max_day+1) churn row is a
    statement about the future and is only emitted once a later epoch
    passes that day.

    Exactly-once AND late-data refusal (ADVICE r9): the state
    snapshot carries a ``_GA_DAY`` marker (last folded day) and a
    ``_GA_EPOCH`` marker (last folded epoch). An epoch at-or-below
    ``_GA_EPOCH`` is a REPLAY — its already-folded days are skipped
    as no-ops. A NEW epoch carrying rows for days at-or-below
    ``_GA_DAY`` is LATE DATA, which this day-cursor state model
    cannot fold retroactively — the sink REFUSES (ValueError) instead
    of silently diverging from the batch twin
    (``timeseries.growth_accounting``); filter late rows upstream
    with a watermark (``withWatermark`` + ``ts >= _GA_DAY + 1``) to
    accept the drop deliberately. Corollary: batches must be
    DAY-COMPLETE — a day folds the first time it is seen, so feed
    this sink from a day-windowed trigger (e.g. one trigger per
    closed day), not sub-day micro-batches. The MV appends per-day
    segments keyed by day (idempotent overwrite per day partition).
    """
    import datetime as _dt
    import warnings as _warnings

    from .. import sinks

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        ud = (
            batch_df.select(
                F.col(user_col).alias("u"), F.to_date(ts_col).alias("d")
            )
            .distinct()
            .localCheckpoint(eager=True)  # (user, day) grain of ONE batch
        )
        days = sorted(r["d"] for r in ud.select("d").distinct().collect())
        marker = sinks.snapshot_meta(state_dir, "_GA_DAY")
        prev_day = _dt.date.fromisoformat(marker) if marker else None
        epoch_marker = sinks.snapshot_meta(state_dir, "_GA_EPOCH")
        is_replay = epoch_marker is not None and int(epoch_id) <= int(epoch_marker)
        if prev_day is not None and not is_replay and days and days[0] <= prev_day:
            if epoch_marker is None:
                # state written before the _GA_EPOCH marker existed —
                # cannot prove replay vs late; keep legacy skip, warn
                _warnings.warn(
                    "growth_accounting_sink: state has no _GA_EPOCH marker; "
                    f"rows for already-folded days <= {prev_day} are being "
                    "skipped as replays but could be late data. Rebuild the "
                    "state snapshot to get the late-data refusal guard.",
                    stacklevel=2,
                )
            else:
                raise ValueError(
                    f"growth_accounting_sink: epoch {int(epoch_id)} is NEW "
                    f"(last folded epoch {int(epoch_marker)}) but carries rows "
                    f"for day {days[0].isoformat()} <= last folded day "
                    f"{prev_day.isoformat()} — late data cannot be folded "
                    "retroactively by the day-cursor state and would silently "
                    "diverge the MV from the batch twin. Watermark-filter the "
                    "stream (ts at or after the day after _GA_DAY) to drop "
                    "late rows deliberately."
                )
        try:
            state = sinks.read_snapshot(spark, state_dir)
        except OSError:
            state = spark.createDataFrame([], "u long, first_d date, last_d date")
        folded_any = False
        for d in days:
            if prev_day is not None and d <= prev_day:
                continue  # replayed day: already folded
            folded_any = True
            active = ud.filter(F.col("d") == d).select("u")
            joined = active.join(state, "u", "left")
            day_row = joined.agg(
                F.count(F.lit(1)).cast("long").alias("dau"),
                F.sum(F.when(F.col("last_d").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_new"),
                F.sum(
                    F.when(F.datediff(F.lit(d), F.col("last_d")) == 1, 1).otherwise(0)
                )
                .cast("long")
                .alias("n_retained"),
                F.sum(
                    F.when(F.datediff(F.lit(d), F.col("last_d")) > 1, 1).otherwise(0)
                )
                .cast("long")
                .alias("n_resurrected"),
            ).select(F.lit(d).cast("date").alias("day"), "*")
            # churn rows for every lapse day in (prev_day, d]
            lapsed = state.withColumn("__cd", F.date_add("last_d", 1)).filter(
                (F.col("__cd") <= F.lit(d))
                & (F.lit(True) if prev_day is None else F.col("__cd") > F.lit(prev_day))
            )
            churn = (
                lapsed.join(
                    active.withColumn("__a", F.lit(1)), "u", "left"
                )
                .filter((F.col("__cd") < F.lit(d)) | F.col("__a").isNull())
                .groupBy(F.col("__cd").alias("day"))
                .agg(F.count(F.lit(1)).cast("long").alias("n_churned"))
            )
            mv_rows = (
                day_row.join(churn, "day", "full_outer")
                .select(
                    "day",
                    *[
                        F.coalesce(c, F.lit(0)).cast("long").alias(c)
                        for c in ("dau", "n_new", "n_retained", "n_resurrected", "n_churned")
                    ],
                )
                .localCheckpoint(eager=True)  # day-grain reduction
            )
            sinks.append_snapshot(mv_rows, mv_dir, txn_key=f"ga-{d.isoformat()}")
            # state upsert: actives get last_d = d (first_d kept)
            touched = active.join(state, "u", "left").select(
                "u",
                F.coalesce("first_d", F.lit(d)).alias("first_d"),
                F.lit(d).cast("date").alias("last_d"),
            )
            state = (
                state.join(active, "u", "left_anti")
                .unionByName(touched)
                .localCheckpoint(eager=True)  # user-grain state; bounded by
                # the user universe, the size a serving store holds anyway
            )
            prev_day = d
        if not folded_any:
            return  # fully-replayed epoch: strict no-op on BOTH tables
        sinks.write_snapshot(
            state,
            state_dir,
            meta={"_GA_DAY": prev_day.isoformat(), "_GA_EPOCH": str(int(epoch_id))},
        )

    return fold


def ivm_join_mv_sink(
    table_dir: str,
    dim: DataFrame,
    key: str,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch maintainer for an at-rest JOIN materialization
    (fact ⋈ dim) under an insert-only fact stream: each micro-batch
    joins ONLY the delta against the stable dimension
    (:func:`~..operators.ivm.delta_join_maintain`'s delta rule) and
    lands it as a new append segment — O(batch) per trigger, the base
    MV is never rescanned or rewritten. Exactly-once rides the
    append-segment txn log (``txn_key`` = the epoch id, the Delta
    txnAppId/txnVersion pattern): a replayed epoch is a no-op.

    The dimension must be stable across the stream's lifetime (the
    same contract delta_join_maintain documents); dimension updates
    or fact deletes route through a key-scoped rebuild instead.
    """
    from .. import sinks

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        joined = batch_df.join(dim, key)
        sinks.append_snapshot(joined, table_dir, txn_key=f"ivm-epoch-{int(epoch_id)}")

    return fold


def cusum_monitor(
    stream_df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    mu0: float = 0.0,
    slack: float = 0.5,
    threshold: float = 5.0,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming per-key CUSUM drift alarm — the online twin of the
    batch ``windows.cusum_changepoint`` audit, as a custom stateful
    operator (``applyInPandasWithState``).

    Tabular CUSUM against a FIXED reference level ``mu0`` (fixed, not
    learned, so replays and re-batchings are deterministic): per key,
    s+ = max(0, s+ + (x - mu0 - slack)) and s- = max(0, s- +
    (mu0 - x - slack)); when either statistic crosses ``threshold`` an
    alarm row (key, alarm_ts, direction, stat, n_seen) is emitted and
    that side resets — append-mode output, one row per alarm, never
    per event.

    State is three floats + a counter per key — O(keys). For an
    UNBOUNDED key domain (customer/doc ids rather than the handful of
    event types the batch twin uses), pass ``idle_timeout_ms``: keys
    idle past that event-time horizon (measured against the stream's
    watermark, so the input must set ``withWatermark``) have their
    state evicted — a key that never crossed the threshold while live
    cannot alarm after death, so eviction never changes alarms for
    live keys, it only re-zeroes the statistic if the key reappears
    much later (the correct semantics for a drift monitor). Without
    the knob, state is retained forever — only safe for a small fixed
    key domain. Rows are folded in (ts, event_id) order WITHIN each
    batch, so output is invariant to micro-batch alignment whenever
    file/offset boundaries respect event-time order (the same in-order
    delivery contract the SCD2 fold documents; genuinely late data
    belongs to a batch recompute via the backfill path).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "k string, alarm_ts timestamp, direction string, stat double, n_seen bigint"
    )
    state_schema = "sp double, sn double, n bigint"
    timeout = (
        GroupStateTimeout.EventTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )

    def fn(key: tuple, pdfs, state: GroupState):
        if idle_timeout_ms is not None and state.hasTimedOut:
            state.remove()
            return
        sp, sn, n = state.get if state.exists else (0.0, 0.0, 0)
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values(["ts", "event_id"])
        alarms: list[tuple] = []
        for ts, x in zip(rows["ts"], rows[value_col]):
            n += 1
            sp = max(0.0, sp + (float(x) - mu0 - slack))
            sn = max(0.0, sn + (mu0 - float(x) - slack))
            if sp > threshold:
                alarms.append((ts, "up", round(sp, 6), n))
                sp = 0.0
            if sn > threshold:
                alarms.append((ts, "down", round(sn, 6), n))
                sn = 0.0
        state.update((sp, sn, n))
        if idle_timeout_ms is not None:
            # event-time horizon: latest ts seen for this key + the
            # idle budget; the watermark passing it evicts the state.
            # Clamp to strictly above the CURRENT watermark — a key
            # whose newest event is already more than idle_timeout
            # late would otherwise compute a horizon <= watermark and
            # setTimeoutTimestamp throws IllegalArgumentException,
            # failing the whole query instead of evicting one key
            # (ADVICE r8). Such a key times out at the next trigger —
            # the earliest the engine can deliver it anyway.
            horizon_ms = int(rows["ts"].max().timestamp() * 1000) + int(idle_timeout_ms)
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(horizon_ms, wm_ms + 1))
        if alarms:
            yield pd.DataFrame(
                {
                    "k": [key[0]] * len(alarms),
                    "alarm_ts": [a[0] for a in alarms],
                    "direction": [a[1] for a in alarms],
                    "stat": [a[2] for a in alarms],
                    "n_seen": [a[3] for a in alarms],
                }
            )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
    )


def ab_readout_sink(
    state_dir: str,
    mv_dir: str,
    id_col: str,
    x_col: str,
    y_col: str,
    n_arms: int = 2,
    tiebreak: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch maintainer for the live A/B readout (streaming twin
    of the batch ``ab_readout`` registry entry): each micro-batch of
    UNIT-GRAIN UPSERTS (unit id, pre-period covariate x, post metric y
    — e.g. a customer's running revenue pair) folds into a user-grain
    state snapshot, and the arm-grain readout MV (per-arm n, mean_y,
    CUPED-adjusted mean_y with the pooled theta) is rebuilt from that
    COMPACT state — the event history is never rescanned, so each
    epoch costs O(batch + |units|), never O(history).

    Upsert semantics make late and duplicate unit rows harmless (last
    write per unit wins; within a batch ``tiebreak`` picks the winner
    deterministically, defaulting to max x+y struct order on ties) —
    the friendlier contract compared to growth_accounting_sink's
    day-cursor refusal, available here because the readout is a pure
    function of current unit state, not of arrival order.

    Exactly-once: the state snapshot carries an ``_ABR_EPOCH`` marker;
    epochs at-or-below it are strict no-ops on BOTH tables. A crash
    between the state write and the MV write heals on replay: the
    MV is recomputed from the CURRENT state, so rewriting it is
    idempotent (the MV needs no marker of its own — it is derived,
    never folded).

    At 100 TB: state is unit-grain (the size a serving store holds);
    the readout aggregate reduces it to ``n_arms`` rows of exact
    decimal moments; every float in the MV is one shared expression
    over those moments (the experiment.ab_readout discipline).
    """
    from .. import sinks

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        marker = sinks.snapshot_meta(state_dir, "_ABR_EPOCH")
        already = marker is not None and int(epoch_id) <= int(marker)
        if not already:
            # ties on the caller's tiebreak fall through to the value
            # struct so the within-batch winner is a pure function of
            # the data, never of partition order (self-review r10)
            order = (
                F.struct(F.col(tiebreak), F.col("__x"), F.col("__y"))
                if tiebreak
                else F.struct(F.col("__x"), F.col("__y"))
            )
            ups = (
                batch_df.select(
                    F.col(id_col).alias("__u"),
                    F.col(x_col).cast("long").alias("__x"),
                    F.col(y_col).cast("long").alias("__y"),
                    *([F.col(tiebreak)] if tiebreak else []),
                )
                .groupBy("__u")
                .agg(
                    F.max_by(F.struct("__x", "__y"), order).alias("__v")
                )
                .select("__u", F.col("__v.__x").alias("__x"), F.col("__v.__y").alias("__y"))
            )
            try:
                state = sinks.read_snapshot(spark, state_dir)
            except OSError:
                # bootstrap with the BATCH's own schema (self-review
                # r10: a literal "__u long" schema broke string unit
                # ids at the unionByName)
                state = ups.limit(0)
            state = (
                state.join(ups, "__u", "left_anti")
                .unionByName(ups)
                .localCheckpoint(eager=True)  # unit-grain reduction; also
                # pins rows before the versioned dir flips underneath
            )
            sinks.write_snapshot(
                state, state_dir, meta={"_ABR_EPOCH": str(int(epoch_id))}
            )
        # MV: pure function of current state — recompute + overwrite is
        # idempotent, which is exactly what heals a crash that landed
        # the state write but lost the MV write (replayed epoch takes
        # the `already` branch above and still rewrites the MV here)
        state = sinks.read_snapshot(spark, state_dir)
        from ..operators import experiment

        mv = experiment.ab_readout(
            state, F.col("__x"), F.col("__y"), "__u", n_arms=n_arms
        ).localCheckpoint(eager=True)  # arm-grain reduction
        sinks.write_snapshot(mv, mv_dir)

    return fold


def token_budget_sink(
    state_dir: str,
    text_col: str,
    id_col: str,
    source_col: str,
    budget_tokens: int,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch maintainer for the budgeted-selection snapshot
    (batch twin: ``corpus.token_budget_select``; fold kernel:
    ``corpus.token_budget_select_incremental``) — a training-corpus
    curation list that stays current as document shards stream in,
    at O(batch + selection) per epoch, never O(corpus).

    Each epoch scores ONLY the batch, gates it on the at-rest
    per-source CUTOFF (the first over-budget sort key from every fold
    so far — ``corpus.token_budget_cutoff``'s state, kept in a sibling
    snapshot at ``{state_dir}_cutoff``), unions the survivors with the
    at-rest SELECTED rows, and re-applies the per-source greedy prefix
    rule; by the cutoff-carrying prefix rule (see the incremental
    operator's docstring — the cutoff-free fold is NOT exact) the
    resulting snapshot equals the batch twin over every document ever
    folded — pinned by the pytest law.

    Exactly-once: the snapshot carries a ``_TBS_EPOCH`` marker; an
    epoch at-or-below it is a replay and no-ops (folding the same
    batch twice would double-count its rows in the union — the replay
    guard is load-bearing, not an optimization). The cutoff snapshot
    commits BEFORE the selection snapshot: a crash between the two
    leaves a tightened cutoff with the old selection+marker, and the
    replayed fold under the tighter cutoff yields the identical
    selection (docs at-or-below the fold's own first overflow are
    rejected whether gated pre-fold or ranked over budget in-fold) —
    so the pair always converges. Within a first-time epoch the batch
    is deduped on (source, id); ACROSS distinct epochs document ids
    must be disjoint (the minhash_incremental contract — re-sends of
    the same doc under a new epoch are new documents to this sink).
    """
    from .. import sinks
    from ..operators import corpus as corpus_ops

    cutoff_dir = f"{state_dir}_cutoff"

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        epoch_marker = sinks.snapshot_meta(state_dir, "_TBS_EPOCH")
        if epoch_marker is not None and int(epoch_id) <= int(epoch_marker):
            return  # replay: this batch is already in the selection
        batch = batch_df.dropDuplicates([source_col, id_col])
        try:
            prior = sinks.read_snapshot(spark, state_dir)
        except OSError:
            prior = spark.createDataFrame(
                [], f"source string, {id_col} long, quality_x3 int, n_tokens long"
            )
        id_type = batch_df.schema[id_col].dataType.simpleString()
        try:
            prior_cut = sinks.read_snapshot(spark, cutoff_dir)
        except OSError:
            prior_cut = spark.createDataFrame(
                [], f"source string, cut_quality_x3 int, cut_id {id_type}"
            )
        cum = corpus_ops._token_budget_fold_cum(
            prior, prior_cut, batch, text_col, id_col, source_col
        ).localCheckpoint(eager=True)  # fold grain: budget + batch bounded
        sel = cum.filter(F.col("cum_tokens") <= budget_tokens).select(
            "source", F.col(id_col), "quality_x3", "n_tokens", "cum_tokens"
        )
        fold_cut = corpus_ops._first_rejected_cutoff(cum, id_col, budget_tokens)
        new_cut = corpus_ops._cutoff_rank_min(prior_cut, fold_cut)
        sinks.write_snapshot(new_cut, cutoff_dir)  # cutoff first — see docstring
        sinks.write_snapshot(
            sel, state_dir, meta={"_TBS_EPOCH": str(int(epoch_id))}
        )

    return fold


def minhash_gate_sink(
    state_dir: str,
    accepted_dir: str,
    quarantined_dir: str,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    n_hashes: int = 16,
    n_bands: int = 8,
    shingle_k: int = 3,
    max_segments: int = 16,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch INGEST GATE against near-duplicates (batch twin:
    ``dedup.minhash_dedup_gate``; fold kernel:
    ``dedup.minhash_near_dup_incremental``) — the banded-MinHash
    micro-batch door that closes the gap between the batch dedup
    family and the streaming edge (the reference validates at the
    door, webhook_handler/main.py:27-33; this is that posture for
    near-dups). Each epoch shingles ONLY the batch, band-joins its
    signatures against the at-rest index (``{state_dir}/idx``) plus
    itself, exact-verifies candidates on the at-rest shingle relation
    (``{state_dir}/ex``), and splits the batch: docs with a verified
    smaller-id near-dup land in ``quarantined_dir``, the rest in
    ``accepted_dir``. EVERY doc — kept or quarantined — folds into
    the at-rest ex/idx segments, so a later dup of a quarantined doc
    is still caught; that is what makes the labels equal the batch
    twin over all docs ever folded (the pinned pytest law).

    MONOTONE-ID CONTRACT: batch ids must be strictly above every id
    previously folded (ids are assigned at the door in an ingest
    pipeline). A new epoch violating it is LATE/REORDERED DATA and the
    sink refuses (ValueError) — the growth_accounting day-cursor
    discipline — because under out-of-order ids "has a smaller-id
    near-dup" would depend on arrival order and the batch-twin law
    would silently break.

    Exactly-once: a ``_MHG_COMMIT`` marker (written LAST, carrying
    ``epoch:maxid`` in ONE atomic replace — the late-data cursor can
    never advance without the epoch, ADVICE r13) makes a replayed
    epoch a strict no-op; each of the four appends also
    carries ``txn_key=epoch`` so a crash mid-epoch replays into
    committed-segment no-ops, and the prior relations are read with an
    ``id < min(batch)`` range filter (partition-prunable) so a
    half-committed previous attempt of the SAME epoch can never pair
    the batch against its own crashed copy.

    Scale: per-epoch cost is O(batch shingles + band-join against the
    index) — the corpus is touched through the (bucketable) band index
    and the candidate verify only, never re-shingled; the at-rest
    segments append, never rewrite — and ``sinks.maybe_compact`` folds
    each table once its committed segment count exceeds
    ``max_segments`` (r13 verdict item 2: over a production day of
    micro-batches the O(epochs) segment listing/footer overhead is the
    bound that six-epoch receipts cannot see). Compaction runs AFTER
    the epoch's commit marker (pure maintenance — a crash inside it
    never loses the epoch: readers skip folded originals through
    ``_COMPACTED_THROUGH``, and replayed epochs no-op through the
    table-level ``_TXNS`` log that survives the fold).
    """
    import os

    from .. import sinks
    from ..operators import dedup as dedup_ops

    ex_dir = f"{state_dir}/ex"
    idx_dir = f"{state_dir}/idx"
    commit_marker_path = f"{state_dir}/_MHG_COMMIT"

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        os.makedirs(state_dir, exist_ok=True)
        commit = _read_commit(commit_marker_path)
        if commit is not None and int(epoch_id) <= commit[0]:
            return  # replay: every table committed before the marker
        batch = batch_df.dropDuplicates([id_col])
        bounds = batch.agg(
            F.min(F.col(id_col)).alias("lo"), F.max(F.col(id_col)).alias("hi")
        ).first()
        max_seen = commit[1] if commit is not None else None
        if max_seen is not None and int(bounds["lo"]) <= max_seen:
            raise ValueError(
                f"minhash_gate_sink: epoch {epoch_id} carries id "
                f"{bounds['lo']} at-or-below the folded maximum {max_seen} "
                "— late/reordered ids break the keep-first-by-id law; "
                "re-key or replay through the original epoch instead"
            )
        try:
            prior_ex = sinks.read_appended(spark, ex_dir).filter(
                F.col(id_col) < bounds["lo"]
            )
            prior_idx = sinks.read_appended(spark, idx_dir).filter(
                F.col(id_col) < bounds["lo"]
            )
        except OSError:
            prior_ex = spark.createDataFrame(
                [], f"{id_col} long, __h long, __hp long"
            )
            prior_idx = spark.createDataFrame(
                [], f"{id_col} long, __nsh long, band_id int, band_hash long"
            )
        # batch-grain, materialized once: shared by the pair kernel AND
        # the segment appends (the kernel's own persist/unpersist cycle
        # would otherwise recompute the shingling for the appends)
        ex_new = dedup_ops.shingle_table(batch, text_col, id_col, shingle_k).localCheckpoint(
            eager=True
        )
        idx_new = dedup_ops.minhash_index(ex_new, id_col, n_hashes, n_bands).localCheckpoint(
            eager=True
        )
        pairs = dedup_ops.minhash_near_dup_incremental(
            prior_ex,
            prior_idx,
            batch,
            text_col,
            id_col,
            threshold,
            n_hashes,
            n_bands,
            shingle_k,
            ex_new=ex_new,
            idx_new=idx_new,
        )
        dropped = (
            pairs.select(F.col("id_b").alias(id_col))
            .distinct()
            .withColumn("__drop", F.lit(1))
        )
        labeled = (
            batch.join(dropped, id_col, "left")
            .withColumn("__keep", F.col("__drop").isNull())
            .drop("__drop")
            .localCheckpoint(eager=True)  # batch grain; pins the split
        )
        txn = f"epoch={int(epoch_id)}"
        sinks.append_snapshot(ex_new, ex_dir, txn_key=txn)
        sinks.append_snapshot(idx_new, idx_dir, txn_key=txn)
        sinks.append_snapshot(
            labeled.filter(F.col("__keep")).drop("__keep"), accepted_dir, txn_key=txn
        )
        sinks.append_snapshot(
            labeled.filter(~F.col("__keep")).drop("__keep"),
            quarantined_dir,
            txn_key=txn,
        )
        _write_commit(commit_marker_path, int(epoch_id), int(bounds["hi"]))  # commit point
        for d in (ex_dir, idx_dir, accepted_dir, quarantined_dir):
            sinks.maybe_compact(spark, d, max_segments=max_segments)

    return fold


def suffix_span_sink(
    state_dir: str,
    spans_dir: str,
    text_col: str,
    id_col: str,
    min_tokens: int = 8,
    max_tokens: int = 4096,
    max_segments: int = 16,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch maintainer for the EXACT substring-dedup removal
    mask (batch twin: ``dedup.suffix_dedup_spans``; fold kernel:
    ``dedup.suffix_dedup_spans_incremental``) — the streaming member
    of the suffix family. Each epoch tokenizes ONLY the batch, probes
    its window HASHES against the at-rest hash-keyed window segments
    (``{state_dir}/win`` — (id, pos, xxhash64), 8 bytes a window, r14
    re-key) plus within-batch repeats, confirms candidates through the
    positional verify arm against the at-rest doc segments
    (``{state_dir}/docs`` — the landed corpus itself, 1x corpus bytes;
    the verify re-slices only hash-matched docs), and appends the
    batch docs' maximal duplicated-substring spans to ``spans_dir`` —
    the mask a downstream scrub (span_scrub's exact sibling) consumes.
    Every batch's windows and docs fold into the at-rest segments, so
    a later verbatim copy of ANY seen doc is masked.

    Semantics note (why this is a MASK MAINTAINER, not a gate): a
    batch that repeats at-rest text changes what the full recompute
    would say about the AT-REST docs too; those retroactive spans
    belong to a deliberate corpus-side refresh (re-run the batch twin)
    — the appended mask is exact for every doc AS OF ITS OWN EPOCH,
    which is the contract the pinned law states (appended spans ==
    the full union recompute restricted to each epoch's ids).

    MONOTONE-ID CONTRACT + exactly-once: identical to
    minhash_gate_sink — late/reordered ids refuse (ValueError);
    ``_SSS_COMMIT`` (``epoch:maxid``, one atomic replace — ADVICE r13)
    written last makes replays strict no-ops; per-table
    ``txn_key`` heals crashes mid-epoch; prior segments are read under
    an ``id < min(batch)`` range filter so a half-committed attempt
    never probes the batch against its own crashed copy.

    Scale: per-epoch cost is O(batch tokens + hash probe of the window
    segments + positional re-slice of hash-matched docs); corpus text
    is read only for docs holding a candidate window. All three
    tables compact through ``sinks.maybe_compact`` past
    ``max_segments`` committed segments, after the commit marker
    (replays survive the fold through the ``_TXNS`` log; crash inside
    a fold serves correctly through ``_COMPACTED_THROUGH``).
    """
    import os

    from .. import sinks
    from ..operators import dedup as dedup_ops

    win_dir = f"{state_dir}/win"
    docs_dir = f"{state_dir}/docs"
    commit_marker_path = f"{state_dir}/_SSS_COMMIT"

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        os.makedirs(state_dir, exist_ok=True)
        commit = _read_commit(commit_marker_path)
        if commit is not None and int(epoch_id) <= commit[0]:
            return  # replay: every table committed before the marker
        batch = batch_df.dropDuplicates([id_col])
        bounds = batch.agg(
            F.min(F.col(id_col)).alias("lo"), F.max(F.col(id_col)).alias("hi")
        ).first()
        max_seen = commit[1] if commit is not None else None
        if max_seen is not None and int(bounds["lo"]) <= max_seen:
            raise ValueError(
                f"suffix_span_sink: epoch {epoch_id} carries id "
                f"{bounds['lo']} at-or-below the folded maximum {max_seen} "
                "— late/reordered ids break the as-of-epoch mask law; "
                "re-key or replay through the original epoch instead"
            )
        try:
            prior_win = sinks.read_appended(spark, win_dir).filter(
                F.col(id_col) < bounds["lo"]
            )
            prior_docs = sinks.read_appended(spark, docs_dir).filter(
                F.col(id_col) < bounds["lo"]
            )
        except OSError:
            prior_win = spark.createDataFrame(
                [], f"{id_col} long, pos int, __h long"
            )
            prior_docs = spark.createDataFrame(
                [], f"{id_col} long, {text_col} string"
            )
        win_new = dedup_ops.suffix_window_table(
            batch, text_col, id_col, min_tokens, max_tokens
        ).localCheckpoint(eager=True)  # batch-window grain: probe + append
        spans = dedup_ops.suffix_dedup_spans_incremental(
            prior_win,
            batch,
            text_col,
            id_col,
            min_tokens,
            max_tokens,
            win_new=win_new,
            corpus_docs=prior_docs,
        )
        txn = f"epoch={int(epoch_id)}"
        sinks.append_snapshot(win_new, win_dir, txn_key=txn)
        sinks.append_snapshot(batch.select(id_col, text_col), docs_dir, txn_key=txn)
        sinks.append_snapshot(spans, spans_dir, txn_key=txn)
        _write_commit(commit_marker_path, int(epoch_id), int(bounds["hi"]))  # commit point
        for d in (win_dir, docs_dir, spans_dir):
            sinks.maybe_compact(spark, d, max_segments=max_segments)

    return fold


def ivf_append_sink(
    index_dir: str,
    vec_col: str,
    id_col: str,
    cents: list,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch maintainer for the at-rest IVF layout: assign each
    embedding micro-batch to the FROZEN coarse-quantizer cells
    (``similarity.ivf_append``) and land it as an append segment
    partitioned by ``cell`` — so probe-time reads keep partition
    pruning over the whole segment history (``sinks.read_appended``
    reads all segments as ONE hive-partitioned scan and a cell filter
    prunes files). This closes the incremental-ANN loop:
    this sink writes, :func:`~..operators.similarity.ivf_cell_drift`
    watches occupancy, ``ivf_incremental_recall`` audits recall decay,
    and a re-train is a deliberate batch rebuild.

    Exactly-once via ``txn_key=epoch`` (append_snapshot's Delta
    txnAppId shape): replays find their committed segment and no-op.
    The centroid model is the caller's frozen O(n_cells·dim) literal —
    never derived from the stream (a shifting quantizer would scatter
    one logical cell across segments and break pruning).
    """
    from .. import sinks
    from ..operators import similarity as sim_ops

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        assigned = sim_ops.ivf_append(batch_df, vec_col, id_col, cents)
        sinks.append_snapshot(
            assigned, index_dir, partition_by="cell", txn_key=f"epoch={int(epoch_id)}"
        )

    return fold


def ivf_retrain_sink(
    state_dir: str,
    vec_col: str,
    id_col: str,
    n_cells: int = 16,
    n_probe: int = 4,
    k: int = 10,
    query_mod: int = 100,
    query_cap: int = 500,
    drift_thresh_micro: int = 100_000,
    recall_thresh_micro: int = 900_000,
    decide_every: int = 1,
    max_segments: int = 16,
) -> Callable[[DataFrame, int], None]:
    """The CLOSED incremental-ANN loop (r13 verdict item 7): where
    ``ivf_append_sink`` appends under a caller-frozen quantizer and
    leaves drift/recall/retrain to offline audits, this sink OWNS the
    model lifecycle end-to-end — append → decide → retrain → re-audit
    — the way ``repair_run`` closes the reconciliation loop.

    Layout under ``state_dir``: ``model`` (versioned snapshot of the
    (cell, c) centroid relation — the at-rest quantizer, version
    history IS the model lineage), ``idx`` (cell-partitioned append
    segments — every folded vector), ``audit`` (one appended
    ``ivf_retrain_plan`` decision row per decision epoch).

    Per epoch: assign ONLY the batch to the CURRENT at-rest model
    (bootstrap epoch: freeze ``_centroids`` of the first batch) and
    append it cell-partitioned; then (every ``decide_every`` epochs)
    run the :func:`~..operators.similarity.ivf_retrain_plan` decision
    — exact-integer TVD on cell occupancy + capped aged-recall arm —
    and append the decision row. If it trips: advance the model
    snapshot (``_centroids`` over the grown corpus — exactly what
    ``ivf_top_k`` would freeze, the plan's pinned fresh-index law) and
    REBUILD the index as one atomic fold (``compact_appended`` with a
    reassignment transform: same new-segment + _COMPACTED_THROUGH +
    pointer-flip crash discipline as plain compaction, so readers are
    never half-served and pre-rebuild epochs still replay as no-ops
    through the ``_TXNS`` log). The serve path
    (:func:`ivf_serve_top_k`) then prunes by the NEW model's cells.

    Exactly-once: ``_IVR_COMMIT`` (``epoch:maxid``, one atomic
    replace) + per-table txn keys; monotone-id contract as in every
    gate sink. A crash between the model-snapshot advance and the
    index rebuild leaves a version-skewed pair; the uncommitted epoch
    replays from the top and converges (single-writer, the MV-sink
    staleness window — ``scd2_agg_mv_sink``'s discipline).

    Scale: the per-epoch append is O(batch); the decision is model-
    grain scalars plus the CAPPED query-batch audits (the documented
    ~8-10 s fixed orchestration cost at any scale — set
    ``decide_every`` to amortize it); the rebuild is O(corpus) but
    paid only when the decision trips, which is the entire point of
    deciding instead of retraining on a timer.
    """
    import os

    from .. import sinks
    from ..operators import similarity as sim_ops

    model_dir = f"{state_dir}/model"
    idx_dir = f"{state_dir}/idx"
    audit_dir = f"{state_dir}/audit"
    commit_marker_path = f"{state_dir}/_IVR_COMMIT"

    def _model_cents(spark) -> list | None:
        try:
            rows = sinks.read_snapshot(spark, model_dir).orderBy("cell").collect()
        except OSError:
            return None
        return [(int(r["cell"]), [float(x) for x in r["c"]]) for r in rows]

    def _write_model(spark, cents: list, epoch_id: int) -> int:
        rows = spark.createDataFrame(
            [(int(i), [float(x) for x in c]) for i, c in cents],
            "cell int, c array<double>",
        )
        return sinks.write_snapshot(
            rows, model_dir, meta={"_IVF_MODEL_EPOCH": str(int(epoch_id))}
        )

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        os.makedirs(state_dir, exist_ok=True)
        commit = _read_commit(commit_marker_path)
        if commit is not None and int(epoch_id) <= commit[0]:
            return  # replay: every table committed before the marker
        batch = batch_df.dropDuplicates([id_col]).select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col)
        )
        bounds = batch.agg(
            F.min(F.col(id_col)).alias("lo"), F.max(F.col(id_col)).alias("hi")
        ).first()
        max_seen = commit[1] if commit is not None else None
        if max_seen is not None and int(bounds["lo"]) <= max_seen:
            raise ValueError(
                f"ivf_retrain_sink: epoch {epoch_id} carries id "
                f"{bounds['lo']} at-or-below the folded maximum {max_seen} "
                "— late/reordered ids break the at-rest model lineage; "
                "re-key or replay through the original epoch instead"
            )
        txn = f"epoch={int(epoch_id)}"
        cents = _model_cents(spark)
        if cents is None:
            cents = sim_ops._centroids(batch, vec_col, id_col, n_cells)
            _write_model(spark, cents, epoch_id)  # bootstrap model v1
        assigned = sim_ops.ivf_append(batch, vec_col, id_col, cents)
        sinks.append_snapshot(assigned, idx_dir, partition_by="cell", txn_key=txn)
        prior = (
            sinks.read_appended(spark, idx_dir)
            .filter(F.col(id_col) < bounds["lo"])
            .select(F.col(id_col), F.col(vec_col))
        )
        n_prior = prior.count()
        if n_prior > 0 and int(epoch_id) % max(int(decide_every), 1) == 0:
            decision = sim_ops.ivf_retrain_plan(
                prior,
                batch,
                vec_col,
                id_col,
                n_cells=n_cells,
                n_probe=n_probe,
                k=k,
                query_mod=query_mod,
                query_cap=query_cap,
                drift_thresh_micro=drift_thresh_micro,
                recall_thresh_micro=recall_thresh_micro,
            ).withColumn("epoch", F.lit(int(epoch_id)))
            decision = decision.localCheckpoint(eager=True)  # one row
            sinks.append_snapshot(decision, audit_dir, txn_key=txn)
            if bool(decision.first()["retrain"]):
                union = prior.unionByName(
                    assigned.select(F.col(id_col), F.col(vec_col))
                )
                fresh = sim_ops._centroids(union, vec_col, id_col, n_cells)
                _write_model(spark, fresh, epoch_id)  # model version advances
                sinks.compact_appended(
                    spark,
                    idx_dir,
                    partition_by="cell",
                    transform=lambda df: sim_ops.ivf_append(
                        df.drop("cell"), vec_col, id_col, fresh
                    ),
                )
        _write_commit(commit_marker_path, int(epoch_id), int(bounds["hi"]))  # commit point
        sinks.maybe_compact(spark, idx_dir, max_segments=max_segments, partition_by="cell")
        sinks.maybe_compact(spark, audit_dir, max_segments=max_segments)

    return fold


def ivf_serve_top_k(
    spark: SparkSession,
    state_dir: str,
    vec_col: str,
    id_col: str,
    query_vec: list,
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Serve-side ANN probe against :func:`ivf_retrain_sink`'s at-rest
    state: read the CURRENT model snapshot, pick the ``n_probe`` cells
    nearest the query (model-grain, plan-build time), and scan only
    those cells of the appended index — the cell filter is partition
    pruning over every segment. The pinned law: this equals
    ``similarity.ivf_top_k`` over all folded vectors whenever the
    at-rest model equals the batch convention's frozen centroids —
    which the retrain arm maintains by construction."""
    from .. import sinks
    from ..operators import similarity as sim_ops

    rows = sinks.read_snapshot(spark, f"{state_dir}/model").orderBy("cell").collect()
    cents = [(int(r["cell"]), [float(x) for x in r["c"]]) for r in rows]
    probe = sim_ops.probe_cells(cents, [float(x) for x in query_vec], n_probe)
    idx = sinks.read_appended(spark, f"{state_dir}/idx").filter(F.col("cell").isin(probe))
    return sim_ops.brute_force_top_k(idx, vec_col, id_col, [float(x) for x in query_vec], k)


def contamination_gate_sink(
    eval_shingles: DataFrame,
    accepted_dir: str,
    quarantined_dir: str,
    text_col: str,
    id_col: str,
    shingle_k: int = 3,
    max_hit_micro: int = 0,
    m_bits: int = 1 << 20,
    max_segments: int = 16,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch INGEST GATE against eval-set contamination: every
    incoming document's distinct k-shingles are checked against the
    (small, fixed) eval-set shingle relation, and documents whose
    hit share exceeds ``max_hit_micro`` (micro-units; default 0 = any
    hit) are QUARANTINED instead of landed — the streaming half of the
    ``contamination_check`` batch audit: the audit measures leakage
    after the fact, the gate stops it at the door, which is where a
    training pipeline actually wants it.

    Plan per epoch: shingle ONLY the batch; an explicit bloom bitset
    built ONCE from the eval shingles (broadcast, ⌈m_bits/64⌉ rows)
    prunes the exact semi-join to candidate shingles — no false
    negatives, and bloom false positives die in the exact join, so
    the split is bit-identical with pruning on or off (the
    contamination_check contract). Cost: O(batch shingles), never
    O(corpus).

    Exactly-once: both appends carry ``txn_key=epoch`` through
    ``sinks.append_snapshot`` — a replayed epoch finds its committed
    segment and no-ops; a crash between the two appends re-runs the
    epoch and each table independently keeps or completes its own
    segment (per-table idempotence, the Delta txnAppId shape).
    Documents with no shingles (shorter than k tokens) have nothing
    to match and are accepted with zero stats.
    """
    from .. import sinks
    from ..functions.text import shingles
    from ..operators.bloom import bloom_prune, build_bloom

    ev = (
        eval_shingles.select(F.col(eval_shingles.columns[0]).alias("__es"))
        .distinct()
        .localCheckpoint(eager=True)  # eval grain: small fixed set
    )
    bloom = build_bloom(ev, "__es", m_bits).localCheckpoint(eager=True)

    def gate(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sh = batch_df.select(
            F.col(id_col).alias("__id"),
            F.explode(F.array_distinct(shingles(text_col, shingle_k))).alias("__s"),
        )
        n_sh = sh.groupBy("__id").agg(F.count(F.lit(1)).cast("long").alias("n_shingles"))
        hits = (
            bloom_prune(sh, "__s", bloom, m_bits)
            .join(ev, F.col("__s") == F.col("__es"), "left_semi")
            .groupBy("__id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_eval_hits"))
        )
        stats = (
            n_sh.join(hits, "__id", "left")
            .select(
                "__id",
                "n_shingles",
                F.coalesce("n_eval_hits", F.lit(0)).cast("long").alias("n_eval_hits"),
            )
            .withColumn(
                "hit_micro",
                F.when(
                    F.col("n_shingles") > 0,
                    F.floor(
                        F.lit(1000000.0)
                        * F.col("n_eval_hits").cast("double")
                        / F.col("n_shingles").cast("double")
                    ),
                )
                .otherwise(F.lit(0))
                .cast("long"),
            )
        )
        out = (
            batch_df.join(stats, batch_df[id_col] == stats["__id"], "left")
            .drop("__id")
            .na.fill({"n_shingles": 0, "n_eval_hits": 0, "hit_micro": 0})
            .localCheckpoint(eager=True)  # batch grain: feeds both splits
        )
        key = f"epoch={int(epoch_id)}"
        sinks.append_snapshot(
            out.filter(F.col("hit_micro") <= max_hit_micro), accepted_dir, txn_key=key
        )
        sinks.append_snapshot(
            out.filter(F.col("hit_micro") > max_hit_micro), quarantined_dir, txn_key=key
        )
        # segment-count bound (r13 verdict item 2): fold past
        # max_segments; replays survive through the _TXNS log
        for d in (accepted_dir, quarantined_dir):
            sinks.maybe_compact(batch_df.sparkSession, d, max_segments=max_segments)

    return gate


def semantic_gate_sink(
    state_dir: str,
    accepted_dir: str,
    quarantined_dir: str,
    vec_col: str,
    id_col: str,
    centroids: DataFrame,
    threshold: float = 0.3,
    max_segments: int = 16,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch INGEST GATE against SEMANTIC near-duplicates
    (batch twin: ``dedup.semantic_dedup`` under the same frozen
    cluster model) — the embedding-space member of the at-the-door
    family (r13 verdict item 5), completing the symmetry: exact
    substring (suffix_span_sink), MinHash (minhash_gate_sink), n-gram
    contamination (contamination_gate_sink), and now SemDeDup.

    Each epoch assigns ONLY the batch to the frozen ``centroids``
    model (``similarity.nearest_centroid_assign`` — k·dim broadcast
    literal, the ivf_append_sink posture: a shifting quantizer would
    scatter one logical cluster across segments), prunes it within-
    cell against the at-rest ASSIGNMENT segments (``{state_dir}/asg``)
    plus lower-id batch members, and splits: a batch vector with a
    cosine ≥ ``threshold`` lower-id neighbor in its cluster is
    QUARANTINED, the rest are accepted. EVERY vector — kept or
    quarantined — folds into the assignment segments (the
    minhash_gate_sink discipline; pruning against the FULL at-rest
    assignment, not kept reps, is what makes the labels equal the
    batch twin's deliberately non-transitive any-lower-id rule — the
    reps-only retention contract belongs to
    ``dedup.semantic_dedup_incremental``, a different operator).
    Cosines are rounded to 6 decimals exactly as the batch twin does,
    so the pinned-equal pytest law is bit-for-bit.

    MONOTONE-ID CONTRACT + exactly-once: identical to
    minhash_gate_sink — late/reordered ids refuse (ValueError); a
    ``_SMG_COMMIT`` marker (``epoch:maxid``, ONE atomic replace) makes
    replays strict no-ops; per-table ``txn_key`` heals crashes
    mid-epoch; the prior assignment is read under an
    ``id < min(batch)`` range filter. All three tables compact through
    ``sinks.maybe_compact`` past ``max_segments``.

    Scale: per-epoch cost is |batch| × (cluster-local at-rest + batch)
    dot products confined to the cluster join key — never corpus²; the
    at-rest side contributes only the clusters the batch touches
    (cluster-key join, partition-prunable when the segments are laid
    out by cluster).
    """
    import os

    from .. import sinks
    from ..functions.vector import dot, norm
    from ..operators import similarity as sim_ops

    asg_dir = f"{state_dir}/asg"
    commit_marker_path = f"{state_dir}/_SMG_COMMIT"
    cents = centroids.localCheckpoint(eager=True)  # frozen k·dim model

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        os.makedirs(state_dir, exist_ok=True)
        commit = _read_commit(commit_marker_path)
        if commit is not None and int(epoch_id) <= commit[0]:
            return  # replay: every table committed before the marker
        batch = batch_df.dropDuplicates([id_col])
        bounds = batch.agg(
            F.min(F.col(id_col)).alias("lo"), F.max(F.col(id_col)).alias("hi")
        ).first()
        max_seen = commit[1] if commit is not None else None
        if max_seen is not None and int(bounds["lo"]) <= max_seen:
            raise ValueError(
                f"semantic_gate_sink: epoch {epoch_id} carries id "
                f"{bounds['lo']} at-or-below the folded maximum {max_seen} "
                "— late/reordered ids break the keep-first-by-id law; "
                "re-key or replay through the original epoch instead"
            )
        assigned = sim_ops.nearest_centroid_assign(batch, vec_col, id_col, cents)
        base = (
            batch.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col))
            .join(assigned, id_col)
            .withColumn("__nrm", norm(vec_col))
            .localCheckpoint(eager=True)  # batch grain: both prune arms + append
        )
        try:
            prior = sinks.read_appended(spark, asg_dir).filter(
                F.col(id_col) < bounds["lo"]
            )
        except OSError:
            prior = None
        a = base.select(
            F.col("cluster"),
            F.col(id_col).alias("__ida"),
            F.col(vec_col).alias("__va"),
            F.col("__nrm").alias("__na"),
        )
        b = base.select(
            F.col("cluster"),
            F.col(id_col).alias("__idb"),
            F.col(vec_col).alias("__vb"),
            F.col("__nrm").alias("__nb"),
        )
        drop_new = (
            a.join(b, "cluster")
            .filter(F.col("__idb") < F.col("__ida"))
            .withColumn(
                "__cos",
                F.round(dot("__va", "__vb") / (F.col("__na") * F.col("__nb")), 6),
            )
            .filter(F.col("__cos") >= threshold)
            .select(F.col("__ida").alias(id_col))
        )
        dropped = drop_new
        if prior is not None:
            p = prior.select(
                F.col("cluster"),
                F.col(vec_col).alias("__vb"),
                F.col("__nrm").alias("__nb"),
            )
            drop_prior = (
                a.join(p, "cluster")
                .withColumn(
                    "__cos",
                    F.round(dot("__va", "__vb") / (F.col("__na") * F.col("__nb")), 6),
                )
                .filter(F.col("__cos") >= threshold)
                .select(F.col("__ida").alias(id_col))
            )
            dropped = dropped.unionByName(drop_prior)
        dropped = dropped.distinct().withColumn("__drop", F.lit(1))
        labeled = (
            batch.join(dropped, id_col, "left")
            .withColumn("__keep", F.col("__drop").isNull())
            .drop("__drop")
            .localCheckpoint(eager=True)  # batch grain; pins the split
        )
        txn = f"epoch={int(epoch_id)}"
        sinks.append_snapshot(base, asg_dir, txn_key=txn)
        sinks.append_snapshot(
            labeled.filter(F.col("__keep")).drop("__keep"), accepted_dir, txn_key=txn
        )
        sinks.append_snapshot(
            labeled.filter(~F.col("__keep")).drop("__keep"),
            quarantined_dir,
            txn_key=txn,
        )
        _write_commit(commit_marker_path, int(epoch_id), int(bounds["hi"]))  # commit point
        for d in (asg_dir, accepted_dir, quarantined_dir):
            sinks.maybe_compact(spark, d, max_segments=max_segments)

    return fold


def quantile_sketch_sink(
    state_dir: str,
    mv_dir: str,
    value_col: str,
    part_col: str,
    lo: float,
    hi: float,
    n_buckets: int = 64,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> Callable[[DataFrame, int], None]:
    """foreachBatch maintainer for the streaming quantile sketch
    (batch twins: ``sketch.histogram_table`` + ``histogram_quantiles``)
    — rolling latency/value percentiles over an unbounded stream at
    O(batch + n_buckets·parts) per epoch, the monitoring read every
    ops dashboard wants from a 100 TB event stream.

    The state is the at-rest (part, bucket, c) histogram partial over
    the FIXED [lo, hi) range; folding a micro-batch is counter
    ADDITION (the CMS merge law — associative, commutative), so the
    state after any prefix of the stream equals the batch sketch over
    the union of its rows, bit for bit (pinned by the pytest law).
    The MV is the quantile table recomputed from the state each epoch
    — a pure function of state, so crash-replay overwrite is
    idempotent (the ab_readout_sink healing pattern).

    Exactly-once: ``_QS_EPOCH`` marker; replayed epochs skip ONLY the
    counter fold (adding the same counters twice would double mass —
    the guard is load-bearing) but still recompute and overwrite the
    MV from the current state, exactly as ab_readout_sink's `already`
    branch does — a crash between the state write (which commits
    ``_QS_EPOCH``) and the MV write would otherwise leave the MV stale
    forever on replay (r12 advice). Unlike the day-cursor growth sink
    there is NO late-data refusal: bucket counters fold in any order.
    """
    from .. import sinks
    from ..operators import sketch as sketch_ops

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        epoch_marker = sinks.snapshot_meta(state_dir, "_QS_EPOCH")
        already = epoch_marker is not None and int(epoch_id) <= int(epoch_marker)
        if not already:
            part = sketch_ops.histogram_table(
                batch_df, value_col, F.col(part_col), lo, hi, n_buckets
            )
            try:
                prior = sinks.read_snapshot(spark, state_dir)
            except OSError:
                prior = spark.createDataFrame([], "part string, bucket int, c long")
            merged = (
                prior.unionByName(
                    part.select(
                        F.col("part").cast("string").alias("part"),
                        F.col("bucket").cast("int").alias("bucket"),
                        F.col("c").cast("long").alias("c"),
                    )
                )
                .groupBy("part", "bucket")
                .agg(F.sum("c").cast("long").alias("c"))
                .localCheckpoint(eager=True)  # sketch grain: n_buckets x parts
            )
            sinks.write_snapshot(
                merged, state_dir, meta={"_QS_EPOCH": str(int(epoch_id))}
            )
        # MV: pure function of current state — recompute + overwrite is
        # idempotent, so running it on the `already` branch too is what
        # heals a crash that landed the state write but lost the MV write
        mv = sketch_ops.histogram_quantiles(
            sinks.read_snapshot(spark, state_dir), list(qs), lo, hi, n_buckets
        ).localCheckpoint(eager=True)
        sinks.write_snapshot(mv, mv_dir)

    return fold


def heavy_hitters_monitor(
    stream_df: DataFrame,
    key_col: str,
    item_col: str,
    k: int = 10,
) -> DataFrame:
    """Streaming per-key top-k heavy hitters via SpaceSaving (Metwally
    et al., "Efficient computation of frequent and top-k elements in
    data streams") — the online counterpart of the batch
    ``heavy_hitters_cms`` sketch, as a custom stateful operator
    (``applyInPandasWithState``).

    State per key: at most ``k`` counters (item, count, err). Each
    micro-batch folds its LOCAL exact item counts (weighted
    SpaceSaving): a tracked item adds its weight; an untracked item
    takes a free slot if one exists, else EVICTS the minimum counter m
    and starts at (m.count + w, err = m.count) — ties on the minimum
    break by lexicographic item so the fold is deterministic for a
    fixed batching. Guarantees after ANY prefix of the stream (the
    published invariants, pinned by the pytest law): every tracked
    item's true count lies in [count − err, count]; any item whose
    true count exceeds N/k (N = total weight seen) is tracked; count
    is never an undercount. Output mode 'update': the current top-k
    (by count, then item) per touched key each batch.

    State is O(keys × k) — bounded regardless of item cardinality,
    which is the whole point: exact per-item counting of an unbounded
    item domain is the thing a 100 TB stream cannot hold. Re-batching
    the same rows can change WHICH borderline items are tracked (the
    algorithm is order-sensitive by nature) but never violates the
    error envelope — the law tests assert the envelope, not a fixed
    counter set.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "k string, item string, count_est bigint, err bigint, n_total bigint"
    state_schema = "items array<string>, counts array<bigint>, errs array<bigint>, n bigint"

    def fn(key: tuple, pdfs, state: GroupState):
        if state.exists:
            items, counts, errs, n = state.get
            slots = {it: (c, e) for it, c, e in zip(items, counts, errs)}
        else:
            slots, n = {}, 0
        batch = pd.concat(list(pdfs))
        local = batch[item_col].value_counts().sort_index()
        for item, w in local.items():
            w = int(w)
            n += w
            if item in slots:
                c, e = slots[item]
                slots[item] = (c + w, e)
            elif len(slots) < k:
                slots[item] = (w, 0)
            else:
                evict = min(slots.items(), key=lambda kv: (kv[1][0], kv[0]))
                m_item, (m_count, _) = evict
                del slots[m_item]
                slots[item] = (m_count + w, m_count)
        ordered = sorted(slots.items(), key=lambda kv: (-kv[1][0], kv[0]))
        state.update(
            (
                [it for it, _ in ordered],
                [c for _, (c, _) in ordered],
                [e for _, (_, e) in ordered],
                n,
            )
        )
        yield pd.DataFrame(
            {
                "k": [key[0]] * len(ordered),
                "item": [it for it, _ in ordered],
                "count_est": [c for _, (c, _) in ordered],
                "err": [e for _, (_, e) in ordered],
                "n_total": [n] * len(ordered),
            }
        )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def curation_gate_sink(
    state_dir: str,
    accepted_dir: str,
    quarantined_dir: str,
    text_col: str,
    id_col: str,
    lang_col: str,
    source_col: str,
    eval_docs: DataFrame,
    *,
    keep_lang: str = "en",
    min_quality_x3: int = 3,
    eval_source: str = "src0",
    shingle_k: int = 8,
    budget_tokens: int = 200,
    max_segments: int = 16,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch COMPOSED curation gate — the whole
    ``plans.corpus_pipeline.curation_funnel`` cascade at the streaming
    door (batch twin: ``curation_funnel``; fold kernel:
    ``curation_funnel_incremental``). Where the other at-the-door
    members each guard ONE hazard (minhash near-dups, exact
    substrings, n-gram contamination, semantic near-dups), this gate
    runs the full pretraining admission pipeline per epoch: integer
    quality gate → language gate → exact-dup gate against the at-rest
    fingerprint index → decontamination against the FROZEN eval
    shingle set → per-source token-budget fold.

    Per-epoch state:

    - ``{state_dir}/fp``     — append-only (fp, id) index of admitted
      dedup winners; probed bloom-pruned by the batch's fingerprints.
      The stream's monotone-id refusal makes usurpation structurally
      impossible (every batch id exceeds every at-rest id), so the
      fold needs no usurpation fail-stop — strictly stronger than the
      batch-incremental operator's per-fingerprint contract.
    - ``{state_dir}/levels`` — append-only doc-grain audit
      (id, source, n_tokens, lvl4, reason): the funnel's stages 0–4
      are append-only under the contracts, so the at-rest funnel is
      one aggregate over this relation (:func:`curation_gate_funnel`).
    - ``{state_dir}/sel`` + ``{state_dir}/sel_cutoff`` — the budget
      family's REWRITTEN snapshot pair (token_budget_sink mechanics:
      cutoff commits first; the fold under a tightened cutoff is
      idempotent by the prefix rule; the sel snapshot's own epoch meta
      guards the double-fold replay window).
    - eval shingles + their bloom are frozen at sink construction
      (``eval_docs`` is the fixed upstream eval set — the frozen-eval
      contract; batch rows claiming ``eval_source`` refuse loudly),
      and so is the eval DEDUP-CONTENDER relation (min eval id per
      fingerprint among gate-passing eval docs): the batch twin lets
      a lower-id eval doc win a fingerprint, so the gate must too —
      ids are one space across eval ∪ stream.

    Exactly-once: ``_CGS_COMMIT`` (``epoch:maxid``, ONE atomic
    replace) + per-table txn keys + the ``id < min(batch)`` range
    filter on at-rest reads; append tables compact past
    ``max_segments``. Pinned law: after EVERY epoch
    ``curation_gate_funnel`` ≡ ``curation_funnel`` over all docs ever
    folded plus the frozen eval set, bit-for-bit.
    """
    import os

    from .. import sinks
    from ..functions import text as text_fns
    from ..operators import bloom as bloom_ops
    from ..operators import corpus as corpus_ops

    fp_dir = f"{state_dir}/fp"
    levels_dir = f"{state_dir}/levels"
    sel_dir = f"{state_dir}/sel"
    cutoff_dir = f"{state_dir}/sel_cutoff"
    commit_marker_path = f"{state_dir}/_CGS_COMMIT"

    eval_sh = (
        eval_docs.select(
            F.explode(
                F.array_distinct(text_fns.shingles(text_col, shingle_k))
            ).alias("s")
        )
        .distinct()
        .localCheckpoint(eager=True)  # frozen eval shingle set
    )
    ebloom = bloom_ops.build_bloom(eval_sh, "s").localCheckpoint(eager=True)
    # frozen eval DEDUP CONTENDERS: in the batch twin, eval docs that
    # pass the quality/lang gates compete for min-id fingerprint
    # winnership (and then die at the decontamination stage); a train
    # doc sharing a fingerprint with a LOWER-id eval doc must lose
    # here too, or the gate would diverge from the batch path. Ids are
    # one space across eval ∪ stream (the batch twin's ordering).
    eval_norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    eval_fp = (
        eval_docs.filter(
            (text_fns.quality_score_int3(text_col) >= min_quality_x3)
            & F.col(lang_col).eqNullSafe(F.lit(keep_lang))
        )
        .select(F.md5(eval_norm).alias("__fp"), F.col(id_col))
        .groupBy("__fp")
        .agg(F.min(id_col).alias("__eval_id"))
        .localCheckpoint(eager=True)
    )

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        os.makedirs(state_dir, exist_ok=True)
        commit = _read_commit(commit_marker_path)
        if commit is not None and int(epoch_id) <= commit[0]:
            return  # replay: every table committed before the marker
        batch_raw = batch_df.dropDuplicates([id_col])
        bounds = batch_raw.agg(
            F.min(F.col(id_col)).alias("lo"), F.max(F.col(id_col)).alias("hi")
        ).first()
        max_seen = commit[1] if commit is not None else None
        if max_seen is not None and int(bounds["lo"]) <= max_seen:
            raise ValueError(
                f"curation_gate_sink: epoch {epoch_id} carries id "
                f"{bounds['lo']} at-or-below the folded maximum {max_seen} "
                "— late/reordered ids break the keep-first-by-id dedup law; "
                "re-key or replay through the original epoch instead"
            )
        no_eval = F.assert_true(
            ~F.col(source_col).eqNullSafe(F.lit(eval_source)),
            F.lit(
                "curation_gate_sink: batch contains eval-source rows — the"
                " eval set is frozen at sink construction (a streamed eval"
                " doc would retroactively contaminate admitted documents)"
            ),
        )
        norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
        b = batch_raw.select(
            F.col(id_col),
            F.col(lang_col).alias("__lang"),
            F.when(no_eval.isNull(), F.col(source_col)).alias("__source"),
            text_fns.quality_score_int3(text_col).alias("__q3"),
            text_fns.whitespace_token_count(text_col).cast("long").alias("__ntok"),
            F.md5(norm).alias("__fp"),
        ).localCheckpoint(eager=True)  # batch grain: gates + appends

        b_s2 = b.filter(
            (F.col("__q3") >= min_quality_x3)
            & F.col("__lang").eqNullSafe(F.lit(keep_lang))
        )
        try:
            rest_fp = sinks.read_appended(spark, fp_dir).filter(
                F.col(id_col) < bounds["lo"]
            )
        except OSError:
            rest_fp = None
        if rest_fp is not None:
            bbloom = bloom_ops.build_bloom(b_s2, "__fp")
            cand = bloom_ops.bloom_prune(
                rest_fp.select(F.col("fp").alias("__fp")), "__fp", bbloom
            ).withColumn("__hit", F.lit(1))
            fresh = (
                b_s2.join(cand, "__fp", "left")
                .filter(F.col("__hit").isNull())
                .drop("__hit")
            )
        else:
            fresh = b_s2
        fresh = (
            fresh.join(eval_fp, "__fp", "left")
            .filter(
                F.col("__eval_id").isNull() | (F.col(id_col) < F.col("__eval_id"))
            )
            .drop("__eval_id")
        )
        bwin = fresh.groupBy("__fp").agg(F.min(id_col).alias(id_col))
        b_s3 = fresh.join(bwin, ["__fp", id_col], "semi")

        b_text = batch_raw.select(F.col(id_col), F.col(text_col)).join(
            b_s3.select(id_col), id_col, "semi"
        )
        b_sh = b_text.select(
            F.col(id_col),
            F.explode(
                F.array_distinct(text_fns.shingles(text_col, shingle_k))
            ).alias("s"),
        )
        contaminated = (
            bloom_ops.bloom_prune(b_sh, "s", ebloom)
            .join(eval_sh, "s", "semi")
            .select(id_col)
            .distinct()
            .withColumn("__c", F.lit(1))
        )
        lab = (
            b.join(b_s3.select(id_col).withColumn("__w3", F.lit(1)), id_col, "left")
            .join(contaminated, id_col, "left")
            .withColumn(
                "lvl4",
                F.when(F.col("__q3") < min_quality_x3, F.lit(0))
                .when(~F.col("__lang").eqNullSafe(F.lit(keep_lang)), F.lit(1))
                .when(F.col("__w3").isNull(), F.lit(2))
                .when(F.col("__c").isNotNull(), F.lit(3))
                .otherwise(F.lit(4)),
            )
            .select(
                F.col(id_col),
                F.col("__source").alias("source"),
                F.col("__fp").alias("fp"),
                F.col("__q3").alias("quality_x3"),
                F.col("__ntok").alias("n_tokens"),
                "lvl4",
                F.element_at(
                    F.array(
                        F.lit("quality"),
                        F.lit("lang"),
                        F.lit("exact_dup"),
                        F.lit("contaminated"),
                        F.lit("admitted"),
                    ),
                    F.col("lvl4") + 1,
                ).alias("reason"),
            )
            .localCheckpoint(eager=True)  # pins the split for all writes
        )

        txn = f"epoch={int(epoch_id)}"
        sinks.append_snapshot(
            lab.filter(F.col("lvl4") >= 3).select("fp", F.col(id_col)),
            fp_dir,
            txn_key=txn,
        )
        sinks.append_snapshot(lab, levels_dir, txn_key=txn)
        admitted = lab.filter(F.col("lvl4") == 4).select(id_col).withColumn(
            "__a", F.lit(1)
        )
        out = batch_raw.join(admitted, id_col, "left")
        sinks.append_snapshot(
            out.filter(F.col("__a").isNotNull()).drop("__a"),
            accepted_dir,
            txn_key=txn,
        )
        sinks.append_snapshot(
            out.filter(F.col("__a").isNull())
            .drop("__a")
            .join(lab.select(id_col, "reason"), id_col, "left"),
            quarantined_dir,
            txn_key=txn,
        )

        sel_epoch = sinks.snapshot_meta(sel_dir, "_CGS_SEL_EPOCH")
        if sel_epoch is None or int(sel_epoch) < int(epoch_id):
            batch_new_docs = batch_raw.join(
                lab.filter(F.col("lvl4") == 4).select(id_col), id_col, "semi"
            )
            try:
                prior_sel = sinks.read_snapshot(spark, sel_dir)
            except OSError:
                prior_sel = spark.createDataFrame(
                    [], f"source string, {id_col} long, quality_x3 int, n_tokens long"
                )
            id_type = batch_df.schema[id_col].dataType.simpleString()
            try:
                prior_cut = sinks.read_snapshot(spark, cutoff_dir)
            except OSError:
                prior_cut = spark.createDataFrame(
                    [], f"source string, cut_quality_x3 int, cut_id {id_type}"
                )
            cum = corpus_ops._token_budget_fold_cum(
                prior_sel.select(
                    "source", F.col(id_col), "quality_x3", "n_tokens"
                ),
                prior_cut,
                batch_new_docs,
                text_col,
                id_col,
                source_col,
            ).localCheckpoint(eager=True)  # fold grain: budget + batch bounded
            sel = cum.filter(F.col("cum_tokens") <= budget_tokens).select(
                "source", F.col(id_col), "quality_x3", "n_tokens", "cum_tokens"
            )
            fold_cut = corpus_ops._first_rejected_cutoff(cum, id_col, budget_tokens)
            new_cut = corpus_ops._cutoff_rank_min(prior_cut, fold_cut)
            sinks.write_snapshot(new_cut, cutoff_dir)  # cutoff first — converges
            sinks.write_snapshot(
                sel, sel_dir, meta={"_CGS_SEL_EPOCH": str(int(epoch_id))}
            )
        _write_commit(commit_marker_path, int(epoch_id), int(bounds["hi"]))  # commit
        for d in (fp_dir, levels_dir, accepted_dir, quarantined_dir):
            sinks.maybe_compact(spark, d, max_segments=max_segments)

    return fold


def curation_gate_funnel(
    spark: SparkSession, state_dir: str, checksum_mod: int = 262139
) -> DataFrame:
    """The at-rest curation funnel of a :func:`curation_gate_sink`
    table: stages 0–4 aggregate the append-only levels audit; stage 5
    re-flags by the CURRENT budget selection snapshot (eviction-aware).
    Equals ``plans.corpus_pipeline.curation_funnel`` over every doc
    ever folded plus the frozen eval set's raw rows EXCLUDED — the
    gate never sees eval docs, so its funnel is the train-side funnel
    (the pinned pytest law constructs the twin accordingly)."""
    from .. import sinks
    from ..plans.corpus_pipeline import _funnel_rows

    levels = sinks.read_appended(spark, f"{state_dir}/levels")
    id_col = levels.columns[0]
    try:
        sel = sinks.read_snapshot(spark, f"{state_dir}/sel").select(
            F.col(id_col)
        ).withColumn("__sel", F.lit(1))
    except OSError:
        sel = None
    lab = levels.select(
        F.col(id_col).alias("doc_id"), "n_tokens", F.col("lvl4")
    )
    if sel is not None:
        lab = lab.join(
            sel.select(F.col(id_col).alias("doc_id"), "__sel"), "doc_id", "left"
        )
    else:
        lab = lab.withColumn("__sel", F.lit(None).cast("int"))
    lab = lab.withColumn(
        "level",
        F.when((F.col("lvl4") == 4) & F.col("__sel").isNotNull(), F.lit(5)).otherwise(
            F.col("lvl4")
        ),
    ).select("doc_id", "n_tokens", "level")
    return _funnel_rows(lab, checksum_mod)
