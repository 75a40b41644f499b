"""Streaming surface: CDC source (batch + readStream), foreachBatch
sink (≈ KuduSink, DefaultSource.scala:538-556), change replay
(≈ KuduRestore), and end-to-end replication (≈ kudu-replication)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kudu_spark.engine import Engine
from kudu_spark.streaming import (
    apply_changes,
    read_changes,
    replicate,
    stream_changes,
    write_stream,
)

SCHEMA = [
    ("k", "bigint", False),
    ("v", "int", True),
    ("ts", "timestamp", True),
    ("s", "string", True),
]


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, str(tmp_path / "wh"))


def rows(spark, keys, v=0):
    return spark.range(0).sparkSession.createDataFrame(
        [(k, k * 10 + v, None, f"s{k}") for k in keys],
        "k bigint, v int, ts timestamp, s string",
    ).withColumn("ts", F.timestamp_micros(F.col("k") * 1_000_000))


def mutated_table(engine, spark):
    t = engine.create_table("src", SCHEMA, pk=["k"])
    v_ins = t.insert(rows(spark, range(10)))                      # 10 inserts
    v_ups = t.upsert(rows(spark, [3, 4, 11], v=7))                # 2 replace + 1 new
    v_del = t.delete(spark.createDataFrame([(0,), (11,)], "k bigint"))  # 2 deletes
    return t, v_ins, v_ups, v_del


def test_batch_changelog(engine, spark):
    t, v_ins, v_ups, v_del = mutated_table(engine, spark)
    ch = read_changes(spark, t.root)
    assert set(ch.columns) == {"k", "v", "ts", "s", "_change_version", "_is_deleted"}
    by_v = {
        r["_change_version"]: r["n"]
        for r in ch.groupBy("_change_version").agg(F.count("*").alias("n")).collect()
    }
    assert by_v == {v_ins: 10, v_ups: 3, v_del: 2}
    dels = ch.where("_is_deleted").select("k").collect()
    assert sorted(r.k for r in dels) == [0, 11]
    # window selection: only the upsert commit
    ch2 = read_changes(spark, t.root, from_version=v_ins, to_version=v_ups)
    got = {r.k: r.v for r in ch2.collect()}
    assert got == {3: 37, 4: 47, 11: 117}
    # timestamp round-trips through the arrow path
    ts = {r.k: r.ts for r in ch2.select("k", "ts").collect()}
    assert ts[3].second == 3 and ts[3].minute == 0 and ts[3].hour == 0


def test_changelog_skips_compaction(engine, spark):
    t, *_ = mutated_table(engine, spark)
    v3 = t.version
    t.compact()
    ch = read_changes(spark, t.root, from_version=v3)
    assert ch.count() == 0  # compaction is not a logical change


def test_stream_changelog_and_replicate(engine, spark, tmp_path):
    src, *_ = mutated_table(engine, spark)
    dst = engine.create_table("dst", SCHEMA, pk=["k"])
    q = replicate(src, dst, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    want = {(r.k, r.v, r.s) for r in src.scan().collect()}
    got = {(r.k, r.v, r.s) for r in dst.scan().collect()}
    assert got == want
    # incremental catch-up from the same checkpoint picks up new commits
    src.upsert(rows(spark, [2, 20], v=5))
    src.delete(spark.createDataFrame([(1,)], "k bigint"))
    q2 = replicate(src, dst, checkpoint=str(tmp_path / "ckpt"))
    q2.awaitTermination(120)
    want = {(r.k, r.v, r.s) for r in src.scan().collect()}
    got = {(r.k, r.v, r.s) for r in dst.scan().collect()}
    assert got == want


def test_stream_changes_to_memory_sink(engine, spark):
    t, *_ = mutated_table(engine, spark)
    q = (
        stream_changes(spark, t.root)
        .writeStream.format("memory")
        .queryName("cdc_mem")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.sql("SELECT count(*) AS n FROM cdc_mem").collect()[0].n
    assert n == 15  # 10 + 3 + 2 change rows


def test_stream_rate_limit_bounded_batches(engine, spark):
    """maxVersionsPerBatch (≈ scanner batch sizing /
    maxFilesPerTrigger): a backlog of commits drains in bounded
    micro-batches, each spanning at most that many commit versions,
    with no change row lost or duplicated."""
    import time

    t, *_ = mutated_table(engine, spark)  # 4 commits of backlog (create + 3)
    seen: list[set] = []

    def sink(df, epoch_id):
        seen.append({(r.k, r["_change_version"]) for r in df.collect()})

    q = (
        stream_changes(spark, t.root, max_versions_per_batch=1)
        .writeStream.foreachBatch(sink)
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline and sum(len(s) for s in seen) < 15:
            time.sleep(0.5)
    finally:
        q.stop()
    all_rows = set().union(*seen) if seen else set()
    assert len(all_rows) == 15, "rows lost or duplicated across batches"
    # each non-empty batch spans exactly one commit version (the cap)
    nonempty = [s for s in seen if s]
    assert len(nonempty) >= 3
    for s in nonempty:
        assert len({v for _, v in s}) == 1


def test_stream_rate_limit_restart_does_not_replay(engine, spark):
    """Probed pyspark 4.1 lifecycle (one long-lived reader per query):
    fresh start  = latestOffset -> initialOffset -> partitions;
    restart      = partitions(last WAL batch) -> latestOffset.
    Capping must hold in BOTH orders, and post-restart offsets must
    never fall below the checkpointed batch (no replay)."""
    from kudu_spark.streaming.source import ChangeFeedStreamReader

    t, *_ = mutated_table(engine, spark)  # head version >= 4
    head = t.version
    opts = {"path": t.root, "startingversion": "0", "maxversionsperbatch": "1"}
    # --- fresh start: the FIRST latestOffset (before initialOffset) caps
    r = ChangeFeedStreamReader(t.scan().schema, opts)
    assert r.latestOffset() == {"version": 1}
    assert r.initialOffset() == {"version": 0}
    r.partitions({"version": 0}, {"version": 1})
    assert r.latestOffset() == {"version": 2}  # advances one cap per batch
    # --- restart: partitions(checkpointed batch) replays first, then
    # latestOffset — monotone (never below the planned end), still capped
    r2 = ChangeFeedStreamReader(t.scan().schema, opts)
    r2.partitions({"version": head - 1}, {"version": head})
    v = r2.latestOffset()["version"]
    assert head <= v <= head + 1
    # initialOffset arriving late must not regress the floor
    r2.initialOffset()
    assert r2.latestOffset()["version"] >= head


def test_stream_rate_limit_bytes(engine, spark):
    """maxBytesPerBatch (Kudu scanner batch_size_bytes): the batch
    window stops growing once its mutation files exceed the budget,
    but always advances at least one mutation commit."""
    from kudu_spark.streaming.source import ChangeFeedStreamReader

    t, *_ = mutated_table(engine, spark)  # create + 3 mutation commits
    head = t.version
    # 1-byte budget: every batch advances exactly one mutation commit
    # (plus any zero-byte metadata commits riding along)
    opts = {"path": t.root, "startingversion": "0", "maxbytesperbatch": "1"}
    r = ChangeFeedStreamReader(t.scan().schema, opts)
    offsets = [0]
    while offsets[-1] < head:
        v = r.latestOffset()["version"]
        assert v > offsets[-1], "cap must always advance"
        r.partitions({"version": offsets[-1]}, {"version": v})
        offsets.append(v)
    assert len(offsets) - 1 >= 3  # one batch per mutation commit
    # a budget bigger than everything drains in one batch
    r2 = ChangeFeedStreamReader(
        t.scan().schema,
        {"path": t.root, "startingversion": "0", "maxbytesperbatch": str(1 << 40)},
    )
    assert r2.latestOffset() == {"version": head}
    # e2e: rows neither lost nor duplicated under the bytes cap
    seen = []
    q = (
        stream_changes(spark, t.root, max_bytes_per_batch=1)
        .writeStream.foreachBatch(
            lambda df, eid: seen.append({(x.k, x["_change_version"]) for x in df.collect()})
        )
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    try:
        import time

        deadline = time.time() + 90
        while time.time() < deadline and sum(len(s) for s in seen) < 15:
            time.sleep(0.5)
    finally:
        q.stop()
    assert len(set().union(*seen) if seen else set()) == 15


def test_stream_rate_limit_survives_restart_e2e(engine, spark, tmp_path):
    """End-to-end: a checkpointed, rate-limited stream stopped
    mid-backlog and restarted delivers every change exactly once (by
    epoch replay semantics) with every non-empty batch still spanning
    one commit version — the two properties the round-3 fix traded
    against each other, now held together through real Spark
    start/stop/restart."""
    import time

    t, *_ = mutated_table(engine, spark)  # 15 change rows over 3 commits
    ckpt = str(tmp_path / "rl-ckpt")
    by_epoch: dict[int, set] = {}

    def sink(df, epoch_id):
        # keyed by epoch: a replayed uncommitted batch overwrites its
        # first delivery instead of double-counting
        by_epoch[epoch_id] = {(r.k, r["_change_version"]) for r in df.collect()}

    def run_until(target_rows, deadline_s=90):
        q = (
            stream_changes(spark, t.root, max_versions_per_batch=1)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="250 milliseconds")
            .start()
        )
        try:
            deadline = time.time() + deadline_s
            while time.time() < deadline:
                got = set().union(*by_epoch.values()) if by_epoch else set()
                if len(got) >= target_rows:
                    break
                time.sleep(0.5)
        finally:
            q.stop()

    run_until(10)  # stop mid-backlog
    assert by_epoch, "first run delivered nothing"
    # new commits while the stream is down
    t.upsert(rows(spark, [50, 51], v=2))
    run_until(17)
    got = set().union(*by_epoch.values())
    assert len(got) == 17, "rows lost or duplicated across restart"
    # rate cap held through both runs: every non-empty batch = 1 version
    for rows_ in by_epoch.values():
        assert len({v for _, v in rows_}) <= 1


def test_sink_write_stream_upsert(engine, spark, tmp_path):
    t = engine.create_table("sunk", SCHEMA, pk=["k"])
    src_dir = str(tmp_path / "in")
    rows(spark, range(20)).write.parquet(src_dir)
    stream = spark.readStream.schema(
        "k bigint, v int, ts timestamp, s string"
    ).option("maxFilesPerTrigger", "1").parquet(src_dir)
    q = write_stream(
        stream, t, op="upsert",
        checkpoint=str(tmp_path / "sink-ckpt"), available_now=True,
    )
    q.awaitTermination(120)
    assert t.scan().count() == 20
    assert t.version >= 2  # one commit per micro-batch


def test_sink_write_stream_dedup_exactly_once_insert(engine, spark, tmp_path):
    """At-least-once upstream -> effectively-once landing: the same
    rows delivered in two micro-batches pass through the watermark
    dedup, so op='insert' (which raises on duplicate PKs) succeeds
    and each key lands once."""
    t = engine.create_table("dedup_sunk", SCHEMA, pk=["k"])
    src_dir = tmp_path / "dedup-in"
    src_dir.mkdir()
    # k >= 1: rows() maps k to epoch+k seconds, and k=0 would equal
    # Spark's initial watermark (epoch) and be dropped as late
    batch = rows(spark, range(1, 11)).coalesce(1)
    batch.write.mode("append").parquet(str(src_dir))
    batch.write.mode("append").parquet(str(src_dir))  # redelivery
    stream = spark.readStream.schema(
        "k bigint, v int, ts timestamp, s string"
    ).option("maxFilesPerTrigger", "1").parquet(str(src_dir))
    q = write_stream(
        stream, t, op="insert",
        checkpoint=str(tmp_path / "dedup-ckpt"), available_now=True,
        dedup_keys=["k"], dedup_ts_col="ts", dedup_watermark="1 hour",
    )
    q.awaitTermination(120)
    assert t.scan().count() == 10


def test_apply_changes_from_diff_scan(engine, spark):
    t, v_ins, _, _ = mutated_table(engine, spark)
    dst = engine.create_table("restored", SCHEMA, pk=["k"])
    dst.insert(rows(spark, range(10)))  # state as of the initial insert
    apply_changes(dst, t.diff_scan(from_version=v_ins))  # collapsed net diff
    want = {(r.k, r.v) for r in t.scan().collect()}
    got = {(r.k, r.v) for r in dst.scan().collect()}
    assert got == want


def test_watermark_drops_late_data(spark, tmp_path):
    """Watermark semantics on a multi-batch stream: a row older than
    the advanced watermark is excluded from its (already finalized)
    window in append mode."""
    import time

    src = tmp_path / "wm-in"
    src.mkdir()

    def write_file(name, rows):
        spark.createDataFrame(rows, "ts timestamp, v int").coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    ts = lambda m: __import__("datetime").datetime(2024, 1, 1, 10, m)
    write_file("f1", [(ts(0), 1), (ts(5), 1)])
    q = (
        spark.readStream.schema("ts timestamp, v int")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
        .writeStream.format("memory")
        .queryName("wm_mem")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "wm-ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        time.sleep(3)
        # advance watermark past 10:10 so window [10:00,10:10) finalizes
        write_file("f2", [(ts(50), 1)])
        time.sleep(4)
        # late row for the finalized window: must be dropped
        write_file("f3", [(ts(2), 99), (ts(59), 1)])
        time.sleep(4)
    finally:
        q.stop()
    got = {r.ws.minute: r.n for r in spark.sql("SELECT * FROM wm_mem").collect()}
    assert got.get(0) == 2  # late (10:02, v=99) row NOT counted


def test_windowed_rollup_into_table(engine, spark, tmp_path):
    from kudu_spark.streaming import windowed_rollup

    t = engine.create_table(
        "rollup",
        [("window_start", "timestamp", False), ("event_type", "string", False),
         ("n_events", "bigint", True), ("sum_value", "double", True)],
        pk=["window_start", "event_type"],
    )
    import datetime

    rows_ = [
        (datetime.datetime(2024, 1, 1, 10, m % 60, s), "click" if m % 2 else "view", float(m))
        for m in range(50) for s in (0, 30)
    ]
    src = tmp_path / "ru-in"
    spark.createDataFrame(rows_, "ts timestamp, event_type string, value double").write.parquet(str(src))
    stream = spark.readStream.schema("ts timestamp, event_type string, value double").parquet(str(src))
    q = windowed_rollup(
        stream, t, ts_col="ts", window_duration="10 minutes",
        aggs={"n_events": F.count(F.lit(1)), "sum_value": F.sum("value")},
        keys=["event_type"], checkpoint=str(tmp_path / "ru-ckpt"), available_now=True,
    )
    q.awaitTermination(120)
    batch = spark.createDataFrame(rows_, "ts timestamp, event_type string, value double")
    want = {
        (r.ws, r.event_type): (r.n, r.s)
        for r in batch.groupBy(
            F.window("ts", "10 minutes").alias("w"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "s").collect()
    }
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in t.scan().collect()
    }
    assert got == want


def test_stateful_running_user_stats(spark, tmp_path):
    """applyInPandasWithState custom operator: per-user running stats
    with cross-batch session counting — state carries the previous
    batch's last event time, which windowless re-aggregation can't."""
    import datetime

    from kudu_spark.streaming import running_user_stats

    base = datetime.datetime(2024, 1, 1, 9, 0)

    def ev(user, minutes, v):
        return (user, base + datetime.timedelta(minutes=minutes), float(v))

    ddl = "user_id bigint, ts timestamp, value double"
    src = tmp_path / "st-in"
    # batch 1: u1 two events 5 min apart (1 session); u2 one event
    spark.createDataFrame([ev(1, 0, 1), ev(1, 5, 2), ev(2, 0, 10)], ddl)\
        .coalesce(1).write.mode("append").parquet(str(src))
    # batch 2: u1 event 10 min after its last (same session);
    # u2 event 60 min later (NEW session — only visible via carried state)
    spark.createDataFrame([ev(1, 15, 3), ev(2, 60, 20)], ddl)\
        .coalesce(1).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema(ddl).option("maxFilesPerTrigger", "1").parquet(str(src))
    )
    q = (
        running_user_stats(stream, gap_minutes=30)
        .writeStream.format("memory").queryName("st_mem")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "st-ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM st_mem").collect()
    # latest emission per user = the one with the highest n_events
    latest = {}
    for r in rows:
        if r.user_id not in latest or r.n_events > latest[r.user_id].n_events:
            latest[r.user_id] = r
    u1, u2 = latest[1], latest[2]
    assert (u1.n_events, u1.sum_value, u1.n_sessions) == (3, 6.0, 1)
    assert (u2.n_events, u2.sum_value, u2.n_sessions) == (2, 30.0, 2)
    assert u2.last_ts.minute == 0 and u2.last_ts.hour == 10


def test_changelog_and_diff_see_transactions(engine, spark):
    """Transaction commits (op 'txn') are mutations: their rows must
    appear in the CDC changelog and their partitions must be diffed."""
    from kudu_spark.writer import Transaction

    t = engine.create_table("txs", SCHEMA, pk=["k"])
    t.insert(rows(spark, range(10)))
    v0 = t.version
    tx = Transaction(t)
    tx.upsert(rows(spark, [1, 2], v=9))
    tx.delete(spark.createDataFrame([(3,)], "k bigint"))
    tx.commit()
    ch = read_changes(spark, t.root, from_version=v0)
    got = {(r.k, r._is_deleted) for r in ch.collect()}
    assert (1, False) in got and (2, False) in got and (3, True) in got
    d = {r.k: r._is_deleted for r in t.diff_scan(v0).collect()}
    assert d == {1: False, 2: False, 3: True}


def test_stateful_streaming_funnel(spark, tmp_path):
    """Incremental funnel: per-user level carried across micro-batches
    (a later batch's click completes an earlier batch's signup->view),
    strict time ordering enforced within and across batches."""
    import datetime

    from kudu_spark.streaming import streaming_funnel

    base = datetime.datetime(2024, 1, 1, 9, 0)

    def ev(user, minutes, et):
        return (user, et, base + datetime.timedelta(minutes=minutes))

    ddl = "user_id bigint, event_type string, ts timestamp"
    src = tmp_path / "fn-in"
    # batch 1: u1 signup+view; u2 signup and a view at the SAME instant
    # (strict ordering: must not advance)
    spark.createDataFrame(
        [ev(1, 0, "signup"), ev(1, 5, "view"), ev(2, 0, "signup"), ev(2, 0, "view")],
        ddl,
    ).coalesce(1).write.mode("append").parquet(str(src))
    # Spark's file source orders files by modification time: two writes
    # landing within mtime granularity can deliver batch 2 first and
    # break the carried-state assertion (ADVICE r11). Backdate batch
    # 1's files so its trigger always fires first, deterministically.
    import os as _os
    import time as _tm

    _past = _tm.time() - 120
    for _p in src.rglob("*"):
        if _p.is_file():
            _os.utime(_p, (_past, _past))
    # batch 2: u1's click lands out of order with a purchase in the
    # same batch (purchase at t8 precedes the click at t10, so it
    # cannot complete the funnel); u2 makes no progress (click needs
    # a view first)
    spark.createDataFrame(
        [ev(1, 8, "purchase"), ev(1, 10, "click"), ev(2, 7, "click")], ddl
    ).coalesce(1).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema(ddl).option("maxFilesPerTrigger", "1").parquet(str(src))
    )
    q = (
        streaming_funnel(stream)
        .writeStream.format("memory").queryName("fn_mem")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "fn-ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM fn_mem").collect()
    latest = {}
    for r in rows:
        if r.user_id not in latest or r.level > latest[r.user_id].level:
            latest[r.user_id] = r
    # u1: signup -> view (batch 1), click (batch 2, via carried state);
    # the same-batch purchase at an EARLIER ts must not have counted
    assert latest[1].level == 3 and latest[1].reached_ts.minute == 10
    # u2: the same-instant view never advanced; the click can't skip it
    assert latest[2].level == 1
