"""Structured Streaming sink + change replay for engine tables.

Kudu's Spark streaming sink routes every micro-batch through
``KuduContext.writeRows`` with a configurable operation
(java/kudu-spark/DefaultSource.scala:538-556 ``KuduSink.addBatch``,
test StreamingTest.scala:49-54). The Spark-native equivalent is
``foreachBatch``: each micro-batch is a plain DataFrame handed to the
table's mutation API, so one micro-batch = one atomic commit = one
table version — exactly Kudu's session-flush-per-batch behavior.

``apply_changes`` is the restore/replication consumer
(java/kudu-backup/KuduRestore.scala row-action replay;
java/kudu-replication/ReplicationJob.java): rows tagged
``_is_deleted`` become DELETEs, the rest UPSERTs, applied in
``_change_version`` order so a changelog replays to the exact source
state. ``replicate`` wires source→sink into a continuous replication
job (checkpointed, restartable, Trigger.AvailableNow for catch-up).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from kudu_spark.streaming.source import DELETED_COL, VERSION_COL, stream_changes

_OPS = ("insert", "insert_ignore", "upsert", "upsert_ignore",
        "update", "update_ignore", "delete", "delete_ignore")


def write_stream(
    stream_df: DataFrame,
    table,
    op: str = "upsert",
    checkpoint: str | None = None,
    available_now: bool = False,
    processing_time: str | None = None,
    query_name: str | None = None,
    dedup_keys: list[str] | None = None,
    dedup_ts_col: str = "ts",
    dedup_watermark: str = "10 minutes",
):
    """Start a streaming write into an engine table (≈ KuduSink).

    ``op`` picks the mutation ( upsert default, like the connector's
    OperationType default for streams).

    ``dedup_keys`` inserts a watermark-bounded streaming dedup
    (``dropDuplicatesWithinWatermark``) before the sink: an
    at-least-once upstream (replayed Kafka offsets, retried file
    batches) lands effectively-once even for ``op='insert'``, which
    would otherwise raise on the duplicate PK. State is per-key in
    the state store and expires with the watermark — bounded by key
    cardinality per window, not stream length."""
    if op not in _OPS:
        raise ValueError(f"op must be one of {_OPS}")
    if dedup_keys:
        stream_df = stream_df.withWatermark(
            dedup_ts_col, dedup_watermark
        ).dropDuplicatesWithinWatermark(dedup_keys)

    def process(batch_df: DataFrame, _batch_id: int) -> None:
        if not batch_df.isEmpty():
            getattr(table, op)(batch_df)

    w = stream_df.writeStream.foreachBatch(process).outputMode("update")
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    if query_name:
        w = w.queryName(query_name)
    if available_now:
        w = w.trigger(availableNow=True)
    elif processing_time:
        w = w.trigger(processingTime=processing_time)
    return w.start()


def apply_changes(table, changes: DataFrame) -> None:
    """Replay a changelog / diff-scan result into a table (≈ KuduRestore).

    Accepts either a collapsed diff (``diff_scan`` output: one net row
    per PK, no version column) or a full changelog (``kudu_cdc``
    source: per-commit rows with ``_change_version``). Changelogs are
    applied one source version at a time, in order — upserts and
    deletes within one source commit are a single op kind, so each
    step is one atomic commit on the destination."""
    data_cols = [c for c in changes.columns if c not in (DELETED_COL, VERSION_COL)]
    pk = table.schema.pk
    if VERSION_COL in changes.columns:
        versions = [
            r[0] for r in
            changes.select(VERSION_COL).distinct().sort(VERSION_COL).collect()
        ]
        slices = [changes.where(changes[VERSION_COL] == v) for v in versions]
    else:
        slices = [changes]
    for chunk in slices:
        dels = chunk.where(chunk[DELETED_COL]).select(*pk)
        ups = chunk.where(~chunk[DELETED_COL]).select(*data_cols)
        if not dels.isEmpty():
            table.delete_ignore(dels)
        if not ups.isEmpty():
            table.upsert(ups)


def windowed_rollup(
    stream_df: DataFrame,
    table,
    ts_col: str,
    window_duration: str,
    aggs: dict,
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
    checkpoint: str | None = None,
    available_now: bool = False,
    processing_time: str | None = None,
):
    """Continuous aggregate: watermarked tumbling-window aggregation
    streamed into an engine table (hypertable-rollup shape). Each
    micro-batch upserts the affected windows by PK
    (window_start, *keys), so the table always holds the current
    rollup and late data within the watermark revises it in place —
    update-mode semantics made durable via the mutation surface.
    ``aggs`` maps output column -> aggregate Column."""
    from pyspark.sql import functions as F

    keys = keys or []
    agg = (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration).alias("__w"), *keys)
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
        .select(
            F.col("__w.start").alias("window_start"),
            *keys,
            *aggs.keys(),
        )
    )
    return write_stream(
        agg, table, op="upsert", checkpoint=checkpoint,
        available_now=available_now, processing_time=processing_time,
    )


def replicate(
    src_table,
    dst_table,
    checkpoint: str,
    from_version: int = 0,
    available_now: bool = True,
    processing_time: str | None = None,
):
    """Continuous table→table replication (≈ kudu-replication job):
    stream the source's change feed, replay each micro-batch onto the
    destination. Restart-safe via the stream checkpoint."""
    changes = stream_changes(src_table.spark, src_table.root, from_version)

    def process(batch_df: DataFrame, _batch_id: int) -> None:
        if not batch_df.isEmpty():
            apply_changes(dst_table, batch_df)

    w = (
        changes.writeStream.foreachBatch(process)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    elif processing_time:
        w = w.trigger(processingTime=processing_time)
    return w.start()
