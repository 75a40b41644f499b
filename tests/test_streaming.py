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


def test_apply_changes_from_diff_scan(engine, spark):
    t, v_ins, _, _ = mutated_table(engine, spark)
    dst = engine.create_table("restored", SCHEMA, pk=["k"])
    dst.insert(rows(spark, range(10)))  # state as of the initial insert
    apply_changes(dst, t.diff_scan(from_version=v_ins))  # collapsed net diff
    want = {(r.k, r.v) for r in t.scan().collect()}
    got = {(r.k, r.v) for r in dst.scan().collect()}
    assert got == want
