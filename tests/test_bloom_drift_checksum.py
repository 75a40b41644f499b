"""InBloomFilter predicate (column_predicate.h:143-149), schema drift
on write (KuduWriteOptions.scala:37-46), checksum scans
(tablet_service.cc:2561), and the CLI."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from kudu_spark.engine import Engine
from kudu_spark.plans.bloom import BloomFilter

SCHEMA = [("k", "bigint", False), ("v", "int", True), ("s", "string", True)]


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, str(tmp_path / "wh"))


def rows(spark, keys, v=0):
    return spark.createDataFrame(
        [(k, k * 10 + v, f"s{k}") for k in keys], "k bigint, v int, s string"
    )


def test_bloom_filter_membership(spark):
    build = spark.createDataFrame([(i * 3,) for i in range(100)], "x bigint")
    bf = BloomFilter.from_df(build, "x", fpp=0.01)
    probe = spark.range(300).select(F.col("id").alias("x"))
    hits = probe.where(bf.might_contain("x")).collect()
    got = {r.x for r in hits}
    want = {i * 3 for i in range(100)}
    assert want <= got  # no false negatives, ever
    assert len(got - want) <= 15  # ~1% fpp with slack
    # round-trips through JSON (scan tokens / cross-process)
    bf2 = BloomFilter.from_json(json.loads(json.dumps(bf.to_json())))
    assert {r.x for r in probe.where(bf2.might_contain("x")).collect()} == got


def test_scan_with_bloom_predicate(engine, spark):
    t = engine.create_table("bl", SCHEMA, pk=["k"])
    t.insert(rows(spark, range(1000)))
    build = spark.createDataFrame([(7,), (400,), (999,)], "k bigint")
    bf = BloomFilter.from_df(build, "k")
    got = {r.k for r in t.scan(filters=[("k", "in_bloom", bf)]).collect()}
    assert {7, 400, 999} <= got
    assert len(got) <= 20
    # combined with ordinary predicates
    got2 = {r.k for r in t.scan(filters=[("k", "in_bloom", bf), ("k", "<", 500)]).collect()}
    assert {7, 400} <= got2 and 999 not in got2


def test_prefix_predicate(engine, spark):
    t = engine.create_table("pf", SCHEMA, pk=["k"])
    t.insert(rows(spark, range(30)))
    got = {r.s for r in t.scan(filters=[("s", "prefix", "s1")]).collect()}
    assert got == {f"s{k}" for k in range(30) if str(k).startswith("1")}


def test_schema_drift_on_write(engine, spark):
    t = engine.create_table("dr", SCHEMA, pk=["k"])
    t.insert(rows(spark, range(10)))
    drifted = rows(spark, range(10, 20)).withColumn("extra", F.col("k") * 2)
    with pytest.raises(Exception):
        t.insert(drifted)  # without the option: unknown column error
    t.insert(drifted, handle_schema_drift=True)
    assert "extra" in t.schema.names
    got = {r.k: r.extra for r in t.scan().collect()}
    assert got[15] == 30 and got[3] is None  # old rows read NULL
    # upsert drift too
    t.upsert(rows(spark, [1], v=9).withColumn("extra2", F.lit(1)),
             handle_schema_drift=True)
    assert "extra2" in t.schema.names


def test_checksum_scan(engine, spark):
    t = engine.create_table("ck", SCHEMA, pk=["k"])
    t.insert(rows(spark, range(100)))
    c1 = t.checksum()
    assert c1["rows"] == 100
    # invariant under physical rewrite (compaction)
    t.upsert(rows(spark, [5], v=1))
    c2 = t.checksum()
    assert c2 != c1
    t.compact()
    assert t.checksum() == c2
    # two tables with identical logical content agree
    t2 = engine.create_table("ck2", SCHEMA, pk=["k"])
    t2.insert(t.scan())
    assert t2.checksum() == t.checksum()


def test_cli_roundtrip(engine, spark, tmp_path, capsys):
    from kudu_spark import cli

    t = engine.create_table("c1", SCHEMA, pk=["k"])
    t.insert(rows(spark, range(20)))
    wh = engine.root
    assert cli.main(["--warehouse", wh, "list"]) == 0
    assert "c1" in capsys.readouterr().out
    assert cli.main([
        "--warehouse", wh, "scan", "c1",
        "--predicates", '["AND", [">=", "k", 5], ["<", "k", 8]]',
        "--columns", "k,v",
    ]) == 0
    out = [json.loads(line) for line in capsys.readouterr().out.strip().splitlines()]
    assert sorted(r["k"] for r in out) == [5, 6, 7]
    assert cli.main(["--warehouse", wh, "checksum", "c1"]) == 0
    assert "checksum" in capsys.readouterr().out
    assert cli.main(["--warehouse", wh, "copy", "c1", "c2"]) == 0
    capsys.readouterr()
    assert cli.main(["--warehouse", wh, "statistics", "c2"]) == 0
    assert json.loads(capsys.readouterr().out)["live_row_count"] == 20
    # backup / restore / describe / locate-row round-trip
    bdir = str(tmp_path / "clibackup")
    assert cli.main(["--warehouse", wh, "backup", "c1", "--dir", bdir]) == 0
    assert json.loads(capsys.readouterr().out)["type"] == "full"
    assert cli.main(["--warehouse", wh, "restore", "c1", "--dir", bdir,
                     "--as", "c1r"]) == 0
    assert "20 rows" in capsys.readouterr().out
    engine.set_owner("c1r", "carol")
    assert cli.main(["--warehouse", wh, "describe", "c1r"]) == 0
    desc = json.loads(capsys.readouterr().out)
    assert desc["schema"]["pk"] == ["k"]
    # `kudu table describe` parity: OWNER + REPLICAS lines
    assert desc["owner"] == "carol" and desc["replicas"] == 1
    assert cli.main(["--warehouse", wh, "locate-row", "c1", "--pk", '{"k": 5}']) == 0
    assert "hash" in capsys.readouterr().out
    # log-dump (≈ `kudu wal dump`): one JSON line per commit
    assert cli.main(["--warehouse", wh, "log-dump", "c1", "--ops-only"]) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert [d["version"] for d in lines] == list(range(1, len(lines) + 1))
    assert lines[0]["op"] == "create" and lines[1]["op"] == "insert"
    assert lines[1]["rows_added"] == 20
    assert cli.main(["--warehouse", wh, "log-dump", "c1",
                     "--min-version", "1", "--max-version", "2"]) == 0
    full = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert len(full) == 1 and full[0]["version"] == 2 and "actions" in full[0]


def test_cli_maintenance_drains_deferred_backlog(engine, spark, capsys):
    """`cli maintenance` sweeps every table's auto-compaction policy
    until nothing compacts — the MaintenanceManager operating loop for
    auto_compact_mode='deferred' deployments."""
    from kudu_spark import cli

    t = engine.create_table("m1", SCHEMA, pk=["k"])
    engine.alter_table("m1").set_property("auto_compact_mode", "deferred") \
        .set_property("auto_compact_min_delta_bytes", "1").apply()
    t.insert(rows(spark, range(500)))
    t.upsert(rows(spark, range(0, 500, 2), v=5))
    deltas_before = sum(1 for f in t.state().files if f.kind == "delta")
    assert deltas_before > 0
    assert cli.main(["--warehouse", engine.root, "maintenance"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["sweeps"] >= 1
    t2 = Engine(t.spark, engine.root).table("m1")
    assert sum(1 for f in t2.state().files if f.kind == "delta") == 0
    assert {r.k: r.v for r in t2.scan().collect()}[2] == 25
