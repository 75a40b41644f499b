"""Delta-key bloom sidecars (plans/delta_bloom.py ≈ cfile/bloomfile.cc):
commit-time build, bloom-split scan plan, GC, and the write-proportional
maintenance budget that keeps backlogs from needing sweep marathons."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kudu_spark.engine import Engine


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, str(tmp_path / "warehouse"))


SCHEMA = [("k", "bigint", False), ("v", "double", True), ("s", "string", True)]


def _table(engine, spark, n=50_000, buckets=8, **props):
    t = engine.create_table(
        "bl", SCHEMA, pk=["k"], hash_partitions=[{"columns": ["k"], "buckets": buckets}]
    )
    alt = engine.alter_table("bl")
    for k, v in {"auto_compact": "false", "delta_bloom_min_rows": "1000", **props}.items():
        alt.set_property(k, str(v))
    alt.apply()
    t = engine.table("bl")
    t.insert(spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 1.5).alias("v"),
        F.concat(F.lit("s"), F.col("id")).alias("s"),
    ))
    return t


def test_sidecar_attached_and_gcd(engine, spark):
    t = _table(engine, spark, delta_bloom="true")
    t.upsert(spark.range(0, 50_000, 10).select(
        F.col("id").alias("k"), F.lit(-1.0).alias("v"), F.lit("u").alias("s")))
    st = t.state()
    blooms = {f.bloom for f in st.files if f.kind == "delta"}
    assert len(blooms) == 1 and None not in blooms
    (rel,) = blooms
    assert os.path.getsize(os.path.join(t.root, rel)) > 0
    # every delta file of the commit shares the commit's sidecar
    assert all(f.bloom == rel for f in st.files if f.kind == "delta")
    # base files never carry one
    assert all(f.bloom is None for f in st.files if f.kind == "base")
    # compaction folds deltas -> sidecar unreferenced -> vacuum GCs it
    t.compact()
    assert not {f.bloom for f in t.state().files if f.bloom}
    t.vacuum(force=True)
    assert not os.path.exists(os.path.join(t.root, rel))


def test_small_deltas_skip_sidecar(engine, spark):
    t = _table(engine, spark, delta_bloom="true", delta_bloom_min_rows=100_000)


def test_auto_tables_skip_sidecar(engine, spark):
    """delta_bloom defaults to auto: tables on the broadcast/shuffle
    scan plans never pay the per-commit sidecar build job."""
    t = _table(engine, spark, n=5_000)
    t.upsert(spark.range(0, 5_000).select(
        F.col("id").alias("k"), F.lit(0.0).alias("v"), F.lit("u").alias("s")))
    assert all(f.bloom is None for f in t.state().files if f.kind == "delta")
    t.upsert(spark.range(0, 1000).select(
        F.col("id").alias("k"), F.lit(0.0).alias("v"), F.lit("u").alias("s")))
    assert all(f.bloom is None for f in t.state().files if f.kind == "delta")


def test_bloom_split_plan_correct(engine, spark):
    """Forced bloom plan: merge-on-read answers match last-write-wins
    semantics exactly across upserts and deletes, the plan carries the
    native might_contain probe, and the base is never sort-merge
    shuffled."""
    n = 50_000
    t = _table(engine, spark, n=n, delta_scan_plan="bloom")
    t.upsert(spark.range(0, n, 10).select(
        F.col("id").alias("k"), F.lit(-1.0).alias("v"), F.lit("u").alias("s")))
    t.delete(spark.range(0, 5000).select(F.col("id").alias("k")))
    df = engine.table("bl").scan()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in plan
    assert "SortMergeJoin" not in plan
    assert df.count() == n - 5000
    assert df.where(F.col("v") < 0).count() == n // 10 - 500
    # point filter through the bloom plan stays exact
    got = {r.k: r.s for r in df.where(F.col("k").isin(4999, 5000, 5001, 5010)).collect()}
    assert got == {5000: "u", 5001: "s5001", 5010: "u"}  # 4999 deleted
    # and equals the broadcast plan's answer row for row
    eng2 = engine
    eng2.alter_table("bl").set_property("delta_scan_plan", "auto").apply()
    auto = eng2.table("bl").scan()
    assert auto.exceptAll(df).count() == 0 and df.exceptAll(auto).count() == 0


def test_bloom_plan_survives_time_travel_and_tokens(engine, spark):
    t = _table(engine, spark, n=20_000, delta_scan_plan="bloom")
    v1 = t.version
    t.upsert(spark.range(0, 20_000, 5).select(
        F.col("id").alias("k"), F.lit(9.0).alias("v"), F.lit("u").alias("s")))
    assert t.scan(version=v1).where(F.col("s") == "u").count() == 0
    toks = t.scan_tokens()
    total = 0
    for tok in toks:
        total += t.token_to_df(tok).count()
    assert total == 20_000


def test_write_proportional_budget_drains_inline(engine, spark):
    """A large delta commit folds its own backlog inline (budget scales
    with the commit's delta bytes) instead of leaving dozens of
    fixed-budget sweeps behind."""
    t = engine.create_table(
        "wp", SCHEMA, pk=["k"], hash_partitions=[{"columns": ["k"], "buckets": 4}]
    )
    # tiny fixed budget that could never cover the table; the
    # write-proportional factor must override it
    engine.alter_table("wp").set_property("auto_compact_budget_bytes", "1") \
        .set_property("auto_compact_min_delta_bytes", "0").apply()
    t = engine.table("wp")
    t.insert(spark.range(30_000).select(
        F.col("id").alias("k"), F.lit(1.0).alias("v"), F.lit("x").alias("s")))
    t.upsert(spark.range(0, 30_000, 2).select(
        F.col("id").alias("k"), F.lit(2.0).alias("v"), F.lit("y").alias("s")))
    st = t.state()
    assert all(f.kind == "base" for f in st.files), "inline fold did not drain"
    assert t.scan().where(F.col("s") == "y").count() == 15_000
