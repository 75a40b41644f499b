"""Plan-shape assertions (≈ the connector's pushdown tests,
java/kudu-spark SparkSQLTest/DefaultSourceTest): predicates must reach
the parquet scan, projections must prune columns, the planner must
prune files, and dimension joins must broadcast. These guard the
properties that make the engine viable at 100 TB — a regression here
is a silent 100x slowdown, not a wrong answer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kudu_spark.engine import Engine

SCHEMA = [("k", "bigint", False), ("v", "int", True), ("s", "string", True)]


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, str(tmp_path / "wh"))


@pytest.fixture()
def table(engine, spark):
    t = engine.create_table(
        "pd", SCHEMA, pk=["k"],
        hash_partitions=[{"columns": ["k"], "buckets": 4}],
        range_partition={"column": "k", "splits": [500]},
    )
    t.insert(spark.createDataFrame(
        [(k, k * 10, f"s{k}") for k in range(1000)], "k bigint, v int, s string"
    ))
    return t


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_predicates_reach_parquet(table):
    df = table.scan(filters=[("v", ">=", 100), ("v", "<", 200)])
    plan = plan_of(df)
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(v,100)" in plan and "LessThan(v,200)" in plan


def test_projection_prunes_read_schema(table):
    df = table.scan(columns=["k"], filters=[("k", ">", 10)])
    plan = plan_of(df)
    assert "ReadSchema" in plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "v:" not in read_schema and "s:" not in read_schema


def test_planner_prunes_files(table):
    st = table.state()
    all_files = table._prune(st, None)
    # hash-bucket equality prune: 8 partitions (4 buckets x 2 ranges) -> <= 2 files
    pruned = table._prune(st, [("k", "=", 123)])
    assert len(pruned) < len(all_files)
    buckets = {tuple(f.partition["hash"]) for f in pruned}
    assert len(buckets) == 1
    # range prune
    pruned_r = table._prune(st, [("k", "<", 400)])
    assert {f.partition["range"] for f in pruned_r} == {0}
    # PK min/max prune composes
    assert len(table._prune(st, [("k", "=", 123), ("k", ">=", 100)])) <= len(pruned)


def test_vectorized_reader_and_codegen(table):
    plan = plan_of(table.scan(filters=[("v", ">", 0)]))
    assert "Batched: true" in plan  # columnar/vectorized parquet reader
    # simple-mode explain marks codegen stages with '*(n)'
    simple = table.scan(filters=[("v", ">", 0)])._jdf.queryExecution().simpleString()
    assert "*(" in simple or "WholeStageCodegen" in simple


def test_dimension_join_broadcasts(spark, sf_dir):
    from kudu_spark.queries import get_queries

    q = get_queries()["tpch_q14_promo_revenue"]
    plan = plan_of(q(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_merge_on_read_skips_clean_partitions(table, spark):
    """Partitions without deltas must scan base files directly (no
    window/dedup cost) — the Kudu delta-relevancy property."""
    table.upsert(spark.createDataFrame([(1, 11, "x")], "k bigint, v int, s string"))
    st = table.state()
    kinds = {}
    for f in st.files:
        key = (tuple(f.partition["hash"]), f.partition.get("range"))
        kinds.setdefault(key, set()).add(f.kind)
    dirty = [k for k, v in kinds.items() if "delta" in v]
    assert len(dirty) == 1  # only the mutated bucket pays the merge
    got = {r.k: r.v for r in table.scan().collect()}
    assert got[1] == 11 and len(got) == 1000


def test_prune_on_every_pk_column(engine, spark):
    """Per-column PK footer stats: predicates on a NON-leading PK
    column skip files whose bounds exclude them (stronger than Kudu's
    leading-prefix key bounds)."""
    t = engine.create_table(
        "pk2", [("a", "bigint", False), ("b", "bigint", False), ("v", "int", True)],
        pk=["a", "b"],
    )
    # two commits with disjoint b-ranges
    t.insert(spark.createDataFrame([(i, i % 50, i) for i in range(500)],
                                   "a bigint, b bigint, v int"))
    t.insert(spark.createDataFrame([(i, 1000 + i % 50, i) for i in range(500, 1000)],
                                   "a bigint, b bigint, v int"))
    st = t.state()
    pruned = t._prune(st, [("b", "=", 1010)])
    assert 0 < len(pruned) < len(st.files)
    got = t.scan(filters=[("b", "=", 1010)]).count()
    assert got == spark.createDataFrame([(i, 1000 + i % 50) for i in range(500, 1000)],
                                        "a bigint, b bigint").where("b = 1010").count()
