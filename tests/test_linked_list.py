"""Linked-list stress workload (integration-tests/linked_list-test.cc):
inserts chase updates — every round inserts new nodes AND rewires
earlier nodes' next-pointers — then chain integrity is verified
through a fresh Engine (a 'restart': state rebuilt purely from the
commit log). Catches lost rows, lost updates, and merge-on-read
ordering bugs across many small commits + compaction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kudu_spark.engine import Engine

SCHEMA = [
    ("key", "bigint", False),
    ("next_key", "bigint", True),
    ("round", "int", True),
]

CHAINS = 7
ROUNDS = 6
PER_ROUND = 21  # nodes inserted per round (3 per chain)


@pytest.mark.slow  # nightly lane (pytest.ini): exhaustive/stress
def test_linked_list_workload(spark, tmp_path):
    eng = Engine(spark, str(tmp_path / "wh"))
    t = eng.create_table(
        "chains", SCHEMA, pk=["key"],
        hash_partitions=[{"columns": ["key"], "buckets": 4}],
    )
    # node k belongs to chain k % CHAINS; each round appends PER_ROUND
    # new heads and points them at the previous head of their chain
    heads: dict[int, int] = {}
    nid = 0
    for rnd in range(ROUNDS):
        batch = []
        rewires = []
        for _ in range(PER_ROUND):
            chain = nid % CHAINS
            prev = heads.get(chain)
            batch.append((nid, None, rnd))
            if prev is not None:
                rewires.append((prev, nid))
            heads[chain] = nid
            nid += 1
        t.insert(spark.createDataFrame(batch, "key bigint, next_key bigint, round int"))
        if rewires:
            # update: point the old head forward to the new node
            t.update(spark.createDataFrame(rewires, "key bigint, next_key bigint"))
        if rnd == ROUNDS // 2:
            t.compact()  # mid-workload compaction must not lose anything

    # 'restart': rebuild from the log only
    eng2 = Engine(spark, str(tmp_path / "wh"))
    t2 = eng2.table("chains")
    df = t2.scan().cache()
    total = ROUNDS * PER_ROUND
    assert df.count() == total  # no lost rows

    rows = {r.key: r.next_key for r in df.collect()}
    # chain walk: a tail is a node nothing points at; following next
    # pointers from every tail must visit each node exactly once and
    # end at the chain's recorded head
    referenced = {v for v in rows.values() if v is not None}
    tails = sorted(set(rows) - referenced)
    assert len(tails) == CHAINS
    visited = set()
    for tail in tails:
        k = tail
        while True:
            assert k not in visited
            visited.add(k)
            if rows[k] is None:
                assert heads[k % CHAINS] == k  # ends at the live head
                break
            k = rows[k]
    assert len(visited) == total  # every node reachable, no orphans

    # pointer-update integrity in SQL: nodes referenced by a next_key
    # exist, and each node is referenced at most once
    refs = df.where(F.col("next_key").isNotNull()).select(F.col("next_key").alias("k"))
    assert refs.join(df, refs.k == df.key, "left_anti").count() == 0
    assert refs.groupBy("k").count().where("count > 1").count() == 0