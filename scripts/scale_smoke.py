#!/usr/bin/env python
"""Scale smoke: the engine-vs-parquet contract at a multiple of the
largest provided dataset (sf0.1), to show the read/write plans hold as
data grows — the measurable stand-in for the sf1 target while the
driver only ships sf≤0.1.

Replicates lineitem --mult times with disjoint synthetic rowids
(~600k rows per unit), loads it into an engine table, and reports
absolute times + engine/parquet ratios for the bench's q1/q6 shapes at
each lifecycle stage (clean / 10% upserted / compacted), plus the load
and compaction times. Prints one JSON line.

    python scripts/scale_smoke.py --mult 8 --cpus 32
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_once(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=8)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                       "/root/testdata/sf0.1"))
    ap.add_argument("--cluster-by", default=None,
                    help="set the cluster_by table property before load "
                         "(e.g. l_shipdate) to measure the clustered layout")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from kudu_spark.engine import Engine
    from kudu_spark.queries import load
    from kudu_spark.session import get_spark

    spark = get_spark(app_name="pyskudu-scale", cpus=args.cpus)
    base = load(spark, args.sf_dir, "lineitem")
    unit = base.count()
    mult_df = spark.range(args.mult).select(F.col("id").alias("__m"))
    li = (
        base.crossJoin(mult_df)
        .withColumn("l_rowid", F.monotonically_increasing_id() * args.mult + F.col("__m"))
        .drop("__m")
    )
    src = tempfile.mkdtemp(prefix="pyskudu-scale-src-")
    li.write.mode("overwrite").parquet(src)
    li = spark.read.parquet(src)
    rows = li.count()

    wh = tempfile.mkdtemp(prefix="pyskudu-scale-wh-")
    eng = Engine(spark, wh)
    cols = [(f.name, f.dataType.simpleString(), True) for f in base.schema.fields]
    t = eng.create_table(
        "lineitem", [("l_rowid", "bigint", False)] + cols, pk=["l_rowid"],
        hash_partitions=[{"columns": ["l_rowid"], "buckets": max(8, args.mult)}],
    )
    # disable inline maintenance so the "mutated" stage measures the
    # pure merge-on-read plan; the "auto" stage re-enables it.
    # delta_bloom=true builds the sidecar at upsert time (its cost is
    # inside upsert_10pct_sec) so the mutated_bloom stage measures the
    # real bloom plan, not a silent fallback
    eng.alter_table("lineitem").set_property("auto_compact", "false") \
        .set_property("delta_bloom", "true").apply()
    if args.cluster_by:
        eng.alter_table("lineitem").set_property("cluster_by", args.cluster_by).apply()
    t0 = time.perf_counter()
    t.insert(li)
    load_sec = round(time.perf_counter() - t0, 2)

    def q1(df):
        disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        return (
            df.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum(disc), 2).alias("sum_disc_price"),
                 F.count(F.lit(1)).alias("n"))
        )

    def q6(df):
        return df.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("rev"))

    def stage() -> dict:
        out = {}
        for name, q in (("q1", q1), ("q6", q6)):
            pq_t = min(bench_once(q(li)) for _ in range(3))
            en_t = min(bench_once(q(t.scan())) for _ in range(3))
            out[name] = {"parquet_sec": round(pq_t, 3), "engine_sec": round(en_t, 3),
                         "ratio": round(en_t / pq_t, 3)}
        return out

    clean = stage()
    tenth = t.scan().where(F.col("l_rowid") % 10 == 0).withColumn(
        "l_quantity", F.col("l_quantity") + 1
    )
    t0 = time.perf_counter()
    t.upsert(tenth)
    upsert_sec = round(time.perf_counter() - t0, 2)
    mutated = stage()
    # same dirty state through the commit-time bloom sidecar plan
    # (plans/delta_bloom.py): base filtered by the native
    # might_contain probe, never shuffled, no per-query broadcast
    # builds — the regime-independent alternative measured side by side
    eng.alter_table("lineitem").set_property("delta_scan_plan", "bloom").apply()
    mutated_bloom = stage()
    eng.alter_table("lineitem").set_property("delta_scan_plan", "auto").apply()
    t0 = time.perf_counter()
    t.compact()
    compact_sec = round(time.perf_counter() - t0, 2)
    compacted = stage()
    # default path: inline maintenance folds the deltas at write time
    # (upsert cost includes the bounded compaction; scans stay clean)
    eng.alter_table("lineitem").set_property("auto_compact", "true").apply()
    next_tenth = t.scan().where(F.col("l_rowid") % 10 == 1).withColumn(
        "l_quantity", F.col("l_quantity") + 1
    )
    t0 = time.perf_counter()
    t.upsert(next_tenth)
    auto_upsert_sec = round(time.perf_counter() - t0, 2)
    auto = stage()
    # when the whole table is dirty (uniform-random mutations), one
    # bounded inline fold cannot drain the backlog — the deployment
    # model is Kudu's MaintenanceManager: sweeps (each budget-bounded)
    # run until the ratio policy is satisfied, then scans are clean
    t0 = time.perf_counter()
    sweeps = 0
    while sweeps < 64 and eng.run_maintenance().get("lineitem"):
        sweeps += 1
    maintenance_drain_sec = round(time.perf_counter() - t0, 2)
    drained = stage()

    # correctness spot-checks at scale
    assert t.count() == rows, (t.count(), rows)
    rid = li.agg(F.max("l_rowid")).collect()[0][0]
    assert len(t.scan(filters=[("l_rowid", "=", rid)]).collect()) == 1

    # deleted lifecycle state (bench's honest worst case, VERDICT r10
    # next #8): delete ~2% of keys on the drained (clean-base) table —
    # the tombstone bytes sit under the maintenance floor, so the scan
    # pays the pure-delete merge-on-read plan: a broadcast anti join
    # over the base with predicates still pushed (delete-aware dirty
    # planning, table.py merge_delta_files), never the row_number
    # window. The parquet side keeps all its rows, so the ratio charges
    # the engine for rows it no longer returns; the point of measuring
    # it at --mult is that the join's fixed costs amortize — the ratio
    # must CONVERGE toward ~1 as data grows, proving the plan scales.
    t = eng.table("lineitem")
    ndel = t.scan().where(F.col("l_rowid") % 50 == 3).count()
    t0 = time.perf_counter()
    t.delete(t.scan(columns=["l_rowid"]).where(F.col("l_rowid") % 50 == 3))
    delete_sec = round(time.perf_counter() - t0, 2)
    t = eng.table("lineitem")
    deleted = stage()
    assert t.count() == rows - ndel, (t.count(), rows, ndel)
    plan = q6(t.scan())._jdf.queryExecution().executedPlan().toString()
    assert "row_number" not in plan, "deleted state fell back to the window"

    print(json.dumps({
        "metric": "scale_smoke",
        "mult": args.mult,
        "cluster_by": args.cluster_by,
        "rows": rows,
        "unit_rows": unit,
        "load_sec": load_sec,
        "upsert_10pct_sec": upsert_sec,
        "compact_sec": compact_sec,
        "upsert_10pct_with_auto_compact_sec": auto_upsert_sec,
        "maintenance_sweeps": sweeps,
        "maintenance_drain_sec": maintenance_drain_sec,
        "clean": clean,
        "mutated": mutated,
        "mutated_bloom": mutated_bloom,
        "compacted": compacted,
        "auto_compacted": auto,
        "maintenance_drained": drained,
        "delete_2pct_sec": delete_sec,
        "deleted_rows": ndel,
        "deleted": deleted,
    }))
    shutil.rmtree(wh, ignore_errors=True)
    shutil.rmtree(src, ignore_errors=True)


if __name__ == "__main__":
    main()
