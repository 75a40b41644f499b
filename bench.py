#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": sf}.

Each query runs three times (JVM/codegen warm-up) and reports the
fastest run — matching BASELINE.md's warm-cache methodology
(kudu.tex:889) AND the bench-adjudication protocol (SCALE.md rounds
6/8: single runs swing up to ~50% with machine phase, so the recorded
artifact carries the best-of-3, with the observed spread attached as
``noise_bracket`` so a reader can tell a real regression from a noisy
machine; VERDICT r8 task #4). Results are fully materialized via the
noop sink so the measured time covers the whole plan, not just the
driver-side fetch of a few rows.
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    "agg_pricing_summary",
    "agg_revenue_filter",
    "scan_count_star",
    "scan_count_nonkey_pred",
    "scan_key_lookup",
    "scan_project_predicate",
    "join_shipping_priority",
    "join_local_supplier_volume",
    "join_returned_item_customers",
    "window_top3_orders_per_customer",
    "tpch_q4_order_priority",
    "tpch_q7_nation_volume",
    "tpch_q12_priority_lines",
    "tpch_q14_promo_revenue",
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_volume",
    "tpch_q19_discounted_revenue",
    "window_tumbling_events",
    "window_funnel_conversion",
    "dedup_minhash_lsh",
    "ann_bruteforce_topk",
    "engine_upsert_scan",
    "engine_partitioned_scan",
    "pipeline_clean_corpus",
]


def _bench_once(df) -> float:
    import time as _t

    t0 = _t.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return _t.perf_counter() - t0


def engine_vs_parquet(spark, sf_dir: str) -> dict:
    """BASELINE.md's operational contract (whitepaper Table
    fig:parquet_vs_kudu: Kudu ≈ Parquet ±31% on TPC-H scans): run the
    same scan/agg shapes against raw parquet and against an engine
    table holding identical rows, and report the time ratio —
    clean (pure base files) and after mutating ~10% of rows
    (merge-on-read cost). Targets: ≤1.3x clean, ≤2x mutated."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from kudu_spark.engine import Engine
    from kudu_spark.queries import load

    wh = tempfile.mkdtemp(prefix="pyskudu-bench-")
    eng = Engine(spark, wh)
    li = load(spark, sf_dir, "lineitem")
    # the synthetic lineitem is not unique on (l_orderkey, l_linenumber),
    # so key the engine copy on a synthetic rowid
    cols = [(f.name, f.dataType.simpleString(), True) for f in li.schema.fields]
    schema = [("l_rowid", "bigint", False)] + cols
    t = eng.create_table(
        "lineitem", schema, pk=["l_rowid"],
        hash_partitions=[{"columns": ["l_rowid"], "buckets": 8}],
    )
    t.insert(li.withColumn("l_rowid", F.monotonically_increasing_id()))

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

    def ratio() -> dict:
        out = {}
        for name, qfn in (("q1", q1), ("q6", q6)):
            pq_t = min(_bench_once(qfn(li)) for _ in range(3))
            en_t = min(_bench_once(qfn(t.scan())) for _ in range(3))
            out[name] = {
                "parquet_sec": round(pq_t, 3),
                "engine_sec": round(en_t, 3),
                "ratio": round(en_t / pq_t, 3),
            }
        return out

    clean = ratio()
    # mutate ~10%: upsert touched rows (new quantities) — every hash
    # bucket goes dirty, so the engine side pays the merge-on-read
    # (predicates cannot push below the last-write-wins merge, so
    # selective scans feel it most — the cost compaction exists to
    # reclaim, reported as the third stage)
    tenth = t.scan().where(F.col("l_rowid") % 10 == 0).withColumn(
        "l_quantity", F.col("l_quantity") + 1
    )
    t.upsert(tenth)
    mutated = ratio()
    # delete ~2% on TOP of the live upsert deltas (r10: delete deltas
    # carry indexed tombstone-key sidecars): the merge window now
    # subtracts deletions too — the worst merge-on-read state a table
    # passes through between maintenance passes. Parquet side is
    # unchanged (its rows don't shrink), so the ratio honestly charges
    # the engine for the deleted rows it no longer returns.
    t = eng.table("lineitem")
    t.delete(t.scan(columns=["l_rowid"]).where(F.col("l_rowid") % 50 == 3))
    deleted = ratio()
    t.compact()
    compacted = ratio()
    shutil.rmtree(wh, ignore_errors=True)
    return {"clean": clean, "mutated": mutated, "deleted": deleted,
            "compacted": compacted}


def headline_ratios(spark, sf_dir: str) -> dict:
    """The engine-table headline shapes as engine-vs-equivalent-parquet
    ratios (VERDICT r12 #4): four consecutive rounds of >=87% noise
    brackets proved absolute wall-clock totals cannot detect a real
    1.5x regression on this sandbox, while a paired ratio measured in
    the SAME process minutes apart cancels the machine phase. Each
    pair serves IDENTICAL output rows — engine scan/serve vs a plain
    parquet scan of the same rows — so the lifecycle cells' <=1.3x
    budget applies. Setup (create/insert/upsert/train) happens ONCE
    per pair and is excluded: the write path is covered by the
    headline absolute timings; this block isolates the read path,
    which is what regresses silently."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from kudu_spark.engine import Engine
    from kudu_spark.queries import load

    wh = tempfile.mkdtemp(prefix="pyskudu-ratio-")
    pq_dir = tempfile.mkdtemp(prefix="pyskudu-ratio-pq-")
    eng = Engine(spark, wh)
    out: dict = {}

    def pair(name, engine_df_fn, parquet_df_fn):
        pq_t = min(_bench_once(parquet_df_fn()) for _ in range(3))
        en_t = min(_bench_once(engine_df_fn()) for _ in range(3))
        out[name] = {
            "parquet_sec": round(pq_t, 3),
            "engine_sec": round(en_t, 3),
            "ratio": round(en_t / pq_t, 3),
        }

    # 1. upsert_scan: merge-on-read after ~10% upserted rows vs a clean
    #    parquet scan of the identical end-state rows (written once)
    c = load(spark, sf_dir, "customer")
    cols = [(f.name, f.dataType.simpleString(), True) for f in c.schema.fields]
    t = eng.create_table(
        "cust", [(n, ty, n != "c_custkey") for n, ty, _ in cols],
        pk=["c_custkey"],
        hash_partitions=[{"columns": ["c_custkey"], "buckets": 4}],
    )
    t.insert(c)
    touched = c.where(F.col("c_custkey") % 10 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + 1000.0)
    t.upsert(touched)
    end_state = c.where(F.col("c_custkey") % 10 != 0).unionByName(touched)
    end_state.write.mode("overwrite").parquet(pq_dir + "/cust")
    pair("upsert_scan",
         lambda: t.scan(),
         lambda: spark.read.parquet(pq_dir + "/cust"))

    # 2. partitioned_scan: bucket+range+footer pruning on a key-range
    #    predicate vs the same filter over raw parquet (row-group stats
    #    are parquet's only pruning) — identical rows out
    hi = c.agg(F.max("c_custkey")).first()[0]
    splits = [int(hi * f) for f in (0.25, 0.5, 0.75)]
    tp = eng.create_table(
        "custpart", [(n, ty, n != "c_custkey") for n, ty, _ in cols],
        pk=["c_custkey"],
        hash_partitions=[{"columns": ["c_custkey"], "buckets": 4}],
        range_partition={"column": "c_custkey", "splits": splits},
    )
    tp.insert(c)
    lo_k, hi_k = int(hi * 0.05), int(hi * 0.20)
    flt = [("c_custkey", ">=", lo_k), ("c_custkey", "<", hi_k)]
    pair("partitioned_scan",
         lambda: tp.scan(columns=["c_custkey", "c_acctbal"], filters=flt),
         lambda: spark.read.parquet(f"{sf_dir}/customer.parquet")
         .where((F.col("c_custkey") >= lo_k) & (F.col("c_custkey") < hi_k))
         .select("c_custkey", "c_acctbal"))

    # 3. ann_serve: stored-cell serving on the engine table
    #    (train_vector_cells + cluster_by + compacted = steady state)
    #    vs the persisted-IVF parquet index built from the same frozen
    #    shape — both serve the rows ivf_kmeans_topk defines
    from kudu_spark.operators.similarity import build_ivf_index, ivf_index_topk

    emb = load(spark, sf_dir, "embeddings")
    te = eng.create_table(
        "emb", [("vec_id", "bigint", False),
                ("embedding", "array<float>", True), ("label", "int", True)],
        pk=["vec_id"])
    te.insert(emb)
    te = eng.table("emb")
    te.train_vector_cells("embedding", n_cells=8, n_iters=3)
    eng.alter_table("emb").set_property("cluster_by", "__ivfc_embedding").apply()
    te = eng.table("emb")
    te.compact(full=True)
    build_ivf_index(emb, pq_dir + "/ivf", n_centroids=8, n_iters=3)
    qids = [10, 20, 30, 40, 50]
    pair("ann_serve",
         lambda: te.ann_topk("embedding", qids, k=5, n_probes=2),
         lambda: ivf_index_topk(spark, pq_dir + "/ivf", qids, k=5, n_probes=2))

    # 4. int8-refine serve diagnostic (NOT a ratio_total cell — its
    #    rows are the int8 shortlist's, identical in practice but not
    #    by construction): quantized candidate pass vs the exact serve
    #    on the SAME engine table — the bytes-for-recall trade at
    #    production refine, recorded every round
    eng.alter_table("emb").set_property(
        "vector_quantize_cols", "embedding").apply()
    te = eng.table("emb")
    te.compact(full=True)
    ex_t = min(_bench_once(
        te.ann_topk("embedding", qids, k=5, n_probes=2)) for _ in range(3))
    q8_t = min(_bench_once(
        te.ann_topk("embedding", qids, k=5, n_probes=2,
                    quantized=True, refine=4)) for _ in range(3))
    out["__ann_q8_vs_exact"] = {
        "exact_sec": round(ex_t, 3),
        "q8_sec": round(q8_t, 3),
        "ratio": round(q8_t / ex_t, 3),
    }

    shutil.rmtree(wh, ignore_errors=True)
    shutil.rmtree(pq_dir, ignore_errors=True)
    return out


def _geomean(ratios: list[float]) -> float:
    import math

    return math.exp(sum(math.log(max(r, 1e-9)) for r in ratios) / len(ratios))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        sf = base

    from kudu_spark.session import get_spark
    from kudu_spark.queries import get_all_queries

    spark = get_spark(app_name="pyskudu-bench", cpus=cpus)
    queries = get_all_queries()
    names = [n for n in HEADLINE if n in queries]
    extra = os.environ.get("PYSKUDU_BENCH_QUERIES")
    if extra:
        names = [n for n in extra.split(",") if n in queries]

    runs = int(os.environ.get("PYSKUDU_BENCH_RUNS", "3"))
    times: dict[str, float] = {}
    worsts: dict[str, float] = {}
    for name in names:
        fn = queries[name]
        best, worst = float("inf"), 0.0
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            best, worst = min(best, el), max(worst, el)
        times[name] = round(best, 3)
        worsts[name] = round(worst, 3)

    total = round(sum(times.values()), 3)
    worst_total = round(sum(worsts.values()), 3)
    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        # the machine-phase bracket: `value` is the per-query best-of-N
        # (the number to diff across rounds); worst_total tells a reader
        # how noisy this recording session actually was
        "noise_bracket": {
            "runs_per_query": runs,
            "worst_total": worst_total,
            "spread_pct": round(100.0 * (worst_total - total) / total, 1)
            if total else 0.0,
        },
    }
    if os.environ.get("PYSKUDU_BENCH_ENGINE_RATIO", "1") != "0":
        # engine-vs-parquet time ratio on identical rows (BASELINE.md
        # operational target: ≤1.3x clean, ≤2x with ~10% rows mutated)
        evp = engine_vs_parquet(spark, sf_dir)
        hr = headline_ratios(spark, sf_dir)
        result["engine_vs_parquet"] = evp
        result["headline_ratios"] = hr
        # the PRIMARY regression signal (VERDICT r12 #4): geomean of
        # every paired engine/parquet ratio. Paired same-process
        # measurement cancels the machine phase that makes the absolute
        # `value` above swing ~60% between sessions with zero code
        # change — diff THIS number across rounds, not `value`.
        ratios = [cell["ratio"] for stage in evp.values()
                  for cell in stage.values()]
        # "__"-prefixed entries are diagnostics (engine-vs-engine or
        # non-identical-rows pairs), excluded from the ratio contract
        ratios += [cell["ratio"] for k, cell in hr.items()
                   if not k.startswith("__")]
        result["ratio_total"] = round(_geomean(ratios), 3)
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
