#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": sf}.

Each query runs twice (JVM/codegen warm-up) and reports the faster run
— matching BASELINE.md's warm-cache methodology (kudu.tex:889).
Results are fully materialized via the noop sink so the measured time
covers the whole plan, not just the driver-side fetch of a few rows.
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
    "dedup_minhash_lsh",
    "ann_bruteforce_topk",
    "engine_upsert_scan",
    "engine_partitioned_scan",
    "pipeline_clean_corpus",
]


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

    times: dict[str, float] = {}
    for name in names:
        fn = queries[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
