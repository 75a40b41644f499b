#!/usr/bin/env python
"""Substring-dedup worst case at 1M docs (round-6 task #2's "done"
criterion, re-measured after the round-7 hot-shingle rewrite).

Replicates the sf0.1 documents table --mult times (5k docs -> 1M at
x200); half the replicas append a unique suffix token, so ~95% of all
content is duplicated and every shingle group is ~mult/2-mult
occurrences wide — the straggler shape the round-7 rewrite (window ->
map-side-combined aggregate) exists for. Reports wall time, removal
rate, and asserts the PLAN property: no Window partitioned by the
shingle hash (the only windows left key by doc_id, bounded by document
length).

    python scripts/substring_scale.py --mult 200

Prints one JSON line:
  {"docs": N, "secs": S, "tokens": T, "removed_pct": P,
   "shingle_window_free": true}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=200)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                       "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from kudu_spark.operators.dedup import substring_dedup
    from kudu_spark.session import get_spark

    spark = get_spark(app_name="substring-scale", cpus=args.cpus)
    base = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet")) \
        .select("doc_id", "text")
    mult = spark.range(args.mult).select(F.col("id").alias("__m"))
    docs = (
        base.crossJoin(mult)
        .select(
            (F.col("doc_id") * args.mult + F.col("__m")).alias("doc_id"),
            F.when(F.col("__m") % 2 == 1,
                   F.concat(F.col("text"), F.lit(" uniq"),
                            (F.col("doc_id") * args.mult + F.col("__m"))
                            .cast("string")))
            .otherwise(F.col("text")).alias("text"),
        )
    )
    n_docs = docs.count()
    out = substring_dedup(docs)
    t0 = time.perf_counter()
    agg = out.agg(
        F.sum("n_tokens").alias("t"),
        F.sum("removed_tokens").alias("r"),
    ).collect()[0]
    secs = time.perf_counter() - t0
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the r7 rewrite's contract: no Window keyed by the shingle hash
    # (a hot shingle must never serialize through one task); the only
    # windows left partition by doc_id
    window_free = not any(
        "__h" in line for line in plan.splitlines() if "Window" in line
    )
    print(json.dumps({
        "docs": n_docs,
        "secs": round(secs, 1),
        "tokens": int(agg["t"]),
        "removed_pct": round(100.0 * agg["r"] / agg["t"], 1),
        "shingle_window_free": window_free,
    }))


if __name__ == "__main__":
    main()
