#!/usr/bin/env python
"""sequenceMatch fold-vs-DP scale measurement.

The r14 gap-operator surface runs one-sided chains in the codegen
fold and both-sided chains in the Arrow-batched level DP
(operators/events.py _sequence_dp). Claims: both are ONE user-keyed
shuffle; the fold is whole-stage-codegen cheap; the DP pays the
Arrow + numpy toll but stays O(n log n x m) per user — usable at the
same event volumes, not an order-of-magnitude cliff.

    python scripts/sequence_scale.py --events 10000000
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
    ap.add_argument("--events", type=int, default=10_000_000)
    ap.add_argument("--users", type=int, default=200_000)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "16"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from kudu_spark.operators import events as EV

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .config("spark.sql.shuffle.partitions", str(args.cpus))
             .config("spark.driver.memory", "8g")
             .appName("sequence-scale").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    ev = (spark.range(args.events).select(
        (F.col("id") % args.users).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1700000000)
            + (F.abs(F.xxhash64("id")) % 86400)).alias("ts"),
        F.element_at(
            F.array(F.lit("A"), F.lit("B"), F.lit("C"), F.lit("X")),
            (F.abs(F.xxhash64(F.col("id") + 7)) % 4 + 1).cast("int")
        ).alias("event_type"))).persist()
    ev.count()

    res = {"events": args.events, "users": args.users}

    def run(name, pat):
        t0 = time.time()
        n = EV.sequence_match(ev, pat).where("matched").count()
        res[name] = {"sec": round(time.time() - t0, 2), "matched": n}
        print(json.dumps({name: res[name]}))

    run("fold_maxgap", ["A", ("B", "2 HOUR"), ("C", "2 HOUR")])
    run("fold_mingap", ["A", ("B", "> 10 MINUTE"), ("C", ">= 5 MINUTE")])
    run("dp_window", ["A", ("B", "> 10 MINUTE", "<= 2 HOUR"),
                      ("C", "<= 2 HOUR")])
    t0 = time.time()
    EV.sequence_count(ev, ["A", ("B", "> 10 MINUTE", "<= 2 HOUR")]) \
        .agg(F.sum("n_matches")).collect()
    res["dp_count"] = {"sec": round(time.time() - t0, 2)}
    print(json.dumps(res))


if __name__ == "__main__":
    main()
