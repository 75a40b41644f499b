#!/usr/bin/env python
"""Per-batch cost of the ingest SEMANTIC-dedup arm as the corpus grows.

The exact/LSH arms are O(batch) (presence-index probes; measured in
ingest_scale.py). The semantic arm is NOT: its candidate fetch reads
the probed cells of the corpus, so per-batch cost scales with
corpus_bytes x probed_cells / n_cells — cellr file pruning and the
clustered layout bound WHICH bytes, n_cells bounds the FRACTION. The
honest scaling rule is therefore n_cells ~ sqrt(N) (cells stay
executor-sized and the probed fraction shrinks as the corpus grows),
exactly the knob train_vector_cells/auto-retrain control.

This script measures a FIXED batch's semantic-collision cost against
corpora of growing size, at fixed n_cells (shows the linear growth)
and at scaled n_cells (shows the mitigation). Scaled cells are CAPPED
at --max-cells (default 64): kmeans_centroids builds the per-row
argmin as ONE codegen expression over all centroids, so training cost
grows ~linearly in n_cells and becomes impractical past ~100 cells on
this box — a measured ceiling of the expression-based Lloyd update
(the at-scale fix is sampled training + an Arrow-batched assignment
pass, not a bigger expression; documented in SCALE.md):

    python scripts/semantic_scale.py --sizes 100000 400000 --batch 5000

Prints one JSON line:
  {"sizes": [...], "fixed_cells": N,
   "fixed_cells_secs": [...], "scaled_cells": [...],
   "scaled_cells_secs": [...], "batch": B}
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[25_000, 100_000])
    ap.add_argument("--batch", type=int, default=500)
    ap.add_argument("--dims", type=int, default=16)
    ap.add_argument("--fixed-cells", type=int, default=16)
    ap.add_argument("--max-cells", type=int, default=64)
    ap.add_argument("--threshold", type=float, default=0.9)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from kudu_spark.engine import Engine
    from kudu_spark.session import get_spark
    from kudu_spark.streaming.ingest import _semantic_collisions

    spark = get_spark(app_name="semantic-scale", cpus=args.cpus)

    def vec(idexpr):
        # hash the OFFSET id: batch vectors must differ from corpus
        # vectors or every batch doc trivially collides at cosine 1.0
        return F.array(*[
            ((F.xxhash64(idexpr, F.lit(d)) % 1000) / 500.0 - 1.0)
            .cast("float") for d in range(args.dims)])

    def docs(n, offset=0):
        did = F.col("id") + offset
        return spark.range(n).select(
            did.alias("doc_id"),
            F.concat(F.lit("t"), did.cast("string")).alias("text"),
            F.lit("en").alias("lang"), F.lit("s").alias("source"),
            vec(did).alias("embedding"))

    batch = docs(args.batch, offset=10_000_000).persist()
    batch.count()

    out = {"sizes": args.sizes, "batch": args.batch,
           "fixed_cells": args.fixed_cells,
           "fixed_cells_secs": [], "scaled_cells": [],
           "scaled_cells_secs": []}
    for n in args.sizes:
        for mode in ("fixed", "scaled"):
            cells = (args.fixed_cells if mode == "fixed"
                     else min(args.max_cells,
                              max(args.fixed_cells, int(math.sqrt(n)))))
            wh = tempfile.mkdtemp(prefix=f"pyskudu-sem-{mode}-")
            eng = Engine(spark, wh)
            t = eng.create_table(
                "corpus", [("doc_id", "bigint", False),
                           ("text", "string", True),
                           ("lang", "string", True),
                           ("source", "string", True),
                           ("embedding", "array<float>", True)],
                pk=["doc_id"])
            t.insert(docs(n))
            t = eng.table("corpus")
            t.train_vector_cells("embedding", n_cells=cells, n_iters=2)
            eng.alter_table("corpus").set_property(
                "cluster_by", "__ivfc_embedding").apply()
            t = eng.table("corpus")
            t.compact(full=True)
            t = eng.table("corpus")
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                _semantic_collisions(
                    t, batch, "embedding", args.threshold).count()
                best = min(best, time.perf_counter() - t0)
            if mode == "fixed":
                out["fixed_cells_secs"].append(round(best, 3))
            else:
                out["scaled_cells"].append(cells)
                out["scaled_cells_secs"].append(round(best, 3))
            import shutil

            shutil.rmtree(wh, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
