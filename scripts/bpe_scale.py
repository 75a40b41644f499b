#!/usr/bin/env python
"""BPE train/encode scale measurement.

Claims under test (operators/bpe.py):
  1. training cost is ONE corpus tokenize+count pass plus a
     model-sized driver loop — so train time should track corpus
     size linearly and be insensitive to n_merges;
  2. encoding is a codegen replace-fold over DISTINCT words, so
     encode time should track the corpus (explode + join) but the
     fold work itself should track word TYPES, staying flat as the
     corpus grows with a fixed vocabulary;
  3. the merges fold is runtime-looped (F.aggregate), so growing
     n_merges must not blow codegen (constant plan size), only add
     linear per-word replace cost.

Synthetic corpus: Zipfian draws from a fixed word population, so
docs scale while the type table stays bounded — the web-corpus shape.

    python scripts/bpe_scale.py --docs 200000
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
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--words-per-doc", type=int, default=40)
    ap.add_argument("--vocab", type=int, default=20_000)
    ap.add_argument("--merges", type=int, default=64)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "16"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from kudu_spark.operators import bpe as BP

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .config("spark.sql.shuffle.partitions", str(args.cpus))
             .config("spark.driver.memory", "8g")
             .appName("bpe-scale").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    def corpus(n_docs: int):
        # deterministic Zipfian-ish word ids: rank = xxhash % skewed
        return (spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.array_join(F.transform(
                F.sequence(F.lit(1), F.lit(args.words_per_doc)),
                lambda i: F.concat(
                    F.lit("w"),
                    (F.abs(F.xxhash64(F.col("id") * 1000 + i))
                     % (F.abs(F.xxhash64(F.col("id") * 7919 + i))
                        % args.vocab + 1)).cast("string"))),
                " ").alias("text"))
        ).persist()

    out = {"params": vars(args), "points": []}
    for frac in (0.25, 0.5, 1.0):
        n = int(args.docs * frac)
        docs = corpus(n)
        docs.count()
        t0 = time.time()
        art = BP.train_bpe(docs, n_merges=args.merges, max_words=50_000)
        t_train = time.time() - t0
        t0 = time.time()
        ntok = BP.bpe_token_counts(docs, art)
        tot = ntok.agg(F.sum("n_tokens")).collect()[0][0]
        t_enc = time.time() - t0
        out["points"].append({
            "docs": n, "word_types": art["n_word_types"],
            "dropped_mass": art["dropped_mass"],
            "train_sec": round(t_train, 2),
            "encode_sec": round(t_enc, 2),
            "total_tokens": int(tot),
        })
        docs.unpersist()
        print(json.dumps(out["points"][-1]))

    # n_merges sensitivity at full size: codegen must stay constant,
    # per-word cost linear-ish
    docs = corpus(args.docs)
    docs.count()
    for m in (16, args.merges, args.merges * 4):
        art = BP.train_bpe(docs, n_merges=m, max_words=50_000)
        t0 = time.time()
        from pyspark.sql import functions as FF
        BP.bpe_token_counts(docs, art).agg(
            FF.sum("n_tokens")).collect()
        out.setdefault("merge_sweep", []).append(
            {"n_merges": m, "encode_sec": round(time.time() - t0, 2)})
        print(json.dumps(out["merge_sweep"][-1]))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
