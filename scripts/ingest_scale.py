#!/usr/bin/env python
"""Ingest scale check: per-batch ingest cost must stay FLAT as the
accepted corpus grows 10x (the O(batch) contract of
streaming/ingest.py; VERDICT r6 "What's wrong" #1).

Seeds the corpus + band-key state DIRECTLY (raw manifest writes — the
measurement needs state SIZE, not the ingest path's history; presence
sidecars still attach because they ride _write_files), then times an
IDENTICAL probe batch (novel + near-dup + replay mix) at each corpus
size. Also times the round-6 formulation — a semi join against a full
band-table scan — as the what-it-used-to-cost contrast: that number
grows with the corpus, the ingest batch must not.

    python scripts/ingest_scale.py --sizes 250000 2500000 --batch 20000

Prints one JSON line:
  {"sizes": [...], "batch_secs": [...],        # min over --batches
   "batch_secs_all": [[...]],                  # every timed batch
   "maintenance_secs": [...],                  # sync drain, untimed
   "legacy_probe_secs": [...], "bands_sidecars": [...],
   "accepted": [...]}

Maintenance (small-file packing, sidecar merge) is drained
SYNCHRONOUSLY between timed batches and reported separately: the
production tables run it async in a daemon thread, which would
otherwise bleed an unbounded rewrite into whichever batch happened to
trigger it — per-batch cost and budget-bounded background cost are
different contracts.

``--daemon`` switches to the MaintenanceManager operating model
(VERDICT r9 stretch #8): tables are set ``auto_compact_mode=deferred``
(writes NEVER fold inline) and ``Engine.start_maintenance`` sweeps in
a background daemon thread while the batches are being timed. The
healthy result is per-batch times WITHOUT merge-induced spikes —
compare ``batch_secs_all`` spread against the default mode — plus the
daemon's sweep counters in ``daemon_stats``.
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

WORDS = 16


def synth_docs(spark, start: int, n: int, mutate: bool = False):
    """n deterministic unique documents with ids [start, start+n).
    ``mutate`` swaps the last word — a near-duplicate of the same id's
    pristine text (shares most shingles, differs exactly)."""
    from pyspark.sql import functions as F

    words = [
        F.md5(F.concat(F.col("id").cast("string"), F.lit(f"w{i}")))
        for i in range(WORDS)
    ]
    if mutate:
        words[-1] = F.lit("zzmutatedzz")
    return spark.range(start, start + n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *words).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("synth").alias("source"),
    )


def raw_insert(t, df) -> None:
    """Append a batch bypassing the write-path presence checks (the
    seed data is unique by construction); sidecars/stats still attach
    via _write_files."""
    from kudu_spark.table import seq_for

    st = t.state()
    batch = t._validate_batch(st, df)
    entries = t._write_files(batch, st, seq_for(st.version + 1), "base")
    t._commit(st, "insert", entries)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[250_000, 2_500_000])
    ap.add_argument("--batch", type=int, default=20_000)
    ap.add_argument("--batches", type=int, default=3,
                    help="timed batches per size; min is the steady-state "
                         "cost (the first batch pays one-time shard loads)")
    ap.add_argument("--seed-chunk", type=int, default=500_000)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--daemon", action="store_true",
                    help="MaintenanceManager mode: deferred tables + the "
                         "Engine.start_maintenance daemon sweeping in the "
                         "background while batches are timed")
    ap.add_argument("--daemon-interval", type=float, default=1.0)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from kudu_spark.engine import Engine
    from kudu_spark.operators.dedup import minhash_band_keys
    from kudu_spark.session import get_spark
    from kudu_spark.streaming.ingest import create_corpus_tables, ingest_batch

    spark = get_spark(cpus=args.cpus, app_name="ingest-scale")
    root = tempfile.mkdtemp(prefix="ingest-scale-")
    eng = Engine(spark, root)
    docs_t, bands_t = create_corpus_tables(eng, buckets=8)
    if args.daemon:
        for n in (docs_t.name, bands_t.name):
            eng.alter_table(n).set_property(
                "auto_compact_mode", "deferred").apply()
        docs_t, bands_t = eng.table(docs_t.name), eng.table(bands_t.name)
        eng.start_maintenance(interval_s=args.daemon_interval)

    out = {"sizes": [], "batch_secs": [], "batch_secs_all": [],
           "maintenance_secs": [], "legacy_probe_secs": [],
           "bands_sidecars": [], "presence_coverage": [], "accepted": [],
           "daemon": bool(args.daemon)}
    seeded = 0
    probe_base = 1 << 40  # novel ids far above any seed id
    try:
        for size in sorted(args.sizes):
            while seeded < size:
                n = min(args.seed_chunk, size - seeded)
                chunk = synth_docs(spark, seeded, n).persist()
                raw_insert(docs_t, chunk)
                raw_insert(bands_t, minhash_band_keys(chunk.select("doc_id", "text")))
                chunk.unpersist()
                seeded += n
                docs_t = eng.table(docs_t.name)
                bands_t = eng.table(bands_t.name)
                print(f"seeded {seeded}/{size}", file=sys.stderr)

            def drain_maintenance():
                """SYNCHRONOUS small-file packing + sidecar merge (the
                tables are configured async for production latency, so
                _maybe_auto_compact would return immediately and the
                rewrite would bleed into the timed batches). In
                --daemon mode this is a NO-OP: the background sweeper
                owns maintenance and the timed batches run alongside
                it — that overlap is exactly what's being measured."""
                if args.daemon:
                    return 0.0
                t0 = time.perf_counter()
                for t_ in (eng.table(docs_t.name), eng.table(bands_t.name)):
                    th = getattr(t_, "_maint_thread", None)
                    if th is not None and th.is_alive():
                        th.join()
                    t_._auto_compact_once()  # includes merge_presence_sidecars
                return time.perf_counter() - t0

            maint_s = drain_maintenance()
            docs_t = eng.table(docs_t.name)
            bands_t = eng.table(bands_t.name)

            # identical probe-batch SHAPE at every size: 90% novel, 5%
            # near-dups of seeded content, 5% replays. Several timed
            # batches; the min is the steady-state cost (batch 1 pays
            # the one-time executor shard loads for this corpus epoch).
            times = []
            r = None
            for _b in range(args.batches):
                k = args.batch // 20
                batch = (
                    synth_docs(spark, probe_base, args.batch - 2 * k)
                    .unionByName(synth_docs(spark, size // 2, k, mutate=True))
                    .unionByName(synth_docs(spark, size // 3, k))
                ).persist()
                batch.count()
                probe_base += args.batch
                t0 = time.perf_counter()
                r = ingest_batch(eng, batch)
                times.append(round(time.perf_counter() - t0, 2))
                batch.unpersist()
                # async maintenance kicked off by the batch must not
                # bleed into the NEXT timed batch
                maint_s += drain_maintenance()
                print(f"size={size} batch#{_b}={times[-1]}s", file=sys.stderr)
            batch_s = min(times)

            # the r6 shape: full band-table scan semi join (O(state))
            new_keys = minhash_band_keys(
                synth_docs(spark, probe_base, args.batch).select("doc_id", "text")
            ).persist()
            new_keys.count()
            t0 = time.perf_counter()
            new_keys.join(
                bands_t.scan(columns=["band", "bkey"]),
                ["band", "bkey"], "left_semi"
            ).select("doc_id").distinct().count()
            legacy_s = time.perf_counter() - t0
            new_keys.unpersist()

            st_b = eng.table(bands_t.name).state()
            # the flat-cost claim is only meaningful if the INDEX path
            # answered the probes — a silent fallback to scan joins
            # would show as slow batches with no visible cause, so
            # record coverage and refuse to call the run healthy
            cov = [
                round(eng.table(n).statistics().get("presence_coverage", 0.0), 4)
                for n in (docs_t.name, bands_t.name)
            ]
            if any(c < 1.0 for c in cov):
                print(f"WARNING size={size}: presence coverage {cov} < 1.0 — "
                      "probes fell back to scan joins; batch_secs is NOT "
                      "measuring the index path", file=sys.stderr)
            out["sizes"].append(size)
            out["batch_secs"].append(round(batch_s, 2))
            out["batch_secs_all"].append(times)
            out["maintenance_secs"].append(round(maint_s, 2))
            out["legacy_probe_secs"].append(round(legacy_s, 2))
            out["bands_sidecars"].append(len({f.bloom for f in st_b.files}))
            out["presence_coverage"].append(cov)
            out["accepted"].append(r["accepted"])
            print(f"size={size} batch={batch_s:.2f}s legacy={legacy_s:.2f}s",
                  file=sys.stderr)
        if args.daemon:
            out["daemon_stats"] = eng.stop_maintenance(drain=True)
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
