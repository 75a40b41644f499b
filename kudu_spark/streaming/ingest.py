"""Streaming corpus ingestion with incremental dedup — the continuous
-crawl shape of an LLM training-data pipeline on this engine.

A document stream lands in an engine `docs` table only if it survives
(a) optional quality gating, (b) exact dedup within the micro-batch,
and (c) near-dup rejection against EVERYTHING ingested so far. The
"so far" state is not recomputed per batch: a second engine table
holds the MinHash-LSH band keys of every accepted document, and each
batch probes its own (small) key set against that state.

O(batch) per batch, for real: the probes go through the engine's
presence sidecars (Table.present_key_probe — per-commit blooms over
the key tuple, the library's analogue of Kudu answering "is this key
present?" with per-rowset blooms + B-tree seeks, tablet/tablet.cc:
116-124, cfile/bloomfile.cc) instead of joining against a scan of the
state tables:

  1. band keys that fail EVERY sidecar bloom are provably novel —
     the overwhelmingly common case for fresh content — and cost
     ZERO state IO;
  2. the few bloom-positive keys (true collisions + ~1% fp) verify
     exactly against a bounded scan: IN-list file pruning + parquet
     row-group bloom skips on the (band, bkey) PK prefix;
  3. replay absorption probes surviving doc_ids the same way (bloom
     prefilter, then the bounded _snapshot_overlapping scan).

Per-batch cost therefore tracks the BATCH, not the corpus: no state
table is ever shuffled, and in steady state (novel content, no
replays) no state data file is even read. Only if sidecar coverage
lapses (e.g. someone upserts into the state tables) does the probe
fall back to a broadcast-batch join — the state table then streams
but still never shuffles.

Both tables advance in ONE cross-table EngineTransaction per batch
(writer.EngineTransaction ≈ KuduTransaction, client.h:445-545): a
crash can never leave accepted documents without their band keys (a
gap that would let later duplicates slip through) or vice versa —
recovery completes or compensates the marker like any other txn.
After the publish, the batch triggers the tables' small-file
maintenance (auto_compact_small_files) so file and sidecar counts
stay O(1) per partition instead of O(batches).

Replays (at-least-once sources) are absorbed twice over: re-delivered
doc_ids hit the bounded replay probe, and re-delivered content hits
the band-key probe.

Scale: band keys are 8-byte band + 32-byte key per (doc, band) —
~40 B x docs x bands of state, independent of document size; the
per-batch probe work is bands x batch bloom tests (native codegen)
plus a scan of only the row groups the positives could live in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kudu_spark.operators.dedup import minhash_band_keys

BANDS_SCHEMA = [
    ("band", "int", False),
    ("bkey", "string", False),
    ("doc_id", "bigint", False),
]


def create_corpus_tables(engine, docs_name: str = "corpus",
                         bands_name: str | None = None,
                         buckets: int = 8):
    """Create the document table and its band-key side table. The
    docs schema mirrors the testdata documents table; extend with
    ``engine.alter_table`` as needed. Both tables opt into presence
    sidecars (pk_bloom_cols) — the O(batch) probe machinery — and
    small-file auto-compaction, which also consolidates sidecars."""
    docs = engine.create_table(
        docs_name,
        [("doc_id", "bigint", False), ("text", "string", True),
         ("lang", "string", True), ("source", "string", True)],
        pk=["doc_id"],
        hash_partitions=[{"columns": ["doc_id"], "buckets": buckets}],
    )
    bands = engine.create_table(
        bands_name or f"{docs_name}_bands",
        BANDS_SCHEMA,
        pk=["band", "bkey", "doc_id"],
        hash_partitions=[{"columns": ["band", "bkey"], "buckets": buckets}],
    )
    # async maintenance: small-file packing (which also consolidates
    # presence sidecars) runs in a daemon thread, so a micro-batch's
    # latency never absorbs a partition rewrite — Kudu's background
    # MaintenanceManager model (tablet/maintenance_manager.h)
    for name, bloom_cols in ((docs.name, "doc_id"), (bands.name, "band,bkey")):
        engine.alter_table(name) \
            .set_property("pk_bloom_cols", bloom_cols) \
            .set_property("auto_compact_small_files", "true") \
            .set_property("auto_compact_mode", "async").apply()
    return engine.table(docs.name), engine.table(bands.name)


def _present_pairs(t, st, cand: DataFrame, cols: list[str]) -> DataFrame:
    """Key tuples of ``cand`` (already bloom-positive, expected small)
    that EXACTLY exist in table ``t`` — a bounded verification scan:
    per-column IN-lists prune files (manifest footer bounds + hash
    buckets) and push to parquet where the per-column blooms skip row
    groups; past PROBE_KEYS_MAX the scan widens to the min/max range
    but still only streams (broadcast probe side, no state shuffle)."""
    row = cand.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.approx_count_distinct(c).alias(f"nd_{c}") for c in cols],
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    if row["n"] == 0:
        return cand.limit(0)
    filters = []
    for c in cols:
        if row[f"nd_{c}"] <= t.PROBE_KEYS_MAX:
            vals = [r[0] for r in cand.select(c).distinct().collect()]
            if len(vals) <= t.PROBE_KEYS_MAX:
                filters.append((c, "in", vals))
                continue
        filters.append((c, ">=", row[f"lo_{c}"]))
        filters.append((c, "<=", row[f"hi_{c}"]))
    sub = t._snapshot_df(st, filters).select(*cols)
    return sub.join(F.broadcast(cand), on=cols, how="left_semi").distinct()


def ingest_batch(engine, batch_df: DataFrame, docs_name: str = "corpus",
                 bands_name: str | None = None,
                 quality_min: float | None = None) -> dict:
    """One micro-batch of the ingestion pipeline (callable directly
    for batch backfills; ``ingest_corpus_stream`` wires it into
    foreachBatch). Returns {'arrived', 'accepted', 'versions'}."""
    from kudu_spark.functions.text import quality_cols
    from kudu_spark.writer import EngineTransaction

    bands_name = bands_name or f"{docs_name}_bands"
    docs_t = engine.table(docs_name)
    bands_t = engine.table(bands_name)

    batch = batch_df.persist()
    arrived = batch.count()
    cand = batch
    if quality_min is not None:
        cand = (
            cand.select("*", *quality_cols())
            .where(F.col("quality_score") >= quality_min)
            .select(*batch.columns)
        )
    # exact dedup within the batch (first doc_id per content wins,
    # deterministic), then PK dedup
    cand = (
        cand.withColumn("__h", F.md5(F.col("text")))
        .withColumn("__rn", F.row_number().over(
            Window.partitionBy("__h").orderBy("doc_id")))
        .where(F.col("__rn") == 1)
        .drop("__h", "__rn")
        .dropDuplicates(["doc_id"])
    )
    # near-dup rejection against the corpus-so-far band keys. Band
    # keys are computed ONCE and reused for the insert.
    new_keys = minhash_band_keys(cand.select("doc_id", "text")).persist()
    st_b = bands_t.state()
    pairs = new_keys.select("band", "bkey").distinct()
    maybe = bands_t.present_key_probe(pairs, ["band", "bkey"], st_b)
    if maybe is not None:
        # sidecar path: novel keys (bloom-negative) cost zero state
        # IO; the positives verify against a bounded pruned scan
        hit_pairs = _present_pairs(bands_t, st_b, maybe, ["band", "bkey"])
        collided = (
            new_keys.join(F.broadcast(hit_pairs), ["band", "bkey"], "left_semi")
            .select("doc_id").distinct()
        )
    else:
        # coverage lapsed (e.g. deltas in the state table): broadcast
        # the BATCH side so the state table streams without a shuffle
        collided = (
            bands_t.scan(columns=["band", "bkey"])
            .join(F.broadcast(new_keys), ["band", "bkey"], "inner")
            .select("doc_id").distinct()
        )
    survivors = cand.join(collided, "doc_id", "left_anti")
    # replay absorption: doc_ids already in the corpus (same content
    # re-delivered) are dropped, not errors — bloom prefilter, then
    # the engine's bounded key probe (never a full doc_id scan)
    st_d = docs_t.state()
    ids = survivors.select("doc_id")
    maybe_ids = docs_t.present_key_probe(ids, ["doc_id"], st_d)
    if maybe_ids is not None:
        # bloom-positive ids are few: broadcast the exact present set
        existing = F.broadcast(_present_pairs(docs_t, st_d, maybe_ids, ["doc_id"]))
    elif st_d.files:
        # fallback: the bounded key probe (file-pruned by the batch's
        # id IN-list/range) — may be large if pruning degenerates, so
        # no broadcast hint; the planner decides
        existing = docs_t._existing_pks(st_d, ids)
    else:
        existing = ids.limit(0)
    fresh = survivors.join(existing, "doc_id", "left_anti").persist()
    accepted = fresh.count()
    versions = {}
    if accepted:
        fresh_keys = new_keys.join(
            fresh.select("doc_id"), "doc_id", "left_semi"
        ).select(F.col("band").cast("int"), "bkey", F.col("doc_id").cast("bigint"))
        txn = EngineTransaction(engine)
        txn.insert(docs_name, fresh)
        txn.insert(bands_name, fresh_keys)
        versions = txn.commit()
        # post-publish maintenance: the coordinator must not stretch
        # the inter-participant window, so EngineTransaction defers it
        # to the caller — here, where it bounds file + sidecar counts
        docs_t._maybe_auto_compact()
        bands_t._maybe_auto_compact()
    for df in (batch, new_keys, fresh):
        try:
            df.unpersist()
        except Exception:
            pass
    return {"arrived": arrived, "accepted": accepted, "versions": versions}


def ingest_corpus_stream(engine, stream_df: DataFrame,
                         docs_name: str = "corpus",
                         bands_name: str | None = None,
                         quality_min: float | None = None,
                         checkpoint: str | None = None,
                         available_now: bool = False):
    """Start the streaming ingestion query (readStream source →
    quality gate → exact + incremental near-dup → one cross-table
    txn per micro-batch)."""
    def process(batch_df: DataFrame, _batch_id: int) -> None:
        if not batch_df.isEmpty():
            ingest_batch(engine, batch_df, docs_name, bands_name, quality_min)

    w = stream_df.writeStream.foreachBatch(process).outputMode("update")
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
