"""Streaming corpus ingestion with incremental dedup — the continuous
-crawl shape of an LLM training-data pipeline on this engine.

A document stream lands in an engine `docs` table only if it survives
(a) optional quality gating, (b) exact dedup within the micro-batch,
and (c) near-dup rejection against EVERYTHING ingested so far. The
"so far" state is not recomputed per batch: a second engine table
holds the MinHash-LSH band keys of every accepted document, so each
batch joins its own (small) band-key set against that table — O(batch)
work per batch, never O(corpus) (the materialized form of
operators.dedup.incremental_dedup_survivors' precompute note).

Both tables advance in ONE cross-table EngineTransaction per batch
(writer.EngineTransaction ≈ KuduTransaction, client.h:445-545): a
crash can never leave accepted documents without their band keys (a
gap that would let later duplicates slip through) or vice versa —
recovery completes or compensates the marker like any other txn.

Replays (at-least-once sources) are absorbed twice over: re-delivered
doc_ids hit the PK insert-ignore path, and re-delivered content hits
the band-key join.

Scale: the band-key table is hash-partitioned by (band, bkey) — the
join key — so the per-batch semi join co-locates by construction;
band keys are 8-byte band + 32-byte key per (doc, band), ~40 B × docs
× bands of state, independent of document size.
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
    ``engine.alter_table`` as needed."""
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
    return docs, bands


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
    # near-dup rejection against the corpus-so-far band keys: an
    # asymmetric semi join against the side table (O(batch) probes).
    # Band keys are computed ONCE and reused for the insert.
    new_keys = minhash_band_keys(cand.select("doc_id", "text")).persist()
    collided = (
        new_keys.join(bands_t.scan(columns=["band", "bkey"]),
                      ["band", "bkey"], "left_semi")
        .select("doc_id").distinct()
    )
    survivors = cand.join(collided, "doc_id", "left_anti")
    # replay absorption: doc_ids already in the corpus (same content
    # re-delivered) are dropped, not errors
    existing = docs_t.scan(columns=["doc_id"])
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
