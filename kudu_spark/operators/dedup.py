"""Deduplication operators for LLM training-data pipelines.

All are pure DataFrame compositions (no Python UDFs): hashing via md5
prefixes, set ops via explode/groupBy/join. Scale notes per operator:

- exact: one shuffle on the text hash. At 100 TB, hash first
  (md5(text)) so the shuffle carries 32-byte keys, not documents.
- minhash LSH: explode(shingles) → per-(doc, seed) min — a map-side
  combinable aggregation — then band-key self-join. The self-join is
  on (band, band_key), i.e. only collisions shuffle; this is the
  standard scalable near-dup pipeline (candidate pairs ≪ n²).
- simhash: bit-vote aggregation per doc, then banded hamming join.
- n-gram jaccard: shingle-inverted-index join restricted to LSH
  candidates would be the production shape; here candidates come from
  a shared-shingle join with a frequency cap against hot shingles.
- embedding cosine: exact threshold join; LSH/IVF variants in
  similarity.py bound the candidate set at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kudu_spark.functions.text import (
    LSH_BANDS,
    MINHASH_SEEDS,
    SIMHASH_BITS,
    shingles_expr,
    tokens_expr,
)


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Exact dedup by content hash: every doc mapped to the canonical
    (minimum) doc_id of its text group."""
    w = Window.partitionBy("__h")
    return (
        docs.select("doc_id", F.md5("text").alias("__h"))
        .withColumn("canonical_id", F.min("doc_id").over(w))
        .withColumn("is_dup", F.col("doc_id") != F.col("canonical_id"))
        .select("doc_id", "canonical_id", "is_dup")
    )


def minhash_signatures(docs: DataFrame, seeds: int = MINHASH_SEEDS) -> DataFrame:
    """(doc_id, seed, minhash) — min md5-prefix per permutation."""
    sh = docs.select("doc_id", F.explode(shingles_expr()).alias("s"))
    seed_df = docs.sparkSession.range(seeds).select(F.col("id").cast("int").alias("seed"))
    return (
        sh.crossJoin(F.broadcast(seed_df))
        .groupBy("doc_id", "seed")
        .agg(
            F.min(
                F.substring(F.md5(F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("s"))), 1, 16)
            ).alias("mh")
        )
    )


def minhash_lsh_pairs(docs: DataFrame, seeds: int = MINHASH_SEEDS, bands: int = LSH_BANDS) -> DataFrame:
    """Candidate near-duplicate pairs: docs sharing any LSH band."""
    rows_per_band = seeds // bands
    sig = minhash_signatures(docs, seeds).withColumn(
        "band", (F.col("seed") / rows_per_band).cast("int")
    )
    band_key = (
        sig.groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.sort_array(F.collect_list(F.struct("seed", "mh"))), lambda x: x["mh"]
                    ),
                    ",",
                )
            ).alias("bkey")
        )
    )
    a = band_key.alias("a")
    b = band_key.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def simhash(docs: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """Per-doc simhash over distinct tokens: bit j of md5(token) votes
    ±1; simhash bit j = (vote sum > 0). Returned as a bigint."""
    tok = docs.select("doc_id", F.explode(F.array_distinct(tokens_expr())).alias("tok"))
    bit_df = docs.sparkSession.range(bits).select(F.col("id").cast("int").alias("j"))
    # SQL-expression form: shiftright/shiftleft take column shift amounts
    # in SQL (the F.shiftright python wrapper requires an int literal)
    bit_sql = (
        "(shiftright(CAST(conv(substring(md5(tok), CAST(j / 4 AS INT) + 1, 1), 16, 10)"
        " AS INT), 3 - CAST(j % 4 AS INT)) & 1)"
    )
    votes = (
        tok.crossJoin(F.broadcast(bit_df))
        .select("doc_id", "j", F.expr(bit_sql).alias("b"))
        .groupBy("doc_id", "j")
        .agg(F.sum(F.col("b") * 2 - 1).alias("vote"))
    )
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.expr(
                "CASE WHEN vote > 0 THEN shiftleft(CAST(1 AS BIGINT), CAST(j AS INT))"
                " ELSE CAST(0 AS BIGINT) END"
            )
        )
        .cast("bigint")
        .alias("simhash")
    )


def simhash_pairs(docs: DataFrame, bits: int = SIMHASH_BITS, max_hamming: int = 6,
                  bands: int = 4) -> DataFrame:
    """Near-dup pairs by simhash: banded exact-match on bit chunks
    (a pair within hamming distance < bands must agree on ≥1 band),
    then exact hamming via bit_count(xor)."""
    sh = simhash(docs, bits)
    chunk = bits // bands
    mask = (1 << chunk) - 1
    banded = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"),
                        F.shiftright("simhash", q * chunk).bitwiseAND(F.lit(mask)).alias("bk"),
                    )
                    for q in range(bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "simhash", "band.q", "band.bk")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.q") == F.col("b.q"))
            & (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.8,
                        max_shingle_freq: int = 50) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs from a shingle
    inverted index. Shingles appearing in > max_shingle_freq docs are
    dropped from candidate generation (hot-key/skew control — they
    generate quadratic candidates and discriminate nothing); both the
    intersection and the set sizes use the filtered shingle space, so
    the value is the exact Jaccard of the rare-shingle sets."""
    sh = docs.select("doc_id", F.explode(shingles_expr()).alias("s"))
    freq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    rare = sh.join(F.broadcast(freq.where(F.col("df") <= max_shingle_freq)), "s").select(
        "doc_id", "s"
    )
    sizes = rare.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = rare.alias("a"), rare.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4
            ),
        )
        .where(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")) >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
