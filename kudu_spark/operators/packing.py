"""Sequence packing for pretraining pipelines: documents concatenate
in doc_id order into a single token stream that is cut into
fixed-budget packs (GPT-style packed batches; documents may straddle
pack boundaries). Each document's placement is a pure function of the
cumulative token count before it, so the whole operator is exact,
deterministic, and SQL-twinable.

Scale: a naive global cumulative sum is a one-partition window — a
bottleneck at corpus scale. This implementation chunks the doc_id
space: within-chunk cumulative sums parallelize (window PARTITIONED BY
chunk), chunk base offsets come from a tiny per-chunk total (one row
per `chunk_size` docs) joined back broadcast. Results are identical to
the global cumsum; raise chunk_size as the corpus grows so the chunk
table stays broadcastable (at 100B docs and chunk_size=1e6 it is 100k
rows)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BUDGET = 2048


def pack_documents(docs: DataFrame, token_budget: int = DEFAULT_BUDGET,
                   chunk_size: int = 4096) -> DataFrame:
    """(doc_id, n_tokens, start_pack, start_offset, end_pack): where
    each document lands in the packed token stream. n_tokens is the
    whitespace token count (swap in a BPE count upstream if needed)."""
    tok = docs.select(
        "doc_id",
        F.size(F.split(F.lower(F.col("text")), " ")).cast("bigint").alias("n_tokens"),
    )
    b = tok.withColumn("__b", (F.col("doc_id") / chunk_size).cast("bigint"))
    w_in = (
        Window.partitionBy("__b").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = b.withColumn("__cin", F.sum("n_tokens").over(w_in))
    w_b = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    base = (
        b.groupBy("__b").agg(F.sum("n_tokens").alias("__t"))
        .withColumn("__base", F.coalesce(F.sum("__t").over(w_b), F.lit(0)))
        .select("__b", "__base")
    )
    j = within.join(F.broadcast(base), "__b")
    start = F.col("__cin") + F.col("__base") - F.col("n_tokens")
    end = F.col("__cin") + F.col("__base") - 1
    return j.select(
        "doc_id",
        "n_tokens",
        F.floor(start / token_budget).cast("bigint").alias("start_pack"),
        F.pmod(start, F.lit(token_budget)).cast("bigint").alias("start_offset"),
        F.floor(end / token_budget).cast("bigint").alias("end_pack"),
    )


def pack_sql(token_budget: int = DEFAULT_BUDGET) -> str:
    """DuckDB oracle: the plain global-cumsum formulation (equivalent
    to the chunked one by construction)."""
    return f"""
    WITH tok AS (
      SELECT doc_id, CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), cum AS (
      SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
      FROM tok
    )
    SELECT doc_id, n_tokens,
           CAST((cum - n_tokens) // {token_budget} AS BIGINT) AS start_pack,
           CAST((cum - n_tokens) % {token_budget} AS BIGINT) AS start_offset,
           CAST((cum - 1) // {token_budget} AS BIGINT) AS end_pack
    FROM cum
    """
