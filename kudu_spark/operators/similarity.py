"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; IVF (inverted-file)
bucketing is the scale path: assign every vector to its nearest
centroid once (broadcast centroids, one scan), then restrict each
query to its centroid's bucket — candidates drop from N to N/k.

Dot products are computed with a deterministic left-to-right double
fold (zip_with + aggregate) so the DuckDB oracle (an explicit 64-term
sum generated in the same order) matches bit-for-bit; results are
rounded only for display, ranked on the exact value.

Everything is built-in Spark SQL functions — no UDFs — so the
arithmetic runs inside codegen. For very wide vectors a Pandas-UDF
(numpy dot) variant would win; at 64 dims the JVM path is faster than
the Arrow round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DIMS = 64


def _dbl(col):
    return F.transform(col, lambda x: x.cast("double"))


def dot_expr(a, b):
    """Left-to-right ordered dot product in doubles."""
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a):
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a, b):
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(emb: DataFrame, query_ids: list[int], k: int = 10) -> DataFrame:
    """Exact top-k cosine neighbors for the given query vectors.
    Query side is broadcast; candidates stream — one pass over the
    corpus regardless of |queries|."""
    q = emb.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    cand = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
    scored = (
        cand.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine_expr("qv", "cv").alias("c"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("c"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("c", 6).alias("cosine"))
    )


def ivf_assign(emb: DataFrame, n_centroids: int = 8) -> DataFrame:
    """IVF-lite: centroids are the embeddings of vec_id 0..n-1
    (deterministic, data-derived); every vector joins its argmax-cosine
    centroid. Broadcast centroids → single scan, no shuffle."""
    cent = emb.where(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centv")
    )
    scored = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id", "embedding", "centroid_id", cosine_expr("embedding", "centv").alias("c")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("c"), F.asc("centroid_id"))
    return (
        scored.withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .select("vec_id", "embedding", "centroid_id")
    )


def ivf_topk(emb: DataFrame, query_ids: list[int], k: int = 5, n_centroids: int = 8) -> DataFrame:
    """ANN: search only within the query's IVF bucket. Recall < 1 by
    construction (that's the trade); candidates shrink ~n_centroids×."""
    assigned = ivf_assign(emb, n_centroids)
    q = assigned.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("centroid_id").alias("qc"),
    )
    cand = assigned.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        F.col("centroid_id").alias("cc"),
    )
    scored = (
        cand.join(F.broadcast(q), (F.col("cc") == F.col("qc")) & (F.col("neighbor_id") != F.col("query_id")))
        .select("query_id", "neighbor_id", cosine_expr("qv", "cv").alias("c"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("c"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("c", 6).alias("cosine"))
    )


def cosine_pairs(emb: DataFrame, threshold: float) -> DataFrame:
    """Embedding near-duplicate pairs above a cosine threshold.
    Exact O(n²) comparison — correct baseline; at corpus scale wrap it
    with ivf_assign and join within buckets first."""
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("vb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cosine_expr("va", "vb").alias("c"))
        .where(F.col("c") >= threshold)
        .select("vec_a", "vec_b", F.round("c", 6).alias("cosine"))
    )


def brute_force_topk_arrow(emb: DataFrame, query_ids: list[int], k: int = 10) -> DataFrame:
    """Exact top-k via Arrow-batched numpy matmul (mapInPandas): the
    query matrix ships inside the closure (Q x dims floats), each
    executor scores its batches as one BLAS gemm and emits only its
    local top-k per query; a final JVM-side window takes the global
    top-k. For wide embeddings (>= several hundred dims) this beats
    the codegen'd per-element fold — same results bit-for-bit on the
    rounded output (float64 accumulation both sides).

    Scale: candidates never leave executors unscored; the shuffle
    carries at most (batches x queries x k) rows."""
    import numpy as np
    import pandas as pd

    q_rows = (
        emb.where(F.col("vec_id").isin(query_ids))
        .select("vec_id", "embedding")
        .collect()
    )
    q_ids = np.array([r.vec_id for r in q_rows], dtype=np.int64)
    qm = np.array([r.embedding for r in q_rows], dtype=np.float64)
    qn = np.linalg.norm(qm, axis=1)

    def score(batches):
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            m = np.array(list(pdf["embedding"]), dtype=np.float64)
            if m.size == 0:
                continue
            sims = (m @ qm.T) / (np.linalg.norm(m, axis=1)[:, None] * qn[None, :])
            out = {"query_id": [], "neighbor_id": [], "c": []}
            for qi in range(len(q_ids)):
                col = sims[:, qi]
                mask = ids != q_ids[qi]
                cand_idx = np.nonzero(mask)[0]
                top = cand_idx[np.argsort(-col[cand_idx], kind="stable")[:k]]
                out["query_id"].extend([q_ids[qi]] * len(top))
                out["neighbor_id"].extend(ids[top])
                out["c"].extend(col[top])
            yield pd.DataFrame(out)

    scored = emb.select("vec_id", "embedding").mapInPandas(
        score, "query_id long, neighbor_id long, c double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("c"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("c", 6).alias("cosine"))
    )


def kmeans_centroids(emb: DataFrame, k: int = 8, n_iters: int = 5) -> list[list[float]]:
    """Lloyd's k-means on the embedding column, Spark-native:
    assignment = broadcast-centroid argmax (one scan, no shuffle of
    vectors); update = posexplode + groupBy(cluster, dim) mean — the
    shuffle carries (cluster, dim, partial-sum), never vectors. Only
    k x dims floats cross the driver per iteration. Deterministic:
    init = embeddings of the k smallest vec_ids, fixed iteration
    count (an iterative algorithm — exercised by the rows-only gate,
    not SQL-expressible)."""
    init = (
        emb.orderBy("vec_id").limit(k)
        .select(F.transform("embedding", lambda x: x.cast("double")).alias("c"))
        .collect()
    )
    cents = [list(r.c) for r in init]
    spark = emb.sparkSession
    for _ in range(n_iters):
        cent_df = F.broadcast(spark.createDataFrame(
            [(i, c) for i, c in enumerate(cents)], "centroid_id int, centv array<double>"
        ))
        w = Window.partitionBy("vec_id").orderBy(F.desc("c"), F.asc("centroid_id"))
        assigned = (
            emb.crossJoin(cent_df)
            .select("vec_id", "embedding", "centroid_id",
                    cosine_expr("embedding", "centv").alias("c"))
            .withColumn("r", F.row_number().over(w))
            .where(F.col("r") == 1)
        )
        new = (
            assigned.select("centroid_id", F.posexplode(_dbl("embedding")).alias("pos", "v"))
            .groupBy("centroid_id", "pos")
            .agg(F.avg("v").alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda x: x["m"]
                ).alias("c")
            )
            .collect()
        )
        by_id = {r.centroid_id: list(r.c) for r in new}
        cents = [by_id.get(i, cents[i]) for i in range(k)]
    return cents


def ivf_kmeans_topk(emb: DataFrame, query_ids: list[int], k: int = 5,
                    n_centroids: int = 8, n_iters: int = 3,
                    n_probes: int = 2) -> DataFrame:
    """ANN over learned k-means cells with multi-probe: each query
    searches its n_probes nearest cells (the standard recall knob).
    Candidates shrink ~(n_centroids / n_probes)x vs brute force."""
    cents = kmeans_centroids(emb, n_centroids, n_iters)
    spark = emb.sparkSession
    cent_df = F.broadcast(spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "centroid_id int, centv array<double>"
    ))
    scored_cells = emb.crossJoin(cent_df).select(
        "vec_id", "embedding", "centroid_id",
        cosine_expr("embedding", "centv").alias("c"),
    )
    w1 = Window.partitionBy("vec_id").orderBy(F.desc("c"), F.asc("centroid_id"))
    ranked = scored_cells.withColumn("r", F.row_number().over(w1))
    assigned = ranked.where(F.col("r") == 1).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        F.col("centroid_id").alias("cell"),
    )
    probes = ranked.where((F.col("r") <= n_probes) & F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("centroid_id").alias("cell")
    )
    qv = emb.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .join(F.broadcast(qv), "query_id")
        .select("query_id", "neighbor_id", cosine_expr("qv", "cv").alias("c"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("c"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("c", 6).alias("cosine"))
    )


# -- DuckDB oracle fragments ----------------------------------------------------


def dot_sql(a: str, b: str, dims: int = DIMS) -> str:
    """Explicit left-to-right sum matching dot_expr's fold order."""
    terms = " + ".join(
        f"(CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE))" for i in range(1, dims + 1)
    )
    return f"(0.0 + {terms})"


def cosine_sql(a: str, b: str, dims: int = DIMS) -> str:
    return (
        f"({dot_sql(a, b, dims)} / "
        f"(sqrt({dot_sql(a, a, dims)}) * sqrt({dot_sql(b, b, dims)})))"
    )
