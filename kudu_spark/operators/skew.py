"""Skew-aware joins and aggregations.

At 100 TB a handful of hot keys (the empty string, a default tenant,
a bot user) can put one shuffle partition hours behind the rest. AQE's
skew-join rewrite already splits oversized partitions for sort-merge
joins; these helpers cover the cases it does not:

- salted_join: an equi-join where ONE side is explosively skewed and
  the other is small-to-medium (too big to broadcast whole, small
  enough to replicate `salt` times). The big side gets a deterministic
  per-row salt appended to the key; the small side is replicated once
  per salt value. Every hot key now spreads over `salt` partitions.
  Result is row-identical to the plain join (inner/left joins: the
  replicated side carries no duplicate (key, salt) pairs).
- salted_count / two-phase aggregation needs no helper: Spark's
  partial aggregation already combines map-side, which is exactly the
  salting trick applied automatically — documented here so nobody
  reimplements it.

Salting multiplies the small side's shuffle volume by `salt`; pick the
smallest value that flattens the straggler (8-32 in practice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _salt_expr(df: DataFrame, salt: int):
    """Deterministic-per-run salt for a row of ``df``: content hash
    mixed with the row's physical position (partition id + counter),
    so even FULLY IDENTICAL rows of a hot key spread over all salt
    values instead of re-concentrating on one."""
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns],
                   F.spark_partition_id(), F.monotonically_increasing_id()),
        F.lit(salt),
    ).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join `big` (skewed side) to `small` with the join keys
    salted `salt` ways. Output columns = plain ``big.join(small, on,
    how)``. ``how`` is restricted to inner/left joins — the shapes
    where replicating the small side cannot manufacture rows (a right/
    full join would emit one unmatched small-side row PER SALT)."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti"):
        raise ValueError(f"salted_join supports inner/left joins, not {how!r}")
    if "__salt" in big.columns or "__salt" in small.columns:
        # mirrors asof_join's reserved-name check: silently overwriting
        # (and then dropping) a user column would corrupt data
        raise ValueError("salted_join reserves the column name '__salt'")
    keys = [on] if isinstance(on, str) else list(on)
    # content alone is not enough for the spread — the motivating
    # workload (a hot default/empty-string key) often carries fully
    # identical payloads, so _salt_expr mixes in physical position
    bigs = big.withColumn("__salt", _salt_expr(big, salt))
    smalls = small.crossJoin(
        F.broadcast(
            big.sparkSession.range(salt).select(F.col("id").cast("int").alias("__salt"))
        )
    )
    return bigs.join(smalls, keys + ["__salt"], how).drop("__salt")
