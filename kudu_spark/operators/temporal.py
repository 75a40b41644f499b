"""Temporal joins Spark lacks as built-ins: as-of join and
point-in-interval range join.

Kudu itself delegates joins to the SQL layer (SURVEY.md §2.3), but a
time-series table keyed on (entity, ts) — Kudu's canonical schema —
makes these the two joins users actually run. Both are expressed as
compositions of existing DataFrame ops (no UDFs, no per-key loops):

- asof_join: the piggyback sort-merge. Tag both sides, union, and
  carry the latest right payload forward with last(ignorenulls) over
  one (key-partitioned, time-ordered) window. ONE shuffle on the key;
  cost is the window sort, identical to what a native as-of merge
  would pay. No broadcast of either side, no range explosion — this
  is the shape that survives a 100 TB fact table (pandas' merge_asof
  is single-node; a naive inequality join is a theta join Spark would
  nested-loop).
- range_point_interval_join: bucketize time, explode each interval
  into the fixed-width buckets it covers, equi-join points on
  (key, bucket), exact-filter. Shuffle carries (interval ×
  buckets_per_interval) rows — bounded by interval_length/bucket —
  instead of the |points| × |intervals| theta join. Pick the bucket
  width near the median interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, the right row with the
    greatest right_ts <= left_ts for the same `on` key (NULLs when no
    prior right row, or when it is older than `tolerance_seconds`).

    Right rows sharing (key, ts) are deduplicated deterministically to
    the lexicographically greatest payload struct (field order =
    right_cols order), so results never depend on partitioning.

    Output: all left columns + right_ts aliased `asof_ts` + right_cols.
    Right payload columns must not collide with left column names
    (rejected up front — a silent duplicate output column breaks every
    downstream reference with AMBIGUOUS_REFERENCE).
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    clash = sorted(set(right_cols) & set(left.columns) | ({"asof_ts"} & set(left.columns)))
    if clash:
        raise ValueError(
            f"asof_join right columns collide with left columns: {clash} — "
            "alias the right side before joining"
        )
    payload = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in right_cols]
    )
    r0 = (
        right.groupBy(F.col(on).alias("__k"), F.col(right_ts).alias("__ts"))
        .agg(F.max(payload).alias("__rp"))
        .select("__k", "__ts", F.lit(0).alias("__side"), "__rp")
    )
    lp = F.struct(*[F.col(c) for c in left.columns])
    l0 = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        lp.alias("__lp"),
    )
    r = r0.withColumn("__lp", F.lit(None).cast(l0.schema["__lp"].dataType))
    l = l0.withColumn("__rp", F.lit(None).cast(r0.schema["__rp"].dataType))
    # right (side 0) sorts before left (side 1) at equal ts, so an
    # exactly-simultaneous right row matches (<= semantics)
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(l, allowMissingColumns=False)
        .withColumn("__m", F.last("__rp", ignorenulls=True).over(w))
        .where(F.col("__side") == 1)
    )
    if tolerance_seconds is not None:
        in_tol = (
            F.col("__ts").cast("long") - F.col("__m.__rts").cast("long")
        ) <= tolerance_seconds
        matched = matched.withColumn("__m", F.when(in_tol, F.col("__m")))
    return matched.select(
        *[F.col(f"__lp.{c}").alias(c) for c in left.columns],
        F.col("__m.__rts").alias("asof_ts"),
        *[F.col(f"__m.{c}").alias(c) for c in right_cols],
    )


def range_point_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_ts: str = "ts",
    start_ts: str = "start",
    end_ts: str = "end",
    bucket: str = "1 hour",
) -> DataFrame:
    """Inner join of points to the intervals containing them:
    same `on` key and start_ts <= point_ts < end_ts. Returns all
    point columns + all non-key interval columns.

    The interval side explodes into its covered time buckets, turning
    the inequality into an equi-join on (key, bucket) + a cheap exact
    residual filter. Buckets are ARITHMETIC — epoch_micros // width —
    computed identically on both sides, so any fixed width ('2 hours',
    '90 minutes', …) is exact; a date_trunc formulation would be wrong
    for every multiplier other than 1 (points truncate to the unit,
    interval steps stride the full width, and the grids misalign).
    Calendar-length widths (months/years) are rejected."""
    # column-collision guard (mirrors asof_join): interval payload
    # columns landing in the output must not shadow point columns, and
    # the internal key/bucket names must be free on both inputs —
    # otherwise the join emits duplicate names and every downstream
    # reference dies with AMBIGUOUS_REFERENCE
    clash = (set(intervals.columns) - {on}) & set(points.columns)
    if clash:
        raise ValueError(
            f"interval columns collide with point columns: {sorted(clash)}; "
            "rename one side before joining"
        )
    reserved = {"__k", "__b"} & (set(points.columns) | set(intervals.columns))
    if reserved:
        raise ValueError(
            f"range_point_interval_join reserves column names {sorted(reserved)}"
        )
    n_s, unit = bucket.split()
    per_us = {"second": 1_000_000, "minute": 60_000_000, "hour": 3_600_000_000,
              "day": 86_400_000_000, "week": 604_800_000_000}
    u = unit.rstrip("s").lower()
    if u not in per_us:
        raise ValueError(f"bucket must use a fixed-length unit {sorted(per_us)}: {bucket}")
    width = int(n_s) * per_us[u]

    def us(col: str):
        # unix_micros rejects TIMESTAMP_NTZ; the cast normalizes both
        # flavors (applied identically to both sides, so the bucket
        # grids stay aligned whatever the session timezone)
        return F.unix_micros(F.col(col).cast("timestamp"))

    icols = [c for c in intervals.columns if c != on]
    i = intervals.select(
        F.col(on).alias("__k"),
        *icols,
        F.explode(
            F.sequence(F.floor(us(start_ts) / width), F.floor(us(end_ts) / width))
        ).alias("__b"),
    )
    p = points.select(
        "*",
        F.col(on).alias("__k"),
        F.floor(us(point_ts) / width).alias("__b"),
    )
    return (
        p.join(i, ["__k", "__b"])
        .where((F.col(start_ts) <= F.col(point_ts)) & (F.col(point_ts) < F.col(end_ts)))
        .drop("__k", "__b")
    )
