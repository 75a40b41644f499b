"""Edge cases for the temporal joins (oracle comparison vs DuckDB's
native ASOF JOIN runs via test_queries_oracle)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kudu_spark.operators.temporal import asof_join, range_point_interval_join


def _t(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_asof_equal_ts_matches_and_no_prior_is_null(spark):
    left = spark.createDataFrame(
        [(1, 10, _t(5)), (2, 10, _t(0)), (3, 99, _t(30))],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _t(5), 100.0), (10, _t(1), 50.0)],
        "user_id bigint, ts timestamp, v double",
    )
    out = {r["event_id"]: r for r in asof_join(left, right, on="user_id").collect()}
    assert out[1]["v"] == 100.0 and out[1]["asof_ts"] == _t(5)  # ts == matches (<=)
    assert out[2]["v"] is None  # no right row at or before
    assert out[3]["v"] is None  # key absent on right
    assert len(out) == 3  # every left row survives


def test_asof_tolerance_nulls_stale_matches(spark):
    left = spark.createDataFrame(
        [(1, 10, _t(30))], "event_id bigint, user_id bigint, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, _t(0), 1.0)], "user_id bigint, ts timestamp, v double"
    )
    fresh = asof_join(left, right, on="user_id", tolerance_seconds=3600).collect()[0]
    stale = asof_join(left, right, on="user_id", tolerance_seconds=60).collect()[0]
    assert fresh["v"] == 1.0
    assert stale["v"] is None and stale["asof_ts"] is None


def test_asof_dedup_equal_key_ts_is_deterministic(spark):
    left = spark.createDataFrame(
        [(1, 10, _t(9))], "event_id bigint, user_id bigint, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, _t(5), 1.0), (10, _t(5), 2.0)],
        "user_id bigint, ts timestamp, v double",
    )
    for _ in range(3):
        got = asof_join(left, right, on="user_id").collect()[0]
        assert got["v"] == 2.0  # lexicographically greatest payload wins


def test_range_join_boundaries(spark):
    points = spark.createDataFrame(
        [(1, 10, _t(0)), (2, 10, _t(30)), (3, 10, _t(59))],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    iv = spark.createDataFrame(
        [(10, _t(0), _t(59))], "user_id bigint, iv_start timestamp, iv_end timestamp"
    )
    got = sorted(
        r["event_id"]
        for r in range_point_interval_join(
            points, iv, on="user_id", point_ts="ts",
            start_ts="iv_start", end_ts="iv_end", bucket="1 hour",
        ).collect()
    )
    assert got == [1, 2]  # start inclusive, end exclusive


def test_range_join_interval_longer_than_bucket(spark):
    points = spark.createDataFrame(
        [(1, 7, dt.datetime(2024, 1, 1, 3, 30))],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    iv = spark.createDataFrame(
        [(7, dt.datetime(2024, 1, 1, 0, 10), dt.datetime(2024, 1, 1, 6, 0))],
        "user_id bigint, iv_start timestamp, iv_end timestamp",
    )
    got = range_point_interval_join(
        points, iv, on="user_id", point_ts="ts",
        start_ts="iv_start", end_ts="iv_end", bucket="1 hour",
    ).collect()
    assert len(got) == 1


def test_asof_single_shuffle_plan(spark):
    """The as-of join must be one exchange on the key + a window —
    no broadcast of either side, no nested-loop join."""
    left = spark.range(100).select(
        F.col("id").alias("event_id"), (F.col("id") % 10).alias("user_id"),
        F.timestamp_micros(F.col("id") * 1000000).alias("ts"),
    )
    right = spark.range(50).select(
        (F.col("id") % 10).alias("user_id"),
        F.timestamp_micros(F.col("id") * 2000000).alias("ts"),
        F.col("id").cast("double").alias("v"),
    )
    plan = asof_join(left, right, on="user_id")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan


def test_range_join_multi_unit_bucket_exact(spark):
    """Arithmetic bucketing must be exact for widths with multiplier
    > 1 (a date_trunc formulation drops matches here: a 00:30-03:30
    interval strides to {00:00, 02:00} while a 01:15 point truncates
    to 01:00 and misses)."""
    points = spark.createDataFrame(
        [(1, 7, dt.datetime(2024, 1, 1, 1, 15))],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    iv = spark.createDataFrame(
        [(7, dt.datetime(2024, 1, 1, 0, 30), dt.datetime(2024, 1, 1, 3, 30))],
        "user_id bigint, iv_start timestamp, iv_end timestamp",
    )
    for bucket in ("2 hours", "30 minutes", "90 minutes"):
        got = range_point_interval_join(
            points, iv, on="user_id", point_ts="ts",
            start_ts="iv_start", end_ts="iv_end", bucket=bucket,
        ).collect()
        assert len(got) == 1, bucket
    import pytest as _pytest

    with _pytest.raises(ValueError, match="fixed-length"):
        range_point_interval_join(
            points, iv, on="user_id", point_ts="ts",
            start_ts="iv_start", end_ts="iv_end", bucket="1 month",
        )


def test_range_join_column_collision_rejected(spark):
    """Shared non-key column names (or reserved __k/__b) would emit
    duplicate columns and AMBIGUOUS_REFERENCE downstream — rejected up
    front like asof_join."""
    import pytest as _pytest

    points = spark.createDataFrame(
        [(10, _t(5), 1.0)], "user_id bigint, ts timestamp, v double"
    )
    iv = spark.createDataFrame(
        [(10, _t(0), _t(10), 2.0)],
        "user_id bigint, iv_start timestamp, iv_end timestamp, v double"
    )
    with _pytest.raises(ValueError, match="collide"):
        range_point_interval_join(points, iv, on="user_id", point_ts="ts",
                                  start_ts="iv_start", end_ts="iv_end")
    bad = points.withColumnRenamed("v", "__k")
    iv_ok = iv.withColumnRenamed("v", "w")
    with _pytest.raises(ValueError, match="reserve"):
        range_point_interval_join(bad, iv_ok, on="user_id", point_ts="ts",
                                  start_ts="iv_start", end_ts="iv_end")


def test_asof_right_column_collision_rejected(spark):
    left = spark.createDataFrame(
        [(1, 10, _t(5), 1.0)], "event_id bigint, user_id bigint, ts timestamp, v double"
    )
    right = spark.createDataFrame(
        [(10, _t(1), 2.0)], "user_id bigint, ts timestamp, v double"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on="user_id")
