"""salted_join semantics (the sf-scale oracle comparison runs via
test_queries_oracle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kudu_spark.operators.skew import salted_join


def test_salted_join_row_identical_to_plain(spark):
    # one explosively hot key (0) + a long tail
    big = spark.createDataFrame(
        [(i % 2 and i or 0, i) for i in range(500)], "k bigint, v bigint"
    )
    small = spark.createDataFrame([(i, f"d{i}") for i in range(250)], "k bigint, d string")
    for how in ("inner", "left"):
        got = sorted(map(tuple, salted_join(big, small, "k", how=how, salt=8).collect()))
        want = sorted(map(tuple, big.join(small, "k", how).collect()))
        assert got == want, how


def test_salted_join_spreads_hot_key(spark):
    from kudu_spark.operators.skew import _salt_expr

    big = spark.createDataFrame([(0, i) for i in range(64)], "k bigint, v bigint")
    salted = big.withColumn("__salt", _salt_expr(big, 8))
    n_salts = salted.select("__salt").distinct().count()
    assert n_salts >= 6  # one hot key fans out over nearly all salt values


def test_salted_join_spreads_identical_duplicate_rows(spark):
    """The motivating workload: a hot key whose rows are FULLY
    identical (default/empty payloads). A content-only hash would land
    them all on one salt; the position mix must spread them."""
    from kudu_spark.operators.skew import _salt_expr

    big = spark.createDataFrame([(0, 0)] * 256, "k bigint, v bigint").repartition(8)
    n_salts = big.withColumn("__salt", _salt_expr(big, 8)) \
        .select("__salt").distinct().count()
    assert n_salts >= 6
    # and the join result is still row-identical to the plain join
    small = spark.createDataFrame([(0, "d")], "k bigint, d string")
    got = salted_join(big, small, "k", salt=8)
    assert got.count() == 256
    assert got.columns == ["k", "v", "d"]


def test_salted_join_rejects_reserved_salt_column(spark):
    big = spark.createDataFrame([(1, 0)], "k bigint, __salt int")
    small = spark.createDataFrame([(1, "d")], "k bigint, d string")
    with pytest.raises(ValueError, match="__salt"):
        salted_join(big, small, "k")
    with pytest.raises(ValueError, match="__salt"):
        salted_join(small, big, "k")


def test_salted_join_rejects_right_joins(spark):
    df = spark.createDataFrame([(1, 1)], "k bigint, v bigint")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(df, df, "k", how="full_outer")
