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
    big = spark.createDataFrame([(0, i) for i in range(64)], "k bigint, v bigint")
    salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(8)).cast("int")
    )
    n_salts = salted.select("__salt").distinct().count()
    assert n_salts >= 6  # one hot key fans out over nearly all salt values


def test_salted_join_rejects_right_joins(spark):
    df = spark.createDataFrame([(1, 1)], "k bigint, v bigint")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(df, df, "k", how="full_outer")
