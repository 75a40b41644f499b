"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kudu_spark.session import tune_for_session


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 on our scan layer) at sf0.001.

    Pinned to agg_pricing_summary INDEPENDENT of the correctness
    gate's rotation (it left the gate in r13 as long-green): the
    driver's smoke check should always exercise the same stable
    flagship plan, gated or not."""
    from kudu_spark.queries import REGISTRY

    tune_for_session(spark)
    fn = REGISTRY["agg_pricing_summary"][0]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from kudu_spark.queries import get_queries

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_for_session(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in get_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (same column aliases)."""
    from kudu_spark.queries import get_oracles

    return get_oracles()
