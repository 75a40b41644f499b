"""pyskudu — a PySpark-native mutable analytics table engine.

Re-expresses the query/data-processing surface of Apache Kudu
(reference: /root/reference, see SURVEY.md) as an idiomatic Spark
stack: Parquet data files + an atomic JSON commit log, merge-on-read
mutations, Catalyst pushdown for scans, and Spark SQL for all
relational operators (joins/aggs/windows) — the same division of
labor Kudu chose with Impala/Spark.
"""

from kudu_spark.errors import (
    DuplicateKeyError,
    ImmutableColumnError,
    RowNotFoundError,
    TableExistsError,
    TableNotFoundError,
)
from kudu_spark.session import get_spark


def __getattr__(name):
    # lazy: avoid importing the storage engine for pure-query users
    if name == "Engine":
        from kudu_spark.engine import Engine

        return Engine
    raise AttributeError(name)

__all__ = [
    "Engine",
    "get_spark",
    "DuplicateKeyError",
    "RowNotFoundError",
    "ImmutableColumnError",
    "TableExistsError",
    "TableNotFoundError",
]

__version__ = "0.1.0"
