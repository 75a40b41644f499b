"""The `kudu table scan` JSON predicate grammar → engine predicates.

Grammar (reference: src/kudu/tools/table_scanner.cc:113-131):
  Comparison: [op, column, value]         op in <= < = > >=
  InList:     ["IN", column, [v1, v2]]
  IsNull:     ["NULL", column] / ["NOTNULL", column]
  Combiner:   ["AND", pred, pred, ...]    (AND is the only combiner)
"""

from __future__ import annotations

import json

from kudu_spark.errors import KuduSparkError

_COMPARISONS = {"<=", "<", "=", ">", ">="}


def parse_predicates(spec) -> list[tuple]:
    """Parse a JSON string or already-decoded list into the structured
    predicate tuples Table.scan() consumes (so they both prune the file
    manifest and push into the parquet scan)."""
    if isinstance(spec, str):
        spec = json.loads(spec)
    if not isinstance(spec, list) or not spec:
        raise KuduSparkError(f"invalid predicate: {spec!r}")
    op = spec[0]
    if op == "AND":
        out: list[tuple] = []
        for sub in spec[1:]:
            out.extend(parse_predicates(sub))
        return out
    if op in _COMPARISONS:
        if len(spec) != 3:
            raise KuduSparkError(f"comparison needs [op, column, value]: {spec!r}")
        return [(spec[1], op, spec[2])]
    if op == "IN":
        if len(spec) != 3 or not isinstance(spec[2], list):
            raise KuduSparkError(f"IN needs [\"IN\", column, [values]]: {spec!r}")
        return [(spec[1], "in", spec[2])]
    if op == "NULL":
        return [(spec[1], "is_null", None)]
    if op == "NOTNULL":
        return [(spec[1], "not_null", None)]
    raise KuduSparkError(f"unknown predicate operator {op!r}")
