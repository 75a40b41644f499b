"""Guard against the HUGEINT oracle bug class (cost rounds 1 and 2).

The driver's correctness gate hashes values *with their Arrow types*.
DuckDB silently widens ``sum(BIGINT)`` to HUGEINT (and ``sum(INT)``
to BIGINT is fine, but HUGEINT has no Spark equivalent), so an oracle
whose result carries HUGEINT/UHUGEINT hash-mismatches a value-identical
Spark result. This sweep runs every registered oracle in DuckDB at
sf0.001 and asserts no result column is HUGEINT/UHUGEINT — catching
the bug class at test time instead of at the driver gate.
"""

from __future__ import annotations

import pytest

from kudu_spark.queries import _load_registry, REGISTRY
from tests.oracle_util import duck_connection

SF_DIR = "/root/testdata/sf0.001"

_load_registry()
ORACLES = sorted(
    (name, oracle) for name, (fn, oracle, gated) in REGISTRY.items() if oracle
)

BANNED = {"HUGEINT", "UHUGEINT"}


@pytest.mark.parametrize("name,oracle", ORACLES, ids=[n for n, _ in ORACLES])
def test_oracle_result_has_no_hugeint(name, oracle):
    con = duck_connection(SF_DIR)
    rel = con.sql(oracle)
    bad = [
        (col, str(typ))
        for col, typ in zip(rel.columns, rel.types)
        if str(typ).upper() in BANNED
    ]
    assert not bad, (
        f"oracle {name!r} returns banned DuckDB type(s) {bad}; "
        "wrap the aggregate in CAST(... AS BIGINT) so the driver's "
        "typed value-hash matches Spark"
    )
