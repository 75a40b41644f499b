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


def test_all_queries_run(spark, sf_dir):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, name


def test_gated_registry_within_driver_cap():
    """The driver gates only the first 50 queries(); every gated entry
    must land inside the cap and carry an oracle (0 no_oracle rows)."""
    gated = get_oracles()
    from kudu_spark.queries import get_queries

    assert len(get_queries()) <= 50
    assert set(get_queries()) == set(gated), "every gated query needs an oracle"
