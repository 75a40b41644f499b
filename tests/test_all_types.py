"""All-types matrix: every client-exposed Kudu type (SURVEY §1.2,
common.proto:41-63) through create / insert / scan / predicate /
upsert / alter round-trips — the analogue of
all_types-scan-correctness-test.cc and KuduTestSuite.scala:60-165."""

from __future__ import annotations

import datetime
from decimal import Decimal

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kudu_spark.engine import Engine

ALL_TYPES = [
    ("key", "int", False),
    ("c1_i", "int", True),
    ("c2_s", "string", True),
    ("c3_double", "double", True),
    ("c4_long", "bigint", True),
    ("c5_bool", "boolean", True),
    ("c6_short", "smallint", True),
    ("c7_float", "float", True),
    ("c8_binary", "binary", True),
    ("c9_ts", "timestamp", True),
    ("c10_byte", "tinyint", True),
    ("c11_dec32", "decimal(9,0)", True),
    ("c12_dec64", "decimal(18,0)", True),
    ("c13_dec128", "decimal(38,0)", True),
    ("c14_varchar", "varchar(10)", True),
    ("c15_date", "date", True),
    ("c16_int_array", "array<int>", True),
    ("c17_str_array", "array<string>", True),
    ("c18_double_array", "array<double>", True),
]

# DataFrames can't carry varchar directly (Spark keeps it a table-level
# type); the engine casts on write
DDL = ", ".join(f"{n} {t.replace('varchar(10)', 'string')}" for n, t, _ in ALL_TYPES)


def mkrow(k: int, null_row: bool = False) -> Row:
    if null_row:
        return Row(key=k, **{n: None for n, _, _ in ALL_TYPES[1:]})
    return Row(
        key=k,
        c1_i=k * 2,
        c2_s=f"str{k}",
        c3_double=k + 0.5,
        c4_long=k * 10_000_000_000,
        c5_bool=k % 2 == 0,
        c6_short=k % 1000,
        c7_float=float(k) / 4,
        c8_binary=bytes([k % 256, (k + 1) % 256]),
        c9_ts=datetime.datetime(2020, 1, 1) + datetime.timedelta(microseconds=k),
        c10_byte=k % 100,
        c11_dec32=Decimal(k * 7),
        c12_dec64=Decimal(k) * 10**12,
        c13_dec128=Decimal(k) * 10**30,
        c14_varchar=f"v{k}"[:10],
        c15_date=datetime.date(2020, 1, 1) + datetime.timedelta(days=k % 365),
        c16_int_array=[k, k + 1, None],
        c17_str_array=[f"a{k}", None],
        c18_double_array=[k * 1.5],
    )


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    eng = Engine(spark, str(tmp_path_factory.mktemp("wh")))
    t = eng.create_table("all_types", ALL_TYPES, pk=["key"],
                         hash_partitions=[{"columns": ["key"], "buckets": 2}])
    rows = [mkrow(k) for k in range(100)] + [mkrow(k, null_row=True) for k in range(100, 110)]
    t.insert(spark.createDataFrame(rows, DDL))
    return t


def test_roundtrip_all_values(table):
    got = {r.key: r for r in table.scan().collect()}
    assert len(got) == 110
    r5 = got[5]
    assert r5.c4_long == 50_000_000_000
    assert r5.c8_binary == bytes([5, 6])
    assert r5.c9_ts.microsecond == 5  # µs fidelity (UNIXTIME_MICROS)
    assert r5.c11_dec32 == Decimal(35)
    assert r5.c13_dec128 == Decimal(5) * 10**30
    assert r5.c16_int_array == [5, 6, None]  # nullable array elements
    assert r5.c17_str_array == ["a5", None]
    nulls = got[105]
    assert all(getattr(nulls, n) is None for n, _, _ in ALL_TYPES[1:])


@pytest.mark.parametrize(
    "filt,expect",
    [
        (("c1_i", "=", 10), {5}),
        (("c2_s", "prefix", "str1"), {1} | set(range(10, 20)) | set(range(100, 110)) - set(range(100, 110))),
        (("c5_bool", "=", True), set(range(0, 100, 2))),
        (("c9_ts", "<", datetime.datetime(2020, 1, 1, 0, 0, 0, 3)), {0, 1, 2}),
        (("c15_date", "=", datetime.date(2020, 1, 11)), {10}),
        (("c11_dec32", ">=", Decimal(686)), {98, 99}),
        (("c1_i", "is_null", None), set(range(100, 110))),
    ],
)
def test_predicates_per_type(table, filt, expect):
    got = {r.key for r in table.scan(columns=["key"], filters=[filt]).collect()}
    assert got == expect


def test_upsert_and_update_all_types(table, spark):
    d = mkrow(5).asDict()
    d["c2_s"] = "UPDATED"
    table.upsert(spark.createDataFrame([Row(**d)], DDL))
    r = table.scan(filters=[("key", "=", 5)]).collect()[0]
    assert r.c2_s == "UPDATED" and r.c16_int_array == [5, 6, None]


def test_varchar_length_enforced(table, spark):
    df = spark.createDataFrame(
        [(500, "this string is way beyond ten chars")], "key int, c14_varchar string"
    )
    table.upsert(df)
    r = table.scan(filters=[("key", "=", 500)]).collect()[0]
    assert len(r.c14_varchar) <= 10  # VARCHAR(10) truncation (common.proto:127)


def test_alter_add_drop_on_typed_table(table, spark):
    eng = Engine(spark, table.root.rsplit("/", 1)[0])
    eng.alter_table("all_types").add_column("c19_new", "decimal(5,2)", default=1.25).apply()
    r = table.scan(filters=[("key", "=", 7)]).collect()[0]
    assert r.c19_new == Decimal("1.25")  # default visible on old rows
    eng.alter_table("all_types").drop_column("c19_new").apply()
    assert "c19_new" not in table.schema.names
