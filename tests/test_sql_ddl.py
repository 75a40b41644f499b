"""SQL DDL through Engine.sql — the Impala-on-Kudu catalog surface
(docs/kudu_impala_integration.adoc:150-420): CREATE TABLE with
hash+range partitioning and per-column storage attributes, CTAS,
DROP (soft-delete default / PURGE), and the ALTER TABLE family —
all mapping onto the same metadata-log operations as the Python API.
"""

from __future__ import annotations

import tempfile

import pytest

from kudu_spark.engine import Engine
from kudu_spark.errors import KuduSparkError, SchemaError, TableExistsError


@pytest.fixture()
def eng(spark):
    return Engine(spark, tempfile.mkdtemp(prefix="pyskudu-ddl-"))


CREATE = """
CREATE TABLE cust (
  id BIGINT PRIMARY KEY,
  name STRING NOT NULL,
  bal DOUBLE DEFAULT 0.0,
  seg STRING ENCODING PREFIX_ENCODING COMPRESSION LZ4 COMMENT 'market segment',
  amt DECIMAL(12,2)
)
PARTITION BY HASH (id) PARTITIONS 4, RANGE (id) (
  PARTITION VALUES < 100,
  PARTITION 100 <= VALUES < 200,
  PARTITION 200 <= VALUES
)
STORED AS KUDU
TBLPROPERTIES ('auto_compact' = 'false')
"""


def test_create_table_full_form(eng):
    r = eng.sql(CREATE).collect()[0]
    assert r.operation == "CREATE TABLE"
    st = eng.table("cust").state()
    assert st.schema.pk == ["id"]
    assert not st.schema.col("id").nullable and not st.schema.col("name").nullable
    assert st.schema.col("bal").default == 0.0
    assert st.schema.col("seg").encoding == "PREFIX_ENCODING"
    assert st.schema.col("seg").compression == "LZ4"
    assert st.schema.col("seg").comment == "market segment"
    assert st.schema.col("amt").type == "decimal(12,2)"
    assert st.props.get("auto_compact") == "false"
    assert [h.buckets for h in st.partition_spec.hash_dims] == [4]
    rs = st.partition_spec.range_spec
    assert rs.enabled and len(rs.ranges) == 3
    assert rs.ranges[0] == [None, 100] and rs.ranges[2] == [200, None]
    # defaults fill on a column-list insert; range + hash enforced
    eng.sql("INSERT INTO cust (id, name) VALUES (250, 'c')")
    assert eng.sql("SELECT bal FROM cust WHERE id = 250").collect()[0].bal == 0.0


def test_create_if_not_exists_and_duplicate(eng):
    eng.sql("CREATE TABLE t1 (id BIGINT PRIMARY KEY) STORED AS KUDU")
    with pytest.raises(TableExistsError):
        eng.sql("CREATE TABLE t1 (id BIGINT PRIMARY KEY) STORED AS KUDU")
    eng.sql("CREATE TABLE IF NOT EXISTS t1 (id BIGINT PRIMARY KEY) STORED AS KUDU")


def test_create_requires_pk_and_rejects_hms_keywords(eng):
    with pytest.raises(SchemaError, match="PRIMARY KEY"):
        eng.sql("CREATE TABLE npk (id BIGINT) STORED AS KUDU")
    with pytest.raises(KuduSparkError, match="PARTITIONED"):
        eng.sql("CREATE TABLE x (id BIGINT PRIMARY KEY) PARTITIONED BY (id) "
                "STORED AS KUDU")
    with pytest.raises(KuduSparkError, match="LOCATION"):
        eng.sql("CREATE TABLE x (id BIGINT PRIMARY KEY) STORED AS KUDU "
                "LOCATION '/tmp/x'")


def test_create_compound_pk_clause_and_single_value_partition(eng):
    eng.sql("""
        CREATE TABLE ev (
          host STRING,
          ts BIGINT,
          v DOUBLE,
          PRIMARY KEY (host, ts)
        )
        PARTITION BY HASH (host) PARTITIONS 2, RANGE (host) (
          PARTITION VALUE = 'a',
          PARTITION VALUE = 'b'
        )
        STORED AS KUDU
    """)
    st = eng.table("ev").state()
    assert st.schema.pk == ["host", "ts"]
    assert st.partition_spec.range_spec.ranges == [["a", "a\x00"], ["b", "b\x00"]]
    eng.sql("INSERT INTO ev VALUES ('a', 1, 0.5)")
    with pytest.raises(KuduSparkError):
        eng.sql("INSERT INTO ev VALUES ('c', 1, 0.5)")  # no covering range


def test_ctas(eng):
    eng.sql(CREATE)
    eng.sql("INSERT INTO cust (id, name, bal) VALUES (1,'a',5.0),(150,'b',-1.0)")
    r = eng.sql("""
        CREATE TABLE pos PRIMARY KEY (id)
        PARTITION BY HASH PARTITIONS 2
        STORED AS KUDU
        AS SELECT id, name, bal FROM cust WHERE bal > 0
    """).collect()[0]
    assert r.rows_affected == 1
    got = [tuple(x) for x in eng.sql("SELECT * FROM pos").collect()]
    assert got == [(1, "a", 5.0)]
    st = eng.table("pos").state()
    assert st.schema.pk == ["id"] and not st.schema.col("id").nullable


def test_drop_soft_delete_and_purge(eng):
    eng.sql("CREATE TABLE d1 (id BIGINT PRIMARY KEY) STORED AS KUDU")
    eng.sql("DROP TABLE d1")
    assert "d1" not in eng.list_tables()
    assert "d1" in eng.list_tables(include_soft_deleted=True)  # Kudu soft-delete
    eng.recall_table("d1")
    assert "d1" in eng.list_tables()
    eng.sql("DROP TABLE d1 PURGE")
    assert "d1" not in eng.list_tables(include_soft_deleted=True)
    eng.sql("DROP TABLE IF EXISTS d1")  # no-op, no raise


def test_alter_columns_rename_properties(eng):
    eng.sql(CREATE)
    eng.sql("ALTER TABLE cust ADD COLUMNS (note STRING DEFAULT 'none', cnt INT)")
    eng.sql("ALTER TABLE cust DROP COLUMN amt")
    eng.sql("ALTER TABLE cust CHANGE note remark STRING")
    eng.sql("ALTER TABLE cust SET TBLPROPERTIES ('auto_compact' = 'true')")
    eng.sql("ALTER TABLE cust ALTER COLUMN remark SET DEFAULT 'n/a'")
    st = eng.table("cust").state()
    assert st.schema.names == ["id", "name", "bal", "seg", "remark", "cnt"]
    assert st.schema.col("remark").default == "n/a"
    assert st.props.get("auto_compact") == "true"
    # CHANGE cannot retype (Kudu restriction)
    with pytest.raises(SchemaError, match="change column types"):
        eng.sql("ALTER TABLE cust CHANGE cnt cnt BIGINT")


def test_alter_rename_table(eng):
    eng.sql("CREATE TABLE rn (id BIGINT PRIMARY KEY, v INT) STORED AS KUDU")
    eng.sql("INSERT INTO rn VALUES (1, 2)")
    eng.sql("ALTER TABLE rn RENAME TO rn2")
    assert eng.sql("SELECT v FROM rn2").collect()[0].v == 2
    assert "rn" not in eng.list_tables()


def test_alter_range_partitions_via_sql(eng):
    eng.sql(CREATE)
    eng.sql("ALTER TABLE cust DROP RANGE PARTITION 200 <= VALUES")
    with pytest.raises(KuduSparkError):
        eng.sql("INSERT INTO cust (id, name) VALUES (300, 'z')")
    eng.sql("ALTER TABLE cust ADD RANGE PARTITION 200 <= VALUES < 400")
    eng.sql("INSERT INTO cust (id, name) VALUES (300, 'z')")
    assert eng.sql("SELECT count(*) AS n FROM cust").collect()[0].n == 1


def test_exclusive_lower_inclusive_upper_bounds(eng):
    eng.sql("""
        CREATE TABLE b (id BIGINT PRIMARY KEY)
        PARTITION BY RANGE (id) (PARTITION 0 < VALUES <= 10)
        STORED AS KUDU
    """)
    rs = eng.table("b").state().partition_spec.range_spec
    assert rs.ranges == [[1, 11]]  # successor-normalized to [lo, hi)


def test_ddl_dml_select_roundtrip(eng):
    """The full Impala workflow from the integration doc, SQL only."""
    eng.sql("CREATE TABLE my_first_table (id BIGINT PRIMARY KEY, name STRING) "
            "PARTITION BY HASH PARTITIONS 2 STORED AS KUDU")
    eng.sql('INSERT INTO my_first_table VALUES (99, "zoe")')
    eng.sql('INSERT INTO my_first_table VALUES (1, "alice"), (2, "bob"), (3, "carl")')
    eng.sql('UPDATE my_first_table SET name="bob2" where id = 3')
    eng.sql("DELETE FROM my_first_table WHERE id < 3")
    got = sorted(tuple(r) for r in eng.sql("SELECT * FROM my_first_table").collect())
    assert got == [(3, "bob2"), (99, "zoe")]


def test_show_tables_and_describe(eng):
    eng.sql(CREATE)
    assert [r.name for r in eng.sql("SHOW TABLES").collect()] == ["cust"]
    d = {r.name: r for r in eng.sql("DESCRIBE cust").collect()}
    assert d["id"].primary_key and not d["id"].nullable
    assert d["seg"].encoding == "PREFIX_ENCODING" and d["seg"].compression == "LZ4"
    assert d["bal"].default_value == "0.0"
    assert d["seg"].comment == "market segment"


def test_show_range_partitions(eng):
    eng.sql(CREATE)
    got = [r.range_partition for r in eng.sql("SHOW RANGE PARTITIONS cust").collect()]
    assert got == ["VALUES < 100", "100 <= VALUES < 200", "200 <= VALUES"]
    with pytest.raises(KuduSparkError, match="not range-partitioned"):
        eng.sql("CREATE TABLE nr (id BIGINT PRIMARY KEY) STORED AS KUDU")
        eng.sql("SHOW RANGE PARTITIONS nr")


def test_show_create_table_round_trips(eng):
    eng.sql(CREATE)
    stmt = eng.sql("SHOW CREATE TABLE cust").collect()[0].result
    eng2 = Engine(eng.spark, tempfile.mkdtemp(prefix="pyskudu-ddl2-"))
    eng2.sql(stmt)
    a, b = eng.table("cust").state(), eng2.table("cust").state()
    assert [c.to_json() for c in a.schema.columns] == [c.to_json() for c in b.schema.columns]
    assert a.schema.pk == b.schema.pk
    assert a.partition_spec.range_spec.ranges == b.partition_spec.range_spec.ranges
    assert [h.buckets for h in a.partition_spec.hash_dims] == \
           [h.buckets for h in b.partition_spec.hash_dims]
    assert a.props.get("auto_compact") == b.props.get("auto_compact")


def test_sql_script_multi_statement(eng):
    results = eng.sql_script("""
        -- a whole Impala session in one script
        CREATE TABLE s1 (id BIGINT PRIMARY KEY, v STRING)
          PARTITION BY HASH PARTITIONS 2 STORED AS KUDU;
        INSERT INTO s1 VALUES (1, 'a; b'), (2, 'c');
        UPDATE s1 SET v = concat(v, '!') WHERE id = 2;
        SELECT * FROM s1 ORDER BY id
    """)
    assert len(results) == 4
    assert [tuple(r) for r in results[-1].collect()] == [(1, "a; b"), (2, "c!")]


def test_cli_sql_command(eng, capsys, tmp_path):
    import json

    from kudu_spark.cli import main

    wh = eng.root
    assert main(["--warehouse", wh, "sql",
                 "CREATE TABLE c1 (id BIGINT PRIMARY KEY, v INT) STORED AS KUDU; "
                 "INSERT INTO c1 VALUES (1, 10), (2, 20); "
                 "SELECT * FROM c1 ORDER BY id"]) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert lines[-2:] == [{"id": 1, "v": 10}, {"id": 2, "v": 20}]
    script = tmp_path / "q.sql"
    script.write_text("SELECT count(*) AS n FROM c1")
    assert main(["--warehouse", wh, "sql", "--file", str(script)]) == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1]) == {"n": 2}


def test_sql_version_as_of(eng):
    eng.sql("CREATE TABLE tv (id BIGINT PRIMARY KEY, v INT) STORED AS KUDU")
    eng.sql("INSERT INTO tv VALUES (1, 10)")
    v1 = eng.table("tv").version
    eng.sql("UPDATE tv SET v = 99 WHERE id = 1")
    eng.sql("INSERT INTO tv VALUES (2, 20)")
    got = [tuple(r) for r in
           eng.sql(f"SELECT * FROM tv VERSION AS OF {v1} ORDER BY id").collect()]
    assert got == [(1, 10)]
    assert sorted(tuple(r) for r in eng.sql("SELECT * FROM tv").collect()) == [
        (1, 99), (2, 20)]
    # pinned and head reads of the SAME table in one statement need two
    # different snapshots — not supported by name-level pins, but a
    # self-join of past vs past works; and AS OF inside DML is rejected
    joined = eng.sql(
        f"SELECT a.id, a.v AS old_v FROM tv VERSION AS OF {v1} a").collect()
    assert [tuple(r) for r in joined] == [(1, 10)]
    import pytest as _pytest

    from kudu_spark.errors import KuduSparkError as _E
    with _pytest.raises(_E, match="read-only"):
        eng.sql(f"DELETE FROM tv WHERE id IN (SELECT id FROM tv VERSION AS OF {v1})")


def test_sql_timestamp_as_of(eng):
    import time

    eng.sql("CREATE TABLE ts1 (id BIGINT PRIMARY KEY) STORED AS KUDU")
    eng.sql("INSERT INTO ts1 VALUES (1)")
    time.sleep(1.1)
    mid_ms = int(time.time() * 1000)
    time.sleep(1.1)
    eng.sql("INSERT INTO ts1 VALUES (2)")
    got = [r.id for r in eng.sql(
        f"SELECT id FROM ts1 TIMESTAMP AS OF '{mid_ms}'").collect()]
    assert got == [1]
    # a string inside a literal must not be parsed as a pin
    r = eng.sql("SELECT 'x VERSION AS OF 1' AS s").collect()[0].s
    assert r == "x VERSION AS OF 1"


def test_stats_statements(eng):
    eng.sql("CREATE TABLE st (id BIGINT PRIMARY KEY, v INT) STORED AS KUDU")
    eng.sql("INSERT INTO st VALUES (1, 10), (2, NULL), (3, 10)")
    r = eng.sql("COMPUTE STATS st").collect()[0]
    assert r.num_rows == 3 and r.num_files >= 1
    r2 = eng.sql("SHOW TABLE STATS st").collect()[0]
    assert r2.num_rows == 3
    cols = {c.column: c for c in eng.sql("SHOW COLUMN STATS st").collect()}
    assert cols["id"].min == "1" and cols["id"].max == "3" and cols["id"].nulls == 0
    assert cols["v"].nulls == 1 and cols["v"].ndv == 1


def test_sql_transaction_block_atomic_commit(eng):
    eng.sql_script("""
        CREATE TABLE acct (id BIGINT PRIMARY KEY, bal BIGINT) STORED AS KUDU;
        CREATE TABLE audit (op_id BIGINT PRIMARY KEY, delta BIGINT) STORED AS KUDU;
        INSERT INTO acct VALUES (1, 100), (2, 50)
    """)
    v_acct = eng.table("acct").version
    results = eng.sql_script("""
        BEGIN;
        UPDATE acct SET bal = bal - 30 WHERE id = 1;
        UPDATE acct SET bal = bal + 30 WHERE id = 2;
        INSERT INTO audit VALUES (1, 30);
        COMMIT
    """)
    # staged rows report version -1; COMMIT reports the publish
    assert [r.collect()[0].version for r in results[:-1]] == [-1, -1, -1]
    commit_row = results[-1].collect()[0]
    assert commit_row.operation == "COMMIT" and "acct" in commit_row.table
    got = {r.id: r.bal for r in eng.sql("SELECT * FROM acct").collect()}
    assert got == {1: 70, 2: 80}
    assert eng.table("acct").version == v_acct + 1  # ONE atomic commit
    assert [tuple(r) for r in eng.sql("SELECT * FROM audit").collect()] == [(1, 30)]


def test_sql_transaction_rollback_and_no_read_your_writes(eng):
    eng.sql_script(
        "CREATE TABLE rb (id BIGINT PRIMARY KEY, v BIGINT) STORED AS KUDU;"
        "INSERT INTO rb VALUES (1, 10)")
    v0 = eng.table("rb").version
    results = eng.sql_script("""
        BEGIN;
        UPDATE rb SET v = 99 WHERE id = 1;
        SELECT v FROM rb WHERE id = 1;
        ROLLBACK;
        SELECT v FROM rb WHERE id = 1
    """)
    # the in-txn SELECT reads the pre-transaction snapshot
    assert results[1].collect()[0].v == 10
    assert results[2].collect()[0].v == 10
    assert eng.table("rb").version == v0  # nothing committed


def test_sql_transaction_open_block_rolls_back(eng):
    import pytest as _p

    eng.sql_script("CREATE TABLE ob (id BIGINT PRIMARY KEY) STORED AS KUDU")
    with _p.raises(KuduSparkError, match="open transaction"):
        eng.sql_script("BEGIN; INSERT INTO ob VALUES (1)")
    assert eng.sql("SELECT count(*) AS n FROM ob").collect()[0].n == 0


def test_sql_transaction_rejects_ddl_and_merge(eng):
    import pytest as _p

    eng.sql_script("CREATE TABLE tx1 (id BIGINT PRIMARY KEY) STORED AS KUDU")
    with _p.raises(KuduSparkError, match="DDL inside"):
        eng.sql_script("BEGIN; CREATE TABLE nope (id BIGINT PRIMARY KEY) "
                       "STORED AS KUDU; COMMIT")
    with _p.raises(KuduSparkError, match="MERGE inside"):
        eng.sql_script("BEGIN; MERGE INTO tx1 USING tx1 b ON tx1.id = b.id "
                       "WHEN MATCHED THEN DELETE; COMMIT")
