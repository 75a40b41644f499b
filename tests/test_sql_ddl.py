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


def test_alter_column_storage_attributes(eng, spark):
    """AlterColumn Encoding/Compression/BlockSize (client.h:1917; CLI
    column_set_* in tool_action_table.cc:2202-2216): the schema
    records the new attributes, SHOW CREATE round-trips them, and —
    Kudu's contract — files written AFTER the alter honor them while
    old files stay as written."""
    eng.sql(CREATE)
    eng.sql("INSERT INTO cust VALUES (1, 'a', 1.0, 'SEG', 1.00)")
    eng.sql("ALTER TABLE cust ALTER COLUMN name SET ENCODING PLAIN_ENCODING")
    eng.sql("ALTER TABLE cust ALTER COLUMN name SET COMPRESSION ZSTD")
    eng.sql("ALTER TABLE cust ALTER COLUMN name SET BLOCK_SIZE 65536")
    spec = eng.table("cust").state().schema.col("name")
    assert (spec.encoding, spec.compression, spec.block_size) == (
        "PLAIN_ENCODING", "ZSTD", 65536)
    show = eng.sql("SHOW CREATE TABLE cust").collect()[0][0]
    assert "ENCODING PLAIN_ENCODING" in show and "COMPRESSION ZSTD" in show
    # unknown column errors, as the reference's alter does
    with pytest.raises(SchemaError, match="no such column"):
        eng.sql("ALTER TABLE cust ALTER COLUMN nope SET ENCODING RLE")
    # a file written after the alter picks up the codec
    eng.sql("INSERT INTO cust VALUES (2, 'b', 2.0, 'SEG', 2.00)")
    t = eng.table("cust")
    import os

    import pyarrow.parquet as pq
    newest = max(
        (f for f in t.state().files), key=lambda f: f.seq
    )
    md = pq.ParquetFile(os.path.join(t.root, newest.path)).metadata
    idx = [md.schema.column(i).name for i in range(md.num_columns)].index("name")
    col = md.row_group(0).column(idx)
    assert col.compression == "ZSTD"
    assert "PLAIN_DICTIONARY" not in str(col.encodings) and "RLE_DICTIONARY" not in str(col.encodings)


def test_table_comment_roundtrip(eng):
    """Table-level comments: CREATE ... COMMENT 'x' (Impala grammar),
    COMMENT ON TABLE t IS 'y' | NULL (≈ kudu table set_comment /
    clear_comment), SHOW CREATE renders the clause and round-trips."""
    eng.sql("""
        CREATE TABLE cm (id BIGINT PRIMARY KEY, v INT)
        PARTITION BY HASH (id) PARTITIONS 2
        COMMENT 'it''s a table'
        STORED AS KUDU
    """)
    assert eng.table("cm").state().props.get("comment") == "it's a table"
    show = eng.sql("SHOW CREATE TABLE cm").collect()[0][0]
    assert "COMMENT 'it''s a table'" in show
    assert "'comment'" not in show  # rendered as a clause, not a property
    eng.sql("COMMENT ON TABLE cm IS 'replaced'")
    assert eng.table("cm").state().props.get("comment") == "replaced"
    eng.sql("COMMENT ON TABLE cm IS NULL")
    show = eng.sql("SHOW CREATE TABLE cm").collect()[0][0]
    assert "COMMENT" not in show
    # the regenerated DDL runs verbatim (round-trip)
    eng.sql("COMMENT ON TABLE cm IS 'again'")
    show = eng.sql("SHOW CREATE TABLE cm").collect()[0][0]
    eng.sql(show.replace("CREATE TABLE cm", "CREATE TABLE cm2", 1))
    assert eng.table("cm2").state().props.get("comment") == "again"


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


def test_sql_transaction_rejects_ddl(eng):
    import pytest as _p

    eng.sql_script("CREATE TABLE tx1 (id BIGINT PRIMARY KEY) STORED AS KUDU")
    with _p.raises(KuduSparkError, match="DDL inside"):
        eng.sql_script("BEGIN; CREATE TABLE nope (id BIGINT PRIMARY KEY) "
                       "STORED AS KUDU; COMMIT")


def test_sql_transaction_merge_in_block(eng):
    """MERGE between BEGIN/COMMIT stages into the block's transaction
    and publishes atomically with the other statements — the target
    table's version advances ONCE for the whole block (Kudu txns cover
    arbitrary row ops, client.h:445-545)."""
    eng.sql_script("""
        CREATE TABLE mtx (id BIGINT PRIMARY KEY, v BIGINT) STORED AS KUDU;
        CREATE TABLE mtx_log (op_id BIGINT PRIMARY KEY, note STRING) STORED AS KUDU;
        CREATE TABLE msrc (id BIGINT PRIMARY KEY, v BIGINT) STORED AS KUDU;
        INSERT INTO mtx VALUES (1, 10), (2, 20);
        INSERT INTO msrc VALUES (2, 99), (3, 33)
    """)
    v0 = eng.table("mtx").version
    results = eng.sql_script("""
        BEGIN;
        MERGE INTO mtx USING msrc ON mtx.id = msrc.id
          WHEN MATCHED THEN UPDATE SET v = msrc.v
          WHEN NOT MATCHED THEN INSERT VALUES (msrc.id, msrc.v);
        INSERT INTO mtx_log VALUES (1, 'merged');
        COMMIT
    """)
    merge_row = results[-3].collect()[0]
    assert merge_row.operation == "MERGE" and merge_row.rows_affected == 2
    assert merge_row.version == -1  # staged, not yet published
    got = {r.id: r.v for r in eng.sql("SELECT * FROM mtx").collect()}
    assert got == {1: 10, 2: 99, 3: 33}
    assert eng.table("mtx").version == v0 + 1  # ONE atomic commit
    assert eng.sql("SELECT count(*) AS n FROM mtx_log").collect()[0].n == 1


def test_sql_transaction_merge_rollback(eng):
    eng.sql_script("""
        CREATE TABLE mrb (id BIGINT PRIMARY KEY, v BIGINT) STORED AS KUDU;
        INSERT INTO mrb VALUES (1, 10)
    """)
    v0 = eng.table("mrb").version
    eng.sql_script("""
        BEGIN;
        MERGE INTO mrb USING (SELECT 1 AS id, 77 AS v) s ON mrb.id = s.id
          WHEN MATCHED THEN UPDATE SET v = s.v;
        ROLLBACK
    """)
    assert eng.table("mrb").version == v0
    assert eng.sql("SELECT v FROM mrb").collect()[0].v == 10


def test_sql_timestamp_as_of_before_history_raises(eng):
    eng.sql("CREATE TABLE ts2 (id BIGINT PRIMARY KEY) STORED AS KUDU")
    eng.sql("INSERT INTO ts2 VALUES (1)")
    import pytest as _p
    with _p.raises(KuduSparkError, match="precedes"):
        eng.sql("SELECT * FROM ts2 TIMESTAMP AS OF '2000-01-01T00:00:00'")


def test_alter_add_range_overlap_rejected(eng):
    eng.sql("""CREATE TABLE rov (id BIGINT PRIMARY KEY)
               PARTITION BY RANGE (id) (
                 PARTITION 0 <= VALUES < 10, PARTITION 10 <= VALUES < 20)
               STORED AS KUDU""")
    import pytest as _p
    with _p.raises(KuduSparkError, match="overlap"):
        eng.sql("ALTER TABLE rov ADD RANGE PARTITION 5 <= VALUES < 15")
    # IF NOT EXISTS suppresses ONLY exact duplicates, not overlaps
    eng.sql("ALTER TABLE rov ADD IF NOT EXISTS RANGE PARTITION 0 <= VALUES < 10")
    with _p.raises(KuduSparkError, match="overlap"):
        eng.sql("ALTER TABLE rov ADD IF NOT EXISTS RANGE PARTITION 5 <= VALUES < 15")
    rs = eng.table("rov").state().partition_spec.range_spec
    assert len(rs.ranges) == 2  # no duplicate appended either


def test_show_create_table_escapes_quotes(eng):
    eng.create_table(
        "qt", [("id", "bigint", False), ("s", "string", True)], pk=["id"],
        defaults={"s": "it's"})
    eng.alter_table("qt").set_column_comment("s", "don't").set_property(
        "note", "o'brien").apply()
    stmt = eng.sql("SHOW CREATE TABLE qt").collect()[0].result
    assert "it''s" in stmt and "don''t" in stmt and "o''brien" in stmt
    # the statement round-trips through run_ddl to an equivalent table
    eng2 = Engine(eng.spark, tempfile.mkdtemp(prefix="pyskudu-sct-"))
    eng2.sql(stmt)
    st2 = eng2.table("qt").state()
    assert st2.schema.col("s").default == "it's"
    assert st2.schema.col("s").comment == "don't"
    assert st2.props.get("note") == "o'brien"


def test_show_column_stats_footer_path(eng):
    """A clean table serves min/max/null-count from parquet footers
    (no data scan for those); a dirty table falls back to the scan."""
    from kudu_spark.sql_ddl import _column_stats_from_footers

    eng.sql("CREATE TABLE fs (id BIGINT PRIMARY KEY, v INT, s STRING) STORED AS KUDU")
    eng.sql("INSERT INTO fs VALUES (1, 10, 'aa'), (2, NULL, 'zz'), (3, 7, NULL)")
    t = eng.table("fs")
    footer = _column_stats_from_footers(t, t.state())
    assert footer is not None  # clean: footers suffice
    assert footer["id"] == [1, 3, 0]
    assert footer["v"] == [7, 10, 1]
    assert footer["s"] == ["aa", "zz", 1]
    cols = {c.column: c for c in eng.sql("SHOW COLUMN STATS fs").collect()}
    assert cols["v"].min == "7" and cols["v"].max == "10" and cols["v"].nulls == 1
    # dirty (delta present): footer path declines, scan path agrees
    eng.sql("UPDATE fs SET v = 99 WHERE id = 1")
    t = eng.table("fs")
    assert _column_stats_from_footers(t, t.state()) is None
    cols = {c.column: c for c in eng.sql("SHOW COLUMN STATS fs").collect()}
    assert cols["v"].min == "7" and cols["v"].max == "99"


# -- DDL round-trip property fuzz (the DDL twin of
#    test_sql_parser_props): random schemas / partition specs /
#    properties with adversarial literals -> show_create_table ->
#    run_ddl in a fresh warehouse -> state equivalence ---------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as hst

_ADV = hst.sampled_from([
    "plain", "it's", "a''b", "x -- y", "/* z */", "semi;colon",
    "where WHERE", "O'Brien -- note", "tuple (1,2)",
])
_TYPES = ["bigint", "int", "string", "double", "boolean", "decimal(12,2)"]


@hst.composite
def _table_spec(draw):
    ncols = draw(hst.integers(2, 5))
    names = [f"c{i}" for i in range(ncols)]
    types = [draw(hst.sampled_from(_TYPES)) for _ in range(ncols)]
    types[0] = draw(hst.sampled_from(["bigint", "int"]))
    npk = draw(hst.integers(1, min(2, ncols)))
    pk = names[:npk]
    cols = []
    for n, t in zip(names, types):
        default = None
        if n not in pk and draw(hst.booleans()):
            if t == "string":
                default = draw(_ADV)
            elif t in ("bigint", "int"):
                default = draw(hst.integers(-5, 5))
            elif t == "double":
                default = 0.5
            elif t == "boolean":
                default = draw(hst.booleans())
        comment = draw(hst.one_of(hst.none(), _ADV))
        nullable = n not in pk and draw(hst.booleans())
        cols.append((n, t, nullable, default, comment))
    hash_parts = None
    if draw(hst.booleans()):
        hash_parts = [{"columns": [draw(hst.sampled_from(pk))],
                       "buckets": draw(hst.integers(2, 4))}]
    range_part = None
    if draw(hst.booleans()):
        cuts = sorted(draw(hst.sets(hst.integers(-100, 100), min_size=1, max_size=3)))
        edges = [None, *cuts, None]
        ranges = [[edges[i], edges[i + 1]] for i in range(len(edges) - 1)]
        range_part = {"column": names[0], "ranges": ranges}
    props = {k: draw(_ADV) for k in draw(
        hst.sets(hst.sampled_from(["note", "owner", "k'1"]), max_size=2))}
    return {"cols": cols, "pk": pk, "hash": hash_parts, "range": range_part,
            "props": props}


def _canon_state(st):
    rs = st.partition_spec.range_spec
    return {
        "cols": [(c.name, c.type.lower(), bool(c.nullable), c.default,
                  c.comment or None) for c in st.schema.columns],
        "pk": list(st.schema.pk),
        "hash": [(tuple(h.columns), h.buckets)
                 for h in st.partition_spec.hash_dims],
        "ranges": ([list(r) for r in rs.ranges], rs.cols) if rs.enabled else None,
        "props": {k: str(v) for k, v in st.props.items()
                  if not k.startswith("_")},
    }


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(spec=_table_spec())
def test_ddl_roundtrip_property_fuzz(spark, spec):
    import uuid as _uuid

    from kudu_spark.sql_ddl import show_create_table

    eng = Engine(spark, tempfile.mkdtemp(prefix="pyskudu-rt-"))
    name = f"t{_uuid.uuid4().hex[:10]}"
    eng.create_table(
        name,
        [(n, t, nl) for n, t, nl, _d, _c in spec["cols"]],
        pk=spec["pk"],
        hash_partitions=spec["hash"],
        range_partition=spec["range"],
        defaults={n: d for n, _t, _nl, d, _c in spec["cols"] if d is not None},
    )
    al = eng.alter_table(name)
    dirty = False
    for n, _t, _nl, _d, cmt in spec["cols"]:
        if cmt is not None:
            al.set_column_comment(n, cmt)
            dirty = True
    for k, v in spec["props"].items():
        al.set_property(k, v)
        dirty = True
    if dirty:
        al.apply()
    stmt = show_create_table(eng, name)
    eng2 = Engine(spark, tempfile.mkdtemp(prefix="pyskudu-rt2-"))
    eng2.sql(stmt)
    got, want = _canon_state(eng2.table(name).state()), _canon_state(eng.table(name).state())
    assert got == want, f"round-trip drift for:\n{stmt}\n{got}\nvs\n{want}"


def test_impala_doc_statements_verbatim(eng):
    """Statements lifted verbatim from the reference's Impala guide
    (docs/kudu_impala_integration.adoc:155-163,610,617,702,709) run
    through the router unchanged — including double-quoted string
    literals and the CREATE shape with a trailing PRIMARY KEY clause."""
    eng.sql_script("""
CREATE TABLE my_first_table
(
  id BIGINT,
  name STRING,
  PRIMARY KEY(id)
)
PARTITION BY HASH PARTITIONS 16
STORED AS KUDU;
INSERT INTO my_first_table VALUES (99, "sarah");
INSERT INTO my_first_table VALUES (1, "john"), (2, "jane"), (3, "jim");
UPDATE my_first_table SET name="bob" where id > 10;
DELETE FROM my_first_table WHERE id < 3;
""")
    got = {r.id: r.name for r in eng.sql(
        "SELECT id, name FROM my_first_table").collect()}
    assert got == {3: "jim", 99: "bob"}


def test_use_database_and_qualified_names(eng):
    """`USE <db>` + `<db>.<table>` qualifiers map onto the warehouse's
    single database (VERDICT r7 task #6; the Impala catalog spelling,
    kudu_impala_integration.adoc:150-343)."""
    eng.sql("CREATE TABLE qt (id BIGINT PRIMARY KEY, v STRING) STORED AS KUDU")
    assert eng.sql("SHOW DATABASES").collect()[0].name == "default"
    eng.sql("USE default")
    eng.sql("INSERT INTO default.qt VALUES (1, 'a'), (2, 'b')")
    assert eng.sql("SELECT count(*) AS n FROM default.qt").collect()[0].n == 2
    eng.sql("UPDATE default.qt SET v = 'z' WHERE id = 2")
    got = {r.id: r.v for r in eng.sql("SELECT id, v FROM qt").collect()}
    assert got == {1: "a", 2: "z"}
    # a string literal containing 'default.qt' must NOT be rewritten
    s = eng.sql("SELECT 'default.qt' AS s").collect()[0].s
    assert s == "default.qt"
    with pytest.raises(KuduSparkError):
        eng.sql("USE some_other_db")


def test_use_default_keeps_configured_database(spark):
    """VERDICT r8 task #5: `USE default` on an engine configured with
    a custom database name must not break the configured name's
    qualified references — Impala keeps fully-qualified names working
    regardless of the current database."""
    eng = Engine(spark, tempfile.mkdtemp(prefix="pyskudu-db-"),
                 database="analytics")
    eng.sql("CREATE TABLE t (id BIGINT PRIMARY KEY, v STRING) STORED AS KUDU")
    eng.sql("INSERT INTO analytics.t VALUES (1, 'a')")
    dbs = {r.name for r in eng.sql("SHOW DATABASES").collect()}
    assert dbs == {"analytics", "default"}
    eng.sql("USE default")
    assert eng.sql("SELECT count(*) AS n FROM analytics.t").collect()[0].n == 1
    eng.sql("USE analytics")
    assert eng.sql("SELECT count(*) AS n FROM default.t").collect()[0].n == 1
    with pytest.raises(KuduSparkError):
        eng.sql("USE warehouse2")


def test_set_replication_factor(eng):
    """`kudu table set_replication_factor` parity (VERDICT r8 task #7,
    tools/tool_action_table.cc:2278): stored as table metadata,
    surfaced in statistics + SHOW CREATE TABLE, validated like the
    master (catalog_manager.cc:586-605 — bounds, odd-only)."""
    eng.sql("CREATE TABLE rt (id BIGINT PRIMARY KEY, v STRING) STORED AS KUDU")
    eng.set_replication_factor("rt", 5)
    assert eng.table("rt").statistics()["replication_factor"] == 5
    ddl = eng.sql("SHOW CREATE TABLE rt").collect()[0].result
    assert "replication_factor" in ddl and "5" in ddl
    with pytest.raises(KuduSparkError):
        eng.set_replication_factor("rt", 4)  # even needs allow_unsafe
    eng.set_replication_factor("rt", 4, allow_unsafe=True)
    assert eng.table("rt").statistics()["replication_factor"] == 4
    with pytest.raises(KuduSparkError):
        eng.set_replication_factor("rt", 9)  # above max_num_replicas
    with pytest.raises(KuduSparkError):
        eng.set_replication_factor("rt", 0)
    with pytest.raises(KuduSparkError):
        eng.set_replication_factor("rt", "three")


def test_explain_statements(eng):
    """EXPLAIN plans without executing (VERDICT r7 task #6)."""
    eng.sql("CREATE TABLE ex (id BIGINT PRIMARY KEY, v STRING) "
            "PARTITION BY HASH (id) PARTITIONS 4 STORED AS KUDU")
    eng.sql("INSERT INTO ex VALUES (1, 'a')")
    plan = eng.sql("EXPLAIN SELECT v, count(*) AS n FROM ex GROUP BY v") \
        .collect()[0].plan
    assert "Aggregate" in plan or "HashAggregate" in plan
    plan2 = eng.sql("EXPLAIN FORMATTED SELECT * FROM default.ex WHERE id = 1") \
        .collect()[0].plan
    assert "Scan" in plan2 or "Filter" in plan2
    dml_plan = eng.sql("EXPLAIN INSERT INTO ex VALUES (5, 'x')") \
        .collect()[0].plan
    assert "INSERT target=ex" in dml_plan and "hash(id) buckets=4" in dml_plan
    # DDL/SHOW explain as catalog statements (Impala explains DDL too)
    ddl_plan = eng.sql(
        "EXPLAIN ALTER TABLE ex SET TBLPROPERTIES ('k' = 'v')").collect()[0].plan
    assert "catalog statement" in ddl_plan and "commit-log" in ddl_plan
    show_plan = eng.sql("EXPLAIN SHOW TABLE STATS ex").collect()[0].plan
    assert "metadata" in show_plan
    # EXPLAIN must not have executed anything
    assert eng.table("ex").scan().count() == 1
    assert "k" not in eng.table("ex").state().props


def test_column_stats_formatting_clean_vs_dirty(eng):
    """ADVICE r7: footer-served (clean) and scan-served (dirty) SHOW
    COLUMN STATS must render identical min/max text for FLOAT (float32
    widening) and large DOUBLE values."""
    eng.sql("CREATE TABLE fstats (id BIGINT PRIMARY KEY, f FLOAT, d DOUBLE) "
            "STORED AS KUDU")
    eng.sql("INSERT INTO fstats VALUES (1, CAST(0.1 AS FLOAT), 1e20), "
            "(2, CAST(2.5 AS FLOAT), 2.0)")
    clean = {c.column: (c.min, c.max)
             for c in eng.sql("SHOW COLUMN STATS fstats").collect()}
    # a same-value update dirties the table without changing content,
    # flipping SHOW COLUMN STATS onto the aggregate-scan path
    eng.sql("UPDATE fstats SET d = 2.0 WHERE id = 2")
    dirty = {c.column: (c.min, c.max)
             for c in eng.sql("SHOW COLUMN STATS fstats").collect()}
    assert clean["f"] == dirty["f"], (clean["f"], dirty["f"])
    assert clean["d"] == dirty["d"], (clean["d"], dirty["d"])


@settings(max_examples=200, deadline=None)
@given(hst.lists(
    hst.one_of(
        # code segments that may carry db qualifiers
        hst.sampled_from([
            "SELECT x FROM default.t", "default.t2", "DEFAULT . t3",
            "JOIN default.`q`", "WHERE a=1", "mydefault.t", "defaultx.t",
            "t.default_col",
        ]),
        # single-quoted literals ('' = escaped quote) that must
        # survive byte-identical
        hst.sampled_from([
            "'default.t'", "'it''s default.x'", "''", "'USE default'",
        ]),
    ),
    min_size=1, max_size=8,
))
def test_strip_db_qualifiers_fuzz(parts):
    """Property: `default.` qualifiers are stripped outside string
    literals only; quoted segments are byte-identical; unknown or
    suffixed databases pass through; the rewrite is idempotent."""
    from kudu_spark.engine import Engine

    eng = Engine.__new__(Engine)
    eng.database = "default"
    eng._databases = ["default"]
    text = " ".join(parts)
    out = eng._strip_db_qualifiers(text)
    # idempotent
    assert eng._strip_db_qualifiers(out) == out
    # quoted literals untouched, in order
    import re
    lits = re.findall(r"'(?:[^']|'')*'", text)
    assert re.findall(r"'(?:[^']|'')*'", out) == lits
    # outside quotes: no `default.` qualifier survives, and non-matching
    # prefixes do survive
    code = "".join(re.split(r"'(?:[^']|'')*'", out))
    assert not re.search(r"\bdefault\s*\.", code, re.IGNORECASE)
    if any(p == "mydefault.t" for p in parts):
        assert "mydefault.t" in out
    if any(p == "defaultx.t" for p in parts):
        assert "defaultx.t" in out
    if any(p == "t.default_col" for p in parts):
        assert "t.default_col" in out


def test_alter_set_owner_sql(eng):
    """Impala's ALTER TABLE ... SET OWNER [USER] 'name' maps to
    Engine.set_owner (client.h:1936)."""
    eng.sql("CREATE TABLE ow (k BIGINT NOT NULL, PRIMARY KEY (k)) "
            "STORED AS KUDU")
    eng.sql("ALTER TABLE ow SET OWNER USER 'data-eng'")
    assert eng.table("ow").statistics()["owner"] == "data-eng"
    eng.sql("ALTER TABLE ow SET OWNER bob")
    assert eng.table("ow").statistics()["owner"] == "bob"
    row = eng.sql("SHOW TABLE STATS ow").collect()[0]
    assert row.owner == "bob"
