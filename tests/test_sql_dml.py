"""SQL DML through Engine.sql — the Impala-on-Kudu write surface
(docs/kudu_impala_integration.adoc:665-731): INSERT/UPSERT/UPDATE/
DELETE with IGNORE variants, VALUES and SELECT sources, subqueries in
WHERE, old-value SET semantics, and the parser's quote/paren handling.
"""

from __future__ import annotations

import tempfile

import pytest

from kudu_spark.engine import Engine
from kudu_spark.errors import (
    DuplicateKeyError,
    ImmutableColumnError,
    KuduSparkError,
    SchemaError,
)


@pytest.fixture()
def eng(spark):
    return Engine(spark, tempfile.mkdtemp(prefix="pyskudu-dml-"))


@pytest.fixture()
def t(eng):
    t = eng.create_table(
        "people",
        [("id", "bigint", False), ("name", "string", True),
         ("age", "int", True), ("city", "string", True)],
        pk=["id"],
    )
    eng.sql("INSERT INTO people VALUES "
            "(1,'alice',30,'oslo'),(2,'bob',25,'rome'),(3,'carol',41,'lima')")
    return t


def rows(eng, q="SELECT * FROM people ORDER BY id"):
    return [tuple(r) for r in eng.sql(q).collect()]


def summary(df):
    r = df.collect()[0]
    return r.operation, r.rows_affected


def test_insert_values_and_summary(eng, t):
    op, n = summary(eng.sql("INSERT INTO people VALUES (4,'dave',33,'kyiv')"))
    assert (op, n) == ("INSERT", 1)
    assert rows(eng)[-1] == (4, "dave", 33, "kyiv")


def test_insert_column_list_fills_defaults(eng, t):
    eng.sql("INSERT INTO people (id, name) VALUES (10, 'erin')")
    assert rows(eng, "SELECT * FROM people WHERE id = 10") == [(10, "erin", None, None)]


def test_insert_duplicate_errors_ignore_skips(eng, t):
    with pytest.raises(DuplicateKeyError):
        eng.sql("INSERT INTO people VALUES (1,'dup',0,'x')")
    op, n = summary(eng.sql("INSERT IGNORE INTO people VALUES (1,'dup',0,'x'),(7,'gail',1,'y')"))
    assert (op, n) == ("INSERT", 1)  # only the fresh key lands
    assert rows(eng, "SELECT name FROM people WHERE id IN (1, 7) ORDER BY id") == [
        ("alice",), ("gail",)]


def test_insert_select_cross_table(eng, t):
    eng.create_table("adults", [("id", "bigint", False), ("name", "string", True)],
                     pk=["id"])
    op, n = summary(eng.sql(
        "INSERT INTO adults SELECT id, upper(name) FROM people WHERE age >= 30"))
    assert (op, n) == ("INSERT", 2)
    assert rows(eng, "SELECT * FROM adults ORDER BY id") == [(1, "ALICE"), (3, "CAROL")]


def test_upsert_mixes_new_and_existing(eng, t):
    op, n = summary(eng.sql("UPSERT INTO people VALUES "
                            "(2,'bob2',26,'rome'),(9,'zoe',18,'baku')"))
    assert (op, n) == ("UPSERT", 2)
    assert rows(eng, "SELECT name FROM people WHERE id IN (2, 9) ORDER BY id") == [
        ("bob2",), ("zoe",)]


def test_update_old_value_semantics(eng, t):
    # SET sees the pre-update row: swap-like updates are exact
    eng.sql("UPDATE people SET age = age + 1, name = concat(name, '-', age) "
            "WHERE id = 1")
    assert rows(eng, "SELECT name, age FROM people WHERE id = 1") == [("alice-30", 31)]


def test_update_without_where_hits_all(eng, t):
    op, n = summary(eng.sql("UPDATE people SET city = 'moved'"))
    assert (op, n) == ("UPDATE", 3)
    assert rows(eng, "SELECT DISTINCT city FROM people") == [("moved",)]


def test_update_where_subquery(eng, t):
    eng.create_table("vips", [("id", "bigint", False)], pk=["id"])
    eng.sql("INSERT INTO vips VALUES (2),(3)")
    op, n = summary(eng.sql(
        "UPDATE people SET city = 'vip' WHERE id IN (SELECT id FROM vips)"))
    assert (op, n) == ("UPDATE", 2)
    assert rows(eng, "SELECT id FROM people WHERE city = 'vip' ORDER BY id") == [(2,), (3,)]


def test_update_pk_rejected(eng, t):
    with pytest.raises(SchemaError, match="primary key"):
        eng.sql("UPDATE people SET id = 99 WHERE id = 1")


def test_update_immutable_column(eng):
    t = eng.create_table(
        "imm", [("id", "bigint", False), ("created", "string", True), ("v", "int", True)],
        pk=["id"], immutable_cols=["created"])
    eng.sql("INSERT INTO imm VALUES (1, 'x', 0)")
    with pytest.raises(ImmutableColumnError):
        eng.sql("UPDATE imm SET created = 'y' WHERE id = 1")
    eng.sql("UPDATE IGNORE imm SET created = 'y', v = 5 WHERE id = 1")
    assert [tuple(r) for r in eng.sql("SELECT * FROM imm").collect()] == [(1, "x", 5)]


def test_delete_where_and_all(eng, t):
    op, n = summary(eng.sql("DELETE FROM people WHERE age < 30"))
    assert (op, n) == ("DELETE", 1)
    assert [r[0] for r in rows(eng, "SELECT id FROM people ORDER BY id")] == [1, 3]
    op, n = summary(eng.sql("DELETE FROM people"))
    assert (op, n) == ("DELETE", 2)
    assert rows(eng) == []


def test_delete_zero_matches_is_noop_commit(eng, t):
    v0 = t.version
    op, n = summary(eng.sql("DELETE FROM people WHERE id = 12345"))
    assert (op, n) == ("DELETE", 0)
    assert eng.table("people").version == v0  # no empty commit


def test_strings_containing_keywords(eng, t):
    # a WHERE/comma/paren inside a literal must not confuse the parser
    eng.sql("INSERT INTO people VALUES (20, 'where, (values) -- not a comment', 1, ';')")
    eng.sql("UPDATE people SET name = 'set x = (1,2) where true' WHERE id = 20")
    assert rows(eng, "SELECT name, city FROM people WHERE id = 20") == [
        ("set x = (1,2) where true", ";")]
    op, n = summary(eng.sql("DELETE FROM people WHERE name LIKE '%where%'"))
    assert (op, n) == ("DELETE", 1)


def test_comments_and_semicolon(eng, t):
    eng.sql("-- add one\nINSERT INTO people /* inline */ VALUES (30,'zed',9,'q');")
    assert rows(eng, "SELECT id FROM people WHERE id = 30") == [(30,)]


def test_values_with_expressions(eng, t):
    eng.sql("INSERT INTO people VALUES (40, upper('mia'), 20 + 2, concat('a','b'))")
    assert rows(eng, "SELECT * FROM people WHERE id = 40") == [(40, "MIA", 22, "ab")]


def test_insert_width_mismatch(eng, t):
    with pytest.raises(SchemaError, match="column"):
        eng.sql("INSERT INTO people VALUES (50, 'short')")


def test_malformed_statements(eng, t):
    with pytest.raises(KuduSparkError):
        eng.sql("INSERT INTO people FROM somewhere")
    with pytest.raises(KuduSparkError):
        eng.sql("UPDATE people SET WHERE id = 1")


def test_dml_read_side_sees_merge_on_read(eng, t):
    # mutate through the Python API, then DML's WHERE must see the
    # merged state, not the base files
    from pyspark.sql import functions as F

    t.upsert(t.scan().where("id = 1").withColumn("age", F.lit(99)))
    op, n = summary(eng.sql("DELETE FROM people WHERE age = 99"))
    assert (op, n) == ("DELETE", 1)
    assert [r[0] for r in rows(eng, "SELECT id FROM people ORDER BY id")] == [2, 3]


# -- MERGE INTO ------------------------------------------------------------


@pytest.fixture()
def merge_tables(eng):
    eng.create_table(
        "tgt", [("id", "bigint", False), ("v", "int", True), ("tag", "string", True)],
        pk=["id"])
    eng.sql("INSERT INTO tgt VALUES (1,10,'a'),(2,20,'b'),(3,30,'c'),(4,40,'d')")
    eng.create_table("src", [("id", "bigint", False), ("nv", "int", True)], pk=["id"])
    eng.sql("INSERT INTO src VALUES (2,200),(3,-1),(5,500),(6,600)")
    return eng


def test_merge_clause_precedence_and_actions(merge_tables):
    eng = merge_tables
    r = eng.sql("""
        MERGE INTO tgt USING src ON tgt.id = src.id
        WHEN MATCHED AND src.nv < 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = src.nv + tgt.v
        WHEN NOT MATCHED AND src.nv >= 600 THEN INSERT (id, v, tag)
          VALUES (src.id, src.nv, 'merged')
    """).collect()[0]
    assert (r.operation, r.rows_affected) == ("MERGE", 3)  # 1 del + 1 upd + 1 ins
    got = sorted(tuple(x) for x in eng.sql("SELECT * FROM tgt").collect())
    # id 3 deleted (first clause wins), id 2 updated with OLD v, id 5
    # filtered by the NOT MATCHED condition, id 6 inserted
    assert got == [(1, 10, "a"), (2, 220, "b"), (4, 40, "d"), (6, 600, "merged")]


def test_merge_subquery_source_and_aliases(merge_tables):
    eng = merge_tables
    eng.sql("""
        MERGE INTO tgt AS tg
        USING (SELECT id * 2 AS id, nv FROM src WHERE nv > 0) sq ON tg.id = sq.id
        WHEN MATCHED THEN UPDATE SET v = sq.nv
        WHEN NOT MATCHED THEN INSERT VALUES (sq.id, sq.nv, 'sub')
    """)
    got = sorted(tuple(x) for x in eng.sql("SELECT * FROM tgt").collect())
    # doubled ids from src positives: (4,200) matches -> update with the
    # source value; (10,500), (12,600) are new -> inserted
    assert got == [(1, 10, "a"), (2, 20, "b"), (3, 30, "c"), (4, 200, "d"),
                   (10, 500, "sub"), (12, 600, "sub")]


def test_merge_cardinality_violation(merge_tables):
    eng = merge_tables
    eng.create_table("dupsrc", [("k", "bigint", False), ("id", "bigint", True)],
                     pk=["k"])
    eng.sql("INSERT INTO dupsrc VALUES (1, 2), (2, 2)")
    with pytest.raises(KuduSparkError, match="cardinality"):
        eng.sql("MERGE INTO tgt USING dupsrc ON tgt.id = dupsrc.id "
                "WHEN MATCHED THEN DELETE")


def test_merge_is_atomic_on_failure(merge_tables):
    eng = merge_tables
    before = sorted(tuple(x) for x in eng.sql("SELECT * FROM tgt").collect())
    v0 = eng.table("tgt").version
    with pytest.raises(Exception):
        eng.sql("MERGE INTO tgt USING src ON tgt.id = src.id "
                "WHEN MATCHED THEN UPDATE SET v = src.nv "
                "WHEN NOT MATCHED THEN INSERT VALUES (src.id, no_such_col, 'x')")
    assert sorted(tuple(x) for x in eng.sql("SELECT * FROM tgt").collect()) == before
    assert eng.table("tgt").version == v0  # staged files rolled back, no commit


def test_merge_is_one_commit(merge_tables):
    eng = merge_tables
    v0 = eng.table("tgt").version
    eng.sql("""
        MERGE INTO tgt USING src ON tgt.id = src.id
        WHEN MATCHED THEN UPDATE SET v = 0
        WHEN NOT MATCHED THEN INSERT VALUES (src.id, src.nv, 'new')
    """)
    assert eng.table("tgt").version == v0 + 1  # update + insert, one atomic commit


def test_merge_update_pk_rejected(merge_tables):
    eng = merge_tables
    with pytest.raises(SchemaError, match="primary key"):
        eng.sql("MERGE INTO tgt USING src ON tgt.id = src.id "
                "WHEN MATCHED THEN UPDATE SET id = src.id + 100")


def test_insert_overwrite_rejected(eng, t):
    with pytest.raises(KuduSparkError, match="INSERT OVERWRITE"):
        eng.sql("INSERT OVERWRITE people VALUES (1,'x',1,'y')")


def test_delete_join_form(eng, t):
    """The integration doc's own join-DELETE shape
    (kudu_impala_integration.adoc:713): DELETE c FROM t c, s WHERE."""
    eng.create_table("stock_symbols", [("symbol", "string", False)], pk=["symbol"])
    eng.sql("INSERT INTO stock_symbols VALUES ('alice'), ('carol')")
    op, n = summary(eng.sql(
        "DELETE c FROM people c, stock_symbols s WHERE c.name = s.symbol"))
    assert (op, n) == ("DELETE", 2)
    assert [r[0] for r in rows(eng, "SELECT id FROM people ORDER BY id")] == [2]


def test_delete_join_form_explicit_join(eng, t):
    eng.create_table("doomed", [("id", "bigint", False)], pk=["id"])
    eng.sql("INSERT INTO doomed VALUES (1), (3)")
    op, n = summary(eng.sql(
        "DELETE p FROM people p JOIN doomed d ON p.id = d.id WHERE p.age > 20"))
    assert (op, n) == ("DELETE", 2)
    assert [r[0] for r in rows(eng, "SELECT id FROM people")] == [2]


def test_update_join_form(eng, t):
    eng.create_table("raises", [("id", "bigint", False), ("amt", "int", True)],
                     pk=["id"])
    eng.sql("INSERT INTO raises VALUES (1, 5), (3, 7)")
    op, n = summary(eng.sql(
        "UPDATE p SET age = p.age + r.amt FROM people p JOIN raises r "
        "ON p.id = r.id WHERE r.amt > 0"))
    assert (op, n) == ("UPDATE", 2)
    assert rows(eng, "SELECT id, age FROM people ORDER BY id") == [
        (1, 35), (2, 25), (3, 48)]


def test_merge_clause_condition_with_lowercase_or(merge_tables):
    """A disjunctive clause condition must stay parenthesized against
    the NOT(prior-clause) precedence chain regardless of keyword case."""
    eng = merge_tables
    eng.sql("""
        MERGE INTO tgt USING src ON tgt.id = src.id
        WHEN MATCHED AND src.nv < 0 or src.nv > 500 THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = src.nv
    """)
    got = sorted(tuple(x) for x in eng.sql("SELECT * FROM tgt").collect())
    # id 3 (nv=-1) deleted via the disjunction; id 2 (nv=200) updated
    assert got == [(1, 10, "a"), (2, 200, "b"), (4, 40, "d")]


def test_upsert_partial_column_list_preserves_unset(eng, t):
    """Kudu's upsert leaves unset columns of an existing row untouched
    (tablet.cc ApplyUpsertAsUpdate); a partial column list must not
    clobber the other columns to NULL."""
    op, n = summary(eng.sql("UPSERT INTO people (id, name) VALUES "
                            "(1, 'alice2'), (8, 'hank')"))
    assert (op, n) == ("UPSERT", 2)
    # existing row: age/city preserved; new row: defaults (NULL)
    assert rows(eng, "SELECT * FROM people WHERE id IN (1, 8) ORDER BY id") == [
        (1, "alice2", 30, "oslo"), (8, "hank", None, None)]


def test_upsert_partial_column_list_uses_defaults_for_new(eng):
    eng.create_table(
        "dflt", [("id", "bigint", False), ("a", "int", True), ("b", "string", True)],
        pk=["id"], defaults={"a": 7})
    eng.sql("INSERT INTO dflt VALUES (1, 1, 'x')")
    eng.sql("UPSERT INTO dflt (id, b) VALUES (1, 'y'), (2, 'z')")
    got = [tuple(r) for r in eng.sql("SELECT * FROM dflt ORDER BY id").collect()]
    # row 1 keeps a=1; fresh row 2 takes the column default a=7
    assert got == [(1, 1, "y"), (2, 7, "z")]


def test_upsert_column_list_must_cover_pk(eng, t):
    with pytest.raises(SchemaError, match="primary key"):
        eng.sql("UPSERT INTO people (name, age) VALUES ('x', 1)")


def test_upsert_partial_in_txn_block(eng, t):
    eng.sql_script("""
        BEGIN;
        UPSERT INTO people (id, age) VALUES (2, 99);
        COMMIT
    """)
    assert rows(eng, "SELECT * FROM people WHERE id = 2") == [(2, "bob", 99, "rome")]


def test_update_join_cardinality_violation(eng, t):
    eng.create_table("dup_src", [("k", "bigint", False), ("id", "bigint", True),
                                 ("amt", "int", True)], pk=["k"])
    eng.sql("INSERT INTO dup_src VALUES (1, 1, 5), (2, 1, 7)")
    with pytest.raises(KuduSparkError, match="cardinality"):
        eng.sql("UPDATE p SET age = p.age + s.amt FROM people p JOIN dup_src s "
                "ON p.id = s.id")
    # and nothing was written
    assert rows(eng, "SELECT age FROM people WHERE id = 1") == [(30,)]
