"""UPDATE / DELETE / DROP — the reference's TODO list (README.md:51)
implemented as declarative rewrites."""

from __future__ import annotations

import pytest

from oxidsql_spark.database import AnalyzerError, OxidSparkDatabase


@pytest.fixture()
def db(spark):
    d = OxidSparkDatabase(spark)
    d.query("CREATE TABLE t (id INT, v VARCHAR(20), n INT)")
    for row in ["(1, 'a', 10)", "(2, 'b', 20)", "(3, 'c', 30)", "(4, 'd', NULL)"]:
        d.query(f"INSERT INTO t VALUES {row}")
    return d


def test_delete_where(db):
    db.query("DELETE FROM t WHERE n >= 20")
    assert sorted(r.id for r in db.query("SELECT id FROM t").collect()) == [1, 4]


def test_delete_all(db):
    db.query("DELETE FROM t")
    assert db.query("SELECT * FROM t").count() == 0


def test_update_where(db):
    db.query("UPDATE t SET n = n + 100, v = 'upd' WHERE id <= 2")
    rows = {r.id: (r.v, r.n) for r in db.query("SELECT id, v, n FROM t").collect()}
    assert rows[1] == ("upd", 110)
    assert rows[2] == ("upd", 120)
    assert rows[3] == ("c", 30)
    assert rows[4] == ("d", None)


def test_update_all_rows(db):
    db.query("UPDATE t SET n = 0")
    assert {r.n for r in db.query("SELECT n FROM t").collect()} == {0}


def test_update_unknown_column(db):
    with pytest.raises(AnalyzerError, match="unknown column"):
        db.query("UPDATE t SET nope = 1")


def test_drop_table(db):
    db.query("DROP TABLE t")
    with pytest.raises(AnalyzerError, match="unknown table"):
        db.query("DELETE FROM t")
    # name is reusable after drop
    db.query("CREATE TABLE t (x INT)")
    db.query("INSERT INTO t VALUES (7)")
    assert db.query("SELECT x FROM t").collect()[0].x == 7


def test_delete_update_with_subquery_predicates(db):
    """DELETE/UPDATE predicates may reference other tables via IN /
    EXISTS subqueries (Catalyst resolves subquery expressions inside the
    rewrite's filter) — the cross-table mutation shape the reference's
    AND-only WHERE grammar could never express."""
    db.query("CREATE TABLE facts (id INTEGER, v INTEGER)")
    for i in range(6):
        db.query(f"INSERT INTO facts VALUES ({i}, {i * 10})")
    db.query("CREATE TABLE bad_ids (id INTEGER)")
    for i in (1, 3):
        db.query(f"INSERT INTO bad_ids VALUES ({i})")

    db.query("DELETE FROM facts WHERE id IN (SELECT id FROM bad_ids)")
    assert sorted(r.id for r in db.query("SELECT id FROM facts").collect()) == [0, 2, 4, 5]
    db.query("DELETE FROM facts WHERE EXISTS (SELECT 1 FROM bad_ids b WHERE b.id = facts.id + 1)")
    assert sorted(r.id for r in db.query("SELECT id FROM facts").collect()) == [4, 5]
    db.query("INSERT INTO facts VALUES (0, 0)")
    db.query("INSERT INTO facts VALUES (2, 20)")

    db.query(
        "UPDATE facts SET v = -1 WHERE EXISTS (SELECT 1 FROM bad_ids b WHERE b.id = facts.id - 1)"
    )
    got = {r.id: r.v for r in db.query("SELECT id, v FROM facts").collect()}
    assert got == {0: 0, 2: -1, 4: -1, 5: 50}
    db.query("DROP TABLE facts")
    db.query("DROP TABLE bad_ids")
