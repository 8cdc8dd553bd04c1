"""MERGE INTO (upsert) rewrite tests."""

from __future__ import annotations

import pytest

from oxidsql_spark.database import AnalyzerError, OxidSparkDatabase


@pytest.fixture()
def db(spark):
    d = OxidSparkDatabase(spark)
    d.query("CREATE TABLE acct (id INT, bal INT, note VARCHAR(20))")
    for v in ["(1, 100, 'a')", "(2, 200, 'b')", "(3, 300, 'c')"]:
        d.query(f"INSERT INTO acct VALUES {v}")
    return d


def test_merge_upsert(db, spark):
    src = spark.createDataFrame(
        [(2, 25), (3, 35), (4, 45)], "id int, delta int"
    )
    db.merge(
        "acct", src, key="id",
        when_matched_set={"bal": "tgt.bal + src.delta"},
        when_not_matched_insert={"id": "src.id", "bal": "src.delta"},
    )
    rows = {r.id: (r.bal, r.note) for r in db.query("SELECT * FROM acct").collect()}
    assert rows[1] == (100, "a")       # untouched
    assert rows[2] == (225, "b")       # updated
    assert rows[3] == (335, "c")       # updated
    assert rows[4] == (45, None)       # inserted (missing cols → NULL)


def test_merge_no_insert(db, spark):
    src = spark.createDataFrame([(1, 1), (9, 9)], "id int, delta int")
    db.merge("acct", src, key="id", when_matched_set={"bal": "0"}, insert_unmatched=False)
    rows = {r.id: r.bal for r in db.query("SELECT * FROM acct").collect()}
    assert rows == {1: 0, 2: 200, 3: 300}  # 9 not inserted


def test_merge_unknown_table(db, spark):
    src = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(AnalyzerError, match="unknown table"):
        db.merge("nope", src, key="id")


def test_merge_null_target_key_row_untouched(db, spark):
    """A target row with a NULL merge key matches nothing (standard
    MERGE) and must be carried through UNCHANGED — not rewritten from
    the absent source side into an all-NULL row."""
    db.query("INSERT INTO acct VALUES (NULL, 999, 'n')")
    src = spark.createDataFrame([(2, 25)], "id int, delta int")
    db.merge("acct", src, key="id", when_matched_set={"bal": "tgt.bal + src.delta"})
    rows = {r.id: (r.bal, r.note) for r in db.query("SELECT * FROM acct").collect()}
    assert rows[None] == (999, "n")  # survived intact
    assert rows[2] == (225, "b")
    assert len(rows) == 4


def test_merge_null_source_key_inserts(db, spark):
    """A NULL source key matches nothing → insert branch."""
    src = spark.createDataFrame([(None, 7)], "id int, delta int")
    db.merge(
        "acct", src, key="id",
        when_not_matched_insert={"id": "src.id", "bal": "src.delta"},
    )
    rows = {r.id: r.bal for r in db.query("SELECT * FROM acct").collect()}
    assert rows[None] == 7 and len(rows) == 4


def test_merge_duplicate_source_keys_raise(db, spark):
    """Standard MERGE errors when one target row matches several source
    rows instead of silently fanning the target row out."""
    src = spark.createDataFrame([(2, 1), (2, 2)], "id int, delta int")
    with pytest.raises(AnalyzerError, match="duplicate"):
        db.merge("acct", src, key="id", when_matched_set={"bal": "src.delta"})


def test_merge_sql_statement(spark):
    """The SQL spelling of MERGE INTO: matched rows update via SET
    (addressing both sides), unmatched source rows insert via
    (cols) VALUES, and without a NOT MATCHED clause unmatched rows are
    dropped."""
    from oxidsql_spark.database import AnalyzerError, OxidSparkDatabase

    db = OxidSparkDatabase(spark)
    db.query("CREATE TABLE acct (id INT, bal INT, tag VARCHAR(8))")
    db.query("INSERT INTO acct VALUES (1, 100, 'a'), (2, 200, 'b')")
    db.query("CREATE TABLE delta (id INT, amt INT)")
    db.query("INSERT INTO delta VALUES (2, 50), (3, 7)")

    db.query(
        "MERGE INTO acct USING delta ON tgt.id = src.id "
        "WHEN MATCHED THEN UPDATE SET bal = tgt.bal + src.amt "
        "WHEN NOT MATCHED THEN INSERT (id, bal, tag) VALUES (src.id, src.amt, 'new')"
    )
    got = sorted((r.id, r.bal, r.tag) for r in db.query("SELECT * FROM acct").collect())
    assert got == [(1, 100, "a"), (2, 250, "b"), (3, 7, "new")]

    # subquery source + no NOT MATCHED clause: unmatched rows dropped
    db.query(
        "MERGE INTO acct USING (SELECT id, amt * 2 AS amt FROM delta) ON tgt.id = src.id "
        "WHEN MATCHED THEN UPDATE SET bal = src.amt"
    )
    got = sorted((r.id, r.bal) for r in db.query("SELECT * FROM acct").collect())
    assert got == [(1, 100), (2, 100), (3, 14)]

    # INSERT *: same-named source columns, NULL elsewhere
    db.query("CREATE TABLE delta2 (id INT, bal INT)")
    db.query("INSERT INTO delta2 VALUES (9, 5)")
    db.query("MERGE INTO acct USING delta2 ON tgt.id = src.id WHEN NOT MATCHED THEN INSERT *")
    row9 = db.query("SELECT * FROM acct WHERE id = 9").collect()[0]
    assert (row9.bal, row9.tag) == (5, None)

    with pytest.raises(AnalyzerError):  # non-equi ON rejected
        db.query("MERGE INTO acct USING delta ON tgt.id < src.id WHEN MATCHED THEN UPDATE SET bal = 0")
