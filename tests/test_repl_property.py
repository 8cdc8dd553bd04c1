"""REPL surface test + hypothesis property test for the facade's
insert/select round-trip (the reference's seeded-random testing
discipline, sampling.rs:558-832, applied to the type boundary)."""

from __future__ import annotations

import subprocess
import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oxidsql_spark.database import OxidSparkDatabase

# -- REPL driven through its real surface (stdin → stdout) -----------------


def test_repl_end_to_end():
    script = """CREATE TABLE people (id INT, name VARCHAR(255), age INT);
INSERT INTO people VALUES (1, 'Elon', 20);
INSERT INTO people VALUES (2, 'Marty', NULL);
SELECT name FROM people WHERE age >= 18;
INSERT INTO people VALUES (3);
\\q
"""
    proc = subprocess.run(
        [sys.executable, "-m", "oxidsql_spark.repl"],
        input=script,
        capture_output=True,
        text=True,
        timeout=180,
        env={"SPARK_GRAFT_CPUS": "4", "PATH": "/usr/bin:/bin", "HOME": "/root",
             "JAVA_HOME": __import__("os").environ.get("JAVA_HOME", "")},
        cwd="/root/repo",
    )
    out = proc.stdout
    assert out.count("ok") >= 3  # create + 2 inserts
    assert "Elon" in out and "Marty" not in out.split("Elon")[1]  # filter worked
    assert "error: INSERT row has 1 values" in out  # arity error surfaced
    assert proc.returncode == 0


# -- property: any in-range values round-trip through insert+select --------

_names = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FFF, exclude_characters="'"),
    max_size=20,
)


@settings(derandomize=True, max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-(2**31), max_value=2**31 - 1),
            _names,
            st.one_of(st.none(), st.integers(min_value=-(2**15), max_value=2**15 - 1)),
        ),
        min_size=1,
        max_size=5,
    )
)
def test_insert_select_roundtrip(spark, rows):
    db = OxidSparkDatabase(spark)
    try:
        db.query("CREATE TABLE prop_t (i INT, s VARCHAR(30), sm SMALLINT)")
        for i, s, sm in rows:
            sm_lit = "NULL" if sm is None else str(sm)
            db.query(f"INSERT INTO prop_t VALUES ({i}, '{s}', {sm_lit})")
        # NULL-safe sort key: Python can't compare None to int directly.
        key = lambda t: (t[0], t[1], t[2] is None, t[2] or 0)
        got = sorted(
            ((r.i, r.s, r.sm) for r in db.query("SELECT i, s, sm FROM prop_t").collect()),
            key=key,
        )
        assert got == sorted(rows, key=key)
    finally:
        db.query("DROP TABLE prop_t")


def test_repl_durable_db_path(spark, tmp_path, monkeypatch):
    """REPL with a DB_PATH: statements persist across REPL sessions,
    like the reference's `oxidsql <path>`."""
    import io

    from oxidsql_spark import repl

    # keep the module from creating/stopping its own SparkSession
    monkeypatch.setattr(repl, "get_spark", lambda *a, **k: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)

    db_dir = str(tmp_path / "repl_db")
    out1 = io.StringIO()
    repl.run_repl(
        in_stream=io.StringIO(
            "CREATE TABLE t (i INT, s VARCHAR(10));\n"
            "INSERT INTO t VALUES (7, 'seven');\n\\q\n"
        ),
        out=out1,
        db_path=db_dir,
    )
    out2 = io.StringIO()
    repl.run_repl(
        in_stream=io.StringIO("SELECT i, s FROM t;\n\\q\n"), out=out2, db_path=db_dir
    )
    assert "seven" in out2.getvalue()


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_DML_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("insert"), st.integers(-100, 100)),
        st.tuples(st.just("delete_lt"), st.integers(-50, 50)),
        st.tuples(st.just("update_add"), st.integers(-10, 10)),
    ),
    min_size=1,
    max_size=6,
)


@settings(
    derandomize=True,
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_DML_OPS)
def test_facade_dml_matches_model(spark, ops):
    """Random INSERT/DELETE/UPDATE sequences through the SQL facade must
    match a dict model exactly, and online stats' rowcount must track
    without any ANALYZE/rebuild."""
    db = OxidSparkDatabase(spark)
    db.query("CREATE TABLE t_prop (id INT, v INT)")
    model: dict[int, int] = {}
    next_id = 0
    for op, arg in ops:
        if op == "insert":
            db.query(f"INSERT INTO t_prop VALUES ({next_id}, {arg})")
            model[next_id] = arg
            next_id += 1
        elif op == "delete_lt":
            db.query(f"DELETE FROM t_prop WHERE v < {arg}")
            model = {k: v for k, v in model.items() if not (v < arg)}
        else:
            db.query(f"UPDATE t_prop SET v = v + {arg} WHERE v >= 0")
            model = {k: (v + arg if v >= 0 else v) for k, v in model.items()}
        got = {r.id: r.v for r in db.query("SELECT id, v FROM t_prop").collect()}
        assert got == model, f"after {op}({arg})"
        assert db.stats("t_prop").rowcount == len(model)
    db.query("DROP TABLE t_prop")
