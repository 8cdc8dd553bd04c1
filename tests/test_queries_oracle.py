"""Every registered query runs; every oracle'd query matches DuckDB —
the in-repo twin of the driver's t2 gate (at sf0.001 for speed).

Mirrors the reference's own end-to-end strategy (SURVEY §5: scan→print /
insert→scan round-trips), upgraded with a cross-engine oracle.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from oxidsql_spark.registry import load_all
from oxidsql_spark.sources import TABLES

from conftest import SF_DIR

pytestmark = pytest.mark.oracle

QUERIES = load_all()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def _vhash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    q = QUERIES[name]
    sdf = q.fn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    if q.oracle is None:
        # rows-only check for non-SQL-expressible ops; dedicated tests
        # assert their semantics elsewhere.
        assert srows is not None
        return
    res = duck.sql(q.oracle)
    orows = res.fetchall()
    ocols = [d[0] for d in res.description]
    assert len(srows) == len(orows), f"row count {len(srows)} != oracle {len(orows)}"
    assert sorted(sdf.columns) == sorted(ocols)
    assert _vhash(sdf.columns, srows) == _vhash(ocols, orows), "value hash mismatch"
