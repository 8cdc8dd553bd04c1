"""Incremental materialized aggregate view: refresh ≡ recompute,
time travel over refreshes, and the append-only contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from oxidsql_spark.matview import AggView
from oxidsql_spark.sources import dec2, table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _view(spark, tmp_path):
    return AggView(
        spark,
        str(tmp_path / "mv"),
        keys=["l_returnflag", "l_linestatus"],
        measures={"qty": F.col("l_quantity"), "price": dec2("l_extendedprice")},
    )


def test_refresh_chain_equals_full_recompute(spark, sf_dir, tmp_path):
    li = table(spark, sf_dir, "lineitem")
    view = _view(spark, tmp_path)
    view.create(li.filter(F.col("l_orderkey") % 3 == 0))
    view.refresh(li.filter(F.col("l_orderkey") % 3 == 1))
    view.refresh(li.filter(F.col("l_orderkey") % 3 == 2))

    full = AggView(
        spark,
        str(tmp_path / "mv_full"),
        keys=["l_returnflag", "l_linestatus"],
        measures={"qty": F.col("l_quantity"), "price": dec2("l_extendedprice")},
    )
    full.create(li)
    cols = sorted(view.read().columns)
    assert _rows(view.read().select(*cols)) == _rows(full.read().select(*cols))
    # three commits: create + 2 refreshes
    assert view.versions() == [1, 2, 3]


def test_time_travel_and_rebuild(spark, sf_dir, tmp_path):
    li = table(spark, sf_dir, "lineitem")
    view = _view(spark, tmp_path)
    base = li.filter(F.col("l_orderkey") % 2 == 0)
    view.create(base)
    v1_rows = _rows(view.read().drop("avg_qty", "avg_price"))
    view.refresh(li.filter(F.col("l_orderkey") % 2 == 1))
    # version 1 still readable and unchanged (snapshot isolation)
    assert _rows(view.read(1).drop("avg_qty", "avg_price")) == v1_rows
    # rebuild after a non-append mutation converges with a fresh create
    view.rebuild(base)
    assert _rows(view.read().drop("avg_qty", "avg_price")) == v1_rows


def test_avg_derived_from_partials(spark, sf_dir, tmp_path):
    li = table(spark, sf_dir, "lineitem")
    view = _view(spark, tmp_path)
    view.create(li)
    got = view.read().select("l_returnflag", "l_linestatus", "avg_qty")
    want = li.groupBy("l_returnflag", "l_linestatus").agg(
        (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty")
    )
    g = {(r[0], r[1]): r[2] for r in got.collect()}
    w = {(r[0], r[1]): r[2] for r in want.collect()}
    assert g.keys() == w.keys()
    for k in g:
        assert abs(g[k] - w[k]) < 1e-9
