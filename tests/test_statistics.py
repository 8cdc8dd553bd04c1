"""Statistics tests — mirrors the reference's seeded, bounded accuracy
assertions (counting_hyperloglog.rs:264-291 ±20%; bottomup.rs:523-606
sample-based cardinality estimation).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oxidsql_spark.sources import table
from oxidsql_spark.statistics import SAMPLE_SIZE, TableSample, exact_ndv, ndv_sketch


def test_selectivity_estimate_within_tolerance(spark, sf_dir):
    """The reference's estimator test shape (bottomup.rs:599-605: expect
    ~4/10 for id<5), scaled: estimate vs true selectivity on orders."""
    o = table(spark, sf_dir, "orders")
    ts = TableSample(o)
    true_sel = o.filter(F.col("o_totalprice") > 200000.0).count() / ts.base_count
    est_sel = ts.estimate_selectivity(F.col("o_totalprice") > 200000.0)
    assert abs(est_sel - true_sel) < 0.08, (est_sel, true_sel)


def test_cardinality_floor_rule(spark, sf_dir):
    """floor at base/(2*SAMPLE_SIZE) and 1 — bottomup.rs:159-161."""
    o = table(spark, sf_dir, "orders")
    ts = TableSample(o)
    # impossible predicate → floored, never 0
    est = ts.estimate_cardinality(F.col("o_totalprice") < -1.0)
    assert est == max(int(ts.base_count / (2 * SAMPLE_SIZE)), 1)


def test_ndv_sketch_accuracy(spark, sf_dir):
    """HLL++ ndv within the reference's own ±20% test bound
    (counting_hyperloglog.rs:264-291)."""
    li = table(spark, sf_dir, "lineitem")
    approx = ndv_sketch(li, "l_orderkey", "l_partkey")
    exact = exact_ndv(li, "l_orderkey", "l_partkey")
    for c in approx:
        assert abs(approx[c] - exact[c]) / exact[c] < 0.2, (c, approx[c], exact[c])


def test_sample_deterministic(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    a = TableSample(o).sample.select("o_orderkey").collect()
    b = TableSample(o).sample.select("o_orderkey").collect()
    assert [r.o_orderkey for r in a] == [r.o_orderkey for r in b]


def test_analyze_feeds_cbo_and_broadcast_choice(spark, sf_dir):
    """ANALYZE TABLE statistics must reach the optimizer (the CBO path
    that subsumes the reference's DPccp + sample estimator): the leaf
    rowCount equals the analyzed count, and a small managed table joins
    broadcast WITHOUT an explicit hint — size chosen from catalog stats,
    exactly how the 100 TB cluster decides build sides."""
    from oxidsql_spark.sources import table
    from oxidsql_spark.statistics import analyze_table

    for t in ("cbo_nation", "cbo_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    table(spark, sf_dir, "nation").write.saveAsTable("cbo_nation")
    table(spark, sf_dir, "lineitem").write.saveAsTable("cbo_lineitem")
    try:
        analyze_table(spark, "cbo_nation", ["n_nationkey", "n_name"])
        analyze_table(spark, "cbo_lineitem")

        n = spark.table("cbo_nation")
        stats = n._jdf.queryExecution().optimizedPlan().stats()
        assert stats.rowCount().isDefined()
        assert stats.rowCount().get() == 25

        li = spark.table("cbo_lineitem")
        j = li.join(n, li.l_suppkey == n.n_nationkey)  # no broadcast() hint
        plan = j._jdf.queryExecution().sparkPlan().toString()
        assert "BroadcastHashJoin" in plan
    finally:
        for t in ("cbo_nation", "cbo_lineitem"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
