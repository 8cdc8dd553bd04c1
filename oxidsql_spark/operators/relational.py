"""Relational operators — the reference's entire physical algebra plus the
extensions its README TODO-lists.

Reference parity (src/execution/plan.rs:29-68 — the full enum):
  Tablescan  -> spark.read.parquet leaf            (ref_scan)
  Selection  -> df.filter with AND-composed compares (ref_filter)
  Projection -> df.select                           (ref_project)
  HashJoin   -> df.join(..., 'inner'); Catalyst picks broadcast/SMJ/SHJ
                (ref_join / ref_multijoin) — and unlike the reference's
                probe loop (volcano_style.rs:222-229) duplicates are kept.
  InlineTable-> spark.createDataFrame VALUES        (ref_values)
  Print      -> the returned DataFrame (driver collects)
  Insert/CreateTable -> database.py facade

Extensions (reference README.md:44-55 TODO list — GROUP BY, ORDER BY,
LIMIT, expressions, set ops, subqueries — all absent there, first-class
here): tpch_q*-style agg/join pipelines, rollup/cube, window functions,
semi/anti/outer joins, set operations, scalar functions.

Scale notes (100 TB design intent, verified via .explain on local[32]):
* Every filter is a plain Column predicate -> Catalyst pushes it into the
  parquet scan (PushedFilters) and prunes columns (ReadSchema).
* Dimension joins (region/nation/supplier) are broadcast — no shuffle of
  the fact table for them; fact-fact joins (orders⋈lineitem) shuffle on
  the join key and AQE handles skew.
* Aggregates are expressed as groupBy().agg() -> partial (map-side)
  aggregation before the exchange; sums use DECIMAL(18,2) so results are
  independent of partial-agg order (bit-stable under re-partitioning).
* Top-k = orderBy().limit(k) -> Spark's TakeOrderedAndProject: per
  partition heap + driver merge, no global sort at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..sources import dbl, money, table


def _avg(sum_col: F.Column, n_col: F.Column) -> F.Column:
    """Engine-stable mean: exact decimal sum -> double, / exact count."""
    return F.round(dbl(sum_col) / n_col, 6)


# ---------------------------------------------------------------------------
# Reference parity — the 8-operator surface
# ---------------------------------------------------------------------------


@register("ref_scan", oracle="SELECT r_regionkey, r_name FROM region")
def ref_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tablescan (plan.rs:30-32): full scan, no predicate."""
    return table(spark, sf_dir, "region").select("r_regionkey", "r_name")


@register(
    "ref_filter",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_acctbal >= 1000.0 AND c_acctbal < 9000.0 AND c_mktsegment = 'BUILDING'
    """,
)
def ref_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selection (plan.rs:33-36): AND-composed col-vs-literal compares —
    the reference's exact executable predicate surface
    (analyzer/mod.rs:112-123). Pushed to the parquet scan by Catalyst."""
    c = table(spark, sf_dir, "customer")
    return c.filter(
        (F.col("c_acctbal") >= 1000.0)
        & (F.col("c_acctbal") < 9000.0)
        & (F.col("c_mktsegment") == "BUILDING")
    ).select("c_custkey", "c_name", "c_acctbal")


@register("ref_project", oracle="SELECT p_partkey, p_name, p_brand FROM part")
def ref_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection (plan.rs:37-40): column subset; parquet reads only these
    columns (ReadSchema pruning — the planner-level pruning the reference
    only has at its storage API, tuple.rs:43-121)."""
    return table(spark, sf_dir, "part").select("p_partkey", "p_name", "p_brand")


@register(
    "ref_join",
    oracle="""
    SELECT n.n_nationkey, n.n_name, r.r_name
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def ref_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HashJoin (plan.rs:41-51): inner equi-join. The 5-row region side is
    broadcast — the distributed analogue of the reference's
    build-smaller-side rule (optimizer.rs:174-180), minus the shuffle."""
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "inner").select(
        "n_nationkey", "n_name", "r_name"
    )


@register(
    "ref_multijoin",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name, r.r_name
    FROM customer c, nation n, region r
    WHERE c.c_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
      AND r.r_name = 'ASIA' AND c.c_acctbal > 0.0
    """,
)
def ref_multijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship query shape (database.rs:47-91): implicit
    multi-table FROM + AND-connected WHERE mixing selections and equi-join
    predicates. Catalyst's join reorder (CBO) is the twin of the
    reference's DPccp (optimizer.rs:60-104)."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.filter(F.col("c_acctbal") > 0.0)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


@register(
    "ref_values",
    oracle="""
    SELECT * FROM (VALUES (1, 'Tesla Model 3'), (2, 'DeLorean DMC-12')) AS t(id, model)
    """,
)
def ref_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InlineTable (plan.rs:58-60): constant relation from literal rows —
    the VALUES source behind the reference's INSERT."""
    from ..functions import local_rows_df

    return local_rows_df(
        spark, [(1, "Tesla Model 3"), (2, "DeLorean DMC-12")], "id int, model string"
    )


# ---------------------------------------------------------------------------
# Aggregation (reference TODO README.md:51 — "GROUP BY/HAVING")
# ---------------------------------------------------------------------------


@register(
    "tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price,
           round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary (TPC-H Q1 shape): scan -> pushed filter -> hash agg
    with map-side partials. Decimal sums make the result independent of
    partition/merge order — required at 1000 executors."""
    li = table(spark, sf_dir, "lineitem")
    one = F.lit(1)
    qty, price, disc, tax = (money(c) for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= "2000-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dbl(F.sum(qty)).alias("sum_qty"),
            dbl(F.sum(price)).alias("sum_base_price"),
            dbl(F.sum(price * (one - disc))).alias("sum_disc_price"),
            dbl(F.sum(price * (one - disc) * (one + tax))).alias("sum_charge"),
            _avg(F.sum(qty), n).alias("avg_qty"),
            _avg(F.sum(price), n).alias("avg_price"),
            _avg(F.sum(disc), n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@register(
    "tpch_q3",
    oracle="""
    SELECT o.o_orderkey,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           CAST(o.o_orderdate AS DATE) AS orderdate, o.o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < '1998-03-15' AND l.l_shipdate > '1998-03-15'
    GROUP BY o.o_orderkey, orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderkey LIMIT 10
    """,
    bench=True,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority (TPC-H Q3 shape): selective dimension side joins a
    fact-fact shuffle join, then top-k. orderBy().limit(10) compiles to
    TakeOrderedAndProject (per-partition heaps, no global sort)."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    rev = F.sum(money("l_extendedprice") * (F.lit(1) - money("l_discount")))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", F.col("o_orderdate").cast("date").alias("orderdate"), "o_orderpriority")
        .agg(dbl(rev).alias("revenue"))
        .select("o_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


@register(
    "tpch_q5",
    oracle="""
    SELECT n.n_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
         JOIN nation n ON s.s_nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND o.o_orderdate >= '1996-01-01' AND o.o_orderdate < '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
    bench=True,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume (TPC-H Q5 shape): 6-way join. supplier/nation/
    region are broadcast; only customer⋈orders⋈lineitem shuffle. CBO join
    reorder = the reference's DPccp intent at cluster scale."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    # The customer side is implicitly restricted to ASIA (c_nationkey =
    # s_nationkey and the supplier's nation is in ASIA) — applying the
    # 5-nation broadcast semi-filter to customer BEFORE the fact joins
    # drops ~80% of customer, orders, and join traffic at any scale.
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n_asia = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    c = table(spark, sf_dir, "customer").join(
        F.broadcast(n_asia.select("n_nationkey")),
        F.col("c_nationkey") == F.col("n_nationkey"),
        "left_semi",
    )
    rev = F.sum(money("l_extendedprice") * (F.lit(1) - money("l_discount")))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n_asia), s.s_nationkey == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dbl(rev).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "tpch_q6",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
      AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24.0
    """,
    bench=True,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast revenue (TPC-H Q6 shape): pure scan-filter-agg, fully
    pushed down; the canonical predicate-pushdown benchmark."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24.0)
    ).agg(
        dbl(F.sum(money("l_extendedprice") * money("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "tpch_q10",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= '1997-01-01' AND o.o_orderdate < '1997-04-01' AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey LIMIT 20
    """,
    bench=True,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned items (TPC-H Q10 shape): join + agg + top-k."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    rev = F.sum(money("l_extendedprice") * (F.lit(1) - money("l_discount")))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dbl(rev).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "agg_distinct",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders,
           count(DISTINCT o_custkey) AS n_custs,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — expands to a two-phase partial/merge agg in Spark
    (Expand + two exchanges), exact at any scale."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_custs"),
            dbl(F.sum(money("o_totalprice"))).alias("total"),
        )
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (absent in reference; README.md:51 TODO)."""
    return (
        table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(dbl(F.sum(money("l_quantity"))).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets."""
    return (
        table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dbl(F.sum(money("o_totalprice"))).alias("total"))
    )


@register(
    "having_filter",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders
    FROM orders GROUP BY o_custkey HAVING count(*) >= 8
    """,
)
def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING = post-aggregation filter."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 8)
    )


@register(
    "date_trunc_agg",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY month
    """,
)
def date_trunc_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal bucketing — the batch twin of a streaming tumbling window."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month"))
        .agg(F.count(F.lit(1)).alias("n_orders"), dbl(F.sum(money("o_totalprice"))).alias("total"))
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@register(
    "window_topk",
    oracle="""
    SELECT * FROM (
      SELECT c_nationkey, c_custkey, c_name, c_acctbal,
             row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer) WHERE rn <= 3
    """,
    bench=True,
)
def window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number — one shuffle on the partition key;
    deterministic ordering (tie-break on the key) so results are stable
    across engines and partitionings."""
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return (
        table(spark, sf_dir, "customer")
        .select("c_nationkey", "c_custkey", "c_name", "c_acctbal")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
    FROM orders
    """,
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate over an ordered frame (decimal-exact)."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        dbl(F.sum(money("o_totalprice")).over(w)).alias("running_total"),
    )


@register(
    "window_lag",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) -
                lag(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                AS DOUBLE) AS price_delta
    FROM orders
    """,
)
def window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead navigation functions."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    p = money("o_totalprice")
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        dbl(p - F.lag(p).over(w)).alias("price_delta"),
    )


# ---------------------------------------------------------------------------
# Sort / limit, set operations, join variants
# ---------------------------------------------------------------------------


@register(
    "sort_limit",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice FROM part
    ORDER BY p_retailprice DESC, p_partkey LIMIT 15
    """,
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT -> TakeOrderedAndProject (no global sort)."""
    return (
        table(spark, sf_dir, "part")
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy(F.col("p_retailprice").desc(), "p_partkey")
        .limit(15)
    )


@register(
    "setop_union",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0
    UNION
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000.0
    """,
)
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct)."""
    a = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000.0).select("c_custkey")
    b = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000.0)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return a.union(b).distinct()


@register(
    "setop_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000.0).select("c_custkey")
    b = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return a.intersect(b)


@register(
    "setop_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = table(spark, sf_dir, "customer").select("c_custkey")
    b = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return a.subtract(b)


@register(
    "setop_bag_all",
    oracle="""
    WITH a AS (SELECT l_suppkey FROM lineitem WHERE l_quantity < 10),
         b AS (SELECT l_suppkey FROM lineitem WHERE l_discount > 0.05)
    SELECT 'except_all' AS op, l_suppkey FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
    UNION ALL
    SELECT 'intersect_all' AS op, l_suppkey FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
    """,
)
def setop_bag_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set ops (EXCEPT ALL / INTERSECT ALL): multiplicity
    arithmetic — a row appearing m times in A and n in B survives
    max(m-n,0) / min(m,n) times. Spark plans both as a single hash
    aggregation counting per-side multiplicities then re-generating
    rows — one shuffle on the row value, no join explosion."""
    li = table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") < 10).select("l_suppkey")
    b = li.filter(F.col("l_discount") > 0.05).select("l_suppkey")
    tag = lambda df, name: df.select(F.lit(name).alias("op"), "l_suppkey")  # noqa: E731
    return tag(a.exceptAll(b), "except_all").unionAll(
        tag(a.intersectAll(b), "intersect_all")
    )


@register(
    "semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
    """,
)
def semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join = EXISTS; never duplicates the probe side."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join = NOT EXISTS."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "outer_join_agg",
    oracle="""
    SELECT c.c_custkey, c.c_name, count(o.o_orderkey) AS n_orders,
           coalesce(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
    bench=True,
)
def outer_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving unmatched rows, then aggregate —
    count(col) skips the NULLs outer join introduces."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dbl(F.sum(money("o_totalprice"))), F.lit(0.0)).alias("total"),
        )
    )


@register(
    "cross_join",
    oracle="SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n",
)
def cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product (the reference panics on these —
    optimizer.rs:93-95; here it's a broadcast nested loop)."""
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


# ---------------------------------------------------------------------------
# Scalar expressions / subqueries (reference has NO expressions at all —
# plan.rs:131-136 comments out even Add/Sub/Mul)
# ---------------------------------------------------------------------------


@register(
    "scalar_funcs",
    oracle="""
    SELECT o_orderkey,
           upper(substr(o_orderpriority, 3, 20)) AS prio,
           year(o_orderdate) AS yr, month(o_orderdate) AS mo,
           length(o_orderstatus) AS status_len,
           concat_ws('-', o_orderstatus, CAST(year(o_orderdate) AS VARCHAR)) AS tag,
           CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
           o_orderkey % 7 AS key_mod
    FROM orders
    """,
)
def scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math scalar functions in a projection — all JVM-side
    whole-stage-codegen expressions, zero Python in the hot path."""
    o = table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    return o.select(
        "o_orderkey",
        F.upper(F.substring("o_orderpriority", 3, 20)).alias("prio"),
        yr.alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.length("o_orderstatus").alias("status_len"),
        F.concat_ws("-", F.col("o_orderstatus"), yr.cast("string")).alias("tag"),
        F.floor("o_totalprice").cast("bigint").alias("price_floor"),
        (F.col("o_orderkey") % 7).alias("key_mod"),
    )


@register(
    "case_when",
    oracle="""
    SELECT CASE WHEN o_totalprice >= 300000.0 THEN 'high'
                WHEN o_totalprice >= 100000.0 THEN 'mid'
                ELSE 'low' END AS bucket,
           count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY bucket
    """,
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE expression + aggregate over the computed key."""
    o = table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") >= 300000.0, "high")
        .when(F.col("o_totalprice") >= 100000.0, "mid")
        .otherwise("low")
        .alias("bucket")
    )
    return o.groupBy(bucket).agg(
        F.count(F.lit(1)).alias("n"), dbl(F.sum(money("o_totalprice"))).alias("total")
    )


@register(
    "in_subquery",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000.0)
    """,
)
def in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) — Catalyst rewrites to a left-semi join."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000.0)
        """
    )


@register(
    "scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > 1.5 * (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) FROM orders)
    """,
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (broadcast as a literal at runtime).
    The mean is computed decimal-exactly so the comparison threshold is
    bit-identical across engines."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > 1.5 * (
          SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) FROM orders)
        """
    )


@register(
    "distinct_op",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def distinct_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT = group-by-all-columns; partial dedup before the shuffle."""
    return table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()
