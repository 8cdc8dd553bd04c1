"""Extended TPC-H-shape analytics — the decision-support surface the
reference only TODO-lists (reference README.md:44-55: GROUP BY, ORDER BY,
subqueries, expressions are all absent from its 8-operator algebra,
src/execution/plan.rs:29-68).

Adapted to the driver's TPC-H-ish schema (no partsupp, no
commit/receipt dates — see TESTDATA.md), keeping each original query's
*plan shape*: multi-way joins with broadcast dimensions, left outer +
double aggregation (q13), correlated scalar subqueries decorrelated into
aggregate joins (q15/q17), group-filter semi-join (q18), and disjunctive
multi-branch join predicates (q19).

Scale notes (100 TB design intent):
* nation appears twice in q7/q8 — both sides broadcast, so the fact-table
  path shuffles only on the orders⋈lineitem and customer⋈orders keys.
* q13's LEFT JOIN keeps customer as the build of a shuffle join on
  c_custkey; the second aggregation (custdist) is tiny and re-shuffles a
  per-customer rollup, not base data.
* q15/q17 decorrelate the scalar subquery into a groupBy + join — at
  cluster scale that is one extra shuffle of an already-aggregated
  (small) relation instead of a per-row subquery execution.
* q17's threshold uses an exact decimal sum / exact count so the
  comparison is bit-identical regardless of partial-agg merge order.
* All money math in DECIMAL(18,2); doubles appear only at the final cast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import dbl, money, table

_DEC = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


def _volume() -> F.Column:
    return money("l_extendedprice") * (F.lit(1) - money("l_discount"))


@register(
    "tpch_q7",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, CAST(sum(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS l_year,
             {_DEC} AS volume
      FROM supplier s JOIN lineitem l ON s.s_suppkey = l.l_suppkey
           JOIN orders o ON o.o_orderkey = l.l_orderkey
           JOIN customer c ON c.c_custkey = o.o_custkey
           JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
           JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= '1996-01-01' AND l.l_shipdate < '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    bench=True,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping (TPC-H Q7 shape): nation joined twice under
    different roles; the disjunctive nation-pair predicate sits above two
    broadcast joins, so only the fact joins shuffle."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    # Restrict BOTH dimension sides to the two nations before touching the
    # fact table: the broadcast s2 join throws away ~92% of lineitem (2 of
    # 25 nations) ahead of the orders/customer shuffles.
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    s2 = table(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key")
    ).select("s_suppkey", "supp_nation")
    c2 = table(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key")
    ).select("c_custkey", "cust_nation")
    o = table(spark, sf_dir, "orders")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(F.broadcast(s2), li.l_suppkey == F.col("s_suppkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c2, o.o_custkey == F.col("c_custkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dbl(F.sum(_volume())).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q8",
    oracle=f"""
    SELECT o_year,
           round(CAST(sum(CASE WHEN nation = 'NATION_2' THEN volume ELSE 0 END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
             {_DEC} AS volume, n2.n_name AS nation
      FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
           JOIN supplier s ON s.s_suppkey = l.l_suppkey
           JOIN orders o ON o.o_orderkey = l.l_orderkey
           JOIN customer c ON c.c_custkey = o.o_custkey
           JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
           JOIN region r ON n1.n_regionkey = r.r_regionkey
           JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        AND o.o_orderdate >= '1996-01-01' AND o.o_orderdate < '1998-01-01'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    bench=True,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8 shape): 8-way join, nation twice
    (customer-side restricts to region, supplier-side labels the share),
    conditional aggregation for the share ratio."""
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    # Pre-restrict customer to ASIA nations (broadcast semi over 5 keys)
    # so the orders⋈customer shuffle carries only the region's rows.
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1_asia = n1.join(F.broadcast(r), F.col("n1_region") == r.r_regionkey).select("n1_key")
    c = table(spark, sf_dir, "customer").join(
        F.broadcast(n1_asia), F.col("c_nationkey") == F.col("n1_key"), "left_semi"
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    vol = _volume()
    share_num = F.sum(F.when(F.col("nation") == "NATION_2", vol).otherwise(F.lit(0).cast("decimal(18,2)")))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.round(dbl(share_num) / dbl(F.sum(vol)), 6).alias("mkt_share"))
        .orderBy("o_year")
    )


@register(
    "tpch_q13",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
           ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    bench=True,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13 shape): left outer
    join with a join-level (not WHERE-level) filter so zero-order
    customers survive, then a second aggregation over the first."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "tpch_q14",
    oracle=f"""
    SELECT round(100.00 * CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN {_DEC} ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(sum({_DEC}) AS DOUBLE), 6) AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= '1997-09-01' AND l.l_shipdate < '1997-10-01'
    """,
    bench=True,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion effect (TPC-H Q14 shape): fact filtered to one month,
    part broadcast, conditional/total ratio in one aggregation pass."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    p = table(spark, sf_dir, "part")
    vol = _volume()
    promo = F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0).cast("decimal(18,2)")))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(F.round(F.lit(100.0) * dbl(promo) / dbl(F.sum(vol)), 6).alias("promo_revenue"))
    )


@register(
    "tpch_q15",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, sum({_DEC}) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier (TPC-H Q15 shape): the view + scalar subquery
    decorrelates to agg -> global-max broadcast join. Exact decimal
    revenue makes the max-equality comparison safe (a double sum would
    make `= max` partition-order-dependent)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_volume()).alias("total_revenue")
    )
    best = rev.agg(F.max("total_revenue").alias("best_revenue"))
    s = table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(best), rev.total_revenue == best.best_revenue)
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", dbl(F.col("total_revenue")).alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q17",
    oracle="""
    WITH part_avg AS (
      SELECT l_partkey,
             0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)) AS qty_threshold
      FROM lineitem GROUP BY l_partkey
    )
    SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 6) AS avg_yearly
    FROM lineitem l
         JOIN part p ON p.p_partkey = l.l_partkey
         JOIN part_avg a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13' AND l.l_quantity < a.qty_threshold
    """,
    bench=True,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity revenue (TPC-H Q17 shape): the correlated scalar
    subquery (avg qty per part) decorrelated into a per-part aggregate
    joined back to the fact. Threshold = exact decimal sum / exact count
    so Spark and the oracle compare identical doubles."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    # Only Brand#13 parts can reach the final filter, so the per-part
    # average only needs their lineitems: a broadcast semi-join cuts the
    # aggregation input ~30x before it shuffles.
    li_brand = li.join(
        F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"), "left_semi"
    )
    part_avg = li_brand.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (F.lit(0.2) * (dbl(F.sum(money("l_quantity"))) / F.count(F.lit(1)))).alias("qty_threshold")
    )
    return (
        li_brand.join(F.broadcast(part_avg), li_brand.l_partkey == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(dbl(F.sum(money("l_extendedprice"))) / F.lit(7.0), 6).alias("avg_yearly"))
    )


@register(
    "tpch_q18",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS orderdate, o.o_totalprice,
           CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
         JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    bench=True,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers (TPC-H Q18 shape): HAVING-filtered
    aggregate drives the result. l_orderkey is the finest group key, so
    the final per-(customer, order) sum IS the per-order sum already
    computed — one lineitem pass + one tiny broadcast join, instead of
    the naive semi-join + second full-fact aggregation."""
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(money("l_quantity")).alias("big_qty"))
        .filter(F.col("big_qty") > 300)
    )
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_totalprice",
            dbl(F.col("big_qty")).alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "tpch_q19",
    oracle=f"""
    SELECT CAST(sum({_DEC}) AS DOUBLE) AS revenue, count(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#25' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue (TPC-H Q19 shape): disjunctive predicate
    spanning both join sides. The part-only disjunction
    (brand13|20|25) is implied and Catalyst can push it to the broadcast
    side; the mixed l/p branches evaluate post-join."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    branch = (
        ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 15) & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#20") & F.col("p_size").between(10, 30) & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#25") & F.col("p_size").between(20, 50) & (q >= 20) & (q <= 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(branch)
        .agg(
            dbl(F.sum(_volume())).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "tpch_q4_exists",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= '1997-01-01' AND o.o_orderdate < '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def tpch_q4_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking (TPC-H Q4 shape, adapted: shipped >60 days
    after order date, since the testdata has no commit/receipt dates).
    The correlated EXISTS is a left-semi join whose condition mixes the
    equi key with a non-equi date comparison — the semi join still
    shuffles only on l_orderkey; the date predicate evaluates post-match."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q22_antibal",
    oracle="""
    SELECT n.n_name,
           count(*) AS numcust,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
                         FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= '1999-01-01')
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def tpch_q22_antibal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sales opportunity (TPC-H Q22 shape, adapted: nation instead
    of phone country code; 'dormant' = no order since 1999, mirroring
    Q22's no-recent-orders intent). Scalar subquery -> broadcast of a
    1-row aggregate; NOT EXISTS -> left_anti on o_custkey. The average
    uses exact decimal sum / exact count so > is engine-stable."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "1999-01-01")
        .select("o_custkey")
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg((dbl(F.sum(money("c_acctbal"))) / F.count(F.lit(1))).alias("avg_bal"))
    )
    return (
        c.join(F.broadcast(avg_bal), c.c_acctbal > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dbl(F.sum(money("c_acctbal"))).alias("totacctbal"),
        )
        .orderBy("n_name")
    )


@register(
    "tpch_q12_ship",
    oracle="""
    SELECT CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 'high' ELSE 'low' END AS priority_bucket,
           count(*) AS late_lines,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                AS DOUBLE) AS late_value
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    GROUP BY priority_bucket
    ORDER BY priority_bucket
    """,
    bench=True,
)
def tpch_q12_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-mode/priority (TPC-H Q12 shape, adapted: 'late' = shipped
    >90 days after order date since the testdata has no commit/receipt
    dates): fact-fact join with a cross-table date predicate, then the
    two-bucket conditional aggregation. The date predicate can't push to
    either scan (it spans the join) — it evaluates post-join, which is
    why Q12 is the canonical join-residual-predicate benchmark."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    bucket = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high"
    ).otherwise("low")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy(bucket.alias("priority_bucket"))
        .agg(
            F.count(F.lit(1)).alias("late_lines"),
            dbl(F.sum(money("l_extendedprice"))).alias("late_value"),
        )
        .orderBy("priority_bucket")
    )


@register(
    "tpch_q16_suppcnt",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#13' AND p.p_size IN (1, 5, 9, 13, 17)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def tpch_q16_suppcnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts/supplier relationship (TPC-H Q16 shape, adapted: lineitem
    stands in for partsupp, 'complaint' suppliers = negative balance):
    NOT IN anti-join against a broadcast exclusion list, then a
    COUNT(DISTINCT) grouped by part attributes — Spark expands it to the
    two-exchange exact distinct plan."""
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13") & F.col("p_size").isin(1, 5, 9, 13, 17)
    )
    bad = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "tpch_q21_waiting",
    oracle="""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      GROUP BY l.l_orderkey, l.l_suppkey
    ),
    sole AS (
      SELECT l_orderkey, min(l_suppkey) AS l_suppkey
      FROM late GROUP BY l_orderkey HAVING count(*) = 1
    )
    SELECT s.s_name, count(*) AS numwait
    FROM sole JOIN supplier s ON sole.l_suppkey = s.s_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def tpch_q21_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting (TPC-H Q21 shape, adapted:
    'late' = shipped >60 days after order date). The original's double
    correlated EXISTS/NOT EXISTS ('another supplier on the order, and
    no OTHER supplier was late') decorrelates to one grouped HAVING:
    the late set per order has exactly one supplier. One pass over the
    late lines instead of two correlated self-joins of lineitem —
    the decorrelation IS the 100 TB plan."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    sole = (
        late.groupBy("l_orderkey")
        .agg(F.min("l_suppkey").alias("l_suppkey"), F.count(F.lit(1)).alias("nsupp"))
        .filter(F.col("nsupp") == 1)
    )
    s = table(spark, sf_dir, "supplier")
    return (
        sole.join(F.broadcast(s), sole.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "tpch_q9_profit",
    oracle=f"""
    SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS o_year,
             {_DEC} - CAST(p.p_retailprice AS DECIMAL(18,2))
                      * CAST(l.l_quantity AS DECIMAL(18,2)) AS amount
      FROM lineitem l
           JOIN part p ON p.p_partkey = l.l_partkey
           JOIN supplier s ON s.s_suppkey = l.l_suppkey
           JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE p.p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    bench=True,
)
def tpch_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit by nation and year (TPC-H Q9 shape, adapted:
    no partsupp, so per-unit cost = p_retailprice). The classic
    star-join rollup: one pass over the fact table with every dimension
    broadcast (part is filtered *before* the join so the LIKE prunes the
    build side, not the probe), then a single shuffle on the tiny
    (nation, year) grouping key. All money math stays DECIMAL until the
    final double cast so partial-agg merge order can't change the hash."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount", "l_quantity"
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    amount = _volume() - money("p_retailprice") * money("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(dbl(F.sum(amount)).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "tpch_q2_mincost",
    oracle="""
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             min(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    best AS (
      SELECT l_partkey, min(cost) AS mincost FROM offers GROUP BY l_partkey
    )
    SELECT p.p_partkey, p.p_name, s.s_name, n.n_name AS nation,
           CAST(o.cost AS DOUBLE) AS cost
    FROM offers o
         JOIN best b ON o.l_partkey = b.l_partkey AND o.cost = b.mincost
         JOIN part p ON p.p_partkey = o.l_partkey
         JOIN supplier s ON s.s_suppkey = o.l_suppkey
         JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size <= 10
    ORDER BY p.p_partkey, s.s_name
    """,
)
def tpch_q2_mincost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier per part (TPC-H Q2 shape, adapted: a
    supplier's offer price for a part = its cheapest lineitem
    extendedprice, standing in for partsupp). The original's correlated
    'cost = (SELECT min...)' subquery becomes a window min over the
    already-aggregated offers relation — one extra shuffle of the small
    (part, supplier) rollup instead of a per-row subquery or a
    self-join, and ties keep all witnesses exactly like the SQL form.
    part is filtered before its broadcast join so p_size prunes early."""
    from pyspark.sql.window import Window

    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(money("l_extendedprice")).alias("cost")
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_size") <= 10).select(
        "p_partkey", "p_name"
    )
    best = offers.join(F.broadcast(p), offers.l_partkey == p.p_partkey).withColumn(
        "mincost", F.min("cost").over(Window.partitionBy("l_partkey"))
    ).filter(F.col("cost") == F.col("mincost"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        best.join(F.broadcast(s), best.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "p_partkey", "p_name", "s_name",
            F.col("n_name").alias("nation"),
            dbl(F.col("cost")).alias("cost"),
        )
        .orderBy("p_partkey", "s_name")
    )


@register(
    "tpch_q11_importance",
    oracle="""
    WITH natval AS (
      SELECT l.l_partkey, sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS value
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
           JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY l.l_partkey),
    tot AS (SELECT sum(value) AS total, count(*) AS n_parts FROM natval)
    SELECT v.l_partkey AS p_partkey, CAST(v.value AS DOUBLE) AS value
    FROM natval v CROSS JOIN tot
    WHERE v.value * tot.n_parts > tot.total * 2
    """,
)
def tpch_q11_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important-stock shape (TPC-H Q11, adapted: a nation's 'stock
    value' per part = its suppliers' lineitem revenue, standing in for
    partsupp availqty*supplycost). The original's scalar subquery
    'HAVING sum(...) > (SELECT sum(...) * fraction)' decorrelates into
    a 1-row broadcast cross join against the grand total — no per-group
    subquery execution. The original's fixed fraction (0.0001/SF) is
    scale-dependent; the adapted test 'value > 2× the mean part value'
    (value·n_parts > 2·total) selects a stable share of parts at every
    SF, and stays exact decimal×integer — bit-identical at any
    parallelism.

    Scale: nation/supplier broadcast-prune lineitem before its one
    shuffle on l_partkey; the grand total re-aggregates the small
    per-part rollup, not the fact table."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = (
        table(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_3")
        .select("n_nationkey")
    )
    nat_li = li.join(
        F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)),
        li.l_suppkey == s.s_suppkey,
    )
    val = nat_li.groupBy("l_partkey").agg(
        F.sum(money("l_extendedprice")).alias("value")
    )
    tot = val.agg(
        F.sum("value").alias("total"), F.count(F.lit(1)).alias("n_parts")
    )
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("value") * F.col("n_parts") > F.col("total") * 2)
        .select(F.col("l_partkey").alias("p_partkey"), dbl(F.col("value")).alias("value"))
    )


@register(
    "tpch_q20_dominant",
    oracle="""
    WITH shipped AS (
      SELECT l.l_partkey, l.l_suppkey,
             sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS supp_qty
      FROM lineitem l
      WHERE l.l_shipdate >= '1997-01-01' AND l.l_shipdate < '1998-01-01'
        AND l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      GROUP BY l.l_partkey, l.l_suppkey),
    tot AS (
      SELECT l_partkey, sum(supp_qty) AS part_qty FROM shipped GROUP BY l_partkey)
    SELECT DISTINCT s.s_suppkey, s.s_name, n.n_name AS nation
    FROM shipped sh
         JOIN tot t ON sh.l_partkey = t.l_partkey
         JOIN supplier s ON s.s_suppkey = sh.l_suppkey
         JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE sh.supp_qty * 2 > t.part_qty
    """,
)
def tpch_q20_dominant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant-supplier shape (TPC-H Q20, adapted: 'availqty > half the
    part's shipped quantity' becomes 'this supplier shipped more than
    half the part's 1997 volume' — same nested-IN + correlated-half-sum
    plan shape without partsupp). The correlated scalar subquery
    decorrelates into a second aggregation of the already-grouped
    (part, supplier) rollup joined back on l_partkey; the name-filtered
    part list broadcast-semi-joins the fact scan so the date+part
    pruning happens before the only fact shuffle. The half test is
    exact decimal arithmetic (supp_qty*2 > part_qty)."""
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    shipped = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(money("l_quantity")).alias("supp_qty"))
    )
    tot = shipped.groupBy("l_partkey").agg(F.sum("supp_qty").alias("part_qty"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        shipped.join(tot, "l_partkey")
        .filter(F.col("supp_qty") * 2 > F.col("part_qty"))
        .join(F.broadcast(s), shipped.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
        .distinct()
    )
