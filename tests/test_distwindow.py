"""distwindow two-phase global windows == single-partition windows.

The three registered consumers (corpus_shard_pack, customer_pareto,
orders_rfm) verify against DuckDB end-to-end; these tests pin the
helpers themselves against Spark's own unpartitioned windows on adverse
shapes: duplicates on the sort key (tie-break column), descending
orders, N < n_tiles, decimal sums, and empty input.
"""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from oxidsql_spark.operators.distwindow import (
    global_cumsum,
    global_ntile,
    global_row_number,
)


def _df(spark, n, dup_every=7):
    # adversarial: value has heavy ties so the tie-break column matters
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % dup_every).alias("v"),
        (F.col("id") % 13 + 1).cast("decimal(18,2)").alias("amt"),
    )


def test_global_cumsum_matches_window(spark):
    df = _df(spark, 500)
    got, total = global_cumsum(df, "amt", [F.col("v").desc(), F.col("k")], "cum", nparts=8)
    w = W.orderBy(F.col("v").desc(), F.col("k")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    want = df.withColumn("cum", F.sum("amt").over(w))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert total == Decimal(sum((i % 13 + 1) for i in range(500)))


def test_global_row_number_matches_window(spark):
    df = _df(spark, 300)
    got, n = global_row_number(df, ["v", "k"], "rn", nparts=5)
    w = W.orderBy("v", "k")
    want = df.withColumn("rn", F.row_number().over(w).cast("bigint"))
    assert n == 300
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


@pytest.mark.parametrize("n_rows", [3, 5, 7, 8, 10, 11, 250])
def test_global_ntile_matches_window(spark, n_rows):
    """Exact ntile across remainder shapes, including N < n_tiles
    (the floor-formula shortcut is WRONG there — see distwindow)."""
    df = _df(spark, n_rows)
    got = global_ntile(df, 5, ["v", "k"], "t", nparts=4)
    w = W.orderBy("v", "k")
    want = df.withColumn("t", F.ntile(5).over(w))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_cumsum_duplicate_keys_no_tiebreak(spark):
    """The documented contract for a NON-total order: per-row values are
    some valid tie order, but each tie group's boundary running total —
    max(cum) within the group — is exact (ties never split across range
    partitions), and the per-group row count survives."""
    n, dup_every = 400, 5
    df = _df(spark, n, dup_every)
    got, total = global_cumsum(df, "amt", ["v"], "cum", nparts=8)  # ties!
    assert total == Decimal(sum((i % 13 + 1) for i in range(n)))
    bounds = {
        r["v"]: (r["mx"], r["cnt"])
        for r in got.groupBy("v")
        .agg(F.max("cum").alias("mx"), F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    running = Decimal(0)
    for v in range(dup_every):
        grp = [Decimal(i % 13 + 1) for i in range(n) if i % dup_every == v]
        running += sum(grp)
        assert bounds[v] == (running, len(grp))


def test_nparts_exceeds_distinct_keys(spark):
    """nparts ≫ distinct sort keys → most range partitions are empty;
    offsets must still line up (absent pids contribute zero)."""
    df = spark.range(90).select(
        (F.col("id") % 3).alias("v"), F.col("id").alias("k"), F.lit(1).cast("long").alias("one")
    )
    got, total = global_cumsum(df, "one", ["v", "k"], "cum", nparts=64)
    w = W.orderBy("v", "k").rowsBetween(W.unboundedPreceding, W.currentRow)
    want = df.withColumn("cum", F.sum("one").over(w))
    assert total == 90
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    ranked, n = global_row_number(df, ["v", "k"], "rn", nparts=64)
    assert n == 90
    want_rn = df.withColumn("rn", F.row_number().over(W.orderBy("v", "k")).cast("bigint"))
    assert sorted(map(tuple, ranked.collect())) == sorted(map(tuple, want_rn.collect()))


def test_single_row(spark):
    df = _df(spark, 1)
    got, total = global_cumsum(df, "amt", ["k"], "cum", nparts=4)
    assert [tuple(r) for r in got.collect()] == [(0, 0, Decimal("1.00"), Decimal("1.00"))]
    assert total == Decimal(1)
    ranked, n = global_row_number(df, ["k"], "rn", nparts=4)
    assert n == 1 and ranked.collect()[0]["rn"] == 1
    tiled = global_ntile(df, 5, ["k"], "t", nparts=4)
    assert tiled.collect()[0]["t"] == 1


def test_all_null_measure(spark):
    """sum() ignores NULLs; an all-NULL measure keeps the running sum
    NULL everywhere in both the window and the two-phase plan (offsets
    degrade to zero, zero + NULL = NULL)."""
    df = spark.range(50).select(
        F.col("id").alias("k"), F.lit(None).cast("decimal(18,2)").alias("amt")
    )
    got, total = global_cumsum(df, "amt", ["k"], "cum", nparts=8)
    assert total == Decimal(0)
    assert all(r["cum"] is None for r in got.collect())


def test_mixed_null_measure(spark):
    """NULLs sprinkled in: running sum skips them (NULL until the first
    non-NULL in order) — must match the window bit-for-bit."""
    df = spark.range(100).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 3 == 0, F.col("id") % 7).cast("decimal(18,2)").alias("amt"),
    )
    got, _ = global_cumsum(df, "amt", ["k"], "cum", nparts=8)
    w = W.orderBy("k").rowsBetween(W.unboundedPreceding, W.currentRow)
    want = df.withColumn("cum", F.sum("amt").over(w))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_empty_input(spark):
    df = _df(spark, 0)
    got, total = global_cumsum(df, "amt", ["k"], "cum", nparts=4)
    assert got.count() == 0 and total == 0
    ranked, n = global_row_number(df, ["k"], "rn", nparts=4)
    assert ranked.count() == 0 and n == 0
    assert global_ntile(df, 5, ["k"], "t", nparts=4).count() == 0
