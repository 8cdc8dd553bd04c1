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


def test_empty_input(spark):
    df = _df(spark, 0)
    got, total = global_cumsum(df, "amt", ["k"], "cum", nparts=4)
    assert got.count() == 0 and total == 0
    ranked, n = global_row_number(df, ["k"], "rn", nparts=4)
    assert ranked.count() == 0 and n == 0
    assert global_ntile(df, 5, ["k"], "t", nparts=4).count() == 0
