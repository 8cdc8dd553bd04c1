"""SCD Type-2 build: CDC re-emit collapse, NULL attributes, interval
chaining, and the single-exchange plan."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from oxidsql_spark.operators.scd import scd2_build


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "k int, attr string, ts timestamp_ntz, seq int"
    )


def test_scd2_collapses_reemitted_state(spark):
    t = lambda s: datetime(2024, 1, s)
    feed = _mk(spark, [
        (1, "a", t(1), 1),
        (1, "a", t(2), 2),   # CDC re-emit: same state, no new interval
        (1, "b", t(3), 3),
        (1, "b", t(4), 4),
        (1, "a", t(5), 5),   # back to 'a': NEW interval (not merged with the first)
        (2, "x", t(1), 1),
    ])
    out = scd2_build(feed, "k", ["attr"], "ts", tiebreak=["seq"]).collect()
    got = sorted((r.k, r.attr, r.valid_from, r.valid_to, r.is_current) for r in out)
    assert got == [
        (1, "a", t(1), t(3), False),
        (1, "a", t(5), None, True),
        (1, "b", t(3), t(5), False),
        (2, "x", t(1), None, True),
    ]


def test_scd2_null_attribute_and_first_row(spark):
    t = lambda s: datetime(2024, 1, s)
    feed = _mk(spark, [
        (1, None, t(1), 1),  # NULL initial state still opens an interval
        (1, None, t(2), 2),  # unchanged (null-safe): no new interval
        (1, "v", t(3), 3),
        (1, None, t(4), 4),  # change back to NULL opens one
    ])
    out = scd2_build(feed, "k", ["attr"], "ts", tiebreak=["seq"]).collect()
    got = sorted(
        ((r.k, r.attr, r.valid_from, r.valid_to, r.is_current) for r in out),
        key=lambda x: (x[0], x[2]),
    )
    assert got == [
        (1, None, t(1), t(3), False),
        (1, "v", t(3), t(4), False),
        (1, None, t(4), None, True),
    ]


def test_scd2_single_exchange(spark):
    feed = _mk(spark, [(1, "a", datetime(2024, 1, 1), 1)])
    out = scd2_build(feed, "k", ["attr"], "ts", tiebreak=["seq"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
