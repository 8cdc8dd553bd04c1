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


def _hist_rows(df):
    return sorted(
        ((r.user_id, r.event_type, r.valid_from, r.valid_to, r.is_current) for r in df.collect()),
        key=lambda x: (x[0], x[2]),
    )


def test_scd2_merge_batches_equal_full_build(spark, sf_dir, tmp_path):
    """Applying the change feed as 3 sequential merge commits must land
    the exact table the one-shot build derives — batch boundaries are
    invisible (including a boundary that splits a run of re-emits)."""
    from oxidsql_spark.operators.scd import scd2_build, scd2_merge_batch
    from oxidsql_spark.sources import table
    from oxidsql_spark.versioned import VersionedTable

    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    span = (hi - lo) / 3
    cuts = [lo + span, lo + span * 2]
    vt = VersionedTable(spark, str(tmp_path / "scd2"))
    batches = [
        ev.filter(F.col("ts") < cuts[0]),
        ev.filter((F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1])),
        ev.filter(F.col("ts") >= cuts[1]),
    ]
    for b in batches:
        scd2_merge_batch(vt, b, "user_id", ["event_type"], "ts", tiebreak=["event_id"])
    want = scd2_build(ev, "user_id", ["event_type"], "ts", tiebreak=["event_id"])
    assert _hist_rows(vt.read()) == _hist_rows(want)
    assert vt.versions() == [1, 2, 3]  # one atomic commit per batch


# the streaming twin (scd2_apply_stream == one-shot build over a 4-batch
# replay) lives in tests/test_streaming.py with the chunked_stream_dir fixture
