"""Slowly-changing-dimension (Type 2) history builds.

The reference stores dimensions as mutable heap rows — an UPDATE (its
README.md:51 TODO) would overwrite history.  Warehouses instead keep
Type-2 history: one row per (key, attribute-state) validity interval
with ``valid_from`` / ``valid_to`` / ``is_current``, so a fact row can
always be joined to the dimension AS OF its own timestamp.

``scd2_build`` turns a raw change feed (possibly containing consecutive
rows with unchanged attributes — CDC streams routinely re-emit state)
into the minimal interval table:

1. change-point detection: a row starts a new interval iff any tracked
   attribute differs (null-safely) from the key's previous row — one
   window over (key, ts);
2. interval closing: ``valid_to`` = next change's ``valid_from`` — a
   second window over the surviving change points.

Both windows share the same partitioning key, so Catalyst plans ONE
exchange on the key; state per key is a single previous row — linear
streaming evaluation per partition, no join.  At 100 TB the change feed
shuffles once on the dimension key and the output is the (much smaller)
interval table; the companion as-of join (`relational_ext.asof_last_click`
pattern) then serves point-in-time lookups without inequality joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..sources import table


def scd2_build(
    changes: DataFrame,
    key: str,
    attrs: list[str],
    ts_col: str,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Collapse a change feed into SCD Type-2 validity intervals.

    ``tiebreak`` columns make the within-key order total when ``ts_col``
    has duplicates (pass the feed's sequence/event id); determinism of
    the output requires a total order."""
    order = [F.col(ts_col), *(F.col(c) for c in (tiebreak or []))]
    w = W.partitionBy(key).orderBy(*order)
    is_change = F.lit(False)
    for a in attrs:
        is_change = is_change | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    # lag(key-ordered first row) is NULL for every attr; eqNullSafe makes
    # a genuinely-NULL first attribute compare equal, so mark row 1 explicitly
    first = F.row_number().over(w) == 1
    cp = changes.withColumn("_chg", first | is_change).filter("_chg")
    w2 = W.partitionBy(key).orderBy(*order)
    nxt = F.lead(ts_col).over(w2)
    return cp.select(
        F.col(key),
        *[F.col(a) for a in attrs],
        F.col(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


def scd2_merge_batch(
    vt,
    batch: DataFrame,
    key: str,
    attrs: list[str],
    ts_col: str,
    tiebreak: list[str] | None = None,
) -> None:
    """Fold one APPENDED change batch into a snapshot-versioned SCD2
    table (one atomic commit; readers only ever see whole batches).

    Only AFFECTED keys are touched: closed intervals are immutable and
    pass through; each affected key's OPEN interval re-enters change
    detection as a seed row (its original ``valid_from``, NULL tiebreak
    so it sorts before same-timestamp batch rows), unioned with the
    key's batch rows, and `scd2_build` re-derives that key's tail —
    so a batch that only re-emits current state changes nothing, and a
    real change closes the open interval at the change's timestamp.

    Cost per batch: |batch| + (open intervals of affected keys) rows
    through one `scd2_build` — never the closed history, never
    unaffected keys.  Precondition (standard CDC contract): per key,
    batch timestamps are >= the open interval's ``valid_from`` —
    event-time-ordered feeds per key; cross-key order is free."""
    cols = [key, *attrs, ts_col, *(tiebreak or [])]
    batch = batch.select(*cols)
    if vt.latest_version() is None:
        vt.write(scd2_build(batch, key, attrs, ts_col, tiebreak=tiebreak))
        return
    cur = vt.read()
    bkeys = batch.select(key).distinct()
    untouched = cur.join(bkeys, key, "left_anti")
    affected = cur.join(bkeys, key, "left_semi")
    closed = affected.filter(~F.col("is_current"))
    seed = affected.filter("is_current").select(
        F.col(key), *[F.col(a) for a in attrs], F.col("valid_from").alias(ts_col)
    )
    for tb in tiebreak or []:
        seed = seed.withColumn(tb, F.lit(None).cast(batch.schema[tb].dataType))
    rebuilt = scd2_build(
        seed.select(*cols).unionByName(batch), key, attrs, ts_col, tiebreak=tiebreak
    )
    vt.write(untouched.unionByName(closed).unionByName(rebuilt))


def scd2_apply_stream(
    spark: SparkSession, source_dir: str, table_path: str, checkpoint_dir: str
):
    """Streaming SCD2 maintenance: the events change feed lands in a
    snapshot-versioned Type-2 history via ``foreachBatch`` — each
    micro-batch is one atomic `scd2_merge_batch` commit, so the commit
    history is the dimension's CDC log and time travel replays the
    history to any batch boundary.  Final state == the one-shot batch
    `scd2_build` (tested over a watermark-advancing multi-batch replay).
    Returns the ready DataStreamWriter (caller .start()s it)."""
    from ..streaming.events import _stream_source
    from ..versioned import VersionedTable

    vt = VersionedTable(spark, table_path)

    def _sink(batch_df, batch_id):  # noqa: ANN001 — foreachBatch contract
        if batch_df.isEmpty():
            return
        scd2_merge_batch(
            vt, batch_df, "user_id", ["event_type"], "ts", tiebreak=["event_id"]
        )

    return (
        _stream_source(spark, source_dir)
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )


@register(
    "events_scd2_type",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
    ), cp AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE rn = 1 OR prev_type <> event_type
    )
    SELECT user_id, event_type,
           CAST(ts AS VARCHAR) AS valid_from,
           CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS VARCHAR) AS valid_to,
           (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
             AS is_current
    FROM cp
    ORDER BY user_id, valid_from
    """,
)
def events_scd2_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history of each user's event_type state: consecutive
    same-type events collapse into one validity interval; the interval
    closes when the next differing type arrives.  One exchange on
    user_id serves both windows (change-point lag + interval-closing
    lead)."""
    ev = table(spark, sf_dir, "events")
    hist = scd2_build(
        ev, "user_id", ["event_type"], "ts", tiebreak=["event_id"]
    )
    return hist.select(
        "user_id",
        "event_type",
        F.col("valid_from").cast("string").alias("valid_from"),
        F.col("valid_to").cast("string").alias("valid_to"),
        "is_current",
    ).orderBy("user_id", "valid_from")
