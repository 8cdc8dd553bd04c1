"""Two-phase (hierarchical) global windows — the 100 TB running-total plan.

Spark executes a window with an ORDER BY but no PARTITION BY as
``Exchange SinglePartition`` + one task over the whole input: correct, and
a guaranteed bottleneck at scale.  The classic distributed alternative is
two-phase:

  1. ``repartitionByRange`` on the window's sort key (parallel range
     shuffle; every partition holds a contiguous, ordered key range),
  2. compute the running total *within* each partition (a window
     partitioned by ``spark_partition_id()`` — fully parallel),
  3. aggregate one tiny row per partition (its total), collect those
     ``O(num_partitions)`` rows to the driver, prefix-sum them in plain
     Python, and
  4. broadcast-join the per-partition prefix *offset* back; global
     running value = offset + local running value.

The only single-point work is step 3 — bounded by the partition count
(thousands of rows on a 1000-executor cluster), never by the data.

The reference engine has no window operator at all
(/root/reference/src/execution/plan.rs:29-68); these helpers exist so the
repo's own running-total queries (corpus_shard_pack, customer_pareto,
orders_rfm) hold the repo's SCALE.md bar.

Determinism note: ``repartitionByRange`` samples its range boundaries per
execution, so the partitioned frame is persisted before the first job —
the totals pass and the main pass must see the *same* partition ids.
Cached partitions recompute from the materialized shuffle output, not a
fresh sampling, so ids stay stable for the frame's lifetime.

Cache lifecycle: the persisted frame is registered with
``cachescope.scoped_persist`` — the caller that owns the query lifecycle
calls ``cachescope.release_scoped_caches()`` after the final action on
the returned DataFrame (bench.py does this per timed query).  The frame
must outlive the returned DataFrame's executions: releasing it and then
re-executing the result would re-sample range boundaries under collected
offsets, so released results are to be treated as consumed.
"""

from __future__ import annotations

from decimal import Decimal
from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DecimalType,
    IntegerType,
    StructField,
    StructType,
)

from ..cachescope import scoped_persist

_PID = "__dw_pid"
_LOC = "__dw_loc"
_OFF = "__dw_off"
_PRI = "__dw_prior_nn"  # any non-NULL measure in an earlier partition?

OrderCols = Sequence[Union[str, Column]]


def _range_partitioned(df: DataFrame, order_cols: OrderCols, nparts: Optional[int]) -> DataFrame:
    n = nparts or df.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    return scoped_persist(
        df.repartitionByRange(n, *cols).withColumn(_PID, F.spark_partition_id())
    )


def _prefix_offsets(parted: DataFrame, measure: Column, nn_count: Column):
    """Collect one (pid, total, non-null count) row per partition,
    prefix-sum on the driver.  Returns (offsets_df ready to broadcast,
    grand_total).  Each offset row carries whether any EARLIER partition
    held a non-NULL measure — needed to reproduce SQL running-sum NULL
    semantics when a partition's local prefix is still all-NULL but the
    global prefix is not."""
    totals_df = parted.groupBy(_PID).agg(measure.alias("_tot"), nn_count.alias("_nn"))
    ttype = totals_df.schema["_tot"].dataType
    zero = Decimal(0) if isinstance(ttype, DecimalType) else 0
    rows = sorted(totals_df.collect(), key=lambda r: r[_PID])
    offs, running, prior_nn = [], zero, 0
    for r in rows:
        offs.append((r[_PID], running, prior_nn > 0))
        running = running + (r["_tot"] if r["_tot"] is not None else zero)
        prior_nn += r["_nn"]
    schema = StructType(
        [
            StructField(_PID, IntegerType(), False),
            StructField(_OFF, ttype, False),
            StructField(_PRI, BooleanType(), False),
        ]
    )
    from ..functions import local_rows_df

    off_df = local_rows_df(parted.sparkSession, offs, schema)
    return off_df, running


def global_cumsum(
    df: DataFrame,
    value_col: str,
    order_cols: OrderCols,
    out_col: str,
    nparts: Optional[int] = None,
):
    """``sum(value) OVER (ORDER BY order_cols ROWS UNBOUNDED PRECEDING)``
    without a single-partition exchange.  Returns ``(df + out_col,
    grand_total)`` — the total falls out of the prefix pass for free, so
    callers never need a second full aggregation job.

    Ordering contract (same as the SQL window, made explicit): for
    row-level reproducibility ``order_cols`` must be a total order
    (include a unique tie-break) — with duplicate keys, rows inside a
    tie group receive SOME valid prefix order, and which row gets which
    intermediate value is not deterministic.  What IS deterministic with
    ties: the multiset of values per group, and the group-boundary
    running total (ties never split across range partitions — equal
    keys compare equal against every range boundary — so each group's
    max(out_col) is the exact prefix sum through that group).
    tests/test_distwindow.py locks both."""
    parted = _range_partitioned(df, order_cols, nparts)
    off_df, total = _prefix_offsets(
        parted, F.sum(F.col(value_col)), F.count(F.col(value_col))
    )
    ttype = off_df.schema[_OFF].dataType
    w = (
        W.partitionBy(_PID)
        .orderBy(*[F.col(c) if isinstance(c, str) else c for c in order_cols])
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # SQL running sum is NULL only while the GLOBAL prefix has no
    # non-NULL value; a partition-local all-NULL prefix after a non-NULL
    # earlier partition must surface the offset alone.
    cum = F.when(
        F.col(_LOC).isNull() & ~F.col(_PRI), F.lit(None).cast(ttype)
    ).otherwise(F.col(_OFF) + F.coalesce(F.col(_LOC), F.lit(0).cast(ttype)))
    out = (
        parted.withColumn(_LOC, F.sum(F.col(value_col)).over(w))
        .join(F.broadcast(off_df), _PID)
        .withColumn(out_col, cum)
        .drop(_PID, _LOC, _OFF, _PRI)
    )
    return out, total


def global_row_number(
    df: DataFrame,
    order_cols: OrderCols,
    out_col: str,
    nparts: Optional[int] = None,
):
    """``row_number() OVER (ORDER BY order_cols)`` without a
    single-partition exchange.  Returns ``(df + out_col, n_rows)``.
    ``order_cols`` must be a total order (include a unique tie-break) or
    the numbering is non-deterministic — same contract as the window."""
    parted = _range_partitioned(df, order_cols, nparts)
    off_df, n_rows = _prefix_offsets(
        parted, F.count(F.lit(1)).cast("bigint"), F.count(F.lit(1))
    )
    w = W.partitionBy(_PID).orderBy(
        *[F.col(c) if isinstance(c, str) else c for c in order_cols]
    )
    out = (
        parted.withColumn(_LOC, F.row_number().over(w).cast("bigint"))
        .join(F.broadcast(off_df), _PID)
        .withColumn(out_col, F.col(_OFF) + F.col(_LOC))
        .drop(_PID, _LOC, _OFF, _PRI)
    )
    return out, int(n_rows)


def global_ntile(
    df: DataFrame,
    n_tiles: int,
    order_cols: OrderCols,
    out_col: str,
    nparts: Optional[int] = None,
) -> DataFrame:
    """``ntile(n) OVER (ORDER BY order_cols)`` via the two-phase row
    number.  SQL-standard ntile gives the first ``r = N mod n`` buckets
    ``q+1 = N div n + 1`` rows and the rest ``q`` (DuckDB and Spark
    agree), so with the exact global row number the bucket of row ``rn``
    is pure integer arithmetic on driver-known constants — bit-for-bit
    the single-partition window, ties broken by the caller's tie-break
    column."""
    ranked, n_rows = global_row_number(df, order_cols, "__dw_rn", nparts)
    if n_rows == 0:
        return ranked.withColumn(out_col, F.lit(None).cast("int")).drop("__dw_rn")
    q, r = divmod(n_rows, n_tiles)
    if q == 0:
        bucket = "CAST(__dw_rn AS INT)"
    else:
        cut = r * (q + 1)  # rows living in the size-(q+1) buckets
        bucket = (
            f"CAST(CASE WHEN __dw_rn <= {cut} THEN (__dw_rn - 1) DIV {q + 1} "
            f"ELSE {r} + (__dw_rn - 1 - {cut}) DIV {q} END AS INT) + 1"
        )
    return ranked.withColumn(out_col, F.expr(bucket)).drop("__dw_rn")
