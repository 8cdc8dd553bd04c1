"""Scoped lifecycle for operator-internal persists.

Several operators persist an intermediate the same query reads more than
once (the AllPairs shingle-array index in ``operators.dedup``, the
range-partitioned frame in ``operators.distwindow``, the edge list and
label generations in ``operators.graph``).  A bare ``DataFrame.persist``
has no owner: the blocks outlive the query and accumulate in storage
memory until LRU eviction, and re-running the same query logs Spark's
``CacheManager: Asked to cache already cached data`` warning on every
re-persist of an identical plan.

``scoped_persist`` fixes both:

* identical-plan reuse is silent — if the plan is already in the
  session's CacheManager (e.g. a bench warmup run built it), the call is
  a no-op and the execution engine substitutes the cached data anyway
  (CacheManager.useCachedData matches plan fragments, not DataFrame
  object identity);
* every persist this module performs is tracked, and
  ``release_scoped_caches()`` unpersists them all — callers that own the
  query lifecycle (bench.py per timed query, tests, a REPL statement
  loop) call it after the consuming action.

Contract: release AFTER the final action on the query's result, and
treat released results as consumed.  Re-executing a previously returned
DataFrame after release recomputes its persisted intermediates; for
``distwindow`` frames that recomputation re-samples range boundaries, so
the partition-id ↔ prefix-offset pairing the first execution collected
is no longer guaranteed.  (The same is true of LRU eviction with plain
``persist``; the scope just makes the lifecycle explicit.)

The reference engine's analogue is its buffer-manager pin/unpin
discipline (/root/reference/src/storage/buffer_manager.rs) — here the
"pages" are whole cached plans and Spark manages the bytes; only the
ownership question needs solving, and this module is the owner ledger.

Threading: the ledger is a plain module list — correct for the
sequential query-at-a-time lifecycles every harness here uses (driver,
bench, tests, REPL).  Concurrent query submission from multiple threads
would need a per-thread or lock-guarded scope; releasing from one
thread while another's query still reads a tracked cache is the same
hazard as any cross-thread unpersist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SCOPED: list[DataFrame] = []


def _plan_already_cached(df: DataFrame) -> bool:
    """True if the session's CacheManager already holds this plan (from a
    previous run of the same query).  Falls back to False — worst case is
    Spark's own re-persist warning, never wrong results."""
    try:
        cm = df.sparkSession._jsparkSession.sharedState().cacheManager()
        return bool(cm.lookupCachedData(df._jdf).isDefined())
    except Exception:
        return False


def scoped_persist(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for ``release_scoped_caches``.

    If an identical plan is already cached (same query re-run while its
    caches are still alive), returns ``df`` untouched: execution will hit
    the existing cache via plan matching, and no duplicate entry or
    CacheManager warning is produced."""
    if _plan_already_cached(df):
        return df
    df.persist()
    _SCOPED.append(df)
    return df


def release_scoped_caches(blocking: bool = True) -> int:
    """Unpersist every scope-tracked DataFrame; returns how many were
    released.  Unpersisting an already-unpersisted frame is a Spark
    no-op, so operators that free intermediates early (graph's
    superseded label generations) stay correct."""
    n = 0
    while _SCOPED:
        df = _SCOPED.pop()
        try:
            df.unpersist(blocking=blocking)
            n += 1
        except Exception:
            pass
    return n


def scoped_cache_count() -> int:
    """How many persists the scope currently tracks (test hook)."""
    return len(_SCOPED)
