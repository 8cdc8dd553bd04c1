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


def scoped_persist(df: DataFrame, reuse_ok: bool = True) -> DataFrame:
    """Persist ``df`` and register it for ``release_scoped_caches``.

    If an identical plan is already cached (same query re-run while its
    caches are still alive), returns ``df`` untouched: execution will hit
    the existing cache via plan matching, and no duplicate entry or
    CacheManager warning is produced.

    Pass ``reuse_ok=False`` for plans carrying a ``df.observe``
    CollectMetrics node: CacheManager substitution on an already-cached
    identical plan could satisfy the action without executing the
    metrics node, leaving ``Observation.get`` blocked forever.  Such
    plans always persist fresh (iterative loops make each generation's
    plan distinct anyway, so the only cost is a redundant-persist
    warning in the re-run-while-warm corner the check exists for)."""
    if reuse_ok and _plan_already_cached(df):
        return df
    df.persist()
    _SCOPED.append(df)
    return df


_SCOPED_CP: list[DataFrame] = []


def scoped_local_checkpoint(df: DataFrame) -> DataFrame:
    """Eager ``localCheckpoint`` with scope-tracked storage: truncates
    the plan's lineage (THE fix for iterative operators whose each
    generation references the previous one more than once — the
    logical tree otherwise doubles per iteration, and at ~16 iterations
    plan analysis/stringification OOMs the driver) and registers the
    checkpoint RDD for ``release_scoped_caches``.

    Stronger consumed-after-release contract than ``scoped_persist``:
    localCheckpoint is non-reliable — once released, the frame CANNOT
    be recomputed (its lineage is gone), so re-executing a returned
    checkpointed result after release raises instead of silently
    recomputing."""
    cp = df.localCheckpoint(eager=True)
    _SCOPED_CP.append(cp)
    return cp


def free_local_checkpoint(df: DataFrame) -> None:
    """Release a checkpointed generation's storage immediately (for
    superseded iterations inside a loop); safe double-free — release
    later is a no-op on already-unpersisted RDDs."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        plan.rdd().unpersist(False)
    except Exception:
        pass


def release_scoped_caches(blocking: bool = True) -> int:
    """Unpersist every scope-tracked DataFrame and checkpoint RDD;
    returns how many were released.  Unpersisting an already-
    unpersisted frame is a Spark no-op, so operators that free
    intermediates early (graph's superseded label generations) stay
    correct."""
    n = 0
    while _SCOPED:
        df = _SCOPED.pop()
        try:
            df.unpersist(blocking=blocking)
            n += 1
        except Exception:
            pass
    while _SCOPED_CP:
        free_local_checkpoint(_SCOPED_CP.pop())
        n += 1
    return n


def scoped_cache_count() -> int:
    """How many persists/checkpoints the scope currently tracks (test
    hook)."""
    return len(_SCOPED) + len(_SCOPED_CP)
