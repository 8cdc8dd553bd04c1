"""transformWithState capability twin over applyInPandasWithState.

Spark 4's native ``transformWithStateInPandas`` (typed per-key state
variables, timers, TTL eviction via a StatefulProcessor class) cannot
run in this environment: its Python worker imports ``google.protobuf``,
which is not installed and cannot be (no pip).  This module implements
the same CAPABILITY CONTRACT on the API that does run —
``applyInPandasWithState`` — so custom stateful streaming operators are
written against the Spark-4-shaped surface and the adapter is the only
thing that changes when the native op becomes available:

* ``StatefulProcessor`` — subclass with ``init(handle)``,
  ``handleInputRows(key, rows)``, ``handleExpiredTimer(key)``;
* typed per-key state variables — ``ValueState`` / ``ListState`` /
  ``MapState`` obtained from the handle, stored under named slots;
* timers — ``handle.register_timer(expiry_ms)`` /
  ``delete_timer(expiry_ms)`` / ``list_timers()``, the native timer
  surface: a key may hold MULTIPLE registered timers (absolute epoch
  millis in both modes, as in the native API); they persist in the
  state row until fired or deleted.  GroupState exposes only one
  timeout slot, so the adapter arms the EARLIEST deadline and, when it
  fires, drains every expired timer (one ``handleExpiredTimer`` call
  per timer, in deadline order) before re-arming the next —
  event-time timers fire when the watermark passes the deadline,
  processing-time timers when the wall clock does;
* eviction — ``handle.clearAll()`` removes the key's state row
  entirely (including its timers); state also evicts when every
  variable is cleared.

Scale shape is inherited from the underlying state store: one state row
per key, sharded across executors by the grouping key, with the
serialized variables as the row payload.  State values must be
JSON-serializable (ints/floats/strings/lists/dicts) — the typed
accessors validate on update so a type drift fails at the operator, not
at replay.
"""

from __future__ import annotations

import json
from typing import Any, Callable, Iterator

from pyspark.sql import DataFrame

_STATE_SCHEMA = "state_json string"


class _TypedState:
    """Base for named, typed state slots over the per-key store dict."""

    _type: type = object

    def __init__(self, store: dict, name: str):
        self._store = store
        self._name = name

    def exists(self) -> bool:
        return self._name in self._store

    def get(self) -> Any:
        return self._store.get(self._name)

    def clear(self) -> None:
        self._store.pop(self._name, None)

    def _check(self, value: Any) -> Any:
        if not isinstance(value, self._type):
            raise TypeError(
                f"state slot '{self._name}' expects {self._type.__name__}, "
                f"got {type(value).__name__}"
            )
        json.dumps(value)  # serializability gate — fail at update time
        return value


class ValueState(_TypedState):
    """Single JSON-serializable value per key."""

    _type = object

    def update(self, value: Any) -> None:
        self._store[self._name] = self._check(value)


class ListState(_TypedState):
    """Append-only list per key (native ListState's put/appendValue)."""

    _type = list

    def put(self, values: list) -> None:
        self._store[self._name] = list(self._check(values))

    def append_value(self, value: Any) -> None:
        json.dumps(value)
        self._store.setdefault(self._name, []).append(value)

    def get(self) -> list:
        return self._store.get(self._name, [])


class MapState(_TypedState):
    """String-keyed map per key (native MapState's getValue/updateValue)."""

    _type = dict

    def get(self) -> dict:
        return self._store.get(self._name, {})

    def update_value(self, k: str, v: Any) -> None:
        json.dumps(v)
        self._store.setdefault(self._name, {})[str(k)] = v

    def get_value(self, k: str, default: Any = None) -> Any:
        return self._store.get(self._name, {}).get(str(k), default)

    def remove_key(self, k: str) -> None:
        self._store.get(self._name, {}).pop(str(k), None)


# reserved store slot for the key's registered timer deadlines — rides
# in the same serialized state row, so timers persist across
# micro-batches and checkpoint restarts exactly like state variables
_TIMERS_KEY = "__timers__"


class StatefulProcessorHandle:
    """Per-invocation handle: typed state accessors + timer/eviction
    controls, backed by the deserialized store dict."""

    def __init__(self, store: dict):
        self._store = store

    def get_value_state(self, name: str) -> ValueState:
        return ValueState(self._store, name)

    def get_list_state(self, name: str) -> ListState:
        return ListState(self._store, name)

    def get_map_state(self, name: str) -> MapState:
        return MapState(self._store, name)

    def register_timer(self, expiry_ms: int) -> None:
        """Register a timer at an ABSOLUTE epoch-millis deadline (native
        ``registerTimer`` semantics, both time modes).  A key may hold
        any number of timers; each fires once — event-time timers when
        the watermark passes the deadline, processing-time timers when
        the wall clock does.  Registering an already-registered deadline
        is a no-op (native: one timer per (key, timestamp))."""
        ts = self._store.setdefault(_TIMERS_KEY, [])
        w = int(expiry_ms)
        if w not in ts:
            ts.append(w)
            ts.sort()

    def delete_timer(self, expiry_ms: int) -> None:
        """Delete a registered timer by its deadline (native
        ``deleteTimer``); unknown deadlines are a no-op."""
        ts = self._store.get(_TIMERS_KEY, [])
        try:
            ts.remove(int(expiry_ms))
        except ValueError:
            return
        if not ts:
            self._store.pop(_TIMERS_KEY, None)

    def list_timers(self) -> list[int]:
        """The key's registered deadlines, ascending (native
        ``listTimers``)."""
        return list(self._store.get(_TIMERS_KEY, []))

    def clear_all(self) -> None:
        """Evict the key's entire state row, timers included.  State
        written AFTER this call in the same invocation is kept — the
        row is removed only if the store is still empty when the
        invocation ends (native semantics: clearing then repopulating
        leaves live state)."""
        self._store.clear()


class StatefulProcessor:
    """Subclass contract — mirrors the native StatefulProcessor."""

    def init(self, handle: StatefulProcessorHandle) -> None:  # noqa: B027
        pass

    def handleInputRows(self, key: tuple, rows: Iterator) -> Iterator:
        raise NotImplementedError

    def handleExpiredTimer(self, key: tuple) -> Iterator:
        return iter(())

    def close(self) -> None:  # noqa: B027
        pass


def transform_with_state(
    df: DataFrame,
    group_cols: list[str],
    processor_factory: Callable[[], StatefulProcessor],
    output_schema: str,
    output_mode: str = "update",
    time_mode: str = "eventTime",
) -> DataFrame:
    """Run a StatefulProcessor over a (streaming) DataFrame grouped by
    ``group_cols`` — the transformWithState surface executed via
    applyInPandasWithState.

    ``time_mode``: 'eventTime' (timers vs the watermark — requires an
    upstream withWatermark), 'processingTime' (wall clock), or 'none'
    (no timers).  Timer deadlines are absolute epoch millis in both
    modes (native ``registerTimer`` semantics).

    ``handleExpiredTimer`` is called once per expired timer, in deadline
    order; processors that accept a second positional argument receive
    the expired deadline (the native ``expiredTimerInfo``), while the
    single-argument form stays supported for existing code."""
    import inspect
    import time

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    timeout_conf = {
        "eventTime": GroupStateTimeout.EventTimeTimeout,
        "processingTime": GroupStateTimeout.ProcessingTimeTimeout,
        "none": GroupStateTimeout.NoTimeout,
    }[time_mode]

    def run(key, pdfs, state: GroupState):
        store = json.loads(state.get[0]) if state.exists else {}
        handle = StatefulProcessorHandle(store)
        proc = processor_factory()
        proc.init(handle)
        # does handleExpiredTimer take (key) or (key, expired_ts)?
        wants_ts = len(inspect.signature(proc.handleExpiredTimer).parameters) >= 2
        now_ms = (
            state.getCurrentWatermarkMs()
            if time_mode == "eventTime"
            else int(time.time() * 1000)
        )
        out = []
        try:
            if state.hasTimedOut:
                # drain every timer whose deadline has passed — GroupState
                # armed only the earliest, but by fire time several may be
                # due; each gets its own handleExpiredTimer call, and the
                # processor may delete/register timers or clear state
                # between calls.  The fallback to the earliest timer covers
                # the clamped-past-deadline arm (deadline <= watermark at
                # registration), where the fire threshold can sit below
                # the stored deadline.
                timers = handle.list_timers()
                expired = [t for t in timers if t <= now_ms] or timers[:1]
                for t in expired:
                    handle.delete_timer(t)
                    args = (key, t) if wants_ts else (key,)
                    out.extend(proc.handleExpiredTimer(*args))
            else:
                out = list(proc.handleInputRows(key, pdfs))
        finally:
            proc.close()
        # removal is decided solely on final emptiness: clear_all followed
        # by new writes keeps the row (native semantics), and timers ride
        # in the store so a pending timer keeps its row alive
        if not store:
            if state.exists:
                state.remove()
        else:
            state.update((json.dumps(store, sort_keys=True),))
            timers = handle.list_timers()
            if timers and time_mode == "eventTime":
                # GroupState rejects a timeout at/below the current
                # watermark; clamp so a timer that should already have
                # fired fires at the next watermark advance
                state.setTimeoutTimestamp(max(timers[0], now_ms + 1))
            elif timers and time_mode == "processingTime":
                state.setTimeoutDuration(max(timers[0] - now_ms, 1))
        yield from out

    return df.groupBy(*group_cols).applyInPandasWithState(
        run,
        outputStructType=output_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode=output_mode,
        timeoutConf=timeout_conf,
    )
