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
* timers — ``handle.registerTimer(ts_or_duration)``: event-time timers
  fire when the watermark passes the registered timestamp,
  processing-time timers when the wall-clock duration elapses
  (mapped onto GroupState's timeout conf — one armed timer per key,
  which is also the native op's practical per-key pattern);
* eviction — ``handle.clearAll()`` removes the key's state row
  entirely; state also evicts when every variable is cleared.

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


class StatefulProcessorHandle:
    """Per-invocation handle: typed state accessors + timer/eviction
    controls, backed by the deserialized store dict."""

    def __init__(self, store: dict):
        self._store = store
        self._timer: int | None = None
        self._cleared = False

    def get_value_state(self, name: str) -> ValueState:
        return ValueState(self._store, name)

    def get_list_state(self, name: str) -> ListState:
        return ListState(self._store, name)

    def get_map_state(self, name: str) -> MapState:
        return MapState(self._store, name)

    def register_timer(self, when_ms: int) -> None:
        """Arm the key's timer.  Event-time mode: absolute epoch millis —
        fires when the WATERMARK passes it.  Processing-time mode:
        duration millis from now.  One armed timer per key; re-register
        on every invocation to keep it alive (GroupState semantics)."""
        self._timer = int(when_ms)

    def clear_all(self) -> None:
        """Evict the key's entire state row."""
        self._store.clear()
        self._cleared = True


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
    (no timers)."""
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
        try:
            if state.hasTimedOut:
                out = list(proc.handleExpiredTimer(key))
            else:
                out = list(proc.handleInputRows(key, pdfs))
        finally:
            proc.close()
        if handle._cleared or not store:
            if state.exists:
                state.remove()
        else:
            state.update((json.dumps(store, sort_keys=True),))
            if handle._timer is not None:
                if time_mode == "eventTime":
                    # GroupState rejects a timeout at/below the current
                    # watermark; clamp so a timer that should already
                    # have fired fires at the next watermark advance
                    wm = state.getCurrentWatermarkMs()
                    state.setTimeoutTimestamp(max(handle._timer, wm + 1))
                elif time_mode == "processingTime":
                    state.setTimeoutDuration(handle._timer)
        yield from out

    return df.groupBy(*group_cols).applyInPandasWithState(
        run,
        outputStructType=output_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode=output_mode,
        timeoutConf=timeout_conf,
    )
