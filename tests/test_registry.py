"""Registry invariants: the committed priority list stays valid and the
external harness's checked prefix keeps its composition guarantees."""

from __future__ import annotations

from oxidsql_spark.registry import _PRIORITY, _latest_green_rounds, load_all

WINDOW = 50  # the external harness checks this many queries() entries


def test_every_unverified_query_is_prioritized():
    """Round-3 regression guard: a query registered without a single
    driver-green row in any committed CORRECTNESS_r*.json MUST sit in
    _PRIORITY, or it can fall outside the checked window and ship with
    only in-repo verification (this happened to 4 queries in round 3)."""
    green = _latest_green_rounds()
    unverified = [n for n in load_all() if n not in green]
    missing = [n for n in unverified if n not in _PRIORITY]
    assert not missing, f"never-driver-verified queries not in _PRIORITY: {missing}"


def test_stable_pool_rotates_stalest_first():
    """The stable queries inside the checked window must be at most as
    recently verified as every stable query excluded from it — i.e. the
    window targets the least-recently-verified queries, so no stable
    query's verification goes stale indefinitely."""
    green = _latest_green_rounds()
    if not green:
        return  # fresh tree without correctness files: nothing to rotate on
    names = list(load_all())
    stable_in = [n for n in names[:WINDOW] if n not in set(_PRIORITY)]
    stable_out = [n for n in names[WINDOW:] if n not in set(_PRIORITY)]
    if stable_in and stable_out:
        assert max(green.get(n, 0) for n in stable_in) <= min(
            green.get(n, 0) for n in stable_out
        ), "a stale stable query is excluded from the window while a fresher one is in"


def test_priority_names_exist_and_unique():
    queries = load_all()
    missing = [n for n in _PRIORITY if n not in queries]
    assert not missing, f"stale _PRIORITY names: {missing}"
    assert len(set(_PRIORITY)) == len(_PRIORITY), "duplicate _PRIORITY names"


def test_priority_fits_checked_window():
    window = list(load_all())[:WINDOW]
    outside = [n for n in _PRIORITY if n not in window]
    assert not outside, (
        f"priority names fall outside the {WINDOW}-query window: {outside} "
        "(raise the interleave ratio or retire verified names)"
    )


def test_window_still_reverifies_stable_queries():
    """The checked prefix must always include non-priority (long-stable)
    queries so regressions in verified queries keep being caught."""
    window = list(load_all())[:WINDOW]
    stable = [n for n in window if n not in set(_PRIORITY)]
    assert len(stable) >= 5, f"only {len(stable)} stable queries in window"


def test_every_query_has_an_oracle():
    """Project invariant since round 2: zero rows-only queries — every
    registered query is DuckDB-verifiable (approximate ops register
    self-verifying bound checks instead of raw sketch output)."""
    no_oracle = [n for n, q in load_all().items() if q.oracle is None]
    assert not no_oracle, f"queries without oracle: {no_oracle}"


def test_registration_is_deterministic():
    names = list(load_all())
    assert names == list(load_all())  # second call: same order, same set
