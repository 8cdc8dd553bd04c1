"""Query registry.

Every operator capability is registered as a named query: a PySpark
callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) the
equivalent ANSI SQL a DuckDB oracle can run on the same parquet tables.
``__spark_entry__.py`` exposes this registry to the driver's correctness
harness.  ``bench=True`` marks the headline queries bench.py times.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: Optional[str] = None
    bench: bool = False
    doc: str = field(default="")


QUERIES: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, bench: bool = False):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = Query(name, fn, oracle, bench, (fn.__doc__ or "").strip())
        return fn

    return deco


_LOADED = False


def load_all() -> dict[str, Query]:
    """Import every operator module so its @register calls run."""
    global _LOADED
    if not _LOADED:
        # Import order == registration order == the order the driver's
        # correctness harness walks queries() (it checks a bounded prefix
        # per round).  Modules whose queries lack a driver-green row from
        # the previous round register FIRST so they get hard-signal
        # coverage; already-driver-verified modules (dedup/graph/
        # multimodal/relational, all green in CORRECTNESS_r01) rotate to
        # the back.
        from .operators import tpch_ext  # noqa: F401
        from .operators import textops  # noqa: F401
        from .operators import similarity  # noqa: F401
        from .operators import udtf_ops  # noqa: F401
        from .streaming import events  # noqa: F401
        from .operators import relational_ext  # noqa: F401
        from .operators import dedup  # noqa: F401
        from .operators import graph  # noqa: F401
        from .operators import multimodal  # noqa: F401
        from .operators import relational  # noqa: F401

        _LOADED = True
    return QUERIES
