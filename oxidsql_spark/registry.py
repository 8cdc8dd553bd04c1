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
        from .operators import (  # noqa: F401
            dedup,
            graph,
            multimodal,
            relational,
            relational_ext,
            similarity,
            textops,
            tpch_ext,
            udtf_ops,
        )
        from .streaming import events  # noqa: F401

        _LOADED = True
    return QUERIES
