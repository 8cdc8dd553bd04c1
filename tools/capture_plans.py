"""Dump .explain("formatted") for bench heads into plans/r15/.

Usage: python tools/capture_plans.py before|after [head ...]
(default: all bench heads).  Mirrors bench.py's multifile base so the
captured scan nodes (file counts, PushedFilters, ReadSchema) are the
ones the bench actually executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oxidsql_spark.registry import load_all
from oxidsql_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1]
    heads = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("oxidsql-plans")
    from bench import _multifile_base

    from oxidsql_spark.cachescope import release_scoped_caches

    sf_dir, _ = _multifile_base(spark, sf_dir)
    qs = load_all()
    if not heads:
        heads = sorted(n for n, q in qs.items() if q.bench)
    for name in heads:
        try:
            df = qs[name].fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # capture the failure, don't lose the batch
            plan = f"ERROR capturing plan: {e!r}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        release_scoped_caches()
        print(f"captured {name}_{suffix}")
    spark.stop()


if __name__ == "__main__":
    main()
