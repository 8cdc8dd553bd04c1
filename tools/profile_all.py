"""Time every registered query at a given SF dir (default sf0.1) and
print the slowest — the feedback loop for scale work between rounds.

Usage: python tools/profile_all.py [sf_dir] [threshold_sec]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oxidsql_spark.registry import load_all
from oxidsql_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    queries = load_all()
    spark = get_spark("oxidsql-profile")
    queries["ref_scan"].fn(spark, sf_dir).count()  # warm JVM

    times: dict[str, float | str] = {}
    for name in sorted(queries):
        t0 = time.perf_counter()
        try:
            queries[name].fn(spark, sf_dir).count()
            times[name] = round(time.perf_counter() - t0, 2)
        except Exception as ex:  # noqa: BLE001 — survey run, report and move on
            times[name] = f"ERR {str(ex)[:80]}"

    numeric = {k: v for k, v in times.items() if isinstance(v, float)}
    for name, t in sorted(times.items(), key=lambda kv: -(kv[1] if isinstance(kv[1], float) else 1e9)):
        if not isinstance(t, float) or t > threshold:
            print(f"{name:35s} {t}")
    print(f"TOTAL {round(sum(numeric.values()), 1)}s over {len(numeric)} queries")
    spark.stop()


if __name__ == "__main__":
    main()
