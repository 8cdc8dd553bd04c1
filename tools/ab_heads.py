"""Interleaved A/B runner for bench heads (guide §1; VERDICT r14 Next #2/#8:
every perf claim as a same-box interleaved A/B with spreads).

Runs the EXACT bench.py protocol (multifile base, table warm, noop sink,
one warmup + N timed runs, scoped-cache release per head) for a chosen
set of heads, optionally overriding the payload-table file targets, and
prints one JSON line per configuration.  Alternating configurations
WITHIN one process keeps JVM/JIT state identical across arms — the
drift-proof way to compare layouts.  For cross-binary A/Bs (e.g. the
r13-vs-r14 worktree comparison) run one process per repo with --repo.

Usage:
  python tools/ab_heads.py --heads ann_ivf_kmeans,ann_pq_adc \
      --arms "doc16_emb16:documents=16,embeddings=16" \
             "doc16_emb256:documents=16,embeddings=256" \
      --rounds 3
  python tools/ab_heads.py --repo /root/r13tree --heads ann_ivf_kmeans --rounds 3
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap.add_argument("--heads", required=True)
    ap.add_argument(
        "--arms",
        nargs="*",
        default=["default:"],
        help="name:table=kb,table=kb overrides of bench.FILE_TGT_KB",
    )
    ap.add_argument("--rounds", type=int, default=3, help="timed runs per head per arm")
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    import bench
    from oxidsql_spark.registry import load_all
    from oxidsql_spark.session import get_spark
    from oxidsql_spark.sources import TABLES, table

    heads = args.heads.split(",")
    queries = load_all()
    for h in heads:
        assert h in queries, f"unknown head {h}"

    sf_dir_env = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("oxidsql-ab")

    arms = []  # (name, overrides dict)
    for spec in args.arms:
        name, _, ov = spec.partition(":")
        overrides = {}
        if ov:
            for kv in ov.split(","):
                t, _, kb = kv.partition("=")
                overrides[t] = int(kb)
        arms.append((name, overrides))

    # Build every arm's base up front (and warm footers) so build cost
    # never lands inside a timed window.
    bases: dict[str, str] = {}
    have_tgt = hasattr(bench, "FILE_TGT_KB")
    for name, overrides in arms:
        if have_tgt:
            saved = dict(bench.FILE_TGT_KB)
            bench.FILE_TGT_KB.update(overrides)
        try:
            try:  # prune=False keeps every arm's base alive (r15 bench.py)
                base, files = bench._multifile_base(spark, sf_dir_env, prune=False)
            except TypeError:  # older worktree binaries have no prune flag
                base, files = bench._multifile_base(spark, sf_dir_env)
        finally:
            if have_tgt:
                bench.FILE_TGT_KB.clear()
                bench.FILE_TGT_KB.update(saved)
        bases[name] = base
        for t in TABLES:
            table(spark, base, t).count()
        print(f"# arm {name}: base={base} files={files}", file=sys.stderr)

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    from oxidsql_spark.cachescope import release_scoped_caches

    # results[arm][head] = list of per-run seconds across interleaved visits
    results: dict[str, dict[str, list[float]]] = {
        name: {h: [] for h in heads} for name, _ in arms
    }
    for rnd in range(args.rounds):
        for name, _ in arms:
            base = bases[name]
            for h in heads:
                spark.sparkContext.setJobDescription(f"ab|{name}|{h}|warmup")
                materialize(queries[h].fn(spark, base))
                spark.sparkContext.setJobDescription(f"ab|{name}|{h}|timed")
                t0 = time.perf_counter()
                materialize(queries[h].fn(spark, base))
                dt = time.perf_counter() - t0
                results[name][h].append(round(dt, 3))
                release_scoped_caches()
                spark.sparkContext.setJobDescription(None)
            print(
                f"# round {rnd} arm {name}: "
                + " ".join(f"{h}={results[name][h][-1]}" for h in heads),
                file=sys.stderr,
            )

    for name, _ in arms:
        per = results[name]
        med = {h: sorted(v)[len(v) // 2] for h, v in per.items()}
        print(
            json.dumps(
                {
                    "arm": name,
                    "repo": args.repo,
                    "median": med,
                    "total_median": round(sum(med.values()), 3),
                    "runs": per,
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
