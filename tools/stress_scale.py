"""Scale-headroom stress: synthesize ~sf1 inputs (K copies of the sf0.1
tables with key offsets on the fact/document ids) and time a cross-
section of headline queries against both scales.

The point is evidence for the 100 TB design claims: a plan that is
pushed-down, partial-aggregated, broadcast-where-small and free of
driver-side data work should scale ~linearly in rows on a fixed-core
box.  Results are recorded in SCALE.md.

Usage: python tools/stress_scale.py [K] [out_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from oxidsql_spark.cachescope import release_scoped_caches
from oxidsql_spark.registry import load_all
from oxidsql_spark.session import get_spark
from oxidsql_spark.sources import TABLES, table

SRC = "/root/testdata/sf0.1"

# fact-side id columns to offset per copy so keys stay unique; dimension
# FKs (custkey/partkey/suppkey/regionkey…) are left in range, so joins
# still resolve — the synthesized corpus is "K× more facts per dim",
# which is exactly how real warehouses grow
_OFFSETS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

STRESS_QUERIES = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "events_hourly",
    "text_top_terms",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "terms_cms_heavy_hitters",
    "ann_ivf_kmeans",
    # r8 additions: the two heaviest new shapes — wedge enumeration
    # (quadratic in hub degree unless oriented) and the fused
    # ADC candidate stream (linear in codes, shortlist-bounded output)
    "part_triangles",
    "ann_pq_adc",
    # r9 additions: the cell-pruned composed index probe (build-once
    # cost amortized; steady-state should scale with probed-cell codes)
    # and the cluster-bounded blocked quadratic of semantic dedup
    "ann_ivfadc",
    "dedup_semantic",
    # r9 late addition (first trended in r10): position-level span
    # coverage — the explode-by-k interval union is the growth risk
    "dedup_span_coverage",
    # r10 additions: the incremental admission path end-to-end (index
    # probe + supernode merge + bucket-bounded dual commit — the
    # labels-scan fix's measured before/after) and the span-cut
    # transform (first-occurrence argmin + per-doc reassembly on top
    # of the coverage scan)
    "dedup_clusters_incremental_q",
    "dedup_span_cut",
    # r11 additions: boilerplate scrub (the hot-gram semi-join variant
    # of the span exchange) and the image/text joint dedup (band join
    # + hamming verify + closure)
    "dedup_span_scrub",
    "mm_caption_dedup",
    # r13 additions: the two new modality dedups (keyframe-set and
    # audio-shingle candidate joins are the quadratic-risk steps; the
    # verbatim mode saturates them with k-1 exact copies per track)
    # and the classifier trainer (feature-keyed gradient aggregation
    # should scale linearly in corpus rows)
    "mm_video_dedup",
    "mm_audio_dedup",
    "quality_classifier_score",
    # r15 addition (VERDICT Next #6): the large-large join head the
    # preferSortMergeJoin=false swap re-planned SMJ→SHJ — stress
    # confirms the hash build side stays spill-free under 10×
    "tpch_q7",
    # r14 addition: the Viterbi segmentation's claim is VOCABULARY-
    # boundedness — 10x corpus rows, near-identical word universe
    # (verbatim) should cost ~1x after the one tokenize+count pass;
    # the salted mode grows the universe ~k-fold and bounds that case
    "unigram_segment_stats",
]


def synthesize(spark, k: int, out_dir: str, salt_docs: bool = False) -> None:
    """salt_docs=False: verbatim copies — a DUPLICATE-SATURATED corpus
    (every doc has k-1 exact dups), the adversarial case for pair-
    enumerating dedup whose OUTPUT grows ~k² per original pair.
    salt_docs=True: every token is prefixed with the copy index, making
    copies' shingle sets disjoint — pair count grows linearly, so dedup
    wall-clock isolates PLAN scaling from output growth."""
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        dst = os.path.join(out_dir, f"{t}.parquet")
        if os.path.exists(dst):
            shutil.rmtree(dst, ignore_errors=True)
        base = table(spark, SRC, t)
        if t not in _OFFSETS:
            base.write.mode("overwrite").parquet(dst)
            continue
        span_cols = _OFFSETS[t]
        spans = base.agg(
            *[(F.max(c) + 1).alias(c) for c in span_cols]
        ).collect()[0]
        copies = None
        for i in range(k):
            c = base
            for col in span_cols:
                c = c.withColumn(col, F.col(col) + F.lit(int(spans[col]) * i))
            if salt_docs and t == "documents" and i > 0:
                c = c.withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", f"c{i}$1")
                )
            copies = c if copies is None else copies.unionByName(c)
        copies.write.mode("overwrite").parquet(dst)


def _hub_heads(spark):
    """The adversarial fixture the df-caps exist for (r13 VERDICT Next
    #2): the verbatim/salted modes grow duplicate CLIQUES, but the hub
    case is ONE value shared across 30% of the corpus (a black
    keyframe, a blank image, room tone) — uncapped, all bands collide
    and the candidate self-join goes N²/2 inside one bucket, which no
    clique fixture exercises.  Fingerprint-level generators (pure
    column expressions — the chains under test start AT the
    fingerprint hand-off), 30% hub + unique random tails, timed at
    base N and K·N: with the caps the candidate join must scale ~N."""
    from oxidsql_spark.operators.multimodal import (
        audio_dedup_from_shingles,
        caption_dedup_from_fingerprints,
        video_dedup_from_fingerprints,
    )

    HUB = 3  # 3 of every 10 docs carry the hub value
    M48 = (1 << 48) - 1

    def docs_of(n):
        return spark.range(n).select(
            F.col("id").alias("doc_id"), (F.col("id") % 97 + 10).alias("n_chars")
        )

    def fp_of(n):  # caption: 30% blank images (dhash 0), rest random
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 10 < HUB, F.lit(0))
            .otherwise(F.xxhash64("id").bitwiseAND(F.lit(M48)))
            .alias("dhash"),
        )

    def fh_of(n):  # video: 2 frames/doc, frame 0 = black for 30%
        fr = spark.range(n).select(F.col("id").alias("doc_id")).crossJoin(
            spark.range(2).select(F.col("id").cast("int").alias("frame_idx"))
        )
        return fr.select(
            "doc_id",
            "frame_idx",
            F.when(
                (F.col("frame_idx") == 0) & (F.col("doc_id") % 10 < HUB), F.lit(0)
            )
            .otherwise(F.xxhash64("doc_id", "frame_idx").bitwiseAND(F.lit(M48)))
            .alias("dhash"),
        )

    def vs_of(n):  # audio: 8 shingles/doc, 3 shared hub values for 30%
        base = spark.range(n).select(F.col("id").alias("doc_id")).crossJoin(
            spark.range(8).select(F.col("id").alias("j"))
        )
        return base.select(
            "doc_id",
            F.when((F.col("j") < 3) & (F.col("doc_id") % 10 < HUB), F.col("j") + 1)
            .otherwise(
                F.xxhash64("doc_id", "j").bitwiseAND(F.lit((1 << 30) - 1))
            )
            .alias("v"),
        )

    return {
        "hub_video_dedup": lambda n: video_dedup_from_fingerprints(
            fh_of(n), docs_of(n)
        ),
        "hub_caption_dedup": lambda n: caption_dedup_from_fingerprints(
            fp_of(n), docs_of(n)
        ),
        "hub_audio_dedup": lambda n: audio_dedup_from_shingles(
            vs_of(n), docs_of(n)
        ),
    }


def main() -> None:
    """Usage: stress_scale.py [K] [out_dir] [--salt|--hub] [--json PATH]

    --json writes (or merges into) a round-artifact JSON: one
    ``salted`` / ``verbatim`` / ``hub`` section per invocation, each
    holding {query: {base_sec, stress_sec, ratio, base_spread,
    stress_spread}} — medians of 3 warm runs with [min, max] spreads
    (round 13), the trendable form the per-round STRESS_rN.json files
    carry.  --hub times the modality-dedup chains on generated
    fingerprints with a 30% shared hub value instead of re-laying the
    sf tables (see _hub_heads)."""
    import json

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    k = int(args[0]) if args else 10
    out_dir = args[1] if len(args) > 1 else "/tmp/oxidsql_stress"
    salt = "--salt" in sys.argv
    hub = "--hub" in sys.argv
    json_path = None
    if "--json" in sys.argv:
        json_path = sys.argv[sys.argv.index("--json") + 1]
    spark = get_spark("oxidsql-stress")
    queries = load_all()
    if not hub:
        print(f"synthesizing {k}x sf0.1 into {out_dir} (salt_docs={salt}) ...")
        t0 = time.time()
        synthesize(spark, k, out_dir, salt_docs=salt)
        print(f"synthesized in {time.time() - t0:.0f}s")
    # Measurement discipline (round 13): one warm-up run + median of 3
    # timed runs with the [min, max] spread recorded per head — the
    # bench.py protocol.  Three straight rounds of SCALE.md prose had to
    # explain single-measurement cold/warm swings (r10 salted floor, r11
    # jaccard/clusters, r12 re-measures); the artifact now carries its
    # own variance so a ratio can be read against it directly.
    def timed_median(run) -> tuple[float, list[float]]:
        run()  # warm-up: plan construction + codegen + cache build
        release_scoped_caches()
        runs: list[float] = []
        for _ in range(3):
            t0 = time.time()
            run()
            runs.append(time.time() - t0)
            release_scoped_caches()
        return round(sorted(runs)[1], 2), [round(min(runs), 2), round(max(runs), 2)]

    def admit_only_sec(d: str, tag: str) -> tuple[float, list[float]]:
        """Time ONLY IncrementalClusters.admit (build excluded): the
        O(batch + touched buckets) claim says this should grow with
        the BATCH and the touched buckets' size (corpus/64 per
        bucket), never with corpus-wide scans — so 10× corpus must
        cost far less than 10× admission time.  Admission MUTATES the
        state, so each rep is a fresh build + one timed admit (a
        warm-up rep, then median of 3 — matching timed_median's shape
        at the cost of rebuilding; the r12 single-measurement artifact
        recorded one cold run and had to be re-measured by hand)."""
        import shutil as _sh

        from pyspark.sql import functions as _F

        from oxidsql_spark.operators.dedup import _BATCH_SRCS
        from oxidsql_spark.operators.graph import IncrementalClusters

        docs = table(spark, d, "documents")
        batch = docs.filter(_F.col("source").isin(*_BATCH_SRCS)).select(
            "doc_id", "text"
        )
        corpus = docs.filter(~_F.col("source").isin(*_BATCH_SRCS)).select(
            "doc_id", "text"
        )

        secs: list[float] = []
        for rep in range(4):  # rep 0 = warm-up
            path = os.path.join("/tmp", f"oxid_admitonly_{tag}_{rep}_{os.getpid()}")
            _sh.rmtree(path, ignore_errors=True)
            state = IncrementalClusters(spark, path)
            state.build(corpus)
            t0 = time.time()
            state.admit(batch)
            if rep:
                secs.append(time.time() - t0)
            release_scoped_caches()
            _sh.rmtree(path, ignore_errors=True)
        return round(sorted(secs)[1], 2), [round(min(secs), 2), round(max(secs), 2)]

    results: dict[str, dict] = {}
    if hub:
        N_BASE = 50_000
        for name, fn in _hub_heads(spark).items():
            row, sp = {}, {}
            for label, n in [("sf0.1", N_BASE), (f"{k}x", N_BASE * k)]:
                def run(n=n, fn=fn):
                    fn(n).write.format("noop").mode("overwrite").save()

                row[label], sp[label] = timed_median(run)
            ratio = round(row[f"{k}x"] / row["sf0.1"], 2) if row["sf0.1"] else None
            results[name] = {
                "base_sec": row["sf0.1"],
                "stress_sec": row[f"{k}x"],
                "ratio": ratio,
                "base_spread": sp["sf0.1"],
                "stress_spread": sp[f"{k}x"],
            }
            print(f"{name:28s} n={N_BASE}={row['sf0.1']:>8} "
                  f"{k}x={row[f'{k}x']:>8} ratio={ratio or '-'}")
        if json_path:
            blob = {}
            if os.path.exists(json_path):
                try:
                    with open(json_path) as fh:
                        blob = json.load(fh)
                except ValueError:
                    blob = {}
            blob["hub"] = {"k": k, "n_base": N_BASE, "queries": results}
            with open(json_path, "w") as fh:
                json.dump(blob, fh, indent=1, sort_keys=True)
            print(f"wrote {json_path}")
        spark.stop()
        return
    base_a, base_sp = admit_only_sec(SRC, "base")
    big_a, big_sp = admit_only_sec(out_dir, "stress")
    results["cluster_admit_only"] = {
        "base_sec": base_a,
        "stress_sec": big_a,
        "ratio": round(big_a / base_a, 2) if base_a > 0 else None,
        "base_spread": base_sp,
        "stress_spread": big_sp,
    }
    print(f"{'cluster_admit_only':28s} sf0.1={base_a:>8} {k}x={big_a:>8} "
          f"ratio={results['cluster_admit_only']['ratio'] or '-'}")
    for name in STRESS_QUERIES:
        row: dict = {}
        sp: dict = {}
        for label, d in [("sf0.1", SRC), (f"{k}x", out_dir)]:
            try:
                # noop sink, not count(): count lets Catalyst prune
                # unreferenced aggregate columns and left-joined
                # subtrees — it under-measured dedup_span_coverage 8×
                # (see bench.py's module note, fixed the same round)
                def run(d=d):
                    queries[name].fn(spark, d).write.format("noop").mode(
                        "overwrite"
                    ).save()

                row[label], sp[label] = timed_median(run)
            except Exception as ex:  # noqa: BLE001 — survey run
                row[label], sp[label] = f"ERR {str(ex)[:60]}", None
                release_scoped_caches()
        base, big = row["sf0.1"], row[f"{k}x"]
        ratio = (
            round(big / base, 2)
            if isinstance(base, float) and isinstance(big, float) and base > 0
            else None
        )
        results[name] = {
            "base_sec": base,
            "stress_sec": big,
            "ratio": ratio,
            "base_spread": sp["sf0.1"],
            "stress_spread": sp[f"{k}x"],
        }
        print(f"{name:28s} sf0.1={base:>8} {k}x={big:>8} ratio={ratio or '-'}")
    if json_path:
        blob = {}
        if os.path.exists(json_path):
            try:
                with open(json_path) as fh:
                    blob = json.load(fh)
            except ValueError:
                blob = {}
        blob[("salted" if salt else "verbatim")] = {"k": k, "queries": results}
        with open(json_path, "w") as fh:
            json.dump(blob, fh, indent=1, sort_keys=True)
        print(f"wrote {json_path}")
    spark.stop()


if __name__ == "__main__":
    main()
