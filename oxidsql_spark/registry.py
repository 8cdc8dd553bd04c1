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


# Static, committed front-of-registry list.  The external correctness
# harness checks a bounded prefix of queries() per round, so ordering is
# test-coverage prioritization.  Policy:
#   * _PRIORITY holds queries with no driver-green verification yet —
#     brand-new queries and ones whose implementation was rewritten this
#     round.  When adding a NEW query, append its name here.  At the
#     START of a round, retire names whose verification has since landed.
#   * The remaining (stable) pool interleaves 7:1 behind the priority
#     names, ordered STALEST-FIRST: by latest driver-green round
#     ascending (from the committed CORRECTNESS_r*.json files — part of
#     the clone, so a fresh checkout orders identically), registration
#     order as tie-break.  Each round the checked prefix therefore
#     re-verifies the least-recently-verified stable queries, and the
#     whole pool cycles through the window every ~3 rounds instead of
#     the same fixed sample being re-checked forever.
# tests/test_registry.py locks the window invariants, including that
# every never-green query is listed here.
_PRIORITY: tuple[str, ...] = (
    # round-13 start: all 7 round-12 priority names were driver-green in
    # CORRECTNESS_r12.json and retire to the stable rotation, which now
    # fronts the 31 r8-stale rows (VERDICT r12 missing #4).  With the
    # session's 9 brand-new faces the priority block holds 22 names, so
    # the 50-row window reaches ~26 stable rows — all but ~5 of the r8
    # cohort clear this round; the stalest-first ordering fronts the
    # remainder in r14 automatically.
    # new in round 13 — never driver-checked:
    "mm_audio_dedup",
    "mm_curate_q",
    "embeddings_contrastive_mine",
    "events_attribution_linear",
    "mm_audio_dedup_incremental",
    "corpus_curriculum_schedule",
    "mm_image_dedup_incremental",
    "mm_video_dedup_incremental",
    "embeddings_knn_eval",
    "bpe_fertility_by_lang",
    "quality_classifier_pr",
    "bpe_train_merges_batched",
    "mm_video_dedup",
    "quality_classifier_score",
    "corpus_curate_clf_q",
    "seq_pack_bpe_stats",
    "dedup_cap_copies",
    "corpus_shuffle_shards",
    # rewritten in round 13 (encode now joins the frozen vocab artifact
    # — zero merge replay for training-universe words — with a
    # segmented replay only for out-of-vocabulary types):
    "bpe_encode_stats",
    # rewritten in round 13 (CC pattern IIN-guarded with consistent
    # separators; phone pattern covers parenthesized and +1 forms):
    "text_redact_pii",
    # rewritten in round 13 (oversized-cell sub-training folded into
    # one keyed Lloyd pass per iteration + recursion past the k_sub
    # ceiling — still a no-op at fixture scale, re-prove the path):
    "dedup_semantic",
    # rewritten in round 13 (sampling re-pointed at REALLY parsed frame
    # counts; the fake is now only the unknown-format fallback):
    "mm_frame_sample",
    # rewritten in round 13 (closure over pair-touched images only,
    # persisted pair list — the video-dedup discipline):
    "mm_caption_dedup",
)


def _latest_green_rounds() -> dict[str, int]:
    """Latest round each query was driver-green, parsed from the
    committed CORRECTNESS_r*.json files at the repo root.  Missing or
    unparsable files degrade to {} (pure registration order)."""
    import json
    import re
    from pathlib import Path

    latest: dict[str, int] = {}
    root = Path(__file__).resolve().parent.parent
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", p.name)
        rnd = int(m.group(1)) if m else 0
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        for name, v in data.items():
            if (
                isinstance(v, dict)
                and v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match")
            ):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def load_all() -> dict[str, Query]:
    """Import every operator module so its @register calls run."""
    global _LOADED
    if not _LOADED:
        from .operators import (  # noqa: F401
            analytics_ext,
            corpus_ext,
            dedup,
            graph,
            layout_ops,
            multimodal,
            quality,
            relational,
            relational_ext,
            scd,
            similarity,
            textops,
            tpch_ext,
            udtf_ops,
        )
        from .streaming import events  # noqa: F401

        # the capstone registers LAST: its oracle nests oracles the
        # operator modules registered above
        from . import pipeline  # noqa: F401

        front = [n for n in _PRIORITY if n in QUERIES]
        in_front = set(front)
        reg_index = {n: i for i, n in enumerate(QUERIES)}
        green = _latest_green_rounds()
        rest = sorted(
            (n for n in QUERIES if n not in in_front),
            key=lambda n: (green.get(n, 0), reg_index[n]),
        )
        ordered: list[str] = []
        fi = ri = 0
        while fi < len(front) or ri < len(rest):
            for _ in range(7):
                if fi < len(front):
                    ordered.append(front[fi])
                    fi += 1
            if ri < len(rest):
                ordered.append(rest[ri])
                ri += 1
        # Reorder in place so earlier `from .registry import QUERIES`
        # bindings stay valid.
        snapshot = {n: QUERIES[n] for n in ordered}
        QUERIES.clear()
        QUERIES.update(snapshot)
        _LOADED = True
    return QUERIES
