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
    # round-14 start: all 23 round-13 priority names were driver-green
    # in CORRECTNESS_r13.json and retire to the stable rotation.  This
    # round's block holds 23 names (14 new + 9 rewritten), so the 50-row
    # window reaches ~27 stable rows — the stalest-first ordering
    # fronts the 4 remaining r8 rows (events_dow_hour/interarrival/
    # path_topk/pattern_match — VERDICT r13 missing #4) plus most of
    # the 42-row r9 cohort.
    # new in round 14 — never driver-checked:
    "quality_classifier_curated",
    # new in round 14 — rule-based text-quality family (textqual.py):
    # Gopher rules, unigram entropy, langid eval, attrition funnel:
    "text_gopher_rules",
    "text_unigram_entropy",
    "langid_confusion",
    "corpus_attrition_funnel",
    # new in round 14 — MinHash-LSH (b,r) S-curve evaluation against
    # the exact Jaccard pair distribution on a deterministic sample:
    "dedup_lsh_scurve",
    # new in round 14 — near-dup provenance matrix + data-constrained
    # epoch/repetition budget planning:
    "dedup_cross_source_matrix",
    "corpus_epoch_plan",
    # new in round 14 — unigram-LM (SentencePiece-style) Viterbi
    # segmentation over the word universe (the tokenizer family's
    # second member next to BPE):
    "unigram_segment_stats",
    "unigram_em_reestimate",
    # new in round 14 — Matryoshka prefix-width retrieval evaluation
    # (recall@10 of truncated embeddings vs full-width ground truth):
    "embeddings_matryoshka_eval",
    # new in round 14 — OHLC time-series downsampling + PCM loudness
    # gate (peak dBFS via the fixed-point log):
    "events_ohlc",
    "mm_audio_loudness",
    # new in round 14 — dedup-threshold selection curve over the
    # sampled exact pair distribution:
    "dedup_threshold_sweep",
    # new in round 14 — the video hub df-cap EXERCISED under the
    # oracle (30% planted black frames; df 154 > 64 at sf0.01):
    "mm_video_dedup_hub",
    # rewritten in round 14 — hub df-caps in every image/video band
    # join, mirrored in the oracles (VERDICT r13 What's-wrong #1);
    # caption dedup additionally collapses exact-equal hashes to one
    # representative before the band join:
    "mm_caption_dedup",
    "mm_video_dedup",
    "mm_image_dedup_incremental",
    "mm_video_dedup_incremental",
    # rewritten in round 14 — nests the capped caption/video oracles:
    "mm_curate_q",
    # rewritten in round 14 — tie-safe ranking on the ROUNDED cosine
    # (r13 ADVICE), so a raw-float near-tie at the rank-k boundary
    # cannot flip the selected rows cross-engine:
    "embeddings_contrastive_mine",
    "embeddings_knn_eval",
    # rewritten in round 14 — quality signal re-pointed at the
    # curated-label classifier artifact (non-circular; VERDICT Next
    # #4/#8), capstone floor recalibrated for the new logit scale:
    "corpus_curriculum_schedule",
    "corpus_curate_clf_q",
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
            textqual,
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
