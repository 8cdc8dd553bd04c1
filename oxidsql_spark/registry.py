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
# test-coverage prioritization.  Policy (fixed at authoring time, never
# derived from runtime files, so a fresh clone orders identically):
# names listed here interleave 7:1 with the remaining queries in module
# registration order — a checked prefix therefore always mixes
# not-yet-exercised queries with a sample of long-stable ones, so
# stable queries keep being re-verified instead of rotating out.
# When adding a NEW query, append its name here (it has no verification
# history anywhere yet). At the START of a round, retire names whose
# verification has since landed (drop them back into the stable pool)
# and keep/promote any that are still unverified — then re-check the
# window invariants (tests/test_registry.py locks them).
_PRIORITY: tuple[str, ...] = (
    # streaming/events batch twins
    "events_hourly",
    "events_sliding",
    "events_sessionize",
    "events_user_stats",
    "events_gapfill",
    "events_json_props",
    "events_props_map",
    "events_funnel",
    "events_cohort_retention",
    "events_click_purchase",
    # tpch_ext shapes
    "tpch_q2_mincost",
    "tpch_q4_exists",
    "tpch_q9_profit",
    "tpch_q12_ship",
    "tpch_q16_suppcnt",
    "tpch_q21_waiting",
    "tpch_q22_antibal",
    # udtf / text
    "udtf_chunk_documents",
    "text_chunks_builtin",
    # reworked this round (array columns stringified; UDAF rounding)
    "list_agg",
    "vector_quantize",
    "udaf_acctbal_sumsq",
    # new this round (corpus_ext)
    "decontaminate_ngram",
    "sample_stratified",
    "train_test_split",
    "text_repetition_ratio",
    "tfidf_top_terms",
    "quality_funnel",
    "events_anomaly",
    "source_mix",
    "tpch_q11_importance",
    "tpch_q20_dominant",
    "hll_partial_union",
    "events_variant_agg",
    "agg_filter_clause",
    "setop_bag_all",
    "text_winnow_fingerprint",
    "dedup_chunk_exact",
    "corpus_mix_sample",
    "mm_resize_batch",
    "text_lm_score",
    "events_wau",
    "orders_monthly_growth",
    "events_type_transitions",
)


def load_all() -> dict[str, Query]:
    """Import every operator module so its @register calls run."""
    global _LOADED
    if not _LOADED:
        from .operators import (  # noqa: F401
            corpus_ext,
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

        front = [n for n in _PRIORITY if n in QUERIES]
        in_front = set(front)
        rest = [n for n in QUERIES if n not in in_front]
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
