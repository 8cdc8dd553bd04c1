"""Invariants for the cross-source near-dup matrix and the
data-constrained epoch plan (cross-engine equality is proven by
test_queries_oracle.py / the driver)."""

from __future__ import annotations

import math

from oxidsql_spark.operators.corpus_ext import (
    _EPOCH_BUDGET_X,
    _EPOCH_CAP_CENTI,
    corpus_epoch_plan,
)
from oxidsql_spark.operators.dedup import (
    _JACCARD_T,
    dedup_cross_source_matrix,
    ngram_jaccard_pairs,
)
from oxidsql_spark.sources import table

from conftest import SF_DIR


def test_cross_source_matrix_partitions_pair_set(spark):
    rows = dedup_cross_source_matrix(spark, SF_DIR).collect()
    total_pairs = ngram_jaccard_pairs(
        table(spark, SF_DIR, "documents"), _JACCARD_T
    ).count()
    assert sum(r.n_pairs for r in rows) == total_pairs > 0
    for r in rows:
        assert r.source_lo <= r.source_hi
        assert 0 < r.rate_ppb <= 1_000_000_000
        # rate denominator sanity: pairs can't exceed the pairable pop
        denom = (
            r.n_docs_lo * (r.n_docs_lo - 1) // 2
            if r.source_lo == r.source_hi
            else r.n_docs_lo * r.n_docs_hi
        )
        assert r.n_pairs <= denom


def test_epoch_plan_budget_and_cap(spark):
    rows = corpus_epoch_plan(spark, SF_DIR).collect()
    n_total = sum(r.n_tokens for r in rows)
    budget = _EPOCH_BUDGET_X * n_total
    alloc = sum(r.alloc_tokens for r in rows)
    # ppb weight quantization + per-source floor lose < 1 token/source
    assert budget - len(rows) <= alloc <= budget + len(rows)
    capped = [r for r in rows if r.epochs_centi > _EPOCH_CAP_CENTI]
    slack = [r for r in rows if r.epochs_centi <= _EPOCH_CAP_CENTI]
    assert capped and slack, "fixture must exercise both cap branches"
    for r in rows:
        assert r.capped_centi == min(r.epochs_centi, _EPOCH_CAP_CENTI)
        assert r.served_tokens <= r.alloc_tokens
        assert r.deficit_tokens == r.alloc_tokens - r.served_tokens
        if r.epochs_centi > _EPOCH_CAP_CENTI:
            assert r.deficit_tokens > 0
        # repetition discount: effective <= served, and matches the
        # decay formula within rounding
        assert r.eff_tokens <= r.served_tokens
        expect = r.n_tokens * 15.0 * (1.0 - math.exp(-(r.capped_centi / 100.0) / 15.0))
        assert abs(r.eff_tokens - expect) <= 1.0


def test_matryoshka_recall_monotone(spark):
    from oxidsql_spark.operators.similarity import (
        _MAT_DIMS,
        _MAT_K,
        _MAT_NQ,
        embeddings_matryoshka_eval,
    )

    rows = {r.dim: r for r in embeddings_matryoshka_eval(spark, SF_DIR).collect()}
    assert set(rows) == set(_MAT_DIMS)
    full = rows[_MAT_DIMS[-1]]
    # built-in sanity: full width retrieves exactly the ground truth
    assert full.n_hits == _MAT_K * _MAT_NQ == full.n_queries * _MAT_K
    # wider prefixes can only help recall (nested representations)
    hits = [rows[d].n_hits for d in _MAT_DIMS]
    assert hits == sorted(hits)
    for r in rows.values():
        assert 0 < r.n_hits <= _MAT_K * _MAT_NQ
        assert r.n_queries == _MAT_NQ


def test_ohlc_bounds_and_conservation(spark):
    from oxidsql_spark.operators.analytics_ext import events_ohlc
    from oxidsql_spark.sources import table

    rows = events_ohlc(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.low_v <= r.open_v <= r.high_v
        assert r.low_v <= r.close_v <= r.high_v
        assert r.n_events >= 1
    assert sum(r.n_events for r in rows) == table(spark, SF_DIR, "events").count()


def test_audio_loudness_level_math(spark):
    import math

    from oxidsql_spark.operators.multimodal import mm_audio_loudness

    rows = mm_audio_loudness(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.peak <= 128
        assert r.n_silent + r.n_clip <= r.n_samples
        assert r.sum_sq <= r.n_samples * 128 * 128
        # dBFS of a <=full-scale peak is <= 0, and the fixed-point chain
        # tracks 20*log10(peak/128) to within a centi-dB of float math
        assert r.peak_db_centi <= 0
        expect = 20.0 * math.log10(max(r.peak, 1) / 128.0) * 100
        assert abs(r.peak_db_centi - expect) <= 1.5
