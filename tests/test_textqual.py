"""Invariant tests for the rule-based text-quality family (textqual.py)
and the LSH S-curve tuning face.  Cross-engine value equality is proven
separately by test_queries_oracle.py / the driver; these lock the
semantic invariants the oracle can't express."""

from __future__ import annotations

import math

import pytest

from oxidsql_spark.operators.dedup import _SCURVE_GRID, dedup_lsh_scurve
from oxidsql_spark.operators.textqual import (
    corpus_attrition_funnel,
    langid_confusion,
    text_gopher_rules,
    text_unigram_entropy,
)

from conftest import SF_DIR


@pytest.fixture(scope="module")
def gopher(spark):
    return text_gopher_rules(spark, SF_DIR).collect()


def test_gopher_verdict_is_and_of_rules(gopher):
    for r in gopher:
        rules = [r.ok_tokens, r.ok_mwl, r.ok_stop, r.ok_alpha, r.ok_rep]
        assert r.gopher_pass == int(all(rules))
        assert all(v in (0, 1) for v in rules)


def test_gopher_rules_discriminate(gopher):
    # the fixture must exercise both sides of the gating rules the
    # funnel depends on (a rule that never fires is untested code)
    for rule in ("ok_tokens", "ok_stop", "ok_rep"):
        vals = {getattr(r, rule) for r in gopher}
        assert vals == {0, 1}, f"{rule} never fires on the fixture"
    passes = sum(r.gopher_pass for r in gopher)
    assert 0 < passes < len(gopher)


def test_gopher_metric_bounds(gopher):
    for r in gopher:
        assert 0 <= r.alpha_ratio <= 1
        assert 0 <= r.rep_ratio < 1
        assert r.n_stop_distinct <= r.n_tokens
        if r.n_tokens:
            assert r.mwl > 0


def test_entropy_bounds(spark):
    rows = text_unigram_entropy(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # 0 <= H <= log2(n_distinct), both within quantization slack
        assert -1e-3 <= r.entropy <= math.log2(max(r.n_distinct, 1)) + 1e-3
        assert r.top_share >= 1.0 / r.n_distinct - 1e-4
        assert r.n_distinct <= r.n_tokens


def test_langid_confusion_shares(spark):
    rows = langid_confusion(spark, SF_DIR).collect()
    by_lang: dict[str, float] = {}
    n_total = 0
    for r in rows:
        by_lang[r.lang] = by_lang.get(r.lang, 0.0) + r.share_of_lang
        n_total += r.n_docs
    # row-normalized shares sum to 1 per label (4-dp rounding slack)
    for lang, s in by_lang.items():
        assert abs(s - 1.0) < 1e-3, (lang, s)
    from oxidsql_spark.sources import table

    assert n_total == table(spark, SF_DIR, "documents").count()


def test_attrition_funnel_conserves_corpus(spark):
    rows = sorted(corpus_attrition_funnel(spark, SF_DIR).collect(), key=lambda r: r.ord)
    from oxidsql_spark.sources import table

    total = table(spark, SF_DIR, "documents").count()
    assert sum(r.n_hit for r in rows) == total
    # survivors shrink monotonically along the funnel; the pass row's
    # survivors equal its own population
    surv = [r.survivors_after for r in rows]
    assert surv == sorted(surv, reverse=True)
    assert rows[-1].stage == "pass" and rows[-1].survivors_after == rows[-1].n_hit
    # stage k's survivors = total - all drops through k
    dropped = 0
    for r in rows:
        if r.stage != "pass":
            dropped += r.n_hit
        assert r.survivors_after == total - dropped


def test_scurve_tradeoff_monotone(spark):
    rows = {(r.bands, r.rows_per_band): r for r in dedup_lsh_scurve(spark, SF_DIR).collect()}
    assert set(rows) == set(_SCURVE_GRID)
    n_pairs = {r.n_pairs for r in rows.values()}
    assert len(n_pairs) == 1 and n_pairs.pop() > 0
    # sorted by r ascending: aggressive → conservative
    ordered = [rows[cfg] for cfg in sorted(_SCURVE_GRID, key=lambda c: c[1])]
    fns = [r.fn_units for r in ordered]
    fps = [r.fp_units for r in ordered]
    s50s = [r.s50 for r in ordered]
    assert fns == sorted(fns)  # more rows/band → leaks more true dups
    assert fps == sorted(fps, reverse=True)  # ...but wastes fewer verifies
    assert s50s == sorted(s50s)
    for r in ordered:
        assert 0 <= r.exp_cand_units <= r.n_pairs * 1_000_000
        # expected candidates ≥ sure detections it can't miss entirely:
        # every pair contributes p ∈ [0,1]; fn+detected(above) ≈ n_above
        assert r.fn_units <= r.n_above * 1_000_000


def test_unigram_segmentation_invariants(spark):
    import math

    from oxidsql_spark.operators.textops import (
        _USEG_MAXP,
        unigram_segment_stats,
    )

    rows = unigram_segment_stats(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # coverage: a segmentation always exists (single chars are in
        # vocab), bounded by the piece-length cap on one side and
        # char-by-char on the other
        assert math.ceil(r.word_len / _USEG_MAXP) <= r.n_pieces <= r.word_len
        assert r.cost_micro > 0
    # the vocab's multi-char pieces must actually win somewhere —
    # otherwise the face degenerates to character segmentation
    assert any(r.n_pieces < r.word_len for r in rows)
    # more pieces of a word can never be cheaper than its optimum:
    # per-word keys are unique minima, so equal words don't repeat
    assert len({r.word for r in rows}) == len(rows)


def test_threshold_sweep_monotone(spark):
    from oxidsql_spark.operators.dedup import _SWEEP_TS, dedup_threshold_sweep

    rows = sorted(
        dedup_threshold_sweep(spark, SF_DIR).collect(), key=lambda r: r.threshold
    )
    assert [r.threshold for r in rows] == sorted(_SWEEP_TS)
    pairs = [r.n_pairs for r in rows]
    touched = [r.n_docs_touched for r in rows]
    # raising the threshold can only shrink the pair set and its doc set
    assert pairs == sorted(pairs, reverse=True)
    assert touched == sorted(touched, reverse=True)
    # the grid must bracket the fixture's elbow (strictly decreasing
    # somewhere, flat tail at the top)
    assert pairs[0] > pairs[-1] >= 0
    for r in rows:
        assert r.n_docs_touched <= 2 * r.n_pairs
        assert 0 <= r.touched_ppm <= 1_000_000


def test_unigram_em_char_conservation(spark):
    from oxidsql_spark.operators.textops import (
        _USEG_MAXW,
        _bpe_word_freqs,
        unigram_em_reestimate,
    )
    from oxidsql_spark.sources import table
    from pyspark.sql import functions as F

    rows = unigram_em_reestimate(spark, SF_DIR).collect()
    assert rows
    # every character of every (capped) word occurrence is covered by
    # exactly one canonical-path piece: sum(usage * len) == corpus chars
    used_chars = sum(r.usage * r.piece_len for r in rows)
    wu = _bpe_word_freqs(table(spark, SF_DIR, "documents")).filter(
        F.length("word") <= _USEG_MAXW
    )
    corpus_chars = wu.select(
        F.sum(F.col("freq") * F.length("word")).alias("s")
    ).first().s
    assert used_chars == corpus_chars
    # the M-step re-scores monotonically: more usage never costs more
    by_usage = sorted(rows, key=lambda r: r.usage)
    for a, b in zip(by_usage, by_usage[1:]):
        if a.usage < b.usage:
            assert a.new_w_micro > b.new_w_micro
        elif a.usage == b.usage:
            assert a.new_w_micro == b.new_w_micro
    # some seed pieces must collapse (the prune signal) and some must
    # survive with usage > 0
    assert any(r.usage == 0 for r in rows)
    assert any(r.usage > 0 for r in rows)
