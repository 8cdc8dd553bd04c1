"""Semantics tests for the approximate (no-oracle) operators: the
sketch-based paths must agree with their exact counterparts.

Mirrors the reference's statistics testing discipline — seeded
determinism, accuracy bounds (counting_hyperloglog.rs:183-292,
sampling.rs:558-832) — applied to minhash/simhash/LSH/IVF.
"""

from __future__ import annotations

from oxidsql_spark.operators.dedup import (
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
    dedup_simhash,
    minhash_signatures,
)
from oxidsql_spark.operators.similarity import (
    ann_ivf_coarse,
    ann_lsh_bucketed,
    ann_topk_bruteforce,
)
from oxidsql_spark.sources import table


def test_minhash_candidates_subset_of_exact(spark, sf_dir):
    """LSH-verified pairs must be a subset of the exact Jaccard pairs
    (verification step uses exact Jaccard) and recall the vast majority
    of them (high-similarity pairs collide in ≥1 band w.h.p.)."""
    exact = {(r.a_id, r.b_id) for r in dedup_ngram_jaccard(spark, sf_dir).collect()}
    lsh = {(r.a_id, r.b_id) for r in dedup_minhash_lsh(spark, sf_dir).collect()}
    assert lsh <= exact
    if exact:
        assert len(lsh) / len(exact) >= 0.5, f"LSH recall {len(lsh)}/{len(exact)}"


def test_minhash_signatures_deterministic(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(50)
    a = {r.doc_id: r.sig for r in minhash_signatures(docs).collect()}
    b = {r.doc_id: r.sig for r in minhash_signatures(docs).collect()}
    assert a == b
    assert all(len(s) == 32 for s in a.values())


def test_simhash_deterministic_and_bounded(spark, sf_dir):
    out1 = {(r.a_id, r.b_id): r.hamming for r in dedup_simhash(spark, sf_dir).collect()}
    out2 = {(r.a_id, r.b_id): r.hamming for r in dedup_simhash(spark, sf_dir).collect()}
    assert out1 == out2
    assert all(0 <= h <= 6 for h in out1.values())
    assert all(a < b for a, b in out1)


def test_ann_lsh_recall_vs_bruteforce(spark, sf_dir):
    """Approximate top-k must be drawn from the candidate set and overlap
    the exact top-k meaningfully (random data → modest recall bound)."""
    exact = {(r.q_id, r.vec_id) for r in ann_topk_bruteforce(spark, sf_dir).collect()}
    approx = {(r.q_id, r.vec_id) for r in ann_lsh_bucketed(spark, sf_dir).collect()}
    assert len(approx & exact) / len(exact) >= 0.2
    ivf = {(r.q_id, r.vec_id) for r in ann_ivf_coarse(spark, sf_dir).collect()}
    assert len(ivf & exact) / len(exact) >= 0.2


def test_bruteforce_topk_shape(spark, sf_dir):
    rows = ann_topk_bruteforce(spark, sf_dir).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.q_id, []).append(r)
        assert r.q_id != r.vec_id
    for q, rs in per_q.items():
        assert len(rs) == 10
        sims = [r.cos_sim for r in sorted(rs, key=lambda r: r.rnk)]
        assert sims == sorted(sims, reverse=True)
