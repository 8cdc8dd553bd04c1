"""Adversarial-skew evidence for the near-dup candidate generators.

SCALE.md argues the AllPairs prefix filter is skew-immune by
construction (hot shingles sort to the frequent end of the rarity order
and fall outside every doc's prefix).  These tests turn the argument
into measured numbers on an adversarial corpus:

* a boilerplate phrase shared by 50% of all docs (the classic web-crawl
  footer) — a naive inverted-index join would emit
  3 · C(1000, 2) ≈ 1.5M candidate rows from its 3 hot shingles alone;
* a clique of 200 near-identical docs — whose C(200, 2) = 19 900 pairs
  ARE the true answer and must still be generated.

Measured (asserted below, recorded in SCALE.md): the prefix filter
emits EXACTLY the 19 900 clique candidates and zero boilerplate
candidates; MinHash-LSH emits the clique candidates plus a tiny
band-collision tail, bounded linearly in corpus size.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oxidsql_spark.cachescope import release_scoped_caches
from oxidsql_spark.operators.dedup import (
    _CONT_T,
    _JACCARD_T,
    _allpairs_index,
    containment_pairs,
    jaccard_candidates,
    minhash_candidates,
    ngram_jaccard_pairs,
)

N_BOILER = 1000  # docs carrying the hot boilerplate phrase
N_CLEAN = 800  # unique-content docs
K_CLIQUE = 200  # near-identical clique
CLIQUE_PAIRS = K_CLIQUE * (K_CLIQUE - 1) // 2

BOILERPLATE = "all rights reserved contact us"  # 5 words → 3 hot shingles


def _adversarial_corpus(spark):
    """2000 docs: 1000 unique-content docs ending in the boilerplate
    phrase, 800 fully unique docs, 200 near-identical clique docs
    (24 shared words + 1 per-doc word)."""
    rows = []
    for i in range(N_BOILER):
        body = " ".join(f"b{i}w{j}" for j in range(25))
        rows.append((i, f"{body} {BOILERPLATE}"))
    for i in range(N_CLEAN):
        body = " ".join(f"c{i}w{j}" for j in range(25))
        rows.append((N_BOILER + i, body))
    shared = " ".join(f"clique{j}" for j in range(24))
    for i in range(K_CLIQUE):
        rows.append((N_BOILER + N_CLEAN + i, f"{shared} only{i}"))
    return spark.createDataFrame(rows, "doc_id bigint, text string")


@pytest.fixture(scope="module")
def corpus(spark):
    df = _adversarial_corpus(spark)
    yield df
    release_scoped_caches()


def test_prefix_filter_candidates_exactly_clique(spark, corpus):
    """The hot boilerplate shingles (df=1000) contribute ZERO candidate
    pairs: every boilerplate doc's prefix drops its ceil(t·n)-1 most
    frequent shingles, which is exactly where df-sorted hot shingles
    live.  Candidates = the clique's true pairs, nothing else — the
    skew-immunity-by-construction claim, measured."""
    docs_arr = _allpairs_index(corpus, _JACCARD_T)
    n_cand = jaccard_candidates(docs_arr, _JACCARD_T).count()
    assert n_cand == CLIQUE_PAIRS
    release_scoped_caches()


def test_prefix_filter_verified_pairs_are_clique(spark, corpus):
    """End-to-end on the adversarial corpus: the verified pair set is
    exactly the clique (boilerplate overlap scores jaccard ≈ 0.06 < t,
    and it never even reaches verification)."""
    pairs = ngram_jaccard_pairs(corpus, _JACCARD_T)
    assert pairs.count() == CLIQUE_PAIRS
    mn = pairs.agg(F.min("jaccard")).collect()[0][0]
    assert mn >= _JACCARD_T
    release_scoped_caches()


def test_positional_filter_never_prunes_a_true_pair(spark):
    """The PPJoin positional upper bound (r15 opt round) must be a TRUE
    overlap bound under the verify's own float semantics.  Sliding-
    window corpus: doc i = words [i, i+20), so pairs at distance k
    share 18-k of their 18 shingles and jaccard = (18-k)/(18+k) sweeps
    through the threshold — including distance 12, which lands EXACTLY
    on t=0.2 (6/30): the borderline a rounded algebraic alpha would
    clip.  Ground truth is a brute-force python jaccard over the full
    shingle sets with the same double division."""
    n, w = 80, 20
    rows = [
        (i, " ".join(f"w{j}" for j in range(i, i + w))) for i in range(n)
    ]
    corpus = spark.createDataFrame(rows, "doc_id bigint, text string")

    def shingles(words):
        return {
            " ".join(words[k : k + 3]) for k in range(len(words) - 2)
        }

    sets = {i: shingles(t.split()) for i, t in rows}
    truth = {}
    for a in range(n):
        for b in range(a + 1, n):
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            jac = inter / (len(sets[a]) + len(sets[b]) - inter)
            if jac >= _JACCARD_T:
                truth[(a, b)] = jac
    got = {
        (r.a_id, r.b_id): r.jaccard
        for r in ngram_jaccard_pairs(corpus, _JACCARD_T, collapse=False).collect()
    }
    assert set(got) == set(truth)  # no pair pruned, none invented
    for k, v in truth.items():
        assert abs(got[k] - v) < 5e-5
    # the boundary pairs (distance 12, jaccard exactly 0.2) are present
    assert got[(0, 12)] == 0.2
    release_scoped_caches()


def test_containment_positional_filter_never_prunes_a_true_pair(spark):
    """r15: the containment candidate's positional upper bound and the
    suffix-slice verify (inter = c + |A[pa+1:] ∩ B[pb+1:]|) must
    reproduce the brute-force DIRECTED containment exactly — including
    a pair engineered to land EXACTLY on t=0.7 (7 of 10 shingles), the
    borderline a differently-rounded bound would clip.  Ground truth is
    python sets with the verify's own double division."""
    n, w = 40, 20
    rows = [
        (i, " ".join(f"w{j}" for j in range(i, i + w))) for i in range(n)
    ]
    # doc 200: 12 words -> 10 shingles; doc 201 shares exactly the 7
    # grams inside w0..w8 (its tail grams mix into z-words), so
    # containment(200 -> 201) = 7/10 = t exactly.
    rows.append((200, " ".join(f"w{j}" for j in range(12))))
    rows.append(
        (201, " ".join(f"w{j}" for j in range(9)) + " z0 z1 z2 z3 z4 z5")
    )
    # fully-contained short: 5 words -> 3 shingles, all inside doc 0
    rows.append((202, " ".join(f"w{j}" for j in range(5))))
    corpus = spark.createDataFrame(rows, "doc_id bigint, text string")

    def shingles(words):
        return {
            " ".join(words[k : k + 3]) for k in range(len(words) - 2)
        }

    sets = {i: shingles(t.split()) for i, t in rows}
    truth = {}
    for a, sa in sets.items():
        if not sa:
            continue
        for b, sb in sets.items():
            if a == b or not sb:
                continue
            inter = len(sa & sb)
            if inter and inter / len(sa) >= _CONT_T:
                truth[(a, b)] = inter / len(sa)
    got = {
        (r.contained_id, r.container_id): r.containment
        for r in containment_pairs(corpus, _CONT_T, collapse=False).collect()
    }
    assert set(got) == set(truth)  # no pair pruned, none invented
    for k, v in truth.items():
        assert abs(got[k] - v) < 5e-5
    assert got[(200, 201)] == 0.7  # the exact-boundary pair survives
    assert got[(202, 0)] == 1.0  # full containment of the short doc
    release_scoped_caches()


def _verbatim_corpus(spark):
    """Duplicate-saturated corpus exercising every collapse edge case:
    a true near-dup pair with asymmetric verbatim copy counts, a
    verbatim-only group with no near-dup partner, unique docs, and
    shingle-less docs (short + empty text) with verbatim copies —
    which must STAY singletons, exactly as in the direct pipeline."""
    base_a = " ".join(f"w{j}" for j in range(20))  # near-dup pair ...
    base_b = base_a + " tail1 tail2"  # ... jaccard well above t
    lone = " ".join(f"x{j}" for j in range(20))  # verbatim group, no partner
    rows = []
    doc = 0
    for _ in range(3):  # A x3
        rows.append((doc, base_a)); doc += 1
    for _ in range(2):  # B x2
        rows.append((doc, base_b)); doc += 1
    for _ in range(4):  # lone x4
        rows.append((doc, lone)); doc += 1
    for i in range(30):  # unique docs
        rows.append((doc, " ".join(f"u{i}w{j}" for j in range(15)))); doc += 1
    for _ in range(3):  # shingle-less (2 tokens) x3
        rows.append((doc, "hi there")); doc += 1
    for _ in range(2):  # empty x2
        rows.append((doc, "")); doc += 1
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_collapse_expand_pairs_equal_direct(spark):
    """The collapse-first pair pipeline is row-identical to the direct
    computation on a duplicate-saturated corpus — inter-group pairs
    inherit the rep pair's jaccard, intra-group verbatim pairs appear
    at 1.0, and shingle-less verbatim groups contribute NO pairs (they
    share no inverted-index key in the direct pipeline either)."""
    corpus = _verbatim_corpus(spark)
    direct = {
        (r.a_id, r.b_id, r.jaccard)
        for r in ngram_jaccard_pairs(corpus, _JACCARD_T, collapse=False).collect()
    }
    collapsed = {
        (r.a_id, r.b_id, r.jaccard)
        for r in ngram_jaccard_pairs(corpus, _JACCARD_T, collapse=True).collect()
    }
    assert collapsed == direct
    # the A/B near-dup group expands to C(5,2) pairs, lone to C(4,2)
    assert len(direct) == 10 + 6
    release_scoped_caches()


def test_collapse_clusters_equal_direct(spark):
    """cluster_documents (propagation over representatives + label
    expansion) produces the exact cluster map of direct propagation
    over the un-collapsed pair graph — including singleton clusters for
    every shingle-less doc, verbatim copies or not."""
    from oxidsql_spark.operators.dedup import _ngram_jaccard_pairs_direct
    from oxidsql_spark.operators.graph import (
        cluster_documents,
        propagate_min_labels,
    )

    corpus = _verbatim_corpus(spark)
    direct_pairs = _ngram_jaccard_pairs_direct(corpus, _JACCARD_T).select(
        "a_id", "b_id"
    )
    direct = {
        (r.doc_id, r.cluster_id)
        for r in propagate_min_labels(
            corpus.select("doc_id"), direct_pairs
        ).collect()
    }
    collapsed = {
        (r.doc_id, r.cluster_id) for r in cluster_documents(corpus).collect()
    }
    assert collapsed == direct
    # shingle-less docs (the last 5) are singletons despite verbatim copies
    n_docs = corpus.count()
    for d in range(n_docs - 5, n_docs):
        assert (d, d) in collapsed
    release_scoped_caches()


def test_collapse_shrinks_rep_set_independent_of_duplication(spark):
    """The representative set — all the shingler and candidate join
    ever see under collapse — is |unique texts|-sized regardless of the
    verbatim duplication factor: 10x-duplicating the corpus leaves the
    rep count, and therefore the near-dup candidate work, unchanged."""
    from oxidsql_spark.operators.dedup import collapse_exact

    corpus = _verbatim_corpus(spark)
    reps1, members1 = collapse_exact(corpus)
    n_unique = corpus.select("text").distinct().count()
    assert reps1.count() == n_unique
    blown = corpus.unionByName(
        corpus.select((F.col("doc_id") + 10_000).alias("doc_id"), "text")
    )
    for _ in range(2):
        blown = blown.unionByName(
            blown.select((F.col("doc_id") + 100_000).alias("doc_id"), "text")
        )
    reps10, members10 = collapse_exact(blown)
    assert reps10.count() == n_unique  # duplication factor invisible to reps
    assert members10.count() == blown.count()  # every doc mapped
    release_scoped_caches()


def test_minhash_candidates_linear_bound(spark, corpus):
    """MinHash band buckets track true similarity, not shingle
    frequency: the 1000-doc boilerplate phrase may produce only a small
    band-collision tail (sig positions agree with prob ≈ jaccard ≈ 0.06
    per row, ^4 per band), bounded linearly in corpus size — never the
    ~1.5M-row hot-bucket explosion of a naive shingle join."""
    n_docs = N_BOILER + N_CLEAN + K_CLIQUE
    n_cand = minhash_candidates(corpus).count()
    assert n_cand >= CLIQUE_PAIRS  # the true clique must be recalled
    assert n_cand <= CLIQUE_PAIRS + n_docs  # linear tail, not quadratic


def test_collapse_minhash_and_containment_equal_direct(spark):
    """The collapse-first MinHash-LSH and containment paths are
    row-identical to their direct computations on the duplicate-
    saturated corpus — including the DIRECTED 1.0 intra-group pairs
    containment emits for verbatim copies (both orders), and their
    absence for shingle-less groups."""
    from oxidsql_spark.operators.dedup import (
        _can_shingle,
        _containment_pairs_direct,
        _expand_rep_pairs,
        _minhash_pairs_direct,
        collapse_exact,
        containment_pairs,
    )

    corpus = _verbatim_corpus(spark)

    direct_cont = {
        tuple(r) for r in _containment_pairs_direct(corpus).collect()
    }
    collapsed_cont = {tuple(r) for r in containment_pairs(corpus).collect()}
    assert collapsed_cont == direct_cont
    # verbatim groups produce directed 1.0 pairs in BOTH orders
    assert (0, 1, 1.0) in collapsed_cont and (1, 0, 1.0) in collapsed_cont
    release_scoped_caches()

    direct_mh = {tuple(r) for r in _minhash_pairs_direct(corpus).collect()}
    reps, members = collapse_exact(corpus)
    rep_pairs = _minhash_pairs_direct(reps.select("doc_id", "text"))
    dup_can = _can_shingle(reps.filter(F.col("weight") > 1))
    collapsed_mh = {
        tuple(r) for r in _expand_rep_pairs(rep_pairs, members, dup_can).collect()
    }
    assert collapsed_mh == direct_mh
    release_scoped_caches()
