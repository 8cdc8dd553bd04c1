"""Property-based lock on the collapse-first near-dup pipeline:
for RANDOM corpora (tiny token alphabet → organic near-dups; explicit
verbatim duplication; short and empty texts), the collapse-expand pair
set and the collapse-expand cluster map equal the direct computations
exactly.  Complements the hand-built edge-case fixtures in
test_dedup_skew.py with adversarially-shrunk random ones."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oxidsql_spark.cachescope import release_scoped_caches
from oxidsql_spark.operators.dedup import (
    _JACCARD_T,
    _ngram_jaccard_pairs_direct,
    ngram_jaccard_pairs,
)
from oxidsql_spark.operators.graph import cluster_documents, propagate_min_labels

# documents: 0-8 tokens from a 6-word alphabet (lots of shared
# shingles), plus a copies count 1-3 per base text
_DOC = st.tuples(
    st.lists(st.sampled_from("alpha beta gamma delta eps zeta".split()),
             min_size=0, max_size=8),
    st.integers(min_value=1, max_value=3),
)
_CORPUS = st.lists(_DOC, min_size=1, max_size=10)


def _materialize(spark, corpus):
    rows, doc = [], 0
    for toks, copies in corpus:
        text = " ".join(toks)
        for _ in range(copies):
            rows.append((doc, text))
            doc += 1
    return spark.createDataFrame(rows, "doc_id bigint, text string")


@settings(
    derandomize=True,
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_CORPUS)
def test_collapse_pipeline_equals_direct_on_random_corpora(spark, corpus):
    docs = _materialize(spark, corpus)
    direct_pairs = {
        tuple(r)
        for r in ngram_jaccard_pairs(docs, _JACCARD_T, collapse=False).collect()
    }
    collapsed_pairs = {
        tuple(r)
        for r in ngram_jaccard_pairs(docs, _JACCARD_T, collapse=True).collect()
    }
    assert collapsed_pairs == direct_pairs
    direct_clusters = {
        tuple(r)
        for r in propagate_min_labels(
            docs.select("doc_id"),
            _ngram_jaccard_pairs_direct(docs, _JACCARD_T).select("a_id", "b_id"),
        ).collect()
    }
    collapsed_clusters = {tuple(r) for r in cluster_documents(docs).collect()}
    assert collapsed_clusters == direct_clusters
    release_scoped_caches()


# ---------------------------------------------------------------------------
# span_cut vs a pure-Python reference implementation of the keep-first
# substring-dedup semantics (random corpora: tiny alphabet → dense span
# repeats; verbatim copies; short/empty texts)
# ---------------------------------------------------------------------------


def _py_span_cut(rows, k):
    """Reference implementation: tokenize (trim/lower/split on
    whitespace), enumerate every k-token span occurrence, cut the token
    positions covered by any NON-FIRST occurrence (global (doc_id, pos)
    order) of a span occurring more than once corpus-wide."""
    toks = {d: t.strip().lower().split() if t.strip() else [] for d, t in rows}
    occ: dict[tuple, list] = {}
    for d in sorted(toks):
        tt = toks[d]
        for p in range(len(tt) - k + 1):
            occ.setdefault(tuple(tt[p : p + k]), []).append((d, p))
    cut: dict[int, set] = {}
    for gram, places in occ.items():
        if len(places) < 2:
            continue
        for d, p in sorted(places)[1:]:
            cut.setdefault(d, set()).update(range(p, p + k))
    out = {}
    for d, tt in toks.items():
        kept = [t for i, t in enumerate(tt) if i not in cut.get(d, set())]
        out[d] = (len(tt), len(kept), " ".join(kept))
    return out


@settings(
    derandomize=True,
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_CORPUS)
def test_span_cut_equals_python_reference_on_random_corpora(spark, corpus):
    from oxidsql_spark.operators.dedup import span_cut

    k = 3  # small spans so 0-8-token docs exercise the machinery
    docs = _materialize(spark, corpus)
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    want = _py_span_cut(rows, k)
    got = {
        r.doc_id: (r.n_tokens, r.n_kept, r.cleaned)
        for r in span_cut(docs, k).collect()
    }
    assert got == want
    release_scoped_caches()
