"""Iterative BPE tokenizer training: greedy-merge semantics, argmax
tie-breaks, the prefix property (an N-merge train's first k rules equal
the k-merge train — round-count invariance), early stop on exhaustion,
and the freeze -> load -> apply replay property.
"""

from __future__ import annotations

from oxidsql_spark.operators.textops import bpe_build, bpe_encode, bpe_train


def _docs(spark, words_with_freq):
    """One doc per word occurrence — freq via repetition."""
    rows = []
    i = 0
    for w, n in words_with_freq:
        for _ in range(n):
            rows.append((i, w))
            i += 1
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_bpe_toy_merge_sequence(spark):
    """Hand-computed 4-round sequence on the Sennrich-style toy corpus.
    Round 1 is a count TIE ((e,s)=9 vs (s,t)=9) resolved by the (l, r)
    ascending tie-break; round 3 ties (l,o)=(o,w)=7 the same way."""
    docs = _docs(spark, [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)])
    merges, _ = bpe_train(spark, docs, n_merges=4)
    assert merges == [
        (1, "e", "s", "es", 9),
        (2, "es", "t", "est", 9),
        (3, "l", "o", "lo", 7),
        (4, "lo", "w", "low", 7),
    ]


def test_bpe_greedy_overlap_and_early_stop(spark):
    """Overlapping pair occurrences merge greedily left-to-right:
    'aaaa' has THREE (a,a) adjacencies but only TWO non-overlapping
    merges ((aa)(aa), never (a)(aa)(a)); and once every word is a
    single symbol the trainer stops early instead of emitting junk."""
    docs = _docs(spark, [("aaaa", 3)])
    merges, final = bpe_train(spark, docs, n_merges=5)
    assert merges == [
        (1, "a", "a", "aa", 9),  # 3 occurrences x 3 adjacencies
        (2, "aa", "aa", "aaaa", 3),
    ]
    assert [r.enc for r in final.collect()] == ["(aaaa)"]


def test_bpe_prefix_property(spark):
    """Round-count invariance: training with MORE rounds never changes
    the earlier rules — merges(8)[:4] == merges(4)."""
    docs = _docs(
        spark,
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3), ("wide", 4)],
    )
    m8, _ = bpe_train(spark, docs, n_merges=8)
    m4, _ = bpe_train(spark, docs, n_merges=4)
    assert m8[:4] == m4


def test_bpe_encode_replays_training_state(spark, tmp_path):
    """bpe_build freezes the artifact; bpe_encode against it must
    reproduce the trainer's final symbol counts for every training
    word (the replay property the frozen artifact exists for)."""
    docs = _docs(spark, [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)])
    out = str(tmp_path / "bpe")
    bpe_build(spark, docs, out, n_merges=4)
    enc = bpe_encode(spark, docs, out)
    per_word = {
        r.word: r.n_syms for r in enc.select("word", "n_syms").distinct().collect()
    }
    # after merges es, est, lo, low: low->[low]=1, lower->[low,e,r]=3,
    # newest->[n,e,w,est]=4, widest->[w,i,d,est]=4
    assert per_word == {"low": 1, "lower": 3, "newest": 4, "widest": 4}
    # occurrence-level: one row per (doc, word) occurrence
    assert enc.count() == 5 + 2 + 6 + 3


# --- property: the distributed trainer equals a pure-Python reference ----

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _bpe_py(words_freq: dict, n_merges: int):
    """Pure-Python reference BPE: per round, weighted adjacent-pair
    counts, argmax (count desc, pair asc), greedy left-to-right
    non-overlapping merge.  Independent of both the Spark string-
    replace formulation and the DuckDB oracle."""
    syms = {w: list(w) for w in words_freq}
    merges = []
    for rnd in range(1, n_merges + 1):
        counts: dict = {}
        for w, f in words_freq.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rnd, l, r, l + r, c))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges, syms


_WORDS = st.dictionaries(
    keys=st.text(alphabet="abc", min_size=2, max_size=7),
    values=st.integers(min_value=1, max_value=9),
    min_size=1,
    max_size=8,
)


@settings(
    derandomize=True,
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(words=_WORDS)
def test_bpe_train_equals_python_reference(spark, words):
    """On random tiny corpora over a 3-letter alphabet (dense tie and
    overlap territory), the distributed trainer's merge table AND final
    per-word symbol sequences equal the pure-Python reference."""
    rows = []
    i = 0
    for w, f in words.items():
        for _ in range(f):
            rows.append((i, w))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got_merges, final = bpe_train(spark, docs, n_merges=5)
    ref_merges, ref_syms = _bpe_py(words, 5)
    assert got_merges == ref_merges
    got_syms = {
        r.word: r.enc.strip("()").split(")(") if r.enc else []
        for r in final.select("word", "enc").collect()
    }
    assert got_syms == {w: s for w, s in ref_syms.items()}


def test_bpe_batched_rounds_match_sequential_when_disjoint(spark):
    """The production pairs_per_round cut: on a corpus whose top pairs
    are symbol-disjoint and rank-stable (separate alphabets per word
    family), batched training produces the SAME merge table in a
    fraction of the rounds; and on the overlap-heavy toy corpus the
    batched result is still a valid prefix-consistent table (rule 1
    always equals the sequential argmax)."""
    # single-pair words: each merge consumes its whole word, so no
    # created pair can outrank a later admission — the regime where
    # batched IS sequential
    disjoint = _docs(spark, [("ab", 9), ("cd", 7), ("ef", 5), ("gh", 3)])
    seq, _ = bpe_train(spark, disjoint, n_merges=4, pairs_per_round=1)
    bat, _ = bpe_train(spark, disjoint, n_merges=4, pairs_per_round=4)
    assert bat == seq
    assert [m[1:3] for m in seq] == [("a", "b"), ("c", "d"), ("e", "f"), ("g", "h")]

    toy = _docs(spark, [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)])
    seq_t, _ = bpe_train(spark, toy, n_merges=4, pairs_per_round=1)
    bat_t, _ = bpe_train(spark, toy, n_merges=4, pairs_per_round=4)
    assert bat_t[0] == seq_t[0]  # first rule is always the true argmax
    assert len(bat_t) == 4 and len({m[3] for m in bat_t}) == 4


def test_bpe_encode_vocab_fast_path_and_oov_replay(spark, tmp_path):
    """The frozen artifact now carries the trainer's final word->n_syms
    vocab table: training-universe words encode by the vocab join (no
    merge replay), while a word the training never saw falls to the
    out-of-vocabulary replay path — both in one encode call, and the
    OOV result equals hand-replaying the frozen rules."""
    docs = _docs(spark, [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)])
    out = str(tmp_path / "bpe")
    bpe_build(spark, docs, out, n_merges=4)
    import os

    assert os.path.exists(os.path.join(out, "vocab", "_SUCCESS"))
    # encode a corpus = training words + one OOV word sharing their grams
    mixed = _docs(spark, [("low", 1), ("newest", 1), ("slowest", 1)])
    per_word = {
        r.word: r.n_syms
        for r in bpe_encode(spark, mixed, out)
        .select("word", "n_syms")
        .distinct()
        .collect()
    }
    # frozen rules: es, est, lo, low.  slowest -> s|low|est = 3 via replay
    assert per_word == {"low": 1, "newest": 4, "slowest": 3}


def test_bpe_encode_completes_at_production_merge_depth(spark, tmp_path):
    """The What's-wrong-#1 lock: encoding against a frozen artifact of
    2,100 merge rules (production-vocabulary order of magnitude) must
    COMPLETE, apply rules across segment boundaries in rank order, and
    keep the final plan's expression depth bounded by the segment size
    — never fold all rules into one projection (the 64 KB-codegen /
    analysis-blowup failure mode this test exists to prevent)."""
    import os

    from pyspark.sql import functions as F

    from oxidsql_spark.operators.textops import _BPE_ENC_SEGMENT, bpe_encode

    n_rules = 2100
    rules = [(1, "a", "b", "ab", 9)]
    # a LATE rule consuming an EARLY rule's output proves ordering
    # survives segmentation (rule 1 fires in segment 0, this one ~12
    # segments later on rule 1's merged symbol)
    late = n_rules - 50
    for i in range(2, n_rules + 1):
        if i == late:
            rules.append((i, "ab", "c", "abc", 1))
        else:
            rules.append((i, f"q{i}", "z", f"q{i}z", 1))
    bdir = str(tmp_path / "bpe_deep")
    spark.createDataFrame(
        rules, "rnk int, l string, r string, merged string, cnt bigint"
    ).coalesce(1).write.parquet(os.path.join(bdir, "merges"))
    # no vocab table -> every word takes the segmented replay path
    docs = _docs(spark, [("abc", 2), ("abd", 1)])
    enc = bpe_encode(spark, docs, bdir)
    per_word = {
        r.word: r.n_syms
        for r in enc.select("word", "n_syms").distinct().collect()
    }
    # abc: (a)(b)(c) -[r1]-> (ab)(c) -[late]-> (abc); abd: (ab)(d)
    assert per_word == {"abc": 1, "abd": 2}
    # depth bound: checkpoints truncate lineage per segment, so the
    # final analyzed plan may carry at most ONE segment's replaces
    plan = enc._jdf.queryExecution().analyzed().toString()
    n_replace = plan.count("replace(")
    assert 0 < n_replace <= _BPE_ENC_SEGMENT + 8, n_replace


def test_seq_pack_boundaries_reaggregate_to_stats(spark, sf_dir):
    """The boundary table is the stats table's pre-aggregation: grouping
    boundaries by seq_id must reproduce seq_pack_stats exactly (n_docs,
    n_starts, and token fill = sum of span widths), and within every
    sequence the spans must tile [0, L) without gap or overlap except
    the final partial sequence."""
    from pyspark.sql import functions as F

    from oxidsql_spark.operators.textops import (
        _SEQ_LEN,
        seq_pack_boundaries,
        seq_pack_stats,
    )

    b = seq_pack_boundaries(spark, sf_dir)
    agg = {
        r.seq_id: (r.n_docs, r.n_starts, r.n_tokens)
        for r in b.groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("is_start").cast("int")).alias("n_starts"),
            F.sum(F.col("fin") - F.col("beg") + 1).alias("n_tokens"),
        )
        .collect()
    }
    stats = {
        r.seq_id: (r.n_docs, r.n_starts, r.n_tokens)
        for r in seq_pack_stats(spark, sf_dir).collect()
    }
    assert agg == stats
    rows = sorted(
        ((r.seq_id, r.beg, r.fin) for r in b.collect())
    )
    last_seq = max(s for s, _, _ in rows)
    by_seq: dict = {}
    for s, beg, fin in rows:
        by_seq.setdefault(s, []).append((beg, fin))
    for s, spans in by_seq.items():
        expect = 0
        for beg, fin in spans:  # sorted by beg already
            assert beg == expect and fin >= beg
            expect = fin + 1
        assert expect == _SEQ_LEN or s == last_seq  # full tiling
