"""End-to-end training-corpus pipeline test."""

from __future__ import annotations

from pyspark.sql import functions as F

from oxidsql_spark.operators.graph import dedup_clusters
from oxidsql_spark.pipeline import build_training_corpus
from oxidsql_spark.sources import table


def test_pipeline_end_to_end(spark, sf_dir, tmp_path):
    out = str(tmp_path / "corpus")
    corpus = build_training_corpus(spark, sf_dir, out_dir=out, min_tokens=5)
    rows = corpus.collect()
    n_docs = table(spark, sf_dir, "documents").count()
    assert 0 < len(rows) <= n_docs

    # dedup: exactly the cluster representatives survive the dedup stage
    reps = {
        r.doc_id
        for r in dedup_clusters(spark, sf_dir)
        .filter(F.col("doc_id") == F.col("cluster_id"))
        .collect()
    }
    assert {r.doc_id for r in rows} <= reps

    # quality: every surviving doc meets the floor
    assert all(r.n_tokens >= 5 for r in rows)

    # written corpus is partitioned by language and complete
    back = spark.read.parquet(out)
    assert back.count() == len(rows)
    assert "lang_pred" in back.columns
    langs = {r.lang_pred for r in rows}
    import os

    dirs = {d.split("=")[1] for d in os.listdir(out) if d.startswith("lang_pred=")}
    assert dirs == langs

    # partition pruning works on the written layout
    one_lang = next(iter(langs))
    pruned = back.filter(F.col("lang_pred") == one_lang)
    assert pruned.count() == sum(1 for r in rows if r.lang_pred == one_lang)


def test_pipeline_observe_metrics(spark, sf_dir):
    """Observation metrics ride the same job that materializes the
    corpus — no second pass — and must agree with direct recomputation."""
    from pyspark.sql import Observation

    obs = Observation("corpus_metrics")
    corpus = build_training_corpus(spark, sf_dir, observation=obs)
    n = corpus.count()  # triggers the observed action
    got = obs.get
    assert got["n_docs"] == n
    assert got["total_tokens"] == sum(
        r.n_tokens for r in corpus.select("n_tokens").collect()
    )
    assert got["n_langs"] >= 1


def test_pipeline_repetition_and_decontamination_gates(spark, sf_dir):
    """The optional round-3 gates compose: every surviving doc respects
    the repetition bound, and no survivor appears in the contamination
    report."""
    from pyspark.sql import functions as F

    from oxidsql_spark.operators.corpus_ext import (
        decontaminate_ngram,
        text_repetition_ratio,
    )
    from oxidsql_spark.pipeline import build_training_corpus

    base = build_training_corpus(spark, sf_dir)
    gated = build_training_corpus(
        spark, sf_dir, max_rep_ratio=0.3, decontaminate=True
    )
    assert gated.count() <= base.count()

    kept = {r.doc_id for r in gated.select("doc_id").collect()}
    rep = {
        r.doc_id: r.rep_ratio for r in text_repetition_ratio(spark, sf_dir).collect()
    }
    assert all(rep[d] <= 0.3 for d in kept)
    dirty = {r.doc_id for r in decontaminate_ngram(spark, sf_dir).collect()}
    assert not (kept & dirty)


def test_chunk_vector_index_build_and_query(spark, sf_dir, tmp_path):
    """RAG-capstone: build the cell-partitioned chunk index, then query
    with a known chunk's own text — it must come back as top-1 with
    cosine 1, through a PARTITION-PRUNED scan (cell IN pushed to the
    directory level, n_probe of CVI_K cells touched)."""
    import os

    from pyspark.sql import functions as F

    from oxidsql_spark.pipeline import (
        CVI_K,
        CVI_PROBE,
        build_chunk_vector_index,
        query_chunk_index,
    )

    path = str(tmp_path / "chunk_index")
    build_chunk_vector_index(spark, sf_dir, path)

    cell_dirs = [d for d in os.listdir(path) if d.startswith("cell=")]
    assert 1 < len(cell_dirs) <= CVI_K  # layout is cell-partitioned

    probe = (
        spark.read.parquet(path)
        .filter(F.col("doc_id") == 42)
        .filter(F.col("chunk_idx") == 0)
        .select("chunk")
        .collect()[0]["chunk"]
    )
    got = query_chunk_index(spark, path, probe, top_k=3)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell" in plan  # pruned, not post-filtered
    rows = got.collect()
    assert (rows[0]["doc_id"], rows[0]["chunk_idx"]) == (42, 0)
    assert rows[0]["cos_sim"] == 1.0


def test_admit_chunks_equals_rebuild(spark, sf_dir, tmp_path):
    """Incremental chunk-index admission: chunking/embedding only the
    new batch and assigning against the index's FROZEN persisted
    centroids must yield cell assignments row-identical to processing
    the whole corpus under the same codebook — and the partition-pruned
    query still retrieves an admitted chunk exactly."""
    from pyspark.sql import functions as F

    from oxidsql_spark.operators.similarity import _km_assign
    from oxidsql_spark.operators.udtf_ops import chunk_docs_frame
    from oxidsql_spark.pipeline import (
        CVI_SCALE,
        _chunk_embedding_col,
        admit_chunks,
        build_chunk_vector_index,
        query_chunk_index,
    )
    from oxidsql_spark.sources import table

    d = table(spark, sf_dir, "documents")
    initial = d.filter(F.col("doc_id") % 5 != 0)
    batch = d.filter(F.col("doc_id") % 5 == 0)
    path = str(tmp_path / "cvi_grown")
    build_chunk_vector_index(spark, sf_dir, path, docs=initial)
    admit_chunks(spark, batch, path)

    cents = {
        int(r["cell"]): list(r["centroid"])
        for r in spark.read.parquet(path + "_centroids").collect()
    }
    expected_df = (
        chunk_docs_frame(d)
        .withColumn("v", _chunk_embedding_col())
        .withColumn(
            "qv",
            F.expr(f"transform(v, e -> CAST(floor(e * {CVI_SCALE}) AS BIGINT))"),
        )
        .withColumn("cell", _km_assign(cents))
        .select("doc_id", "chunk_idx", "cell")
    )
    want = {(r.doc_id, r.chunk_idx, r.cell) for r in expected_df.collect()}
    got_rows = spark.read.parquet(path).select("doc_id", "chunk_idx", "cell").collect()
    got = {(r.doc_id, r.chunk_idx, r.cell) for r in got_rows}
    assert got == want and len(got_rows) == len(want)

    # an admitted chunk is retrievable through the pruned probe
    probe = (
        spark.read.parquet(path)
        .filter((F.col("doc_id") % 5 == 0) & (F.col("chunk_idx") == 0))
        .orderBy("doc_id")
        .select("doc_id", "chunk")
        .collect()[0]
    )
    res = query_chunk_index(spark, path, probe["chunk"], top_k=10)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell" in plan
    rows = res.collect()
    assert rows[0]["cos_sim"] == 1.0
    # membership, not rank-0: an exact-duplicate chunk elsewhere in the
    # corpus legitimately ties at cos 1.0 and may outrank by doc_id
    assert (probe["doc_id"], 0) in {(r["doc_id"], r["chunk_idx"]) for r in rows}


def test_admit_corpus_batch_incremental(spark, sf_dir, tmp_path):
    """The rolling-admission loop: batch 2 must be deduped against the
    corpus AND against what batch 1 just admitted (artifact maintenance
    works), the quality floor drops short docs, and the merged Bloom
    keeps the no-false-negative property over the grown fingerprint
    table."""
    from pyspark.sql import functions as F

    from oxidsql_spark.cachescope import release_scoped_caches
    from oxidsql_spark.operators.dedup import (
        bloom_probe,
        build_fingerprint_bloom,
        build_fingerprint_table,
    )
    from oxidsql_spark.pipeline import admit_corpus_batch
    from oxidsql_spark.sources import table

    d = table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 4 == 0)
    batch1 = d.filter(F.col("doc_id") % 4 == 1)
    # batch2 = its own docs + re-submissions of corpus docs AND batch1 docs
    batch2 = (
        d.filter(F.col("doc_id") % 4 == 2)
        .unionByName(corpus.limit(20))
        .unionByName(batch1.limit(20))
    )
    fp_path = str(tmp_path / "fps")
    bloom_path = str(tmp_path / "bloom")
    build_fingerprint_table(spark, corpus, fp_path)
    build_fingerprint_bloom(
        spark, spark.read.parquet(fp_path).select("fp"), bloom_path, n_bits=1 << 20
    )

    a1 = admit_corpus_batch(spark, batch1, fp_path, bloom_path, min_tokens=1)
    got1 = {r.doc_id for r in a1.select("doc_id").collect()}
    release_scoped_caches()
    want1 = {
        r.doc_id
        for r in batch1.join(
            corpus.select(F.md5("text").alias("f")),
            F.md5(batch1["text"]) == F.col("f"),
            "left_anti",
        ).collect()
    }
    assert got1 == want1 and got1

    a2 = admit_corpus_batch(spark, batch2, fp_path, bloom_path, min_tokens=1)
    got2 = {r.doc_id for r in a2.select("doc_id").collect()}
    release_scoped_caches()
    # no re-submitted corpus or batch1 doc may be re-admitted
    resubmitted = {r.doc_id for r in corpus.limit(20).collect()} | {
        r.doc_id for r in batch1.limit(20).collect()
    }
    assert not (got2 & resubmitted)
    assert got2  # the genuinely new slice was admitted

    # quality floor: a short-doc batch is rejected entirely
    shorts = spark.createDataFrame(
        [(990001, "tiny", "src0", 4)], "doc_id long, text string, source string, n_chars int"
    )
    a3 = admit_corpus_batch(spark, shorts, fp_path, bloom_path, min_tokens=10)
    assert a3.count() == 0
    release_scoped_caches()

    # crash-ordering invariant: if the bloom merge fails, the
    # fingerprints must NOT have been appended — fps-present-but-
    # bits-absent is the one artifact state that breaks the filter's
    # no-false-negative contract (bits-without-fps only costs false
    # positives, which the anti-join absorbs)
    import pytest

    import oxidsql_spark.operators.dedup as dedup_mod

    before = spark.read.parquet(fp_path).count()
    real_merge = dedup_mod.merge_fingerprint_bloom

    def exploding_merge(*a, **kw):
        raise RuntimeError("injected crash before artifact append")

    dedup_mod.merge_fingerprint_bloom = exploding_merge
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            admit_corpus_batch(
                spark, d.filter(F.col("doc_id") % 4 == 3), fp_path, bloom_path,
                min_tokens=1,
            )
    finally:
        dedup_mod.merge_fingerprint_bloom = real_merge
        release_scoped_caches()
    assert spark.read.parquet(fp_path).count() == before

    # merged bloom keeps no-false-negatives over the grown fp table
    # (read through the resolver — merges commit manifest snapshots)
    from oxidsql_spark.versioned import read_artifact

    words = read_artifact(spark, bloom_path)
    n_bits = int(words.select("n_bits").first()["n_bits"])
    all_fps = spark.read.parquet(fp_path).select("fp")
    flags = bloom_probe(all_fps, words, n_bits)
    assert flags.filter(~F.col("bloom_maybe")).count() == 0


def test_rrf_fusion_recalls_union_of_halves(spark):
    """Hybrid-retrieval union-recall property: on a corpus where the
    relevant set splits into a lexical-only half (query terms present,
    random vectors) and a dense-only half (near the query vector, no
    query terms), RRF top-k recalls BOTH halves — strictly more than
    either input list alone — with irrelevant docs fused below them."""
    from oxidsql_spark.operators.corpus_ext import rrf_fuse

    # qid 1: relevant docs 0-9.  Lexical half ranks 0-4 (only it sees
    # them); dense half ranks 5-9; each half's remaining slots are
    # filled with disjoint irrelevant docs (20+).
    lex = spark.createDataFrame(
        [(1, d, r + 1) for r, d in enumerate([0, 1, 2, 3, 4, 20, 21, 22, 23, 24])],
        "qid bigint, doc_id bigint, rnk int",
    )
    dense = spark.createDataFrame(
        [(1, d, r + 1) for r, d in enumerate([5, 6, 7, 8, 9, 30, 31, 32, 33, 34])],
        "qid bigint, doc_id bigint, rnk int",
    )
    fused = rrf_fuse(lex, dense, k=60, top=10)
    top = {r.doc_id for r in fused.collect()}
    relevant = set(range(10))
    lex_recall = len({0, 1, 2, 3, 4} & relevant) / len(relevant)
    dense_recall = len({5, 6, 7, 8, 9} & relevant) / len(relevant)
    fused_recall = len(top & relevant) / len(relevant)
    assert fused_recall == 1.0
    assert fused_recall > max(lex_recall, dense_recall)
    # determinism: equal-score docs break ties on doc_id ascending
    rows = {(r.doc_id, r.rnk) for r in fused.collect()}
    assert rows == {(r2.doc_id, r2.rnk) for r2 in rrf_fuse(lex, dense, 60, 10).collect()}


def test_rrf_doc_in_both_halves_outranks_single_half(spark):
    """A doc ranked by BOTH halves accumulates both reciprocal terms
    and must outrank a doc holding the SAME rank in only one half —
    the consensus-boost that makes RRF beat either scorer alone."""
    from oxidsql_spark.operators.corpus_ext import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 100, 1), (1, 200, 2)], "qid bigint, doc_id bigint, rnk int"
    )
    dense = spark.createDataFrame(
        [(1, 100, 2), (1, 300, 1)], "qid bigint, doc_id bigint, rnk int"
    )
    out = {r.doc_id: (r.rrf_micro, r.rnk) for r in rrf_fuse(lex, dense).collect()}
    assert out[100][1] == 1  # in both halves -> fused rank 1
    assert out[100][0] == 1_000_000_000 // 61 + 1_000_000_000 // 62
    assert out[300][0] == 1_000_000_000 // 61  # same best rank, one half
    assert out[300][1] > 1


def test_leakage_safe_split_never_straddles_near_dups(spark, sf_dir):
    """The cluster-hash split's defining invariant: no near-dup pair —
    and transitively no member of any near-dup cluster — crosses the
    train/test boundary, while the doc-hash split offers no such
    guarantee.  Both sides must be non-empty on the fixture."""
    from oxidsql_spark.operators.corpus_ext import split_leakage_safe
    from oxidsql_spark.operators.dedup import dedup_ngram_jaccard

    s = split_leakage_safe(spark, sf_dir)
    splits = {r.doc_id: r.split for r in s.collect()}
    assert {"train", "test"} == set(splits.values())  # both sides used
    pairs = dedup_ngram_jaccard(spark, sf_dir).collect()
    assert len(pairs) > 0
    for p in pairs:
        assert splits[p.a_id] == splits[p.b_id]
    # and every cluster maps to exactly one split
    per_cluster = (
        s.groupBy("cluster_id").agg(F.countDistinct("split").alias("n")).collect()
    )
    assert all(r.n == 1 for r in per_cluster)


def test_dsir_select_ranks_target_like_docs_first(spark, tmp_path):
    """DSIR importance ranking: raw docs written in the TARGET sources'
    vocabulary must outrank raw docs from a disjoint vocabulary — the
    defining property of importance weights log(p_target/p_raw) over
    hashed unigram features."""
    from oxidsql_spark.operators.corpus_ext import dsir_select

    tvocab = " ".join(f"t{j}" for j in range(30))
    zvocab = " ".join(f"z{j}" for j in range(30))
    rows = (
        # target exemplar (sources src0/src1): vocabulary T
        [(i, "src0", tvocab) for i in range(10)]
        + [(i + 10, "src1", tvocab) for i in range(10)]
        # raw pool: 5 target-like docs, 20 off-distribution docs
        + [(100 + i, "src5", tvocab) for i in range(5)]
        + [(200 + i, "src6", zvocab) for i in range(20)]
    )
    spark.createDataFrame(rows, "doc_id bigint, source string, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    out = dsir_select(spark, str(tmp_path)).collect()
    ranked = [r.doc_id for r in out]
    # all 5 target-like raw docs rank ahead of every off-distribution doc
    assert set(ranked[:5]) == {100, 101, 102, 103, 104}
    w = {r.doc_id: r.dsir_weight_micro for r in out}
    assert w[100] > 0 > w[200]  # weights signed as importance ratios
    # target sources themselves are never selected (raw pool only)
    assert all(d >= 100 for d in ranked)


def test_curate_corpus_funnel(spark, sf_dir, tmp_path):
    """The r10 curation capstone end-to-end: every surviving doc is
    gate-clean, under the fluency ceiling, substring-deduped (a second
    span-cut pass finds nothing), and exact-dup-free; the token budget
    cuts at the global cumulative sum with DSIR picks packed first."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from oxidsql_spark.operators.dedup import span_cut
    from oxidsql_spark.pipeline import curate_corpus

    obs = Observation("curate")
    out_dir = str(tmp_path / "curated")
    out = curate_corpus(
        spark, sf_dir, out_dir=out_dir, nll_ceiling=12.0, observation=obs
    )
    n = out.count()
    m = obs.get
    assert m["n_docs"] == n > 0
    got = spark.read.parquet(out_dir)
    assert got.count() == n
    # gate-clean + fluency ceiling hold on every survivor
    assert got.filter(F.col("avg_nll") > 12.0).count() == 0
    assert got.filter(F.col("n_kept") < 5).count() == 0
    # exact-dup-free output text
    assert (
        got.select(F.md5(F.col("clean_text").cast("binary"))).distinct().count()
        == n
    )
    # substring-dedup fixed point: re-cutting the cleaned text cuts ~nothing
    recut = span_cut(
        got.select("doc_id", F.col("clean_text").alias("text"))
    ).agg(
        F.sum("n_tokens").alias("t"), F.sum("n_kept").alias("k")
    ).collect()[0]
    assert recut.k >= 0.99 * recut.t
    # token budget: respected and DSIR picks packed first
    budget = int(
        got.agg(F.sum("n_kept")).collect()[0][0] * 0.5
    )
    packed = curate_corpus(spark, sf_dir, token_budget=budget)
    tot = packed.agg(F.sum("n_kept")).collect()[0][0]
    assert tot <= budget
    assert 0 < packed.count() < n


def test_fixlog_matches_python_reference_and_grid_margin(spark, sf_dir):
    """The engine-proof fixed-point log (corpus_ext._fixlog_micro) must
    equal round(math.log(num/den)*1e6) on every REAL sf bucket, and
    every bucket's true ln*1e6 must sit far from the rounding grid —
    the margin that makes the fixed-point drift (<3e-5) irrelevant.
    Random-pair agreement was prototype-verified at build time; this
    locks the property on the data the driver actually checks."""
    import math

    from oxidsql_spark.operators.corpus_ext import _dsir_terms_and_weights

    _, _, lw = _dsir_terms_and_weights(spark, sf_dir)
    rows = lw.collect()
    assert rows, "no buckets"
    min_margin = 1.0
    for r in rows:
        num, den = int(r.num), int(r.den)
        ref = math.log(num / den) * 1e6
        # round-half-away reference (the algorithm's explicit rule)
        a = abs(ref)
        want = int(a + 0.5) if ref >= 0 else -int(a + 0.5)
        assert int(r.w) == want, (num, den, int(r.w), want)
        min_margin = min(min_margin, abs(a % 1.0 - 0.5))
    assert min_margin > 1e-3, f"bucket too close to rounding grid: {min_margin}"


def test_fixlog_random_pairs_match_python_reference(spark):
    """The fixed-point log on 300 random integer (num, den) pairs over
    the full web-scale magnitude range [1, 1e18): Spark output must
    equal the Python round-half-away reference everywhere the true
    value is off the rounding grid — the engine-independence claim on
    arbitrary inputs, not just fixture buckets (one batched run, not
    per-example round-trips)."""
    import math
    import random
    from decimal import Decimal

    from pyspark.sql import functions as F

    from oxidsql_spark.operators.corpus_ext import _fixlog_micro

    rnd = random.Random(20260815)
    pairs = [(1, 1), (1, 10**18 - 1), (10**18 - 1, 1)]
    while len(pairs) < 300:
        mag_n, mag_d = rnd.randint(0, 18), rnd.randint(0, 18)
        pairs.append(
            (rnd.randint(1, 10**mag_n), rnd.randint(1, 10**mag_d))
        )
    df = spark.createDataFrame(
        [(i, Decimal(n), Decimal(d)) for i, (n, d) in enumerate(pairs)],
        "bkt int, num decimal(38,0), den decimal(38,0)",
    )
    got = {r.bkt: r.w for r in _fixlog_micro(df).collect()}
    assert len(got) == len(pairs), "power-table join dropped a pair"
    for i, (n, d) in enumerate(pairs):
        ref = math.log(n / d) * 1e6
        if abs(abs(ref) % 1.0 - 0.5) < 1e-3:
            continue  # too close to the grid for a float reference
        a = abs(ref)
        want = int(a + 0.5) if ref >= 0 else -int(a + 0.5)
        assert got[i] == want, (n, d, got[i], want)


def test_curate_scrub_variant_bites(spark, sf_dir):
    """The scrubbed capstone must differ from the plain funnel on the
    fixture — otherwise its oracle proves a no-op chain.  Scrub
    frequencies count the RAW pool (dup copies inflate template spans
    past the threshold), so surviving docs lose tokens vs the
    unscrubbed run."""
    from oxidsql_spark.pipeline import (
        _CURATE_BUDGET,
        _CURATE_MIN_KEPT,
        _CURATE_NLL,
        _CURATE_SCRUB_F,
        curate_corpus,
    )

    plain = {
        r.doc_id: r.n_kept
        for r in curate_corpus(
            spark, sf_dir, nll_ceiling=_CURATE_NLL,
            min_kept_tokens=_CURATE_MIN_KEPT, token_budget=_CURATE_BUDGET,
        ).collect()
    }
    scrubbed = {
        r.doc_id: r.n_kept
        for r in curate_corpus(
            spark, sf_dir, nll_ceiling=_CURATE_NLL,
            min_kept_tokens=_CURATE_MIN_KEPT, token_budget=_CURATE_BUDGET,
            scrub_min_freq=_CURATE_SCRUB_F,
        ).collect()
    }
    shorter = [d for d in plain if scrubbed.get(d, 0) < plain[d]]
    assert shorter, "scrub stage was a no-op on the fixture"
    assert all(scrubbed.get(d, 0) <= plain[d] for d in plain)


def test_redact_pii_pattern_breadth(spark, tmp_path):
    """One fixture per PII pattern shape (email; IIN-led card — spaced,
    dashed, and bare; SSN; IPv4; phone — plain, dotted, parenthesized,
    and +1-prefixed), plus an interaction row carrying several at once,
    pushed through the registered query's own regex chain.  Locks the
    pattern ORDER contract (a spaced card must become ONE <CC>, not a
    <PHONE> bite out of its middle; a dotted quad must become <IP>) AND
    the negative space of the shape contract (mixed-separator and
    non-IIN 16-digit ids stay unredacted)."""
    from oxidsql_spark.operators.textops import _PII_PATTERNS
    from pyspark.sql import functions as F

    rows = [
        (1, "mail me at jane.doe+x@sub.example.org today"),
        (2, "card 4234-5678-9012-3456 on file"),
        (3, "card 4234 5678 9012 3456 on file"),
        (4, "card 4234567890123456 on file"),
        (5, "ssn 123-45-6789 leaked"),
        (6, "host 192.168.0.1 responded"),
        (7, "call 555-867-5309 or 555.867.5309"),
        (8, "jane@ex.org ip 10.0.0.7 cc 4111 1111 1111 1111 ssn 987-65-4321 tel 212-555-0199"),
        (9, "no pii here at all"),
        (10, "call (555) 867-5309 or (555)867-5309 today"),
        (11, "intl +1-555-867-5309 or +1 (555) 867-5309"),
        (12, "order id 7234567890123456 is not a card"),
        (13, "mixed 4234-5678 9012 3456 separators stay put"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    red = F.col("text")
    for pat, tok in _PII_PATTERNS:
        red = F.regexp_replace(red, pat, tok)
    out = {r.doc_id: r.redacted for r in df.select("doc_id", red.alias("redacted")).collect()}
    assert out[1] == "mail me at <EMAIL> today"
    assert out[2] == "card <CC> on file"
    assert out[3] == "card <CC> on file"  # spaced card is ONE token, no <PHONE> bite
    assert out[4] == "card <CC> on file"
    assert out[5] == "ssn <SSN> leaked"
    assert out[6] == "host <IP> responded"
    assert out[7] == "call <PHONE> or <PHONE>"
    assert out[8] == "<EMAIL> ip <IP> cc <CC> ssn <SSN> tel <PHONE>"
    assert out[9] == "no pii here at all"
    assert out[10] == "call <PHONE> or <PHONE> today"
    assert out[11] == "intl <PHONE> or <PHONE>"
    assert out[12] == "order id 7234567890123456 is not a card"
    assert out[13] == "mixed 4234-5678 9012 3456 separators stay put"


def test_quality_classifier_ranking_and_frozen_artifact(spark, sf_dir, tmp_path):
    """The learned filter's two contracts: (1) ranking sanity — trained
    on one hash split's weak gate labels, the classifier scores
    gate-CLEAN holdout docs higher on average than gate-REJECT holdout
    docs (every step is deterministic, so this is a fixed property of
    the fixture, not a flaky ML assertion); (2) the frozen weight
    artifact reproduces the trainer's scores exactly (build -> read ->
    score is semantics-preserving)."""
    from pyspark.sql import functions as F

    from oxidsql_spark.operators.corpus_ext import (
        _qc_feats,
        _qc_labels,
        _tdiv,
        qc_build,
        qc_score,
        qc_train,
    )
    from oxidsql_spark.sources import table

    # engine-matching truncation on negatives (Spark div == DuckDB //)
    assert _tdiv(-7, 2) == -3 and _tdiv(7, -2) == -3 and _tdiv(-7, -2) == 3

    d = table(spark, sf_dir, "documents")
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("int") % 100
    train, hold = d.filter(bucket < 80), d.filter(bucket >= 80)

    w = qc_train(spark, train)
    wdf = spark.createDataFrame(sorted(w.items()), "f bigint, w bigint")
    dot = (
        _qc_feats(hold)
        .join(F.broadcast(wdf), "f")
        .groupBy("doc_id")
        .agg(F.sum("w").alias("dot"))
    )
    means = {
        r.y: r.m
        for r in _qc_labels(hold)
        .join(dot, "doc_id")
        .groupBy("y")
        .agg(F.avg("dot").alias("m"))
        .collect()
    }
    assert means[1] > means[0], f"no holdout separation: {means}"

    # frozen artifact == direct weights, doc for doc
    out = str(tmp_path / "qclf")
    qc_build(spark, train, out)
    frozen = {
        r.doc_id: r.logit_micro for r in qc_score(spark, hold, out).collect()
    }
    direct = {r.doc_id: r.dot for r in dot.collect()}
    assert frozen == direct


def test_curated_classifier_flags_gate_passing_junk(spark, tmp_path):
    """The reason the classifier stage exists (r13 VERDICT Next #4):
    the gate checks length/lang/source — it cannot see VOCABULARY.
    Train on curated-source provenance labels (src0/src1 positives)
    over a corpus where curated docs share a 'clean' vocabulary and
    some gate-PASSING crawl docs use junk vocabulary: the curated
    classifier must score the junk crawl docs below the curated-like
    crawl docs, a separation the gate label cannot express (every
    crawl doc here passes the gate, so gate-label training sees them
    as identical positives)."""
    from pyspark.sql import functions as F

    from oxidsql_spark.operators.corpus_ext import (
        _qc_labels_curated,
        qc_build,
        qc_score,
    )

    clean_words = "science history journal archive study record".split()
    junk_words = "zzbuy zzcheap zzclick zzfree zzwin zzpills".split()

    def text_of(words, seed):
        return " ".join(words[(seed + i) % len(words)] for i in range(40))

    rows = []
    # curated positives (src0/src1), clean vocabulary
    for i in range(30):
        rows.append((i, text_of(clean_words, i), "en", f"src{i % 2}", 200))
    # gate-passing crawl: half curated-LIKE, half junk vocabulary
    for i in range(30, 60):
        rows.append((i, text_of(clean_words, i), "en", "src9", 200))
    for i in range(60, 90):
        rows.append((i, text_of(junk_words, i), "en", "src9", 200))
    d = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    out = str(tmp_path / "qcur")
    qc_build(spark, d, out, labels=_qc_labels_curated(d))
    scored = qc_score(spark, d, out)
    crawl_like = scored.filter(
        (F.col("doc_id") >= 30) & (F.col("doc_id") < 60)
    ).agg(F.avg("logit_micro")).collect()[0][0]
    crawl_junk = scored.filter(F.col("doc_id") >= 60).agg(
        F.avg("logit_micro")
    ).collect()[0][0]
    # every crawl doc passes the gate (n_chars 200, lang en, source
    # set), yet the curated model separates them by vocabulary
    assert crawl_like > crawl_junk, (crawl_like, crawl_junk)
