"""Rule-based text-quality operators: Gopher-style per-document rules,
unigram-entropy diversity, language-ID evaluation, and the first-failing-
rule attrition funnel a curation pipeline reports before committing to a
filter configuration.

These extend the reference's quality surface (its gate is schema-level —
arity + VARCHAR(n) caps + checked casts, ``types.rs:151-199``) with the
content-level rules a 100 TB training-data pipeline runs between ingest
and dedup.  Everything here is a zero-join, whole-stage-codegen row
transform followed by a small aggregate: no UDFs, no shuffles beyond the
final group-by, so the per-document cost is one scan regardless of
corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions import tokens
from ..registry import register
from ..sources import table
from .corpus_ext import _DUCK_TOKS, _QC_GATE_LANGS
from .textops import _STOPS, _lang_score_sql

# ---------------------------------------------------------------------------
# Gopher-style quality rules (Rae et al. 2021, table A1 — the standard
# cheap pre-filters), with thresholds adapted to the whitespace-token
# fixture: token-count floor, mean-word-length band, stop-word floor,
# alphabetic-token floor, duplicate-bigram ceiling.
# ---------------------------------------------------------------------------

_G_MIN_TOKENS = 30
_G_MAX_TOKENS = 100_000
_G_MWL_LO, _G_MWL_HI = 3.0, 10.0
_G_MIN_STOPS = 2  # distinct stop words required
_G_MIN_ALPHA = 0.8  # fraction of tokens containing [a-z]
_G_MAX_REP = 0.10  # duplicate word-bigram fraction ceiling

_STOPS_SQL = ", ".join(f"'{w}'" for w in _STOPS)

# Shared rule predicates (SQL side).  All derive from one token array;
# the Spark side mirrors each expression 1:1 so the per-rule booleans
# hash-match cross-engine.
_G_SQL_FRAGMENTS = f"""
      SELECT doc_id, lang, source, n_chars,
             len(toks) AS n_tokens,
             round(CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE)
                   / greatest(len(toks), 1), 4) AS mwl,
             len(list_distinct(list_filter(toks,
                 w -> list_contains([{_STOPS_SQL}], w)))) AS n_stop_distinct,
             round(CAST(len(list_filter(toks, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE)
                   / greatest(len(toks), 1), 4) AS alpha_ratio,
             round(1 - CAST(len(list_distinct(grams)) AS DOUBLE)
                   / greatest(len(grams), 1), 4) AS rep_ratio
      FROM (SELECT *,
                   list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                                  i -> toks[i] || ' ' || toks[i+1]) AS grams
            FROM (SELECT doc_id, lang, source, n_chars, text,
                         {_DUCK_TOKS} AS toks
                  FROM documents))
"""

_G_RULES_SQL = f"""
      SELECT *,
             CAST(n_tokens BETWEEN {_G_MIN_TOKENS} AND {_G_MAX_TOKENS} AS INT) AS ok_tokens,
             CAST(mwl BETWEEN {_G_MWL_LO} AND {_G_MWL_HI} AS INT) AS ok_mwl,
             CAST(n_stop_distinct >= {_G_MIN_STOPS} AS INT) AS ok_stop,
             CAST(alpha_ratio >= {_G_MIN_ALPHA} AS INT) AS ok_alpha,
             CAST(rep_ratio <= {_G_MAX_REP} AS INT) AS ok_rep
      FROM ({_G_SQL_FRAGMENTS})
"""


def _gopher_cols(d: DataFrame) -> DataFrame:
    """Per-document rule metrics + boolean rule columns (as ints).

    Mean word length avoids a higher-order sum: total non-whitespace
    chars = length(text with whitespace stripped), so the whole metric
    block stays inside whole-stage codegen except the two bounded
    list_filter lambdas (token-array-local, no shuffle)."""
    toks = tokens(F.col("text"))
    n = F.size(toks)
    char_total = F.length(F.regexp_replace(F.trim(F.col("text")), r"\s+", ""))
    mwl = F.round(char_total.cast("double") / F.greatest(n, F.lit(1)), 4)
    n_stop = F.size(
        F.array_distinct(F.filter(toks, lambda t: t.isin(*_STOPS)))
    )
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    alpha_ratio = F.round(n_alpha.cast("double") / F.greatest(n, F.lit(1)), 4)
    m = F.greatest(n - 1, F.lit(0))
    grams = F.zip_with(
        F.slice(toks, 1, m), F.slice(toks, 2, m), lambda a, b: F.concat_ws(" ", a, b)
    )
    rep = F.round(
        1
        - F.size(F.array_distinct(grams)).cast("double")
        / F.greatest(F.size(grams), F.lit(1)),
        4,
    )
    out = d.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        n.alias("n_tokens"),
        mwl.alias("mwl"),
        n_stop.alias("n_stop_distinct"),
        alpha_ratio.alias("alpha_ratio"),
        rep.alias("rep_ratio"),
    )
    return out.select(
        "*",
        F.col("n_tokens")
        .between(_G_MIN_TOKENS, _G_MAX_TOKENS)
        .cast("int")
        .alias("ok_tokens"),
        F.col("mwl").between(_G_MWL_LO, _G_MWL_HI).cast("int").alias("ok_mwl"),
        (F.col("n_stop_distinct") >= _G_MIN_STOPS).cast("int").alias("ok_stop"),
        (F.col("alpha_ratio") >= _G_MIN_ALPHA).cast("int").alias("ok_alpha"),
        (F.col("rep_ratio") <= _G_MAX_REP).cast("int").alias("ok_rep"),
    )


@register(
    "text_gopher_rules",
    oracle=f"""
    SELECT doc_id, n_tokens, mwl, n_stop_distinct, alpha_ratio, rep_ratio,
           ok_tokens, ok_mwl, ok_stop, ok_alpha, ok_rep,
           ok_tokens * ok_mwl * ok_stop * ok_alpha * ok_rep AS gopher_pass
    FROM ({_G_RULES_SQL})
    """,
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style per-document quality rules: token-count band, mean
    word length band [3,10], >=2 distinct stop words, >=80% alphabetic
    tokens, duplicate-bigram fraction <=0.10, plus the AND verdict.

    Scale shape: one projection over the corpus — no joins, no explode,
    no window; every metric is token-array-local, so the plan is a
    single scan→project stage at any corpus size.  The per-rule columns
    (not just the verdict) are the point: downstream attrition analysis
    (corpus_attrition_funnel) and threshold tuning need the marginal
    rule, not a pre-ANDed boolean."""
    d = table(spark, sf_dir, "documents")
    g = _gopher_cols(d)
    return g.select(
        "doc_id",
        "n_tokens",
        "mwl",
        "n_stop_distinct",
        "alpha_ratio",
        "rep_ratio",
        "ok_tokens",
        "ok_mwl",
        "ok_stop",
        "ok_alpha",
        "ok_rep",
        (
            F.col("ok_tokens")
            * F.col("ok_mwl")
            * F.col("ok_stop")
            * F.col("ok_alpha")
            * F.col("ok_rep")
        ).alias("gopher_pass"),
    )


# ---------------------------------------------------------------------------
# Unigram entropy / lexical diversity
# ---------------------------------------------------------------------------


@register(
    "text_unigram_entropy",
    oracle="""
    WITH tf AS (
      SELECT doc_id, tok, count(*) AS c
      FROM (SELECT doc_id, unnest(
              CASE WHEN length(trim(text)) = 0 THEN []
                   ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END) AS tok
            FROM documents)
      GROUP BY doc_id, tok)
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_distinct,
           round(CAST(max(c) AS DOUBLE) / sum(c), 4) AS top_share,
           round(log2(CAST(sum(c) AS DOUBLE))
                 - (CAST(sum(CAST(round(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))
                                        * 1000000.0) AS BIGINT)) AS BIGINT) / 1000000.0)
                   / CAST(sum(c) AS DOUBLE), 4) AS entropy
    FROM tf
    GROUP BY doc_id
    """,
)
def text_unigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram Shannon entropy (bits) + top-term share —
    the lexical-diversity signal that separates templated/boilerplate
    text (low H, high top_share) from natural prose; the continuous
    companion to the hard rep_ratio rule.

    Cross-engine determinism: H = log2(n) - (sum_t c*log2(c))/n, with
    the per-term float contribution quantized to integer micro-units
    BEFORE the sum — the sum is then exact integer arithmetic, so
    partial-aggregate merge order (Spark) vs sequential order (DuckDB)
    cannot perturb the 4-decimal result.  Scale shape: one explode →
    (doc, term) count with map-side partial combine → per-doc aggregate;
    both group-bys key on doc_id so AQE coalesces them into one exchange."""
    d = table(spark, sf_dir, "documents")
    ex = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    tf = ex.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    c_d = F.col("c").cast("double")
    units = F.round(c_d * F.log2(c_d) * F.lit(1000000.0)).cast("long")
    agg = tf.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("max_c"),
        F.sum(units).alias("units"),
    )
    n_d = F.col("n_tokens").cast("double")
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.round(F.col("max_c").cast("double") / n_d, 4).alias("top_share"),
        F.round(
            F.log2(n_d) - (F.col("units") / F.lit(1000000.0)) / n_d, 4
        ).alias("entropy"),
    )


# ---------------------------------------------------------------------------
# Language-ID evaluation: confusion matrix of predicted vs labeled lang
# ---------------------------------------------------------------------------


@register(
    "langid_confusion",
    oracle=f"""
    WITH p AS (
      SELECT doc_id, lang,
             CASE WHEN {_lang_score_sql('en')} = 0 AND {_lang_score_sql('de')} = 0
                   AND {_lang_score_sql('fr')} = 0 AND {_lang_score_sql('es')} = 0 THEN 'und'
                  WHEN {_lang_score_sql('en')} >= {_lang_score_sql('de')}
                   AND {_lang_score_sql('en')} >= {_lang_score_sql('fr')}
                   AND {_lang_score_sql('en')} >= {_lang_score_sql('es')} THEN 'en'
                  WHEN {_lang_score_sql('de')} >= {_lang_score_sql('fr')}
                   AND {_lang_score_sql('de')} >= {_lang_score_sql('es')} THEN 'de'
                  WHEN {_lang_score_sql('fr')} >= {_lang_score_sql('es')} THEN 'fr'
                  ELSE 'es' END AS lang_pred
      FROM documents)
    SELECT lang, lang_pred, count(*) AS n_docs,
           round(CAST(count(*) AS DOUBLE)
                 / sum(count(*)) OVER (PARTITION BY lang), 4) AS share_of_lang
    FROM p
    GROUP BY lang, lang_pred
    """,
)
def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID evaluation face: confusion matrix of text_langid's
    prediction against the labeled lang column, with per-label share
    (row-normalized — the recall diagonal).  On the synthetic fixture
    this also documents the classifier's known blind spot: zh has no
    stop-word list, so zh docs land on whichever list their synthetic
    vocabulary hits.

    Scale shape: lang_pred is composed INLINE next to the lang label
    (the shared langid_scores/langid_pred expression block) — ONE
    corpus scan, no join, straight into the (lang, pred) aggregate;
    the normalizing window partitions by lang over matrix-sized rows
    (#langs x #preds), never corpus-sized."""
    from .textops import langid_pred, langid_scores

    d = table(spark, sf_dir, "documents")
    pred = langid_pred(langid_scores(tokens(F.col("text"))))
    m = (
        d.select("lang", pred.alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    tot = F.sum("n_docs").over(W.partitionBy("lang"))
    return m.select(
        "lang",
        "lang_pred",
        "n_docs",
        F.round(F.col("n_docs").cast("double") / tot, 4).alias("share_of_lang"),
    )


# ---------------------------------------------------------------------------
# First-failing-rule attrition funnel
# ---------------------------------------------------------------------------

# the REAL gate's language list — imported, not copied, so the funnel's
# known_lang stage can never drift from the quality gate it budgets
_GATE_LANGS = _QC_GATE_LANGS
_GATE_LANGS_SQL = ", ".join(f"'{x}'" for x in _GATE_LANGS)

# (stage name, ordinal, DuckDB predicate) — evaluation ORDER is the
# funnel: a doc is attributed to its FIRST failing rule only.
_FUNNEL_SQL_STAGES = (
    ("min_length", 1, "coalesce(n_chars >= 100, FALSE)"),
    ("known_lang", 2, f"coalesce(lang IN ({_GATE_LANGS_SQL}), FALSE)"),
    ("has_source", 3, "source IS NOT NULL"),
    ("min_tokens", 4, f"n_tokens >= {_G_MIN_TOKENS}"),
    ("stop_floor", 5, f"n_stop_distinct >= {_G_MIN_STOPS}"),
    ("low_repetition", 6, f"rep_ratio <= {_G_MAX_REP}"),
)

_FUNNEL_CASE = "CASE " + " ".join(
    f"WHEN NOT ({pred}) THEN '{name}'" for name, _, pred in _FUNNEL_SQL_STAGES
) + " ELSE 'pass' END"
_FUNNEL_ORD = "CASE " + " ".join(
    f"WHEN NOT ({pred}) THEN {o}" for name, o, pred in _FUNNEL_SQL_STAGES
) + " ELSE 99 END"


@register(
    "corpus_attrition_funnel",
    oracle=f"""
    WITH m AS ({_G_SQL_FRAGMENTS}),
    hit AS (
      SELECT {_FUNNEL_CASE} AS stage, {_FUNNEL_ORD} AS ord
      FROM m),
    agg AS (
      SELECT stage, ord, count(*) AS n_hit FROM hit GROUP BY stage, ord),
    tot AS (SELECT CAST(sum(n_hit) AS BIGINT) AS total FROM agg)
    SELECT stage, ord, CAST(n_hit AS BIGINT) AS n_hit,
           CAST(tot.total - sum(CASE WHEN stage = 'pass' THEN 0 ELSE n_hit END)
                            OVER (ORDER BY ord) AS BIGINT) AS survivors_after
    FROM agg CROSS JOIN tot
    """,
)
def corpus_attrition_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-failing-rule attrition funnel over the curation rule chain
    (gate rules → Gopher rules → repetition): each document is attributed
    to the FIRST rule it fails, so the per-stage counts sum to the corpus
    and `survivors_after` is the population the NEXT stage actually sees
    — the number a pipeline owner needs to budget each stage, which the
    independent per-rule pass rates (text_gopher_rules) cannot give.

    Scale shape: one corpus projection (the same token-array-local
    metric block as text_gopher_rules) → a stage-cardinality aggregate;
    the cumulative window runs over <=7 post-aggregation rows.  The
    'pass' row's survivors_after equals its own n_hit by construction
    (total minus every drop)."""
    d = table(spark, sf_dir, "documents")
    g = _gopher_cols(d)
    spark_preds = {
        "min_length": F.coalesce(F.col("n_chars") >= 100, F.lit(False)),
        "known_lang": F.coalesce(F.col("lang").isin(*_GATE_LANGS), F.lit(False)),
        "has_source": F.col("source").isNotNull(),
        "min_tokens": F.col("n_tokens") >= _G_MIN_TOKENS,
        "stop_floor": F.col("n_stop_distinct") >= _G_MIN_STOPS,
        "low_repetition": F.col("rep_ratio") <= _G_MAX_REP,
    }
    stage = F.lit("pass")
    ordc = F.lit(99)
    for name, o, _ in reversed(_FUNNEL_SQL_STAGES):
        stage = F.when(~spark_preds[name], F.lit(name)).otherwise(stage)
        ordc = F.when(~spark_preds[name], F.lit(o)).otherwise(ordc)
    agg = (
        g.select(stage.alias("stage"), ordc.alias("ord"))
        .groupBy("stage", "ord")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    total = agg.agg(F.sum("n_hit").alias("total"))
    cum = F.sum(
        F.when(F.col("stage") == "pass", F.lit(0)).otherwise(F.col("n_hit"))
    ).over(W.orderBy("ord").rowsBetween(W.unboundedPreceding, 0))
    return (
        agg.crossJoin(F.broadcast(total))
        .select(
            "stage",
            "ord",
            "n_hit",
            (F.col("total") - cum).alias("survivors_after"),
        )
    )
