"""End-to-end training-corpus pipeline — the capstone composition of the
data-pipeline operators: dedup → quality filter → language tag → token
accounting → partitioned corpus write.

Each stage is the registered operator's logic reused as a library
function, so the pipeline is one lazy DataFrame graph: Catalyst fuses
the per-row stages into the same scan, and the only shuffles are the
ones the semantics require (exact-dedup group, near-dup clustering).
At 100 TB this runs as a single job whose output is partitioned by
language — the layout downstream training jobs partition-prune on.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .operators.graph import dedup_clusters
from .operators.textops import text_langid, text_stats
from .sources import table


def build_training_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str | None = None,
    min_tokens: int = 10,
    max_stop_ratio: float = 0.9,
    max_rep_ratio: float | None = None,
    decontaminate: bool = False,
    observation: Optional[Observation] = None,
) -> DataFrame:
    """documents → cluster-level near-dup removal → quality filter →
    (optional) repetition filter and benchmark decontamination →
    language tag → token counts; optionally written partitioned by
    predicted language. Returns the corpus DataFrame.

    Pass an ``Observation`` to collect corpus metrics (row count, token
    total, per-language spread) as a side effect of whatever action
    materializes the result — zero extra passes over the data, which is
    the only acceptable cost for monitoring a 100 TB job."""
    docs = table(spark, sf_dir, "documents")

    # 1. near-dup removal: keep each cluster's representative (min doc_id)
    clusters = dedup_clusters(spark, sf_dir)
    keep = clusters.filter(F.col("doc_id") == F.col("cluster_id")).select("doc_id")
    docs = docs.join(keep, "doc_id", "left_semi")

    # 2. quality filter on cheap per-row stats
    stats = text_stats(spark, sf_dir).select("doc_id", "n_tokens", "stop_ratio")
    docs = (
        docs.join(stats, "doc_id")
        .filter((F.col("n_tokens") >= min_tokens) & (F.col("stop_ratio") <= max_stop_ratio))
    )

    # 2b. repetition gate (boilerplate/generated text) — per-row, fuses
    # into the same scan stage
    if max_rep_ratio is not None:
        from .operators.corpus_ext import text_repetition_ratio

        rep = text_repetition_ratio(spark, sf_dir).select("doc_id", "rep_ratio")
        docs = docs.join(rep, "doc_id").filter(F.col("rep_ratio") <= max_rep_ratio)

    # 2c. benchmark decontamination — drop any doc sharing 5-grams with
    # the held-out set (broadcast anti-join on contaminated doc_ids)
    if decontaminate:
        from .operators.corpus_ext import decontaminate_ngram

        dirty = decontaminate_ngram(spark, sf_dir).select("doc_id")
        docs = docs.join(F.broadcast(dirty), "doc_id", "left_anti")

    # 3. language tag
    lang = text_langid(spark, sf_dir).select("doc_id", "lang_pred")
    corpus = docs.join(lang, "doc_id").select(
        "doc_id", "text", "source", "n_tokens", "lang_pred"
    )

    if observation is not None:
        corpus = corpus.observe(
            observation,
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.approx_count_distinct("lang_pred").alias("n_langs"),
        )

    # 4. partitioned write: downstream jobs prune on lang_pred
    if out_dir:
        corpus.write.mode("overwrite").partitionBy("lang_pred").parquet(out_dir)
    return corpus
