"""Python UDTF surface (Spark 4 table-valued functions).

The reference has no extension points at all (src/execution/plan.rs:29-68
is a closed enum); UDTFs are the Spark-native way to add a table-valued
operator. The example is the training-pipeline classic: fixed-size
document chunking (one input doc -> N chunk rows), the shape used to cut
a corpus into model-context-sized pieces.

Scale notes: a UDTF is Python-side (slow path) — fine here because
chunking is a narrow, embarrassingly parallel map with no shuffle; the
JVM-side twin for production is `chunks_sql` (substring + sequence +
explode), registered as `text_chunks_builtin`. Both produce identical
rows; the oracle covers both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from ..registry import register
from ..sources import table

CHUNK = 200  # characters per chunk


@udtf(returnType="chunk_idx int, chunk string")
class ChunkText:
    """Yield fixed-size character chunks of one document."""

    def eval(self, text: str):
        if text is None:
            return
        for i in range(0, max(len(text), 1), CHUNK):
            yield i // CHUNK, text[i : i + CHUNK]


_CHUNK_ORACLE = f"""
    SELECT d.doc_id, CAST(gs.i AS INTEGER) AS chunk_idx,
           substring(d.text, gs.i * {CHUNK} + 1, {CHUNK}) AS chunk
    FROM documents d CROSS JOIN generate_series(0, 63) gs(i)
    WHERE gs.i * {CHUNK} < greatest(length(d.text), 1)
    """


@register("udtf_chunk_documents", oracle=_CHUNK_ORACLE)
def udtf_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral-join the Python UDTF against documents: each row fans out
    to ceil(len/CHUNK) chunk rows."""
    spark.udtf.register("chunk_text", ChunkText)
    table(spark, sf_dir, "documents").createOrReplaceTempView("udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.chunk "
        "FROM udtf_docs d, LATERAL chunk_text(d.text) c"
    )


def chunk_docs_frame(d: DataFrame) -> DataFrame:
    """(doc_id, chunk_idx, chunk) for any frame with doc_id+text — the
    codegen chunker shared by the registered query and the pipeline's
    incremental index admission (which chunks only the NEW batch)."""
    n_chunks = F.greatest(
        F.ceil(F.length("text") / F.lit(CHUNK)).cast("int"), F.lit(1)
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.substring(F.col("text"), i * CHUNK + 1, CHUNK).alias("chunk"),
        ),
    )
    return (
        d.select("doc_id", F.explode(chunks).alias("c"))
        .select("doc_id", "c.chunk_idx", "c.chunk")
    )


@register("text_chunks_builtin", oracle=_CHUNK_ORACLE)
def text_chunks_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JVM-side twin of the UDTF: sequence + transform + explode stays in
    whole-stage codegen — this is the 100 TB production path."""
    return chunk_docs_frame(table(spark, sf_dir, "documents"))


@register(
    "dedup_chunk_exact",
    oracle=f"""
    WITH chunks AS (
      SELECT d.doc_id, md5(substring(d.text, gs.i * {CHUNK} + 1, {CHUNK})) AS fp
      FROM documents d CROSS JOIN generate_series(0, 63) gs(i)
      WHERE gs.i * {CHUNK} < greatest(length(d.text), 1)),
    freq AS (SELECT fp, count(*) AS n_copies FROM chunks GROUP BY fp)
    SELECT c.doc_id,
           count(*) AS n_chunks,
           CAST(sum(CASE WHEN f.n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
           round(CAST(sum(CASE WHEN f.n_copies > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 4) AS dup_frac
    FROM chunks c JOIN freq f USING (fp)
    GROUP BY c.doc_id
    """,
)
def dedup_chunk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document (chunk-level) dedup — the boilerplate detector:
    chunk every document, fingerprint each chunk, and report per doc how
    many of its chunks also appear elsewhere in the corpus. Pipelines
    strip repeated chunks (headers, footers, license blocks) that
    doc-level dedup can't see.

    Scale shape: the corpus-wide chunk-frequency table aggregates on the
    16-byte md5 — one shuffle carrying fingerprints only, never text;
    the join back is fingerprint-keyed. Doc bodies stay in their scan
    stage (chunk + hash are codegen'd row ops)."""
    chunks = text_chunks_builtin(spark, sf_dir).select(
        "doc_id", F.md5(F.col("chunk").cast("binary")).alias("fp")
    )
    freq = chunks.groupBy("fp").agg(F.count(F.lit(1)).alias("n_copies"))
    dup = F.sum((F.col("n_copies") > 1).cast("long"))
    return (
        chunks.join(freq, "fp")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            dup.alias("n_dup_chunks"),
            F.round(dup / F.count(F.lit(1)), 4).alias("dup_frac"),
        )
    )
