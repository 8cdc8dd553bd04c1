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


@register("text_chunks_builtin", oracle=_CHUNK_ORACLE)
def text_chunks_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JVM-side twin of the UDTF: sequence + transform + explode stays in
    whole-stage codegen — this is the 100 TB production path."""
    d = table(spark, sf_dir, "documents")
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
