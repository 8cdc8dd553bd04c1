"""Reusable column expressions.

All pure JVM-side expressions (whole-stage codegen) — no Python UDFs in
any hot path. Vector math uses higher-order functions over array columns
with sequential double accumulation, which is bit-identical to the DuckDB
oracle's evaluation order (crucial for cross-engine value hashing) and
stays inside codegen at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_vec(c: Column | str) -> Column:
    """array<float> -> array<double> so all arithmetic runs in fp64."""
    c = F.col(c) if isinstance(c, str) else c
    return F.transform(c, lambda x: x.cast("double"))


def vec_dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product of two array<double> columns."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def vec_dot_unrolled(a: Column, b: Column, dim: int) -> Column:
    """Dot product unrolled to a fixed-dimension sum chain.

    Bit-identical to vec_dot (same left-associative 0.0+x1+...+xd order)
    but, unlike the higher-order aggregate/zip_with form — which Spark
    evaluates interpreted, outside whole-stage codegen — the unrolled
    expression codegens. For hot per-pair loops (all-pairs similarity)
    this is ~10x. Requires the true dimension; element_at past the end
    would be an ANSI error."""
    s: Column = F.lit(0.0)
    for i in range(1, dim + 1):
        s = s + F.element_at(a, i) * F.element_at(b, i)
    return s


def vec_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity over array<double> columns; NULL if either norm 0."""
    return vec_dot(a, b) / (vec_norm(a) * vec_norm(b))


def tokens(text: Column | str) -> Column:
    """Lowercased whitespace tokens; [] for blank text. Matches
    regexp_split_to_array(trim(lower(x)), '\\s+') in DuckDB."""
    text = F.col(text) if isinstance(text, str) else text
    t = F.trim(F.lower(text))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def word_ngrams(toks: Column, n: int) -> Column:
    """Distinct word n-gram shingles from a token array.

    Built as zip_with over n shifted slices rather than
    transform(sequence, i -> element_at(toks, i+k)): Catalyst inlines
    the `toks` expression into every lambda reference, so the element_at
    form re-evaluates the underlying split() O(tokens·n) times per row
    (measured 4x slower at sf0.1); the slice form references `toks` a
    constant ~2n times per row. Also avoids sequence(1,0) == [1,0]
    (descending!) on docs shorter than n tokens — slices are just empty."""
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    grams = F.slice(toks, 1, m)
    for k in range(1, n):
        grams = F.zip_with(
            grams, F.slice(toks, k + 1, m), lambda a, b: F.concat_ws(" ", a, b)
        )
    return F.array_distinct(grams)


def md5_bucket(col: Column | str, mod: int = 100, salt: str = "") -> Column:
    """Deterministic integer bucket in [0, mod) from the md5 of a column
    — the engine-neutral sampling/splitting hash (first 4 hex nibbles,
    positionally parsed).  SQL twin: ``duck_md5_bucket``."""
    col = F.col(col) if isinstance(col, str) else col
    key = F.concat(F.lit(salt), col.cast("string")) if salt else col.cast("string")
    return (
        F.conv(F.substring(F.md5(key), 1, 4), 16, 10).cast("int") % mod
    )


def duck_hex4(expr: str) -> str:
    """First-4-hex-nibbles → int, expressible in DuckDB SQL (strpos
    parse — conv() has no DuckDB twin).  Shared by every md5-bucket
    oracle; the Spark twin is ``md5_bucket``."""
    digit = "strpos('0123456789abcdef', substr({h}, {i}, 1)) - 1"
    parts = [f"({digit.format(h=expr, i=i)}) * {16 ** (4 - i)}" for i in range(1, 5)]
    return "(" + " + ".join(parts) + ")"


def duck_md5_bucket(id_expr: str, mod: int = 100, salt: str = "") -> str:
    """DuckDB SQL for ``md5_bucket``: bucket in [0, mod) of an id
    expression (optionally salted)."""
    key = f"concat('{salt}', CAST({id_expr} AS VARCHAR))" if salt else f"CAST({id_expr} AS VARCHAR)"
    return duck_hex4(f"md5({key})") + f" % {mod}"


def local_rows_df(spark, rows, schema):
    """DataFrame from a small DRIVER-side row list in ONE partition.

    ``spark.createDataFrame(list)`` parallelizes the list into
    ``defaultParallelism`` python slices — on local[32] that is 32
    Python-worker round trips for a handful of rows (r15 profile: a
    40-row probe table cost a 32-task job with ~10 s of task time in
    ann_ivf_kmeans's timed run).  A single slice ships one pickle
    stream through one worker; anything that came through the driver
    is by definition small enough for one task."""
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
