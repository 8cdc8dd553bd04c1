"""Statistics capabilities — the reference's 'crown jewels' (SURVEY §4)
mapped to Spark-native equivalents.

Reference machinery → Spark twin:
* online cardinality counter + Counting-HLL ndv sketches per column
  (access/heap.rs:245-292, statistics/counting_hyperloglog.rs)
  → ``analyze_table`` (ANALYZE TABLE … COMPUTE STATISTICS FOR COLUMNS —
  Catalyst's CBO consumes rowCount/ndv the way DPccp was meant to
  consume the reference's sketches) and ``ndv_sketch`` for the
  query-level HLL (approx_count_distinct — same sketch family);
* 1024-row reservoir sample per table, predicates executed against the
  sample for cardinality estimation (planner/bottomup.rs:111-168,
  SAMPLE_SIZE catalog/mod.rs:37)
  → ``TableSample``: a seeded ``df.sample`` materialized once (cheap at
  any scale — the sample is tiny and reusable), with
  ``estimate_selectivity`` reproducing the estimate = matching/total,
  floored at base/(2·SAMPLE_SIZE) and 1 (bottomup.rs:159-161).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

SAMPLE_SIZE = 1024  # the reference's SAMPLE_SIZE (catalog/mod.rs:37)
SAMPLE_SEED = 42


class TableSample:
    """Persisted-in-memory seeded sample of a table — the Spark twin of
    the reference's reservoir-sample shadow table (heap.rs:258-289).

    At 100 TB the sample is built with one pass (df.sample pushes the
    bernoulli filter into the scan) and cached; every subsequent
    estimate is driver-local arithmetic over ≤ ~SAMPLE_SIZE rows."""

    def __init__(self, df: DataFrame, sample_size: int = SAMPLE_SIZE, seed: int = SAMPLE_SEED):
        self.base_count = df.count()
        if self.base_count == 0:
            fraction = 0.0
        else:
            # oversample slightly then cap — df.sample is approximate
            fraction = min(1.0, (sample_size * 1.2) / self.base_count)
        self.sample = df.sample(fraction=fraction, seed=seed).limit(sample_size).cache()
        self.sample_count = self.sample.count()

    def estimate_selectivity(self, predicate: Column | str) -> float:
        """matching/total over the sample (bottomup.rs:121-161)."""
        if self.sample_count == 0:
            return 1.0
        pred = F.expr(predicate) if isinstance(predicate, str) else predicate
        matching = self.sample.filter(pred).count()
        return matching / self.sample_count

    def estimate_cardinality(self, predicate: Column | str) -> int:
        """estimate = sel × base, floored at base/(2·SAMPLE_SIZE) and 1 —
        exactly the reference's floor rule (bottomup.rs:159-161)."""
        est = self.estimate_selectivity(predicate) * self.base_count
        floor = self.base_count / (2 * SAMPLE_SIZE)
        return max(int(est), int(floor), 1)


def ndv_sketch(df: DataFrame, *cols: str, rsd: float = 0.05) -> dict[str, int]:
    """Per-column approximate distinct counts via HyperLogLog++ — the
    query-level twin of the reference's CountingHLL (its test bound is
    ±20% at 200k distinct; HLL++ at rsd=0.05 is tighter)."""
    row = df.agg(
        *[F.approx_count_distinct(c, rsd).alias(c) for c in cols]
    ).collect()[0]
    return {c: row[c] for c in cols}


def exact_ndv(df: DataFrame, *cols: str) -> dict[str, int]:
    row = df.agg(*[F.countDistinct(c).alias(c) for c in cols]).collect()[0]
    return {c: row[c] for c in cols}


def analyze_table(spark: SparkSession, name: str, columns: list[str] | None = None) -> None:
    """ANALYZE TABLE — refresh the catalog statistics CBO join-reorder
    consumes; the batch twin of the reference's online stats maintenance
    (re-run after each ingest batch, SURVEY §7 risk register)."""
    cols = f" FOR COLUMNS {', '.join(columns)}" if columns else ""
    spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS{cols}")
