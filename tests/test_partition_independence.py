"""Partition-independence lock for the exact-arithmetic discipline.

Many queries here promise "bit-stable at any parallelism": money sums in
DECIMAL, float moments quantized to integer units before aggregation,
transcendentals quantized before normalizing sums.  The driver runs a
vanilla session (200 shuffle partitions) against our tuned ones (8-32),
so a violation shows up as an oracle hash mismatch — but only for the
query that regressed, and only at driver time.  This test locks the
property directly: the same query at 3 and at 67 shuffle partitions
must produce IDENTICAL values, row for row.
"""

from __future__ import annotations

import pytest

from oxidsql_spark.cachescope import release_scoped_caches
from oxidsql_spark.registry import load_all

# The quantization-sensitive set: float moments, transcendentals,
# iterative integer arithmetic — everywhere partial-agg merge order
# could leak into results if the discipline slipped.
SENSITIVE = [
    "stats_moments",
    "lineitem_corr_matrix",
    "embeddings_dim_stats",
    "events_anomaly",
    "source_term_drift",
    "source_temperature_mix",
    "embeddings_kmeans",
    "udaf_acctbal_sumsq",
    # r7: the two-phase distributed window/rank paths — the prefix-offset
    # hierarchy must be invariant to how ranges split across partitions
    "seq_pack_stats",
    "vocab_coverage",
]


def _rows_at(spark, sf_dir, name, nparts):
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(nparts))
        return sorted(map(tuple, load_all()[name].fn(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
        release_scoped_caches()


@pytest.mark.parametrize("name", SENSITIVE)
def test_partition_count_invariant(spark, sf_dir, name):
    assert _rows_at(spark, sf_dir, name, 3) == _rows_at(spark, sf_dir, name, 67), name
