"""oxidsql_spark — a PySpark-native analytics engine with the capability
surface of mzinsmeister/OxidSQL, extended to a 100 TB-scale data-pipeline
engine.

The reference (/root/reference, Rust) implements a volcano-style
single-node engine: tablescan, selection, projection, hash equi-join,
inline table, insert, create table (src/execution/plan.rs:29-68).  Here
every one of those capabilities — and the extensions its README TODO-lists
(GROUP BY, ORDER BY, LIMIT, functions, set ops) — is expressed as
declarative PySpark DataFrame / Spark SQL plans so Catalyst + Tungsten
choose the physical strategy (broadcast vs shuffle join, whole-stage
codegen, AQE re-planning).  Nothing is interpreted tuple-at-a-time.

Layout:
  session.py    — SparkSession factory with CBO/AQE/Arrow configs
  sources/      — parquet table loaders (the driver's TPC-H-ish testdata)
  registry.py   — query registry: name -> (spark_fn, duckdb oracle SQL)
  operators/    — relational + dedup + similarity + text + multimodal ops
  functions/    — reusable column expressions (vector math, text stats)
  streaming/    — Structured Streaming twins of the batch event queries
  database.py   — OxidSQL-parity facade (CREATE TABLE / INSERT / SELECT)
  statistics.py — sample-based selectivity + NDV estimation (reference §4)
"""

__version__ = "0.1.0"
