"""Operator modules. Importing them registers their queries (see
oxidsql_spark.registry.load_all)."""
