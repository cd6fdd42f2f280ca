"""lab_etl_spark — a PySpark-native analytics engine with the capabilities of
ulfsri/lab-etl, re-expressed Spark-first, plus the large-scale query surface
(joins/aggs/windows/dedup/similarity/text-analysis) described in SURVEY.md §2B.

Layout:
  session    — tuned SparkSession factory (local testing; cluster-safe defaults)
  catalog    — lake-table loaders for the driver-generated parquet tables
  queries    — the registered query catalog (name -> spark fn + DuckDB oracle SQL)
  operators  — reusable distributed operators (dedup, similarity, as-of, interp)
  functions  — scalar/column helpers (value-unit parsing, date cascade, metadata)
  sources    — instrument-file sources re-expressed as Spark scans (SURVEY §2A)
  streaming  — Structured Streaming variants of the event-time operators
"""

__version__ = "0.1.0"
