"""Spark-side engine: encode/decode jobs, lineage, blooms, golden baseline."""
