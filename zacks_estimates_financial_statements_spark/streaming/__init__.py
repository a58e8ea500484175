"""Structured Streaming extension (beyond reference parity — SURVEY §2.9:
the reference is strictly batch; this is the Spark-first incremental
ingestion path over the same raw zone and tables)."""
