"""zacks_estimates_financial_statements_spark — a PySpark-native analytics engine.

A from-scratch engine with the query and data-processing capabilities of
``evdubs/zacks-estimates-financial-statements`` (a Racket+PostgreSQL ELT
pipeline for Zacks financial data), re-expressed Spark-first:

- ``schemas``      — the 12-table data model (reference ``schema.sql``).
- ``functions``    — scalar expression kit (SURVEY §2.4 F1-F16) plus text
  analysis / vector math for the large-scale training-data extensions.
- ``sources``      — raw-zone (dated HTML/JSON directory) and table readers.
- ``operators``    — writer library (upsert / windowed delete semantics over
  Parquet), range join, dedup, similarity search, multimodal plumbing.
- ``parse``        — document parsers: calendar JSON (pure Spark SQL) and
  positional HTML cell extraction (Arrow-batched ``mapInPandas``).
- ``pipelines``    — the three reference lifecycles (SURVEY §3).
- ``export``       — CSV dump surface (SURVEY §2.8 W8).
- ``streaming``    — Structured Streaming extension over the raw zone.

Everything is built on the public Apache Spark DataFrame/SQL API; Catalyst
is the optimizer and Parquet the storage layer.
"""

__version__ = "0.1.0"
