"""Scalar/vector function kits: reference parity (``expressions``) plus
large-scale text analysis (``text``) and vector math (``vectors``)."""

from zacks_estimates_financial_statements_spark.functions import expressions, text, vectors  # noqa: F401
