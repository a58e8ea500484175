"""Document parsers: calendar JSON (pure Spark SQL) and positional HTML
cell extraction (Arrow-batched ``mapInPandas``)."""
