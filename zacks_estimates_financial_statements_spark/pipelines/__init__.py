"""The three reference lifecycles as Spark dataflows (SURVEY §3)."""
