"""Count-min sketch frequency estimation (Cormode & Muthukrishnan,
J. Algorithms 2005).

Spark ships HLL (``approx_count_distinct``) and GK quantiles
(``approx_percentile``) natively; the missing member of the sketch
family for stream/corpus accounting is count-min — sublinear-memory
frequency estimates with a one-sided error bound (estimates never
undercount; overcount ≤ N/w with probability 1 - (1/2)^d under the
standard analysis).

The sketch here is deterministic: row hashes come from the same
md5-derived 60-bit family the engine uses everywhere
(``dedup.hash60`` with a row-index seed), so the SAME sketch — and
therefore the exact estimates — is reproducible in ANSI SQL, making
the operator oracle-checkable rather than "approximately right".

Scale shape: building the sketch is one explode (d rows per input row)
into a map-side-combined ``groupBy`` over at most d×w counter cells —
the shuffle is bounded by the sketch size, not the data. Estimating is
a broadcast join of the d×w counter table against the query keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from zacks_estimates_financial_statements_spark.operators.dedup import hash60


def _bucket(key, row: int, width: int):
    """Deterministic bucket of ``key`` for sketch row ``row``."""
    return (hash60(F.concat(F.lit(f"cm{row}|"), key.cast("string")))
            % width)


def cm_build(df: DataFrame, key_col: str, depth: int = 4,
             width: int = 1024) -> DataFrame:
    """Build the counter table: ``(row, bucket, cnt)`` — at most
    ``depth × width`` cells regardless of input size."""
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    key = F.col(key_col)
    # d structs built explicitly (the row index seeds the hash, so it
    # must be a Python literal, not a transform() lambda variable)
    cells = F.array(*[
        F.struct(F.lit(r).alias("row"),
                 _bucket(key, r, width).alias("bucket"))
        for r in range(depth)])
    return (df.select(F.explode(cells).alias("c"))
            .groupBy(F.col("c.row").alias("row"),
                     F.col("c.bucket").alias("bucket"))
            .agg(F.count("*").alias("cnt")))


def cm_estimate(sketch: DataFrame, keys: DataFrame, key_col: str,
                depth: int = 4, width: int = 1024) -> DataFrame:
    """Estimate each key's frequency: min over the d counter cells the
    key hashes to. ``keys`` should be distinct; the counter table (≤
    d×w rows) broadcasts, so estimation never shuffles the key side."""
    key = F.col(key_col)
    probes = (keys.select(
        key, F.explode(F.array(*[
            F.struct(F.lit(r).alias("row"),
                     _bucket(key, r, width).alias("bucket"))
            for r in range(depth)])).alias("p"))
        .select(key, F.col("p.row").alias("row"),
                F.col("p.bucket").alias("bucket")))
    # LEFT join: a cell no build-row hashed to is an EMPTY cell, i.e. a
    # zero counter — it must participate in the min (an inner join
    # would drop it, inflating or losing the estimate for unseen keys)
    return (probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
            .groupBy(key_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .alias("est_count")))


def cm_heavy_hitters(df: DataFrame, key_col: str, threshold: int,
                     depth: int = 4, width: int = 1024) -> DataFrame:
    """Keys whose count-min estimate is ≥ ``threshold``. One-sided:
    every true heavy hitter survives (estimates never undercount);
    some light keys may tag along within the +N/w overcount bound."""
    sketch = cm_build(df, key_col, depth, width)
    keys = df.select(key_col).distinct()
    return (cm_estimate(sketch, keys, key_col, depth, width)
            .filter(F.col("est_count") >= threshold))
