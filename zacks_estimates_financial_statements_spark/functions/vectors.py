"""Vector math over ``array<float>`` embedding columns.

Built on ``F.zip_with`` / ``F.aggregate`` (higher-order functions) so the
math runs JVM-side over the array values — no Python, no explode. Sums
fold left-to-right over the array, which is deterministic and matches
DuckDB's ``list_*`` fold order, keeping the oracle hashes stable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two equal-length float arrays, accumulated in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    """L2 norm."""
    return F.sqrt(
        F.aggregate(a, F.lit(0.0),
                    lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL-safe on zero vectors (returns NULL)."""
    denom = norm(a) * norm(b)
    return F.when(denom == 0.0, F.lit(None).cast("double")).otherwise(dot(a, b) / denom)


def sq_l2(a: Column, b: Column) -> Column:
    """Squared L2 distance (no sqrt — the quantity PQ codebooks and
    ADC tables compare; monotone with euclidean, cheaper, and exactly
    reproducible in the DuckDB fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def euclidean(a: Column, b: Column) -> Column:
    """Euclidean (L2) distance."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                       * (x.cast("double") - y.cast("double"))),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def mean_component(a: Column) -> Column:
    """Mean of the vector's components (used for cheap LSH-style bucketing)."""
    return F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double")) / F.size(a)


def sign_bits(a: Column, dims: int) -> Column:
    """First-``dims`` sign bits packed into a bigint — a trivial random-
    hyperplane-free SRP sketch usable as an LSH bucket key (components of a
    learned embedding are near-uncorrelated, so axis-aligned signs work as
    hyperplanes)."""
    bits = F.slice(a, 1, dims)
    return F.aggregate(
        bits,
        F.lit(0).cast("bigint"),
        lambda acc, v: acc * 2 + F.when(v >= 0, 1).otherwise(0),
    )
