"""Numeric-extremes contracts (r12 ``--extreme-rate`` fuzz dial).

The r12 recon injected rotating boundary values (±1e±30, subnormals,
±DBL_MAX, ±1e32 just over decimal(38,6)'s max, LONG_MIN/MAX ids) into
every numeric column and found 33 divergent queries — the largest
fault class since r8. The repo-wide contracts that closed it, pinned
here:

- EXACT-AGGREGATION DOMAIN: decimal(38,6)-routed measures accept
  |x| < 1e26 (``util.DEC6_DOMAIN``); outside it (non-finite included)
  a measure is NULL per row, never an ANSI abort and never a decimal
  SUM overflow (real measures are ≤ ~1e15, so the bound leaves ≥1e17
  rows of summation headroom). Twins state the identical guard
  (``_decg``).
- ID MIXING IS pmod-REDUCED: synthesized-key arithmetic
  (``(id*31+7) % 97``-style) reduces the id BEFORE multiplying —
  LONG_MAX*31 aborts under ANSI; pmod keeps canonical non-negative
  ids bit-identical.
- Catalyst REASSOCIATES +: ``a + 250 + a%3`` can evaluate as
  ``(a + a%3) + 250``, so range guards must cover the reassociated
  order (hard_negatives' planted positives).
- MULTI-VERSION REASSEMBLY TIES: per-doc reassembly over colliding-id
  versions (bpe/unigram encode, span removal) breaks position ties by
  the PIECE/WORD value (Spark's array_sort over structs) — twins must
  ORDER BY (pos, value), never physical row order.
- INTEGER BUCKETS USE DIV: ``floor(x/100.0)`` loses precision above
  2^53 and floors negatives where DuckDB's ``//`` truncates — integer
  bucketing is ``DIV`` (trunc) on both engines.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from zacks_estimates_financial_statements_spark import util
from zacks_estimates_financial_statements_spark.operators import graph, profiling

LONG_MIN = -9223372036854775808
LONG_MAX = 9223372036854775807


@pytest.fixture(scope="module")
def spark():
    from zacks_estimates_financial_statements_spark.session import get_spark
    return get_spark(master="local[4]",
                     extra_conf={"spark.ui.enabled": "false"})


def test_dec6_domain_guard(spark):
    vals = [1.5, 9.9e25, 1e26, 1e30, 1.7976931348623157e308,
            -1e32, 5e-324, float("nan"), float("inf"), None]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r["d"] for r in
           df.select(util.dec6(F.col("x")).alias("d")).collect()]
    assert float(got[0]) == 1.5
    assert float(got[1]) == 9.9e25          # inside the domain: kept
    assert got[2] is None                   # 1e26 boundary: excluded
    assert got[3] is None and got[4] is None and got[5] is None
    assert float(got[6]) == 0               # subnormal rounds to 0
    assert got[7] is None and got[8] is None and got[9] is None


def test_dec6_integral_long_min(spark):
    # r13 (ADVICE): dec6 over a BIGINT measure column — abs(LONG_MIN)
    # itself ANSI-aborts (ARITHMETIC_OVERFLOW) if the guard compares on
    # the raw column, so the guard must compare on a double projection.
    # LONG_MIN ≈ -9.2e18 is INSIDE the 1e26 domain and must survive
    # exactly (the value cast reads the original integral column).
    df = spark.createDataFrame(
        [(LONG_MIN,), (LONG_MAX,), (42,), (None,)], "x bigint")
    got = {r["x"]: r["d"] for r in
           df.select("x", util.dec6(F.col("x")).alias("d")).collect()}
    assert int(got[LONG_MIN]) == LONG_MIN
    assert int(got[LONG_MAX]) == LONG_MAX
    assert int(got[42]) == 42
    assert got[None] is None
    row = df.agg(F.sum(util.dec6(F.col("x"))).alias("s")).collect()[0]
    assert int(row["s"]) == 41  # LONG_MIN + LONG_MAX + 42 = 41


def test_dec6_sum_never_aborts(spark):
    # the r12 recon's killer shape: a few representable-but-huge values
    # in one aggregate overflow the decimal SUM itself under ANSI; the
    # domain guard NULLs them per row instead
    df = spark.createDataFrame(
        [(1e30,), (9.9e31,), (2.5,), (3.5,)], "x double")
    row = df.agg(F.sum(util.dec6(F.col("x"))).alias("s")).collect()[0]
    assert float(row["s"]) == 6.0


def test_correlation_and_standardize_survive_extremes(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0), (2.0, 4.0), (1e30, 8.0), (3.0, 1.7976931348623157e308)],
        "a double, b double")
    out = profiling.correlation_matrix(df, ["a", "b"]).collect()
    assert len(out) == 1        # no abort; r computed from guarded moments
    std = profiling.standardize(df, ["a", "b"]).collect()
    assert len(std) == 4


def test_connected_components_extreme_ids(spark):
    edges = spark.createDataFrame(
        [(LONG_MIN, LONG_MAX), (LONG_MAX, -1), (5, 6)],
        "id_a long, id_b long")
    for kw in ({}, {"max_local_edges": 0}):
        labels = {r["node"]: r["component"]
                  for r in graph.connected_components(edges, **kw).collect()}
        assert labels[LONG_MIN] == LONG_MIN
        assert labels[LONG_MAX] == LONG_MIN
        assert labels[-1] == LONG_MIN
        assert labels[6] == 5


def test_catalyst_add_reassociation_is_real(spark):
    # documents the hazard the hard_negatives guard exists for: the
    # chain (a + 250) + (a % 3) is representable step-by-step at
    # LONG_MIN, yet the plan aborts because Catalyst groups (a + a%3)
    # first. If this ever starts PASSING, the guard can be revisited.
    df = spark.createDataFrame([(LONG_MIN,)], "a bigint")
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW"):
        df.select((F.col("a") + 250 + F.col("a") % 3).alias("v")).collect()
    # the guarded form never aborts and yields NULL out of range
    safe = (F.col("a") > -9223372036854775556) & \
           (F.col("a") < 9223372036854775556)
    row = df.select(F.when(safe, F.col("a") + 250 + F.col("a") % 3)
                    .alias("v")).collect()[0]
    assert row["v"] is None


def test_div_bucket_matches_trunc_semantics(spark):
    df = spark.createDataFrame(
        [(LONG_MAX,), (-1,), (-199,), (250,)], "n bigint")
    got = {r["n"]: r["b"] for r in
           df.select("n", F.expr("n DIV 100").alias("b")).collect()}
    assert got[LONG_MAX] == LONG_MAX // 100      # exact, no double detour
    assert got[-1] == 0 and got[-199] == -1      # trunc toward zero
    assert got[250] == 2
    assert not math.isnan(got[250])
