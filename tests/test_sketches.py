from __future__ import annotations

from pyspark.sql import functions as F

from zacks_estimates_financial_statements_spark.operators import sketches


def test_cm_never_undercounts_and_is_exact_when_wide(spark):
    # skewed stream: key 'hot' x200, 50 keys x2, 100 singletons
    rows = [("hot",)] * 200
    rows += [(f"mid{i}",) for i in range(50) for _ in range(2)]
    rows += [(f"one{i}",) for i in range(100)]
    df = spark.createDataFrame(rows, ["k"])
    true = {r.k: r.c for r in
            df.groupBy("k").agg(F.count("*").alias("c")).collect()}

    sketch = sketches.cm_build(df, "k", depth=4, width=4096)
    est = {r.k: r.est_count for r in
           sketches.cm_estimate(sketch, df.select("k").distinct(), "k",
                                depth=4, width=4096).collect()}
    # one-sided error: estimates never undercount
    assert all(est[k] >= c for k, c in true.items())
    # with w >> #keys, collisions are rare: the hot key is exact
    assert est["hot"] == 200
    # overcount bounded by N/w * small factor in practice
    assert all(est[k] - true[k] <= 3 for k in true)

    hh = {r.k for r in
          sketches.cm_heavy_hitters(df, "k", threshold=100,
                                    depth=4, width=4096).collect()}
    assert "hot" in hh
    assert not any(k.startswith("one") for k in hh)


def test_cm_sketch_size_bounded(spark):
    df = spark.createDataFrame([(i % 997,) for i in range(5000)], ["k"])
    sketch = sketches.cm_build(df, "k", depth=3, width=64)
    assert sketch.count() <= 3 * 64
    # total per row preserved: each depth row sums to N
    per_row = {r.row: r.s for r in
               sketch.groupBy("row").agg(F.sum("cnt").alias("s")).collect()}
    assert per_row == {0: 5000, 1: 5000, 2: 5000}


def test_cm_validation(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1,)], ["k"])
    with _pytest.raises(ValueError, match="depth/width"):
        sketches.cm_build(df, "k", depth=0)


def test_cm_estimate_unseen_key_is_zero(spark):
    df = spark.createDataFrame([("a",)] * 10, ["k"])
    sketch = sketches.cm_build(df, "k", depth=4, width=4096)
    keys = spark.createDataFrame([("a",), ("never-seen",)], ["k"])
    est = {r.k: r.est_count for r in
           sketches.cm_estimate(sketch, keys, "k",
                                depth=4, width=4096).collect()}
    # empty cells are zero counters and MUST drive the min down
    assert est == {"a": 10, "never-seen": 0}
