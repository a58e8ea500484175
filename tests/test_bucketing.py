"""Bucketed-table co-located joins: no Exchange in the join plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from zacks_estimates_financial_statements_spark.operators import bucketing


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        bucketing.write_bucketed(
            orders.withColumnRenamed("o_orderkey", "k"), "orders_b", ["k"], 8)
        bucketing.write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "k"), "lineitem_b", ["k"], 8)
        a = bucketing.read_bucketed(spark, "orders_b")
        b = bucketing.read_bucketed(spark, "lineitem_b")
        joined = a.join(b, "k").groupBy("o_orderpriority") \
            .agg(F.count(F.lit(1)).alias("n"))
        joined.collect()
        # the join itself is co-located; only the final agg may exchange
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_part = plan.split("SortMergeJoin")[-1]
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_part  # nothing below the join shuffles
        # unbucketed control: the same join requires exchanges below it
        plain = (spark.read.parquet(f"{sf_dir}/orders.parquet")
                 .withColumnRenamed("o_orderkey", "k")
                 .join(spark.read.parquet(f"{sf_dir}/lineitem.parquet")
                       .withColumnRenamed("l_orderkey", "k"), "k"))
        plain.collect()
        pplan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in pplan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
