"""Bucketed co-located joins: writing both sides bucketed by the join
key lets the sort-merge join read pre-partitioned data — ZERO exchanges
in the join plan. This is the storage-layout lever for repeated big-big
joins at 100 TB (shuffle once at write time, never again at read time).
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.plans import physical_plan
from k_means_clustering_via_map_reduce_spark.sources import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # Managed tables land in the session's default warehouse dir; DROP
    # TABLE below removes their files again.
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable("b_orders")
    )
    (
        cust.write.mode("overwrite")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .saveAsTable("b_customer")
    )
    yield "b_orders", "b_customer"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    t_orders, t_cust = bucketed_tables
    # Disable broadcast so the join exercises the bucketed path the way
    # a big-big join would.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table(t_orders).join(
            spark.table(t_cust),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = physical_plan(j)
        assert re.search(r"SortMergeJoin", plan), plan
        assert not re.search(r"\(\d+\) Exchange\b", plan), (
            "bucketed join should not shuffle:\n" + plan
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_results_match_plain(spark, sf_dir, bucketed_tables):
    t_orders, t_cust = bucketed_tables
    bucketed = (
        spark.table(t_orders)
        .join(
            spark.table(t_cust), F.col("o_custkey") == F.col("c_custkey")
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    plain = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )
