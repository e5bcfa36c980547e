"""Bucketed co-located joins (zero-Exchange plan) and skew salting
(identical results, wider shuffle) — the 100 TB join strategies, proven on
the fixture tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_knowledge_etl_spark.operators import partitioning as P
from ai_knowledge_etl_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    # warehouse dir is a static conf, set in session.get_spark
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    P.write_bucketed(li, "li_b", "l_orderkey", 8)
    P.write_bucketed(o, "o_b", "l_orderkey", 8)
    yield
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    # at fixture scale the planner prefers broadcast (correct!); disable it
    # to expose the co-located sort-merge path that matters at 100 TB
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = P.bucketed_join(spark, "li_b", "o_b", "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed join should be co-located"
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    want = li.join(o, "l_orderkey").count()
    got = P.bucketed_join(spark, "li_b", "o_b", "l_orderkey").count()
    assert got == want


def test_salted_join_same_result(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    plain = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("l_quantity").alias("q"))
    )
    li2 = li.withColumnRenamed("l_suppkey", "k")
    s2 = s.withColumnRenamed("s_suppkey", "k")
    salted = (
        P.salted_join(li2, s2, "k", n_salts=4)
        .groupBy("s_name")
        .agg(F.sum("l_quantity").alias("q"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )

