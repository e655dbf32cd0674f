"""Bucketed co-located join: the orders⋈lineitem shuffle disappears
when both sides are bucketed on the join key — the plan must contain
zero Exchange operators, and results must equal the plain join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from us_flight_delay_data_pipeline_spark.sources.bucketing import (
    bucketed_join_ready, write_bucketed)
from us_flight_delay_data_pipeline_spark.sources.registry import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    write_bucketed(load_table(spark, sf_dir, "orders")
                   .select("o_orderkey", "o_custkey", "o_totalprice"),
                   "orders_b", "o_orderkey", n_buckets=8)
    write_bucketed(load_table(spark, sf_dir, "lineitem")
                   .select("l_orderkey", "l_quantity", "l_extendedprice"),
                   "lineitem_b", "l_orderkey", n_buckets=8)
    yield "orders_b", "lineitem_b"
    for t in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    j = bucketed_join_ready(spark, left, right, "o_orderkey", "l_orderkey",
                            merge=True)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    got = (bucketed_join_ready(spark, left, right,
                               "o_orderkey", "l_orderkey")
           .agg(F.count("*"),
                F.sum(F.col("l_quantity").cast("decimal(38,6)")))
           .collect()[0])
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    want = (li.join(o, li.l_orderkey == o.o_orderkey)
              .agg(F.count("*"),
                   F.sum(F.col("l_quantity").cast("decimal(38,6)")))
              .collect()[0])
    assert tuple(got) == tuple(want)
