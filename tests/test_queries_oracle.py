"""Oracle-differential tests (SURVEY.md §5 strategy 1): every
registered query runs on Spark and, where an oracle exists, on DuckDB
over the same parquet — row count, sorted columns, and order-
insensitive values must match. Runs at sf0.001 for speed; the driver
repeats this at sf0.01."""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest

_here = os.path.dirname(os.path.abspath(__file__))
_spec = importlib.util.spec_from_file_location(
    "check_oracle", os.path.join(_here, "..", "scripts", "check_oracle.py"))
check_oracle = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(check_oracle)

from us_flight_delay_data_pipeline_spark.queries import load_registry  # noqa: E402
from us_flight_delay_data_pipeline_spark.sources.registry import TABLES  # noqa: E402

REGISTRY = load_registry()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        # rows-only contract: must execute and return a stable schema
        assert isinstance(srows, list)
        return
    res = duck.execute(spec.oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    a = check_oracle.normalize(srows, scols)
    b = check_oracle.normalize(drows, dcols)
    assert check_oracle.rows_equal(a, b), f"value mismatch in {name}"


def test_approx_aggregates_within_tolerance(spark, sf_dir):
    """Sketch results must land within their advertised error of the
    exact answers (HLL++ rsd=2%; approx_percentile accuracy=1000)."""
    from pyspark.sql import functions as F
    from us_flight_delay_data_pipeline_spark.queries import load_registry
    from us_flight_delay_data_pipeline_spark.sources.registry import load_table
    reg = load_registry()
    got = {r["l_returnflag"]: r for r in
           reg["approx_distinct_and_quantiles"].fn(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    exact = {r["l_returnflag"]: r for r in
             li.groupBy("l_returnflag").agg(
                 F.countDistinct("l_orderkey").alias("n"),
                 F.percentile("l_quantity", 0.5).alias("p50")).collect()}
    for flag, e in exact.items():
        g = got[flag]
        assert abs(g["approx_orders"] - e["n"]) <= max(3, 0.06 * e["n"])
        assert abs(g["approx_median_qty"] - e["p50"]) <= 2.0


def test_hll_partition_merge_bounds(spark, sf_dir):
    """The unioned yearly sketch estimate must sit within HLL error of
    the exact distinct count, and below the sum of monthly exacts
    (distinct can only dedupe across months, never grow)."""
    from pyspark.sql import functions as F
    from us_flight_delay_data_pipeline_spark.sources.registry import load_table
    reg = load_registry()
    got = {r["year"]: r for r in
           reg["hll_partition_merge"].fn(spark, sf_dir).collect()}
    o = load_table(spark, sf_dir, "orders") \
        .withColumn("od", F.col("o_orderdate").cast("date"))
    exact = {r["year"]: r["n"] for r in
             o.groupBy(F.year("od").alias("year"))
              .agg(F.countDistinct("o_custkey").alias("n")).collect()}
    for year, e in exact.items():
        g = got[year]
        assert abs(g["approx_distinct_customers"] - e) <= max(3, 0.05 * e)
        assert g["approx_distinct_customers"] <= g["sum_monthly_exact"] * 1.05
