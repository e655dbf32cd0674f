"""Oracle-differential tests (SURVEY.md §5 strategy 1): every
registered query runs on Spark and, where an oracle exists, on DuckDB
over the same parquet — row count, sorted columns, and order-
insensitive values must match. Runs at sf0.001 for speed; the driver
repeats this at sf0.01.

Fast default profile (r10): the full 255-query block is ~15 min and
duplicates scripts/check_oracle.py (the canonical full differential,
run as a per-round closing gate) — the default pytest run keeps a
deterministic hash sample (~20 %) plus a pinned high-machinery set
(streaming gated, index probes, iterative graph/dedup) and marks the
rest `slow`. Full coverage: SPARK_GRAFT_ORACLE_TESTS=all and/or
`-m ""` (see pytest.ini)."""

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


# Always in the default sample: the operator families with the most
# internal machinery (streaming drains, on-disk index build+probe,
# iterative graph/dedup, the prefix/window primitives) — the places a
# regression is least likely to be caught by a unit test alone.
_PINNED = {
    "nn_descent_round", "knn_semantic_clusters", "knn_graph_mutual",
    "dedup_clusters", "dedup_clusters_star", "pretrain_funnel",
    "pagerank_trade_graph", "copurchase_kcore",
    "copurchase_lpa_communities",
    "bm25_index_probe", "bm25_index_compaction_probe",
    "jaccard_index_probe", "ann_ivf_index_probe",
    "user_value_trend", "monthly_trend", "interval_overlap_pairs",
    "negative_sampling_table", "pack_sequences",
    "ann_beam_search_topk", "bpe_encode_docs",
}


def _default_oracle_sample() -> set[str]:
    """Deterministic ~20 % hash sample + pinned set + every rows-only
    (oracle-less) query and every gated streaming query (cheap and
    high-risk). SPARK_GRAFT_ORACLE_TESTS=all keeps everything."""
    import hashlib
    names = set(REGISTRY)
    if os.environ.get("SPARK_GRAFT_ORACLE_TESTS", "sample") == "all":
        return names
    keep = {n for n in names
            if int(hashlib.md5(n.encode()).hexdigest(), 16) % 5 == 0}
    keep |= _PINNED & names
    keep |= {n for n in names if REGISTRY[n].oracle is None}
    keep |= {n for n in names if n.startswith("stream_")}
    return keep


_ORACLE_SAMPLE = _default_oracle_sample()


@pytest.mark.parametrize(
    "name",
    [n if n in _ORACLE_SAMPLE
     else pytest.param(n, marks=pytest.mark.slow)
     for n in sorted(REGISTRY)])
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
