"""PageRank operator invariants: mass conservation (up to dangling
leak — none in an undirected graph), teleport floor, and bit-exact
partitioning invariance (the floor-quantized decimal summation must
make ranks independent of physical layout)."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_flight_delay_data_pipeline_spark.operators.graph import pagerank


def _edges(spark, parts=None):
    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3), (6, 3)]
    both = pairs + [(b, a) for a, b in pairs]
    df = spark.createDataFrame(both, "src bigint, dst bigint")
    return df.repartition(parts) if parts else df


def test_ranks_form_a_distribution(spark):
    r = pagerank(_edges(spark), iterations=3)
    rows = r.collect()
    assert len(rows) == 6
    total = sum(x["rank"] for x in rows)
    # undirected -> no dangling leak; quantization floors at most
    # 1e-12 per edge contribution
    assert abs(total - 1.0) < 1e-9
    assert all(x["rank"] >= 0.15 / 6 - 1e-12 for x in rows)


def test_hub_outranks_leaf(spark):
    r = {x["node"]: x["rank"] for x in
         pagerank(_edges(spark), iterations=3).collect()}
    assert r[3] == max(r.values())  # degree-4 hub
    assert r[6] == min(r.values())  # degree-1 leaf


def test_bit_exact_under_repartitioning(spark):
    a = {(x["node"], x["rank"]) for x in
         pagerank(_edges(spark), iterations=4).collect()}
    b = {(x["node"], x["rank"]) for x in
         pagerank(_edges(spark, parts=13), iterations=4).collect()}
    assert a == b  # exact equality, not approx
