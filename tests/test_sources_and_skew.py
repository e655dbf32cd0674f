"""Producer replay (EP1) and skew-salting tests."""

from __future__ import annotations

import csv
import os

import pytest
from pyspark.sql import functions as F

from tests.flight_fixtures import make_clean_rows
from us_flight_delay_data_pipeline_spark.operators.skew import (
    replicate_for_salted_join, salted_groupby_agg)
from us_flight_delay_data_pipeline_spark.plans.silver import silver_transform
from us_flight_delay_data_pipeline_spark.sources.producers import (
    replay_csv_batched, replay_rows_interval)
from us_flight_delay_data_pipeline_spark.sources.registry import load_table


@pytest.fixture(scope="module")
def flight_csv(tmp_path_factory):
    path = tmp_path_factory.mktemp("csv") / "flights.csv"
    rows = make_clean_rows(50)
    with open(path, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    return str(path)


def test_replay_batched_roundtrip(spark, flight_csv, tmp_path):
    drop = str(tmp_path / "drop")
    n = replay_csv_batched(spark, flight_csv, drop, batch_size=20)
    assert n == 50
    # ≥ ceil(50/20) files landed (one per flush batch)
    files = [f for f in os.listdir(drop) if f.endswith(".parquet")]
    assert len(files) >= 3
    silver = silver_transform(spark.read.parquet(drop))
    assert silver.count() == 50
    assert dict(silver.dtypes)["arr_flights"] == "double"


def test_replay_interval_stamps_produced_at(spark, flight_csv, tmp_path):
    drop = str(tmp_path / "drop")
    counts = list(replay_rows_interval(spark, flight_csv, drop, max_rows=3))
    assert counts == [1, 2, 3]
    raw = spark.read.parquet(drop)
    assert raw.count() == 3
    body = raw.select(F.col("body").cast("string").alias("s")).collect()
    assert all('"produced_at":' in r["s"] for r in body)


def test_salted_agg_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = {r["l_returnflag"]: (r["s"], r["n"]) for r in
             li.groupBy("l_returnflag").agg(
                 F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("s"),
                 F.count("*").alias("n")).collect()}
    salted = salted_groupby_agg(
        li, ["l_returnflag"],
        aggs={"s": F.sum(F.col("l_quantity").cast("decimal(38,6)")),
              "n": F.count("*")},
        mergers={"s": F.sum, "n": F.sum})
    got = {r["l_returnflag"]: (r["s"], r["n"]) for r in salted.collect()}
    assert got == plain


def test_replicated_dim_join_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    plain = li.join(sup, li.l_suppkey == sup.s_suppkey).count()
    n_salts = 8
    fact = li.withColumn("_salt", (F.rand(seed=1) * n_salts).cast("int"))
    dim = replicate_for_salted_join(sup, n_salts)
    salted = fact.join(dim, (fact.l_suppkey == dim.s_suppkey)
                       & (fact._salt == dim._salt)).count()
    assert salted == plain


def test_orc_roundtrip_matches_parquet(spark, sf_dir, tmp_path):
    """ORC source/sink parity (SURVEY §2.1 source surface): writing a
    table as ORC and reading it back must preserve every row and the
    schema — the engine is format-agnostic for columnar at-rest data."""
    import os
    from pyspark.sql import functions as F
    p = spark.read.parquet(os.path.join(sf_dir, "part.parquet"))
    out = str(tmp_path / "part_orc")
    p.write.mode("overwrite").orc(out)
    o = spark.read.orc(out)
    assert o.schema == p.schema
    assert o.count() == p.count()
    a = p.agg(F.sum(F.col("p_retailprice").cast("decimal(38,6)"))
              .cast("double")).first()[0]
    b = o.agg(F.sum(F.col("p_retailprice").cast("decimal(38,6)"))
              .cast("double")).first()[0]
    assert a == b
