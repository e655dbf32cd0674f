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


def _final_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _zipf_fact(spark, n=400_000):
    """Carrier-style skew: ~90% of fact rows land on one mega-key."""
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit(0))
         .otherwise(F.col("id") % 1000).alias("k"),
        F.col("id").alias("v"),
        F.concat(F.lit("payload_"), F.col("id")).alias("pay"))


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join ACTIVATION proof (VERDICT r3 task #6): on a
    zipf-skewed fact⋈dim sort-merge join, the final adaptive plan
    must mark the join ``skew=true`` with a skewed AQEShuffleRead —
    i.e. the mega-key's shuffle partition was actually split at
    runtime, not just that the config is on. Thresholds are lowered
    to make the 12 MB test fact 'large'; at production sizes the
    defaults (256 MB / 5x median) fire the same rule."""
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact = _zipf_fact(spark)
        dim = spark.range(1000).select(
            F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id"))
                                     .alias("dv"))
        # downstream agg must NOT require the join's hash partitioning
        # (OptimizeSkewedJoin declines when splitting would force an
        # extra shuffle for a same-key groupBy right after the join)
        j = fact.join(dim, "k").select(
            F.sum(F.length("pay") + F.length("dv")).alias("s"))
        [row] = j.collect()
        assert row["s"] is not None
        plan = _final_plan(j)
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
        assert "skewed" in plan  # AQEShuffleRead ... skewed
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_join_spreads_serialized_hot_key(spark):
    """With AQE skew handling OFF (stats-blind engines, or the
    CPU-quadratic skew AQE cannot see), the unsalted join hashes the
    mega-key into ONE shuffle partition — one task owns ~90% of the
    rows and runtime serializes no matter how many cores exist.
    Salting spreads the same rows across n_salts partitions. Pins
    (a) identical join results and (b) the PARTITION-LEVEL row
    distribution each strategy produces — the deterministic cause of
    the runtime win (a wall-clock assert flakes on a loaded box; the
    max-partition share is load-independent)."""
    confs = {
        "spark.sql.adaptive.enabled": "false",  # no runtime re-split
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        n_salts = 16
        fact = _zipf_fact(spark, n=200_000).persist()
        n_rows = fact.count()
        dim = spark.range(1000).select(
            F.col("id").alias("k"),
            F.concat(F.lit("d"), F.col("id")).alias("dv")).persist()
        dim.count()

        plain = fact.join(dim, "k").count()
        sfact = fact.withColumn(
            "_salt", (F.rand(seed=7) * n_salts).cast("int"))
        sdim = replicate_for_salted_join(dim, n_salts)
        salted = sfact.join(
            sdim, (sfact.k == sdim.k) & (sfact._salt == sdim._salt)
        ).count()
        assert salted == plain

        def max_partition_share(df, keys):
            parts = (df.repartition(32, *keys)
                       .groupBy(F.spark_partition_id().alias("p"))
                       .agg(F.count("*").alias("c")))
            return parts.agg(F.max("c")).first()[0] / n_rows

        # unsalted shuffle: the mega-key (~90% of rows) lands whole in
        # one partition -> one serialized task
        assert max_partition_share(fact, ["k"]) >= 0.85
        # salted shuffle: no partition holds more than ~2 salt shares
        # of the hot key (90%/16 ≈ 5.6% each, plus the cold tail)
        assert max_partition_share(sfact, ["k", "_salt"]) <= 0.25
        fact.unpersist(); dim.unpersist()
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
