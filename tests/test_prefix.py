"""Distributed prefix-sum operator (operators/prefix.py) — unit pins
beyond the three query oracles that exercise it: equality with the
single-partition reference formulation, grand totals, and the
all-NULL-partition edge where a NULL per-partition sum must not
poison the broadcast offsets or the grand total."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_flight_delay_data_pipeline_spark.operators.prefix import (
    with_global_running,
)


def test_matches_single_partition_reference(spark):
    rows = [(i * 7919 % 97, (i * 31 % 13)) for i in range(500)]
    df = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(rows)], "k int, v int, id int")
    got = with_global_running(
        df, [F.asc("k"), F.asc("id")], rank="rnk",
        sum_col="v", cum_name="cum").collect()
    ordered = sorted(rows_with_id(rows), key=lambda r: (r[0], r[2]))
    expect_cum = {}
    run = 0
    for pos, (k, v, i) in enumerate(ordered, start=1):
        run += v
        expect_cum[i] = (pos, run)
    for r in got:
        pos, run = expect_cum[r.id]
        assert (r.rnk, r.cum) == (pos, run), r


def rows_with_id(rows):
    return [(k, v, i) for i, (k, v) in enumerate(rows)]


def test_totals_and_null_partition_sums(spark):
    # keys far apart force range partitions where one partition's
    # sum_col is entirely NULL
    data = [(1, None), (2, None), (1000, 5), (2000, 7), (3000, None)]
    df = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(data)],
        "k int, v int, id int").repartition(4)
    out = with_global_running(
        df, [F.asc("k"), F.asc("id")], rank="rnk",
        sum_col="v", cum_name="cum", totals=True)
    rows = {r.id: r for r in out.collect()}
    assert all(r._n_total == 5 for r in rows.values())
    assert all(r._sum_total == 12 for r in rows.values()), \
        "NULL per-partition sums must not poison the grand total"
    assert sorted(r.rnk for r in rows.values()) == [1, 2, 3, 4, 5]
    # running sum (SUM semantics: NULLs skipped) at each non-NULL row,
    # in k-order: id2 (+5) -> 5, id3 (+7) -> 12
    assert rows[2].cum == 5
    assert rows[3].cum == 12
