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


def test_rank_consistent_across_subtree_recomputation(spark):
    """Regression: every computation of a with_global_running result
    must see the SAME complete rank assignment. Each independent
    computation of a repartitionByRange builds a fresh RangePartitioner
    whose reservoir sampling is rdd.id-seeded, so before the operator
    pinned its ranged frame with persist(), a multi-partition input
    could draw DIFFERENT range boundaries per subtree computation —
    local row_numbers then counted against one partitioning while the
    broadcast offsets counted against another, leaving gaps and
    duplicates in the "global" ranks (caught live by
    sorted_neighborhood_pairs on a rebalanced 32-partition input;
    single-partition inputs sample exhaustively and never exposed it).

    sampleSizePerPartition=1 maximizes boundary variance between
    computations, making the pre-fix corruption near-certain; with the
    persist fix the sample runs once, so the knob is irrelevant."""
    conf = spark.conf
    key = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    old = conf.get(key)
    conf.set(key, "1")
    try:
        n = 4000
        # skewed string keys (duplicate-heavy prefixes) = realistic
        # text sort keys, the regime the live failure hit
        df = spark.createDataFrame(
            [(f"k{(i * 7919) % 97:03d}", i) for i in range(n)],
            "k string, id int").repartition(32)
        r = with_global_running(df, [F.asc("k"), F.asc("id")], rank="rnk")
        # action 1: adjacency self-join across two independent
        # references — any rank gap/duplicate loses adjacent pairs
        left = r.select(F.col("id").alias("id_a"),
                        F.col("rnk").alias("r_a"))
        right = r.select(F.col("id").alias("id_b"),
                         (F.col("rnk") - 1).alias("r_a"))
        assert left.join(right, "r_a").count() == n - 1, (
            "every rank r must find rank r+1 across independently "
            "computed references — boundary-sampling divergence")
        # action 2: a fresh computation must still be the complete
        # 1..n rank set (the live corruption showed missing ranks on
        # a later filter action)
        got = sorted(x.rnk for x in r.select("rnk").collect())
        assert got == list(range(1, n + 1)), "rank set has gaps/dups"
    finally:
        conf.set(key, old)


def test_running_min_matches_single_partition_reference(spark):
    """The min fold: global running minimum must match the local
    reference on a multi-partition, sign-mixed series (the CUSUM
    prefix-of-centered-series shape)."""
    vals = [((i * 7919) % 997) - 498 for i in range(500)]  # mixed signs
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id int, v long") \
        .repartition(8)
    out = with_global_running(
        df, [F.asc("id")], min_col="v", min_name="rmin").collect()
    expect = {}
    run = None
    for i, v in enumerate(vals):
        run = v if run is None else min(run, v)
        expect[i] = run
    for r in out:
        assert r.rmin == expect[r.id], (r.id, r.rmin, expect[r.id])


def test_running_min_with_sum_combined(spark):
    """min_col and sum_col together on the same order — the exact
    CUSUM composition — stay mutually consistent."""
    vals = [(i * 31 % 11) - 5 for i in range(100)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id int, v long") \
        .repartition(5)
    p = with_global_running(df, [F.asc("id")], sum_col="v",
                            cum_name="pt")
    s = with_global_running(p.select("id", "pt"), [F.asc("id")],
                            min_col="pt", min_name="rmin").collect()
    run = 0
    pref, rmin = {}, {}
    m = None
    for i, v in enumerate(vals):
        run += v
        m = run if m is None else min(m, run)
        pref[i], rmin[i] = run, m
    for r in s:
        assert (r.pt, r.rmin) == (pref[r.id], rmin[r.id]), r
