"""Wave-7 operator properties beyond the oracle differential:
algebraic invariants that must hold for ANY input, pinned on the
testdata (the oracle pins exact values; these pin the contracts)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from us_flight_delay_data_pipeline_spark.queries import load_registry
from us_flight_delay_data_pipeline_spark.sources.registry import load_table

REGISTRY = load_registry()


def test_attribution_credit_partitions_10000_bp_per_user(spark, sf_dir):
    """The U-shaped credit rule must partition EXACTLY 10000 bp per
    converting user — the deterministic-integer-partition contract
    the query's remainder rule exists for."""
    ev = load_table(spark, sf_dir, "events")
    conv = (ev.filter(F.col("event_type") == "purchase")
              .groupBy("user_id").agg(F.max("ts").alias("conv_ts")))
    t = (ev.filter(F.col("event_type") != "purchase")
           .join(conv, "user_id")
           .filter(F.col("ts") <= F.col("conv_ts")))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wn = Window.partitionBy("user_id")
    n, pos = F.col("n"), F.col("pos")
    bp = (F.when(n == 1, 10000)
           .when(n == 2, 5000)
           .when((pos == 1) | (pos == n), 4000)
           .when(pos == 2, F.floor(2000 / (n - 2)) + (2000 % (n - 2)))
           .otherwise(F.floor(2000 / (n - 2))))
    per_user = (t.select("user_id",
                         F.row_number().over(w).alias("pos"),
                         F.count("*").over(wn).alias("n"))
                 .select("user_id", bp.cast("long").alias("bp"))
                 .groupBy("user_id").agg(F.sum("bp").alias("total")))
    assert per_user.count() > 0
    assert per_user.filter(F.col("total") != 10000).count() == 0


def test_equi_depth_bins_are_contiguous_and_complete(spark, sf_dir):
    """Bins must tile the value axis: ascending, non-overlapping,
    and their counts must sum to the table's row count."""
    rows = sorted(
        (tuple(r) for r in
         REGISTRY["equi_depth_binning"].fn(spark, sf_dir).collect()))
    total = load_table(spark, sf_dir, "orders").count()
    assert sum(r[1] for r in rows) == total
    for (b1, _, _, hi1), (b2, _, lo2, _) in zip(rows, rows[1:]):
        assert b1 < b2
        assert hi1 < lo2  # value-consistent: ranges never overlap


def test_zorder_tiles_bound_both_dimensions(spark, sf_dir):
    """The Morton-prefix layout guarantee: z >> 8 tiles are 16x16, so
    per-file spans are <= 15 in BOTH dims; the linear layout must
    show the asymmetry (tight leading dim, ~full-range second dim)."""
    rows = {r["layout"]: r for r in
            REGISTRY["zorder_layout_audit"].fn(spark, sf_dir).collect()}
    z = rows["zorder"]
    assert z["span_x_total"] <= 15 * z["n_files"]
    assert z["span_y_total"] <= 15 * z["n_files"]
    lin = rows["linear"]
    assert lin["span_x_total"] == 0  # bucket key IS the x value
    assert lin["span_y_total"] > z["span_y_total"]


def test_gdpr_cascade_conserves_rows(spark, sf_dir):
    row = REGISTRY["gdpr_delete_propagation"].fn(spark, sf_dir) \
        .collect()[0]
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert row["n_customers_deleted"] + row["n_customers_retained"] \
        == n_cust
    n_li = load_table(spark, sf_dir, "lineitem").count()
    assert 0 < row["n_lineitems_cascaded"] < n_li


def test_epoch_shuffle_epoch0_never_moves(spark, sf_dir):
    rows = REGISTRY["epoch_shuffle_plan"].fn(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    for r in rows:
        if r["epoch"] == 0:
            assert r["n_moved"] == 0
    per_epoch = {}
    for r in rows:
        per_epoch[r["epoch"]] = per_epoch.get(r["epoch"], 0) + r["n_docs"]
    assert all(v == n_docs for v in per_epoch.values())
    # epoch 1 must be a genuinely different permutation: expected
    # moved fraction is (S-1)/S = 7/8; assert a loose floor
    moved1 = sum(r["n_moved"] for r in rows if r["epoch"] == 1)
    assert moved1 > 0.5 * n_docs


def test_fuzzy_blocking_matches_naive_rowpair_formulation(spark, sf_dir):
    """The multiplicity-collapsed plan must count exactly what the
    naive row-pair formulation counts (the 220x-at-100x fix cannot
    change semantics) — verified on the base table."""
    s = load_table(spark, sf_dir, "supplier") \
        .select("s_suppkey", "s_name",
                F.substring(F.col("s_name"), -1, 1).alias("blk"))
    a = s.select(F.col("s_suppkey").alias("k1"),
                 F.col("s_name").alias("n1"), "blk")
    b = s.select(F.col("s_suppkey").alias("k2"),
                 F.col("s_name").alias("n2"),
                 F.col("blk").alias("blk2"))
    naive = {tuple(r) for r in
             (a.join(b, (a.blk == b.blk2) & (F.col("k1") < F.col("k2")))
               .select(F.levenshtein("n1", "n2").alias("distance"))
               .filter(F.col("distance") <= 2)
               .groupBy("distance")
               .agg(F.count("*").alias("n_pairs"))).collect()}
    fast = {tuple(r) for r in
            REGISTRY["fuzzy_name_blocking"].fn(spark, sf_dir).collect()}
    assert fast == naive
