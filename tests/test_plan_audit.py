"""Physical-plan audits (the 100 TB posture, SURVEY.md §4): these
assert the *plan shapes* that make the engine scale — filter/column
pushdown into the parquet scan, broadcast joins for dimension chains,
TakeOrderedAndProject for top-k, partial+final hash aggregation, and
no shuffle on row-grain projections. A regression here is a
performance bug even if results stay correct."""

from __future__ import annotations

import pytest

from us_flight_delay_data_pipeline_spark.queries import load_registry

REGISTRY = load_registry()


def plan(df, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    m = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(m)


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    # Memoized per module: four registry-wide audits below each walk
    # all ~253 queries, and building a query's DataFrame is the
    # expensive part (iterative queries run their loops inside fn()).
    # One build per query serves every audit — 648 s -> ~200 s for the
    # file — and explainString reuses QueryExecution's memoized plan
    # on repeat calls against the same DataFrame.
    cache: dict = {}

    def run(name):
        if name not in cache:
            cache[name] = REGISTRY[name].fn(spark, sf_dir)
        return cache[name]
    return run


def test_filter_and_column_pushdown(q):
    p = plan(q("filtered_projection"))
    assert "PushedFilters:" in p
    # the equality and range predicates reach the scan
    assert "EqualTo(l_returnflag,N)" in p.replace(" ", "")
    # column pruning: the scan reads only the needed columns
    read_schema = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
    assert "l_comment" not in read_schema
    assert "l_partkey" not in read_schema
    assert "l_quantity" in read_schema


def test_dimension_chain_is_all_broadcast(q):
    p = plan(q("region_revenue"), "simple")
    assert p.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in p
    assert "ShuffledHashJoin" not in p


def test_topk_uses_take_ordered(q):
    p = plan(q("topk_orders"), "simple")
    assert "TakeOrderedAndProject" in p
    assert "Sort " not in p  # no global sort node


def test_agg_is_partial_then_final(q):
    p = plan(q("monthly_trend"), "simple")
    # map-side combine: two HashAggregate levels around one exchange
    assert p.count("HashAggregate") >= 2
    assert "partial" in plan(q("monthly_trend"), "formatted").lower()


def test_row_grain_projection_has_no_shuffle(q):
    p = plan(q("master_derive"), "simple")
    assert "Exchange" not in p


def test_semi_and_anti_join_plans(q):
    assert "LeftSemi" in plan(q("customers_with_open_orders"), "extended")
    assert "LeftAnti" in plan(q("customers_without_orders"), "extended")


def test_asof_join_is_hash_not_nested_loop(q):
    p = plan(q("asof_latest_order"), "simple")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    # union + sort + carry-forward merge: NO join at all — per-key
    # cost is linear in events+orders, never their product
    assert "Join" not in p
    assert "Union" in p and "Window" in p


def test_whole_stage_codegen_on_silver_shapes(q):
    # the flagship path must stay inside codegen (no BatchEvalPython);
    # AQE hides codegen stages in the static plan, so use codegen mode
    for name in ("monthly_trend", "master_derive", "flag_shares"):
        assert "BatchEvalPython" not in plan(q(name), "simple")
        assert "WholeStageCodegen" in plan(q(name), "codegen")


def test_sessionize_single_shuffle(q):
    """Both windows (lag, cumsum) and the (user, session) aggregate
    must reuse ONE hash partitioning on user_id — the group keys are a
    superset of the partition key, so no second exchange is legal."""
    p = plan(q("sessionize_events"), "simple")
    assert p.count("Exchange") == 1


def test_all_pairs_join_is_bucketed(q):
    """The quadratic embedding near-dup join must show the explicit
    bucketed repartition (exempt from AQE coalescing); the ngram
    Jaccard join must show the prefix-filter inverted-index shape
    (explode of the sorted prefix, equi-join, no quadratic
    degeneration). Neither may plan a nested-loop/cartesian join."""
    p = plan(q("embedding_neardup_pairs"), "simple")
    assert "_bkt" in p
    assert "REPARTITION_BY_NUM" in p
    pj = plan(q("ngram_jaccard_pairs"), "simple")
    assert "Generate explode" in pj  # prefix inverted index
    assert "sort_array" in pj        # canonical global order
    for s in (p, pj):
        assert "CartesianProduct" not in s
        assert "BroadcastNestedLoopJoin" not in s


def test_exists_decorrelates_to_semi_join(q):
    """Correlated EXISTS must decorrelate into a semi join with the
    inequality in the join condition — no per-row subquery."""
    p = plan(q("exists_correlated"), "simple")
    assert "LeftSemi" in p
    assert "Subquery" not in p


def test_distinct_agg_and_unpivot_use_expand(q):
    assert "Expand" in plan(q("distinct_counts"), "simple")
    assert "Expand" in plan(q("unpivot_order_measures"), "simple")


def test_media_fanout_is_arrow_batched(q):
    """Media decode plumbing: one MapInPandas (Arrow-batched, 1-to-N
    capable), with column pruning and filters still reaching the scan
    beneath it."""
    p = plan(q("media_frame_fanout"), "simple")
    assert "MapInPandas" in p
    assert "BatchEvalPython" not in p
    read_schema = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
    assert "lang" not in read_schema  # only doc_id + text are read


def test_no_python_udfs_in_any_query(q):
    """Every registered query must stay JVM-side — zero Python worker
    round-trips in the hot path (SURVEY.md §2.9 contract). The TWO
    exemptions are the sanctioned Python-surface demos whose plan
    nodes carry the generic Arrow-eval names (queries/udtf_surface.py:
    the UDTF, the scalar pandas UDF, and the Arrow-native scalar UDF)
    — each pinned positively below."""
    for name in REGISTRY:
        if name in ("doc_chunks_udtf", "token_count_pandas_udf",
                    "arrow_native_udf_digest"):
            continue
        p = plan(q(name), "simple")
        assert "BatchEvalPython" not in p, name
        assert "ArrowEvalPython" not in p, name


def test_group_topk_uses_window_group_limit(q):
    """rank<=k window filters must plan WindowGroupLimit (Spark's
    per-group partial top-k): each map task keeps only k rows per
    group BEFORE the shuffle, so a 100 TB ranked-filter never
    materializes full ranked groups."""
    for name in ("top_parts_per_brand", "ann_bruteforce_topk"):
        p = plan(q(name), "simple")
        assert "WindowGroupLimit" in p, name


def test_embedding_family_rebalances_the_tiny_scan(q):
    """The embeddings file is byte-tiny, so its scan plans 1-2
    partitions while the PQ/IVF math is CPU-bound per row — the
    family roots must spread it to cluster width (a round-robin
    exchange above the scan; measured 2.3x on pq_encode_trained).
    Regression here silently serializes the whole family."""
    for name in ("pq_encode", "ann_ivf_topk", "semantic_dedup"):
        p = plan(q(name), "formatted")
        assert "ROUNDROBIN" in p.upper(), name


def test_semdedup_pair_scan_is_bucket_parallel(q):
    """SemDeDup's in-cell quadratic scan must join on (cell, bucket),
    not cell alone — a bare c_id join caps parallelism at n_cells
    tasks with CPU-quadratic skew AQE cannot split."""
    p = plan(q("semantic_dedup"), "formatted")
    assert "_bkt" in p


def test_udtf_demo_is_arrow_batched(q):
    """The sanctioned UDTF query must plan the Arrow-optimized node —
    a row-pickling BatchEvalPythonUDTF fallback is a regression."""
    p = plan(q("doc_chunks_udtf"), "simple")
    assert "ArrowEvalPythonUDTF" in p
    assert "BatchEvalPythonUDTF" not in p


def test_scalar_pandas_udf_demo_is_arrow(q):
    """The sanctioned scalar pandas UDF must plan the vectorized
    Arrow evaluator, never the row-pickling one."""
    p = plan(q("token_count_pandas_udf"), "simple")
    assert "ArrowEvalPython" in p
    assert "BatchEvalPython" not in p


def test_arrow_native_scalar_udf_demo(q):
    """The Spark 4 arrow-optimized plain @udf must plan the Arrow
    evaluator — falling back to the legacy row-pickling evaluator
    (useArrow silently ignored) is exactly the regression this
    pins."""
    p = plan(q("arrow_native_udf_digest"), "simple")
    assert "ArrowEvalPython" in p
    assert "BatchEvalPython" not in p


def test_map_in_arrow_demo(q):
    """mapInArrow plans its own Arrow map node (no pandas
    materialization, no row pickling)."""
    p = plan(q("media_bytes_arrow"), "simple")
    assert "MapInArrow" in p
    assert "BatchEvalPython" not in p


def test_udaf_demo_aggregates_in_pandas(q):
    """The grouped-agg pandas UDAF must plan the Arrow aggregate node
    (ArrowAggregatePython in Spark 4.1; AggregateInPandas in earlier
    lines), never a row-pickling evaluator."""
    p = plan(q("median_value_udaf"), "simple")
    assert "ArrowAggregatePython" in p or "AggregateInPandas" in p
    assert "BatchEvalPython" not in p


def test_q2_shape_broadcasts_all_dimensions(q):
    """min_cost_part_supplier: part/supplier/nation all broadcast;
    the only shuffle is the windowed argmin on partkey."""
    p = plan(q("min_cost_part_supplier"), "simple")
    assert p.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_q18_survivor_set_broadcasts(q):
    """large_orders: the HAVING-gated aggregate output broadcasts into
    the enrichment joins and top-k plans TakeOrderedAndProject."""
    p = plan(q("large_orders"), "simple")
    assert "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p


def test_share_of_total_scans_facts_once(q):
    """nation_revenue_share: the grand total must come from
    re-aggregating the persisted 25-row nation rollup (broadcast
    back), never a second scan of lineitem — both references to the
    rollup must read the cache (InMemoryTableScan), which is what
    collapses the two plan subtrees into one physical fact scan."""
    p = plan(q("nation_revenue_share"), "simple")
    assert p.count("InMemoryTableScan") == 2
    assert "BroadcastNestedLoopJoin" in p  # one-row total broadcast back


def test_promo_filter_reaches_part_scan(q):
    p = plan(q("brand_size_supplier_counts"))
    flat = p.replace(" ", "")
    assert "Not(EqualTo(p_brand,Brand#15))" in flat
    assert "In(p_size" in flat


def test_full_outer_join_on_preaggregated_grains(q):
    """monthly_revenue_reconciliation: the outer join input must be
    the month-grain aggregates (two HashAggregate subtrees feeding the
    join), never a fact-grain outer join."""
    p = plan(q("monthly_revenue_reconciliation"), "simple")
    assert "FullOuter" in p
    below = p[p.index("FullOuter"):]
    assert below.count("HashAggregate") >= 4  # partial+final per side


def test_range_frame_window_single_shuffle(q):
    p = plan(q("rolling_hour_user_value"), "simple")
    assert p.count("Exchange") == 1  # one shuffle on user_id
    assert "RangeFrame" in p


def test_salted_agg_two_phase(q):
    """salted_event_type_stats: two aggregation levels around the salt
    (per key+salt, then merge per key)."""
    p = plan(q("salted_event_type_stats"), "simple")
    assert "_salt" in p
    assert p.count("HashAggregate") >= 4  # partial+final x two phases


def test_wave4_returned_customers_plan(q):
    """returned_item_customers (Q10 shape): returnflag filter pushed
    to the lineitem scan, nation broadcast, top-k via per-partition
    heaps."""
    p = plan(q("returned_item_customers"))
    assert "EqualTo(l_returnflag,R)" in p.replace(" ", "")
    simple = plan(q("returned_item_customers"), "simple")
    assert "TakeOrderedAndProject" in simple
    assert "BroadcastHashJoin" in simple


def test_wave4_band_predicates_pushed(q):
    """discount_band_revenue (Q6 shape): all three range predicates
    reach the parquet scan."""
    flat = plan(q("discount_band_revenue")).replace(" ", "")
    assert "LessThan(l_quantity,24.0)" in flat
    assert "GreaterThanOrEqual(l_discount,0.02)" in flat
    assert "GreaterThanOrEqual(l_shipdate," in flat


def test_wave4_semi_join_chains(q):
    """heavy_shipper_suppliers (Q20) and sole_failing_suppliers (Q21):
    existence logic stays semi-join/aggregate — no correlated
    nested-loop anywhere."""
    for name in ("heavy_shipper_suppliers", "sole_failing_suppliers"):
        ext = plan(q(name), "extended")
        assert "LeftSemi" in ext
        simple = plan(q(name), "simple")
        assert "CartesianProduct" not in simple
        assert "BroadcastNestedLoopJoin" not in simple
    # Q20's LIKE prefix filter is pushed down as StringStartsWith
    assert "StringStartsWith(p_name,small)" in \
        plan(q("heavy_shipper_suppliers")).replace(" ", "")


def test_wave4_market_share_single_fact_scan(q):
    """nation_market_share (Q8 shape): the share folds into one
    conditional aggregate — lineitem scanned exactly once, dimensions
    broadcast."""
    p = plan(q("nation_market_share"), "simple")
    assert p.count("lineitem.parquet") == 1
    assert p.count("BroadcastHashJoin") >= 3


def test_wave4_histogram_double_aggregate(q):
    """customer_order_histogram (Q13 shape): left join feeding two
    aggregation grains (per-customer count, then histogram)."""
    p = plan(q("customer_order_histogram"), "simple")
    assert "LeftOuter" in plan(q("customer_order_histogram"), "extended")
    assert p.count("HashAggregate") >= 4


def test_runtime_bloom_filter_injection(spark, sf_dir):
    """Runtime bloom-filter join pruning (the cluster-scale runtime
    filter — BASELINE.md round-2 candidate): with broadcast disabled
    (forcing the shuffle join the rule targets) and the application-
    side threshold floored, Catalyst must inject a
    might_contain(bloom_filter_agg(build-side keys)) predicate into
    the fact-side scan filter, and the filtered plan must return the
    same rows as the broadcast plan it replaces."""
    import os
    from pyspark.sql import functions as F
    conf = spark.conf
    keys = ["spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter"
            ".applicationSideScanSizeThreshold"]
    old = {}
    for k in keys:
        try:
            old[k] = conf.get(k)
        except Exception:
            old[k] = None
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        conf.set("spark.sql.optimizer.runtime.bloomFilter"
                 ".creationSideThreshold", "100MB")
        conf.set("spark.sql.optimizer.runtime.bloomFilter"
                 ".applicationSideScanSizeThreshold", "0")
        li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        o = (spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
             .filter(F.col("o_orderstatus") == "P"))
        j = (li.join(o, li.l_orderkey == o.o_orderkey)
               .groupBy("o_orderstatus").count())
        p = plan(j)
        assert "might_contain" in p
        assert "bloom_filter_agg" in p
        forced = {(r["o_orderstatus"], r["count"]) for r in j.collect()}
    finally:
        for k, v in old.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    o = (spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
         .filter(F.col("o_orderstatus") == "P"))
    base = (li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
              .groupBy("o_orderstatus").count())
    assert forced == {(r["o_orderstatus"], r["count"]) for r in base.collect()}


def test_no_cartesian_product_in_any_query(q):
    """No registered query may degenerate to CartesianProduct — the
    O(n*m) shuffle-everything plan. Deliberate tiny-side cross joins
    (scalar thresholds, codebooks, query sets) must come through as
    BroadcastNestedLoopJoin / broadcast exchanges instead."""
    for name in REGISTRY:
        p = plan(q(name), "simple")
        assert "CartesianProduct" not in p, name


def test_join_strategy_hints_are_honored(spark, sf_dir):
    """Physical join strategy is controllable per join via hints —
    the manual override for when stats mislead Catalyst at scale:
    broadcast / merge (sort-merge) / shuffle_hash each produce their
    hinted operator on the same logical join."""
    import os
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    for hint, node in [("broadcast", "BroadcastHashJoin"),
                       ("merge", "SortMergeJoin"),
                       ("shuffle_hash", "ShuffledHashJoin")]:
        j = li.join(o.hint(hint), li.l_orderkey == o.o_orderkey)
        p = plan(j, "simple")
        assert node in p, (hint, p.splitlines()[:5])


def test_point_in_time_join_is_hash_join(q):
    """point_in_time_join: the validity predicate must ride on an
    equi hash join (key), never degrade to a range/nested-loop."""
    p = plan(q("point_in_time_join"), "simple")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_cdc_latest_state_single_key_shuffle(q):
    """cdc_latest_state: latest-op-wins is one ranking window on key
    — the changelog shuffles once on key, and Spark's rank-limit
    pushdown (WindowGroupLimit Partial) trims each map partition to
    its per-key top-1 BEFORE that shuffle."""
    p = plan(q("cdc_latest_state"), "simple")
    assert p.count("Exchange hashpartitioning(key") == 1
    assert "WindowGroupLimit" in p


def test_no_nonscalar_output_columns_in_any_query(q):
    """No registered query may emit array/map/struct output columns:
    the driver's correctness canonicalizer pandas-sorts result columns
    and cannot hash list cells (CORRECTNESS_r01: minhash_signatures
    ERR'd on array<bigint>). List-valued results must be serialized to
    delimited strings (functions.core.arr_str + DuckDB
    array_to_string) or exploded to rows before registration."""
    import pyspark.sql.types as T
    bad = []
    for name in REGISTRY:
        for f in q(name).schema.fields:
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
                bad.append((name, f.name, f.dataType.simpleString()))
    assert not bad, bad


def test_no_unpartitioned_window_in_any_query(q):
    """No registered query may run a Window over a single global
    partition (Spark's "No Partition Defined for Window" path): at
    10B rows that is one task processing the whole corpus spine.
    Global running sums must use the distributed two-pass prefix-sum
    shape (see pack_sequences). Plan-string format: `Window [exprs](,
    [partSpec])(, [orderSpec])` — empty specs are omitted, so one
    bracket group = unpartitioned+unordered, two groups whose last
    holds sort markers = unpartitioned+ordered; two groups without
    sort markers is a partitioned-unordered window (fine)."""
    bad = []
    for name in REGISTRY:
        p = plan(q(name), "simple")
        for ln in p.splitlines():
            s = ln.strip().lstrip(":+- ")
            if not s.startswith("Window "):
                continue
            groups = s.count("], [") + 1
            last = s.rsplit("], [", 1)[-1]
            if groups == 1 or (groups == 2 and "NULLS" in last):
                bad.append((name, s[:120]))
    assert not bad, bad


def test_salted_join_is_shuffled_on_salted_key(q):
    """salted_segment_revenue exists to pin the salted-JOIN pattern:
    the join must be a ShuffledHashJoin whose keys include the salt
    (spreading a hot key over n_salts reducers) — a broadcast join
    here would make the salt dead code and the demo a lie."""
    p = plan(q("salted_segment_revenue"), "simple")
    assert "ShuffledHashJoin" in p
    assert "BroadcastHashJoin" not in p
    join_line = [ln for ln in p.splitlines()
                 if "ShuffledHashJoin" in ln][0]
    assert "_salt" in join_line


def test_python_datasource_scan_node(q):
    """The custom Python DataSource query must actually scan through
    the connector (BatchScan sg_jsonl_envelope (Python)) — a silent
    fallback to a JVM file reader would unpin the whole surface."""
    p = plan(q("pyds_envelope_counts"), "simple")
    assert "sg_jsonl_envelope" in p
    assert "(Python)" in p


def test_gdpr_cascade_is_all_broadcast_semi(q):
    """gdpr_delete_propagation: every cascade is a broadcast
    left-semi — no fact table is ever shuffled for the join."""
    p = plan(q("gdpr_delete_propagation"), "simple")
    assert p.count("BroadcastHashJoin") >= 4
    assert "LeftSemi" in p
    assert "SortMergeJoin" not in p


def test_fuzzy_blocking_is_equi_join_not_cartesian(q):
    """fuzzy_name_blocking: the block key must drive a hash join —
    Levenshtein runs only inside blocks, never all-pairs."""
    p = plan(q("fuzzy_name_blocking"), "simple")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_layout_audits_are_single_scan_aggregates(q):
    """zonemap/zorder audits: scan -> project -> hash agg, no joins
    (the audit must be metadata-cheap by design)."""
    for name in ("zonemap_pruning_audit", "zorder_layout_audit"):
        p = plan(q(name), "simple")
        assert "Join" not in p, name
        assert "HashAggregate" in p, name


def test_epoch_shuffle_is_map_side_expression(q):
    """epoch_shuffle_plan: hash assignment is a pure projection —
    the ONLY shuffle is the 16-row final aggregate (partial+final
    hash agg over one explode; no join, no window, no sort)."""
    p = plan(q("epoch_shuffle_plan"), "simple")
    assert "Join" not in p and "Window" not in p
    assert "Generate explode" in p
    assert p.count("Exchange") == 1, p


def test_equi_depth_window_runs_on_distinct_values(q):
    """equi_depth_binning: the cumulative window must sit ABOVE the
    distinct-value aggregate (window input is |distinct| rows, not
    the fact table)."""
    p = plan(q("equi_depth_binning"), "formatted")
    assert "Window" in p
    # fact-table aggregation happens before any window: the first
    # HashAggregate appears earlier in the plan tree dump than the
    # Window operator's input ordering requires — pin by checking
    # the window's child chain includes the v-grouping aggregate
    assert p.index("HashAggregate") < p.index("Window") or \
        "HashAggregate" in p.split("Window", 1)[1]
