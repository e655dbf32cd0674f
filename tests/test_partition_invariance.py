"""Partition-count invariance: registered queries must return
IDENTICAL values when the shuffle width changes — the property that
makes results reproducible across cluster sizes (32 executors today,
400 after a scale-up) and that float-accumulation-order or
collect-order bugs silently break.

This is the registry-wide generalization of
test_pagerank.test_bit_exact_under_repartitioning: a risk-weighted
sample of queries (double aggregates, collected arrays, windows,
quantized iterative sums, hash sampling) runs under the session's 32
shuffle partitions and again under 7 (coprime, so every hash
distribution changes), comparing full canonicalized results.
Streaming-gated queries are excluded only for runtime; their
determinism is pinned by their own oracle rows.
"""

from __future__ import annotations

import math

import pytest

from us_flight_delay_data_pipeline_spark.queries import load_registry

REGISTRY = load_registry()

# risk-weighted sample: decimal-summed doubles, array collects,
# windows, iterative quantized sums, deterministic sampling, UDTF
RISKY = [
    "overall_kpis",            # decimal-exact double sums
    "monthly_trend_rates",     # ratio-of-sums per group
    "tfidf_top_terms",         # doc-frequency joins + top-k
    "customer_running_total",  # running window sums
    "collect_sorted_sets",     # collected-array ordering contract
    "minhash_lsh_pairs",       # band join + jaccard verify
    "pq_encode",               # argmin over float distances
    "label_centroids",         # dimension-exploded exact means
    "pack_sequences",          # distributed prefix sum boundaries
    "bigram_lm_scores",        # quantized rational sums
    "semantic_dedup",          # bucketed all-pairs + persist reuse
    "balanced_stratified_sample",  # hash sampling w/ derived rates
    "length_curriculum",       # order statistics via prefix sum
    "doc_chunks_udtf",         # Arrow UDTF row expansion
    "pagerank_trade_graph",    # iterative quantized contributions
]


def _canon(df):
    cols = sorted(df.columns)
    rows = df.select(*cols).collect()

    def cell(v):
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else v
        if isinstance(v, list):
            return tuple(v)
        return v

    return sorted([tuple(cell(r[c]) for c in cols) for r in rows],
                  key=repr)


@pytest.mark.parametrize("name", RISKY)
def test_result_invariant_to_shuffle_width(spark, sf_dir, name):
    spec = REGISTRY[name]
    base = _canon(spec.fn(spark, sf_dir))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        narrow = _canon(spec.fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == narrow, (
        f"{name}: result depends on shuffle partition count "
        f"({len(base)} vs {len(narrow)} rows)")


PLANNER_SAMPLE = [
    "region_revenue",          # broadcast dimension chain -> SMJ
    "monthly_trend_rates",     # AQE coalesce + partial aggs
    "minhash_lsh_pairs",       # AQE skew handling on band joins
    "top_suppliers",           # broadcast + re-agg top-k
    "point_in_time_join",      # hash join + validity windows
    "semantic_dedup",          # explicit repartitions AQE must respect
    "pagerank_trade_graph",    # iterative joins w/ explicit broadcasts
]


@pytest.mark.parametrize("name", PLANNER_SAMPLE)
def test_result_invariant_to_planner_config(spark, sf_dir, name):
    """AQE disabled AND auto-broadcast disabled must not change any
    value: queries may RELY on hints they set explicitly (those
    survive both switches) but never on the optimizer's runtime
    choices. A mismatch means a result depends on join strategy or
    runtime coalescing — a latent wrong-answer bug on any cluster
    whose thresholds differ."""
    spec = REGISTRY[name]
    base = _canon(spec.fn(spark, sf_dir))
    saved = {
        "spark.sql.adaptive.enabled":
            spark.conf.get("spark.sql.adaptive.enabled"),
        "spark.sql.autoBroadcastJoinThreshold":
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        stripped = _canon(spec.fn(spark, sf_dir))
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    assert base == stripped, f"{name}: result depends on planner config"


CODEGEN_SAMPLE = [
    "overall_kpis",            # decimal-exact double sums
    "substring_dedup",         # md5 grams + islands windows
    "dsir_importance",         # int64 div quantization
    "pack_sequences",          # distributed prefix sum
    "bitwise_funcs",           # shift/and/or Morton interleave
    "repetition_stats",        # union-of-explodes + conditional aggs
]


@pytest.mark.parametrize("name", CODEGEN_SAMPLE)
def test_result_invariant_to_codegen_mode(spark, sf_dir, name):
    """Whole-stage codegen OFF (interpreted expression evaluation)
    must not change any value: generated-code vs interpreter
    divergence is a real Spark bug class (overflow handling, null
    short-circuits), and a query whose answer depends on the codegen
    path would silently drift across Spark upgrades or fallbacks
    (codegen bails out beyond 64KB methods / 100 fields)."""
    spec = REGISTRY[name]
    base = _canon(spec.fn(spark, sf_dir))
    saved = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try:
        interp = _canon(spec.fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.codegen.wholeStage", saved)
    assert base == interp, f"{name}: result depends on codegen mode"


ANSI_SAMPLE = [
    "overall_kpis",              # decimal sums + safe-divide guards
    "master_derive",             # row-grain casts and derived ratios
    "envelope_silver_roundtrip", # permissive parse + cast + null-drop
    "substring_dedup",           # md5 grams + integer islands
    "dsir_importance",           # int64 div quantization
    "pack_sequences",            # prefix-sum boundaries
]


@pytest.mark.parametrize("name", ANSI_SAMPLE)
def test_result_invariant_to_ansi_mode(spark, sf_dir, name):
    """Flipping spark.sql.ansi.enabled must not change any value:
    ANSI mode turns silent cast/overflow nulls into errors and is a
    per-deployment setting, so a query whose ANSWER depends on it
    contains a hidden invalid cast or overflow. Every expression in
    the registry is written to be valid under BOTH regimes (try_cast
    where the data may be dirty, DECIMAL(38) headroom on sums)."""
    spec = REGISTRY[name]
    base = _canon(spec.fn(spark, sf_dir))
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled",
                   "false" if old == "true" else "true")
    try:
        flipped = _canon(spec.fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)
    assert base == flipped, f"{name}: result depends on ANSI mode"
