"""Property pins for the fourth text-pipeline wave (queries/corpus_lm)
beyond the registry-wide differential: invariants the oracle equality
cannot express (bounds, balance, recall monotonicity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from us_flight_delay_data_pipeline_spark.queries import load_registry

REGISTRY = load_registry()


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return REGISTRY[name].fn(spark, sf_dir)
    return _run


def test_bigram_lm_probabilities_are_valid(run):
    """Mean conditional probability is a probability: in (0, 1], and
    score_q/n_bigrams stays within the quantization identity."""
    rows = run("bigram_lm_scores").collect()
    assert rows
    for r in rows:
        assert 0.0 < r.mean_cond_prob <= 1.0
        assert r.n_bigrams > 0
        # quantized rationals: each term <= 1e9, so the sum is bounded
        assert 0 < r.score_q <= r.n_bigrams * 1_000_000_000


def test_balanced_sample_equalizes_strata(run, spark, sf_dir):
    """Each stratum's sampled size concentrates near the smallest
    stratum's count m (binomial with mean m): within 5 sigma."""
    from us_flight_delay_data_pipeline_spark.sources.registry import load_table
    d = load_table(spark, sf_dir, "documents")
    counts = {r.lang: r.n for r in
              d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    m = min(counts.values())
    sampled = {r.lang: r.n for r in
               run("balanced_stratified_sample")
               .groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(sampled) <= set(counts)
    for lang, n in sampled.items():
        sigma = (m * max(0.0, 1 - m / counts[lang])) ** 0.5
        assert abs(n - m) <= 5 * sigma + 1, (lang, n, m)


def test_int8_quantization_error_bound(run):
    """Symmetric int8: every element's reconstruction error is at most
    scale/2, so err_q <= 64 * (scale/2)^2 * 1e12 (+1 ulp slack per
    element from the +0.5 rounding of the quantized sum)."""
    rows = run("int8_quantize_embeddings").collect()
    assert rows
    for r in rows[:200]:
        scale = r.scale_q / 1e9
        codes = [int(c) for c in r.codes.split(",")]
        assert len(codes) == 64
        assert all(-127 <= c <= 127 for c in codes)
        bound = 64 * (scale / 2) ** 2 * 1e12 + 64
        assert r.err_q <= bound, (r.vec_id, r.err_q, bound)


def test_lsh_recall_audit_bounds(run):
    """Recall is a valid ratio per decile, and banding theory's
    high-similarity guarantee holds where the sample supports it:
    at J >= 0.8 a 4x4 banding catches a pair w.p. >= 1-(1-0.8^4)^4
    ~= 0.89, so any decile >= 8 with n_true >= 5 must show recall
    >= 0.5 (P[binomial(5, .89) < 3] < 1e-2). Cross-decile
    monotonicity is NOT asserted — tiny deciles flip it legally."""
    rows = sorted(run("lsh_recall_audit").collect(),
                  key=lambda r: r.decile)
    assert rows
    for r in rows:
        assert 0.0 <= r.recall <= 1.0
        assert r.n_caught <= r.n_true
        if r.decile >= 8 and r.n_true >= 5:
            assert r.recall >= 0.5, r


def test_length_curriculum_buckets_partition_the_corpus(run, spark, sf_dir):
    """Buckets are exhaustive + disjoint (sizes sum to the corpus) and
    quartile-balanced: each holds between floor(N/4)-1 and the
    maximum a tied boundary value can absorb; bucket ranges do not
    overlap."""
    from us_flight_delay_data_pipeline_spark.sources.registry import load_table
    n_docs = load_table(spark, sf_dir, "documents").count()
    rows = sorted(run("length_curriculum").collect(),
                  key=lambda r: r.bucket)
    assert sum(r.n_docs for r in rows) == n_docs
    for a, b in zip(rows, rows[1:]):
        assert a.max_chars < b.min_chars  # disjoint, ordered ranges
    if len(rows) == 4:  # no degenerate tie collapsed a bucket
        for r in rows:
            assert r.n_docs >= n_docs // 4 - 1 or r.bucket == 3
