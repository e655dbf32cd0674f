"""Structural properties of the retrieval family (queries/retrieval.py)
beyond the auto-generated oracle differential: rank shape, fusion
consistency between the three queries, and plan posture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from us_flight_delay_data_pipeline_spark.queries import load_registry

REGISTRY = load_registry()


@pytest.fixture(scope="module")
def results(spark, sf_dir):
    bm25 = REGISTRY["bm25_topk"].fn(spark, sf_dir).collect()
    fused = REGISTRY["hybrid_rrf_topk"].fn(spark, sf_dir).collect()
    overlap = REGISTRY["retriever_overlap_at_k"].fn(spark, sf_dir).collect()
    return bm25, fused, overlap


def test_bm25_rank_shape(results):
    bm25, _, _ = results
    per_q: dict[int, list[int]] = {}
    for r in bm25:
        per_q.setdefault(r.q_id, []).append(r.rank)
        assert r.doc_id != r.q_id, "self-match must be excluded"
    assert set(per_q) == {0, 1, 2, 3, 4}
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), \
            f"ranks for q={q} must be dense 1..k with no ties"
        assert len(ranks) <= 10


def test_rrf_scores_are_consistent_with_ranks(results):
    _, fused, _ = results
    per_q: dict[int, list] = {}
    for r in fused:
        per_q.setdefault(r.q_id, []).append(r)
        # max possible RRF with two systems at rank 1 each
        assert 0.0 < r.rrf_score <= 2.0 / 61.0 + 1e-15
    for q, rows in per_q.items():
        rows.sort(key=lambda r: r.fused_rank)
        scores = [r.rrf_score for r in rows]
        assert scores == sorted(scores, reverse=True), \
            f"fused_rank must follow rrf_score desc for q={q}"
        assert [r.fused_rank for r in rows] == list(range(1, len(rows) + 1))


def test_overlap_is_bounded_and_matches_topk(results):
    bm25, _, overlap = results
    assert {r.q_id for r in overlap} == {0, 1, 2, 3, 4}
    for r in overlap:
        assert 0 <= r.n_overlap <= 10
        assert r.overlap_frac == r.n_overlap / 10.0


def test_bm25_broadcasts_small_sides(spark, sf_dir):
    """df + query-term joins must be broadcast (vocabulary-/query-
    sized); the only shuffle joins are on doc_id."""
    plan = REGISTRY["bm25_topk"].fn(spark, sf_dir) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rrf_score_formula(results):
    """Every fused score must be expressible as the sum of at most two
    1/(60+r) terms with 1 <= r <= 20 — i.e. the advertised RRF."""
    _, fused, _ = results
    singles = {0.0} | {1.0 / (60.0 + r) for r in range(1, 21)}
    valid = {a + b for a in singles for b in singles if a or b}
    for r in fused:
        assert r.rrf_score in valid, r
