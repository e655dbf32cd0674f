"""k-means invariants: inertia is monotonically non-increasing across
Lloyd iterations (the defining property), assignments are total and
deterministic, and training improves over the fixed-vector init."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from us_flight_delay_data_pipeline_spark.operators.kmeans import (
    assign_clusters, inertia, kmeans_fit)


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


@pytest.fixture(scope="module")
def init(corpus):
    return (corpus.filter(F.col("vec_id") < 8)
            .select(F.col("vec_id").alias("c_id"),
                    F.col("embedding").alias("cv")))


def test_inertia_monotone_and_improves(spark, corpus, init):
    cent, hist = kmeans_fit(corpus, init, max_iter=5)
    assert len(hist) >= 2
    for a, b in zip(hist, hist[1:]):
        assert b <= a + 1e-9
    assert hist[-1] < hist[0]  # training actually moved the centroids
    assert cent.count() == 8


def test_assignment_total_and_deterministic(spark, corpus, init):
    a1 = assign_clusters(corpus, init)
    a2 = assign_clusters(corpus, init)
    n = corpus.count()
    assert a1.count() == n                      # every vector assigned
    assert a1.select("vec_id").distinct().count() == n  # exactly once
    m1 = {r.vec_id: r.c_id for r in a1.select("vec_id", "c_id").collect()}
    m2 = {r.vec_id: r.c_id for r in a2.select("vec_id", "c_id").collect()}
    assert m1 == m2


def test_converged_fit_stops_early(spark, corpus, init):
    _, hist = kmeans_fit(corpus, init, max_iter=10, tol=0.01)
    assert len(hist) < 10  # the tolerance gate fires before max_iter
