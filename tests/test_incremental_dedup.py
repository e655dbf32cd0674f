"""Incremental dedup against a persisted MinHash index: a new batch
must match its near-duplicates in the corpus (without re-reading
corpus text) and novel documents must pass through clean."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from us_flight_delay_data_pipeline_spark.operators.dedup import (
    build_minhash_index, dedup_against_index)
from us_flight_delay_data_pipeline_spark.queries.llm_ext import MINHASH_COEFFS


@pytest.fixture(scope="module")
def index(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dedup") / "minhash_index")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    build_minhash_index(docs, path, MINHASH_COEFFS)
    return path, docs


def test_index_layout_partitioned_by_band(spark, index):
    path, _ = index
    bands = {d for d in os.listdir(path) if d.startswith("band=")}
    assert bands == {"band=0", "band=1", "band=2", "band=3"}


def test_near_dup_batch_matches_corpus(spark, index):
    path, docs = index
    # new batch: exact copies of three corpus docs (ids offset) plus
    # one novel word-soup document that matches nothing
    copies = (docs.filter(F.col("doc_id").isin(5, 17, 42))
                  .select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                          "text"))
    novel = spark.createDataFrame(
        [(2_000_000,
          "zzz qqq xxx vvv uuu www yyy kkk jjj hhh ggg fff eee ddd ccc")],
        "doc_id bigint, text string")
    batch = copies.unionByName(novel)
    matches = dedup_against_index(batch, path, MINHASH_COEFFS,
                                  threshold=0.3)
    rows = matches.collect()
    matched_new = {r.new_id for r in rows}
    # every copy matches at least its original, at jaccard 1.0
    for orig in (5, 17, 42):
        assert orig + 1_000_000 in matched_new
        assert any(r.new_id == orig + 1_000_000 and r.corpus_id == orig
                   and r.jaccard == 1.0 for r in rows)
    assert 2_000_000 not in matched_new
    # the novel-docs keep-list is the anti join
    keep = batch.join(matches.select("new_id").distinct(),
                      batch.doc_id == F.col("new_id"), "left_anti")
    assert {r.doc_id for r in keep.select("doc_id").collect()} == {2_000_000}
