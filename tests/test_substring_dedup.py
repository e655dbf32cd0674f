"""Hand-computed fixtures for substring_dedup — the sorted-ngram-run
formulation of suffix-array ExactSubstr dedup (L=8 token windows,
stride 1, global count >= 2, interval-union span merge). The oracle
differential covers it statistically; these pin the exact semantics
on planted duplicates."""

from __future__ import annotations

import pytest

from us_flight_delay_data_pipeline_spark.queries.llm_ext import (
    _SUBSTR_L, substring_dedup)


def _mk_docs(spark, tmp_path, texts):
    rows = [(i, t, "en", "fixture", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _toks(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_cross_doc_duplicate_span_any_alignment(spark, tmp_path):
    """An 8-token span shared by two docs at DIFFERENT offsets must be
    found (the chunk stand-in misses misaligned copies)."""
    shared = _toks("s", _SUBSTR_L)            # 8 shared tokens
    d0 = shared + " " + _toks("a", 4)         # span at pos 1
    d1 = _toks("b", 3) + " " + shared         # span at pos 4 (misaligned)
    d2 = _toks("c", 20)                       # no duplicates
    out = {r.doc_id: r for r in
           substring_dedup(spark, _mk_docs(spark, tmp_path,
                                           [d0, d1, d2])).collect()}
    assert set(out) == {0, 1}                 # d2 absent: nothing duplicated
    assert out[0].n_tokens == 12 and out[1].n_tokens == 11
    for doc, first in ((0, 1), (1, 4)):
        r = out[doc]
        assert r.n_dup_windows == 1           # exactly one L-window matches
        assert r.n_spans == 1
        assert r.n_dup_tokens == _SUBSTR_L    # covered tokens = the span
        assert r.max_span_tokens == _SUBSTR_L
        assert r.first_dup_pos == first
    assert out[0].dup_ratio == pytest.approx(8 / 12)


def test_within_doc_repeat_counts(spark, tmp_path):
    """Suffix-array semantics: a doc that repeats its own 8 tokens
    twice is fully duplicated even with no other doc involved
    (windows at pos 1 and 9 share a hash; the interval union of
    [1..8] and [9..16] covers all 16 tokens)."""
    eight = _toks("t", _SUBSTR_L)
    out = substring_dedup(
        spark, _mk_docs(spark, tmp_path,
                        [eight + " " + eight, _toks("z", 30)])).collect()
    assert len(out) == 1
    r = out[0]
    assert r.doc_id == 0
    assert r.n_dup_windows == 2               # pos 1 and pos 9
    assert r.n_spans == 1                     # 9 - 1 <= L → merged
    assert r.n_dup_tokens == 16 and r.n_tokens == 16
    assert r.dup_ratio == 1.0


def test_disjoint_spans_stay_separate(spark, tmp_path):
    """Two duplicated spans separated by > L unmarked positions must
    remain two islands with exact token coverage."""
    s1, s2 = _toks("p", _SUBSTR_L), _toks("q", _SUBSTR_L)
    gap = _toks("g", 20)                      # 20 unique tokens between
    d0 = " ".join([s1, gap, s2])
    d1 = " ".join([s2, _toks("h", 20), s1])   # both spans, other order
    out = {r.doc_id: r for r in
           substring_dedup(spark,
                           _mk_docs(spark, tmp_path, [d0, d1])).collect()}
    for r in out.values():
        assert r.n_spans == 2
        assert r.n_dup_tokens == 2 * _SUBSTR_L
        assert r.max_span_tokens == _SUBSTR_L


def test_longer_than_L_duplicate_fully_covered(spark, tmp_path):
    """A 12-token verbatim copy yields 5 overlapping marked windows
    (12 - 8 + 1) merging into ONE span of exactly 12 tokens — span
    granularity is token-exact, not chunk-quantized."""
    twelve = _toks("v", 12)
    d0 = twelve + " " + _toks("x", 6)
    d1 = _toks("y", 5) + " " + twelve
    out = {r.doc_id: r for r in
           substring_dedup(spark,
                           _mk_docs(spark, tmp_path, [d0, d1])).collect()}
    for r in out.values():
        assert r.n_dup_windows == 5
        assert r.n_spans == 1
        assert r.n_dup_tokens == 12
        assert r.max_span_tokens == 12
