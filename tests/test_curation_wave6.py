"""Semantic pins for curation wave 6 (queries/curation_wave6.py)
beyond the DuckDB differential: the winnowing local-containment
guarantee on planted shared runs, Bloom no-false-negatives, and the
overlap audit's internal consistency (estimate vs exact, set algebra
bounds)."""

from __future__ import annotations

from pyspark.sql import functions as F

from us_flight_delay_data_pipeline_spark.queries import load_registry
from us_flight_delay_data_pipeline_spark.queries.curation_wave6 import (
    _WIN_K, _WIN_W, _WP_MIN_J, bloom_decontamination, source_overlap_audit,
    winnow_candidate_pairs, winnowing_fingerprints)

SF001 = "/root/testdata/sf0.001"


def _mk_docs(spark, tmp_path, texts, sources=None):
    rows = [(i, t, "en", (sources[i] if sources else "fixture"), len(t))
            for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _toks(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def _winnow_sets(spark, sf_dir):
    """Selected fingerprint HASH SETS per doc (test-only reference:
    recompute selection in Python from the same h32 kgram hashes)."""
    from us_flight_delay_data_pipeline_spark.functions.text import word_ngrams
    from us_flight_delay_data_pipeline_spark.operators.hashing import h32
    from us_flight_delay_data_pipeline_spark.sources.registry import load_table
    d = load_table(spark, sf_dir, "documents")
    rows = d.select(
        "doc_id",
        F.transform(word_ngrams(F.col("text"), _WIN_K), h32).alias("hs"),
    ).collect()
    out = {}
    for r in rows:
        hs, sel = r.hs, set()
        for s in range(max(len(hs) - _WIN_W + 1, 1) if hs else 0):
            window = hs[s:s + _WIN_W]
            mn = min(window)
            # rightmost position achieving the min
            rel = max(i for i, x in enumerate(window) if x == mn)
            sel.add(s + rel)
        out[r.doc_id] = {hs[p] for p in sel}
    return out


def test_winnowing_local_containment_guarantee(spark, tmp_path):
    """Any shared token run of length >= w + k - 1 must contribute at
    least one identical selected fingerprint to both documents — the
    SIGMOD'03 guarantee the operator's docstring claims."""
    shared = _toks("s", _WIN_W + _WIN_K - 1)        # exactly w+k-1 tokens
    d0 = _toks("a", 7) + " " + shared + " " + _toks("b", 5)
    d1 = _toks("c", 3) + " " + shared + " " + _toks("d", 9)
    d2 = _toks("e", 15)                             # unrelated
    sf = _mk_docs(spark, tmp_path, [d0, d1, d2])
    sets = _winnow_sets(spark, sf)
    assert sets[0] & sets[1], "shared >=w+k-1 run must share a fingerprint"
    assert not (sets[0] & sets[2]) and not (sets[1] & sets[2])


def test_winnowing_query_matches_python_reference(spark, tmp_path):
    """The registered query's digest/counts must equal a from-scratch
    Python implementation of winnowing on the same hashes."""
    texts = [_toks("x", 2), "", _toks("y", 9),
             _toks("z", 3) + " " + _toks("z", 3)]
    sf = _mk_docs(spark, tmp_path, texts)
    got = {r.doc_id: r for r in winnowing_fingerprints(spark, sf).collect()}

    from us_flight_delay_data_pipeline_spark.functions.text import word_ngrams
    from us_flight_delay_data_pipeline_spark.operators.hashing import h32
    from us_flight_delay_data_pipeline_spark.sources.registry import load_table
    rows = (load_table(spark, sf, "documents")
            .select("doc_id",
                    F.transform(word_ngrams(F.col("text"), _WIN_K), h32)
                    .alias("hs")).collect())
    for r in rows:
        hs = r.hs
        sel = set()
        for s in range(max(len(hs) - _WIN_W + 1, 1) if hs else 0):
            window = hs[s:s + _WIN_W]
            mn = min(window)
            sel.add(s + max(i for i, x in enumerate(window) if x == mn))
        digest = 0
        for p in sorted(sel):
            digest = (digest * 31 + hs[p]) % 2147483647
        g = got[r.doc_id]
        assert g.n_kgrams == len(hs)
        assert g.n_selected == len(sel)
        assert g.winnow_digest == digest


def test_winnowing_density_bound(spark):
    """Winnowing selects at most one fingerprint per window position:
    n_selected <= n_windows = max(n - w + 1, 1), and every non-empty
    doc selects at least one."""
    out = winnowing_fingerprints(spark, SF001).collect()
    assert len(out) == 500
    for r in out:
        if r.n_kgrams == 0:
            assert r.n_selected == 0 and r.winnow_digest == 0
        else:
            assert 1 <= r.n_selected <= max(r.n_kgrams - _WIN_W + 1, 1)


def test_bloom_no_false_negatives_and_bounds(spark):
    """Bloom membership can never miss a true benchmark shingle:
    n_exact_hits <= n_bloom_hits, and the false-positive column is
    exactly their difference; counts are bounded by n_ngrams."""
    out = bloom_decontamination(spark, SF001).collect()
    assert out, "train side must be non-empty"
    for r in out:
        assert r.n_exact_hits <= r.n_bloom_hits <= r.n_ngrams
        assert r.n_false_pos == r.n_bloom_hits - r.n_exact_hits


def test_bloom_exact_side_matches_join(spark, tmp_path):
    """On a planted corpus with a known contaminated doc, the exact
    column flags precisely the copied 5-gram windows."""
    bench = _toks("q", 12)                     # benchmark doc (src0)
    clean = _toks("r", 20)
    dirty = _toks("p", 4) + " " + _toks("q", 6)  # copies q0..q5: 2 5-grams
    sf = _mk_docs(spark, tmp_path, [bench, clean, dirty],
                  sources=["src0", "src1", "src1"])
    out = {r.doc_id: r for r in bloom_decontamination(spark, sf).collect()}
    assert out[2].n_exact_hits == 2            # q0..q4, q1..q5
    assert out[1].n_exact_hits == 0
    assert 0 not in out                        # benchmark doc not in output


def test_winnow_pairs_catch_local_overlap_low_global_jaccard(spark, tmp_path):
    """The family's reason to exist: a shared paragraph inside two
    long, otherwise-disjoint docs must surface as a pair (global
    Jaccard of these docs is ~0.1 — whole-doc LSH at the usual
    threshold would never verify it; containment is ~0.3+)."""
    shared = _toks("s", 18)                    # 18-token shared paragraph
    d0 = _toks("a", 25) + " " + shared         # 41 3-grams, 16 shared ->
    d1 = shared + " " + _toks("b", 25)         # containment 16/41 = 0.39,
    d2 = _toks("c", 25)                        # global Jaccard 16/66 = 0.24
    sf = _mk_docs(spark, tmp_path, [d0, d1, d2])
    out = {(r.doc_a, r.doc_b): r
           for r in winnow_candidate_pairs(spark, sf).collect()}
    assert (0, 1) in out
    r = out[(0, 1)]
    assert r.n_shared_fps >= 1
    assert r.containment >= _WP_MIN_J
    assert all(2 not in pair for pair in out)  # unrelated doc pairs with no one


def test_winnow_pairs_verify_floor_and_symmetry(spark):
    """Registered-query invariants on real data: canonical pair order,
    verify floor respected, shared-fingerprint count positive."""
    out = winnow_candidate_pairs(spark, SF001).collect()
    for r in out:
        assert r.doc_a < r.doc_b
        assert r.n_shared_fps >= 1
        assert r.containment >= _WP_MIN_J


def test_source_overlap_consistency(spark):
    """Pairwise overlap algebra: 0 <= n_common <= min(n_a, n_b), the
    exact Jaccard recomputes from the counts, the estimate is k/16,
    and identical sources would give estimate 1 (spot-check diagonal
    via a self-join-free bound: est in [0, 1])."""
    out = source_overlap_audit(spark, SF001).collect()
    assert out
    srcs = set()
    for r in out:
        srcs.add(r.source_a)
        srcs.add(r.source_b)
        assert r.source_a < r.source_b
        assert 0 <= r.n_common <= min(r.n_a, r.n_b)
        denom = r.n_a + r.n_b - r.n_common
        assert r.exact_jaccard == r.n_common / denom
        assert r.sig_matches * 1.0 / 16 == r.est_jaccard
        assert 0.0 <= r.est_jaccard <= 1.0
    n = len(srcs)
    assert len(out) == n * (n - 1) // 2        # every unordered pair once


def test_bitext_pairs_are_mutual_best_with_margin_floor(spark):
    """Every mined pair must be the mutual best within the candidate
    set and clear the margin floor; src/dst must come from the pinned
    language pair (one alignment per src and per dst at most — mutual
    bests are a partial matching)."""
    from us_flight_delay_data_pipeline_spark.queries.curation_wave6 import (
        _BTX_MARGIN_PCT, bitext_margin_pairs)
    from us_flight_delay_data_pipeline_spark.sources.registry import load_table
    out = bitext_margin_pairs(spark, SF001).collect()
    assert out
    langs = {r.doc_id: r.lang for r in
             load_table(spark, SF001, "documents")
             .select("doc_id", "lang").collect()}
    srcs = [r.src for r in out]
    dsts = [r.dst for r in out]
    assert len(srcs) == len(set(srcs)) and len(dsts) == len(set(dsts))
    for r in out:
        assert langs[r.src] == "en" and langs[r.dst] == "de"
        assert r.margin * 100 >= _BTX_MARGIN_PCT - 1e-9
        assert 0.0 < r.cosine <= 1.0


def test_wave6_registered_with_oracles():
    reg = load_registry()
    for name in ("winnowing_fingerprints", "winnow_candidate_pairs",
                 "source_overlap_audit", "bloom_decontamination",
                 "bitext_margin_pairs", "tokenizer_fertility"):
        assert name in reg and reg[name].oracle is not None
