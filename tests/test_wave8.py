"""Wave-8 operator properties beyond the oracle differential:
brute-force models and algebraic invariants formulated DIFFERENTLY
from both the Spark query and its DuckDB oracle (the oracle pins
engine parity; these pin the semantics themselves)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from us_flight_delay_data_pipeline_spark.queries import load_registry
from us_flight_delay_data_pipeline_spark.sources.registry import load_table

REGISTRY = load_registry()

_IV_US = 30 * 60 * 1_000_000


def _pts(spark, sf_dir):
    from us_flight_delay_data_pipeline_spark.functions.text import \
        word_tokens
    docs = load_table(spark, sf_dir, "documents")
    toks = word_tokens(F.lower(F.col("text")))
    return [(r[0], r[1]) for r in docs.select(
        F.size(toks).cast("bigint"),
        F.size(F.array_distinct(toks)).cast("bigint")).collect()]


def test_pareto_frontier_matches_bruteforce_dominance(spark, sf_dir):
    """The sweep-based frontier must equal the O(n²) dominance
    definition: a point survives iff no other point is >= on both
    axes and > on at least one."""
    pts = _pts(spark, sf_dir)
    uniq = set(pts)
    brute = {
        (x, y) for (x, y) in uniq
        if not any((a >= x and b >= y and (a > x or b > y))
                   for (a, b) in uniq)
    }
    got = {(r["n_tokens"], r["n_distinct"]) for r in
           REGISTRY["pareto_frontier_docs"].fn(spark, sf_dir).collect()}
    assert got == brute


def test_pareto_counts_match_point_multiplicity(spark, sf_dir):
    pts = _pts(spark, sf_dir)
    mult = defaultdict(int)
    for p in pts:
        mult[p] += 1
    for r in REGISTRY["pareto_frontier_docs"].fn(spark, sf_dir).collect():
        assert r["n_docs"] == mult[(r["n_tokens"], r["n_distinct"])]


def test_interval_union_matches_bruteforce_merge(spark, sf_dir):
    """covered_us / n_blocks must equal the classic sort-and-merge
    interval union computed in plain Python per user."""
    ev = load_table(spark, sf_dir, "events")
    rows = ev.select("user_id", F.unix_micros("ts").alias("s")).collect()
    per_user = defaultdict(list)
    for r in rows:
        per_user[r["user_id"]].append((r["s"], r["s"] + _IV_US))
    expect = {}
    for u, ivs in per_user.items():
        ivs.sort()
        blocks = []
        for s, e in ivs:
            if blocks and s <= blocks[-1][1]:
                blocks[-1][1] = max(blocks[-1][1], e)
            else:
                blocks.append([s, e])
        expect[u] = (len(blocks), sum(e - s for s, e in blocks))
    out = REGISTRY["interval_union_coverage"].fn(spark, sf_dir).collect()
    assert len(out) == len(expect)
    for r in out:
        nb, cov = expect[r["user_id"]]
        assert (r["n_blocks"], r["covered_us"]) == (nb, cov)


def test_scd2_intervals_tile_and_alternate(spark, sf_dir):
    """Per user: versions are 1..k, each valid_to equals the next
    valid_from (half-open tiling, no gaps), exactly one open current
    row, and consecutive versions always change type (the collapse
    contract)."""
    out = REGISTRY["scd2_history_intervals"].fn(spark, sf_dir).collect()
    per_user = defaultdict(list)
    for r in out:
        per_user[r["user_id"]].append(r)
    for u, rs in per_user.items():
        rs.sort(key=lambda r: r["version"])
        assert [r["version"] for r in rs] == list(range(1, len(rs) + 1))
        assert sum(r["is_current"] for r in rs) == 1
        assert rs[-1]["is_current"] and rs[-1]["valid_to"] is None
        for a, b in zip(rs, rs[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["event_type"] != b["event_type"]


def test_mad_outliers_match_bruteforce(spark, sf_dir):
    """Discrete median/MAD and the outlier count recomputed in plain
    Python (sort + index) must match the windowed formulation."""
    from decimal import Decimal
    ev = load_table(spark, sf_dir, "events")
    rows = ev.select("event_type", "event_id", "value").collect()
    groups = defaultdict(list)
    for r in rows:
        v_us = int(Decimal(repr(r["value"])).quantize(Decimal("0.000001"))
                   * 1_000_000)
        groups[r["event_type"]].append((v_us, r["event_id"]))
    out = {r["event_type"]: r for r in
           REGISTRY["group_mad_outliers"].fn(spark, sf_dir).collect()}
    assert set(out) == set(groups)
    for t, vs in groups.items():
        n = len(vs)
        med = sorted(vs)[(n + 1) // 2 - 1][0]
        ds = sorted((abs(v - med), eid) for v, eid in vs)
        mad = ds[(n + 1) // 2 - 1][0]
        n_out = sum(1 for d, _ in ds if d > 3 * mad)
        r = out[t]
        assert (r["n_events"], r["med_us"], r["mad_us"],
                r["n_outliers"]) == (n, med, mad, n_out)


def test_quota_sums_to_budget_and_respects_quota_rule(spark, sf_dir):
    """Hamilton apportionment contract: quotas sum EXACTLY to the
    budget, and each source's quota is floor or ceil of its exact
    proportional share (the 'quota rule')."""
    out = REGISTRY["largest_remainder_quota"].fn(spark, sf_dir).collect()
    total = sum(r["n_docs"] for r in out)
    assert sum(r["quota"] for r in out) == 1000
    for r in out:
        lo = (r["n_docs"] * 1000) // total
        assert r["quota"] in (lo, lo + 1)


def test_nucleus_covers_threshold_minimally(spark, sf_dir):
    """Kept prefix reaches >=90% of the source's mass, and the kept
    set is a prefix: dropping its smallest member would fall below
    the threshold unless everything was kept."""
    docs = load_table(spark, sf_dir, "documents") \
        .select("source", "doc_id", "n_chars").collect()
    per_src = defaultdict(list)
    for r in docs:
        per_src[r["source"]].append((-r["n_chars"], r["doc_id"],
                                     r["n_chars"]))
    out = REGISTRY["nucleus_topp_docs"].fn(spark, sf_dir).collect()
    for r in out:
        assert r["chars_kept"] * 10 >= r["chars_total"] * 9
        ranked = sorted(per_src[r["source"]])
        kept = ranked[: r["n_kept"]]
        assert sum(k[2] for k in kept) == r["chars_kept"]
        if r["n_kept"] < r["n_docs"]:
            assert (r["chars_kept"] - kept[-1][2]) * 10 \
                < r["chars_total"] * 9


def test_association_rule_measures_are_consistent(spark, sf_dir):
    """Rule measures recomputed from raw baskets in plain Python:
    n_ab, both confidences and lift (floor ppm) must match, and the
    support filter must be exactly the 1%-of-baskets rule."""
    li = load_table(spark, sf_dir, "lineitem") \
        .select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    bi = li.join(part, li.l_partkey == part.p_partkey) \
           .select("l_orderkey", "p_brand").distinct().collect()
    baskets = defaultdict(set)
    for r in bi:
        baskets[r["l_orderkey"]].add(r["p_brand"])
    nb = len(baskets)
    item = defaultdict(int)
    pair = defaultdict(int)
    for items in baskets.values():
        s = sorted(items)
        for i, a in enumerate(s):
            item[a] += 1
            for b in s[i + 1:]:
                pair[(a, b)] += 1
    expect = {}
    for (a, b), n_ab in pair.items():
        if n_ab * 100 >= nb:
            expect[(a, b)] = (
                n_ab,
                n_ab * 1_000_000 // item[a],
                n_ab * 1_000_000 // item[b],
                n_ab * nb * 1_000_000 // (item[a] * item[b]))
    out = REGISTRY["basket_association_rules"].fn(spark, sf_dir).collect()
    got = {(r["antecedent"], r["consequent"]):
           (r["n_ab"], r["conf_ab_ppm"], r["conf_ba_ppm"], r["lift_ppm"])
           for r in out}
    assert got == expect


def test_time_decay_matches_bruteforce(spark, sf_dir):
    """Decayed totals recomputed in plain Python (explicit 2**age
    integer floor-div per event)."""
    from decimal import Decimal
    ev = load_table(spark, sf_dir, "events")
    rows = ev.select("user_id", F.col("ts").cast("date").alias("d"),
                     "value").collect()
    per_user = defaultdict(list)
    for r in rows:
        v_us = int(Decimal(repr(r["value"])).scaleb(6))
        per_user[r["user_id"]].append((r["d"], v_us))
    out = {r["user_id"]: r for r in
           REGISTRY["time_decay_user_value"].fn(spark, sf_dir).collect()}
    assert set(out) == set(per_user)
    for u, evs in per_user.items():
        mx = max(d for d, _ in evs)
        dec = sum(v // (1 << min((mx - d).days, 62)) for d, v in evs)
        tot = sum(v for _, v in evs)
        r = out[u]
        assert (r["n_events"], r["decayed_us"], r["total_us"]) \
            == (len(evs), dec, tot)


def test_ring_constants_and_minimal_movement(spark, sf_dir):
    """Ring positions must equal the md5-prefix hash of 'node:<i>'
    (the reproducibility claim in the module), and the consistent
    ring must move strictly fewer rows than mod-N — with every moved
    row landing on the ADDED node (the defining property of
    consistent hashing)."""
    import hashlib
    from us_flight_delay_data_pipeline_spark.queries.curation_wave8 import (
        _RING_M, _RING_NODES, _ring_assign_spark)
    from us_flight_delay_data_pipeline_spark.operators.hashing import h32
    for i, p in enumerate(_RING_NODES):
        expect = int(hashlib.md5(f"node:{i}".encode()).hexdigest()[:15],
                     16) % _RING_M
        assert p == expect, i
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    hd = h32(F.concat(F.lit("d:"), F.col("doc_id").cast("string")))
    a = docs.select(_ring_assign_spark(hd, 16).alias("o"),
                    _ring_assign_spark(hd, 17).alias("n")).collect()
    moved = [(r["o"], r["n"]) for r in a if r["o"] != r["n"]]
    assert all(n == 16 for _, n in moved)
    out = {r["scheme"]: r for r in
           REGISTRY["consistent_hash_rebalance"].fn(spark, sf_dir)
           .collect()}
    assert out["ring"]["n_moved"] == len(moved)
    assert out["ring"]["n_moved"] < out["mod"]["n_moved"]


def test_source_overlap_matches_bruteforce(spark, sf_dir):
    """Pairwise shared-shingle counts and ppm Jaccard recomputed with
    plain-Python sets (explicit tokenize/shingle/df-cap)."""
    import hashlib
    import re
    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "source", "text").collect()
    doc_sh = {}
    for r in docs:
        toks = re.split(r"\s+", r["text"].strip().lower()) \
            if r["text"].strip() else []
        if len(toks) < 3:
            continue
        sh = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
        hs = {int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
              % 4294967296 for s in sh}
        doc_sh[r["doc_id"]] = (r["source"], hs)
    df = defaultdict(set)
    for d, (_, hs) in doc_sh.items():
        for h in hs:
            df[h].add(d)
    rare = {h for h, ds in df.items() if len(ds) <= 8}
    per_src = defaultdict(set)
    for _, (s, hs) in doc_sh.items():
        per_src[s] |= hs & rare
    expect = {}
    srcs = sorted(per_src)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            shared = len(per_src[a] & per_src[b])
            if shared:
                expect[(a, b)] = (
                    shared,
                    shared * 1_000_000
                    // (len(per_src[a]) + len(per_src[b]) - shared))
    out = REGISTRY["source_ngram_overlap_matrix"].fn(spark, sf_dir) \
        .collect()
    got = {(r["source_a"], r["source_b"]): (r["n_shared"],
                                            r["jaccard_ppm"])
           for r in out}
    assert got == expect


def test_systematic_pps_matches_anchor_enumeration(spark, sf_dir):
    """Per-source selection recomputed by explicitly enumerating the
    equally-spaced anchors and testing interval containment — a
    different formulation than both engines' floor-div trick."""
    docs = load_table(spark, sf_dir, "documents") \
        .select("source", "doc_id", "n_chars").collect()
    docs.sort(key=lambda r: r["doc_id"])
    tot = sum(r["n_chars"] for r in docs)
    stride = tot // 100
    u = stride // 2
    # anchors are the values a = u + j*stride, j >= 0, 0 < a <= tot
    anchors = {u + j * stride for j in range((tot - u) // stride + 1)}
    anchors = {a for a in anchors if 0 < a <= tot}
    expect = defaultdict(lambda: [0, 0, 0])
    cum = 0
    for r in docs:
        lo, cum = cum, cum + r["n_chars"]
        sel = any(lo < a <= cum for a in anchors
                  if lo < a <= lo + r["n_chars"])
        e = expect[r["source"]]
        e[0] += 1
        if sel:
            e[1] += 1
            e[2] += r["n_chars"]
    out = REGISTRY["systematic_pps_sample"].fn(spark, sf_dir).collect()
    assert len(out) == len(expect)
    for r in out:
        e = expect[r["source"]]
        assert (r["n_docs"], r["n_selected"], r["chars_selected"]) \
            == tuple(e)


def test_score_deciles_partition_the_corpus(spark, sf_dir):
    """Deciles 0..9 are equal-population (±1), their doc counts sum
    to the corpus, positives sum to the weak-label positive count,
    and each ppm rate is the exact floor ratio of its own row."""
    from us_flight_delay_data_pipeline_spark.functions.text import \
        quality_score
    docs = load_table(spark, sf_dir, "documents")
    n_total = docs.count()
    n_high = docs.where(quality_score(F.col("text")) >= 0.5).count()
    out = sorted(REGISTRY["score_decile_lift"].fn(spark, sf_dir).collect(),
                 key=lambda r: r["decile"])
    assert [r["decile"] for r in out] == list(range(10))
    assert sum(r["n_docs"] for r in out) == n_total
    assert sum(r["n_high"] for r in out) == n_high
    sizes = [r["n_docs"] for r in out]
    assert max(sizes) - min(sizes) <= 1
    for r in out:
        assert r["high_rate_ppm"] == r["n_high"] * 1_000_000 // r["n_docs"]


def test_effective_size_matches_bruteforce(spark, sf_dir):
    """Per-source 1/multiplicity weighting recomputed with plain
    Python dict counting over md5(text)."""
    import hashlib
    docs = load_table(spark, sf_dir, "documents") \
        .select("source", "text").collect()
    mult = defaultdict(int)
    for r in docs:
        mult[hashlib.md5(r["text"].encode()).hexdigest()] += 1
    expect = defaultdict(lambda: [0, 0, 0])
    for r in docs:
        m = mult[hashlib.md5(r["text"].encode()).hexdigest()]
        e = expect[r["source"]]
        e[0] += 1
        e[1] += (m == 1)
        e[2] += 1_000_000 // m
    out = REGISTRY["dedup_effective_size"].fn(spark, sf_dir).collect()
    assert len(out) == len(expect)
    for r in out:
        e = expect[r["source"]]
        assert (r["n_docs"], r["n_unique"], r["eff_docs_ppm"]) == tuple(e)


def test_clustering_coeff_matches_adjacency_bruteforce(spark, sf_dir):
    """Per-node triangle counts and ppm coefficients recomputed with
    plain-Python neighbor-set intersection over the same support>=2
    co-purchase edges."""
    li = load_table(spark, sf_dir, "lineitem") \
        .select("l_orderkey", "l_partkey").distinct().collect()
    baskets = defaultdict(set)
    for r in li:
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    pair = defaultdict(int)
    for items in baskets.values():
        s = sorted(items)
        for i, a in enumerate(s):
            for b in s[i + 1:]:
                pair[(a, b)] += 1
    adj = defaultdict(set)
    for (a, b), n in pair.items():
        if n >= 2:
            adj[a].add(b)
            adj[b].add(a)
    out = REGISTRY["copurchase_clustering_coeff"].fn(spark, sf_dir) \
        .collect()
    assert {r["node"] for r in out} == set(adj)
    for r in out:
        nbrs = adj[r["node"]]
        d = len(nbrs)
        t = sum(len(adj[u] & nbrs) for u in nbrs) // 2
        cp = (2 * t * 1_000_000) // (d * (d - 1)) if d >= 2 else 0
        assert (r["degree"], r["n_tri"], r["coeff_ppm"]) == (d, t, cp)


def test_pps_tiny_corpus_stride_clamps_to_one(spark, tmp_path):
    """ADVICE r8: when total corpus chars < the anchor count the
    stride floors to 0 — Spark's div-by-zero returns NULL (rows
    silently unselected) while DuckDB errors. The greatest(stride, 1)
    clamp makes the degenerate case well-defined: stride 1 puts an
    anchor on every character, so EVERY doc is selected."""
    rows = [(i, "t" * (i + 1), "en", f"s{i % 2}", i + 1) for i in range(6)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint")
    df.write.parquet(str(tmp_path / "documents.parquet"))
    out = REGISTRY["systematic_pps_sample"].fn(spark, str(tmp_path)) \
        .collect()
    # total chars = 21 < 100 anchors -> pre-fix stride would be 0
    assert sum(r["n_docs"] for r in out) == 6
    assert all(r["n_selected"] == r["n_docs"] for r in out)
    assert sum(r["chars_selected"] for r in out) == 21


def test_mad_outliers_ignore_null_values(spark, tmp_path):
    """ADVICE r8: NULL event values must be excluded from the median/
    MAD population in BOTH engines (Spark's histogram would group NULL
    as a key and order it first; DuckDB's row_number orders it last —
    a divergent median pick). Pin the Spark result to a brute-force
    model over the non-null population only."""
    import datetime
    ts = datetime.datetime(2024, 1, 1)
    vals = [1.0, 2.0, None, 3.0, 100.0, None, 4.0]
    rows = [(i, ts, i, "click", v, "{}") for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")
    df.write.parquet(str(tmp_path / "events.parquet"))
    out = REGISTRY["group_mad_outliers"].fn(spark, str(tmp_path)) \
        .collect()
    assert len(out) == 1
    r = out[0]
    vs = sorted(int(v * 1_000_000) for v in vals if v is not None)
    n = len(vs)
    med = vs[(n + 1) // 2 - 1]
    ds = sorted(abs(v - med) for v in vs)
    mad = ds[(n + 1) // 2 - 1]
    n_out = sum(1 for d in ds if d > 3 * mad)
    assert (r["n_events"], r["med_us"], r["mad_us"], r["n_outliers"]) \
        == (n, med, mad, n_out)
