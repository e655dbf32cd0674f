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
