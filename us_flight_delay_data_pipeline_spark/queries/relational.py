"""Relational + flight-parity queries over the driver testdata.

Each query re-expresses an operator row from SURVEY.md §2 on the
TPC-H-ish tables (the reference's own domain tables don't exist in the
harness; the *operator shapes* — KPI ratios with zero-guards,
multi-grain aggregation, trend ordering, top-k — are preserved
exactly, with reference citations per query).

Scale notes are inline: every aggregate is a single partial+final
hash-agg; dimension joins are explicitly broadcast; top-k uses
orderBy+limit so Spark plans TakeOrderedAndProject (no global sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.core import safe_div
from ..sources.registry import load_table
from . import register

DEC = "decimal(38,6)"


def dsum(c: Column | str) -> Column:
    """Order-independent exact sum of a double column (see package
    docstring for why) → double."""
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(col.cast(DEC)).cast("double")


def _osum(expr: str) -> str:
    """Oracle-side mirror of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"


def dsum_exact(c: Column | str) -> Column:
    """Order-independent exact sum -> DECIMAL(38,6), NO final double
    cast.  The mergeable_partial_aggs driver history (red r05+r06)
    showed that even the terminal ``CAST(decimal AS DOUBLE)`` is
    engine-dependent at one-ulp boundaries: DuckDB's decimal->double
    goes through a hugeint-division path whose rounding differs
    across builds from Java BigDecimal.doubleValue.  Pure-sum output
    columns therefore stay decimal end-to-end — every op is integer
    arithmetic, bit-identical on any engine."""
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(col.cast(DEC)).cast(DEC)


def _osum_exact(expr: str) -> str:
    """Oracle-side mirror of :func:`dsum_exact`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DECIMAL(38,6))"


def micros(c: Column) -> Column:
    """Exact integer micro-units of a DECIMAL(38,6) column (BIGINT).
    decimal(38,6) * 1e6 is integral by construction, and the
    int64->double conversion downstream is a single correctly-rounded
    hardware op on every engine — so ``micros(x)/micros(y)`` in double
    is the bit-portable way to emit a ratio of two exact sums, unlike
    ``CAST(x AS DOUBLE)/CAST(y AS DOUBLE)`` whose per-operand
    decimal->double rounding is build-dependent.

    Beyond ratios, micro-unit BIGINT is also the gate-OUTPUT type for
    exact monetary sums: int64 is the one type every normalizer on
    either side of a differential gate (value-hash, pandas fetch,
    JSON) handles identically — a DECIMAL output column would be
    converted by whatever decimal->double path the consumer's build
    ships (DuckDB's pandas fetch included), re-opening the
    mergeable_partial_aggs class. Range contract: |value| must stay
    under ~9.2e12 currency units (int64 max / 1e6) — comfortably true
    for every registered rollup grain; a grain that could exceed it
    keeps DECIMAL internally and outputs at a coarser quantization."""
    return (c * F.lit(1000000)).cast("long")


def _omicros(expr: str) -> str:
    """Oracle-side mirror of :func:`micros` (expr must be decimal-typed)."""
    return f"CAST({expr} * 1000000 AS BIGINT)"


# ---------------------------------------------------------------------------
# Flight-parity shapes (SURVEY.md §2.4 A1-A6, §2.6 O1-O2, §2.8 F6-F9)
# ---------------------------------------------------------------------------

@register(
    "monthly_trend",
    f"""
    SELECT CAST(year(l_shipdate) AS INTEGER) AS year,
           CAST(month(l_shipdate) AS INTEGER) AS month,
           strftime(l_shipdate, '%Y-%m') AS year_month,
           {_osum('l_quantity')} AS total_qty,
           {_osum('l_extendedprice')} AS total_price,
           {_osum("CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0.0 END")} AS returned_qty,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY 1, 2, 3
    """,
    doc="v_monthly_trend analog (snowflake-wh/…:452-463): month grain, "
        "sums + trend ordering. Flagship query.",
)
def monthly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    agg = (
        li.groupBy(
            F.year("l_shipdate").alias("year"),
            F.month("l_shipdate").alias("month"),
            F.date_format("l_shipdate", "yyyy-MM").alias("year_month"),
        )
        .agg(
            dsum("l_quantity").alias("total_qty"),
            dsum(F.when(F.col("l_returnflag") == "R", F.col("l_quantity"))
                 .otherwise(F.lit(0.0))).alias("returned_qty"),
            dsum("l_extendedprice").alias("total_price"),
            F.count("*").alias("n_items"),
        )
        .select("year", "month", "year_month", "total_qty", "total_price",
                "returned_qty", "n_items")
    )
    return agg.orderBy("year", "month")


# delay_rate/avg_delay_per_flight analogs are ratios of the sums above;
# exposed as their own view-shaped query so the safe_div contract
# (0-not-NULL on zero denominator) is oracle-checked.
@register(
    "monthly_trend_rates",
    f"""
    WITH m AS (
      SELECT CAST(year(l_shipdate) AS INTEGER) AS year,
             CAST(month(l_shipdate) AS INTEGER) AS month,
             {_osum('l_quantity')} AS total_qty,
             {_osum("CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0.0 END")} AS returned_qty,
             {_osum('l_extendedprice')} AS total_price,
             COUNT(*) AS n_items
      FROM lineitem GROUP BY 1, 2
    )
    SELECT year, month, total_qty, returned_qty,
           CASE WHEN total_qty = 0 THEN 0 ELSE returned_qty / NULLIF(total_qty, 0) END AS return_rate,
           CASE WHEN n_items = 0 THEN 0 ELSE total_price / NULLIF(n_items, 0) END AS avg_price_per_item
    FROM m
    """,
    doc="KPI ratio block with the CASE-WHEN-0/NULLIF zero-guard "
        "(snowflake-wh/…:442-445; returns 0, not NULL).",
)
def monthly_trend_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    m = li.groupBy(
        F.year("l_shipdate").alias("year"),
        F.month("l_shipdate").alias("month"),
    ).agg(
        dsum("l_quantity").alias("total_qty"),
        dsum(F.when(F.col("l_returnflag") == "R", F.col("l_quantity"))
             .otherwise(F.lit(0.0))).alias("returned_qty"),
        dsum("l_extendedprice").alias("total_price"),
        F.count("*").alias("n_items"),
    )
    return m.select(
        "year", "month", "total_qty", "returned_qty",
        safe_div(F.col("returned_qty"), F.col("total_qty")).alias("return_rate"),
        safe_div(F.col("total_price"), F.col("n_items")).alias("avg_price_per_item"),
    )


@register(
    "overall_kpis",
    f"""
    SELECT CAST(max(year(l_shipdate)) AS INTEGER) AS latest_year,
           CAST(max(month(l_shipdate)) AS INTEGER) AS latest_month,
           {_osum('l_quantity')} AS total_qty,
           {_osum('l_extendedprice')} AS total_price,
           {_osum('l_discount')} AS total_discount,
           COUNT(*) AS n_items,
           CASE WHEN COUNT(*) = 0 THEN 0
                ELSE {_osum('l_discount')} / NULLIF(CAST(COUNT(*) AS DOUBLE), 0) END AS avg_discount
    FROM lineitem
    """,
    doc="v_overall_kpis analog (snowflake-wh/…:433-446): grand-total "
        "single-row agg, MAX latest period + SUMs + guarded ratios (A4).",
)
def overall_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.max(F.year("l_shipdate")).alias("latest_year"),
        F.max(F.month("l_shipdate")).alias("latest_month"),
        dsum("l_quantity").alias("total_qty"),
        dsum("l_extendedprice").alias("total_price"),
        dsum("l_discount").alias("total_discount"),
        F.count("*").alias("n_items"),
    ).withColumn(
        "avg_discount",
        safe_div(F.col("total_discount"), F.col("n_items").cast("double")),
    )


@register(
    "top_suppliers",
    f"""
    WITH t AS (
      SELECT s.s_name,
             {_osum('l_quantity')} AS total_qty,
             {_osum('l_extendedprice * (1 - l_discount)')} AS total_revenue,
             COUNT(*) AS n_items
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY s.s_name
    )
    SELECT * FROM t ORDER BY total_revenue DESC, s_name LIMIT 10
    """,
    doc="v_top_carriers analog (snowflake-wh/…:468-479, 617-620): "
        "re-aggregate + ORDER BY DESC LIMIT k (A5, O2). Supplier dim is "
        "broadcast — no shuffle of the fact side for the join.",
)
def top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    t = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(
            dsum("l_quantity").alias("total_qty"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .alias("total_revenue"),
            F.count("*").alias("n_items"),
        )
    )
    return t.orderBy(F.desc("total_revenue"), "s_name").limit(10)


@register(
    "flag_shares",
    f"""
    WITH g AS (
      SELECT l_returnflag, l_linestatus,
             {_osum('l_quantity')} AS sum_qty,
             {_osum('l_extendedprice')} AS sum_price,
             {_osum('l_discount')} AS sum_disc,
             {_osum('l_tax')} AS sum_tax
      FROM lineitem GROUP BY 1, 2
    )
    SELECT *,
      CASE WHEN sum_qty + sum_price + sum_disc + sum_tax = 0 THEN 0
           ELSE sum_qty / NULLIF(sum_qty + sum_price + sum_disc + sum_tax, 0) END AS qty_share,
      CASE WHEN sum_qty + sum_price + sum_disc + sum_tax = 0 THEN 0
           ELSE sum_price / NULLIF(sum_qty + sum_price + sum_disc + sum_tax, 0) END AS price_share
    FROM g
    """,
    doc="agg_causes/v_causes_pct analog (README.md:204-211; "
        "snowflake-wh/…:484-502): component sums + share-of-rowwise-total "
        "pcts with zero-guard (A3).",
)
def flag_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_price"),
        dsum("l_discount").alias("sum_disc"),
        dsum("l_tax").alias("sum_tax"),
    )
    total = (F.col("sum_qty") + F.col("sum_price") + F.col("sum_disc")
             + F.col("sum_tax"))
    return g.select(
        "*",
        safe_div(F.col("sum_qty"), total).alias("qty_share"),
        safe_div(F.col("sum_price"), total).alias("price_share"),
    )


@register(
    "master_derive",
    """
    SELECT l_orderkey, l_linenumber,
           strftime(l_shipdate, '%Y-%m') AS year_month,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS net_price,
           CASE WHEN l_extendedprice = 0 THEN 0
                ELSE (l_extendedprice * (1 - l_discount) * (1 + l_tax))
                     / NULLIF(l_extendedprice, 0) END AS net_ratio
    FROM lineitem
    """,
    doc="GOLD_MASTER analog (README.md:169-183; snowflake-wh/…:350-377): "
        "row-grain derived KPI columns — pure projection, no shuffle; "
        "stays entirely in whole-stage codegen.",
)
def master_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    net = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
           * (1 + F.col("l_tax")))
    return li.select(
        "l_orderkey", "l_linenumber",
        F.date_format("l_shipdate", "yyyy-MM").alias("year_month"),
        net.alias("net_price"),
        safe_div(net, F.col("l_extendedprice")).alias("net_ratio"),
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY.md §2.3 — the full Spark join surface)
# ---------------------------------------------------------------------------

@register(
    "segment_sales",
    f"""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           {_osum('o.o_totalprice')} AS total_sales,
           CASE WHEN COUNT(*) = 0 THEN 0
                ELSE {_osum('o.o_totalprice')} / NULLIF(CAST(COUNT(*) AS DOUBLE), 0) END AS avg_order_value
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="Equi inner join + agg: broadcast-hash (customer is the small "
        "side; at 100 TB a customer dim at ~10 GB would instead "
        "shuffled-hash — Catalyst/AQE decides from stats).",
)
def segment_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    return j.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("total_sales"),
    ).withColumn(
        "avg_order_value",
        safe_div(F.col("total_sales"), F.col("n_orders").cast("double")),
    )


@register(
    "region_revenue",
    f"""
    SELECT r.r_name, n.n_name,
           {_osum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
    doc="Multi-hop dimension chain (TPC-H Q5 shape): all three dims "
        "broadcast → the fact table is scanned once with zero shuffles "
        "before the final agg.",
)
def region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    j = (li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
           .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
           .join(F.broadcast(r), n.n_regionkey == r.r_regionkey))
    return j.groupBy("r_name", "n_name").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count("*").alias("n_items"),
    )


@register(
    "customer_order_stats",
    f"""
    SELECT c.c_mktsegment,
           COUNT(DISTINCT c.c_custkey) AS n_customers,
           COUNT(o.o_orderkey) AS n_orders,
           COUNT(DISTINCT CASE WHEN o.o_orderkey IS NULL THEN c.c_custkey END) AS customers_without_orders
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="Left outer join preserving unmatched rows + conditional "
        "distinct-count.",
)
def customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    j = c.join(o, o.o_custkey == c.c_custkey, "left")
    return j.groupBy("c_mktsegment").agg(
        F.countDistinct("c_custkey").alias("n_customers"),
        F.count("o_orderkey").alias("n_orders"),
        F.countDistinct(
            F.when(F.col("o_orderkey").isNull(), F.col("c_custkey"))
        ).alias("customers_without_orders"),
    )


@register(
    "customers_with_open_orders",
    """
    SELECT c.c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    GROUP BY c.c_mktsegment
    """,
    doc="Left-semi join (EXISTS decorrelation — Catalyst rewrites to "
        "LeftSemi hash join).",
)
def customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    j = c.join(o, c.c_custkey == o.o_custkey, "left_semi")
    return j.groupBy("c_mktsegment").agg(F.count("*").alias("n_customers"))


@register(
    "customers_without_orders",
    """
    SELECT c.c_custkey, c.c_name, c.c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Left-anti join (NOT EXISTS).",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
             .select("c_custkey", "c_name", "c_mktsegment"))


@register(
    "price_band_orders",
    f"""
    WITH bands(band, lo, hi) AS (VALUES
      ('small', 0.0, 50000.0), ('medium', 50000.0, 200000.0),
      ('large', 200000.0, 1000000.0))
    SELECT b.band, COUNT(*) AS n_orders, {_osum('o.o_totalprice')} AS total_price
    FROM orders o JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band
    """,
    doc="Theta/range join (SURVEY.md §2.3): tiny band table → "
        "BroadcastNestedLoopJoin, which is the right plan — at scale the "
        "band table is always broadcastable; never a cartesian shuffle.",
)
def price_band_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bands = o.sparkSession.createDataFrame(
        [("small", 0.0, 50000.0), ("medium", 50000.0, 200000.0),
         ("large", 200000.0, 1000000.0)],
        "band string, lo double, hi double",
    )
    j = o.join(F.broadcast(bands),
               (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi))
    return j.groupBy("band").agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
    )


@register(
    "asof_latest_order",
    """
    SELECT event_id, user_id, ts, o_orderkey AS last_orderkey,
           o_orderdate AS last_orderdate
    FROM (
      SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
             row_number() OVER (PARTITION BY e.event_id
                                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e JOIN orders o
        ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    ) WHERE rn = 1
    """,
    doc="As-of join [EXT] (SURVEY.md §2.3): each event matched to the "
        "latest order at-or-before its timestamp. No tolerance bound "
        "exists on this data (every order predates every event), so "
        "the scale path is the union+sort+carry-forward merge "
        "(operators/asof.py::asof_join_sorted): one shuffle on the "
        "user key, per-key cost linear in events+orders instead of "
        "the events x orders fan-out of the equi-join+filter "
        "formulation. Deterministic tie-break on (date, key).",
)
def asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join_sorted
    e = load_table(spark, sf_dir, "events") \
        .select("event_id", "user_id", "ts")
    o = load_table(spark, sf_dir, "orders") \
        .select(F.col("o_custkey").alias("user_id"),
                "o_orderkey", "o_orderdate")
    out = asof_join_sorted(e, o, on="user_id",
                           left_time="ts", right_time="o_orderdate",
                           value_cols=["o_orderkey", "o_orderdate"],
                           tiebreak="o_orderkey")
    return out.select("event_id", "user_id", "ts",
                      F.col("asof_o_orderkey").alias("last_orderkey"),
                      F.col("asof_o_orderdate").alias("last_orderdate"))


# ---------------------------------------------------------------------------
# Window functions (SURVEY.md §2.5)
# ---------------------------------------------------------------------------

@register(
    "top_parts_per_brand",
    """
    SELECT p_brand, p_partkey, p_retailprice, rn
    FROM (SELECT p_brand, p_partkey, p_retailprice,
                 row_number() OVER (PARTITION BY p_brand
                                    ORDER BY p_retailprice DESC, p_partkey) AS rn
          FROM part)
    WHERE rn <= 3
    """,
    doc="Ranking window: top-3 per group via row_number with "
        "deterministic tie-break. At scale this shuffles once on the "
        "partition key; no global sort.",
)
def top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("p_retailprice"), F.asc("p_partkey"))
    return (p.select("p_brand", "p_partkey", "p_retailprice",
                     F.row_number().over(w).alias("rn"))
             .filter(F.col("rn") <= 3))


@register(
    "customer_running_total",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_total
    FROM orders
    """,
    doc="Ordered running aggregate (cumulative frame). Decimal "
        "accumulation keeps the prefix sums engine-exact.",
)
def customer_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    o = load_table(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return o.select(
        "o_custkey", "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w)
         .cast("double").alias("running_total"),
    )


@register(
    "order_value_lag_delta",
    """
    SELECT o_custkey, o_orderkey, o_totalprice,
           o_totalprice - lag(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS delta_vs_prev
    FROM orders
    """,
    doc="lag/lead offset window.",
)
def order_value_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey", "o_orderkey", "o_totalprice",
        (F.col("o_totalprice") - F.lag("o_totalprice").over(w))
        .alias("delta_vs_prev"),
    )


# ---------------------------------------------------------------------------
# Set operations / distinct (SURVEY.md §2.7)
# ---------------------------------------------------------------------------

@register(
    "setop_union_distinct",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
    doc="UNION (distinct).",
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.union(b).distinct()


@register(
    "setop_intersect",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
    doc="INTERSECT.",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.intersect(b)


@register(
    "setop_except_all",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT ALL
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
    doc="EXCEPT ALL (multiset difference).",
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.exceptAll(b)


@register(
    "event_type_users",
    f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           {_osum('value')} AS total_value
    FROM events GROUP BY event_type
    """,
    doc="Distinct aggregation (expand-based two-phase distinct in "
        "Spark; exact, not approx).",
)
def event_type_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        dsum("value").alias("total_value"),
    )


# ---------------------------------------------------------------------------
# Multi-grain aggregation (SURVEY.md §2.4 note, §4 rewrite candidate)
# ---------------------------------------------------------------------------

@register(
    "multigrain_flags",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS grain_id,
           {_osum('l_quantity')} AS sum_qty, COUNT(*) AS n_items
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    doc="GROUPING SETS: the three gold grains (carrier/monthly/overall) "
        "in ONE shuffle instead of three — the multi-grain rewrite "
        "SURVEY.md §4 flags as the scale win.",
)
def multigrain_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_mg_lineitem")
    return spark.sql(f"""
        SELECT l_returnflag, l_linestatus,
               grouping_id() AS grain_id,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n_items
        FROM _mg_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """)


@register(
    "rollup_brand_size",
    f"""
    SELECT p_brand, p_size,
           CAST(grouping(p_brand, p_size) AS BIGINT) AS grain_id,
           COUNT(*) AS n_parts, {_osum('p_retailprice')} AS total_price
    FROM part GROUP BY ROLLUP (p_brand, p_size)
    """,
    doc="ROLLUP hierarchy grains.",
)
def rollup_brand_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.rollup("p_brand", "p_size").agg(
        F.grouping_id().alias("grain_id"),
        F.count("*").alias("n_parts"),
        dsum("p_retailprice").alias("total_price"),
    ).select("p_brand", "p_size", "grain_id", "n_parts", "total_price")


@register(
    "cube_flags",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS grain_id,
           COUNT(*) AS n_items
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE over two keys.",
)
def cube_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("grain_id"),
        F.count("*").alias("n_items"),
    ).select("l_returnflag", "l_linestatus", "grain_id", "n_items")


# ---------------------------------------------------------------------------
# Sorts / limits / top-k (SURVEY.md §2.6)
# ---------------------------------------------------------------------------

@register(
    "topk_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    doc="Top-k (O2): Spark plans TakeOrderedAndProject — per-partition "
        "heaps + driver merge, no global sort even at 100 TB.",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (o.select("o_orderkey", "o_custkey", "o_totalprice")
             .orderBy(F.desc("o_totalprice"), "o_orderkey").limit(20))


# ---------------------------------------------------------------------------
# JSON / casts / time windows (SURVEY.md §2.8 F2-F5, §2.10 T4)
# ---------------------------------------------------------------------------

@register(
    "events_json_props",
    f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                      IS NULL THEN 1 END) AS n_bad,
           CAST(SUM(COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0))
                AS BIGINT) AS sum_k
    FROM events GROUP BY event_type
    """,
    doc="Schema-on-read JSON parse + try-cast (F2/F4/F5): the silver "
        "pattern — permissive parse, malformed → NULL, never a job "
        "failure (ETL/…ipynb:1226,1234-1246).",
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("bigint")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count(F.when(k.isNull(), 1)).alias("n_bad"),
        F.sum(F.coalesce(k, F.lit(0))).alias("sum_k"),
    )


@register(
    "events_hourly",
    f"""
    SELECT date_trunc('hour', ts) AS hour_start, event_type,
           COUNT(*) AS n_events, {_osum('value')} AS total_value
    FROM events GROUP BY 1, 2
    """,
    doc="Tumbling time-window aggregation (T4 — the Capture 5-minute "
        "window as a Spark group-by; the streaming variant with "
        "watermark lives in streaming/, same logical shape).",
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        F.date_trunc("hour", "ts").alias("hour_start"),
        "event_type",
    ).agg(
        F.count("*").alias("n_events"),
        dsum("value").alias("total_value"),
    )


@register(
    "filtered_projection",
    """
    SELECT l_orderkey, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_returnflag = 'N' AND l_quantity > 25
    """,
    doc="Predicate + projection pushdown (P1-P4): filters and the "
        "3-column ReadSchema reach the parquet scan — verified in "
        "tests via the physical plan (PushedFilters).",
)
def filtered_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (li.filter((F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
                      & (F.col("l_returnflag") == "N")
                      & (F.col("l_quantity") > 25))
              .select("l_orderkey", "l_quantity", "l_extendedprice"))
