"""Core scalar expressions for the medallion pipeline.

Each function mirrors a scalar-function row in SURVEY.md §2.8 and cites
the reference behavior it reproduces. All are native Column
expressions — they stay inside whole-stage codegen (the reference's one
Python UDF is deliberately replaced by native ops here, see
``decode_and_repair_body``).
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "safe_div", "year_month", "rowwise_total", "try_cast_columns",
    "decode_and_repair_body", "normalize_columns_lower", "rebalance",
    "arr_str",
]


def arr_str(col: Column | str, sep: str = ",") -> Column:
    """Serialize an array column to a deterministic delimited string.

    The driver's correctness canonicalizer pandas-sorts result columns
    and cannot hash list-valued cells, so registered queries never
    emit array/map/struct output columns — any list-valued result is
    flattened through this helper, matched by DuckDB
    ``array_to_string(..., sep)`` in the oracle SQL. Element order must
    already be deterministic (sorted or positional) before serializing.
    """
    col = F.col(col) if isinstance(col, str) else col
    return F.array_join(F.transform(col, lambda x: x.cast("string")), sep)


def rebalance(df: DataFrame) -> DataFrame:
    """Round-robin repartition to cluster parallelism before a
    CPU-heavy projection.

    Text/JSON-per-row pipelines are often compute-bound on inputs that
    are small in *bytes* — the file scan's byte-based splitting (and
    AQE's byte-based coalescing) then runs the whole projection in one
    or two tasks. One cheap shuffle of raw rows buys full-width
    compute. At 100 TB the scan is already wide, so this degrades to a
    proportionally tiny rebalance; an explicit numPartitions keeps AQE
    from re-coalescing it."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism)


def safe_div(num: Column, den: Column) -> Column:
    """Zero-guarded division: 0 when the denominator is 0 or NULL.

    Reproduces the reference KPI guard
    ``CASE WHEN SUM(f)=0 THEN 0 ELSE SUM(x)/NULLIF(SUM(f),0) END``
    (snowflake-wh/NB_AIRLINE_DELAY_GOLD (1).ipynb:442-445) — note the
    result is **0, not NULL**, for a zero denominator; oracle SQL must
    match exactly (SURVEY.md §7 risk register).
    """
    return F.when(den.isNull() | (den == 0), F.lit(0.0)).otherwise(num / den)


def year_month(year: Column, month: Column) -> Column:
    """``"YYYY-MM"`` string key, zero-padded.

    The GOLD_MONTHLY / GOLD_MASTER tables carry a ``year_month STRING``
    column (snowflake-wh/NB_AIRLINE_DELAY_GOLD (1).ipynb:224,368).
    """
    return F.format_string("%04d-%02d", year.cast("int"), month.cast("int"))


def rowwise_total(cols: Iterable[Column]) -> Column:
    """Null-safe row-wise sum (each NULL contributes 0).

    Reproduces ``cause_total = carrier_ct + weather_ct + nas_ct +
    security_ct + late_aircraft_ct`` (README.md:182) where the
    reference's Snowflake side effectively zero-fills via TRY_CAST
    guards.
    """
    total = F.lit(0.0)
    for c in cols:
        total = total + F.coalesce(c.cast("double"), F.lit(0.0))
    return total


def try_cast_columns(df: DataFrame, casts: Mapping[str, str]) -> DataFrame:
    """Apply string→numeric casts with null-on-failure semantics.

    The silver notebook casts 13 string columns to int/double
    (ETL/flight-silver-transformation (1).ipynb:1234-1246); Snowflake
    re-guards with TRY_CAST (snowflake-wh/…:510-537). With
    ``spark.sql.ansi.enabled=false`` a plain ``cast`` already has
    TRY_CAST semantics, but we use ``try_cast`` explicitly so the
    behavior survives ANSI-mode clusters.
    """
    return df.withColumns(
        {name: F.col(name).try_cast(dtype) for name, dtype in casts.items()}
    )


def decode_and_repair_body(body: Column) -> Column:
    """binary → UTF-8 string, truncated-JSON repair: keep the prefix
    through the **last** ``'}'``; NULL if no ``'}'`` at all.

    Replaces the reference's single Python UDF ``decode_and_trim_bytes``
    (ETL/flight-silver-transformation (1).ipynb:1194-1206) with native
    expressions so the silver path stays in whole-stage codegen — the
    UDF was the one place the reference broke vectorization
    (SURVEY.md §4 "vectorized execution").

    Semantics preserved exactly (SURVEY.md §7 risk register): a
    truncated flat JSON object with no closing brace yields an
    unparseable fragment → row dies downstream at the null-drop, same
    as the reference.
    """
    s = body.cast("string")
    # position of last '}' = length - locate('}', reverse) + 1; 0 if absent
    rev_pos = F.locate("}", F.reverse(s))
    last_brace = F.length(s) - rev_pos + 1
    # '}' present → keep prefix through it; absent → pass through
    # unchanged (the fragment then fails from_json → null-drop, exactly
    # the reference's failure path).
    return F.when(rev_pos > 0, s.substr(F.lit(1), last_brace)).otherwise(s)


def normalize_columns_lower(df: DataFrame) -> DataFrame:
    """Lower-case all column names (case-insensitive by-name matching).

    Mirrors the reference's defensive case-insensitive ``body`` column
    detection (ETL/…ipynb:1212-1216) and Snowflake's
    ``MATCH_BY_COLUMN_NAME=CASE_INSENSITIVE`` (snowflake-wh/…:192).
    """
    return df.toDF(*[c.lower() for c in df.columns])


def find_column_ci(df: DataFrame, name: str) -> str:
    """Case-insensitive column lookup; raises if absent (the reference
    raises RuntimeError when no ``body`` column exists,
    ETL/…ipynb:1212-1216)."""
    for c in df.columns:
        if c.lower() == name.lower():
            return c
    raise RuntimeError(f"column {name!r} not found (case-insensitive) in {df.columns}")


_SCRATCH_REGISTERED: set[str] = set()


def cleanup_at_exit(path: str) -> None:
    """Mark a session-scoped scratch directory for removal at
    interpreter exit, so repeated driver/bench sessions do not
    accumulate dirs in /tmp. Callers key scratch paths by Spark
    applicationId, so no other live session can be using the path.
    Idempotent per path."""
    if path in _SCRATCH_REGISTERED:
        return
    _SCRATCH_REGISTERED.add(path)
    import atexit
    import shutil
    atexit.register(shutil.rmtree, path, True)
