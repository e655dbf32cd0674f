"""Cross-engine TYPE portability gate (the r7 lesson, VERDICT r7 task
#2): the driver compares Spark vs DuckDB through a typed value-hash,
so result TYPES are part of correctness even when every value matches
under Python ``==``.

The failure class this kills: DuckDB's ``SUM(<integer>)`` returns
HUGEINT (int128), which Arrow surfaces as ``decimal128(38,0)`` and
pandas converts to ``float64`` — so a driver-side fetch hashes ``3.0``
against Spark's int64 ``3`` and 13 bit-exact queries went red in r7.
The rule: every oracle and every Spark result must stay inside the
portable type set below; integer sums in oracle SQL are written
``CAST(SUM(...) AS BIGINT)``.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pytest

from us_flight_delay_data_pipeline_spark.queries import load_registry
from us_flight_delay_data_pipeline_spark.sources.registry import TABLES

REGISTRY = load_registry()

GATED = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _arrow_type_ok(t: pa.DataType) -> bool:
    # Anything decimal/int128-backed is the non-portable class: its
    # Python surface depends on the fetch path (Arrow vs pandas vs
    # fetchall) and on the engine build.
    if pa.types.is_decimal(t):
        return False
    if pa.types.is_integer(t):
        return t.bit_width <= 64
    if (pa.types.is_floating(t) or pa.types.is_boolean(t)
            or pa.types.is_string(t) or pa.types.is_large_string(t)
            or pa.types.is_date(t) or pa.types.is_timestamp(t)
            or pa.types.is_null(t)):
        return True
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return _arrow_type_ok(t.value_type)
    if pa.types.is_struct(t):
        return all(_arrow_type_ok(f.type) for f in t)
    return False


def test_every_oracle_arrow_schema_is_portable(duck):
    """``fetch_arrow_table()`` every oracle and assert no field is
    decimal128/256 or int128 — the exact fetch the driver's typed
    compare sees. One test (not parametrized): a single pass over all
    225 oracles at sf0.001 is ~30 s; violations are reported together
    with their offending columns."""
    bad: dict[str, list[tuple[str, str]]] = {}
    for name in GATED:
        tbl = duck.execute(REGISTRY[name].oracle).fetch_arrow_table()
        flagged = [(f.name, str(f.type)) for f in tbl.schema
                   if not _arrow_type_ok(f.type)]
        if flagged:
            bad[name] = flagged
    assert not bad, (
        f"non-portable oracle result types (wrap integer SUMs in "
        f"CAST(... AS BIGINT)): {bad}")


def _spark_type_ok(t) -> bool:
    from pyspark.sql import types as T
    if isinstance(t, T.DecimalType):
        # DECIMAL(38,6) money sums are the ONE sanctioned decimal:
        # both engines fetch them as exact decimal.Decimal objects and
        # the pre-r7 driver rows proved them hash-stable; scale-0
        # decimals (bare integer sums) have no such evidence and the
        # BIGINT form is always available — keep them banned.
        return t.scale > 0
    if isinstance(t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                      T.FloatType, T.DoubleType, T.BooleanType,
                      T.StringType, T.DateType, T.TimestampType,
                      T.TimestampNTZType, T.BinaryType, T.NullType)):
        return True
    if isinstance(t, T.ArrayType):
        return _spark_type_ok(t.elementType)
    if isinstance(t, T.MapType):
        return _spark_type_ok(t.keyType) and _spark_type_ok(t.valueType)
    if isinstance(t, T.StructType):
        return all(_spark_type_ok(f.dataType) for f in t.fields)
    return False


@pytest.mark.slow  # fast-profile exclusion (see pytest.ini)
def test_every_spark_result_schema_is_portable(spark, sf_dir):
    """The Spark half of the same gate: no scale-0 DecimalType (or
    other exotic type) may reach a gated query's output schema."""
    bad: dict[str, list[tuple[str, str]]] = {}
    for name in GATED:
        schema = REGISTRY[name].fn(spark, sf_dir).schema
        flagged = [(f.name, f.dataType.simpleString()) for f in schema
                   if not _spark_type_ok(f.dataType)]
        if flagged:
            bad[name] = flagged
    assert not bad, f"non-portable Spark result types: {bad}"
