"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship monthly-trend query (the
v_monthly_trend analog, SURVEY.md §7 minimum slice) at sf0.001.
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the [EXT] LLM-pipeline operators, each with a DuckDB
oracle where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from us_flight_delay_data_pipeline_spark.queries import load_registry  # noqa: E402

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    reg = load_registry()
    return reg["monthly_trend"].fn(spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in load_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted → rows-only check)."""
    return {name: spec.oracle for name, spec in load_registry().items()
            if spec.oracle is not None}
