"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (TPC-H Q1 shape) at sf0.001.
- ``queries()``: every declared operator from SURVEY.md §2.3, as
  (spark, sf_dir) -> DataFrame callables.
- ``oracle_sql()``: DuckDB-equivalent SQL for each SQL-expressible query;
  approximate/ML ops are omitted (rows-only check) and pytest-verified
  against exact methods instead (tests/).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans import registry as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    qs = _registry.queries()
    return qs["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (same column aliases as the Spark side)."""
    return _registry.oracle_sql()
