"""Declared query surface (SURVEY §2.3): registry of Spark callables with
matching DuckDB oracle SQL for the driver's differential-correctness gate."""

from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.registry import (
    QUERIES,
    oracle_sql,
    queries,
    query,
)

__all__ = ["QUERIES", "queries", "oracle_sql", "query"]
