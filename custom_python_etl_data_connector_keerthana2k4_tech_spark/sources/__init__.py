"""Source connectors (SURVEY §7 M3): the paginated REST reader (R1-R5)."""

from custom_python_etl_data_connector_keerthana2k4_tech_spark.sources.rest import (
    RestDataSource,
    normalize_payload,
    pulses_df,
    register_rest_source,
    safe_get,
)

__all__ = [
    "RestDataSource",
    "normalize_payload",
    "pulses_df",
    "register_rest_source",
    "safe_get",
]
