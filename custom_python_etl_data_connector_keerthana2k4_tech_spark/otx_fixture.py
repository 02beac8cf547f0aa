"""OTX-pulse-shaped fixture records (FIXTURES.md §1.1).

Each record exercises a cited reference behavior
(/root/reference/etl_connector.py):
1. full record, pulse_info present (:150-154)
2. pulse_info absent, top-level id present -> coalesce (:156-158)
3. both ids present -> pulse_info.id wins (:158)
4. neither id -> insert fallback (:177,185-187)
5. indicator_count absent vs present-as-0 (:161-162)
6. duplicate pulse_info.id with different modified -> last-write-wins (:181)
7. empty-string id (falsy-coalesce corner, SURVEY §2.1a)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

RAW_PULSE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("created", T.StringType()),
        T.StructField("modified", T.StringType()),
        T.StructField("indicator_count", T.LongType()),
        T.StructField(
            "pulse_info",
            T.StructType(
                [
                    T.StructField("id", T.StringType()),
                    T.StructField("name", T.StringType()),
                    T.StructField("created", T.StringType()),
                    T.StructField("modified", T.StringType()),
                ]
            ),
        ),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField(
            "indicators",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("indicator", T.StringType()),
                        T.StructField("type", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def _pulse(
    id=None,
    name=None,
    created=None,
    modified=None,
    indicator_count=None,
    pulse_info=None,
    tags=None,
    indicators=None,
):
    return {
        "id": id,
        "name": name,
        "created": created,
        "modified": modified,
        "indicator_count": indicator_count,
        "pulse_info": pulse_info,
        "tags": tags or [],
        "indicators": indicators or [],
    }


RAW_PULSES: list[dict] = [
    # 1. full record
    _pulse(
        id="p-001",
        name="top-name-1",
        created="2024-01-01T00:00:00",
        modified="2024-01-02T00:00:00",
        indicator_count=7,
        pulse_info={
            "id": "pi-001",
            "name": "Emotet wave",
            "created": "2024-01-01T00:00:00",
            "modified": "2024-01-02T00:00:00",
        },
        tags=["emotet", "malware"],
        indicators=[{"indicator": "1.2.3.4", "type": "IPv4"}],
    ),
    # 2. pulse_info absent, top-level id present
    _pulse(id="p-002", name="raw-only", indicator_count=3),
    # 3. both ids present -> pulse_info.id wins
    _pulse(
        id="p-003-top",
        indicator_count=1,
        pulse_info={"id": "pi-003", "name": "Qakbot", "created": None, "modified": None},
    ),
    # 4. neither id -> insert fallback
    _pulse(name="orphan", indicator_count=2),
    # 5a. indicator_count absent (None)
    _pulse(id="p-005", pulse_info={"id": "pi-005", "name": "zero-less", "created": None, "modified": None}),
    # 5b. indicator_count present-as-0
    _pulse(id="p-006", indicator_count=0, pulse_info={"id": "pi-006", "name": "zero", "created": None, "modified": None}),
    # 6. duplicate pulse_info.id, older modified (loses last-write-wins)
    _pulse(
        id="p-001",
        indicator_count=5,
        pulse_info={
            "id": "pi-001",
            "name": "Emotet wave (old)",
            "created": "2024-01-01T00:00:00",
            "modified": "2024-01-01T12:00:00",
        },
    ),
    # 7. empty-string ids -> falsy coalesce makes pulse_id NULL
    _pulse(id="", pulse_info={"id": "", "name": "falsy", "created": None, "modified": None}),
]


def raw_pulses_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(RAW_PULSES, schema=RAW_PULSE_SCHEMA)


def paged_payloads(per_page: int = 3) -> list[dict]:
    """The REST wire format (etl_connector.py:100-117): pages keyed
    ``results``, one keyed ``pulses``, one dict-wrapped, final page short."""
    pages = [
        {"results": RAW_PULSES[0:per_page]},
        {"pulses": RAW_PULSES[per_page : 2 * per_page]},
        # first-list probe: the reference scans ONE level deep for a list
        # value under any key (etl_connector.py:108-113)
        {"count": 2, "data": RAW_PULSES[2 * per_page :]},
    ]
    return pages
