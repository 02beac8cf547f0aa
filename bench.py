"""Benchmark harness: runs the declared query surface at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line with per-query wall seconds.

Each query is forced end-to-end with a noop sink write (count() would let
Catalyst prune the computed columns; noop materializes every row).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans import registry
from custom_python_etl_data_connector_keerthana2k4_tech_spark.session import get_spark


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark(app_name="engine-bench")

    qs = registry.queries()
    timings: dict[str, float] = {}
    # Warm the JVM/session on the flagship before timed runs, and spawn the
    # Arrow Python workers once so the first pandas-UDF query isn't charged
    # their startup.
    _force(qs["q01_pricing_summary"](spark, sf_dir))
    import pandas as _pd  # noqa: F401

    _force(
        spark.range(32).mapInPandas(
            lambda it: it, schema="id long"
        )
    )

    total = 0.0
    for name in sorted(qs):
        t0 = time.perf_counter()
        _force(qs[name](spark, sf_dir))
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt

    print(
        json.dumps(
            {
                "metric": "query_suite_wall_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
