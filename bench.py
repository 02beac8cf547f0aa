"""Benchmark harness: runs the declared query surface at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line with per-query wall seconds.

Each query is forced end-to-end with a noop sink write (count() would let
Catalyst prune the computed columns; noop materializes every row).

Stability: every query runs $SPARK_GRAFT_BENCH_RUNS times (default 3) and
reports the MIN — single-run numbers at local[32] carry multi-second
GC/scheduler variance that swamps real plan regressions. The full payload
is also persisted to bench_out.json at the repo root so the driver's
parser has a complete copy (its captured stdout tail can truncate the
~11 KB line). bench_out.json is UNTRACKED (round-9 VERDICT #2: driver
bench runs were clobbering the committed multi-pass fold) — the folded
artifact each round commits lives at bench_fold_rNN.json instead, so a
driver run never dirties the tree or overwrites the fold.
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
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
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

    for name in sorted(qs):
        best = float("inf")
        # construction stays inside the timed window: several operators do
        # genuine driver-coordinated work (iterative algorithms, adaptive
        # gates) that is part of their cost
        for _ in range(n_runs):
            t0 = time.perf_counter()
            _force(qs[name](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    payload = {
        "metric": "query_suite_wall_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "runs_per_query": n_runs,
    }
    out = json.dumps(payload)
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_out.json"),
        "w",
    ) as f:
        f.write(out + "\n")
    print(out)


if __name__ == "__main__":
    main()
