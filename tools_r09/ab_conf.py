"""A/B a set of runtime SQL confs over a representative query subset.

Usage: python tools_r09/ab_conf.py 'conf1=v1,conf2=v2' qname [...]
Times each query (min over N runs) with defaults, then with the confs,
then with defaults again (drift check). One JSON line per phase.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans import registry
from custom_python_etl_data_connector_keerthana2k4_tech_spark.session import get_spark


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _run(spark, qs, names, sf_dir, n_runs):
    out = {}
    for name in names:
        best = float("inf")
        for _ in range(n_runs):
            t0 = time.perf_counter()
            _force(qs[name](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    out["__total"] = round(sum(v for k, v in out.items() if k != "__total"), 3)
    return out


def main() -> None:
    confs = dict(kv.split("=", 1) for kv in sys.argv[1].split(","))
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    spark = get_spark(app_name="ab-conf")
    qs = registry.queries()
    _force(qs["q01_pricing_summary"](spark, sf_dir))
    import pandas as _pd  # noqa: F401

    _force(spark.range(32).mapInPandas(lambda it: it, schema="id long"))

    base = {k: spark.conf.get(k, None) for k in confs}
    print("A(default) ", json.dumps(_run(spark, qs, names, sf_dir, n_runs)))
    for k, v in confs.items():
        spark.conf.set(k, v)
    print("B(confs)   ", json.dumps(_run(spark, qs, names, sf_dir, n_runs)))
    for k, v in base.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)
    print("A2(default)", json.dumps(_run(spark, qs, names, sf_dir, n_runs)))


if __name__ == "__main__":
    main()
