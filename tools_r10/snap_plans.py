"""Capture .explain('formatted') for named queries into plans/r10/.

Usage: python tools_r10/snap_plans.py <suffix> q401_pinned_pair_rrf [...]
   or: python tools_r10/snap_plans.py <suffix> ALL   (every declared query)

suffix is 'before' or 'after'. Writes plans/r10/<query>_<suffix>.txt.
Lifecycle queries mutate temp stores at construction time; the plan
captured is the RETURNED DataFrame's plan (the serve), which is what the
optimization claims reference.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans import registry
from custom_python_etl_data_connector_keerthana2k4_tech_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"snap-plans-{suffix}")
    qs = registry.queries()
    if names == ["ALL"]:
        names = sorted(qs)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r10",
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        spark.sparkContext.setJobDescription(f"snap:{name}")
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(name, "ok", flush=True)


if __name__ == "__main__":
    main()
