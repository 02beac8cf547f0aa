"""Plan-health lint: the 100 TB checklist as a runtime report.

tests/test_plans.py asserts plan shape in CI; this module exposes the same
checks to USERS as a one-call report over any DataFrame — the pre-flight
you run before pointing a new query at the full table:

- does every parquet scan carry pushed filters / a pruned read schema?
- how many shuffles (Exchange) does the plan pay, and is any of them a
  single-partition funnel?
- do joins broadcast where expected — and is anything cartesian?
- does any Window run unpartitioned over a non-aggregate input?
- how much of the plan runs inside whole-stage codegen?

Everything is derived from the resolved physical/optimized plans (not from
documentation), so the report reflects what WOULD execute.

The reference has no plan surface at all (its one pipeline is a fixed
Python loop, /root/reference/etl_connector.py:206-242; SURVEY §3).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanReport:
    n_exchanges: int = 0
    n_single_partition_exchanges: int = 0
    n_broadcast_hash_joins: int = 0
    n_sort_merge_joins: int = 0
    n_bnl_joins: int = 0
    n_cartesian_products: int = 0
    n_unpartitioned_windows: int = 0
    n_codegen_stages: int = 0
    scans: list[dict] = field(default_factory=list)
    warnings: list[str] = field(default_factory=list)

    def ok(self) -> bool:
        """No red flags: nothing cartesian, no unpushed parquet scan."""
        return not self.warnings


def _unpartitioned_windows(df: DataFrame) -> int:
    plan = df._jdf.queryExecution().optimizedPlan()
    found = 0
    stack = [plan]
    while stack:
        node = stack.pop()
        if node.nodeName() == "Window" and node.partitionSpec().isEmpty():
            found += 1
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))
    return found


def plan_report(df: DataFrame, execute: bool = False) -> PlanReport:
    """Lint a DataFrame's physical plan.

    ``execute=False`` (default) analyzes the plan WITHOUT running the query
    — under AQE this is the initial plan, so ``n_codegen_stages`` reads 0
    (codegen ids attach only to the finalized adaptive plan).
    ``execute=True`` forces the query once through a noop sink and reports
    the FINAL adaptive plan, codegen stages included — what actually ran.
    """
    qe = df._jdf.queryExecution()
    if execute:
        # run THIS QueryExecution's plan (a .count()/.write would build a
        # new one and leave this plan un-finalized under AQE); rows stay
        # distributed — only the count job runs
        qe.executedPlan().execute().count()
    jvm = df.sparkSession._jvm
    # formatted explain: carries codegen-stage ids and per-scan details
    # (plain toString under AQE shows the pre-codegen, pre-final plan)
    physical = qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    r = PlanReport()
    r.n_exchanges = physical.count(" Exchange")
    r.n_single_partition_exchanges = len(
        re.findall(r"Arguments: SinglePartition", physical)
    )
    r.n_broadcast_hash_joins = physical.count("BroadcastHashJoin")
    r.n_sort_merge_joins = physical.count("SortMergeJoin")
    r.n_bnl_joins = physical.count("BroadcastNestedLoopJoin")
    r.n_cartesian_products = physical.count("CartesianProduct")
    r.n_codegen_stages = len(set(re.findall(r"codegen id : (\d+)", physical)))
    r.n_unpartitioned_windows = _unpartitioned_windows(df)

    # formatted mode prints one detail block per scan with its own
    # PushedFilters/ReadSchema lines
    blocks = re.split(r"\(\d+\) Scan parquet", physical)[1:]
    for block in blocks:
        pushed = re.search(r"PushedFilters: \[([^\n\]]*)", block)
        schema = re.search(r"ReadSchema: struct<([^\n>]*)", block)
        cols = (
            [c.split(":")[0] for c in schema.group(1).split(",") if ":" in c]
            if schema
            else []
        )
        r.scans.append(
            {
                "pushed_filters": bool(pushed and pushed.group(1).strip()),
                "read_columns": cols,
            }
        )

    if r.n_cartesian_products:
        r.warnings.append(
            f"{r.n_cartesian_products} CartesianProduct — a shuffled "
            "cartesian is never acceptable"
        )
    if r.n_unpartitioned_windows:
        r.warnings.append(
            f"{r.n_unpartitioned_windows} unpartitioned Window(s) — "
            "single-task global sort; fine over an aggregate-sized frame, "
            "fatal over an entity-grain one (use operators/ranks)"
        )
    wide_scans = [s for s in r.scans if len(s["read_columns"]) > 12]
    if wide_scans:
        r.warnings.append(
            f"{len(wide_scans)} scan(s) read >12 columns — check column "
            "pruning (select before wide transforms)"
        )
    return r
