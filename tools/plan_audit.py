"""Whole-registry physical-plan audit: every `queries()` entry is
planned (not run) at sf0.001 and scanned for the anti-patterns that
kill 100 TB jobs. The per-query plan *tests* (tests/test_plans.py)
freeze the shapes of the most expensive queries; this tool is the
breadth pass — NO registered query may regress to a red-flag plan
without showing up here.

Flags (red = scale-killer, info = worth eyes):

* red  single_partition_sort  — `Exchange SinglePartition` feeding a
  Sort/Window/non-scalar operator: the one-task global sort. Scalar
  rollups (next op = HashAggregate(keys=[]) partial, one row moves)
  are the standard two-phase global aggregate and are allowed.
* red  cartesian              — CartesianProduct: |L|×|R| work.
* red  python_row_udf         — BatchEvalPython: row-at-a-time Python
  in the plan. Arrow paths (ArrowEvalPython, FlatMapGroupsInPandas,
  MapInPandas, FlatMapGroupsInPandasWithState) are the sanctioned
  Python lanes and are not flagged.
* info broadcast_nested_loop  — BroadcastNestedLoopJoin: fine when the
  build side is a 1-row aggregate (the scalar-join idiom used
  throughout), quadratic otherwise; counted for human review with the
  per-query allowlist documenting the 1-row cases.
* info range_exchange         — `Exchange rangepartitioning`: a
  PARALLEL global sort (terasort shape). Scales, but is data-volume
  shuffle; listed so presentation-only orderBys stay conscious.

Usage: python tools/plan_audit.py [sf_dir] [--json out.json]
Exit 1 iff any query has a red flag not in ALLOW below.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from curator_spark.session import get_spark  # noqa: E402

# Red-flag allowlist: query -> {flag: reason}. Empty = the bar.
ALLOW: dict = {}

# any grouping-free aggregate is scalar: ONE row crosses the exchange
# regardless of partial/final phase or Hash/Sort/ObjectHash strategy
_SCALAR_AGG = re.compile(r"(Hash|Sort|ObjectHash)Aggregate\(keys?=\[\]")


def audit_plan(plan: str) -> dict:
    lines = plan.splitlines()
    flags: dict = {}

    sp_bad = []
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        nxt = lines[i + 1] if i + 1 < len(lines) else ""
        if not _SCALAR_AGG.search(nxt):
            sp_bad.append(nxt.strip()[:100])
    if sp_bad:
        flags["single_partition_sort"] = sp_bad

    if "CartesianProduct" in plan:
        flags["cartesian"] = plan.count("CartesianProduct")
    if "BatchEvalPython" in plan:
        flags["python_row_udf"] = plan.count("BatchEvalPython")

    info = {}
    n_bnlj = plan.count("BroadcastNestedLoopJoin")
    if n_bnlj:
        info["broadcast_nested_loop"] = n_bnlj
    n_range = plan.count("Exchange rangepartitioning")
    if n_range:
        info["range_exchange"] = n_range
    return {"red": flags, "info": info,
            "exchanges": plan.count("Exchange hashpartitioning"),
            # "FileScan parquet" contains the substring "Scan parquet",
            # so the one count covers both plan spellings
            "scans": plan.count("Scan parquet")}


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    json_out = None
    if "--json" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json") + 1]

    spark = get_spark("plan-audit", parallelism=8)
    report, failures = {}, []
    for name, fn in entrymod.queries().items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            report[name] = {"error": str(exc)[:200]}
            failures.append((name, "error"))
            continue
        a = audit_plan(plan)
        report[name] = a
        for flag in a["red"]:
            if ALLOW.get(name, {}).get(flag) is None:
                failures.append((name, flag))

    n_red = sum(1 for n, f in failures if f != "error")
    n_err = sum(1 for n, f in failures if f == "error")
    print(f"audited {len(report)} queries: "
          f"{n_red} red flags, {n_err} plan errors")
    for name, flag in failures:
        print(f"  FLAG {name}: {flag} "
              f"{report[name].get('red', {}).get(flag, report[name].get('error', ''))}")
    bnlj = {n: r["info"]["broadcast_nested_loop"] for n, r in report.items()
            if "info" in r and "broadcast_nested_loop" in r["info"]}
    rng = {n: r["info"]["range_exchange"] for n, r in report.items()
           if "info" in r and "range_exchange" in r["info"]}
    print(f"info: broadcast_nested_loop in {len(bnlj)} queries "
          f"(scalar-join idiom), range_exchange in {len(rng)}")
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(report, fh, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
