"""The plan-audit classifier (tools/plan_audit.py::audit_plan): the
regex logic that decides what counts as a scale-killer, exercised on
synthetic plan fragments so the whole-registry audit's 0-red-flags
claim rests on tested rules, not tuned-until-quiet ones."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from plan_audit import audit_plan  # noqa: E402


def test_scalar_rollup_single_partition_is_allowed():
    plan = ("Exchange SinglePartition, ENSURE_REQUIREMENTS\n"
            "+- HashAggregate(keys=[], functions=[partial_sum(x)])\n")
    assert audit_plan(plan)["red"] == {}


def test_sortaggregate_and_empty_function_scalar_forms_allowed():
    plan = ("Exchange SinglePartition\n"
            "+- SortAggregate(key=[], functions=[partial_first(c)])\n"
            "Exchange SinglePartition\n"
            "+- HashAggregate(keys=[], functions=[], output=[])\n")
    assert audit_plan(plan)["red"] == {}


def test_single_partition_feeding_sort_is_red():
    plan = ("Exchange SinglePartition\n"
            "+- Sort [score DESC], false, 0\n")
    red = audit_plan(plan)["red"]
    assert "single_partition_sort" in red
    assert "Sort" in red["single_partition_sort"][0]


def test_single_partition_feeding_window_is_red():
    plan = ("Exchange SinglePartition\n"
            "+- Window [row_number() windowspecdefinition(...)]\n")
    assert "single_partition_sort" in audit_plan(plan)["red"]


def test_cartesian_and_python_row_udf_are_red():
    plan = ("CartesianProduct\n"
            "BatchEvalPython [f(x)], [pythonUDF0]\n")
    red = audit_plan(plan)["red"]
    assert red["cartesian"] == 1
    assert red["python_row_udf"] == 1


def test_arrow_python_lanes_not_flagged():
    plan = ("ArrowEvalPython [g(x)], [pythonUDF0], 200\n"
            "FlatMapGroupsInPandas [conv_id], fn\n"
            "MapInPandas fn\n")
    a = audit_plan(plan)
    assert a["red"] == {}


def test_info_counters():
    plan = ("BroadcastNestedLoopJoin BuildRight, Inner\n"
            "Exchange rangepartitioning(score DESC, 32)\n"
            "Exchange hashpartitioning(k, 32)\n"
            "FileScan parquet [a,b]\n")
    a = audit_plan(plan)
    assert a["info"] == {"broadcast_nested_loop": 1, "range_exchange": 1}
    assert a["exchanges"] == 1
    assert a["scans"] == 1
