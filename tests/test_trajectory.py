"""Agent-trajectory analytics (operators/trajectory.py): tool
transition edges and response-latency profiles over the transcripts
schema's tool/ts columns."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from curator_spark.operators.trajectory import (START_MARKER,
                                                response_latency,
                                                tool_transitions)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")


def _ts(s):
    return datetime.fromtimestamp(1_700_000_000 + s, tz=timezone.utc)


def test_tool_transitions_edges_and_start(spark):
    t = _df(spark, [
        ("c1", 0, "user", "q", None, _ts(0)),
        ("c1", 1, "assistant", "a", "search", _ts(60)),
        ("c1", 2, "assistant", "b", "fetch", _ts(120)),
        ("c1", 3, "user", "r", None, _ts(180)),
        ("c1", 4, "assistant", "c", "search", _ts(240)),
        ("c2", 0, "assistant", "d", "fetch", _ts(0)),
        ("c2", 1, "assistant", "e", "fetch", _ts(60)),
    ])
    out = {(r["src_tool"], r["dst_tool"]): r["n_transitions"]
           for r in tool_transitions(t).collect()}
    assert out == {
        (START_MARKER, "search"): 1,   # c1's first call
        ("search", "fetch"): 1,        # c1: search -> fetch
        ("fetch", "search"): 1,        # c1: fetch -> search (skips user)
        (START_MARKER, "fetch"): 1,    # c2's first call
        ("fetch", "fetch"): 1,         # c2's retry loop
    }


def test_tool_transitions_ignores_toolless_corpora(spark):
    t = _df(spark, [("c1", 0, "user", "q", None, _ts(0))])
    assert tool_transitions(t).count() == 0


def test_response_latency_profile(spark):
    t = _df(spark, [
        ("c1", 0, "user", "q", None, _ts(0)),
        ("c1", 1, "assistant", "a", None, _ts(40)),    # lat 40
        ("c1", 2, "user", "r", None, _ts(50)),
        ("c1", 3, "assistant", "b", None, _ts(250)),   # lat 200 (> 90)
        ("c2", 0, "assistant", "only turn, no lag", None, _ts(0)),
    ])
    out = {r["conv_id"]: r for r in response_latency(t).collect()}
    # c2 has no measurable response (first turn) -> no row
    assert set(out) == {"c1"}
    r = out["c1"]
    assert (r["n_responses"], r["sum_latency_s"],
            r["max_latency_s"], r["n_long_pauses"]) == (2, 240, 200, 1)


def test_trajectory_plans_bounded_window_one_agg(spark):
    t = _df(spark, [("c1", 0, "assistant", "a", "x", _ts(0))])
    for df in (tool_transitions(t), response_latency(t)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the only Window is the conv_id-bounded lag; aggregation is
        # map-side combined; nothing drops to Python
        assert plan.count("Window") == 1
        assert "partial_count" in plan or "partial_" in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_trajectory_validity_rules(spark):
    """Each structural rule fires on its own corruption and the clean
    conversation passes the composite gate."""
    from curator_spark.operators.trajectory import trajectory_validity

    rows = [
        # clean: alternating, tool mid-conv answered, dense idx
        ("ok", 0, "user", None), ("ok", 1, "assistant", "tool_1"),
        ("ok", 2, "user", None), ("ok", 3, "assistant", None),
        # role breach: two users in a row
        ("roles", 0, "user", None), ("roles", 1, "user", None),
        # tool on a user turn
        ("place", 0, "user", "tool_0"), ("place", 1, "assistant", None),
        # dangling: last turn invokes a tool
        ("dangle", 0, "user", None), ("dangle", 1, "assistant", "tool_2"),
        # index gap: turn 1 missing
        ("gap", 0, "user", None), ("gap", 2, "user", None),
    ]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "role",
                                      "tool"])
    got = {r["conv_id"]: r for r in trajectory_validity(df).collect()}
    assert got["ok"]["valid"] and got["ok"]["n_tool_calls"] == 1
    assert got["roles"]["role_violations"] == 1 \
        and not got["roles"]["valid"]
    assert got["place"]["tool_placement_violations"] == 1 \
        and not got["place"]["valid"]
    assert got["dangle"]["dangling_tool_call"] \
        and not got["dangle"]["valid"]
    assert got["gap"]["idx_gaps"] and not got["gap"]["valid"]
    # alternation is positional (turn 2 expects user), so the gap
    # fixture's roles are clean — only the gap rule fires
    assert got["gap"]["role_violations"] == 0
