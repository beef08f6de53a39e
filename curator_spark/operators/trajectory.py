"""Agent-trajectory analytics over the transcripts table — the two
input-schema columns the quality filter itself doesn't consume: `tool`
(which tool an agent turn invoked) and `ts` (when the turn landed).
Curation signals built on them: tool-transition structure (what the
agent actually *does*, corpus-wide) and response-latency profiles
(stalled / runaway sessions are a quality axis of agent transcripts,
like refusals are for chat).

The reference's pipeline carries per-request timing and generation
metadata alongside each response (reference:
src/bespokelabs/curator/request_processor/online/base_online_request_processor.py
token/latency bookkeeping); these operators make that telemetry a
first-class distributed analysis instead of log output.

Scale shapes — both operators are a bounded per-conversation window
(frame = conversation length, the q55 invariant) feeding ONE
map-side-combined groupBy; nothing corpus-wide is ever sorted in a
single task, no Python:
* tool_transitions — the transition matrix is k_tools² rows however
  large the corpus; a 10^12-turn corpus reduces map-side into that
  tiny table.
* response_latency — one output row per conversation; integer-seconds
  arithmetic so engines agree bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["tool_transitions", "response_latency", "START_MARKER"]

START_MARKER = "<start>"


def tool_transitions(turns: DataFrame) -> DataFrame:
    """Corpus-wide tool-call transition counts: for every tool
    invocation, pair it with the PREVIOUS tool invoked in the same
    conversation (turn_idx order; `<start>` when it is the
    conversation's first tool call) and count each (src_tool, dst_tool)
    edge. The result is the agent's empirical tool-transition matrix —
    k² rows for k tools — the structure retrieval/routing curation
    filters on (e.g. drop trajectories dominated by a single
    tool-retry loop).

    Plan: filter to tool calls (narrow), lag over a bounded
    per-conversation window, ONE map-side-combined groupBy of the
    k²-key edge — no corpus-scale state."""
    calls = turns.filter(F.col("tool").isNotNull())
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    edges = calls.select(
        F.coalesce(F.lag("tool").over(w),
                   F.lit(START_MARKER)).alias("src_tool"),
        F.col("tool").alias("dst_tool"))
    return edges.groupBy("src_tool", "dst_tool").agg(
        F.count(F.lit(1)).alias("n_transitions"))


def response_latency(turns: DataFrame, role: str = "assistant",
                     long_pause_s: int = 90) -> DataFrame:
    """Per-conversation response-latency profile: for each `role` turn,
    latency = its ts minus the PREVIOUS turn's ts (any role — the time
    the agent took to produce the turn), in integer epoch seconds.
    Emits one row per conversation with at least one measurable
    response: (conv_id, n_responses, sum_latency_s, max_latency_s,
    n_long_pauses) — sum+count rather than a float mean so both
    engines agree bit-exactly; stalled sessions surface via
    n_long_pauses (> long_pause_s).

    Plan: bounded per-conversation lag + ONE map-side-combined
    groupBy(conv_id)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    ts_s = F.unix_timestamp("ts")
    lat = (ts_s - F.lag(ts_s).over(w)).alias("lat")
    resp = (turns.select("conv_id", "turn_idx", "role", lat)
            .filter((F.col("role") == role) & F.col("lat").isNotNull()))
    return resp.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_responses"),
        F.sum("lat").cast("long").alias("sum_latency_s"),
        F.max("lat").cast("long").alias("max_latency_s"),
        F.sum((F.col("lat") > long_pause_s).cast("long"))
        .alias("n_long_pauses"))


def trajectory_validity(turns: DataFrame) -> DataFrame:
    """Structural validity filter for agent trajectories — the gate a
    tool-use SFT corpus needs before export: per conversation,

    * role_violations — turns breaking strict user/assistant
      alternation from user at turn 0;
    * tool_placement_violations — a tool invocation on a non-assistant
      turn (protocol breach);
    * dangling_tool_call — the LAST turn invokes a tool, so its result
      never arrives (truncated/crashed session);
    * idx_gaps — turn_idx not dense 0..n-1 (lost turns);
    * valid — all of the above clean.

    Plan: ONE map-side-combined groupBy(conv_id) — no window at all
    (the dangling check rides max_by, alternation is a per-row
    expression aggregated with sum). Skew-immune: per-conv state is
    five integers regardless of conversation length.
    """
    expected_role = F.when(F.col("turn_idx") % 2 == 0, "user") \
        .otherwise("assistant")
    return (turns.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.count("tool").alias("n_tool_calls"),
        F.sum(F.when(F.col("role") != expected_role, 1).otherwise(0))
        .cast("long").alias("role_violations"),
        F.sum(F.when(F.col("tool").isNotNull()
                     & (F.col("role") != "assistant"), 1).otherwise(0))
        .cast("long").alias("tool_placement_violations"),
        # "the last turn invokes a tool" as a null-safe max compare —
        # max_by's treatment of NULL args differs across engines
        F.max(F.when(F.col("tool").isNotNull(), F.col("turn_idx")))
        .eqNullSafe(F.max("turn_idx")).alias("dangling_tool_call"),
        ((F.max("turn_idx") + 1 != F.count(F.lit(1)))
         | (F.min("turn_idx") != 0)).alias("idx_gaps"))
        .withColumn("valid",
                    (F.col("role_violations") == 0)
                    & (F.col("tool_placement_violations") == 0)
                    & ~F.col("dangling_tool_call")
                    & ~F.col("idx_gaps")))
