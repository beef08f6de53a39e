"""Custom stateful streaming operator: incremental per-conversation
aggregates via applyInPandasWithState.

Unlike the windowed aggregate (quality_stream.conv_window_aggregates),
this carries exact running state per conv_id across micro-batches — a
conversation whose turns arrive over many triggers accumulates into ONE
aggregate, updated each trigger (output mode "update"). This is the
Spark-native form of the reference's polling tracker that folds
incremental results into per-batch counters (reference:
src/bespokelabs/curator/status_tracker/batch_status_tracker.py:224-307).

Scale: state is one tiny row per live conversation, partitioned by
conv_id hash in the state store — a million-turn conversation costs the
same state as a 2-turn one (only its per-trigger turn batches differ),
so no salting is needed here.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType)

from ..pipeline import score_turns

STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("ppl_sum", DoubleType()),
    StructField("n_assistant", LongType()),
    StructField("n_ua", LongType()),
    StructField("n_pass", LongType()),
])

OUTPUT_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("conv_n_turns", LongType()),
    StructField("conv_mean_ppl", DoubleType()),
    StructField("role_balance", DoubleType()),
    StructField("n_pass", LongType()),
])


def _update(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    n, ppl_sum, n_assistant, n_ua, n_pass = (
        state.get if state.exists else (0, 0.0, 0, 0, 0))
    for pdf in pdfs:
        n += len(pdf)
        ppl_sum += float(pdf["ppl"].sum())
        n_assistant += int((pdf["role"] == "assistant").sum())
        n_ua += int(pdf["role"].isin(["user", "assistant"]).sum())
        n_pass += int(pdf["turn_pass"].sum())
    state.update((int(n), float(ppl_sum), int(n_assistant), int(n_ua),
                  int(n_pass)))
    yield pd.DataFrame([{
        "conv_id": key[0],
        "conv_n_turns": int(n),
        "conv_mean_ppl": round(ppl_sum / max(n, 1), 6),
        "role_balance": round(n_assistant / max(n_ua, 1), 6),
        "n_pass": int(n_pass),
    }])


def conv_aggregates_stateful(stream: DataFrame) -> DataFrame:
    """Streaming DF of transcripts → per-conv running aggregates,
    one updated row per conversation per trigger it appears in."""
    scored = score_turns(stream).select("conv_id", "role", "ppl", "turn_pass")
    return scored.groupBy("conv_id").applyInPandasWithState(
        _update, OUTPUT_SCHEMA, STATE_SCHEMA, "update",
        GroupStateTimeout.NoTimeout)


# ---------------------------------------------------------------------------
# Streaming sessionization (the streaming face of q11_sessionize)
# ---------------------------------------------------------------------------

SESSION_GAP_US = 1_800_000_000  # 30 min in µs — same threshold as q11

SESSION_STATE_SCHEMA = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n_events", LongType()),
])

SESSION_OUTPUT_SCHEMA = StructType([
    StructField("user_id", StringType()),
    StructField("start_us", LongType()),
    StructField("end_us", LongType()),
    StructField("n_events", LongType()),
])


def _session_update(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
                    state: GroupState) -> Iterator[pd.DataFrame]:
    """Gap-based sessions with event-time state eviction.

    Sessions that close WITHIN a batch (a gap > SESSION_GAP_US between
    consecutive events) emit immediately; the still-open tail session
    lives in state with an event-time timeout at last_event + gap, so
    an idle user's final session is emitted (and its state freed) once
    the WATERMARK passes that point — bounded state without ever
    scanning for stale keys. Exactly the cross-trigger generalization
    of q11's lag-based gaps-and-islands.

    Late-event semantics (cross-batch, inside the watermark): each
    trigger computes EXACTLY what batch q11 would on (open-session
    state ∪ batch) via island-merge — batch points collapse into
    gap-separated islands, the open-session interval joins the sorted
    list, one merge pass fuses neighbors within a gap (so a session's
    start extends downward when late events chain to it, in any
    arrival order). Sessions that close because they sit more than a
    gap below everything newer are emitted immediately; the one
    remaining divergence from batch is inherent to append-mode
    streaming: an emitted session is final, so a too-late event that
    batch would have merged into an ALREADY-EMITTED session forms its
    own session instead. Events later than the watermark never reach
    this function at all."""
    user = key[0]

    def row(start, last, n):
        return {"user_id": user, "start_us": int(start),
                "end_us": int(last), "n_events": int(n)}

    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        yield pd.DataFrame([row(start, last, n)],
                           columns=[f.name for f in SESSION_OUTPUT_SCHEMA])
        return

    ts_all = sorted(
        int(t) for pdf in pdfs for t in pdf["ts_us"].tolist())
    # Island-merge sessionization: the batch's points collapse into
    # islands (runs separated by ≤ gap), the open-session interval from
    # state joins the sorted interval list, and one merge pass fuses
    # any neighbors within a gap. This computes exactly what batch q11
    # would for (state ∪ batch) — including the order-dependent case an
    # incremental loop gets wrong, where an apparently-too-late event
    # becomes reachable only AFTER a later event extends the session's
    # start downward. All sessions but the chronologically last close;
    # the last stays open in state.
    intervals = []
    for ts in ts_all:
        if intervals and ts - intervals[-1][1] <= SESSION_GAP_US:
            s, _e, k = intervals[-1]
            intervals[-1] = (s, ts, k + 1)
        else:
            intervals.append((ts, ts, 1))
    if state.exists:
        import bisect
        start, last, n = state.get
        bisect.insort(intervals, (int(start), int(last), int(n)))
        merged = []
        for s, e, k in intervals:
            if merged and s - merged[-1][1] <= SESSION_GAP_US:
                ps, pe, pk = merged[-1]
                merged[-1] = (ps, max(pe, e), pk + k)
            else:
                merged.append((s, e, k))
        intervals = merged
    if not intervals:
        return  # no events and no state: nothing to do
    closed = [row(s, e, k) for s, e, k in intervals[:-1]]
    start, last, n = intervals[-1]
    state.update((int(start), int(last), int(n)))
    # event-time timeout takes ms; fires once the watermark passes it
    state.setTimeoutTimestamp(last // 1000 + SESSION_GAP_US // 1000)
    yield pd.DataFrame(closed, columns=[f.name for f in SESSION_OUTPUT_SCHEMA])


def sessionize_stateful(stream: DataFrame,
                        watermark: str = "10 minutes") -> DataFrame:
    """Streaming events (user_id, ts, …) → closed sessions
    (user_id, start_us, end_us, n_events)."""
    from pyspark.sql import functions as F
    ev = (stream.withWatermark("ts", watermark)
          .select("user_id", F.col("ts"),
                  F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us")))
    return ev.groupBy("user_id").applyInPandasWithState(
        _session_update, SESSION_OUTPUT_SCHEMA, SESSION_STATE_SCHEMA,
        "append", GroupStateTimeout.EventTimeTimeout)
