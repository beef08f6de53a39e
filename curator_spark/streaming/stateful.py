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

    Late-event semantics (cross-batch, inside the watermark): an event
    older than the open session's `last` but within SESSION_GAP_US of
    its `start` MERGES into it, extending start downward
    (start = min(start, ts)) — matching what batch q11 computes for
    that ordering. Events more than a gap OLDER than `start` cannot
    belong to the open session and their true session may already have
    been emitted; the batch's too-late events are sessionized among
    themselves by the same gap rule and emitted best-effort (the one
    documented divergence from batch: batch would have merged them into
    that earlier, already-emitted session). Events later than the
    watermark never reach this function at all."""
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

    start, last, n = state.get if state.exists else (None, None, 0)
    closed = []
    late = []  # events older than the open session's backward reach
    ts_all = sorted(
        int(t) for pdf in pdfs for t in pdf["ts_us"].tolist())
    for ts in ts_all:
        if last is None:
            start, last, n = ts, ts, 1
        elif ts - last > SESSION_GAP_US:
            closed.append(row(start, last, n))
            start, last, n = ts, ts, 1
        elif ts < start - SESSION_GAP_US:
            # late event beyond the open session's backward reach: its
            # true session was already closed — buffer it; the batch's
            # too-late events are sessionized AMONG THEMSELVES below
            # rather than glued onto a session they can't belong to
            late.append(ts)
        else:
            start, last, n = min(start, ts), max(last, ts), n + 1
    # gap rule over the buffered too-late events (they arrive sorted):
    # consecutive late events within a gap form ONE session, matching
    # what batch q11 computes for them in isolation
    if late:
        ls, ll, ln = late[0], late[0], 1
        for ts in late[1:]:
            if ts - ll > SESSION_GAP_US:
                closed.append(row(ls, ll, ln))
                ls, ll, ln = ts, ts, 1
            else:
                ll, ln = ts, ln + 1
        closed.append(row(ls, ll, ln))
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
