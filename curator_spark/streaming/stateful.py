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
