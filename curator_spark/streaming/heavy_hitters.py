"""Streaming heavy hitters: Misra-Gries frequency sketches as a custom
stateful operator (applyInPandasWithState) — "what are the most
frequent tokens / domains / conversation templates in the stream right
now", with BOUNDED state no matter how large the vocabulary grows.

Why not groupBy(token).count(): on an unbounded stream the complete
state mode keeps one state row per DISTINCT token forever — at web
scale that's the vocabulary of the internet in the state store.
Misra-Gries keeps at most k candidate counters and guarantees:

  reported(t)  <=  true(t)  <=  reported(t) + debt

where `debt` (the cumulative decrement) is at most n_seen/(k+1) — so
every token with true frequency above n/(k+1) is GUARANTEED present
(no false negatives above the threshold), and reported counts
undershoot by at most `debt`, which the operator emits alongside so
consumers can reason about the bound. With k >= distinct tokens the
sketch degrades gracefully to EXACT counting.

Scale shape: the stream is sharded by token hash, so each state group
holds an independent k-counter summary of a DISJOINT token subset (a
token always hashes to the same shard — its count is never split).
State per shard is O(k); shards give parallelism; there is no global
single-task state and no state growth with vocabulary. Per-trigger
output (mode "update"): every shard that saw data re-emits its current
candidates with the shard's debt and total.

Reference parity: the reference tracks top-level counter statistics
over its stream of responses (online_status_tracker.py's token/cost
counters); this is the corpus-statistics generalization a curation
platform needs — sketch-bounded, not vocabulary-bounded.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (ArrayType, IntegerType, LongType, StringType,
                               StructField, StructType)

__all__ = ["heavy_hitters_stream", "mg_merge_batch"]

MG_STATE_SCHEMA = StructType([
    StructField("tokens", ArrayType(StringType())),
    StructField("counts", ArrayType(LongType())),
    StructField("debt", LongType()),
    StructField("n_seen", LongType()),
])

MG_OUTPUT_SCHEMA = StructType([
    StructField("shard", IntegerType()),
    StructField("token", StringType()),
    StructField("est_count", LongType()),
    StructField("debt", LongType()),
    StructField("n_seen", LongType()),
])


def mg_merge_batch(cand: dict, batch_counts: dict, k: int,
                   debt: int) -> tuple[dict, int]:
    """Fold a batch of exact counts into a Misra-Gries summary of at
    most k counters (the batched decrement: subtract the (k+1)-th
    largest count from everyone and drop non-positives — equivalent to
    running the classic per-item algorithm over the batch). Returns
    (candidates, total debt). Pure function — shared by the streaming
    operator, tests, and any batch caller."""
    for t, c in batch_counts.items():
        cand[t] = cand.get(t, 0) + int(c)
    if len(cand) > k:
        by_count = sorted(cand.values(), reverse=True)
        d = by_count[k]                     # (k+1)-th largest
        cand = {t: c - d for t, c in cand.items() if c - d > 0}
        debt += d
    return cand, debt


def _make_update(k: int):
    def _update(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            tokens, counts, debt, n_seen = state.get
            cand = dict(zip(tokens, counts))
        else:
            cand, debt, n_seen = {}, 0, 0
        for pdf in pdfs:
            vc = pdf["token"].value_counts()
            n_seen += int(vc.sum())
            cand, debt = mg_merge_batch(cand, vc.to_dict(), k, debt)
        state.update((list(cand), [int(c) for c in cand.values()],
                      int(debt), int(n_seen)))
        yield pd.DataFrame({
            "shard": int(key[0]),
            "token": list(cand),
            "est_count": [int(c) for c in cand.values()],
            "debt": int(debt),
            "n_seen": int(n_seen),
        })
    return _update


def heavy_hitters_stream(tokens: DataFrame, k: int = 64,
                         shards: int = 32,
                         token_col: str = "token") -> DataFrame:
    """Streaming DF with a token column → per-trigger Misra-Gries
    candidates. State is k counters per shard (bounded); a token's
    counts all land in one shard (hash-sharded), so per-token
    guarantees hold shard-locally: true > n_seen/(k+1) ⇒ present."""
    sharded = tokens.select(
        F.col(token_col).alias("token"),
        F.pmod(F.xxhash64(token_col), F.lit(int(shards)))
        .cast("int").alias("shard"))
    return sharded.groupBy("shard").applyInPandasWithState(
        _make_update(int(k)), MG_OUTPUT_SCHEMA, MG_STATE_SCHEMA,
        "update", GroupStateTimeout.NoTimeout)
