"""Sequence packing for training-batch construction.

LLM pretraining/SFT pipelines pack variable-length documents into
fixed-token-budget training sequences so every batch slot is full.
Packing is inherently sequential (the next doc's placement depends on
the current fill), so a single global pass cannot scale; the standard
device is the same one the reference uses for batching (SURVEY.md §2
A12, `base_request_processor.py:222-244` chunking): shard the corpus
into deterministic hash buckets, pack each bucket independently, and
let the bucket count scale with the corpus. Assignment is a pure
function of (id, token count, bucket salt) — partitioning-, retry- and
engine-invariant, so a DuckDB recursive-CTE oracle replays it exactly.

Plan shape at 100 TB: one narrow JVM-side map computes (bucket,
n_tokens) — the text column is pruned before any shuffle — then ONE
shuffle on the bucket key into `applyInPandas`, which sees only the
3-column (id, bucket, n_tokens) frame. Buckets are sized to executor
memory (rows are 20 bytes each in Arrow — a 10^7-doc bucket is
~200 MB); `n_buckets` is the scale knob, exactly like the reference's
`batch_size`.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

from .sampling import hash_bucket

PACK_SALT = "pack-v1"


def _next_fit(pdf: pd.DataFrame, order_col: str, budget: int,
              idx_name: str, off_name: str) -> pd.DataFrame:
    """Shared next-fit kernel: in ascending order_col order, items join
    the open window while they fit the token budget, else open the next
    (an over-budget item occupies a window alone)."""
    pdf = pdf.sort_values(order_col).reset_index(drop=True)
    win_idx, win_off = [], []
    win, fill = 0, 0
    for i, nt in enumerate(pdf["n_tokens"]):
        nt = int(nt)
        if i > 0 and fill + nt > budget:
            win, fill = win + 1, 0
        win_idx.append(win)
        win_off.append(fill)
        fill += nt
    pdf[idx_name] = pd.Series(win_idx, dtype="int32")
    pdf[off_name] = pd.Series(win_off, dtype="int32")
    return pdf


def pack_sequences(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", budget: int = 128,
                   n_buckets: int = 8,
                   salt: str = PACK_SALT) -> DataFrame:
    """Next-fit sequence packing within deterministic hash buckets.

    Within a bucket, docs are taken in ascending `id_col` order; a doc
    joins the open sequence if it fits the token budget, else it opens
    the next one (next-fit — the streaming-friendly discipline; docs
    longer than the budget occupy a sequence alone). Returns one row
    per doc: (id, bucket, n_tokens, seq_idx, seq_offset) where seq_idx
    numbers sequences within the bucket and seq_offset is the doc's
    token start position inside its sequence.
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    base = docs.select(
        F.col(id_col),
        hash_bucket(id_col, salt, n_buckets).alias("bucket"),
        # NULL text → zero tokens (size(split(NULL)) is NULL, which
        # would reach the pandas kernel as NaN and crash int())
        F.coalesce(F.size(toks), F.lit(0)).alias("n_tokens"),
    )
    out_schema = StructType([
        base.schema[id_col],
        StructField("bucket", LongType()),
        StructField("n_tokens", IntegerType()),
        StructField("seq_idx", IntegerType()),
        StructField("seq_offset", IntegerType()),
    ])

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = _next_fit(pdf, id_col, budget, "seq_idx", "seq_offset")
        return pdf[[f.name for f in out_schema.fields]]

    return base.groupBy("bucket").applyInPandas(_pack, out_schema)


def segment_conversations(turns: DataFrame, conv_col: str = "conv_id",
                          order_col: str = "turn_idx",
                          text_col: str = "text",
                          budget: int = 256) -> DataFrame:
    """Greedy context-length windowing of multi-turn conversations: in
    turn order, a turn joins the open window while the window stays
    within the token budget, else it opens the next (next-fit — turn
    boundaries are never split; an over-budget turn gets a window
    alone). The SFT/inference-prep op of slicing long transcripts into
    model-context-sized windows.

    Same kernel and same plan shape as pack_sequences, but the grouping
    key is the NATURAL sequential unit (the conversation) instead of a
    synthetic hash bucket: text is pruned to (conv, turn, n_tokens)
    before the single shuffle on conv_col, and the per-group state is
    three small columns, so even a 10^5-turn conversation is a few MB
    in Arrow. Windowing cannot parallelize inside one conversation (the
    window index depends on every prior turn); across conversations it
    scales with the corpus.

    Returns one row per turn: (conv, turn, n_tokens, win_idx,
    win_offset) with win_idx numbering windows within the conversation
    and win_offset the turn's token start inside its window."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    base = turns.select(
        F.col(conv_col),
        F.col(order_col),
        F.coalesce(F.size(toks), F.lit(0)).alias("n_tokens"),
    )
    out_schema = StructType([
        base.schema[conv_col],
        base.schema[order_col],
        StructField("n_tokens", IntegerType()),
        StructField("win_idx", IntegerType()),
        StructField("win_offset", IntegerType()),
    ])

    def _seg(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = _next_fit(pdf, order_col, budget, "win_idx", "win_offset")
        return pdf[[f.name for f in out_schema.fields]]

    return base.groupBy(conv_col).applyInPandas(_seg, out_schema)


def length_sorted_batches(docs: DataFrame, len_col: str = "n_tokens",
                          id_col: str = "doc_id",
                          batch_size: int = 32) -> DataFrame:
    """Sorted (length-bucketed) batching with padding-waste accounting.

    Batched inference and padded SFT training pay for every slot up to
    the LONGEST sequence in the batch: arrival-order batches mix a
    4k-token document with tweets and waste most of the compute as
    pad tokens. The standard fix is sorted batching — order by length,
    cut into fixed-size batches, so each batch's max ≈ its members.

    This implements it with the scale-safe total order
    (ranking.global_rank — range-bucketed parallel sorts, never a
    single-task global window): rank by (length desc, id), batch
    `(rank-1) div batch_size`, then one map-side-combined groupBy per
    batch emitting the padding economics:

      n_docs, max_len, sum_len, pad_waste = n_docs*max_len - sum_len

    Deterministic (the id tiebreak), partitioning-invariant, and the
    text column never moves — only (id, length) pairs shuffle.
    Downstream schedulers shuffle the BATCHES (not the rows) to
    de-correlate length and training step when that matters.
    """
    from .ranking import global_rank
    ranked = global_rank(
        docs.select(id_col, len_col), len_col,
        order_by=[F.col(len_col).desc(), F.col(id_col)],
        descending=True)
    return (ranked
            .withColumn("batch_id",
                        ((F.col("rank") - 1) / batch_size)
                        .cast("long"))
            .groupBy("batch_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.max(len_col).alias("max_len"),
                 F.sum(len_col).alias("sum_len"))
            .withColumn("pad_waste",
                        F.col("n_docs") * F.col("max_len")
                        - F.col("sum_len")))
