"""Ingest adapters: turn other corpora into the transcripts shape.

The engine's one first-class input is the transcripts table
(schema.TRANSCRIPTS_SCHEMA, per BASELINE input_hint). This module maps
the driver's `documents` table into that shape deterministically and
entirely JVM-side (no Python in the plan), the analogue of the
reference coercing str / list / generator inputs into its one Dataset
shape (reference: src/bespokelabs/curator/llm/llm.py:288-309
_convert_to_dataset).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TURN_TOKENS = 12          # tokens per synthetic turn
BASE_EPOCH = 1_748_736_000  # 2025-06-01T00:00:00Z
N_PARTS = 8


def docs_to_transcripts(docs: DataFrame, n_parts: int = N_PARTS) -> DataFrame:
    """documents(doc_id, text, ...) → transcripts rows.

    Each document becomes one conversation: its token stream chunked
    into TURN_TOKENS-token turns alternating user/assistant. Pure
    deterministic column expressions — posexplode keeps this a narrow
    map (no shuffle), so a 100 TB document corpus converts at scan speed.
    """
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    n_turns = F.greatest(F.ceil(F.size(toks) / TURN_TOKENS), F.lit(1)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_turns - 1),
        lambda i: F.array_join(F.slice(toks, i * TURN_TOKENS + 1, TURN_TOKENS), " "),
    )
    conv_id = F.concat(F.lit("doc-"), F.lpad(F.col("doc_id").cast("string"), 10, "0"))
    return (
        docs.select(conv_id.alias("conv_id"), F.posexplode(chunks).alias("pos", "chunk"))
        .select(
            "conv_id",
            F.col("pos").cast("int").alias("turn_idx"),
            F.when(F.col("pos") % 2 == 0, F.lit("user")).otherwise(F.lit("assistant"))
            .alias("role"),
            F.col("chunk").alias("text"),
            F.lit(None).cast("string").alias("tool"),
            F.timestamp_seconds(F.lit(BASE_EPOCH) + F.col("pos") * 60).alias("ts"),
            (F.conv(F.substring(F.md5(F.col("conv_id")), 1, 8), 16, 10)
             .cast("long") % n_parts).cast("int").alias("part"),
        )
    )
