"""Structured Streaming quality filter: the same turn-level scoring
pipeline over an unbounded transcripts stream.

The reference has no streaming surface (SURVEY.md §2.d) — its closest
construct is the batch-polling loop (base_batch_request_processor.py:
538-582). This module is the Spark-native generalization: new transcript
files appear in a directory (or Kafka topic — swap `readStream.parquet`
for `readStream.format("kafka")` + `from_json`), are scored exactly as
in batch (same `scoring.score_turn_batch`, stateless per turn → the
batch/stream results are identical by construction), and land in an
append-only output with exactly-once file-sink semantics via the stream
checkpoint.

Conversation-level aggregates in a stream need bounded state: we window
by event time with a watermark — a conversation's turns arriving within
the watermark horizon aggregate together; stragglers past the horizon
are dropped (documented semantic difference vs batch, where aggregation
is global).

Scale notes: the scoring stage remains a stateless narrow map (scales
with cores, no state store); only the windowed aggregate carries state,
keyed by (conv_id, window) — salting is unnecessary because the state
store partitions by key hash and a single conversation's state is one
small row, not its turns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import schema
from ..pipeline import score_turns


def read_transcript_stream(spark: SparkSession, input_dir: str,
                           max_files_per_trigger: int | None = None) -> DataFrame:
    r = spark.readStream.schema(schema.TRANSCRIPTS_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(input_dir)


def scored_stream(stream: DataFrame) -> DataFrame:
    """Stateless per-turn scoring — identical results to batch."""
    return score_turns(stream)


def conv_window_aggregates(stream: DataFrame, window: str = "10 minutes",
                           watermark: str = "30 minutes") -> DataFrame:
    """Windowed per-conversation aggregates with late-data watermark."""
    scored = score_turns(stream)
    return (
        scored.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "conv_id")
        .agg(
            F.count(F.lit(1)).alias("conv_n_turns"),
            F.round(F.avg("ppl"), 6).alias("conv_mean_ppl"),
            F.sum(F.col("turn_pass").cast("long")).alias("n_pass"),
            F.sum((F.col("scrubbed_text") != F.col("text")).cast("long"))
            .alias("n_scrubbed"),
        )
        .select(F.col("w.start").alias("window_start"), "conv_id",
                "conv_n_turns", "conv_mean_ppl", "n_pass", "n_scrubbed")
    )


def dedup_stream(stream: DataFrame, id_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
                 watermark: str = "30 minutes") -> DataFrame:
    """Streaming exact dedup: at-least-once sources re-deliver rows;
    dropDuplicatesWithinWatermark keeps one per key with state bounded
    by the watermark horizon (vs unbounded dropDuplicates state).
    The streaming face of the exact-dedup operator (operators/dedup.py)."""
    return (stream.withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(list(id_cols)))


def run_quality_stream(spark: SparkSession, input_dir: str, output_dir: str,
                       checkpoint_dir: str, available_now: bool = True,
                       max_files_per_trigger: int | None = None,
                       trigger_interval: str | None = None):
    """Score the stream and append keep/scrub columns to a parquet sink.

    available_now=True drains everything currently in the source then
    stops (used by tests and backfills); False runs continuously.
    Exactly-once via the sink's file-commit log + source offsets in
    `checkpoint_dir` — the streaming analogue of the batch ledger.

    max_files_per_trigger + trigger_interval are the engine's admission
    control (reference: the token-bucket rate limiter,
    online_status_tracker.py:290-388): ingestion rate is bounded to
    ≤ max_files_per_trigger source files per trigger, one trigger per
    interval — backpressure by construction rather than by spin-wait.
    """
    out = scored_stream(read_transcript_stream(
        spark, input_dir, max_files_per_trigger=max_files_per_trigger))
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_interval is not None:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()


def enrich_stream(stream: DataFrame, static_dim: DataFrame,
                  on: str | list[str], how: str = "left") -> DataFrame:
    """Stream-static enrichment join: attach a slowly-changing static
    dimension (source metadata, blocklists, per-conv tiers) to the
    unbounded stream. Stream-static joins are STATELESS in Spark — the
    static side is (re)read per micro-batch, so a broadcast hint keeps
    each micro-batch shuffle-free. The streaming face of the pipeline's
    broadcast of conversation aggregates back to turns."""
    return stream.join(F.broadcast(static_dim), on, how)
