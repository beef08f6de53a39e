"""Stream-stream joins: correlate two unbounded streams in event time.

The canonical transcript-pipeline case: an assistant turn issues a tool
call, and the tool's RESULT arrives on a separate stream seconds-to-
minutes later. Batch would just join the two tables; in a stream both
sides are unbounded, so Spark buffers each side in the state store and
the join condition must bound how long a row can wait — a watermark on
both sides plus an event-time range on the join predicate. Rows outside
the horizon age out of state (bounded memory at any stream length).

Contrast quality_stream.enrich_stream (stream-STATIC, stateless,
re-broadcast per micro-batch): use that for slowly-changing dimensions,
use this when BOTH sides move.

Inner joins emit as soon as both sides arrive. Left-outer additionally
emits unmatched left rows with nulls — but only once the watermark
passes the join horizon for that row (Spark cannot know "no match will
come" any earlier), so outer results trail the watermark; the test
drives this with a later batch that advances the watermark.

Scale shape: state is keyed by the equality column (conv_id) — one
conversation's open tool calls, never its history beyond the horizon.
The horizon IS the state-size knob: state ≈ input_rate × horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TOOL_RESULT_SCHEMA = ("conv_id string, turn_idx int, tool string, "
                      "status string, ts timestamp")


def join_tool_results(turns: DataFrame, results: DataFrame,
                      horizon: str = "10 minutes",
                      watermark: str = "20 minutes",
                      how: str = "inner") -> DataFrame:
    """Attach each tool-result event to the turn that issued it: same
    conv_id and turn_idx, result timestamp within [turn ts, turn ts +
    horizon]. Both inputs may be streaming DataFrames (file source,
    Kafka, ...) carrying an event-time `ts` column.

    how='inner' emits matches immediately; 'left_outer' also emits
    turns whose tool call never got a result inside the horizon (their
    result columns null) once the watermark passes."""
    t = turns.withWatermark("ts", watermark).alias("t")
    r = results.withWatermark("ts", watermark).alias("r")
    cond = ((F.col("t.conv_id") == F.col("r.conv_id"))
            & (F.col("t.turn_idx") == F.col("r.turn_idx"))
            & (F.col("r.ts") >= F.col("t.ts"))
            & (F.col("r.ts") <= F.col("t.ts") + F.expr(
                f"INTERVAL {horizon}")))
    joined = t.join(r, cond, how)
    return joined.select(
        F.col("t.conv_id").alias("conv_id"),
        F.col("t.turn_idx").alias("turn_idx"),
        F.col("t.text").alias("text"),
        F.col("t.ts").alias("turn_ts"),
        F.col("r.status").alias("tool_status"),
        F.col("r.ts").alias("result_ts"))
