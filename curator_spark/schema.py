"""Declared schemas for the transcripts table and derived tables.

The reference infers schema dynamically from parse_func output
(reference: src/bespokelabs/curator/request_processor/
base_request_processor.py:379-393); we invert that — schema is fixed
and declared up front per BASELINE.json input_hint (SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Input: Iceberg-style table of multi-turn conversation transcripts.
TRANSCRIPTS_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
    # Iceberg bucket-partition stand-in: part = md5-bucket(conv_id) % P
    T.StructField("part", T.IntegerType(), False),
])

# Per-turn score columns appended by the scoring stage.
SCORED_EXTRA_FIELDS = [
    T.StructField("lang", T.StringType(), True),
    T.StructField("lang_conf", T.DoubleType(), True),
    T.StructField("ppl", T.DoubleType(), True),
    T.StructField("scrubbed_text", T.StringType(), True),
    T.StructField("rule_flags", T.ArrayType(T.StringType()), True),
    T.StructField("turn_pass", T.BooleanType(), True),
    T.StructField("n_tokens", T.LongType(), True),
]

SCORED_SCHEMA = T.StructType(list(TRANSCRIPTS_SCHEMA.fields) + SCORED_EXTRA_FIELDS)

# Full pipeline output: scored + structure + conversation-level + final keep.
OUTPUT_EXTRA_FIELDS = [
    T.StructField("role_valid", T.BooleanType(), True),
    T.StructField("structure_ok", T.BooleanType(), True),
    T.StructField("conv_n_turns", T.LongType(), True),
    T.StructField("conv_mean_ppl", T.DoubleType(), True),
    T.StructField("conv_lang", T.StringType(), True),
    T.StructField("role_balance", T.DoubleType(), True),
    T.StructField("conv_pass", T.BooleanType(), True),
    T.StructField("keep", T.BooleanType(), True),
]

OUTPUT_SCHEMA = T.StructType(list(SCORED_SCHEMA.fields) + OUTPUT_EXTRA_FIELDS)

# Metrics table: one row per (run_id, part) — curator's counter metrics
# (reference: src/bespokelabs/curator/status_tracker/
# online_status_tracker.py:40-78) as a first-class table.
METRICS_SCHEMA = T.StructType([
    T.StructField("run_id", T.StringType(), False),
    T.StructField("part", T.IntegerType(), False),
    T.StructField("n_in", T.LongType(), False),
    T.StructField("n_kept", T.LongType(), False),
    T.StructField("n_scrubbed", T.LongType(), False),
    T.StructField("n_errors", T.LongType(), False),
    T.StructField("n_tokens", T.LongType(), False),
    T.StructField("wall_ms", T.LongType(), False),
    # supersede key: latest (created_us, shard) per (run_id, part) wins
    # at read time (checkpoint.read_metrics), so recomputed partitions
    # replace — never double-count with — their stale rows
    T.StructField("shard", T.StringType(), False),
    T.StructField("created_us", T.LongType(), False),
])

# Ledger/checkpoint table: one row per committed partition — the analogue
# of curator's batch_objects.jsonl state machine (reference:
# src/bespokelabs/curator/status_tracker/batch_status_tracker.py:308-360).
LEDGER_SCHEMA = T.StructType([
    T.StructField("run_id", T.StringType(), False),
    T.StructField("part", T.IntegerType(), False),
    T.StructField("status", T.StringType(), False),
    T.StructField("n_rows", T.LongType(), False),
    T.StructField("updated_at", T.TimestampType(), False),
])
