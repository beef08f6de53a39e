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

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession, functions as F

TURN_TOKENS = 12          # tokens per synthetic turn
BASE_EPOCH = 1_748_736_000  # 2025-06-01T00:00:00Z
N_PARTS = 8


def part_expr(key, n_parts: int = N_PARTS):
    """THE part-bucket expression: md5-hex(8) → int % n_parts.

    Single definition shared by every ingest path — part assignment
    must be identical across them or resume/memoization silently breaks
    (a conv written under part 3 by one path and looked up under part 5
    by another never reconciles). The salted cousin for dataset splits
    is operators/sampling.hash_bucket."""
    c = F.col(key) if isinstance(key, str) else key
    return (F.conv(F.substring(F.md5(c), 1, 8), 16, 10)
            .cast("long") % n_parts).cast("int")


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
            part_expr("conv_id", n_parts).alias("part"),
        )
    )


def _is_message(x) -> bool:
    return isinstance(x, dict) and "role" in x and ("content" in x or "text" in x)


def _is_message_list(x) -> bool:
    return (isinstance(x, list) and len(x) > 0
            and all(_is_message(m) for m in x))


def coerce_to_transcripts(spark: SparkSession, data,
                          n_parts: int = N_PARTS) -> DataFrame:
    """Coerce any supported input into the transcripts table.

    The breadth analogue of the reference's _convert_to_dataset
    (reference: src/bespokelabs/curator/llm/llm.py:288-309 — str,
    message-list, generator/iterable, or Dataset all become the one
    first-class Dataset shape):

    * str                        → one single-turn (user) conversation
    * message list
      [{"role","content"}, ...]  → ONE conversation with those turns
    * iterable of either         → one conversation per element
    * DataFrame with transcripts
      columns                    → passthrough (part recomputed if absent)
    * DataFrame with doc_id/text → docs_to_transcripts chunking

    Python inputs are driver-local by nature (exactly as in the
    reference); the distributed path is the DataFrame route. conv_ids
    ("row-%010d" by input position), timestamps, and part assignment
    are deterministic, so coercion is memoization-stable."""
    if isinstance(data, DataFrame):
        from .schema import TRANSCRIPTS_SCHEMA  # noqa: PLC0415
        cols = set(data.columns)
        if {"conv_id", "turn_idx", "role", "text"} <= cols:
            # exact schema (names + types) → untouched passthrough
            if [(f.name, f.dataType) for f in data.schema.fields] == \
                    [(f.name, f.dataType) for f in TRANSCRIPTS_SCHEMA.fields]:
                return data
            # NOT a bare passthrough: missing nullable columns (ts, tool)
            # are added and every present column is cast to its declared
            # type, so this path emits exactly TRANSCRIPTS_SCHEMA like
            # every other ingest route — a frame with e.g. a long
            # turn_idx can't silently propagate a deviant schema
            out = data
            for f in TRANSCRIPTS_SCHEMA.fields:
                if f.name == "part":
                    continue
                if f.name in cols:
                    out = out.withColumn(f.name, F.col(f.name).cast(f.dataType))
                else:
                    out = out.withColumn(f.name, F.lit(None).cast(f.dataType))
            out = out.withColumn(
                "part",
                F.col("part").cast("int") if "part" in cols
                else part_expr("conv_id", n_parts))
            return out.select([f.name for f in TRANSCRIPTS_SCHEMA.fields])
        if {"doc_id", "text"} <= cols:
            return docs_to_transcripts(data, n_parts)
        raise TypeError(f"cannot coerce DataFrame with columns {sorted(cols)}")

    if isinstance(data, str) or _is_message_list(data):
        data = [data]
    elif _is_message(data):
        data = [[data]]          # one bare message dict → 1-turn conversation
    elif isinstance(data, dict) or not isinstance(data, Iterable):
        # a plain dict is Iterable (over its KEYS) — iterating it would
        # silently fabricate garbage conversations from the key strings
        raise TypeError(f"cannot coerce {type(data).__name__} to transcripts")

    rows = []
    for i, item in enumerate(data):  # generators consume lazily, build once
        conv_id = f"row-{i:010d}"
        if isinstance(item, str):
            turns = [("user", item, None)]
        elif _is_message(item):
            turns = [(item["role"], item.get("content", item.get("text", "")),
                      item.get("tool"))]
        elif _is_message_list(item):
            turns = [(m["role"], m.get("content", m.get("text", "")),
                      m.get("tool")) for m in item]
        else:
            raise TypeError(
                f"element {i}: expected str, message dict with role + "
                f"content/text, or message list; got {type(item).__name__}")
        for t, (role, text, tool) in enumerate(turns):
            rows.append((conv_id, t, role, text, tool))
    from .schema import TRANSCRIPTS_SCHEMA  # noqa: PLC0415 (cycle-free late import)
    base = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string")
    out = base.select(
        "conv_id", "turn_idx", "role", "text", "tool",
        F.timestamp_seconds(F.lit(BASE_EPOCH) + F.col("turn_idx") * 60).alias("ts"),
        part_expr("conv_id", n_parts).alias("part"),
    )
    return out.select([f.name for f in TRANSCRIPTS_SCHEMA.fields])


def write_transcripts_jsonl(df: DataFrame, path: str) -> None:
    """JSONL sink — the reference's durable interchange format
    (requests_{i}.jsonl / responses_{i}.jsonl, written one line per row:
    base_online_request_processor.py:492-502 append_generic_response).
    Columnar parquet remains the primary format; JSONL exists for
    interop with line-oriented tooling."""
    df.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str, declared_schema,
               required_key: str, keep_corrupt: bool = False) -> DataFrame:
    """Schema-enforced JSONL scan for ANY declared StructType
    (reference A2: stream-read request files validating every line,
    base_online_request_processor.py:269-274 /
    base_batch_request_processor.py:377-399).

    The declared schema drives the Jackson parse (no inference pass over
    the data — at 100 TB schema inference would be a full extra scan);
    malformed lines land in a corrupt-record column and are quarantined
    (dropped, or kept for inspection with keep_corrupt=True) instead of
    failing the scan — the line-level analogue of the reference's
    per-line pydantic validation raising on bad rows. A line parsing to
    a NULL required_key is a schema violation and quarantines too."""
    from pyspark.sql import types as T
    full = T.StructType(list(declared_schema.fields)
                        + [T.StructField("_corrupt", T.StringType(), True)])
    df = (spark.read.schema(full)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt")
          .json(path))
    if keep_corrupt:
        return df
    # (referencing a data column in the filter also keeps count()-style
    # queries legal — Spark forbids plans that reference ONLY the
    # corrupt column of a raw JSON scan)
    return (df.filter(F.col("_corrupt").isNull()
                      & F.col(required_key).isNotNull())
            .select([f.name for f in declared_schema.fields]))


def read_transcripts_jsonl(spark: SparkSession, path: str,
                           keep_corrupt: bool = False) -> DataFrame:
    """Transcripts-shaped wrapper over read_jsonl."""
    from .schema import TRANSCRIPTS_SCHEMA
    return read_jsonl(spark, path, TRANSCRIPTS_SCHEMA, "conv_id",
                      keep_corrupt=keep_corrupt)
