"""Structured-output schema enforcement: declared-schema JSON
validation with null-on-mismatch and mismatch filtering.

Reference parity: the reference validates every response row against a
full pydantic JSON schema, distinguishing JSON-decode failures from
schema-validation failures, and the caller null-skips mismatching rows
(/root/reference/src/bespokelabs/curator/llm/prompt_formatter.py:104-148
response_to_response_format raising JSONDecodeError vs ValidationError;
drop at base_request_processor.py:344-354). Spark-first shape: ONE
narrow `from_json` with the declared StructType — JVM-side Jackson
parse inside whole-stage codegen, no Python in the plan — with the
corrupt-record channel separating "not JSON" from "JSON but wrong
shape/type".

Semantics (verified against Spark 4 Jackson behavior):
* json_ok — the payload parses as JSON at all (objects, arrays,
  scalars — same acceptance set as duckdb's json_valid), probed with
  `try_parse_json` (VARIANT; NULL ⇔ unparseable or NULL input). The
  typed parse can't answer this alone: permissive mode routes BOTH
  malformed JSON and per-field type mismatches into the corrupt-record
  channel.
* schema_ok — typed parse clean (corrupt-record NULL: no field failed
  conversion) AND every `required` field non-null (catches missing
  keys, `"oops"`/`7.9`-for-int mismatches).
* Jackson accepts trailing garbage after the first JSON document
  (`{"k":1} {` parses) — "malformed" means the FIRST document is
  broken, matching duckdb's json_valid only on such inputs.

At 100 TB this stays a zero-shuffle map; the validity predicate feeds
the same filter stage as every other keep/drop decision.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F, types as T

CORRUPT_COL = "_corrupt_record"


def validate_json(df: DataFrame, json_col: str, schema: T.StructType,
                  required: tuple[str, ...] = (),
                  parsed_col: str = "parsed") -> DataFrame:
    """Parse `json_col` against the declared StructType.

    Adds:
      parsed_col   struct (declared schema); NULL when input is NULL
      json_ok      false iff the payload is not parseable JSON
      schema_ok    json_ok AND every `required` field parsed non-null
    """
    full = T.StructType(list(schema.fields)
                        + [T.StructField(CORRUPT_COL, T.StringType(), True)])
    p = F.col("__p")
    field_ok: Column = reduce(
        lambda a, b: a & b,
        [p[f].isNotNull() for f in required],
        F.lit(True))
    clean = F.struct(*[p[f.name].alias(f.name) for f in schema.fields])
    probe = F.try_parse_json(F.col(json_col))
    return (
        df.withColumn("__p", F.from_json(
            F.col(json_col), full, {"columnNameOfCorruptRecord": CORRUPT_COL}))
        .withColumn("json_ok", probe.isNotNull())
        .withColumn("schema_ok", F.col("json_ok")
                    & p.isNotNull() & p[CORRUPT_COL].isNull() & field_ok)
        .withColumn(parsed_col, F.when(p.isNotNull(), clean))
        .drop("__p")
    )


def filter_valid(df: DataFrame) -> DataFrame:
    """Null-skip: keep only rows that passed schema validation — the
    reference's drop of rows whose parse raised
    (base_request_processor.py:344-354)."""
    return df.filter(F.col("schema_ok"))
