"""Nested conversation columns: collect ⇄ explode round-trip identity,
feature semantics, and structured-output validation channels."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from curator_spark.operators.nested import (
    collect_conversations, conversation_features, explode_conversations)
from curator_spark.operators.structured import filter_valid, validate_json


def _turns(spark):
    rows = [
        ("c1", 0, "user", "hello there"),
        ("c1", 1, "assistant", "hi"),
        ("c1", 2, "user", "bye"),
        ("c2", 0, "system", "be nice"),
        ("c2", 1, "user", "ok"),
        ("c3", 0, "user", ""),          # single empty turn
        ("c4", 0, "user", "a"),
        ("c4", 1, "user", "b"),         # broken alternation
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string")


def test_collect_explode_roundtrip(spark):
    t = _turns(spark)
    back = explode_conversations(collect_conversations(t))
    a = sorted(t.collect(), key=lambda r: (r.conv_id, r.turn_idx))
    b = sorted(back.collect(), key=lambda r: (r.conv_id, r.turn_idx))
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_collect_orders_by_turn_idx_not_arrival(spark):
    # reversed input order must not change the collected array
    t = _turns(spark).orderBy(F.col("turn_idx").desc())
    conv = {r.conv_id: r.messages
            for r in collect_conversations(t).collect()}
    assert [m.role for m in conv["c1"]] == ["user", "assistant", "user"]
    assert [m.text for m in conv["c1"]] == ["hello there", "hi", "bye"]


def test_conversation_features(spark):
    feats = {r.conv_id: r for r in conversation_features(
        collect_conversations(_turns(spark))).collect()}
    assert feats["c1"].n_turns == 3
    assert feats["c1"].first_role == "user"
    assert feats["c1"].last_role == "user"
    assert feats["c1"].alternates is True
    assert feats["c2"].first_role == "system"
    assert feats["c3"].n_turns == 1 and feats["c3"].alternates is True
    assert feats["c4"].alternates is False
    # fingerprint differs across different conversations
    assert feats["c1"].msg_fp != feats["c2"].msg_fp


def test_validate_json_channels(spark):
    df = spark.createDataFrame(
        [(1, '{"k": 69}'),        # valid
         (2, '{"k": "oops"}'),    # schema mismatch (type)
         (3, '{"j": 5}'),         # schema mismatch (missing required)
         (4, '{"k": '),           # malformed
         (5, None)],              # null payload
        "id int, payload string")
    out = validate_json(
        df, "payload", T.StructType([T.StructField("k", T.IntegerType())]),
        required=("k",))
    rows = {r.id: r for r in out.collect()}
    assert rows[1].json_ok and rows[1].schema_ok and rows[1].parsed.k == 69
    assert rows[2].json_ok and not rows[2].schema_ok
    assert rows[3].json_ok and not rows[3].schema_ok
    assert not rows[4].json_ok and not rows[4].schema_ok
    assert not rows[5].json_ok and not rows[5].schema_ok
    assert sorted(r.id for r in filter_valid(out).collect()) == [1]
