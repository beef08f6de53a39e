"""Nested conversation columns: turns ⇄ array<struct<role,text>>.

The reference's native conversation shape is a message list
`list[{"role","content"}]` (/root/reference/src/bespokelabs/curator/llm/
prompt_formatter.py:18-40 _validate_messages; SURVEY.md §1.1 maps it to
ArrayType(StructType)). The engine's storage shape is long format (one
row per turn) — these operators convert between the two losslessly:

* collect_conversations — groupBy(conv_id) with a deterministic
  sorted collect_list (structs ordered by turn_idx, then the index is
  stripped). One shuffle on conv_id. Unlike the pipeline's salted
  numeric aggregates, reassembly is irreducibly data-proportional per
  key (the array IS the conversation): a 10^6-turn conversation
  becomes one array row on one reducer. At scale, cap turns per
  conversation upstream (slice the collect) or keep such outliers in
  long format — salting cannot help an aggregate whose result is the
  whole group.
* explode_conversations — posexplode back to long format; turn_idx is
  regenerated from array position (identical to the original because
  collection was turn_idx-ordered). Narrow map, no shuffle.

round-trip: explode(collect(t)) == t (asserted in
tests/test_nested_conversations.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def collect_conversations(turns: DataFrame, text_col: str = "text") -> DataFrame:
    """(conv_id, turn_idx, role, text…) → (conv_id, messages).

    messages: array<struct<role:string,text:string>> in turn order."""
    ordered = F.array_sort(F.collect_list(F.struct(
        F.col("turn_idx").alias("i"),
        F.col("role").alias("role"),
        F.col(text_col).alias("text"))))
    msgs = F.transform(ordered, lambda x: F.struct(
        x["role"].alias("role"), x["text"].alias("text")))
    return turns.groupBy("conv_id").agg(msgs.alias("messages"))


def explode_conversations(conv: DataFrame) -> DataFrame:
    """(conv_id, messages) → long format with regenerated turn_idx."""
    return (
        conv.select("conv_id",
                    F.posexplode("messages").alias("pos", "m"))
        .select("conv_id",
                F.col("pos").cast("int").alias("turn_idx"),
                F.col("m.role").alias("role"),
                F.col("m.text").alias("text"))
    )


def conversation_features(conv: DataFrame) -> DataFrame:
    """Flat per-conversation features computed FROM the nested column —
    size, boundary roles, alternation validity, and a content
    fingerprint — all narrow array expressions (no second shuffle after
    the collect)."""
    msgs = F.col("messages")
    role_of = lambda i: F.element_at(msgs, i)["role"]  # noqa: E731
    pairs = F.zip_with(F.slice(msgs, 1, F.size(msgs) - 1),
                       F.slice(msgs, 2, F.size(msgs) - 1),
                       lambda a, b: a["role"] != b["role"])
    serial = F.concat_ws(
        "\x1f", F.transform(msgs, lambda m: F.concat_ws(":", m["role"],
                                                          m["text"])))
    return conv.select(
        "conv_id",
        F.size(msgs).alias("n_turns"),
        role_of(1).alias("first_role"),
        role_of(-1).alias("last_role"),
        F.when(F.size(msgs) > 1,
               F.forall(pairs, lambda x: x)).otherwise(F.lit(True))
        .alias("alternates"),
        F.md5(serial).alias("msg_fp"),
    )
