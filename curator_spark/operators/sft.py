"""SFT/RLHF training-data preparation operators over the transcripts
table — the post-curation half of a conversation-data pipeline: render
conversations into model-ready training strings with loss-mask spans,
deduplicate synthetic assistant responses across conversations, and
score refusal/boilerplate patterns in assistant turns.

The reference curates conversations but leaves training-format export
to the caller (its Dataset is handed to HF datasets,
reference: src/bespokelabs/curator/llm/llm.py:288-309); these
operators make that hand-off a first-class distributed step.

Scale shapes:
* render_chatml — per-turn offsets are a bounded window over conv_id
  (frame size = conversation length, the q55 justification: turns per
  conversation are O(10^2-10^3) by construction, never corpus-sized),
  plus ONE map-side-combinable groupBy(conv_id) for the conversation
  fingerprint, joined back on the same key (AQE co-locates the two
  exchanges). Nothing corpus-wide, no Python.
* dedup_response_openers — groupBy(fingerprint) aggregate with
  min(struct) canonical election + an equi-join back: deliberately NOT
  two windows over the fingerprint, because a hyper-common response
  opener ("Sure, here is...") is exactly the hot key that would
  single-task a window partition at 10^12 turns; the agg form is
  map-side combined and the join fans the k-row result back out.
* refusal_stats — a narrow codegen'd projection per turn plus ONE
  groupBy(conv_id); the lexicon compiles into a single regex literal
  (no UDF, no per-row Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["render_chatml", "dedup_response_openers", "refusal_stats",
           "REFUSAL_MARKERS"]

# Placeholder refusal/boilerplate phrases (the SLUR_LEXICON precedent,
# rules.py:30 — the fixture corpus embeds common-word phrases, real
# deployments swap in "i cannot", "as an ai", ...). Plain literals,
# no regex metacharacters, so Spark's Java regex and the oracle's RE2
# compile identically.
REFUSAL_MARKERS = ("slow merge", "big query", "table scan")


def _piece(role: Column, text: Column) -> Column:
    """One turn's rendered chat-template segment:
    <|role|>\\ntext<|end|>\\n — NULL role/text render as empty (the
    template stays well-formed, offsets stay exact)."""
    return F.concat(F.lit("<|"), F.coalesce(role, F.lit("")),
                    F.lit("|>\n"), F.coalesce(text, F.lit("")),
                    F.lit("<|end|>\n"))


def render_chatml(turns: DataFrame,
                  target_role: str = "assistant") -> DataFrame:
    """Chat-template rendering with loss-mask spans: each conversation's
    turns (in turn_idx order) concatenate into one training string;
    each turn reports its [start_char, end_char) offsets in that
    string plus is_target (role == target_role — the spans a trainer
    unmasks for loss). The full rendered string is surfaced as a
    conversation-level md5 fingerprint on every row (the driver
    canonicalizer compares scalars; the string itself is
    reconstructable from the pieces).

    Offsets are CHARACTER offsets (Spark `length` == DuckDB `length`
    == code points); a byte-offset variant is `octet_length` in both
    engines if a tokenizer needs bytes.
    """
    pieces = turns.select(
        "conv_id", "turn_idx", "role",
        _piece(F.col("role"), F.col("text")).alias("piece"))
    w = (Window.partitionBy("conv_id").orderBy("turn_idx")
         .rowsBetween(Window.unboundedPreceding, -1))
    with_off = pieces.select(
        "conv_id", "turn_idx", "role", "piece",
        F.coalesce(F.sum(F.length("piece")).over(w),
                   F.lit(0)).cast("long").alias("start_char"))
    rendered = (pieces.groupBy("conv_id")
                .agg(F.md5(F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(
                            F.struct("turn_idx", "piece"))),
                        lambda s: s["piece"]),
                    "")).alias("render_fp"),
                    F.count(F.lit(1)).alias("conv_n_turns")))
    return (with_off.join(rendered, "conv_id")
            .select("conv_id", "turn_idx", "role", "start_char",
                    (F.col("start_char")
                     + F.length("piece")).cast("long").alias("end_char"),
                    (F.col("role") == target_role).alias("is_target"),
                    "render_fp", "conv_n_turns"))


def dedup_response_openers(turns: DataFrame, n_tokens: int = 4,
                           role: str = "assistant") -> DataFrame:
    """Cross-conversation dedup of synthetic assistant responses by
    normalized opening n-gram — the boilerplate-opener axis
    ("Sure, here is the code you asked for..."): responses whose first
    `n_tokens` whitespace tokens match after lowercase/whitespace
    normalization share a fingerprint; the globally first occurrence
    (min (conv_id, turn_idx)) is canonical and every later copy is
    flagged dup. Emits one row per `role` turn: (conv_id, turn_idx,
    opener_fp, n_copies, dup).

    Canonical election is groupBy(fp).agg(min(struct), count) + an
    equi-join back — NOT a window over fp (a hot opener would
    single-task its window partition at scale; the agg combines
    map-side and the join fans the k-row winners back out)."""
    resp = turns.filter(F.col("role") == role)
    norm = F.trim(F.regexp_replace(
        F.lower(F.coalesce(F.col("text"), F.lit(""))), r"\s+", " "))
    opener = F.array_join(F.slice(F.split(norm, " "), 1, n_tokens), " ")
    keyed = resp.select("conv_id", "turn_idx",
                        F.md5(opener).alias("opener_fp"))
    winners = keyed.groupBy("opener_fp").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min(F.struct("conv_id", "turn_idx")).alias("first"))
    return (keyed.join(winners, "opener_fp")
            .select("conv_id", "turn_idx", "opener_fp", "n_copies",
                    (~((F.col("conv_id") == F.col("first.conv_id"))
                       & (F.col("turn_idx") == F.col("first.turn_idx"))))
                    .alias("dup")))


def refusal_stats(turns: DataFrame,
                  markers: tuple[str, ...] = REFUSAL_MARKERS,
                  max_refusal_permille: int = 500,
                  role: str = "assistant") -> DataFrame:
    """Refusal/boilerplate scoring of assistant turns (the
    synthetic-data counterpart of the Gopher rules: a model that
    answered "I cannot help with that" taught the student nothing):
    per conversation, how many `role` turns match any marker phrase,
    as an exact integer permille of the conversation's `role` turns,
    plus the keep decision (refusal_permille <= threshold). The
    lexicon compiles to ONE regex literal evaluated JVM-side; permille
    is integer `div` so both engines agree bit-exactly (no float
    ratio). One narrow projection + one groupBy(conv_id)."""
    pat = "(" + "|".join(markers) + ")"
    is_role = F.col("role") == role
    hit = is_role & F.lower(F.coalesce(F.col("text"),
                                       F.lit(""))).rlike(pat)
    agg = (turns.groupBy("conv_id").agg(
        F.sum(is_role.cast("long")).alias("n_role_turns"),
        F.sum(hit.cast("long")).alias("n_refusal")))
    permille = F.when(
        F.col("n_role_turns") > 0,
        F.expr("(n_refusal * 1000) div n_role_turns")).otherwise(F.lit(0))
    return agg.select(
        "conv_id", "n_role_turns", "n_refusal",
        permille.cast("long").alias("refusal_permille"),
        (permille <= max_refusal_permille).alias("keep"))
