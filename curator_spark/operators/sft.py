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
           "build_preference_pairs", "dedup_conversation_prefixes",
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


def _norm(text: Column) -> Column:
    """Lowercase + whitespace-collapse normalization (the q97 form —
    both engines' regex semantics agree on \\s+)."""
    return F.trim(F.regexp_replace(
        F.lower(F.coalesce(text, F.lit(""))), r"\s+", " "))


def build_preference_pairs(turns: DataFrame, n_prompt_tokens: int = 4,
                           markers: tuple[str, ...] = REFUSAL_MARKERS,
                           refusal_penalty: int = 1000,
                           role: str = "assistant") -> DataFrame:
    """RLHF preference-pair construction: `role` turns answering the
    same prompt (keyed by the normalized opening `n_prompt_tokens`-gram
    of the immediately preceding turn — sampled generations for one
    prompt family land in one group) are ranked by an integer quality
    score (response token count, minus `refusal_penalty` per refusal
    hit); each group with >=2 candidates and a strict score gap emits
    ONE pair: (chosen, rejected) = (best, worst).

    Election is groupBy(prompt_fp).agg(max(struct), min(struct)) — the
    same hot-key defense as dedup_response_openers: a viral prompt
    ("write a poem") with 10^7 sampled responses is map-side-combined
    into one row, never a single-task window partition. Struct order
    (score, conv_id, turn_idx) makes ties bit-deterministic.

    The preceding-turn lookup is a lag over conv_id ordered by
    turn_idx — a bounded per-conversation window (frame = conversation
    length), never corpus-wide."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev_text = F.lag("text").over(w)
    norm_resp = _norm(F.col("text"))
    pat = "(" + "|".join(markers) + ")"
    score = (F.size(F.filter(F.split(norm_resp, " "), lambda t: t != ""))
             .cast("long")
             - F.lit(refusal_penalty)
             * norm_resp.rlike(pat).cast("long"))
    cand = (turns
            .select("conv_id", "turn_idx", "role", "text",
                    prev_text.alias("prev_text"))
            .filter((F.col("role") == role) & F.col("prev_text").isNotNull())
            .select(
                F.md5(F.array_join(
                    F.slice(F.split(_norm(F.col("prev_text")), " "),
                            1, n_prompt_tokens), " ")).alias("prompt_fp"),
                "conv_id", "turn_idx", score.alias("score")))
    sc = F.struct("score", "conv_id", "turn_idx")
    pairs = cand.groupBy("prompt_fp").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.max(sc).alias("chosen"), F.min(sc).alias("rejected"))
    return (pairs
            .filter((F.col("n_candidates") >= 2)
                    & (F.col("chosen.score") > F.col("rejected.score")))
            .select("prompt_fp", "n_candidates",
                    F.col("chosen.conv_id").alias("chosen_conv"),
                    F.col("chosen.turn_idx").alias("chosen_turn"),
                    F.col("chosen.score").alias("chosen_score"),
                    F.col("rejected.conv_id").alias("rejected_conv"),
                    F.col("rejected.turn_idx").alias("rejected_turn"),
                    F.col("rejected.score").alias("rejected_score")))


def dedup_conversation_prefixes(turns: DataFrame) -> DataFrame:
    """Conversation prefix-dedup — the agent-transcript retry/extension
    pattern: a session that was re-run and continued further produces a
    shorter conversation whose rendered turns are EXACTLY the first L
    turns of a longer one. Emits one row per conversation: (conv_id,
    n_turns, n_sharing = conversations whose first-n_turns render
    identically, dup, canonical_conv_id). Canonical per prefix bucket =
    the longest conversation (most informative continuation), ties by
    min conv_id; exact-duplicate conversations degenerate to min
    conv_id canonical.

    Shape: cumulative render fingerprints are computed INSIDE each
    conversation (groupBy(conv_id) collect + transform over prefix
    slices — bounded by conversation length, the q55 invariant; no
    window-order trust), then ONE map-side-combined
    groupBy(turn_pos, prefix_fp) election + an equi-join back on the
    full-conversation rows. A 10^7-way duplicated conversation is one
    reduced row, never a single-task partition."""
    pieces = turns.select(
        "conv_id", "turn_idx",
        _piece(F.col("role"), F.col("text")).alias("piece"))
    per_conv = pieces.groupBy("conv_id").agg(
        F.transform(F.array_sort(F.collect_list(
            F.struct("turn_idx", "piece"))),
            lambda s: s["piece"]).alias("arr"))
    prefixes = per_conv.select(
        "conv_id", F.size("arr").cast("int").alias("conv_len"),
        F.posexplode(F.transform(
            F.col("arr"),
            lambda _, i: F.md5(F.array_join(
                F.slice(F.col("arr"), 1, i + 1), ""))))
        .alias("pos0", "prefix_fp"),
    ).select("conv_id", "conv_len",
             (F.col("pos0") + 1).cast("int").alias("turn_pos"),
             "prefix_fp")
    winners = prefixes.groupBy("turn_pos", "prefix_fp").agg(
        F.count(F.lit(1)).alias("n_sharing"),
        F.min(F.struct((-F.col("conv_len")).alias("neg_len"),
                       "conv_id")).alias("best"))
    full = (prefixes.filter(F.col("turn_pos") == F.col("conv_len"))
            .select("conv_id", "turn_pos", "prefix_fp"))
    return (full.join(winners, ["turn_pos", "prefix_fp"])
            .select("conv_id",
                    F.col("turn_pos").alias("n_turns"),
                    "prefix_fp", "n_sharing",
                    (F.col("conv_id") != F.col("best.conv_id"))
                    .alias("dup"),
                    F.col("best.conv_id").alias("canonical_conv_id")))


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
