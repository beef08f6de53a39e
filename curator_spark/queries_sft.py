"""SFT/RLHF export query battery (operators/sft.py) with DuckDB
oracles — chat-template rendering with loss-mask spans, synthetic
assistant-response opener dedup, and refusal/boilerplate scoring, all
over the same documents → transcripts derivation the flagship and q55
use (the oracle replays that derivation as a CTE, so the whole chain
from corpus text to training-format offsets is hash-verified)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import Window, functions as F

from .ingest import docs_to_transcripts
from .operators.sft import (REFUSAL_MARKERS, build_preference_pairs,
                            dedup_conversation_prefixes,
                            dedup_response_openers, refusal_stats,
                            render_chatml)

OPENER_TOKENS = 4
REFUSAL_MAX_PERMILLE = 500
REFUSAL_PENALTY = 1000


def _turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs_to_transcripts(docs)


def q96_chat_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chat-template rendering with loss-mask spans
    (operators/sft.render_chatml): each conversation renders to one
    training string; every turn reports its [start_char, end_char)
    offsets and is_target (assistant spans — what the trainer unmasks),
    plus the conversation-level render fingerprint. The SFT export
    step between curation and the tokenizer. Plan: one bounded window
    over conv_id (frame = conversation length) + one
    map-side-combined groupBy(conv_id) joined back on the same key;
    no Python, no corpus-wide state. Oracle replays the template,
    running-offset window, and ordered string_agg fingerprint in
    DuckDB."""
    return render_chatml(_turns(spark, sf_dir))


def q97_response_opener_dedup(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Cross-conversation assistant-response opener dedup
    (operators/sft.dedup_response_openers): responses sharing a
    normalized opening 4-gram share a fingerprint; the globally first
    (min (conv_id, turn_idx)) is canonical, later copies flag dup —
    the boilerplate-opener axis of synthetic-data dedup. Plan:
    groupBy(fp) agg + equi-join back (hot-opener-safe: no window over
    fp). Oracle = the window formulation (count + row_number over fp),
    exact at oracle scale, proving the agg+join plan elects identical
    canonicals."""
    return dedup_response_openers(_turns(spark, sf_dir),
                                  n_tokens=OPENER_TOKENS)


def q98_refusal_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Refusal/boilerplate conversation filter
    (operators/sft.refusal_stats): per conversation, the exact integer
    permille of assistant turns matching the refusal lexicon (ONE
    compiled regex, JVM-side) and the keep decision — the
    synthetic-data quality gate that drops conversations whose
    assistant mostly refused. Plan: narrow projection + one
    groupBy(conv_id). Oracle inlines the same lexicon via
    regexp_matches with integer-division permille."""
    return refusal_stats(_turns(spark, sf_dir),
                         max_refusal_permille=REFUSAL_MAX_PERMILLE)


def q99_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RLHF preference-pair construction
    (operators/sft.build_preference_pairs): assistant turns answering
    the same prompt family (normalized opening 4-gram of the preceding
    turn) are ranked by an integer quality score (response tokens minus
    a refusal penalty); each >=2-candidate group with a strict gap
    emits ONE (chosen, rejected) pair. Plan: bounded per-conversation
    lag + groupBy(prompt_fp) max/min(struct) election — a viral prompt
    is one map-side-combined row, never a window partition. Oracle =
    the double row_number window formulation, proving the agg election
    picks identical extremes."""
    return build_preference_pairs(_turns(spark, sf_dir),
                                  n_prompt_tokens=OPENER_TOKENS,
                                  refusal_penalty=REFUSAL_PENALTY)


def _with_truncated_variants(t: DataFrame) -> DataFrame:
    """Each conversation twice: ':f' = all turns, ':h' = the first
    ceil(n/2) turns — the deterministic retry/extension fixture (every
    ':h' is a strict rendered prefix of its ':f')."""
    w = Window.partitionBy("conv_id")
    t2 = t.withColumn("conv_len", F.count(F.lit(1)).over(w))
    full = t2.select(F.concat("conv_id", F.lit(":f")).alias("conv_id"),
                     "turn_idx", "role", "text")
    half = (t2.filter(F.col("turn_idx") < F.ceil(F.col("conv_len") / 2))
            .select(F.concat("conv_id", F.lit(":h")).alias("conv_id"),
                    "turn_idx", "role", "text"))
    return full.unionByName(half)


def q100_prefix_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation prefix-dedup
    (operators/sft.dedup_conversation_prefixes) over a corpus where
    every conversation also appears truncated to its first half (the
    agent-transcript retry/extension pattern): the truncation's full
    render equals the first L turns of the original, so it's flagged
    dup with the original as canonical; single-turn conversations'
    halves are exact duplicates (min conv_id canonical). Plan:
    per-conversation cumulative fingerprints (bounded transform, no
    window-order trust) + ONE map-side-combined groupBy(turn_pos,
    prefix_fp) election joined back. Oracle replays cumulative
    string_agg windows + row_number election."""
    return dedup_conversation_prefixes(
        _with_truncated_variants(_turns(spark, sf_dir)))


TS_BASE = 1_700_000_000
TS_JITTER_MOD = 45
LONG_PAUSE_S = 90


def _bucket(tag: str):
    """Engine-invariant per-turn hash (the q40 idiom): first 8 hex of
    md5(conv_id:turn_idx:tag) as a long."""
    return F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.col("conv_id"), F.col("turn_idx").cast("string"),
        F.lit(tag))), 1, 8), 16, 10).cast("long")


def _with_tools(t: DataFrame) -> DataFrame:
    """Deterministic tool enrichment for the documents-derived
    transcripts (whose tool column is NULL): 2/3 of assistant turns
    invoke one of four tools, drawn from the turn's md5 — a pure
    function of (conv_id, turn_idx), replayed verbatim by the oracle.
    Real transcript tables (the fixtures, coerce_to_transcripts inputs)
    carry tool natively; the operator takes it as given."""
    b = _bucket("tool")
    return t.withColumn(
        "tool",
        F.when((F.col("role") == "assistant") & (b % 3 != 0),
               F.concat(F.lit("tool_"), (b % 4).cast("string"))))


def q101_tool_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agent tool-transition matrix
    (operators/trajectory.tool_transitions): every tool invocation
    pairs with the previous tool in its conversation ('<start>' for
    the first) and each (src, dst) edge is counted — k² rows however
    large the corpus, the structure trajectory-quality filters act on.
    Plan: narrow filter + bounded per-conv lag + ONE map-side-combined
    groupBy. Oracle replays the md5 tool draw and the lag window."""
    from .operators.trajectory import tool_transitions
    return tool_transitions(_with_tools(_turns(spark, sf_dir)))


def q102_response_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation response-latency profile
    (operators/trajectory.response_latency): assistant-turn latency =
    ts minus the previous turn's ts in integer epoch seconds
    (deterministic md5-jittered timestamps: base + 60·turn_idx +
    md5 % 45); one row per conversation with n_responses,
    sum/max latency and long-pause count — the stalled/runaway-session
    quality axis. Plan: bounded per-conv lag + ONE map-side-combined
    groupBy(conv_id). Oracle replays the jitter arithmetic and lag."""
    from .operators.trajectory import response_latency
    t = _turns(spark, sf_dir).withColumn(
        "ts", F.timestamp_seconds(
            F.lit(TS_BASE) + F.col("turn_idx").cast("long") * 60
            + _bucket("ts") % TS_JITTER_MOD))
    return response_latency(t, long_pause_s=LONG_PAUSE_S)


# --- oracles -----------------------------------------------------------

# documents → transcripts derivation (the q55 CTE: 12-token turns,
# user/assistant alternating), with turn TEXT and role this time.
_TURNS_SQL = """
    toks AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), t -> t <> '') AS toks
        FROM documents
    ),
    turns AS (
        SELECT 'doc-' || lpad(doc_id::VARCHAR, 10, '0') AS conv_id,
               CAST(i - 1 AS INTEGER) AS turn_idx,
               CASE WHEN (i - 1) % 2 = 0 THEN 'user'
                    ELSE 'assistant' END AS role,
               array_to_string(toks[(i-1)*12+1 : i*12], ' ') AS text
        FROM toks,
             unnest(range(1, greatest(CAST(ceil(len(toks) * 1.0 / 12) AS INT),
                                      1) + 1)) AS u(i)
    )
"""

_Q96_SQL = f"""
    WITH {_TURNS_SQL},
    pieces AS (
        SELECT conv_id, turn_idx, role,
               '<|' || coalesce(role, '') || '|>' || chr(10)
               || coalesce(text, '') || '<|end|>' || chr(10) AS piece
        FROM turns
    ),
    off AS (
        SELECT conv_id, turn_idx, role, piece,
               CAST(coalesce(sum(length(piece)) OVER (
                   PARTITION BY conv_id ORDER BY turn_idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS start_char
        FROM pieces
    ),
    fp AS (
        SELECT conv_id,
               md5(string_agg(piece, '' ORDER BY turn_idx)) AS render_fp,
               CAST(count(*) AS BIGINT) AS conv_n_turns
        FROM pieces GROUP BY conv_id
    )
    SELECT o.conv_id, o.turn_idx, o.role, o.start_char,
           CAST(o.start_char + length(o.piece) AS BIGINT) AS end_char,
           (o.role = 'assistant') AS is_target,
           f.render_fp, f.conv_n_turns
    FROM off o JOIN fp f USING (conv_id)
"""

_Q97_SQL = f"""
    WITH {_TURNS_SQL},
    resp AS (
        SELECT conv_id, turn_idx,
               md5(array_to_string(
                   (string_split(trim(regexp_replace(
                        lower(coalesce(text, '')), '\\s+', ' ', 'g')),
                    ' '))[1:{OPENER_TOKENS}], ' ')) AS opener_fp
        FROM turns WHERE role = 'assistant'
    )
    SELECT conv_id, turn_idx, opener_fp,
           CAST(count(*) OVER (PARTITION BY opener_fp) AS BIGINT)
               AS n_copies,
           (row_number() OVER (PARTITION BY opener_fp
                               ORDER BY conv_id, turn_idx)) > 1 AS dup
    FROM resp
"""

_MARKERS_SQL = "(" + "|".join(REFUSAL_MARKERS) + ")"

_Q98_SQL = f"""
    WITH {_TURNS_SQL},
    flags AS (
        SELECT conv_id,
               CASE WHEN role = 'assistant' THEN 1 ELSE 0 END AS is_role,
               CASE WHEN role = 'assistant'
                    AND regexp_matches(lower(coalesce(text, '')),
                                       '{_MARKERS_SQL}')
                    THEN 1 ELSE 0 END AS hit
        FROM turns
    ),
    agg AS (
        SELECT conv_id,
               CAST(sum(is_role) AS BIGINT) AS n_role_turns,
               CAST(sum(hit) AS BIGINT) AS n_refusal
        FROM flags GROUP BY conv_id
    )
    SELECT conv_id, n_role_turns, n_refusal,
           CAST(CASE WHEN n_role_turns > 0
                     THEN (n_refusal * 1000) // n_role_turns
                     ELSE 0 END AS BIGINT) AS refusal_permille,
           (CASE WHEN n_role_turns > 0
                 THEN (n_refusal * 1000) // n_role_turns
                 ELSE 0 END) <= {REFUSAL_MAX_PERMILLE} AS keep
    FROM agg
"""

# normalized text (the q97 form) as a SQL macro-ish f-string
def _norm_sql(col: str) -> str:
    return (f"trim(regexp_replace(lower(coalesce({col}, '')), "
            f"'\\s+', ' ', 'g'))")


_Q99_SQL = f"""
    WITH {_TURNS_SQL},
    lagd AS (
        SELECT conv_id, turn_idx, role, text,
               lag(text) OVER (PARTITION BY conv_id
                               ORDER BY turn_idx) AS prev_text
        FROM turns
    ),
    cand AS (
        SELECT md5(array_to_string(
                   (string_split({_norm_sql('prev_text')}, ' '))
                   [1:{OPENER_TOKENS}], ' ')) AS prompt_fp,
               conv_id, turn_idx,
               CAST(len(list_filter(
                        string_split({_norm_sql('text')}, ' '),
                        t -> t <> '')) AS BIGINT)
               - {REFUSAL_PENALTY} * CASE WHEN regexp_matches(
                     {_norm_sql('text')}, '{_MARKERS_SQL}')
                     THEN 1 ELSE 0 END AS score
        FROM lagd
        WHERE role = 'assistant' AND prev_text IS NOT NULL
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY prompt_fp
                   ORDER BY score DESC, conv_id DESC, turn_idx DESC) AS rc,
               row_number() OVER (PARTITION BY prompt_fp
                   ORDER BY score ASC, conv_id ASC, turn_idx ASC) AS rr,
               CAST(count(*) OVER (PARTITION BY prompt_fp) AS BIGINT)
                   AS n_candidates
        FROM cand
    )
    SELECT c.prompt_fp, c.n_candidates,
           c.conv_id AS chosen_conv, c.turn_idx AS chosen_turn,
           c.score AS chosen_score,
           r.conv_id AS rejected_conv, r.turn_idx AS rejected_turn,
           r.score AS rejected_score
    FROM (SELECT * FROM ranked WHERE rc = 1) c
    JOIN (SELECT * FROM ranked WHERE rr = 1) r USING (prompt_fp)
    WHERE c.n_candidates >= 2 AND c.score > r.score
"""

_Q100_SQL = f"""
    WITH {_TURNS_SQL},
    sized AS (
        SELECT *, count(*) OVER (PARTITION BY conv_id) AS conv_len
        FROM turns
    ),
    variants AS (
        SELECT conv_id || ':f' AS conv_id, turn_idx, role, text FROM sized
        UNION ALL
        SELECT conv_id || ':h' AS conv_id, turn_idx, role, text FROM sized
        WHERE turn_idx < ceil(conv_len / 2.0)
    ),
    pieces AS (
        SELECT conv_id, turn_idx,
               '<|' || coalesce(role, '') || '|>' || chr(10)
               || coalesce(text, '') || '<|end|>' || chr(10) AS piece
        FROM variants
    ),
    prefixes AS (
        SELECT conv_id,
               CAST(row_number() OVER w AS INTEGER) AS turn_pos,
               md5(string_agg(piece, '') OVER (
                   PARTITION BY conv_id ORDER BY turn_idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                   AS prefix_fp,
               CAST(count(*) OVER (PARTITION BY conv_id) AS INTEGER)
                   AS conv_len
        FROM pieces
        WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY turn_pos, prefix_fp
                   ORDER BY conv_len DESC, conv_id ASC) AS rn,
               CAST(count(*) OVER (PARTITION BY turn_pos, prefix_fp)
                    AS BIGINT) AS n_sharing
        FROM prefixes
    ),
    best AS (
        SELECT turn_pos, prefix_fp, conv_id AS canonical_conv_id,
               n_sharing
        FROM ranked WHERE rn = 1
    )
    SELECT f.conv_id, f.turn_pos AS n_turns, f.prefix_fp, b.n_sharing,
           (f.conv_id <> b.canonical_conv_id) AS dup, b.canonical_conv_id
    FROM prefixes f
    JOIN best b USING (turn_pos, prefix_fp)
    WHERE f.turn_pos = f.conv_len
"""

_BUCKET_SQL = ("('0x' || substr(md5(conv_id || ':' || turn_idx::VARCHAR "
               "|| ':{tag}'), 1, 8))::BIGINT")

_Q101_SQL = f"""
    WITH {_TURNS_SQL},
    toolcalls AS (
        SELECT conv_id, turn_idx,
               'tool_' || ({_BUCKET_SQL.format(tag='tool')} % 4)::VARCHAR
                   AS tool
        FROM turns
        WHERE role = 'assistant'
          AND {_BUCKET_SQL.format(tag='tool')} % 3 <> 0
    ),
    edges AS (
        SELECT coalesce(lag(tool) OVER (PARTITION BY conv_id
                                        ORDER BY turn_idx),
                        '<start>') AS src_tool,
               tool AS dst_tool
        FROM toolcalls
    )
    SELECT src_tool, dst_tool, CAST(count(*) AS BIGINT) AS n_transitions
    FROM edges GROUP BY src_tool, dst_tool
"""

_Q102_SQL = f"""
    WITH {_TURNS_SQL},
    stamped AS (
        SELECT conv_id, turn_idx, role,
               {TS_BASE} + CAST(turn_idx AS BIGINT) * 60
               + {_BUCKET_SQL.format(tag='ts')} % {TS_JITTER_MOD} AS ts_s
        FROM turns
    ),
    lat AS (
        SELECT conv_id, role,
               ts_s - lag(ts_s) OVER (PARTITION BY conv_id
                                      ORDER BY turn_idx) AS lat
        FROM stamped
    )
    SELECT conv_id,
           CAST(count(*) AS BIGINT) AS n_responses,
           CAST(sum(lat) AS BIGINT) AS sum_latency_s,
           CAST(max(lat) AS BIGINT) AS max_latency_s,
           CAST(sum(CASE WHEN lat > {LONG_PAUSE_S} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_long_pauses
    FROM lat
    WHERE role = 'assistant' AND lat IS NOT NULL
    GROUP BY conv_id
"""

ORACLES: dict[str, str] = {
    "q96_chat_template": _Q96_SQL,
    "q97_response_opener_dedup": _Q97_SQL,
    "q98_refusal_filter": _Q98_SQL,
    "q99_preference_pairs": _Q99_SQL,
    "q100_prefix_dedup": _Q100_SQL,
    "q101_tool_transitions": _Q101_SQL,
    "q102_response_latency": _Q102_SQL,
}

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q96_chat_template": q96_chat_template,
    "q97_response_opener_dedup": q97_response_opener_dedup,
    "q98_refusal_filter": q98_refusal_filter,
    "q99_preference_pairs": q99_preference_pairs,
    "q100_prefix_dedup": q100_prefix_dedup,
    "q101_tool_transitions": q101_tool_transitions,
    "q102_response_latency": q102_response_latency,
}


def q118_trajectory_validity(spark: SparkSession, sf_dir: str
                             ) -> DataFrame:
    """Agent-trajectory structural validity
    (operators/trajectory.trajectory_validity): per conversation —
    role-alternation violations, tool-on-wrong-role violations,
    dangling final tool call (result never arrives), turn-index gaps,
    and the composite `valid` gate a tool-use SFT export applies.
    ONE map-side-combined groupBy(conv_id), zero windows, per-conv
    state is five integers however long the conversation. Oracle
    replays the md5 tool draw and the same aggregate algebra."""
    from .operators.trajectory import trajectory_validity
    return trajectory_validity(_with_tools(_turns(spark, sf_dir)))


_Q118_SQL = f"""
    WITH {_TURNS_SQL},
    enriched AS (
        SELECT conv_id, turn_idx, role,
               CASE WHEN role = 'assistant'
                         AND {_BUCKET_SQL.format(tag='tool')} % 3 <> 0
                    THEN 'tool_'
                         || ({_BUCKET_SQL.format(tag='tool')} % 4)::VARCHAR
               END AS tool
        FROM turns
    ),
    agg AS (
        SELECT conv_id,
               CAST(count(*) AS BIGINT) AS n_turns,
               CAST(count(tool) AS BIGINT) AS n_tool_calls,
               CAST(sum(CASE WHEN role <> (CASE WHEN turn_idx % 2 = 0
                                           THEN 'user'
                                           ELSE 'assistant' END)
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS role_violations,
               CAST(sum(CASE WHEN tool IS NOT NULL
                                  AND role <> 'assistant'
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS tool_placement_violations,
               (max(CASE WHEN tool IS NOT NULL THEN turn_idx END)
                IS NOT DISTINCT FROM max(turn_idx))
                   AS dangling_tool_call,
               ((max(turn_idx) + 1 <> count(*))
                OR (min(turn_idx) <> 0)) AS idx_gaps
        FROM enriched GROUP BY conv_id
    )
    SELECT *, (role_violations = 0 AND tool_placement_violations = 0
               AND NOT dangling_tool_call AND NOT idx_gaps) AS valid
    FROM agg ORDER BY conv_id
"""

QUERIES["q118_trajectory_validity"] = q118_trajectory_validity
ORACLES["q118_trajectory_validity"] = _Q118_SQL
