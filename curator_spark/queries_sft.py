"""SFT/RLHF export query battery (operators/sft.py) with DuckDB
oracles — chat-template rendering with loss-mask spans, synthetic
assistant-response opener dedup, and refusal/boilerplate scoring, all
over the same documents → transcripts derivation the flagship and q55
use (the oracle replays that derivation as a CTE, so the whole chain
from corpus text to training-format offsets is hash-verified)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .ingest import docs_to_transcripts
from .operators.sft import (REFUSAL_MARKERS, dedup_response_openers,
                            refusal_stats, render_chatml)

OPENER_TOKENS = 4
REFUSAL_MAX_PERMILLE = 500


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

ORACLES: dict[str, str] = {
    "q96_chat_template": _Q96_SQL,
    "q97_response_opener_dedup": _Q97_SQL,
    "q98_refusal_filter": _Q98_SQL,
}

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q96_chat_template": q96_chat_template,
    "q97_response_opener_dedup": q97_response_opener_dedup,
    "q98_refusal_filter": q98_refusal_filter,
}
