"""Pure-pandas reference pipeline — the "reference labels" the Spark
pipeline must match at F1>=0.99 with exact scrubbed-text equality
(BASELINE.json metric; SURVEY.md §5 rebuild test strategy, mirroring the
reference's golden-output style at tests/integrations/test_all.py:55-58).

Turn scoring is shared verbatim with the Spark path
(curator_spark.scoring); the conversation-level orchestration here is an
INDEPENDENT single-threaded pandas implementation (groupby/transform)
checked against Spark's salted two-phase groupBy + join by the tests.
"""

from __future__ import annotations

import pandas as pd

from .. import rules, scoring


def _conv_majority_lang(langs: pd.Series) -> str:
    """Majority vote with deterministic tie-break: (count desc, lang asc)."""
    counts = langs.value_counts()
    best = counts.max()
    return sorted(counts[counts == best].index)[0]


def run_oracle(pdf: pd.DataFrame) -> pd.DataFrame:
    """Full pipeline on a pandas transcripts frame → output frame in
    stable (conv_id, turn_idx) order with all OUTPUT_SCHEMA columns."""
    df = pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    df = scoring.score_turn_batch(df)

    # --- structure validation -------------------------------------------
    role = df["role"].fillna("")
    df["role_valid"] = role.isin(rules.VALID_ROLES) & (
        (role != "system") | (df["turn_idx"] == 0)
    )
    g = df.groupby("conv_id", sort=False)
    first_role = g["role"].transform("first")
    invalid_frac = 1.0 - g["role_valid"].transform("mean")
    df["structure_ok"] = (
        invalid_frac <= rules.MAX_INVALID_ROLE_FRAC
    ) & first_role.isin(["system", "user"])

    # --- conversation-level aggregates -----------------------------------
    df["conv_n_turns"] = g["ppl"].transform("size").astype("int64")
    df["conv_mean_ppl"] = g["ppl"].transform("mean").round(6)
    df["conv_lang"] = g["lang"].transform(_conv_majority_lang)
    is_assistant = (role == "assistant").astype("int64")
    is_ua = role.isin(["user", "assistant"]).astype("int64")
    conv_assistant = is_assistant.groupby(df["conv_id"], sort=False).transform("sum")
    conv_ua = is_ua.groupby(df["conv_id"], sort=False).transform("sum")
    df["role_balance"] = (conv_assistant / conv_ua.clip(lower=1)).round(6)

    lo, hi = rules.CONV_ROLE_BALANCE_RANGE
    df["conv_pass"] = (
        (df["conv_n_turns"] >= rules.CONV_MIN_TURNS)
        & (df["conv_mean_ppl"] <= rules.CONV_MAX_MEAN_PPL)
        & df["conv_lang"].isin(rules.ALLOWED_LANGS)
        & (df["role_balance"] >= lo)
        & (df["role_balance"] <= hi)
    )

    # --- final keep -------------------------------------------------------
    df["keep"] = (
        df["turn_pass"] & df["role_valid"] & df["structure_ok"] & df["conv_pass"]
    )
    return df
