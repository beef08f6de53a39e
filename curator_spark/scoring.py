"""Turn-level scoring: one pandas-batch function shared verbatim by the
Spark `mapInPandas` path and the pandas oracle.

This is the analogue of the reference's per-row payload execution
(reference: src/bespokelabs/curator/request_processor/online/
base_online_request_processor.py call_single_request), re-expressed as
a vectorized Arrow-batch transform: models are loaded once per Python
worker process (executor-singleton via lru_cache) and score whole
batches — zero per-row Spark UDF calls.

Conversation-level logic deliberately does NOT live here: the oracle
computes it with pandas groupby, the Spark pipeline with salted
two-phase groupBy — independent implementations checked against each
other by the tests.
"""

from __future__ import annotations

import pandas as pd

from . import rules
from .models import langid, ngram_lm

# Output columns appended to each turn by score_turn_batch, with dtypes.
SCORE_COLUMNS = [
    ("lang", "object"),
    ("lang_conf", "float64"),
    ("ppl", "float64"),
    ("scrubbed_text", "object"),
    ("rule_flags", "object"),   # list[str]
    ("turn_pass", "bool"),
    ("n_tokens", "int64"),      # whitespace token count (metrics + rules)
]


def score_text_series(text: pd.Series) -> pd.DataFrame:
    """Score a batch of turn texts → DataFrame with SCORE_COLUMNS.

    Pure function of the `text` column only — no cross-row state — so
    results are invariant to Spark partitioning/batching (SURVEY.md §7).
    This exact function body runs as the Spark scalar pandas UDF (only
    the text column crosses the Arrow boundary; every other column stays
    JVM-side) AND inside the pandas oracle.
    """
    lang_model = langid.get_model()
    lm = ngram_lm.get_model()

    lang, lang_conf = lang_model.classify_series(text)
    ppl = lm.perplexity_series(text)
    scrubbed, scrub_flags = rules.scrub_series(text)
    heur = rules.heuristic_flags(text, lang, ppl)

    out = pd.DataFrame(index=text.index)
    out["lang"] = lang
    out["lang_conf"] = lang_conf
    out["ppl"] = ppl
    out["scrubbed_text"] = scrubbed
    out["rule_flags"] = rules.flags_to_list(heur, scrub_flags)
    out["turn_pass"] = rules.turn_pass(heur)
    out["n_tokens"] = (
        text.fillna("").astype("object").astype("string").str.split().str.len()
        .fillna(0).astype("int64")
    )
    return out


def score_turn_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Append per-turn score columns to a batch of transcript rows
    (the pandas-oracle / whole-row entrypoint)."""
    out = pdf.copy()
    scores = score_text_series(pdf["text"])
    for col, _ in SCORE_COLUMNS:
        out[col] = scores[col]
    return out
