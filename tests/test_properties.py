"""Property-based tests (hypothesis): the invariants the exact-match
gate depends on.

1. Batch-boundary invariance — scoring a series in one batch equals
   scoring any split of it (the reduceat/sentinel vectorization must
   not leak state across rows; Spark batches arbitrarily).
2. Unicode robustness — scorers never throw and keep their contracts
   on arbitrary text (astral chars, NULs, whitespace soup).
3. Scrub idempotence on the replacement tokens — scrubbing already
   scrubbed text never rewrites placeholders.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings, strategies as st

from curator_spark import rules, scoring
from curator_spark.models import langid, ngram_lm

TEXT = st.text(max_size=400)
TEXTS = st.lists(TEXT, min_size=1, max_size=24)


@settings(max_examples=60, deadline=None)
@given(TEXTS, st.integers(min_value=1, max_value=23))
def test_batch_split_invariance(texts, cut):
    cut = min(cut, len(texts))
    s = pd.Series(texts)
    whole = scoring.score_text_series(s)
    a = scoring.score_text_series(pd.Series(texts[:cut]))
    b = scoring.score_text_series(pd.Series(texts[cut:]))
    recombined = pd.concat([a, b], ignore_index=True)
    for col in ("lang", "ppl", "scrubbed_text", "turn_pass", "n_tokens"):
        lhs = whole[col].reset_index(drop=True)
        assert lhs.equals(recombined[col]), col
    # lang_conf: float32 gather sums differ at the last ulp only
    assert (abs(whole["lang_conf"].to_numpy()
                - recombined["lang_conf"].to_numpy()) < 1e-5).all()


@settings(max_examples=80, deadline=None)
@given(TEXT)
def test_scorers_total_on_arbitrary_unicode(text):
    lang, conf = langid.get_model().classify(text)
    assert lang in (*langid.LANGS, langid.UNKNOWN)
    assert 0.0 <= conf <= 1.0
    ppl = ngram_lm.get_model().perplexity(text)
    assert 0.0 < ppl <= ngram_lm.MAX_PPL


@settings(max_examples=60, deadline=None)
@given(TEXTS)
def test_scrub_idempotent(texts):
    s = pd.Series(texts)
    once, flags1 = rules.scrub_series(s)
    twice, flags2 = rules.scrub_series(once)
    assert once.reset_index(drop=True).equals(twice.reset_index(drop=True))


@settings(max_examples=40, deadline=None)
@given(TEXTS)
def test_score_columns_complete(texts):
    out = scoring.score_text_series(pd.Series(texts))
    assert list(out.columns) == [c for c, _ in scoring.SCORE_COLUMNS]
    assert len(out) == len(texts)
    assert out["rule_flags"].map(lambda x: isinstance(x, list)).all()
