"""KenLM-style character n-gram language model for perplexity scoring.

Order-3 char LM with add-one smoothing, trained at import time on the
deterministic English seed corpus. Pure function of embedded constants →
bit-identical on driver, executors, and the pandas oracle. Scores are a
pure function of a single turn's text (no cross-row state), so results
are invariant to Spark partitioning — a hard requirement for the
F1/exact-match gate (SURVEY.md §7 "Hard parts").
"""

from __future__ import annotations

import math
from functools import lru_cache

import pandas as pd

from .corpus import training_corpus

_ORDER = 3
_BOS = "\x02"
MAX_PPL = 1e6  # cap, also used for empty/degenerate text


class NGramLM:
    def __init__(self, text: str) -> None:
        ctx_counts: dict[str, int] = {}
        full_counts: dict[str, int] = {}
        vocab: set[str] = set()
        t = _BOS * (_ORDER - 1) + text.lower()
        for i in range(_ORDER - 1, len(t)):
            ctx = t[i - _ORDER + 1 : i]
            full = ctx + t[i]
            ctx_counts[ctx] = ctx_counts.get(ctx, 0) + 1
            full_counts[full] = full_counts.get(full, 0) + 1
            vocab.add(t[i])
        self.ctx_counts = ctx_counts
        self.full_counts = full_counts
        self.v = len(vocab) + 1

    def logprob_char(self, ctx: str, ch: str) -> float:
        c_full = self.full_counts.get(ctx + ch, 0)
        c_ctx = self.ctx_counts.get(ctx, 0)
        return math.log((c_full + 1) / (c_ctx + self.v))

    def perplexity(self, text: str) -> float:
        if not isinstance(text, str) or not text.strip():
            return MAX_PPL
        t = _BOS * (_ORDER - 1) + text.lower()
        total, n = 0.0, 0
        for i in range(_ORDER - 1, len(t)):
            total += self.logprob_char(t[i - _ORDER + 1 : i], t[i])
            n += 1
        if n == 0:
            return MAX_PPL
        return float(round(min(math.exp(-total / n), MAX_PPL), 6))

    def perplexity_series(self, s: pd.Series) -> pd.Series:
        """Vectorized over a pandas Series (one call per Arrow batch)."""
        return pd.Series([self.perplexity(t) for t in s],
                         index=s.index, dtype="float64")


@lru_cache(maxsize=1)
def get_model() -> NGramLM:
    """Executor-singleton accessor (one build per Python worker)."""
    return NGramLM(training_corpus("en", n_sentences=600, seed=777))
