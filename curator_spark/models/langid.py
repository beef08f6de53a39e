"""fastText-style character n-gram language identifier.

A tiny multinomial Naive-Bayes over char trigrams, trained at import
time on the deterministic seed corpora (corpus.training_corpus). The
model is a pure function of embedded constants, so driver, executors,
and the pandas oracle all reconstruct bit-identical profiles — the
Spark-side pattern is still "model built once per executor process and
reused across Arrow batches" (the analogue of the reference loading a
vLLM model once per chunk, reference: src/bespokelabs/curator/
request_processor/offline/vllm_offline_request_processor.py:43-54).

Scoring is exposed both per-string and vectorized over a pandas Series;
the vectorized path is what runs inside `mapInPandas`.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np
import pandas as pd

from .corpus import LANGS, training_corpus

_ORDER = 3
_MIN_CHARS = 12  # below this, classification is unreliable → ("und", 0.0)
UNKNOWN = "und"


def _trigrams(text: str):
    t = f"  {text.lower()}  "
    return (t[i : i + _ORDER] for i in range(len(t) - _ORDER + 1))


class LangIdModel:
    """Char-trigram NB profiles: lang -> {trigram: logprob}, plus a
    per-lang unseen-trigram floor."""

    def __init__(self) -> None:
        self.logprob: dict[str, dict[str, float]] = {}
        self.floor: dict[str, float] = {}
        for lang in LANGS:
            counts: dict[str, int] = {}
            for g in _trigrams(training_corpus(lang)):
                counts[g] = counts.get(g, 0) + 1
            total = sum(counts.values())
            vocab = len(counts) + 1
            denom = math.log(total + vocab)
            self.logprob[lang] = {
                g: math.log(c + 1) - denom for g, c in counts.items()
            }
            self.floor[lang] = -denom  # log(1/(total+vocab)) = add-one unseen mass

    def classify(self, text: str) -> tuple[str, float]:
        """Return (lang, confidence). confidence = posterior of best lang
        under a uniform prior over LANGS, normalized per-trigram."""
        if text is None or len(text.strip()) < _MIN_CHARS:
            return (UNKNOWN, 0.0)
        grams = list(_trigrams(text.strip()))
        if not grams:
            return (UNKNOWN, 0.0)
        n = len(grams)
        scores = np.empty(len(LANGS))
        for i, lang in enumerate(LANGS):
            lp, fl = self.logprob[lang], self.floor[lang]
            scores[i] = sum(lp.get(g, fl) for g in grams) / n
        # softmax over per-trigram mean logprobs -> calibrated-ish confidence
        scores = scores * 8.0  # sharpen: mean-logprob gaps are small
        m = scores.max()
        p = np.exp(scores - m)
        p /= p.sum()
        best = int(p.argmax())
        return (LANGS[best], float(round(p[best], 6)))

    def classify_series(self, s: pd.Series) -> tuple[pd.Series, pd.Series]:
        """Vectorized over a pandas Series (one Python call per Arrow
        batch, not per Spark row)."""
        out = [self.classify(t if isinstance(t, str) else "") for t in s]
        langs = pd.Series([o[0] for o in out], index=s.index, dtype="object")
        confs = pd.Series([o[1] for o in out], index=s.index, dtype="float64")
        return langs, confs


@lru_cache(maxsize=1)
def get_model() -> LangIdModel:
    """Executor-singleton accessor: built once per Python worker process,
    reused across all Arrow batches that worker scores."""
    return LangIdModel()
