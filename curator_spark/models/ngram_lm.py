"""KenLM-style character n-gram language model for perplexity scoring —
fully vectorized.

Order-3 char LM with add-one smoothing, trained at import time on the
deterministic English seed corpus. Pure function of embedded constants →
identical on driver, executors, and the pandas oracle. Scores are a pure
function of a single turn's text (no cross-row state), so results are
invariant to Spark partitioning — a hard requirement for the
F1/exact-match gate (SURVEY.md §7 "Hard parts").

Same batch-vectorization scheme as langid: LUT → trigram ids → one
dense log-prob table → np.add.reduceat per text, sentinel-separated.
log P(c | ab) = log(count3(abc)+1) − log(count2(ab)+V); unseen contexts
and out-of-alphabet chars fall out of the same formula with zero counts,
matching a dict-with-default implementation exactly.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np
import pandas as pd

from .corpus import training_corpus
from .langid import _codes_lut, _text_codes, _trigram_ids

_ORDER = 3
_BOS = "\x02"
_SENTINEL = "\x01"
MAX_PPL = 1e6  # cap, also used for empty/degenerate text


class NGramLM:
    def __init__(self, text: str) -> None:
        t = _BOS * (_ORDER - 1) + text.lower()
        chars = sorted(set(t))
        self._A = len(chars) + 2          # 0 = OOV, last = sentinel
        self._sent = self._A - 1
        self._lut = _codes_lut(chars, self._sent)
        A = self._A
        codes = _text_codes(t, self._lut)
        ids = _trigram_ids(codes, A)
        c3 = np.bincount(ids, minlength=A * A * A).astype(np.float64)
        c2 = c3.reshape(A * A, A).sum(axis=1)           # ctx counts
        # smoothing constant: emitted-vocab size + 1 (emitted = chars at
        # window position 3, i.e. everything after the BOS prefix)
        self.v = len(set(t[_ORDER - 1:])) + 1
        T = np.log(c3 + 1.0) - np.repeat(np.log(c2 + self.v), A)
        idx = np.arange(A * A * A)
        touches = ((idx // (A * A) == self._sent)
                   | ((idx // A) % A == self._sent)
                   | (idx % A == self._sent))
        T[touches] = 0.0
        self._T = T

    def perplexity_series(self, s: pd.Series) -> pd.Series:
        """Vectorized over a pandas Series — one numpy pass per batch."""
        texts = [t if isinstance(t, str) else "" for t in s]
        prefixed = [_BOS * (_ORDER - 1) + t.lower() for t in texts]
        if not prefixed:
            return pd.Series([], index=s.index, dtype="float64")
        joined = (_SENTINEL * 2).join(prefixed)
        codes = _text_codes(joined, self._lut)
        ids = _trigram_ids(codes, self._A)
        if ids.size == 0:  # every text empty → no windows at all
            return pd.Series([MAX_PPL] * len(texts), index=s.index,
                             dtype="float64")
        lens = np.array([len(p) for p in prefixed], dtype=np.int64)
        starts = np.zeros(len(prefixed), dtype=np.int64)
        np.cumsum(lens[:-1] + 2, out=starts[1:])
        n = lens - (_ORDER - 1)
        sums = np.add.reduceat(self._T[ids], np.minimum(starts, len(ids) - 1),
                               axis=0)
        with np.errstate(over="ignore"):
            ppl = np.exp(-sums / np.maximum(n, 1))
        ppl = np.round(np.minimum(ppl, MAX_PPL), 6)
        degenerate = np.array([not t.strip() for t in texts])
        ppl[degenerate] = MAX_PPL
        return pd.Series(ppl, index=s.index, dtype="float64")

    def perplexity(self, text: str) -> float:
        """Single-string convenience wrapper over the batch path."""
        return float(self.perplexity_series(pd.Series([text])).iloc[0])


@lru_cache(maxsize=1)
def get_model() -> NGramLM:
    """Executor-singleton accessor (one build per Python worker)."""
    return NGramLM(training_corpus("en", n_sentences=600, seed=777))
