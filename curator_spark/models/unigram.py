"""Distributed unigram-LM tokenizer training (SentencePiece's second
family, Kudo 2018) — the EM counterpart of models/bpe.py's merge
learning, over the same Zipf-compressed distinct-word table.

Algorithm (Viterbi-EM, the hard-EM variant of Kudo's lattice EM —
documented simplification: the E-step takes each word's single best
segmentation instead of lattice posteriors, and pruning drops the
lowest-expected-count pieces instead of computing per-piece likelihood
loss; both substitutions keep the fixed-vocabulary structure and the
training loop shape, which is what the distributed formulation is
about):

1. SEED: every substring (length ≤ max_piece_len) of every distinct
   word, weighted by word count; keep the top seed_size by (count
   desc, piece asc), plus ALL single characters (coverage guarantee —
   any word stays segmentable).
2. E-STEP: per distinct word, the best segmentation under current
   piece log-probs via left-to-right Viterbi. Ties break by fewer
   pieces, then lexicographically smaller piece at the split — a total
   order, so the segmentation is unique.
3. M-STEP: piece expected counts = Σ word_count over its uses;
   log-probs recomputed on the driver.
4. PRUNE to keep_frac of the vocabulary by (count desc, piece asc),
   never dropping single characters; repeat from 2 until vocab_size.

Determinism contract: expected counts are exact int64 sums
(map-side-combinable, partitioning-independent); log-probs are Python
floats computed ON THE DRIVER from those ints in sorted piece order —
both engines (the Spark run and tools/make_golden.py's independent
replay) execute bit-identical IEEE operations in identical order, and
the Viterbi DP inside the Arrow-batched UDF is plain left-to-right
Python over the broadcast score dict, so its float adds fold in a
fixed order too. The emitted logp_micro is a rounded integer — the
committed golden is hash-exact at all three scale factors.

Scale shape per EM round: broadcast the vocab scores (a tokenizer
vocab is ~10^4-10^5 entries — executor-memory sized by construction,
the same class of broadcast as the flagship's langid model) →
mapInPandas Viterbi over the DISTINCT-word table (Zipf: 10^3-10^4×
smaller than the corpus; the corpus itself is read ONCE for word
counts) → explode piece uses → ONE map-side-combined groupBy(piece)
agg → vocab-sized int table to the driver (the Lloyd's/BPE sync
point). Rounds are fixed and few; nothing corpus-sized moves after
the first pass.

Reference parity: the reference has no tokenizer trainer — this is
beyond-parity corpus infrastructure like models/bpe.py (cited there);
together they cover both production tokenizer families.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = ["train_unigram", "seed_pieces", "viterbi_segment",
           "unigram_segment_words"]

MICRO = 1_000_000


def seed_pieces(words: DataFrame, max_piece_len: int = 4,
                seed_size: int = 512) -> DataFrame:
    """(piece, count) seed vocabulary: substring explode over the
    distinct-word table (narrow — the corpus is NOT re-read), one
    map-side-combined agg, top-`seed_size` by (count desc, piece asc)
    plus every single character. The top-k cut runs on the aggregated
    piece table (vocab-sized), so the limit's single-partition step
    handles ~10^5 rows, not the corpus."""
    w = words.select("word", F.col("cnt").alias("count"))
    subs = F.expr(
        f"""flatten(transform(sequence(1, length(word)),
              i -> transform(
                     sequence(i, least(length(word), i + {max_piece_len - 1})),
                     j -> substring(word, i, j - i + 1))))""")
    pieces = (w.select(F.explode(subs).alias("piece"),
                       F.col("count"))
              .groupBy("piece").agg(F.sum("count").alias("count")))
    singles = pieces.filter(F.length("piece") == 1)
    multi = (pieces.filter(F.length("piece") > 1)
             .orderBy(F.col("count").desc(), F.col("piece"))
             .limit(seed_size))
    return singles.unionByName(multi)


def viterbi_segment(word: str, scores: dict[str, float],
                    max_piece_len: int) -> list[str]:
    """Single best segmentation under piece log-probs; ties prefer
    fewer pieces then the lexicographically smaller piece ending at
    the split. Plain left-to-right Python floats — the fold order is
    part of the determinism contract. Characters missing from
    `scores` (impossible after seeding, defensive anyway) segment as
    themselves with a large penalty."""
    n = len(word)
    NEG = float("-inf")
    # best[i] = (score, -n_pieces, last_piece) for word[:i]
    best: list[tuple[float, int, str]] = [(NEG, 0, "")] * (n + 1)
    best[0] = (0.0, 0, "")
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        cand: tuple[float, int, str] | None = None
        cand_j = 0
        for j in range(max(0, i - max_piece_len), i):
            if best[j][0] == NEG:
                continue
            piece = word[j:i]
            sc = scores.get(piece)
            if sc is None:
                if i - j > 1:
                    continue
                sc = -100.0  # unseen single char: large penalty
            key = (best[j][0] + sc, best[j][1] - 1, piece)
            # max by (score, fewer pieces, LEX-SMALLER piece) — invert
            # the piece comparison by comparing candidates explicitly
            if cand is None or (key[0], key[1]) > (cand[0], cand[1]) or (
                    (key[0], key[1]) == (cand[0], cand[1])
                    and key[2] < cand[2]):
                cand = key
                cand_j = j
        if cand is not None:
            best[i] = cand
            back[i] = cand_j
    out: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


def unigram_segment_words(words: DataFrame, scores: dict[str, float],
                          max_piece_len: int) -> DataFrame:
    """(piece, count) expected-count table for one E-step: Arrow-batched
    Viterbi over the distinct-word rows (scores dict rides the closure
    → broadcast once per executor), partial piece counts emitted per
    batch so the following groupBy combines map-side."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            acc: dict[str, int] = {}
            for word, cnt in zip(pdf["word"], pdf["count"]):
                for piece in viterbi_segment(str(word), scores,
                                             max_piece_len):
                    acc[piece] = acc.get(piece, 0) + int(cnt)
            yield pd.DataFrame({"piece": list(acc.keys()),
                                "count": list(acc.values())})

    out = words.select("word", F.col("cnt").alias("count")).mapInPandas(
        run, "piece string, count long")
    return out.groupBy("piece").agg(F.sum("count").alias("count"))


def _logprobs(counts: dict[str, int]) -> dict[str, float]:
    """Driver-side M-step: log(count/total) over pieces in sorted
    order — exact ints in, deterministic IEEE floats out. A
    zero-count piece (a coverage single unused in the last E-step)
    gets the fixed -100.0 penalty, the same score class as an
    unseen char in the Viterbi."""
    total = sum(counts[p] for p in sorted(counts))
    return {p: (math.log(counts[p] / total) if counts[p] > 0
                else -100.0)
            for p in sorted(counts)}


def train_unigram(words: DataFrame, vocab_size: int = 128,
                  max_piece_len: int = 4, seed_size: int = 512,
                  em_rounds: int = 3,
                  keep_frac: float = 0.75) -> list[tuple[str, int, int]]:
    """Train; returns the final vocabulary as
    [(piece, expected_count, logp_micro)] sorted by (count desc,
    piece asc). Driver state is the vocab (bounded by seed_size);
    each round is one distributed E-step aggregate."""
    seed = {r["piece"]: int(r["count"])
            for r in seed_pieces(words, max_piece_len,
                                 seed_size).collect()}
    counts = seed
    for _ in range(em_rounds):
        scores = _logprobs(counts)
        est = {r["piece"]: int(r["count"])
               for r in unigram_segment_words(words, scores,
                                              max_piece_len).collect()}
        # unused pieces drop out; singles always survive for coverage
        singles = {p: counts[p] for p in counts if len(p) == 1}
        merged = dict(est)
        for p, c in singles.items():
            merged.setdefault(p, 0)
        n_multi = sum(1 for p in merged if len(p) > 1)
        target = max(vocab_size - len(singles),
                     int(n_multi * keep_frac))
        keep = sorted(((p, c) for p, c in merged.items() if len(p) > 1),
                      key=lambda pc: (-pc[1], pc[0]))[:target]
        counts = {p: c for p, c in keep}
        counts.update({p: merged[p] for p in merged if len(p) == 1})
    # final cut to vocab_size by the same total order, singles immune
    singles = {p: c for p, c in counts.items() if len(p) == 1}
    multi = sorted(((p, c) for p, c in counts.items() if len(p) > 1),
                   key=lambda pc: (-pc[1], pc[0]))
    room = max(vocab_size - len(singles), 0)
    final = dict(multi[:room])
    final.update(singles)
    scores = _logprobs(final)
    out = [(p, final[p], round(scores[p] * MICRO)) for p in final]
    out.sort(key=lambda t: (-t[1], t[0]))
    return out
