"""Distributed BPE tokenizer training — learn merge rules from a
corpus with exactly ONE corpus-scale pass.

The working set after pre-tokenization is the DISTINCT-word table
(Zipf: ~10^6-10^7 rows for a 10^12-token corpus — thousands of times
smaller than the corpus), so the iterative part of BPE never touches
the corpus again:

* pass 0 (corpus-proportional, once): pre-tokenize + count words —
  one map-side-combined groupBy;
* each merge step (vocab-proportional): explode adjacent symbol
  pairs weighted by word count → one aggregation → argmax to the
  driver (ONE row — the algorithm's inherent sync point, exactly the
  Lloyd's-iteration shape of operators/clustering.py) → apply the
  merge to every word's symbol array with a JVM-side `aggregate`
  fold (left-to-right greedy, the canonical BPE merge order) — a
  narrow map, no Python;
* `localCheckpoint` after every step keeps the plan flat (otherwise
  each step nests another lambda into the expression tree).

Encoding with the learned merges is executor-side: a broadcast rank
table + an Arrow-batched pandas UDF with a per-word cache (Zipf again:
cache hit rate ≈ 1 − distinct/total).

All comparisons are ASCII-only ([A-Za-z]+ then lowercase), so Java,
Python, and the golden oracle tokenize bit-identically.

Reference parity: the reference ships token counting for cost control
(token_counter.py, tiktoken/fallback estimators); this module is the
training side of that coin — building the subword vocabulary itself,
the op a training-data platform needs that an API client never does.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = ["word_counts", "train_bpe", "bpe_encode_words",
           "merge_symbols_py"]

WORD_PATTERN = "[A-Za-z]+"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The one corpus-scale pass: pre-tokenize (ASCII letter runs,
    lowercased) and count distinct words. Partial aggregation does the
    heavy lifting map-side; the shuffle carries distinct words only."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(WORD_PATTERN), 0)
    return (docs
            .select(F.explode(F.transform(toks, F.lower)).alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("cnt")))


def _merge_expr(syms, left: str, right: str, merged: str):
    """Left-to-right greedy merge of adjacent (left, right) inside a
    symbol array, as one JVM-side fold: push each symbol, but when the
    accumulator ends with `left` and the incoming symbol is `right`,
    replace that tail with the merged token (so "aaa" under (a,a)
    becomes [aa, a], never [a, aa] — the canonical BPE order)."""
    def step(acc, x):
        hit = (F.size(acc) > 0) \
            & (F.element_at(acc, -1) == F.lit(left)) & (x == F.lit(right))
        return F.when(
            hit,
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.lit(merged)))
        ).otherwise(F.concat(acc, F.array(x)))
    return F.aggregate(
        syms, F.array().cast("array<string>"), step)


def merge_symbols_py(syms: tuple, left: str, right: str,
                     merged: str) -> tuple:
    """Pure-Python twin of _merge_expr (same fold), used by the encode
    UDF and by independent oracles/tests."""
    out: list = []
    for x in syms:
        if out and out[-1] == left and x == right:
            out[-1] = merged
        else:
            out.append(x)
    return tuple(out)


def train_bpe(words: DataFrame, n_merges: int,
              min_count: int = 2) -> list[dict]:
    """Learn up to `n_merges` merge rules from a (word, cnt) table.
    Ties in pair frequency break by lexicographic (left, right) —
    fully deterministic. Stops early when no pair reaches `min_count`.

    Returns [{step, left, right, pair_count}, ...]. Each step moves
    O(vocab) rows; the only driver traffic is one argmax row per step.
    """
    # explicit char explode (regex-split on zero-width patterns is
    # engine-quirky: it can emit empty/merged fragments)
    chars = F.expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))")
    cur = words.filter(F.length("word") > 0).select(
        chars.alias("syms"),
        F.col("cnt").cast("long").alias("cnt"))
    cur = cur.localCheckpoint(eager=True)
    merges: list[dict] = []
    for step in range(int(n_merges)):
        n = F.size("syms")
        zipped = F.arrays_zip(F.slice(F.col("syms"), 1, n - 1),
                              F.slice(F.col("syms"), 2, n - 1))
        best = (cur.filter(n >= 2)
                .select(F.explode(zipped).alias("p"), "cnt")
                .groupBy(F.col("p").getField("0").alias("left"),
                         F.col("p").getField("1").alias("right"))
                .agg(F.sum("cnt").alias("pair_count"))
                .orderBy(F.desc("pair_count"), F.asc("left"),
                         F.asc("right"))
                .limit(1).collect())
        if not best or int(best[0]["pair_count"]) < min_count:
            break
        left, right = best[0]["left"], best[0]["right"]
        merges.append({"step": step, "left": left, "right": right,
                       "pair_count": int(best[0]["pair_count"])})
        nxt = cur.select(
            _merge_expr(F.col("syms"), left, right, left + right)
            .alias("syms"), "cnt")
        nxt = nxt.localCheckpoint(eager=True)  # flat plan, step-sized
        cur.unpersist()
        cur = nxt
    cur.unpersist()
    return merges


def bpe_encode_words(df: DataFrame, merges: list[dict],
                     word_col: str = "word",
                     out_col: str = "subwords") -> DataFrame:
    """Encode a word column with learned merges: Arrow-batched pandas
    UDF, merge table broadcast once per executor via closure capture,
    per-word memo (Zipf makes the hit rate ≈ 1 − distinct/total).
    Applies merges in rank order — identical to the training fold by
    construction (tested property: encoding the training words
    reproduces the final training symbol table)."""
    from pyspark.sql.functions import pandas_udf

    rules = [(m["left"], m["right"]) for m in merges]

    @pandas_udf("array<string>")
    def _enc(s: pd.Series) -> pd.Series:
        memo: dict[str, list] = {}

        def enc(w):
            if w is None:
                return None
            hit = memo.get(w)
            if hit is None:
                syms = tuple(w)
                for left, right in rules:
                    if len(syms) < 2:
                        break
                    syms = merge_symbols_py(syms, left, right,
                                            left + right)
                hit = memo[w] = list(syms)
            return hit
        return s.map(enc)

    return df.withColumn(out_col, _enc(F.col(word_col)))
