"""Distributed BPE tokenizer training (models/bpe.py): the merge rules
learned by the vocab-table iteration must equal an independent in-
memory BPE on the same corpus (argmax ties broken lexicographically),
and encoding with the learned rules must reproduce the training
process's final symbol state."""

from __future__ import annotations

import collections
import re

from pyspark.sql import functions as F

from curator_spark.models.bpe import (
    bpe_encode_words, merge_symbols_py, train_bpe, word_counts)

CORPUS = [
    "the cat sat on the mat the cat ran",
    "a banana fan ran to the band and sang",
    "low lower lowest new newer newest",
    "Widest wide widen WIDE wide",
]


def _py_train(words: dict[str, int], n_merges: int, min_count: int = 2):
    """Independent reference trainer (plain dict/Counter)."""
    syms = {w: tuple(w) for w in words}
    merges = []
    for step in range(n_merges):
        pc: collections.Counter = collections.Counter()
        for w, c in words.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        (left, right), cnt = min(pc.items(),
                                 key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        merges.append({"step": step, "left": left, "right": right,
                       "pair_count": cnt})
        for w in syms:
            syms[w] = merge_symbols_py(syms[w], left, right, left + right)
    return merges, syms


def _py_words(corpus) -> dict[str, int]:
    c: collections.Counter = collections.Counter()
    for text in corpus:
        for w in re.findall("[A-Za-z]+", text):
            c[w.lower()] += 1
    return dict(c)


def test_word_counts_matches_python_pretokenizer(spark):
    docs = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = {r["word"]: r["cnt"] for r in word_counts(docs).collect()}
    assert got == _py_words(CORPUS)


def test_train_matches_independent_reference(spark):
    words = _py_words(CORPUS)
    wdf = spark.createDataFrame(list(words.items()),
                                "word string, cnt long")
    got = train_bpe(wdf, 12)
    want, _ = _py_train(words, 12)
    assert got == want
    # rule sequence is strictly ordered and deterministic
    assert [m["step"] for m in got] == list(range(len(got)))


def test_tie_breaks_lexicographically(spark):
    # (a,b) and (c,d) both appear exactly 3 times: (a,b) must win
    wdf = spark.createDataFrame(
        [("ab", 3), ("cd", 3)], "word string, cnt long")
    got = train_bpe(wdf, 1)
    assert (got[0]["left"], got[0]["right"]) == ("a", "b")
    assert got[0]["pair_count"] == 3


def test_min_count_stops_training(spark):
    wdf = spark.createDataFrame([("xy", 1)], "word string, cnt long")
    assert train_bpe(wdf, 5, min_count=2) == []


def test_greedy_merge_is_left_to_right(spark):
    # "aaaa" under merge (a,a) must become [aa, aa] (never [a, aa, a])
    wdf = spark.createDataFrame([("aaaa", 5)], "word string, cnt long")
    merges = train_bpe(wdf, 2)
    assert (merges[0]["left"], merges[0]["right"],
            merges[0]["pair_count"]) == ("a", "a", 15)  # 3 positions × 5
    enc = bpe_encode_words(
        spark.createDataFrame([("aaaa",), ("aaa",)], "word string"),
        merges[:1])
    got = {r["word"]: tuple(r["subwords"]) for r in enc.collect()}
    assert got["aaaa"] == ("aa", "aa") and got["aaa"] == ("aa", "a")


def test_encode_reproduces_training_state(spark):
    """Applying the learned rules in rank order to the raw words must
    land exactly on the training loop's final symbol table — the
    train/encode consistency BPE guarantees by construction."""
    words = _py_words(CORPUS)
    wdf = spark.createDataFrame(list(words.items()),
                                "word string, cnt long")
    merges = train_bpe(wdf, 10)
    _, final_syms = _py_train(words, 10)
    enc = {r["word"]: tuple(r["subwords"]) for r in
           bpe_encode_words(wdf, merges).collect()}
    assert enc == final_syms


def test_encode_handles_null_and_unseen(spark):
    wdf = spark.createDataFrame([("the", 3), ("then", 1)],
                                "word string, cnt long")
    merges = train_bpe(wdf, 3)
    df = spark.createDataFrame(
        [("theory",), (None,), ("zzz",)], "word string")
    got = {r["word"]: r["subwords"] for r in
           bpe_encode_words(df, merges).collect()}
    assert got[None] is None
    assert got["zzz"] == ["z", "z", "z"]         # no rule applies
    assert "".join(got["theory"]) == "theory"     # lossless


def test_q85_runs_on_testdata(spark):
    from curator_spark.queries import q85_bpe_train
    rows = q85_bpe_train(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    assert [r["step"] for r in rows] == list(range(len(rows)))
    counts = [r["pair_count"] for r in rows]
    assert all(c >= 2 for c in counts)
    # later merges reference earlier merged tokens eventually — at
    # least one rule's side is multi-char on real text
    assert any(len(r["left"]) > 1 or len(r["right"]) > 1 for r in rows)