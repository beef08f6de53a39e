"""Gopher repetition statistics (operators/textstats.py)."""

from __future__ import annotations

from curator_spark.operators.textstats import repetition_stats


def _stats(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    return {r["doc_id"]: r.asDict() for r in
            repetition_stats(df, **kw).collect()}


def test_repeated_bigram_counted(spark):
    # "a b" occurs 3 times (len 3 chars each), "b a" twice (len 3)
    out = _stats(spark, [(1, "a b a b a b")], n=2)[1]
    assert out["n_grams"] == 5
    assert out["dup_occurrences"] == 5
    assert out["dup_chars"] == 15
    assert out["max_gram_count"] == 3
    assert out["n_chars"] == 11
    assert not out["rep_ok"]  # 15*100 >= 20*11


def test_unique_grams_pass(spark):
    out = _stats(spark, [(1, "one two three four")], n=2)[1]
    assert out["dup_occurrences"] == 0 and out["dup_chars"] == 0
    assert out["max_gram_count"] == 1 and out["rep_ok"]


def test_short_doc_zero_grams_passes(spark):
    out = _stats(spark, [(1, "word")], n=2)[1]
    assert out["n_grams"] == 0 and out["max_gram_count"] == 0
    assert out["rep_ok"]


def test_empty_doc_passes(spark):
    out = _stats(spark, [(1, "")], n=2)[1]
    assert out["n_chars"] == 0 and out["n_grams"] == 0
    assert out["rep_ok"]  # empty docs are the length rules' business


def test_case_folding_merges_grams(spark):
    out = _stats(spark, [(1, "Hello World hello world")], n=2)[1]
    assert out["max_gram_count"] == 2  # "hello world" twice after lower()
