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


def test_rule_attribution_exclusive_counting(spark):
    """n_exclusive counts rows ONLY that rule fails; overlapping
    failures count in n_failed for both rules but in neither's
    n_exclusive; rescue_permille is over dropped rows."""
    from pyspark.sql import functions as F
    from curator_spark.operators.textstats import rule_attribution
    df = spark.createDataFrame(
        [(5,), (100,), (3,), (50,), (200,)], "x long")
    out = {r["rule"]: r for r in rule_attribution(df, [
        ("small", F.col("x") < 10),          # fails 5, 3
        ("big", F.col("x") > 60),            # fails 100, 200
        ("odd", F.col("x") % 2 == 1),        # fails 5, 3 (overlap small)
    ]).collect()}
    assert all(r["n_docs"] == 5 and r["n_dropped"] == 4
               for r in out.values())
    assert out["small"]["n_failed"] == 2 and out["small"]["n_exclusive"] == 0
    assert out["big"]["n_failed"] == 2 and out["big"]["n_exclusive"] == 2
    assert out["odd"]["n_failed"] == 2 and out["odd"]["n_exclusive"] == 0
    assert out["big"]["rescue_permille"] == 500  # 2 of 4 dropped
    assert out["small"]["fail_permille"] == 400


def test_rule_attribution_plan_single_global_agg(spark):
    """The report must be ONE map-side-combined global aggregate —
    no per-rule passes, no window, nothing data-sized crossing the
    exchange."""
    from pyspark.sql import functions as F
    from curator_spark.operators.textstats import rule_attribution
    df = spark.range(10).select(F.col("id").alias("x"))
    plan = (rule_attribution(df, [("a", F.col("x") < 3),
                                  ("b", F.col("x") > 7)])
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan
    assert plan.count("Exchange") == 1  # the 1-row partial→final agg
    assert "partial_count" in plan or "partial" in plan
