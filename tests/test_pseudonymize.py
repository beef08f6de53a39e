"""operators/pii.pseudonymize — consistent per-group PII aliasing."""

from __future__ import annotations

from pyspark.sql import functions as F

from curator_spark.operators.pii import pseudonymize


def _run(spark, rows):
    df = spark.createDataFrame(rows, ["conv_id", "turn_id", "text"])
    out = pseudonymize(df, "conv_id", "turn_id")
    return {(r.conv_id, r.turn_id): r.pseudo_text for r in out.collect()}


def test_stable_alias_and_first_occurrence_numbering(spark):
    got = _run(spark, [
        ("c1", 0, "write a@x.com then b@y.org"),
        ("c1", 1, "b@y.org replied to a@x.com"),   # same entities, later
        ("c1", 2, "no pii here"),
        ("c2", 0, "b@y.org first in THIS conv"),   # numbering is per-group
    ])
    assert got[("c1", 0)] == "write <EMAIL_1> then <EMAIL_2>"
    assert got[("c1", 1)] == "<EMAIL_2> replied to <EMAIL_1>"
    assert got[("c1", 2)] == "no pii here"
    assert got[("c2", 0)] == "<EMAIL_1> first in THIS conv"


def test_position_within_turn_breaks_ties(spark):
    # both entities first appear in turn 0: position decides 1 vs 2
    got = _run(spark, [("c", 0, "z@z.io and a@a.io"),
                       ("c", 1, "a@a.io")])
    assert got[("c", 0)] == "<EMAIL_1> and <EMAIL_2>"
    assert got[("c", 1)] == "<EMAIL_2>"


def test_substring_entities_fold_longest_first(spark):
    # ab@x.com contains b@x.com as a substring; replacing the short
    # one first would corrupt the long one — the fold is longest-first
    got = _run(spark, [("c", 0, "ab@x.com met b@x.com"),
                       ("c", 1, "then b@x.com wrote ab@x.com")])
    assert got[("c", 0)] == "<EMAIL_1> met <EMAIL_2>"
    assert got[("c", 1)] == "then <EMAIL_2> wrote <EMAIL_1>"


def test_passthrough_columns_and_no_udf(spark):
    df = spark.createDataFrame([("c", 0, "x a@b.co", 7)],
                               ["conv_id", "turn_id", "text", "extra"])
    out = pseudonymize(df, "conv_id", "turn_id")
    row = out.collect()[0]
    assert row.extra == 7 and row.text == "x a@b.co"
    assert row.pseudo_text == "x <EMAIL_1>"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
