"""Expectations (curator_spark.expectations): DLT-style named PASS
conditions with warn/drop/quarantine/fail policies, NULL-fails
semantics, and per-rule metrics via the q108 attribution aggregate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from curator_spark.expectations import (
    FAILED_COL, ExpectationViolation, apply_expectations,
    expectation_metrics)

def _rules():
    # built lazily: classic-mode Column exprs need an active context
    return [
        ("positive", F.col("x") > 0),
        ("small", F.col("x") < 100),
        ("named", F.col("name").isNotNull()),
    ]


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [(5, "a"), (-3, "b"), (250, None), (7, None), (50, "e")],
        "x long, name string")


def test_quarantine_names_every_broken_rule(spark, df):
    r = apply_expectations(df, _rules(), mode="quarantine")
    ok = {x["x"] for x in r["passed"].collect()}
    assert ok == {5, 50}
    assert FAILED_COL not in r["passed"].columns
    bad = {x["x"]: sorted(x[FAILED_COL])
           for x in r["quarantined"].collect()}
    assert bad == {-3: ["positive"], 250: ["named", "small"],
                   7: ["named"]}


def test_drop_and_warn_modes(spark, df):
    d = apply_expectations(df, _rules(), mode="drop")
    assert d["quarantined"] is None
    assert d["passed"].count() == 2
    w = apply_expectations(df, _rules(), mode="warn")
    assert w["passed"].count() == 5  # nothing withheld
    ann = {x["x"]: len(x[FAILED_COL]) for x in w["passed"].collect()}
    assert ann == {5: 0, -3: 1, 250: 2, 7: 1, 50: 0}


def test_fail_mode_raises_with_count_or_passes_through(spark, df):
    with pytest.raises(ExpectationViolation, match="3 row"):
        apply_expectations(df, _rules(), mode="fail")
    clean = df.filter("x in (5, 50)")
    r = apply_expectations(clean, _rules(), mode="fail")
    assert r["passed"] is clean  # untouched on success


def test_null_condition_fails_not_passes(spark):
    """A NULL pass-condition (e.g. a comparison against NULL) must
    quarantine the row — missing evidence is not a pass."""
    df = spark.createDataFrame([(None,), (1,)], "x int")
    r = apply_expectations(df, [("pos", F.col("x") > 0)],
                           mode="quarantine")
    assert [x["x"] for x in r["passed"].collect()] == [1]
    assert r["quarantined"].count() == 1


def test_metrics_match_manual_counts(spark, df):
    m = {r["rule"]: r for r in
         expectation_metrics(df, _rules()).collect()}
    assert m["positive"]["n_failed"] == 1
    assert m["positive"]["n_exclusive"] == 1   # -3 breaks only this
    assert m["small"]["n_failed"] == 1 and m["small"]["n_exclusive"] == 0
    assert m["named"]["n_failed"] == 2 and m["named"]["n_exclusive"] == 1
    assert all(r["n_dropped"] == 3 for r in m.values())


def test_expectations_plan_is_codegen_no_shuffle(spark, df):
    """warn/drop/quarantine must be pure narrow transforms — no UDF,
    no exchange (stream-safe by construction)."""
    r = apply_expectations(df, _rules(), mode="quarantine")
    for side in (r["passed"], r["quarantined"]):
        plan = side._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_cli_expect_verb_quarantines_and_reports(spark, tmp_path, capsys):
    import json

    from curator_spark.cli import main
    inp = str(tmp_path / "in.parquet")
    spark.createDataFrame(
        [(1, 10), (2, -5), (3, 500)], "id long, x long"
    ).write.parquet(inp)
    out = str(tmp_path / "out")
    rc = main(["--input", inp, "--output", out,
               "--local-cores", "2",
               "--expect", "positive=x > 0",
               "--expect", "small=x < 100"])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["rows_passed"] == 1 and res["rows_quarantined"] == 2
    q = spark.read.parquet(res["quarantine_out"])
    assert {tuple(sorted(r[FAILED_COL])) for r in q.collect()} == {
        ("positive",), ("small",)}
    by_rule = {m["rule"]: m for m in res["metrics"]}
    assert by_rule["positive"]["n_failed"] == 1
    assert by_rule["small"]["n_exclusive"] == 1


def test_cli_expect_fail_mode_exit_code(spark, tmp_path, capsys):
    from curator_spark.cli import main
    inp = str(tmp_path / "in.parquet")
    spark.createDataFrame([(1, -1)], "id long, x long").write.parquet(inp)
    rc = main(["--input", inp, "--output", str(tmp_path / "o"),
               "--local-cores", "2",
               "--expect", "positive=x > 0", "--expect-mode", "fail"])
    assert rc == 3
