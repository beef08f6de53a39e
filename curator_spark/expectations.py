"""Data-quality expectations over any DataFrame: named PASS
conditions with warn / drop / quarantine / fail policies (the Delta
Live Tables `EXPECT ... ON VIOLATION` surface, as a plain library op).

Relation to the neighbors:
* table CHECK constraints (`constraints.py`) are the TABLE's
  invariants — enforced at every write verb, violation = abort;
* expectations are the PIPELINE's quality gates — row-level,
  tolerant by policy, and they ACCOUNT for what they reject
  (per-rule metrics reuse operators/textstats.rule_attribution, so
  the q108 ablation report falls out of every run for free);
* the flagship's keep/drop rules are one SPECIFIC expectation set;
  this is the generic harness a user points at their own conditions.

Scale shape: evaluation is one narrow codegen'd projection (each rule
a boolean column; the failed-rule list a filtered literal array — no
UDF, no shuffle). `drop`/`quarantine` split by one predicate;
`metrics` is the q108 single-aggregate. `fail` is the only mode that
runs an action (one count job) — it must decide before anything
downstream commits. Streaming: warn/drop/quarantine are pure
transforms and compose with foreachBatch epochs; fail belongs in the
batch path (an action inside a stream would block the trigger).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

FAILED_COL = "_failed_expectations"


class ExpectationViolation(ValueError):
    """Raised by mode='fail' when any row violates any expectation."""


def _flagged(df: DataFrame, rules: list[tuple[str, Column]]) -> DataFrame:
    """Input rows + FAILED_COL: array of the rule names whose PASS
    condition is not satisfied (NULL condition = fail — missing
    evidence never passes, the attributes.py rule)."""
    marks = F.array(*[
        F.when(cond.isNull() | ~cond, F.lit(name)).otherwise(
            F.lit(None).cast("string"))
        for name, cond in rules])
    return df.withColumn(
        FAILED_COL, F.filter(marks, lambda x: x.isNotNull()))


def apply_expectations(df: DataFrame, rules: list[tuple[str, Column]],
                       mode: str = "drop") -> dict:
    """Evaluate `rules` ([(name, pass_condition), ...]) under `mode`.

    Returns {passed, quarantined, mode}:
    * warn       — passed = ALL rows annotated with FAILED_COL;
                   quarantined = None (nothing withheld);
    * drop       — passed = clean rows only (annotation removed);
                   quarantined = None (violations discarded);
    * quarantine — passed = clean rows; quarantined = violating rows
                   WITH FAILED_COL naming every rule each row broke
                   (the side table a data steward triages);
    * fail       — one count job; raises ExpectationViolation naming
                   the violation count if any row fails, else returns
                   passed = the input unchanged.

    Everything except fail is a pure transform (lazy, stream-safe).
    """
    if mode not in ("warn", "drop", "quarantine", "fail"):
        raise ValueError(f"unknown expectations mode: {mode!r}")
    flagged = _flagged(df, rules)
    clean = F.size(F.col(FAILED_COL)) == 0
    if mode == "warn":
        return {"passed": flagged, "quarantined": None, "mode": mode}
    if mode == "fail":
        n_bad = flagged.filter(~clean).count()
        if n_bad:
            raise ExpectationViolation(
                f"{n_bad} row(s) violate expectations "
                f"[{', '.join(n for n, _ in rules)}] under mode='fail'")
        return {"passed": df, "quarantined": None, "mode": mode}
    passed = flagged.filter(clean).drop(FAILED_COL)
    if mode == "drop":
        return {"passed": passed, "quarantined": None, "mode": mode}
    return {"passed": passed,
            "quarantined": flagged.filter(~clean), "mode": mode}


def expectation_metrics(df: DataFrame,
                        rules: list[tuple[str, Column]]) -> DataFrame:
    """Per-rule accounting for an expectation set — n_failed,
    n_exclusive, permilles — by handing the INVERTED conditions to
    rule_attribution (q108): one narrow pass + one global aggregate,
    k rows out at any corpus size."""
    from .operators.textstats import rule_attribution
    return rule_attribution(
        df, [(name, cond.isNull() | ~cond) for name, cond in rules])
