"""Blocked edit-distance (fuzzy / approximate-string) join.

At web scale, curation constantly aligns NOISY keys across tables —
page titles between two crawl snapshots, tool names in agent
transcripts vs a registry, OCR'd strings vs a lexicon — where the
match predicate is "equal up to k edits", not equality. The naive
plan is a cross join with a ``levenshtein() <= k`` residual, which
Spark compiles to BroadcastNestedLoopJoin: O(M*N) comparisons, the
exact product shape every other operator in this repo is built to
avoid (see dedup.lsh_candidate_pairs, temporal.range_join_binned).

This module blocks with the SYMMETRIC-DELETE neighborhood (the
SymSpell scheme; the same pigeonhole idea as PassJoin's segment
filter): if lev(a, b) <= 1 then a and b share at least one string in
their {self + every single-character deletion} sets —

  equal                -> share the string itself;
  one substitution @i  -> deleting position i from both sides yields
                          the same string;
  one insert/delete    -> deleting the inserted character from the
                          longer side yields the shorter side.

So candidate recall is EXACT for k=1 by construction. The converse
does not hold (sharing a deletion variant only bounds lev <= 2), so
candidates are verified with the JVM-side ``levenshtein`` before
anything is emitted — precision is restored by verification, the
candidates/verify split used by every near-dup family here.

Scale shape: fan-out is length+1 variants per row (callers clip the
key to a fixed prefix, so it is a constant), the candidate join is a
shuffle EQUI-join on short ~uniform strings, and no stage forms a
product. Skew: a hot variant (a boilerplate key shared by millions of
rows) goes quadratic exactly like a hot LSH bucket — ``max_variant``
caps the candidate fan-out per variant with the same contract as
dedup.lsh_candidate_pairs(max_bucket): capped pairs are dropped, recall
is reduced for boilerplate keys only, and the cap is a named knob.

Beyond-reference operator (training-data alignment); the
candidates -> verify -> decide pipeline mirrors the reference's
validate-then-keep flow (/root/reference/src/bespokelabs/curator/
request_processor/base_request_processor.py:398-426) re-expressed as
set-level joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def deletion_neighborhood(key: Column) -> Column:
    """Array of the string itself plus every single-character deletion
    (distinct). Empty strings yield just themselves: sequence(1, 0)
    would DESCEND ([1, 0]) and fabricate variants, so it is guarded.
    Pure column expressions — whole-stage codegen, no UDF."""
    dels = F.when(
        F.length(key) > 0,
        F.transform(
            F.sequence(F.lit(1), F.length(key)),
            lambda i: F.concat(
                F.substring(key, F.lit(1), i - 1),
                F.substring(key, i + 1, F.length(key)),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_union(F.array(key), dels)


def fuzzy_join(left: DataFrame, right: DataFrame,
               l_id: str = "l_id", l_key: str = "l_key",
               r_id: str = "r_id", r_key: str = "r_key",
               max_ed: int = 1,
               max_variant: int | None = None) -> DataFrame:
    """All (left, right) pairs with levenshtein(l_key, r_key) <= max_ed.

    max_ed must be 1: the single-deletion neighborhood's recall
    guarantee is specific to one edit (k>1 needs the k-deletion
    neighborhood, whose fan-out is C(len, k) — implementable by
    iterating deletion_neighborhood, deliberately not wired until a
    caller needs it). Returns (l_id, r_id, dist).

    Plan: explode both sides into their deletion neighborhoods,
    equi-join on the variant, distinct the (pair, keys) candidates
    (one shared variant is enough), verify with exact levenshtein.
    With max_variant=n, variants whose candidate bucket would exceed
    n rows on either side are dropped (boilerplate-key guard; exact
    recall then holds only for keys under the cap).
    """
    if max_ed != 1:
        raise ValueError("fuzzy_join implements max_ed=1 "
                         "(single-deletion neighborhood)")
    lv = left.select(
        F.col(l_id), F.col(l_key),
        F.explode(deletion_neighborhood(F.col(l_key))).alias("_variant"))
    rv = right.select(
        F.col(r_id), F.col(r_key),
        F.explode(deletion_neighborhood(F.col(r_key))).alias("_variant"))
    if max_variant is not None:
        # count per variant per side; drop hot variants BEFORE the
        # join so the quadratic bucket never materializes
        lcnt = lv.groupBy("_variant").count().filter(
            F.col("count") <= max_variant).select("_variant")
        rcnt = rv.groupBy("_variant").count().filter(
            F.col("count") <= max_variant).select("_variant")
        lv = lv.join(lcnt, "_variant")
        rv = rv.join(rcnt, "_variant")
    cand = (lv.join(rv, "_variant")
            .select(l_id, l_key, r_id, r_key)
            .distinct())
    dist = F.levenshtein(F.col(l_key), F.col(r_key))
    return (cand
            .withColumn("dist", dist)
            .filter(F.col("dist") <= max_ed)
            .select(l_id, r_id, "dist"))


def fuzzy_join_exact(left: DataFrame, right: DataFrame,
                     l_id: str = "l_id", l_key: str = "l_key",
                     r_id: str = "r_id", r_key: str = "r_key",
                     max_ed: int = 1) -> DataFrame:
    """Brute-force O(M*N) baseline: cross join + levenshtein residual
    (BroadcastNestedLoopJoin). Kept ONLY as the exact-recall oracle
    for tests — never the scale path."""
    cand = left.crossJoin(right)
    dist = F.levenshtein(F.col(l_key), F.col(r_key))
    return (cand.withColumn("dist", dist)
            .filter(F.col("dist") <= max_ed)
            .select(l_id, r_id, "dist"))
