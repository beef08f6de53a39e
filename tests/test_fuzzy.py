"""operators/fuzzy — blocked edit-distance join.

Exactness: the symmetric-delete-blocked join must return EXACTLY the
pair set of the brute-force cross join + levenshtein <= 1 (recall is
guaranteed by the pigeonhole argument in the operator docstring;
precision by the verify stage). Plus edge cases the expression-level
variant generator must survive (empty keys, the sequence(1,0)
descent), the hot-variant cap contract, and a no-product plan assert.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from curator_spark.operators.fuzzy import (
    deletion_neighborhood, fuzzy_join, fuzzy_join_exact)


def _pairs(df):
    return {(r.l_id, r.r_id, r.dist) for r in df.collect()}


@pytest.fixture(scope="module")
def sides(spark):
    # every edit kind at every interesting position, plus exact dups,
    # ed=2 pairs (must be excluded), and short/empty keys
    left = spark.createDataFrame(
        [(1, "spark shuffle"), (2, "quality filter"), (3, "tokenizer"),
         (4, "a"), (5, ""), (6, "dedup"), (7, "dedup")],
        ["l_id", "l_key"])
    right = spark.createDataFrame(
        [(10, "spark shuffle"),    # equal -> dist 0
         (11, "spark shuffl"),     # trailing deletion
         (12, "park shuffle"),     # leading deletion
         (13, "spark shufXle"),    # substitution
         (14, "Xspark shuffle"),   # leading insertion
         (15, "quality filterX"),  # trailing insertion
         (16, "quality fIlteR"),   # two substitutions -> ed 2, excluded
         (17, "b"),                # 1-char substitution of "a"
         (18, ""),                 # equal to empty / 1 del of "a"
         (19, "dedup"),            # matches BOTH 6 and 7
         (20, "tokeniser")],       # substitution
        ["r_id", "r_key"])
    return left, right


def test_matches_brute_force_exactly(spark, sides):
    left, right = sides
    got = _pairs(fuzzy_join(left, right))
    want = _pairs(fuzzy_join_exact(left, right))
    assert got == want
    # sanity on content, not just set equality with another impl
    assert (1, 10, 0) in got and (1, 13, 1) in got and (1, 14, 1) in got
    assert (4, 17, 1) in got and (4, 18, 1) in got and (5, 18, 0) in got
    assert (6, 19, 1 - 1) in got and (7, 19, 0) in got
    assert all(p[:2] != (2, 16) for p in got)  # ed=2 stays out


def test_matches_brute_force_on_fixture_corpus(spark):
    # denser random-ish corpus: 120 keys drawn from a tiny alphabet so
    # near-misses are common; Spark-only derivation, deterministic
    base = spark.range(120).select(
        F.col("id").alias("l_id"),
        F.substring(F.md5(F.col("id").cast("string")), 1, 6).alias("l_key"))
    # right = md5 prefixes again but shifted ids, so some keys land
    # within 1 edit of a left key and most do not
    other = spark.range(120).select(
        (F.col("id") + 1000).alias("r_id"),
        F.substring(F.md5((F.col("id") % 40).cast("string")), 1, 6)
        .alias("r_key"))
    got = _pairs(fuzzy_join(base, other))
    want = _pairs(fuzzy_join_exact(base, other))
    assert got == want and len(got) > 0


def test_deletion_neighborhood_edges(spark):
    rows = (spark.createDataFrame([("ab",), ("aab",), ("",)], ["k"])
            .select(deletion_neighborhood(F.col("k")).alias("v"))
            .collect())
    assert sorted(rows[0].v) == ["a", "ab", "b"]
    # deleting position 1 or 2 of "aab" both give "ab": deduped
    assert sorted(rows[1].v) == ["aa", "aab", "ab"]
    # empty string: ONLY itself — sequence(1,0) descent must not
    # fabricate variants
    assert rows[2].v == [""]


def test_max_variant_caps_hot_key(spark):
    # 50 identical boilerplate keys on each side would form 2500
    # candidate pairs through every shared variant; the cap drops the
    # hot variants, the distinct key survives
    left = spark.createDataFrame(
        [(i, "boilerplate") for i in range(50)] + [(99, "unique key")],
        ["l_id", "l_key"])
    right = spark.createDataFrame(
        [(1000 + i, "boilerplate") for i in range(50)]
        + [(1999, "unique kXy")], ["r_id", "r_key"])
    capped = _pairs(fuzzy_join(left, right, max_variant=10))
    assert capped == {(99, 1999, 1)}
    full = _pairs(fuzzy_join(left, right))
    assert len(full) == 50 * 50 + 1


def test_plan_has_no_product(spark, sides):
    left, right = sides
    plan = fuzzy_join(left, right)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
