"""operators/attributes: tag → combine → mix equals the direct
filter; collisions fail loudly; NULL attributes fail the rule."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from curator_spark.operators.attributes import (combine_attribute_tables,
                                                mix, tag)


def _docs(spark):
    rows = [(0, "long enough text with many words here ok", "en"),
            (1, "short", "en"),
            (2, "spam marker slow appears in this document text", "zh"),
            (3, "another long clean document with plenty of words", "fr")]
    return spark.createDataFrame(rows, "doc_id long, text string, "
                                       "lang string")


def test_mix_equals_direct_filter(spark):
    docs = _docs(spark)
    toks = F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
    attrs = tag(docs, {"n_tokens": F.size(toks).cast("long"),
                       "has_spam": F.array_contains(toks, "slow")})
    rule = (F.col("n_tokens") >= 6) & ~F.col("has_spam")
    got = sorted(r["doc_id"] for r in
                 mix(docs.select("doc_id"), attrs, rule).collect())
    direct = sorted(r["doc_id"] for r in docs.filter(
        (F.size(toks) >= 6)
        & ~F.array_contains(toks, "slow")).collect())
    assert got == direct == [0, 3]


def test_combine_outer_joins_and_null_fails_rule(spark):
    docs = _docs(spark)
    a = tag(docs, {"q__n": F.length("text").cast("long")})
    # second tagger only covers half the corpus (independent run)
    b = tag(docs.filter("doc_id < 2"), {"l__en": F.col("lang") == "en"})
    attrs = combine_attribute_tables([a, b])
    assert attrs.count() == 4  # outer join keeps every tagged doc
    # rule over the partially-covered attribute: NULL → fail (missing
    # evidence is not a pass)
    kept = mix(docs.select("doc_id"), attrs, F.col("l__en"))
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 1]


def test_collisions_fail_loudly(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError):
        tag(docs, {"doc_id": F.lit(1)})
    a = tag(docs, {"x": F.lit(1)})
    b = tag(docs, {"x": F.lit(2)})
    with pytest.raises(ValueError):
        combine_attribute_tables([a, b])


def test_mix_is_semi_join(spark):
    """The materialized view never duplicates or reorders corpus rows
    (semi-join semantics) and survives an attribute table with
    duplicate ids."""
    docs = _docs(spark)
    attrs = tag(docs, {"ok": F.lit(True)})
    attrs = attrs.unionByName(attrs)  # duplicated attribute rows
    out = mix(docs, attrs, F.col("ok"))
    assert out.count() == 4
    assert "LeftSemi" in out._jdf.queryExecution().executedPlan().toString()
