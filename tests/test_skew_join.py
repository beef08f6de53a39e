"""Salted join (operators/skew.py): row-identity with the plain join
under an extreme hot key, the (key, salt) shuffle shape, and guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from curator_spark.operators.skew import salted_join


def _fixture(spark, n_left=5000, hot_frac=0.9):
    """90% of fact rows share ONE join key — the straggler shape."""
    hot = int(n_left * hot_frac)
    left = spark.createDataFrame(
        [(0 if i < hot else i % 50, i) for i in range(n_left)],
        "k: long, row_id: long").repartition(8)
    right = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(50)], "k: long, attr: string")
    return left, right


def test_salted_join_equals_plain_join(spark):
    left, right = _fixture(spark)
    got = sorted((r["row_id"], r["attr"]) for r in salted_join(
        left, right, on=["k"], salt_by=["row_id"]).collect())
    want = sorted((r["row_id"], r["attr"])
                  for r in left.join(right, "k").collect())
    assert got == want and len(got) == 5000


def test_left_join_keeps_unmatched(spark):
    left, right = _fixture(spark, n_left=200)
    # make key 7 unmatched
    right = right.filter("k != 7")
    got = sorted((r["row_id"], r["attr"]) for r in salted_join(
        left, right, on=["k"], salt_by=["row_id"], how="left").collect())
    want = sorted((r["row_id"], r["attr"])
                  for r in left.join(right, "k", "left").collect())
    assert got == want and len(got) == 200


def test_shuffle_partitions_on_key_and_salt(spark):
    left, right = _fixture(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (salted_join(left, right, on=["k"], salt_by=["row_id"])
                ._jdf.queryExecution().executedPlan().toString())
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    # the join exchange must carry the salt — that's the whole defense
    assert "hashpartitioning(k" in plan and "__salt" in plan


def test_guards(spark):
    left, right = _fixture(spark, n_left=10)
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(left, right, on=["k"], salt_by=["row_id"], how="full")
    with pytest.raises(ValueError, match="salt_by"):
        salted_join(left, right, on=["k"], salt_by=[])
