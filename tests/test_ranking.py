"""Distributed total order (operators/ranking.py): exact global ranks
and globally-sorted export layout without an empty-PARTITION-BY window
— the 100 TB-safe decomposition (literal quantile boundaries → bucket
→ parallel local ranks → prefix-sum offsets) must be RANK-EXACT vs the
naive single-partition global window."""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from curator_spark.operators.ranking import global_rank, sorted_export_ready


def _fixture(spark, n=5000):
    # value has heavy ties (mod 97) so tie-handling is exercised;
    # id is the unique tiebreak
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).cast("long").alias("v"))


def _naive(df, desc=False):
    order = [F.col("v").desc() if desc else F.col("v"), F.col("k")]
    return df.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order)).cast("long"))


@pytest.mark.parametrize("desc", [False, True])
def test_global_rank_matches_naive_window(spark, desc):
    df = _fixture(spark)
    order = [F.col("v").desc() if desc else F.col("v"), F.col("k")]
    got = {r["k"]: r["rank"] for r in
           global_rank(df, "v", order_by=order, descending=desc,
                       num_ranges=8).collect()}
    want = {r["k"]: r["rank"] for r in _naive(df, desc).collect()}
    assert got == want


def test_global_rank_is_parallel_not_single_partition(spark):
    df = _fixture(spark)
    plan = global_rank(
        df, "v", order_by=[F.col("v"), F.col("k")], num_ranges=8
    )._jdf.queryExecution().executedPlan().toString()
    # the naive global window would plan `Exchange SinglePartition`
    # feeding a Sort — the exact thing this operator must never do
    assert "SinglePartition" not in plan
    # the per-bucket rank shuffles on the bucket key
    assert "hashpartitioning(__bucket" in plan


def test_global_rank_ranks_are_a_permutation(spark):
    n = 3000
    ranks = [r["rank"] for r in
             global_rank(_fixture(spark, n), "v",
                         order_by=[F.col("v"), F.col("k")],
                         num_ranges=5).collect()]
    assert sorted(ranks) == list(range(1, n + 1))


def test_global_rank_empty_input(spark):
    df = _fixture(spark).filter(F.lit(False))
    assert global_rank(df, "v").count() == 0


def test_sorted_export_layout_is_globally_sorted(spark):
    df = _fixture(spark, 4000)
    parts = (sorted_export_ready(df, [F.col("v"), F.col("k")],
                                 num_ranges=8)
             .withColumn("pid", F.spark_partition_id())
             .select("pid", "v", "k").collect())
    # collect() returns rows partition by partition in pid order —
    # the concatenation must ALREADY be the global sort (partition
    # ranges disjoint + ordered, rows sorted within each)
    vs = [(r["v"], r["k"]) for r in parts]
    assert vs == sorted(vs)
    pids = [r["pid"] for r in parts]
    assert pids == sorted(pids)
    assert len(set(pids)) > 1  # genuinely parallel layout