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

def test_length_sorted_batches_cut_padding_waste(spark):
    from curator_spark.operators.packing import length_sorted_batches
    import pyspark.sql.functions as F
    # lengths alternate tiny/huge by id, so ARRIVAL-order batches of 8
    # each contain a huge doc (max=1000 every batch) while sorted
    # batches isolate the huge ones
    rows = [(i, 1000 if i % 2 == 0 else 10) for i in range(64)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    out = length_sorted_batches(df, batch_size=8).toPandas()
    assert int(out.n_docs.sum()) == 64
    sorted_waste = int(out.pad_waste.sum())
    naive = (df.withColumn("batch_id", (F.col("doc_id") / 8).cast("long"))
             .groupBy("batch_id")
             .agg(F.count(F.lit(1)).alias("n"), F.max("n_tokens").alias("mx"),
                  F.sum("n_tokens").alias("sm"))
             .withColumn("w", F.col("n") * F.col("mx") - F.col("sm"))
             .agg(F.sum("w")).collect()[0][0])
    assert sorted_waste == 0            # homogeneous batches pad nothing
    assert naive == 8 * (1000 - 10) * 4  # every naive batch pads 4 tiny docs
    # plan rides global_rank: never a single-partition global sort
    plan = (length_sorted_batches(df, batch_size=8)
            ._jdf.queryExecution().executedPlan().toString())
    assert "SinglePartition" not in plan.split("HashAggregate")[0]
