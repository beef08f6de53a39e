"""Bucketed table layout: shuffle-free co-located joins.

At 100 TB the single most expensive plan node is the fact⋈fact shuffle
(e.g. orders⋈lineitem on orderkey — every other dim join broadcasts).
Writing BOTH tables bucketed (and sorted) by the join key makes the
join a zero-Exchange SortMergeJoin: each task reads matching bucket
files from the two tables and merges — no network movement of either
fact table, ever. This is the parquet analogue of Iceberg's
`bucket(N, key)` partition transform, and the same layout reused for
sign-bucket ANN partition pruning (operators/similarity.write_bucketed).

The bucket count is part of the table contract: joins co-locate only
when both sides share the same N and key, so pick N once per subject
area (rule of thumb: total size / N ≈ a few hundred MB per bucket at
the target scale) and keep it stable across writers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(df: DataFrame, table: str, bucket_col: str,
                  n_buckets: int, path: str, sort: bool = True) -> None:
    """Materialize df as an external bucketed (+sorted) table.

    Bucketing metadata lives in the catalog (saveAsTable is required —
    a bare parquet write loses the bucket spec), the data at `path`."""
    w = (df.write.mode("overwrite")
         .option("path", path)
         .bucketBy(n_buckets, bucket_col))
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def cobucketed_join(spark: SparkSession, left_table: str, right_table: str,
                    left_key: str, right_key: str) -> DataFrame:
    """Join two tables bucketed on their join keys with the same bucket
    count — plans with ZERO Exchange (asserted in tests/test_plans.py)."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    # frame-qualified refs: with the same key name on both sides (the
    # normal case for co-bucketed subject-area tables), bare F.col()
    # would be ambiguous — or a trivially-true self-comparison
    return lt.join(rt, lt[left_key] == rt[right_key])
