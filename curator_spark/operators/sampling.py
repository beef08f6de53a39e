"""Deterministic hash-based sampling and dataset splitting.

At 100 TB, train/val/test splits and sampled subsets must be
REPRODUCIBLE — independent of partitioning, executor count, retries,
and engine (rand() is none of these). The standard device is a salted
content hash of the row key mapped to a bucket in [0, N_BUCKETS):
assignment is a pure function of (id, salt), so re-runs, resumes, and
a DuckDB oracle all agree bit-for-bit, and changing the salt redraws
the split without touching the data.

All expressions are narrow JVM-side column maps (md5 + integer
arithmetic inside whole-stage codegen) — zero shuffle, zero Python.
The md5-hex→integer mapping reuses the construction proven
cross-engine-exact by the MinHash family (operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

N_BUCKETS = 10_000


def hash_bucket(id_col: str, salt: str,
                n_buckets: int = N_BUCKETS) -> Column:
    """Uniform bucket in [0, n_buckets) from md5(id ':' salt)."""
    key = F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))
    return (F.conv(F.substring(F.md5(key), 1, 8), 16, 10)
            .cast("long") % n_buckets)


def hash_split(df: DataFrame, id_col: str, salt: str = "v1",
               weights: tuple[tuple[str, float], ...] = (
                   ("train", 0.8), ("val", 0.1), ("test", 0.1)),
               ) -> DataFrame:
    """Append (bucket, split): deterministic weighted split assignment.

    Buckets partition [0, N_BUCKETS) by cumulative weight; the last
    split absorbs rounding remainder."""
    total = sum(w for _, w in weights)
    bucket = hash_bucket(id_col, salt)
    expr = None
    cum = 0.0
    for name, w in weights[:-1]:
        cum += w / total
        bound = int(round(cum * N_BUCKETS))
        cond = bucket < F.lit(bound)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (F.lit(weights[0][0]) if expr is None
            else expr.otherwise(weights[-1][0]))
    return df.withColumn("bucket", bucket).withColumn("split", expr)


def hash_sample(df: DataFrame, id_col: str, fraction: float,
                salt: str = "v1") -> DataFrame:
    """Deterministic ~fraction sample: bucket < fraction·N_BUCKETS.
    Nested: hash_sample(f1) ⊇ hash_sample(f2) for f1 ≥ f2 (same salt) —
    shrinking a sample keeps it a subset, unlike rand() redraws."""
    bound = int(round(fraction * N_BUCKETS))
    return df.filter(hash_bucket(id_col, salt) < F.lit(bound))


def mixture_sample(df: DataFrame, group_col: str, id_col: str,
                   fractions: dict[str, float], salt: str = "mix-v1",
                   default: float = 0.0) -> DataFrame:
    """Deterministic mixture/domain-reweighting sample: keep each row
    with its group's fraction (e.g. {"web": 0.3, "code": 1.0}) — the
    standard pretraining-mixture op, built on the same salted hash
    bucket so the draw is reproducible and per-group nested. One narrow
    map (a CASE over the group column), zero shuffle, zero Python;
    groups absent from `fractions` keep `default`."""
    bucket = hash_bucket(id_col, salt)
    bound = None
    for g, frac in fractions.items():
        b = F.lit(int(round(frac * N_BUCKETS)))
        cond = F.col(group_col) == g
        bound = F.when(cond, b) if bound is None else bound.when(cond, b)
    bound = (F.lit(int(round(default * N_BUCKETS))) if bound is None
             else bound.otherwise(int(round(default * N_BUCKETS))))
    return df.filter(bucket < bound)


def token_budget_sample(df: DataFrame, group_col: str, weight_col: str,
                        id_col: str, budget_frac: float = 0.5,
                        salt: str = "budget-v1",
                        n_hash_buckets: int = 16) -> DataFrame:
    """Assemble a corpus to an EXACT per-group token budget: walk each
    group's rows in salted-hash order and keep rows while the running
    token total (inclusive) stays within `budget_frac` of the group's
    total — the "give me 50% of each source's tokens, reproducibly"
    op every pretraining mixture spec ends with. Hash order makes the
    cut engine/partitioning/retry-invariant AND unbiased (a prefix of
    a hash order is a uniform sample), unlike "first N files".

    Scale shape — the grouped-cumsum problem WITHOUT a per-group
    single-task window (`Window.partitionBy(group).orderBy(hash)` puts
    a whole source in one task; web corpora have trillion-token
    sources): rows are sliced into `n_hash_buckets` by hash prefix, so
    the running total decomposes as (sum of all earlier buckets in the
    group) + (within-bucket cumsum). Per-(group, bucket) sums are one
    map-side-combined aggregate — k·B longs to the driver, the same
    documented bounded collect as operators/ranking.global_rank — and
    become literal offsets broadcast back; the window then partitions
    on (group, bucket), bounded by the bucket slice. Budgets derive
    from the same collect. The walk order is BUCKET-MAJOR ((hash
    bucket, hash, id)), so `n_hash_buckets` is part of the sampling
    key — fix it per corpus like `salt`; for fixed parameters the cut
    is invariant to partitioning, retries, executor count, and engine
    (the oracle replays the same order). Raise it to shrink task size
    at scale (every choice is an equally uniform hash order).

    Returns df + (cum_tokens, budget, keep_budget), cum_tokens being
    the inclusive running total in hash order.
    """
    from pyspark.sql import Window

    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    hb = (F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
          % n_hash_buckets)
    d = df.withColumn("__h", h).withColumn("__hb", hb)
    # ONE aggregate: k groups × B buckets of longs to the driver
    rows = (d.groupBy(group_col, "__hb")
            .agg(F.sum(F.col(weight_col).cast("long")).alias("w"))
            .collect())
    totals: dict = {}
    per_bucket: dict = {}
    for r in rows:
        g = r[group_col]
        totals[g] = totals.get(g, 0) + int(r["w"])
        per_bucket[(g, int(r["__hb"]))] = int(r["w"])
    offsets = []
    for g in sorted(totals, key=str):
        acc = 0
        for b in range(n_hash_buckets):
            offsets.append((g, b, acc,
                            int(budget_frac * totals[g])))
            acc += per_bucket.get((g, b), 0)
    spark = df.sparkSession
    off = F.broadcast(spark.createDataFrame(
        offsets, [group_col, "__hb", "__offset", "budget"]))
    w = (Window.partitionBy(group_col, "__hb")
         .orderBy(F.col("__h").asc(), F.col(id_col).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (d.join(off, [group_col, "__hb"])
            .withColumn("cum_tokens",
                        (F.col("__offset")
                         + F.sum(F.col(weight_col).cast("long")).over(w))
                        .cast("long"))
            .withColumn("budget", F.col("budget").cast("long"))
            .withColumn("keep_budget",
                        F.col("cum_tokens") <= F.col("budget"))
            .drop("__h", "__hb", "__offset"))
