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
