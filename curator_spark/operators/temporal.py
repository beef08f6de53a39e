"""Temporal operators Spark lacks natively: the as-of join.

As-of join (point-in-time join): for every left row, attach the most
recent right row with right.ts <= left.ts within the same key — the
classic market-data / feature-store lookup. Spark has no built-in;
the idiomatic construction is cogrouped `applyInPandas` with
`pd.merge_asof` per key group (public pattern, e.g. the PySpark
cogroup docs). DuckDB's native ASOF JOIN provides the oracle.

Scale shape: one shuffle of each side on the `by` key (co-partitioned
cogroup); per-group work is a sorted merge — O(n log n) in the group.
Skewed keys: a hot key's group must fit one task; for 10^8-row keys
pre-bucket by (key, time-range) and asof-join per bucket with a
boundary-carry pass.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MERGED_SCHEMA_FMT = "{left_schema}, {value_col} double"


def asof_join(left: DataFrame, right: DataFrame, on: str, by: str,
              value_col: str) -> DataFrame:
    """left rows + `value_col` from the latest right row at-or-before
    `on` (per `by` group). Right side must carry (by, on, value_col).

    Ties on right `on` must be pre-deduplicated by the caller for
    deterministic output (one right row per (by, on))."""
    left_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                            for f in left.schema.fields)
    out_schema = f"{left_fields}, {value_col} double"
    on_, by_, val_ = on, by, value_col  # close over plain strings

    left_cols = [f.name for f in left.schema.fields]

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if l.empty:  # key exists only on the right side
            return pd.DataFrame(columns=[*left_cols, val_])
        l = l.sort_values(on_, kind="mergesort")
        if r.empty:
            out = l.copy()
            out[val_] = pd.Series(pd.NA, index=l.index, dtype="float64")
            return out
        r = r[[on_, val_]].sort_values(on_, kind="mergesort")
        return pd.merge_asof(l, r, on=on_, direction="backward")

    return (
        left.groupby(by_).cogroup(right.groupby(by_))
        .applyInPandas(merge, schema=out_schema)
    )


def range_join_binned(points: DataFrame, intervals: DataFrame,
                      on: list[str] | None = None, ts_col: str = "ts_us",
                      start_col: str = "start_us", end_col: str = "end_us",
                      bin_width: int = 3_600_000_000,
                      max_bins_per_interval: int | None = 10_000) -> DataFrame:
    """Interval containment join at scale: points.ts ∈ [start, end]
    (inclusive), optionally AND-ed with equality keys `on`.

    Spark compiles a naive `t BETWEEN start AND end` predicate into a
    BroadcastNestedLoopJoin — an M×N scan that dies at the first big
    interval table. The binned form discretizes the axis: each interval
    explodes to the bins it overlaps, each point owns exactly ONE bin,
    and the join becomes an EQUI-join on (on..., bin) with the BETWEEN
    kept only as a residual filter. A point matches an interval in
    exactly one bin (its own), so no dedup pass is needed. Work is
    O(points + Σ interval_bins) through a uniform shuffle key.

    bin_width (µs) is the knob — set it near the median interval
    length so intervals explode to O(1) bins. max_bins_per_interval is
    the degenerate-interval guard (a year-long interval at 1 s bins is
    a fan-out bomb): exceeding it raises at execution rather than
    silently exploding (raise_error), the same fail-loud convention as
    graph.connected_components' round cap.

    DuckDB-oracle-friendly: the binned plan returns exactly the rows
    the naive BETWEEN join returns."""
    bw = F.lit(int(bin_width)).cast("long")
    nbins = (F.floor(F.col(end_col) / bw)
             - F.floor(F.col(start_col) / bw) + 1)
    if max_bins_per_interval is not None:
        guard = F.when(
            nbins > F.lit(int(max_bins_per_interval)),
            F.raise_error(F.format_string(
                "range_join_binned: interval spans %s bins "
                f"(cap {int(max_bins_per_interval)}) — raise bin_width "
                "or split the interval", nbins.cast("string")))
        ).otherwise(F.lit(True))
        intervals = intervals.filter(guard)
    ibins = intervals.withColumn(
        "__bin", F.explode(F.sequence(
            F.floor(F.col(start_col) / bw).cast("long"),
            F.floor(F.col(end_col) / bw).cast("long"))))
    pbins = points.withColumn("__bin",
                              F.floor(F.col(ts_col) / bw).cast("long"))
    keys = [*(on or []), "__bin"]
    return (pbins.join(ibins, keys)
            .filter(F.col(ts_col).between(F.col(start_col),
                                          F.col(end_col)))
            .drop("__bin"))
