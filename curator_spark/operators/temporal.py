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
from pyspark.sql import DataFrame

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
