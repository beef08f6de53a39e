"""Skew-defused equi-join — salting as a reusable join primitive.

A shuffle join hashes both sides by the join key: one hot key (the
10^8-row conversation, the empty-string source, the boilerplate hash)
lands an entire reduce partition on one task and the stage runs at the
speed of that straggler. AQE's skew-join splitting handles moderate
cases at runtime; salting is the explicit, planner-independent defense
the flagship already uses for AGGREGATION (pipeline.
conversation_aggregates' 3-phase salted groupBy). This module is the
JOIN-side counterpart:

  * the LEFT (fact) side gets a deterministic salt derived from
    row-distinct columns (`salt_by`, e.g. its primary key) — a hot
    key's rows spread across n_salts reduce partitions;
  * the RIGHT (dimension-ish) side is replicated once per salt via a
    literal-array explode (bytes shuffled: |right| × n_salts — choose
    the smaller side as right);
  * the join runs on (keys…, salt). Every (l, r) match pair occurs in
    exactly ONE salt slice (the left row's), so the result is
    row-identical to the plain join — an algebraic identity, verified
    by the q71 oracle (which IS the plain join).

Supported: inner and left joins (right rows live in every slice, so
right/full-outer would fabricate per-slice null matches).

When to use which defense: broadcast beats salting whenever the right
side fits an executor (no shuffle at all); salting wins when BOTH
sides are too big to broadcast AND the key histogram is spiky. The
deterministic salt (xxhash64, no rand()) keeps retried tasks and
re-runs bit-identical — the same determinism rule as
sampling.hash_split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

N_SALTS = 16
SALT_COL = "__salt"


def salted_join(left: DataFrame, right: DataFrame, on: list[str],
                salt_by: list[str], n_salts: int = N_SALTS,
                how: str = "inner") -> DataFrame:
    """Equi-join `left` ⋈ `right` on `on`, immune to hot join keys.

    salt_by: left-side columns whose values vary WITHIN a join key
    (a row id, a timestamp) — the salt is pmod(xxhash64(salt_by), n).
    Salting by the join key itself would be a no-op (one salt per key).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if not salt_by:
        raise ValueError("salt_by must name at least one left column")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_by]),
                  F.lit(n_salts)).cast("int")
    l_salted = left.withColumn(SALT_COL, salt)
    r_rep = right.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return (l_salted.join(r_rep, [*on, SALT_COL], how)
            .drop(SALT_COL))
