"""Iterative graph operators: connected components for transitive
dedup clustering.

dedup_decisions (operators/dedup.py) uses keep-first pair semantics — a
linear-time approximation that can split a duplicate cluster when A~B
and B~C but A̸~C. Web-scale dedup (the Kiveris et al. "Connected
Components in MapReduce" setting) instead clusters the near-dup GRAPH
and keeps one canonical doc per component. Spark has no native
iterative operator, so this is a driver loop of DataFrame steps —
min-label propagation:

  label(v) ← min(label(v), min over neighbors u of label(u))

repeated to fixpoint. Each round is one equi-join + one groupBy on
uniform keys (shuffle volume ∝ |E|); rounds needed = graph diameter,
and near-dup clusters are tiny (diameter ≤ a few hops), so the loop
terminates in 2–4 rounds in practice with a hard cap. localCheckpoint
truncates the lineage each round so the plan doesn't grow with the
iteration count (the standard Spark iterative-algorithm pattern).

The per-round convergence test is one count() action — an O(|V|)
aggregate, not a collect of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b",
                         max_iter: int = 25) -> DataFrame:
    """(src, dst) undirected edge list → (id, component) where
    component = min node id in the connected component.

    Deterministic (pure min semilattice — no ordering sensitivity),
    exactly replicable by a recursive-CTE oracle."""
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = fwd.unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).distinct().localCheckpoint()

    labels = (und.select(F.col("a").alias("id")).distinct()
              .withColumn("component", F.col("id"))
              .localCheckpoint())

    # max_iter + 1 rounds: a graph whose labels settle exactly on round
    # max_iter still gets its zero-change confirmation round instead of
    # a spurious non-convergence error
    changed = -1  # sentinel for degenerate max_iter < 0 (zero rounds)
    for _ in range(max_iter + 1):
        neigh_min = (
            und.join(labels, und["a"] == labels["id"])
            .groupBy(F.col("b").alias("id"))
            .agg(F.min("component").alias("neigh_component"))
        )
        new_labels = (
            labels.join(neigh_min, "id", "left")
            .select("id",
                    F.least("component",
                            F.coalesce("neigh_component", "component"))
                    .alias("component"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # silently returning a non-fixpoint would split components —
        # wrong labels with no signal; diameter > max_iter means the
        # caller's graph is not the small-cluster shape this targets
        raise RuntimeError(
            f"connected_components did not converge in {max_iter + 1} "
            f"rounds ({changed} labels still changing); raise max_iter or "
            "use a large-star/small-star contraction for high-diameter graphs")
    return labels


def dedup_components(docs: DataFrame, pairs: DataFrame,
                     id_col: str = "doc_id") -> DataFrame:
    """Transitive dedup decision: every doc labeled with its near-dup
    component (singletons = own id); keep ⇔ doc is its component's
    canonical (minimum id). Unlike keep-first pair semantics, A~B~C
    collapses to ONE kept doc even when A̸~C directly."""
    comp = connected_components(pairs)
    return (
        docs.select(id_col)
        .join(comp, docs[id_col] == comp["id"], "left")
        .select(id_col,
                F.coalesce("component", F.col(id_col)).alias("component"))
        .withColumn("keep_canonical", F.col(id_col) == F.col("component"))
    )
