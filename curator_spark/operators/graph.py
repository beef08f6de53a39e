"""Iterative graph operators: connected components for transitive
dedup clustering.

dedup_decisions (operators/dedup.py) uses keep-first pair semantics — a
linear-time approximation that can split a duplicate cluster when A~B
and B~C but A̸~C. Web-scale dedup (the Kiveris et al. "Connected
Components in MapReduce and Beyond" setting) instead clusters the
near-dup GRAPH and keeps one canonical doc per component. Spark has no
native iterative operator, so both algorithms here are driver loops of
DataFrame steps with localCheckpoint truncating lineage each round (the
standard Spark iterative pattern):

* min-label propagation — label(v) ← min over Γ(v)∪{v} of label(u);
  one equi-join + one groupBy per round, rounds = graph DIAMETER.
  Cheapest per round; right for near-dup clusters (diameter ≤ a few).
* large-star/small-star contraction (Kiveris et al., the paper this
  module's round-1 error message recommended) — alternating
  neighborhood rewrites that converge in O(log² n) ROUNDS on ANY
  graph, diameter-independent; the scale path for pathological shapes
  (chains of overlapping near-dups, template graphs).

connected_components runs propagation and FALLS BACK to star
contraction if the diameter exceeds the round budget, so callers never
see a non-convergence error for a legal graph.

Each round costs exactly ONE Spark job: the new state is
localCheckpoint(eager=False)'d and the convergence statistic (changed
count / edge digest) is aggregated from that same lazily-materialized
checkpoint, so the action that computes the statistic is the action
that persists the round's state — no separate count() job (round-2
review note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _sym(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """(src,dst) list → symmetric neighbor pairs (a,b), b ∈ Γ(a), no
    self-loops, distinct."""
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    return (fwd.unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b")).distinct())


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b",
                         max_iter: int = 25) -> DataFrame:
    """(src, dst) undirected edge list → (id, component) where
    component = min node id in the connected component.

    Deterministic (pure min semilattice — no ordering sensitivity),
    exactly replicable by a recursive-CTE oracle. Diameter > max_iter
    falls back to connected_components_star (same result, O(log² n)
    rounds)."""
    und = _sym(edges, src, dst).localCheckpoint()

    labels = (und.select(F.col("a").alias("id")).distinct()
              .withColumn("component", F.col("id"))
              .localCheckpoint())

    # max_iter + 1 rounds: a graph whose labels settle exactly on round
    # max_iter still gets its zero-change confirmation round instead of
    # a spurious fallback
    for _ in range(max_iter + 1):
        neigh_min = (
            und.join(labels, und["a"] == labels["id"])
            .groupBy(F.col("b").alias("id"))
            .agg(F.min("component").alias("neigh_component"))
        )
        new = F.least(F.col("component"),
                      F.coalesce("neigh_component", "component"))
        staged = (
            labels.join(neigh_min, "id", "left")
            .select("id", new.alias("new_component"),
                    # min semilattice: new ≤ old, so changed ⇔ strictly less
                    (new < F.col("component")).alias("changed"))
            .localCheckpoint(eager=False)
        )
        # ONE action: materializes the round's checkpoint AND returns
        # the convergence statistic from the same blocks
        changed = staged.agg(
            F.sum(F.col("changed").cast("long"))).first()[0] or 0
        labels = staged.select("id",
                               F.col("new_component").alias("component"))
        if changed == 0:
            return labels
    # Diameter exceeds the propagation budget: fall back to the
    # diameter-independent contraction WITHOUT discarding the work done —
    # the partial labels become shortcut edges (id, component) unioned
    # onto the graph (same components: a label edge only ever links two
    # nodes already connected), collapsing every ≤max_iter-hop stretch
    # to one hop before the star rounds start.
    shortcut = (labels.filter(F.col("id") != F.col("component"))
                .select(F.col("id").alias("a"),
                        F.col("component").alias("b")))
    sym = (und.unionByName(shortcut)
           .unionByName(shortcut.select(F.col("b").alias("a"),
                                        F.col("a").alias("b")))
           .distinct().localCheckpoint())
    nodes = labels.select("id")
    return _star_rounds(sym, nodes)


def _large_star(und: DataFrame) -> DataFrame:
    """Connect every neighbor LARGER than u to min(Γ(u) ∪ {u}).
    In: symmetric pairs (a,b). Out: directed edges (a,b) with a > b."""
    m = (und.groupBy("a").agg(F.min("b").alias("mn"))
         .select("a", F.least("mn", F.col("a")).alias("m")))
    return (und.join(m, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b")).distinct())


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor ≤ u (and u itself) to the minimum of
    u's smaller neighborhood. In/out: directed edges (a,b), a > b."""
    m = edges.groupBy("a").agg(F.min("b").alias("m"))
    moved = (edges.join(m, "a")
             .filter(F.col("b") != F.col("m"))
             .select(F.col("b").alias("a"), F.col("m").alias("b")))
    kept = m.select("a", F.col("m").alias("b"))
    return (moved.unionByName(kept)
            .filter(F.col("a") != F.col("b")).distinct())


def connected_components_star(edges: DataFrame, src: str = "id_a",
                              dst: str = "id_b",
                              max_iter: int = 60) -> DataFrame:
    """Large-star/small-star contraction (Kiveris et al. 2014, §3):
    alternate the two neighborhood rewrites until the edge set is
    stable — O(log² n) rounds regardless of diameter, each round two
    shuffles on uniform keys. At the fixpoint the graph is a star
    forest (v, root); labels read directly off the edges.

    Convergence is detected by an order-insensitive edge digest
    (count + bit_xor of xxhash64) aggregated from the round's lazily
    materialized checkpoint — one action per round, and a digest match
    IS a fixpoint match because both rewrites are deterministic
    functions of the edge set."""
    sym = _sym(edges, src, dst).localCheckpoint()
    nodes = sym.select(F.col("a").alias("id")).distinct().localCheckpoint()
    return _star_rounds(sym, nodes, max_iter)


def _star_rounds(sym: DataFrame, nodes: DataFrame,
                 max_iter: int = 60) -> DataFrame:
    """The star-contraction loop over an already-symmetric, distinct,
    self-loop-free pair set. nodes: DataFrame with column `id`."""
    # canonical big→small orientation = one large-star pass
    cur = _large_star(sym).localCheckpoint()

    def digest(df: DataFrame):
        row = df.agg(F.count(F.lit(1)).alias("n"),
                     F.bit_xor(F.xxhash64("a", "b")).alias("h")).first()
        return (row["n"], row["h"])

    prev = digest(cur)
    for _ in range(max_iter):
        both = cur.unionByName(
            cur.select(F.col("b").alias("a"), F.col("a").alias("b")))
        nxt = _small_star(_large_star(both)).localCheckpoint(eager=False)
        d = digest(nxt)  # the ONE action: materializes nxt + digests it
        cur = nxt
        if d == prev:
            break
        prev = d
    else:
        raise RuntimeError(
            f"star contraction did not converge in {max_iter} rounds — "
            "not expected for any finite graph; raise max_iter")

    labels = cur.select(F.col("a").alias("id"),
                        F.col("b").alias("component"))
    return (nodes.join(labels, "id", "left")
            .select("id", F.coalesce("component", F.col("id"))
                    .alias("component")))


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


def knn_pagerank(emb: DataFrame, k: int = 3, n_bits: int = 4,
                 iters: int = 5, damping: float = 0.85,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """PageRank over the directed k-NN similarity graph — the
    representativeness / density score used for coreset selection and
    data pruning (a vector central to many neighborhoods ranks high;
    outliers and singletons sink to the teleport floor). The same loop
    ranks domains on a web link graph for crawl prioritization.

    Graph: within each sign bucket, every vector points at its top-k
    cosine neighbors (rounded cos, id tiebreak — engine-exact).
    PageRank: fixed `iters` power-iteration rounds with uniform
    teleport and dangling-mass redistribution, r0 = 1/n.

    Scale shape: candidate edges are bucket-bounded (never all pairs);
    each round is ONE equi-join + groupBy on the dst key plus a
    single-double dangling aggregate to the driver; round state is
    localCheckpoint'd — persist alone is NOT enough here, because each
    round's LOGICAL plan embeds the previous round's twice (dangling +
    contribution), so without lineage truncation analysis cost grows
    exponentially with iters (observed: analyzer death near 20 rounds).
    At 10^10 nodes use reliable checkpoint and keep everything else.
    """
    from .similarity import dot_expr, sign_bucket_expr, with_norm
    from pyspark.sql import Window

    base = (with_norm(emb, vec_col)
            .withColumn("bucket", sign_bucket_expr(vec_col, n_bits))
            .select(F.col(id_col).alias("vid"), "v", "nrm", "bucket"))
    a = base.select(F.col("vid").alias("src"), F.col("v").alias("av"),
                    F.col("nrm").alias("an"), "bucket")
    b = base.select(F.col("vid").alias("dst"), F.col("v").alias("bv"),
                    F.col("nrm").alias("bn"), "bucket")
    cand = (a.join(b, "bucket")
            .filter(F.col("src") != F.col("dst"))
            .withColumn("cos6", F.round(
                dot_expr(F.col("av"), F.col("bv"))
                / (F.col("an") * F.col("bn")), 6))
            .select("src", "dst", "cos6"))
    w = Window.partitionBy("src").orderBy(
        F.col("cos6").desc(), F.col("dst").asc())
    knn = (cand.withColumn("rn", F.row_number().over(w))
           .filter(F.col("rn") <= k).select("src", "dst"))
    knn = knn.persist()
    outdeg = knn.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # persisted: every round left-joins nodes — without this the source
    # scan (10^10 rows at scale) repeats once per iteration
    nodes = base.select("vid").persist()
    n = nodes.count()  # one driver long (also materializes the persist)
    ranks = nodes.withColumn("r", F.lit(1.0 / n)).localCheckpoint()
    for _ in range(iters):
        dang = (ranks.join(outdeg, ranks["vid"] == outdeg["src"],
                           "left_anti")
                .agg(F.coalesce(F.sum("r"), F.lit(0.0)))
                .collect()[0][0])  # one double to the driver per round
        contrib = (knn.join(ranks, knn["src"] == ranks["vid"])
                   .join(outdeg, "src")
                   .groupBy("dst")
                   .agg(F.sum(F.col("r") / F.col("deg")).alias("s")))
        # eager localCheckpoint: materializes round t+1 AND truncates
        # its plan to a leaf before round t+2 builds on it
        ranks = (nodes.join(contrib, nodes["vid"] == contrib["dst"], "left")
                 .select(F.col("vid"),
                         (F.lit((1.0 - damping) / n)
                          + F.lit(damping)
                          * (F.coalesce(F.col("s"), F.lit(0.0))
                             + F.lit(dang / n))).alias("r"))
                 .localCheckpoint())
    # no trailing orderBy: a global sort of every node's rank is a
    # range-partition shuffle bought purely for presentation
    return ranks.select(F.col("vid").alias(id_col),
                        F.round(F.col("r") * 1e6, 4).alias("pagerank_ppm"))
