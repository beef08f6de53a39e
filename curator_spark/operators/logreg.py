"""Distributed quality-classifier training: hashed-feature logistic
regression with integer fixed-point arithmetic.

This is the trainable half of the north-star quality filter — the
fastText-style supervised classifier production pipelines train over
labeled corpus slices and then apply to every page (CCNet ranks by LM
perplexity; Llama/GPT-style pipelines additionally TRAIN a classifier
on quality labels). The reference's curation loop delegates this
judgment to a remote LLM per row; at 100 TB the distributed
formulation is full-batch gradient descent where each epoch is ONE
narrow pass over the corpus plus a ≤dim-integer aggregate — the same
driver-holds-the-model / corpus-work-is-a-map-side-combined-sum shape
as Lloyd's iterations in operators/clustering.py.

Determinism contract (why training is hash-exact across engines,
partitionings, and retries): floating-point SUMS are fold-order
dependent, so plain float GD is not cluster-reproducible. Every
quantity here is an int64 instead —

* features: hashed bag-of-words COUNTS per md5 bucket (q74's proven
  cross-engine construction), kept SPARSE — one
  array<struct<b,c>> row per doc, because a production hash space
  (2^18+) cannot be a wide column block;
* activation: the HARD sigmoid  p = clamp(z/4 + 1/2, 0, 1)  in
  micro-units, via arithmetic right shift (shiftright(z, 2) floors
  exactly like Python's `>> 2`, unlike `div`'s truncation);
* gradient: per-row err_micro · c summed as int64 — exact, order
  independent, map-side combinable;
* update: Python-int floor division on the driver;
* model choice: full-batch GD with a fixed step OSCILLATES around
  the separator (hard-sigmoid errors are constant in saturation, so
  steps don't shrink near the optimum); the returned model is the
  BEST ITERATE by training accuracy (earliest epoch wins ties) —
  a deterministic integer criterion measured in the same aggregate
  that computes the gradient, so it costs no extra pass.

The final model and every per-doc score are pure functions of the
corpus — bit-equal under local[1] vs local[32], resume, or the
independent pure-Python replay in tools/make_golden.py.

Scale shape per epoch: cached sparse features → one projection
computing err_micro from LITERAL weights (z folds the doc's own
array against an F.array literal — no join, no Python) → explode of
the nonzero entries → ONE map-side-combined groupBy(bucket) with
≤dim+2 output rows (two sentinel buckets carry n and n_correct).
E epochs = E narrow passes. For hash spaces too large for a literal
array (≳2^12), swap the literal fold for a broadcast join of the
exploded entries against a weights table — one extra small join,
same aggregate; the training loop is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["hashed_sparse_features", "train_logreg", "score_logreg",
           "MICRO", "LITERAL_DIM_MAX"]

MICRO = 1_000_000  # fixed-point scale: 1.0 == 1e6 micro-units

# Above this hash-space size the literal weight array would bloat the
# plan; train/score switch to the broadcast-join formulation.
LITERAL_DIM_MAX = 4096

_N_SENTINEL = -1       # carries n (docs seen) through the gradient agg
_CORRECT_SENTINEL = -2  # carries n_correct through the gradient agg


def hashed_sparse_features(docs: DataFrame, dim: int, label: Column,
                           text_col: str = "text",
                           id_col: str = "doc_id",
                           salt: str = "lr-v1") -> DataFrame:
    """(id, y:int, fs:array<struct<b:int,c:bigint>>) — sparse hashed
    bag-of-words counts, bucket = md5(token ':' salt) mod dim, entries
    sorted by bucket (b is unique per doc, so the order — and hence
    every downstream fold — is deterministic). Empty docs get an empty
    array via the spine left-join. Two shuffles, run ONCE; cache the
    result before a multi-epoch train."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "),
                    lambda t: t != "")
    staged = docs.select(id_col, label.cast("int").alias("y"),
                         F.explode(toks).alias("tok"))
    bucket = (F.conv(F.substring(
        F.md5(F.concat(F.col("tok"), F.lit(":" + salt))), 1, 12), 16, 10)
        .cast("long") % dim).cast("int")
    ent = (staged.withColumn("b", bucket)
           .groupBy(id_col, "y", "b")
           .agg(F.count(F.lit(1)).cast("long").alias("c")))
    packed = ent.groupBy(id_col, "y").agg(
        F.array_sort(F.collect_list(F.struct("b", "c"))).alias("fs"))
    spine = docs.select(id_col, label.cast("int").alias("y"))
    return (spine.join(packed.drop("y"), id_col, "left")
            .withColumn("fs", F.coalesce(
                "fs", F.array().cast("array<struct<b:int,c:bigint>>"))))


def _z_micro(weights: list[int], bias: int) -> Column:
    """z = bias + Σ w[e.b]·e.c over the doc's sparse entries, folding
    against a LITERAL weight array (whole-stage codegen, no join)."""
    warr = F.array(*[F.lit(int(x)).cast("long") for x in weights])
    return F.aggregate(
        "fs", F.lit(int(bias)).cast("long"),
        lambda acc, e: acc + F.element_at(warr, e["b"] + 1) * e["c"])


def _p_micro(z: Column) -> Column:
    """Hard sigmoid in micro-units: clamp(z/4 + 1/2, 0, 1); the shift
    floors (matches Python >> on negatives)."""
    s = F.shiftright(z, 2) + F.lit(MICRO // 2)
    return F.least(F.greatest(s, F.lit(0).cast("long")),
                   F.lit(MICRO).cast("long"))


def _weights_df(features: DataFrame, weights: list[int]):
    """Sparse (b, w) weight table for the broadcast-join path — only
    nonzero entries ship (the model starts all-zero and stays sparse
    for rare buckets)."""
    spark = features.sparkSession
    rows = [(d, int(x)) for d, x in enumerate(weights) if x]
    if not rows:
        rows = [(-(10 ** 9), 0)]  # placeholder bucket no entry matches
    return F.broadcast(spark.createDataFrame(rows, "wb int, w long"))


def _z_join(features: DataFrame, weights: list[int], bias: int,
            id_col: str) -> DataFrame:
    """(id, y, z_micro) via broadcast-join — the large-dim path (the
    literal-array fold caps out around LITERAL_DIM_MAX; a 2^20-dim
    production model ships as a broadcast table instead). explode_outer
    keeps empty docs; one groupBy(id) shuffle per evaluation."""
    wdf = _weights_df(features, weights)
    ex = features.select(id_col, "y", F.explode_outer("fs").alias("e"))
    joined = ex.join(wdf, ex["e.b"] == F.col("wb"), "left")
    term = F.coalesce(F.col("w"), F.lit(0).cast("long")) * \
        F.coalesce(F.col("e.c"), F.lit(0).cast("long"))
    return (joined.groupBy(id_col, "y")
            .agg((F.lit(int(bias)).cast("long")
                  + F.coalesce(F.sum(term), F.lit(0).cast("long")))
                 .alias("z_micro")))


def train_logreg(features: DataFrame, dim: int, epochs: int = 24,
                 lr_den: int = 4, id_col: str = "doc_id",
                 use_join: bool | None = None) -> tuple[list[int], int, int]:
    """Full-batch hard-sigmoid logistic regression over
    hashed_sparse_features output; returns (weights_micro[dim],
    bias_micro, best_epoch), all ints — the best iterate by training
    accuracy (ties → earliest epoch).

    Per epoch (literal path, dim ≤ LITERAL_DIM_MAX): ONE narrow pass —
    err_micro from literal weights, the doc's entry array extended
    with two sentinel buckets (n and n_correct ride the same
    aggregate), explode, map-side-combined groupBy(bucket) → ≤dim+2
    rows to the driver. Update is w −= Σ(err·c) // (n · lr_den) in
    Python ints. Cache `features` before calling (each epoch re-scans
    it).

    use_join=True (automatic above LITERAL_DIM_MAX) swaps the literal
    fold for a broadcast join of the exploded entries against a sparse
    (bucket, weight) table — the 2^20-dim production shape. Same
    integer recurrence, bit-identical results (test-asserted); costs
    one groupBy(id) shuffle per epoch that the literal path avoids."""
    if use_join is None:
        use_join = dim > LITERAL_DIM_MAX
    w = [0] * dim
    b = 0
    best: tuple[int, list[int], int, int] | None = None  # (nc, w, b, ep)
    for ep in range(epochs):
        if use_join:
            n, nc, gb, g = _epoch_join(features, w, b, id_col)
        else:
            n, nc, gb, g = _epoch_literal(features, w, b)
        if best is None or nc > best[0]:
            best = (nc, list(w), b, ep)
        w = [w[d] - g.get(d, 0) // (n * lr_den) for d in range(dim)]
        b = b - gb // (n * lr_den)
    assert best is not None
    return best[1], best[2], best[3]


def _epoch_literal(features: DataFrame, w: list[int],
                   b: int) -> tuple[int, int, int, dict[int, int]]:
    """One epoch's (n, n_correct, Σerr, {bucket: Σerr·c}) via the
    literal-array fold + sentinel buckets — zero shuffles beyond the
    ≤dim+2-row aggregate."""
    z = _z_micro(w, b)
    p = _p_micro(z)
    err = (p - F.col("y").cast("long") * MICRO).alias("err")
    correct = (((p >= MICRO // 2) == (F.col("y") == 1))
               .cast("long").alias("ok"))
    ext = F.concat(
        F.col("fs"),
        F.array(
            F.struct(F.lit(_N_SENTINEL).alias("b"),
                     F.lit(1).cast("long").alias("c")),
            F.struct(F.lit(_CORRECT_SENTINEL).alias("b"),
                     F.col("ok").cast("long").alias("c"))))
    rows = (features
            .select(err, correct, ext.alias("fs2"))
            .select("err", F.explode("fs2").alias("e"))
            .groupBy(F.col("e.b").alias("b"))
            .agg(F.sum(F.col("err") * F.col("e.c")).alias("g"),
                 F.sum("e.c").alias("s"))
            .collect())
    g = {int(r["b"]): int(r["g"]) for r in rows}
    s = {int(r["b"]): int(r["s"]) for r in rows}
    n = max(s.get(_N_SENTINEL, 0), 1)
    nc = s.get(_CORRECT_SENTINEL, 0)
    return n, nc, g.get(_N_SENTINEL, 0), g


def _epoch_join(features: DataFrame, w: list[int], b: int,
                id_col: str) -> tuple[int, int, int, dict[int, int]]:
    """One epoch's stats via the broadcast-join path: z per doc from
    the joined groupBy(id), err/ok cached for the two consumers
    (global stats + the gradient join back onto the entries)."""
    z = F.col("z_micro")
    p = _p_micro(z)
    errdf = (_z_join(features, w, b, id_col)
             .select(id_col,
                     (p - F.col("y").cast("long") * MICRO).alias("err"),
                     (((p >= MICRO // 2) == (F.col("y") == 1))
                      .cast("long")).alias("ok"))
             .cache())
    try:
        st = errdf.agg(F.count(F.lit(1)).alias("n"),
                       F.sum("err").alias("gb"),
                       F.sum("ok").alias("nc")).collect()[0]
        ex = features.select(id_col, F.explode("fs").alias("e"))
        rows = (ex.join(errdf.select(id_col, "err"), id_col)
                .groupBy(F.col("e.b").alias("b"))
                .agg(F.sum(F.col("err") * F.col("e.c")).alias("g"))
                .collect())
    finally:
        errdf.unpersist()
    g = {int(r["b"]): int(r["g"]) for r in rows}
    return max(int(st["n"]), 1), int(st["nc"]), int(st["gb"]), g


def score_logreg(features: DataFrame, weights: list[int], bias: int,
                 id_col: str = "doc_id",
                 use_join: bool | None = None) -> DataFrame:
    """(id, y, z_micro, p_micro, pred). Literal path: one narrow
    codegen'd projection, zero shuffle, zero Python. Join path
    (automatic above LITERAL_DIM_MAX): broadcast the sparse weight
    table, one groupBy(id) — same values bit-for-bit."""
    if use_join is None:
        use_join = len(weights) > LITERAL_DIM_MAX
    if use_join:
        zdf = _z_join(features, weights, bias, id_col)
        p = _p_micro(F.col("z_micro"))
        return zdf.select(
            id_col, "y", "z_micro", p.alias("p_micro"),
            (p >= MICRO // 2).alias("pred"))
    z = _z_micro(weights, bias)
    p = _p_micro(z)
    return features.select(
        id_col, "y", z.alias("z_micro"), p.alias("p_micro"),
        (p >= MICRO // 2).alias("pred"))
