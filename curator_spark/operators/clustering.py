"""Corpus clustering over embedding columns — integer-exact k-means.

Training-data pipelines cluster embeddings constantly (topic bucketing,
per-cluster dedup/sampling budgets, SemDeDup-style cluster-then-prune,
IVF codebook training). The reference has no clustering; this is a
"beyond the reference" component in the same family as
operators/similarity.py (IVF assignment there uses a FIXED codebook —
this module is where such a codebook comes from).

Design for cross-engine exactness at any parallelism: classic k-means
updates average float vectors, and a float sum's value depends on
reduction order — non-deterministic across partitionings and engines.
`kmeans_int8` instead runs Lloyd's algorithm entirely in INTEGER
arithmetic over the int8-quantized codes (operators/similarity.
quantize_int8): distances are integer squared-L2 in code space,
centroid updates are floor(sum/count) per dimension, and every sum is
a sum of integers — associative, order-free, bit-identical on Spark,
DuckDB, and numpy regardless of partitioning. Quantized k-means is
itself standard practice at billion-vector scale (PQ/IVF codebook
training operates on quantized data for the same bandwidth reasons).

Scale shape (10^10 vectors, k clusters, d dims):
* assignment is a NARROW map — the codebook is driver-small (k·d ints)
  and folded into the plan as literal arrays, argmin via array_min over
  (dist, cid) structs: zero shuffle, zero per-vector window (the same
  plan shape as similarity.ivf_assign);
* the update is one posexplode + groupBy(cluster, dim) per iteration —
  map-side partial aggregation bounds the shuffle at k·d rows per
  upstream task, independent of corpus size;
* iterations are a driver loop (like operators/graph.py): k·d ints
  cross the driver per round, never data.

Reference analogue for the driver-looped refinement pattern: the
polling loop of base_batch_request_processor.py:538-582 (bounded
rounds of cheap driver coordination around heavy distributed work).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .similarity import quantize_int8

KMEANS_K = 8
KMEANS_ITERS = 3


def _codes_long(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    q = quantize_int8(emb, id_col=id_col, vec_col=vec_col)
    return q.select(
        id_col,
        F.transform("codes", lambda x: x.cast("long")).alias("codes"))


def _assign(codes: DataFrame, cents: list[tuple[int, list[int]]],
            id_col: str) -> DataFrame:
    """Nearest centroid per row as ONE narrow map: ||v-c||² = v·v
    - 2 v·c + c·c with v·v computed once per row, each v·c a
    sequential integer fold against a literal centroid array, argmin =
    array_min over (dist, cid) structs (ties → lowest cid)."""
    vv = F.aggregate(F.col("codes"), F.lit(0).cast("long"),
                     lambda acc, x: acc + x * x)
    staged = codes.withColumn("__vv", vv)
    entries = []
    for cid, cvec in cents:
        carr = F.array(*[F.lit(int(c)).cast("long") for c in cvec])
        dot = F.aggregate(F.zip_with(F.col("codes"), carr,
                                     lambda a, b: a * b),
                          F.lit(0).cast("long"), lambda acc, x: acc + x)
        cc = sum(int(c) * int(c) for c in cvec)
        dist = F.col("__vv") - F.lit(2).cast("long") * dot + F.lit(cc).cast("long")
        entries.append(F.struct(dist.alias("dist"),
                                F.lit(int(cid)).cast("int").alias("cid")))
    best = F.array_min(F.array(*entries))
    return staged.select(
        id_col, "codes",
        best["cid"].alias("cluster"),
        best["dist"].alias("dist"))


def _kmeans_train(codes: DataFrame, k: int, iters: int,
                  id_col: str) -> tuple[DataFrame, list[tuple[int, list[int]]]]:
    """Lloyd's rounds over a (id, codes:array<long>) frame — the shared
    core of kmeans_int8 (full vectors), pq_encode (subvector slices)
    and ivfpq_search (which also needs the trained codebook). Returns
    (final assignment DataFrame, final centroid list). Caller is
    responsible for persisting `codes`."""
    init = codes.orderBy(id_col).limit(k).collect()
    cents = [(i, [int(v) for v in r["codes"]])
             for i, r in enumerate(init)]
    for _ in range(iters):
        assigned = _assign(codes, cents, id_col)
        stats = (assigned
                 .select("cluster", F.posexplode("codes")
                         .alias("dim", "val"))
                 .groupBy("cluster", "dim")
                 .agg(F.sum("val").alias("s"),
                      F.count(F.lit(1)).alias("n"))
                 .collect())
        by_cid: dict[int, dict[int, int]] = {}
        for r in stats:
            # floor(sum/count) via double division: |sum| ≤ 127·n
            # keeps the quotient far inside double-exact range, and
            # floor-of-exact-division is what the SQL oracle computes
            by_cid.setdefault(int(r["cluster"]), {})[int(r["dim"])] = (
                int((float(r["s"]) / float(r["n"])) // 1))
        cents = [
            (cid, [by_cid[cid][d] for d in range(len(old))]
             if cid in by_cid else old)
            for cid, old in cents
        ]
    final = _assign(codes, cents, id_col).select(id_col, "cluster", "dist")
    return final, cents


def _kmeans_codes(codes: DataFrame, k: int, iters: int,
                  id_col: str) -> DataFrame:
    return _kmeans_train(codes, k, iters, id_col)[0]


def kmeans_int8(emb: DataFrame, k: int = KMEANS_K,
                iters: int = KMEANS_ITERS, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Integer-exact Lloyd's k-means over int8-quantized embeddings.

    Deterministic init: the k lowest-id vectors' codes. Each iteration
    assigns (narrow map) then recomputes centroids as per-dimension
    floor(sum/count) — all-integer, so the result is independent of
    partitioning and engine. A cluster left empty keeps its previous
    centroid. Returns (id, cluster:int, dist:bigint) after `iters`
    refinements — dist is the squared L2 distance in code space to the
    final centroid, an exact integer the oracle checks per row.
    """
    codes = _codes_long(emb, id_col, vec_col).persist()
    try:
        return _kmeans_codes(codes, k, iters, id_col)
    finally:
        codes.unpersist()


PQ_SUBSPACES = 4
PQ_K = 16
PQ_ITERS = 2


def pq_encode(emb: DataFrame, n_sub: int = PQ_SUBSPACES, k: int = PQ_K,
              iters: int = PQ_ITERS, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """Product quantization (Jégou et al. 2011): split each vector into
    n_sub contiguous subvectors and vector-quantize each subspace with
    its OWN k-entry codebook — d·8 bits of int8 storage become
    n_sub·log2(k) bits (here 64 dims → 4 bytes/vector), the workhorse
    compression behind billion-scale IVF-PQ indexes.

    Built on the same integer-exact machinery as kmeans_int8: the
    full-vector int8 codes are sliced per subspace and each slice runs
    the shared Lloyd core, so every emitted code and distortion is an
    exact integer the SQL oracle replays bit-for-bit (a float PQ
    trainer could not be verified this way). Subspace codebooks train
    sequentially on the driver loop, but each round's heavy work is
    distributed and the persisted codes frame is scanned — never
    recomputed — per round.

    Returns (id, c0..c{n_sub-1}:int, distortion:bigint) where
    distortion is the total squared code-space reconstruction error
    (the sum of per-subspace assignment distances)."""
    codes = _codes_long(emb, id_col, vec_col).persist()
    try:
        w = _subspace_width(codes, n_sub)
        books = [
            _kmeans_train(
                codes.select(id_col,
                             F.slice("codes", s * w + 1, w).alias("codes")),
                k, iters, id_col)[1]
            for s in range(n_sub)
        ]
        # final encode = ONE narrow projection: every subspace argmin
        # against its trained literal codebook (the previous form
        # chained n_sub-1 joins on the id just to recombine codes)
        structs = [_argmin_struct(F.slice("codes", s * w + 1, w), books[s])
                   for s in range(n_sub)]
        distortion = None
        for st in structs:
            distortion = st["dist"] if distortion is None \
                else distortion + st["dist"]
        return codes.select(
            id_col,
            *[structs[s]["cid"].alias(f"c{s}") for s in range(n_sub)],
            distortion.cast("long").alias("distortion"))
    finally:
        codes.unpersist()


def _subspace_width(codes: DataFrame, n_sub: int) -> int:
    """Dims-per-subspace, with explicit guards for empty input and
    indivisible dimensionality."""
    first = codes.select("codes").first()
    if first is None:
        raise ValueError("empty embeddings input")
    dims = len(first["codes"])
    if dims % n_sub:
        raise ValueError(f"dims {dims} not divisible by n_sub {n_sub}")
    return dims // n_sub


IVFPQ_CELLS = 8
IVFPQ_CELL_ITERS = 2
IVFPQ_NPROBE = 2


def _sqdist(a: list[int], b: list[int]) -> int:
    return sum((x - y) * (x - y) for x, y in zip(a, b))


def _argmin_struct(codes_col, cents: list[tuple[int, list[int]]]):
    """Nearest-centroid (dist, cid) struct for a codes column vs a
    literal codebook — a pure column expression (Σ(v−c)² fold per
    entry, array_min over (dist, cid) structs, ties → lowest cid) so
    several codebooks can be applied in ONE narrow projection."""
    entries = []
    for cid, cvec in cents:
        carr = F.array(*[F.lit(int(c)).cast("long") for c in cvec])
        dist = F.aggregate(
            F.zip_with(codes_col, carr, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"), lambda acc, x: acc + x)
        entries.append(F.struct(dist.alias("dist"),
                                F.lit(int(cid)).cast("int").alias("cid")))
    return F.array_min(F.array(*entries))


def _argmin_code(codes_col, cents: list[tuple[int, list[int]]]):
    return _argmin_struct(codes_col, cents)["cid"]


def ivfpq_search(emb: DataFrame, query_vec_id: int, k: int = 5,
                 n_cells: int = IVFPQ_CELLS,
                 cell_iters: int = IVFPQ_CELL_ITERS,
                 nprobe: int = IVFPQ_NPROBE, n_sub: int = PQ_SUBSPACES,
                 pq_k: int = PQ_K, pq_iters: int = PQ_ITERS,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """IVF-PQ search with asymmetric distance computation (ADC) — the
    billion-scale ANN serving path (Jégou et al. 2011): a coarse
    codebook partitions the corpus into cells, PQ codes compress every
    vector to n_sub bytes, and a query scans only its nprobe nearest
    cells, ranking members by Σ_s LUT_s[code_s] where each subspace
    lookup table holds the query-to-centroid squared distances.

    Integer-exact end to end (code-space training via the shared Lloyd
    core, driver-computed integer LUTs), so the SQL oracle replays the
    coarse chain, all subspace chains, the probe-cell choice AND every
    ADC distance bit-for-bit.

    Scale shape: training is the kmeans_int8 driver loop (k·d ints per
    round); serving is ONE narrow projection over the codes — cell
    argmin, n_sub code argmins, and the ADC sum are all literal-folded
    column expressions — followed by TakeOrdered. Zero shuffles
    (plan-asserted). At 10^10 vectors the cell column becomes a
    partition key so probing nprobe cells is partition pruning at the
    source (the same layout trick as signbucket_ann_pruned).

    Returns the top-k (id, cell:int, adc_dist:bigint) by (adc_dist,
    id) ascending."""
    codes = _codes_long(emb, id_col, vec_col).persist()
    try:
        w = _subspace_width(codes, n_sub)
        _, coarse = _kmeans_train(codes, n_cells, cell_iters, id_col)
        books = []
        for s in range(n_sub):
            sub = codes.select(
                id_col, F.slice("codes", s * w + 1, w).alias("codes"))
            books.append(_kmeans_train(sub, pq_k, pq_iters, id_col)[1])
        qrow = codes.filter(F.col(id_col) == query_vec_id).collect()
        if not qrow:
            raise ValueError(f"query id {query_vec_id} not in corpus")
        qc = [int(x) for x in qrow[0]["codes"]]
        probe_cells = [cid for _, cid in sorted(
            (_sqdist(qc, cv), cid) for cid, cv in coarse)[:nprobe]]
        luts = [[_sqdist(qc[s * w:(s + 1) * w], cv) for _, cv in books[s]]
                for s in range(n_sub)]
        scan = codes.select(
            id_col,
            _argmin_code(F.col("codes"), coarse).alias("cell"),
            *[_argmin_code(F.slice("codes", s * w + 1, w), books[s])
              .alias(f"__c{s}") for s in range(n_sub)])
        adc = None
        for s in range(n_sub):
            lut = F.array(*[F.lit(int(v)).cast("long") for v in luts[s]])
            term = F.element_at(lut, F.col(f"__c{s}") + 1)
            adc = term if adc is None else adc + term
        return (scan.filter(F.col("cell").isin(probe_cells))
                .withColumn("adc_dist", adc)
                .select(id_col, "cell", "adc_dist")
                .orderBy("adc_dist", id_col)
                .limit(k))
    finally:
        codes.unpersist()


def cluster_sizes(assigned: DataFrame) -> DataFrame:
    """Per-cluster row counts (the budget input for cluster-aware
    sampling/dedup). One map-side-combined groupBy on a k-value key."""
    return assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members"))


def semdedup(emb: DataFrame, k: int = KMEANS_K, iters: int = KMEANS_ITERS,
             threshold: float = 0.4, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster the embedding space, then
    prune near-duplicates WITHIN each cluster only — the clustering is
    what turns an O(n²) corpus-wide similarity search into k
    independent O((n/k)²) problems. A row is dropped when any
    LOWER-id row in its cluster has cosine ≥ threshold (keep-first,
    the same canonical-min convention as dedup.dedup_decisions).

    Plan: the pair search is an EQUI-join on the cluster id — quadratic
    only within a cluster, never across the corpus (plan-asserted: no
    cartesian). At 10^10 vectors, k scales with n (n/k stays bounded,
    SemDeDup uses ~100k clusters) and a degenerate hot cluster gets
    sub-bucketed by sign bits exactly like similarity.
    embedding_neardup_bucketed — same defense, composed.

    Returns every input row with (id, cluster, keep)."""
    from .similarity import dot_expr, with_norm

    assigned = kmeans_int8(emb, k=k, iters=iters, id_col=id_col,
                           vec_col=vec_col).select(id_col, "cluster")
    base = with_norm(emb, vec_col).select(id_col, "v", "nrm")
    withc = assigned.join(base, id_col)
    a = withc.select(F.col(id_col).alias("id_a"), "cluster",
                     F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = withc.select(F.col(id_col).alias("id_b"), "cluster",
                     F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    cos = F.round(dot_expr(F.col("va"), F.col("vb"))
                  / (F.col("na") * F.col("nb")), 6)
    dups = (a.join(b, ["cluster"])
            .filter(F.col("id_a") < F.col("id_b"))
            .filter(cos >= F.lit(float(threshold)))
            .select(F.col("id_b").alias(id_col)).distinct()
            .withColumn("__dup", F.lit(True)))
    return (withc.select(id_col, "cluster")
            .join(dups, id_col, "left")
            .select(id_col, "cluster",
                    F.col("__dup").isNull().alias("keep")))
