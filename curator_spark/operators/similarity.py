"""Similarity search over embedding columns (`array<float>`).

Brute-force cosine top-k is the correctness baseline; sign-bucket LSH
(random-hyperplane-style coarse quantization on leading dimensions) is
the scale path: bucket the corpus once, probe only the query's bucket.

Numeric determinism: elements are cast float→double (exact) BEFORE any
arithmetic, and dot products are sequential left folds (`F.aggregate`),
so Spark and the DuckDB oracle produce bit-identical doubles; results
are rounded to 6 decimals anyway.

Scale shape (10^10 vectors): brute force is one broadcast of the query
+ a narrow map + TakeOrderedAndProject (no shuffle of the corpus);
bucketed ANN prunes the scan to one bucket — with the bucket as a
partition column, partition pruning skips everything else at the source.
embedding_neardup_pairs is O(n²)/bucket — only ever run it per-bucket
(or on LSH candidates), never on a raw 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

N_SIGN_BITS = 8


def _dvec(col: Column) -> Column:
    """float[] → double[] (exact widening, makes both engines identical)."""
    return F.transform(col, lambda x: x.cast("double"))


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product — deterministic summation order."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    d = _dvec(F.col(vec_col))
    return emb.withColumn("v", d).withColumn("nrm", norm_expr(F.col("v")))


def cosine_topk(emb: DataFrame, query_vec_id: int, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Brute-force cosine top-k vs one stored vector.

    Plan: 1-row query side broadcast; corpus side is a narrow map
    (dot + norms) into TakeOrderedAndProject — zero corpus shuffle."""
    base = with_norm(emb, vec_col)
    q = (base.filter(F.col(id_col) == query_vec_id)
         .select(F.col("v").alias("qv"), F.col("nrm").alias("qn")))
    return (
        base.crossJoin(F.broadcast(q))
        .withColumn("cos_sim", F.round(
            dot_expr(F.col("v"), F.col("qv")) / (F.col("nrm") * F.col("qn")), 6))
        .select(id_col, "cos_sim")
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def sign_bucket_expr(vec_col: str = "embedding",
                     n_bits: int = N_SIGN_BITS) -> Column:
    """LSH bucket id: sign bits of the first n_bits dimensions.

    A fixed-axis random-hyperplane sketch (axes ARE random directions for
    trained embeddings). At scale this is the partition column."""
    bits = [F.when(F.element_at(F.col(vec_col), i + 1) >= 0, F.lit("1"))
            .otherwise(F.lit("0")) for i in range(n_bits)]
    return F.concat(*bits)


def signbucket_ann(emb: DataFrame, query_vec_id: int, k: int = 5,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Bucketed ANN: probe only the query's sign bucket, exact cosine
    within it. With `bucket` as a partition column the filter becomes
    partition pruning — the 100 TB corpus scan reads one bucket."""
    base = with_norm(emb, vec_col).withColumn("bucket", sign_bucket_expr(vec_col))
    q = (base.filter(F.col(id_col) == query_vec_id)
         .select(F.col("v").alias("qv"), F.col("nrm").alias("qn"),
                 F.col("bucket").alias("qbucket")))
    return (
        base.join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .withColumn("cos_sim", F.round(
            dot_expr(F.col("v"), F.col("qv")) / (F.col("nrm") * F.col("qn")), 6))
        .select(id_col, "bucket", "cos_sim")
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def write_bucketed(emb: DataFrame, path: str, vec_col: str = "embedding",
                   n_bits: int = N_SIGN_BITS) -> None:
    """Materialize the corpus partitioned by sign bucket — the 100 TB
    layout: an ANN probe then reads exactly one partition directory."""
    (emb.withColumn("bucket", sign_bucket_expr(vec_col, n_bits))
     .write.mode("overwrite").partitionBy("bucket").parquet(path))


def signbucket_ann_pruned(spark, bucketed_path: str, query_vec,
                          k: int = 5, id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """ANN probe against a bucket-partitioned corpus: the bucket filter
    becomes PartitionFilters at the scan (asserted in test_plans-style
    tests) — the corpus outside the probe bucket is never read.

    query_vec: python list[float] — the query arrives as a literal, so
    its bucket is computable driver-side and prunes statically."""
    qb = "".join("1" if x >= 0 else "0" for x in query_vec[:N_SIGN_BITS])
    qv = [float(x) for x in query_vec]
    qn = sum(x * x for x in qv) ** 0.5
    base = spark.read.parquet(bucketed_path).filter(F.col("bucket") == qb)
    base = with_norm(base, vec_col)
    dot = F.aggregate(
        F.zip_with(F.col("v"), F.array(*[F.lit(x) for x in qv]),
                   lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)
    return (
        base.withColumn("cos_sim", F.round(dot / (F.col("nrm") * F.lit(qn)), 6))
        .select(id_col, "bucket", "cos_sim")
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


N_IVF_CELLS = 16


def ivf_assign(emb: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id") -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest
    centroid by cosine (deterministic tie-break on lowest cell id).

    centroids: (cell:int, cv:array<double>, cn:double). The codebook is
    driver-small by construction (n_cells entries — an IVF codebook is
    always tiny relative to the corpus), so it is collected once and
    folded into the plan as literal columns: the assignment becomes ONE
    narrow map computing all cell similarities and taking the argmax
    via array_max over (csim, -cell) structs — zero shuffle, zero
    per-vector window. (The previous form — broadcast cross join +
    row_number window partitioned by vec_id — shuffled an n_cells×
    -inflated copy of the corpus just to pick the argmax.)

    Numerics identical to the oracle: same sequential-fold dot product
    per centroid, round(·, 9) before comparison."""
    cents = sorted(centroids.select("cell", "cv", "cn").collect(),
                   key=lambda r: r["cell"])
    base = with_norm(emb)
    entries = []
    for r in cents:
        cv = F.array(*[F.lit(float(x)) for x in r["cv"]])
        sim = dot_expr(F.col("v"), cv) / (F.col("nrm") * F.lit(float(r["cn"])))
        entries.append(F.struct(F.round(sim, 9).alias("csim"),
                                F.lit(-int(r["cell"])).alias("neg_cell")))
    # struct max: highest csim, then highest neg_cell == lowest cell
    best = F.array_max(F.array(*entries))
    return (
        base.select(id_col, "v", "nrm",
                    (-best["neg_cell"]).cast("int").alias("cell"))
        .select(id_col, "cell", "v", "nrm")
    )


def seed_centroids(emb: DataFrame, n_cells: int = N_IVF_CELLS,
                   id_col: str = "vec_id") -> DataFrame:
    """Deterministic centroids: the vectors with the n_cells smallest
    ids (a fixed coarse codebook; swap for k-means offline at scale)."""
    return (with_norm(emb).filter(F.col(id_col) < n_cells)
            .select(F.col(id_col).cast("int").alias("cell"),
                    F.col("v").alias("cv"), F.col("nrm").alias("cn")))


def ivf_ann(emb: DataFrame, query_vec_id: int, k: int = 5,
            n_cells: int = N_IVF_CELLS, id_col: str = "vec_id") -> DataFrame:
    """IVF probe: exact cosine within the query's cell only."""
    cents = seed_centroids(emb, n_cells, id_col)
    assigned = ivf_assign(emb, cents, id_col)
    q = (assigned.filter(F.col(id_col) == query_vec_id)
         .select(F.col("v").alias("qv"), F.col("nrm").alias("qn"),
                 F.col("cell").alias("qcell")))
    return (
        assigned.join(F.broadcast(q), F.col("cell") == F.col("qcell"))
        .withColumn("cos_sim", F.round(
            dot_expr(F.col("v"), F.col("qv")) / (F.col("nrm") * F.col("qn")), 6))
        .select(id_col, "cell", "cos_sim")
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def embedding_neardup_pairs(emb: DataFrame, threshold: float = 0.8,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """All pairs (id_a < id_b) with cosine ≥ threshold — embedding-space
    near-duplicate detection. Brute-force O(n²); the exact-recall
    correctness baseline. NEVER call on a raw corpus at scale — use
    embedding_neardup_bucketed (LSH recall tradeoff) or feed this only
    a bounded candidate set."""
    base = with_norm(emb, vec_col)
    a = base.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"),
                    F.col("nrm").alias("na"))
    b = base.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"),
                    F.col("nrm").alias("nb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(
            dot_expr(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def embedding_neardup_bucketed(emb: DataFrame, threshold: float = 0.8,
                               id_col: str = "vec_id",
                               vec_col: str = "embedding",
                               n_bits: int = N_SIGN_BITS) -> DataFrame:
    """Near-duplicate pairs WITHIN each sign bucket — the scale path.

    The all-pairs comparison happens only inside LSH buckets: the join
    is an equi-join on the bucket key (one shuffle on bucket, quadratic
    only per bucket, never across the corpus). With 2^n_bits uniform
    buckets the candidate volume drops by ~2^n_bits vs the global cross
    join; recall is the standard random-hyperplane LSH tradeoff (true
    near-dups with many flipped sign bits are missed — raise n_bits'
    band count or multi-probe for recall at scale)."""
    base = (with_norm(emb, vec_col)
            .withColumn("bucket", sign_bucket_expr(vec_col, n_bits)))
    a = base.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"),
                    F.col("nrm").alias("na"), F.col("bucket"))
    b = base.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"),
                    F.col("nrm").alias("nb"), F.col("bucket").alias("bucket_b"))
    return (
        a.join(b, F.col("bucket") == F.col("bucket_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(
            dot_expr(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "bucket", "cos_sim")
    )


def _flip_bit(bucket: Column, i: int, n_bits: int) -> Column:
    """Bucket string with bit i (0-based) flipped."""
    ch = F.substring(bucket, i + 1, 1)
    flipped = F.when(ch == "1", F.lit("0")).otherwise(F.lit("1"))
    return F.concat(F.substring(bucket, 1, i), flipped,
                    F.substring(bucket, i + 2, n_bits - i - 1))


def probe_buckets_expr(vec_col: str = "embedding",
                       n_bits: int = N_SIGN_BITS,
                       radius: int = 1) -> Column:
    """Array of the vector's sign bucket plus every bucket within
    Hamming distance ≤ radius (radius ∈ {0, 1}) — the multi-probe set.
    A narrow column expression: probing multiplies ONE join side by
    (1 + n_bits), never the corpus itself."""
    base = sign_bucket_expr(vec_col, n_bits)
    probes = [base]
    if radius >= 1:
        probes += [_flip_bit(base, i, n_bits) for i in range(n_bits)]
    return F.array(*probes)


def embedding_neardup_multiprobe(emb: DataFrame, threshold: float = 0.8,
                                 id_col: str = "vec_id",
                                 vec_col: str = "embedding",
                                 n_bits: int = N_SIGN_BITS,
                                 radius: int = 1) -> DataFrame:
    """Near-duplicate pairs with MULTI-PROBE recall: side A explodes
    into its Hamming-ball-≤radius probe buckets, side B keeps its base
    bucket, so any pair whose sign sketches differ in ≤radius bits
    meets in some bucket — recovering exactly the near-dups that
    single-bucket LSH loses to one flipped sign bit (vectors sitting
    close to a hyperplane). Still an equi-join on the bucket key: probe
    fan-out is (1 + n_bits)× on one side only, quadratic work stays
    per-bucket, and the pair dedup key (id_a, id_b) removes the ≤1
    duplicate a radius-1 ball can produce. Measured recall vs the exact
    O(n²) baseline is pytest-gated (tests/test_operators.py)."""
    base = (with_norm(emb, vec_col)
            .withColumn("bucket", sign_bucket_expr(vec_col, n_bits)))
    a = (base.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"),
                     F.col("nrm").alias("na"),
                     F.explode(probe_buckets_expr(vec_col, n_bits, radius))
                     .alias("bucket")))
    b = base.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"),
                    F.col("nrm").alias("nb"), F.col("bucket").alias("bucket_b"))
    return (
        a.join(b, F.col("bucket") == F.col("bucket_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("cos_sim", F.round(
            dot_expr(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def signbucket_ann_multiprobe(emb: DataFrame, query_vec_id: int, k: int = 5,
                              n_probes: int = 4,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              n_bits: int = N_SIGN_BITS) -> DataFrame:
    """Top-k ANN probing the query's bucket plus the n_probes-1 buckets
    ranked by boundary distance — flip the sign bits whose coordinate
    magnitude is SMALLEST (the classic multi-probe LSH ordering: a
    near-zero coordinate is the one most likely to flip on a true
    neighbor). The 1-row query is collected driver-side (documented,
    like ivf_assign's codebook) so the probe set becomes a static IN
    filter — against a bucket-partitioned corpus it partition-prunes to
    exactly n_probes directories."""
    q = (with_norm(emb, vec_col).filter(F.col(id_col) == query_vec_id)
         .select("v", "nrm").collect())
    if not q:
        raise ValueError(f"query vector {query_vec_id} not found")
    qv, qn = list(q[0]["v"]), float(q[0]["nrm"])
    bits = ["1" if x >= 0 else "0" for x in qv[:n_bits]]
    base_bucket = "".join(bits)
    order = sorted(range(n_bits), key=lambda i: abs(qv[i]))
    probes = [base_bucket]
    for i in order[:max(n_probes - 1, 0)]:
        b = bits.copy()
        b[i] = "0" if b[i] == "1" else "1"
        probes.append("".join(b))

    corpus = (with_norm(emb, vec_col)
              .withColumn("bucket", sign_bucket_expr(vec_col, n_bits))
              .filter(F.col("bucket").isin(probes)))
    dot = F.aggregate(
        F.zip_with(F.col("v"), F.array(*[F.lit(float(x)) for x in qv]),
                   lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)
    return (
        corpus.withColumn("cos_sim", F.round(dot / (F.col("nrm") * F.lit(qn)), 6))
        .select(id_col, "bucket", "cos_sim")
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def quantize_int8(emb: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Symmetric per-vector int8 quantization: codes = round(x/s·127)
    with s = max|x_i| — the standard 4× storage/bandwidth reduction for
    billion-scale ANN corpora (reconstruction x' = codes·s/127, error
    ≤ s/254 per component). Pure narrow map, exact integer codes that a
    SQL oracle replicates bit-for-bit; `scale` rides along for
    dequantization. Zero vectors quantize to all-zero codes.

    codes are array<tinyint> — values are guaranteed in [-127, 127], and
    anything wider would silently forfeit the storage reduction this
    operator exists for. v and scale are materialized as columns first
    (the with_norm pattern) so the per-element lambda references
    attributes instead of re-evaluating the O(d) max per element."""
    staged = (emb
              .withColumn("__v", _dvec(F.col(vec_col)))
              .withColumn("__s", F.greatest(
                  F.array_max(F.transform(F.col("__v"), F.abs)),
                  F.lit(1e-30))))
    codes = F.transform(
        F.col("__v"), lambda x: F.round(x / F.col("__s") * 127).cast("byte"))
    return staged.select(
        id_col,
        codes.alias("codes"),
        F.col("__s").alias("scale"),
    )


def knn_join(queries: DataFrame, corpus: DataFrame, k: int = 3,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_bits: int = N_SIGN_BITS, radius: int = 1) -> DataFrame:
    """Batched KNN join: for EVERY query vector, its top-k nearest
    corpus neighbors by cosine — the RAG-retrieval / hard-negative-
    mining primitive (cosine_topk serves ONE query; this serves a whole
    query table against the corpus in a single job).

    Scale path: multi-probe sign-bucket LSH. The query side explodes
    into its Hamming-ball-≤radius probe buckets ((1+n_bits)× the query
    table only — never the corpus), the corpus keeps one bucket per
    row, and candidates come from an EQUI-join on the bucket key: one
    shuffle per side on a uniform key, never an M×N product. Each
    (query, neighbor) pair meets at most once (the probe buckets of one
    query are pairwise distinct and a corpus row has one bucket), so no
    dedup pass is needed. Per-query top-k is a window over the
    candidate set — partitioned on query id (uniform by definition)
    with a total-order tiebreak (cos_sim desc, neighbor id asc) so
    ranks are deterministic across engines and partitionings.

    Recall is the multi-probe LSH tradeoff, pytest-gated like
    embedding_neardup_multiprobe; knn_join_exact is the O(M×N) exact
    baseline. Queries whose probe ball hits no corpus bucket return no
    rows (top-k of an empty candidate set).

    Reference analogue: the batched per-row payload fan-out
    (src/bespokelabs/curator/request_processor — every input row gets
    its own lookup), re-expressed as one distributed join."""
    from pyspark.sql import Window

    q = (with_norm(queries, vec_col)
         .select(F.col(id_col).alias("query_id"), F.col("v").alias("qv"),
                 F.col("nrm").alias("qn"),
                 F.explode(probe_buckets_expr(vec_col, n_bits, radius))
                 .alias("bucket")))
    c = (with_norm(corpus, vec_col)
         .withColumn("bucket_c", sign_bucket_expr(vec_col, n_bits))
         .select(F.col(id_col).alias("neighbor_id"), F.col("v").alias("cv"),
                 F.col("nrm").alias("cn"), "bucket_c"))
    cand = (
        q.join(c, F.col("bucket") == F.col("bucket_c"))
        .withColumn("cos_sim", F.round(
            dot_expr(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6))
        .select("query_id", "neighbor_id", "cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (cand.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k))


def knn_join_exact(queries: DataFrame, corpus: DataFrame, k: int = 3,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Exact batched KNN: broadcast the (small) query table across the
    corpus — a narrow map per corpus partition, then the same per-query
    top-k window. O(M×N) similarity evaluations: the exact-recall
    baseline for knn_join's measured recall gate. Only ever run with a
    driver-small query side; at scale the broadcast IS the point (zero
    corpus shuffle before the window)."""
    from pyspark.sql import Window

    q = (with_norm(queries, vec_col)
         .select(F.col(id_col).alias("query_id"), F.col("v").alias("qv"),
                 F.col("nrm").alias("qn")))
    c = (with_norm(corpus, vec_col)
         .select(F.col(id_col).alias("neighbor_id"), F.col("v").alias("cv"),
                 F.col("nrm").alias("cn")))
    cand = (
        c.crossJoin(F.broadcast(q))
        .withColumn("cos_sim", F.round(
            dot_expr(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6))
        .select("query_id", "neighbor_id", "cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (cand.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k))


def bitext_margin_pairs(emb: DataFrame, k: int = 4,
                        threshold: float = 1.05, n_bits: int = 4,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        mutual: bool = False) -> DataFrame:
    """Margin-based bitext mining (LASER/CCMatrix-style): mine aligned
    pairs between two embedding corpora by RATIO margin — cos(x, y)
    divided by the mean of each side's top-k neighborhood similarity —
    rather than raw cosine, which over-selects hubs (vectors close to
    everything). A pair survives only if it is its source's best match
    AND beats both sides' neighborhood average by `threshold`.

    The two "languages" are the even/odd id halves of the corpus — the
    deterministic stand-in for (e.g.) an English and a German snapshot;
    at scale the two sides are two real tables and the same plan holds.

    Scale shape: candidates come from a sign-bucket equi-join (never
    all pairs); per-side neighborhood stats are per-key windows over
    bucket-bounded candidate lists; the forward-best election is one
    more per-src window. Three shuffles, all on high-cardinality keys,
    no product. Reference parity: the reference's payload-level dataset
    alignment (prompt↔response pairing) is driver-side; this is the
    corpus-level analogue for mining parallel training data.
    """
    from pyspark.sql import Window

    base = with_norm(emb, vec_col).withColumn(
        "bucket", sign_bucket_expr(vec_col, n_bits))
    src = (base.filter(F.col(id_col) % 2 == 0)
           .select(F.col(id_col).alias("src_id"), F.col("v").alias("sv"),
                   F.col("nrm").alias("sn"), "bucket"))
    tgt = (base.filter(F.col(id_col) % 2 == 1)
           .select(F.col(id_col).alias("tgt_id"), F.col("v").alias("tv"),
                   F.col("nrm").alias("tn"), "bucket"))
    cand = (src.join(tgt, "bucket")
            .withColumn("cos6", F.round(
                dot_expr(F.col("sv"), F.col("tv"))
                / (F.col("sn") * F.col("tn")), 6))
            .select("src_id", "tgt_id", "cos6"))
    w_s = Window.partitionBy("src_id").orderBy(
        F.col("cos6").desc(), F.col("tgt_id").asc())
    w_t = Window.partitionBy("tgt_id").orderBy(
        F.col("cos6").desc(), F.col("src_id").asc())
    ranked = (cand.withColumn("r_s", F.row_number().over(w_s))
              .withColumn("r_t", F.row_number().over(w_t)))
    pen = (ranked
           .withColumn("p_src", F.avg(
               F.when(F.col("r_s") <= k, F.col("cos6")))
               .over(Window.partitionBy("src_id")))
           .withColumn("p_tgt", F.avg(
               F.when(F.col("r_t") <= k, F.col("cos6")))
               .over(Window.partitionBy("tgt_id"))))
    scored = pen.withColumn("margin", F.round(
        F.col("cos6") / ((F.col("p_src") + F.col("p_tgt")) / 2), 6))
    w_best = Window.partitionBy("src_id").orderBy(
        F.col("margin").desc(), F.col("tgt_id").asc())
    out = (scored.withColumn("rb", F.row_number().over(w_best))
           .filter((F.col("rb") == 1) & (F.col("margin") >= threshold)))
    if mutual:
        # CCMatrix's stricter election: the pair survives only if the
        # TARGET also ranks this source first by margin — one more
        # per-tgt window over the already-thinned forward-best set
        w_back = Window.partitionBy("tgt_id").orderBy(
            F.col("margin").desc(), F.col("src_id").asc())
        out = (out.withColumn("rt", F.row_number().over(w_back))
               .filter(F.col("rt") == 1))
    # no trailing orderBy: row order is presentation, and a global
    # sort is a real range-partition shuffle of the whole result —
    # callers that need order ask for it
    return out.select("src_id", "tgt_id",
                      F.col("cos6").alias("cos_sim"), "margin")


def hard_negative_mining(emb: DataFrame, k: int = 5, n_bits: int = 4,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         label_col: str = "label") -> DataFrame:
    """Hard-negative mining for contrastive/embedding training: for
    every anchor, the top-k most-similar vectors with a DIFFERENT
    label — the negatives that actually move a contrastive loss
    (random negatives are trivially separable; hardest-k is the
    standard curriculum, cf. dense-retrieval trainers like DPR/ANCE).

    Scale shape: candidates from the sign-bucket equi-join (the same
    family as every ANN op here — never all pairs), the label
    inequality rides the join as a residual filter, and the per-anchor
    top-k is one window over bucket-bounded candidates. At 10^10
    vectors bucket is the partition column; raise n_bits so buckets
    fit, and union multi-probe neighbors if recall needs it.
    """
    from pyspark.sql import Window

    base = (with_norm(emb, vec_col)
            .withColumn("bucket", sign_bucket_expr(vec_col, n_bits)))
    a = base.select(F.col(id_col).alias("anchor_id"),
                    F.col("v").alias("av"), F.col("nrm").alias("an"),
                    F.col(label_col).alias("anchor_label"), "bucket")
    b = base.select(F.col(id_col).alias("negative_id"),
                    F.col("v").alias("bv"), F.col("nrm").alias("bn"),
                    F.col(label_col).alias("neg_label"), "bucket")
    cand = (a.join(b, "bucket")
            .filter(F.col("anchor_label") != F.col("neg_label"))
            .withColumn("cos_sim", F.round(
                dot_expr(F.col("av"), F.col("bv"))
                / (F.col("an") * F.col("bn")), 6)))
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cos_sim").desc(), F.col("negative_id").asc())
    return (cand.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("anchor_id", "anchor_label", "negative_id",
                    "neg_label", "cos_sim",
                    F.col("rnk").cast("integer").alias("rnk")))
