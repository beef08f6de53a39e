"""Dedup + similarity query battery with DuckDB oracles.

Wraps curator_spark.operators.{dedup,similarity} over the driver's
`documents` / `embeddings` tables. Every oracle replicates the md5-based
hashing and the double-precision fold order exactly (see the operator
modules for why the two engines agree bit-for-bit before rounding).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from .operators import dedup, similarity

JACCARD_N = 3
JACCARD_THRESHOLD = 0.5
NEARDUP_COS = 0.40
ANN_QUERY_ID = 0


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def q18_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.jaccard_pairs(_docs(spark, sf_dir), n=JACCARD_N,
                               threshold=JACCARD_THRESHOLD)


def q19_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.lsh_candidate_pairs(_docs(spark, sf_dir), n=JACCARD_N)


def q20_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash(_docs(spark, sf_dir))


def q21_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.cosine_topk(_emb(spark, sf_dir), ANN_QUERY_ID, k=10)


def q22_signbucket_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.signbucket_ann(_emb(spark, sf_dir), ANN_QUERY_ID, k=5)


def q23_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs per sign bucket (equi-join on the LSH
    bucket key — the scale path; the global cross join exists only as
    the exact-recall baseline in embedding_neardup_pairs)."""
    return similarity.embedding_neardup_bucketed(_emb(spark, sf_dir),
                                                 threshold=NEARDUP_COS)


def q24_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.dedup_decisions(_docs(spark, sf_dir), n=JACCARD_N,
                                 threshold=JACCARD_THRESHOLD)




def q31_conv_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline × dedup composition: documents → transcripts shape →
    conversations reassembled in turn order → full dedup decision per
    conversation. Oracle = the same parameterized dedup SQL over a
    SQL-reassembled conversation relation."""
    from .ingest import docs_to_transcripts
    turns = docs_to_transcripts(_docs(spark, sf_dir))
    return dedup.dedup_conversations(turns, text_col="text",
                                     n=JACCARD_N, threshold=JACCARD_THRESHOLD)


def q32_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: deterministic coarse codebook (first 16 vectors),
    cosine cell assignment, exact search inside the probe cell only —
    the scale path where `cell` is the partition column."""
    return similarity.ivf_ann(_emb(spark, sf_dir), ANN_QUERY_ID, k=5)


def q39_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive dedup via connected components (operators/graph.py):
    near-dup graph = exact-dup star edges ∪ LSH-candidates verified by
    exact Jaccard; every doc labeled with its component's minimum id;
    keep ⇔ canonical. The iterative-operator class (driver loop of
    join+groupBy rounds, diameter-bounded) the pair-wise q24 decision
    approximates. Oracle = recursive-CTE min-label reachability."""
    from pyspark.sql import functions as F

    from .operators.graph import dedup_components
    docs = _docs(spark, sf_dir)
    hashed = docs.select("doc_id", F.md5(F.col("text")).alias("h"))
    canon = hashed.groupBy("h").agg(F.min("doc_id").alias("canonical_id"))
    exact_edges = (hashed.join(canon, "h")
                   .filter(F.col("doc_id") != F.col("canonical_id"))
                   .select(F.col("canonical_id").alias("id_a"),
                           F.col("doc_id").alias("id_b")))
    cands = dedup.lsh_candidate_pairs(_docs(spark, sf_dir), n=JACCARD_N)
    verified = dedup.jaccard_pairs(_docs(spark, sf_dir), n=JACCARD_N,
                                   threshold=JACCARD_THRESHOLD)
    near_edges = (cands.join(verified, ["id_a", "id_b"])
                  .select("id_a", "id_b"))
    edges = exact_edges.unionByName(near_edges).distinct()
    return dedup_components(docs, edges)


def q50_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space transitive dedup, end to end: multi-probe LSH
    near-dup pairs (q49's operator) become the edge set of a
    connected-components clustering (q39's operator), every vector is
    labeled with its semantic cluster's minimum id, keep ⇔ canonical.
    This is the semantic twin of q39's lexical pipeline — the two
    compose the same way at 100 TB (bucketed pair generation feeds the
    O(log n) clustering; no stage touches an all-pairs product).
    Oracle = the multi-probe pair SQL feeding a recursive-CTE min-label
    reachability."""
    from .operators.graph import dedup_components
    emb = _emb(spark, sf_dir)
    pairs = similarity.embedding_neardup_multiprobe(emb,
                                                    threshold=NEARDUP_COS)
    return dedup_components(emb, pairs, id_col="vec_id")


def q49_multiprobe_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs with radius-1 multi-probe recall
    (operators/similarity.embedding_neardup_multiprobe): side A explodes
    into its Hamming-ball probe buckets so pairs whose sign sketches
    differ in one bit — lost by q23's single-bucket join — are found.
    Oracle replays the probe expansion in SQL (base bucket UNION ALL
    the 8 one-bit flips) with DISTINCT pair dedup."""
    return similarity.embedding_neardup_multiprobe(_emb(spark, sf_dir),
                                                   threshold=NEARDUP_COS)


DUP_SPAN_MIN_DF = 2
PACK_BUDGET = 128
PACK_BUCKETS = 8


def q88_remove_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-span exact-substring dedup (Lee et al. 2021): cut every
    token covered by ANY corpus-duplicated sliding 5-gram window, so
    overlapping duplicated windows merge into one maximal removed span
    — the suffix-array span semantics q70's disjoint fixed segments
    approximate. See operators/dedup.remove_duplicate_spans for the
    two-shuffle plan shape."""
    return dedup.remove_duplicate_spans(_docs(spark, sf_dir), n=5,
                                        min_df=2)


BATCH_SIZE = 32


def q106_sorted_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-sorted batching + padding-waste accounting
    (operators/packing.length_sorted_batches over the scale-safe
    global_rank): rank docs by (token count desc, doc_id), cut into
    32-doc batches, emit each batch's padding economics. The
    inference/training-batch face of the packing family (q52 packs to
    a token budget; this packs to a slot count and MEASURES the pad
    waste sorted batching removes). Oracle = the plain global
    row_number formulation, exact at oracle scale."""
    from .operators.packing import length_sorted_batches
    docs = _docs(spark, sf_dir)
    toks = F.filter(F.split(F.lower(F.col("text")), " "),
                    lambda t: t != "")
    sized = docs.select("doc_id", F.size(toks).alias("n_tokens"))
    return length_sorted_batches(sized, batch_size=BATCH_SIZE)


_SORTED_BATCH_SQL = f"""
    WITH sized AS (
        SELECT doc_id,
               len(list_filter(string_split(lower(text), ' '),
                               t -> t <> '')) AS n_tokens
        FROM documents
    ), ranked AS (
        SELECT doc_id, n_tokens,
               row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS r
        FROM sized
    )
    SELECT ((r - 1) // {BATCH_SIZE})::BIGINT AS batch_id,
           count(*) AS n_docs,
           max(n_tokens) AS max_len,
           sum(n_tokens)::BIGINT AS sum_len,
           (count(*) * max(n_tokens) - sum(n_tokens))::BIGINT AS pad_waste
    FROM ranked
    GROUP BY 1
"""


PRIORITY_PREFIX_TOKENS = 8


def q107_priority_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority-aware cross-source dedup (operators/dedup.
    dedup_by_priority): duplicates keep the copy from the
    MOST-TRUSTED source, not the lowest doc_id — The Pile/RedPajama
    rule for pages appearing in both a curated dump and a raw crawl.
    Content key = md5 of the normalized 8-token opening prefix (the
    q97 opener-fingerprint rule lifted to documents — the fixture has
    no byte-exact cross-source duplicates, but 20+ prefix groups span
    sources at sf0.01); priority = the source's numeric suffix (src0
    most trusted). Election is ONE map-side-combined
    groupBy(fp).agg(min(struct(priority, doc_id))) + equi-join back —
    never a window over the fingerprint (a 10^7-copy boilerplate
    group is one reduced row). Oracle = the row_number-over-window
    formulation, proving the agg election picks identical canonicals."""
    docs = _docs(spark, sf_dir)
    toks = F.filter(F.split(F.lower(F.col("text")), " "),
                    lambda t: t != "")
    fp = F.md5(F.array_join(
        F.slice(toks, 1, PRIORITY_PREFIX_TOKENS), " "))
    pages = docs.select(
        "doc_id", "source",
        F.substring("source", 4, 10).cast("long").alias("priority"),
        fp.alias("fp"))
    out = dedup.dedup_by_priority(pages, "fp", "priority", "doc_id")
    return out.select(
        "doc_id", "source", "priority", "fp", "group_size",
        F.col("n_priorities").alias("n_sources"),
        F.col("canon_id").alias("canon_doc_id"), "is_canonical")


_PRIORITY_DEDUP_SQL = f"""
    WITH pages AS (
        SELECT doc_id, source,
               CAST(substr(source, 4) AS BIGINT) AS priority,
               md5(array_to_string(
                   (list_filter(string_split(lower(text), ' '),
                                t -> t <> ''))[1:{PRIORITY_PREFIX_TOKENS}],
                   ' ')) AS fp
        FROM documents
    ), elected AS (
        SELECT *,
               row_number() OVER (PARTITION BY fp
                                  ORDER BY priority, doc_id) AS rn,
               count(*) OVER (PARTITION BY fp) AS group_size,
               count(DISTINCT priority) OVER (PARTITION BY fp)
                   AS n_sources
        FROM pages
    ), canon AS (
        SELECT fp, doc_id AS canon_doc_id FROM elected WHERE rn = 1
    )
    SELECT e.doc_id, e.source, e.priority, e.fp, e.group_size,
           e.n_sources, c.canon_doc_id,
           e.doc_id = c.canon_doc_id AS is_canonical
    FROM elected e JOIN canon c USING (fp)
"""


WINNOW_K = 4
WINNOW_W = 8
WINNOW_MIN_SHARED = 2


def q105_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing near-dup pairs (operators/dedup.winnow_pairs; MOSS,
    Schleimer et al. 2003): per-doc windowed-min k-gram fingerprints
    (rightmost-min tie rule, guaranteed to hit any shared >= w+k-1
    word substring, density 2/(w+1)) selected entirely inside one
    narrow map, then one fingerprint equi-join + pair count. The
    positional sketch complement of q19's MinHash (global similarity)
    — winnowing localizes WHERE documents overlap. Oracle replays
    gram hashing, the arithmetic tie encoding, window mins, and the
    pair count in DuckDB list functions."""
    return dedup.winnow_pairs(_docs(spark, sf_dir), k=WINNOW_K,
                              w=WINNOW_W, min_shared=WINNOW_MIN_SHARED)


_WINNOW_SQL = f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '),
                           t -> t <> '') AS toks
        FROM documents
    ), grams AS (
        SELECT doc_id,
               CASE WHEN len(toks) - {WINNOW_K - 1} > 0 THEN
                 list_transform(
                     range(1, len(toks) - {WINNOW_K - 1} + 1),
                     i -> substr(md5(array_to_string(
                              toks[i:i+{WINNOW_K - 1}], ' ')), 1, 8)
                          || lpad((1000000 - i)::VARCHAR, 7, '0'))
               ELSE [] END AS g
        FROM toks
    ), sel AS (
        SELECT doc_id,
               CASE WHEN len(g) = 0 THEN []
                    WHEN len(g) < {WINNOW_W} THEN [list_min(g)]
                    ELSE list_transform(
                        range(1, len(g) - {WINNOW_W - 1} + 1),
                        j -> list_min(g[j:j+{WINNOW_W - 1}]))
               END AS s
        FROM grams
    ), fps AS (
        SELECT DISTINCT doc_id, substr(u.s, 1, 8) AS fp
        FROM sel, unnest(sel.s) AS u(s)
    )
    SELECT a.doc_id AS a, b.doc_id AS b,
           count(*) AS shared
    FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING count(*) >= {WINNOW_MIN_SHARED}
"""


FUZZY_SALT = "fz-v1"
FUZZY_KEY_LEN = 16


def _fuzzy_sides(spark: SparkSession, sf_dir: str):
    """Left = each doc's 16-char lowercased text prefix; right = the
    same key with ONE deterministic md5-chosen edit (substitute 'q' /
    delete / insert 'x' at an md5-chosen position). Both derivations
    are plain column expressions replicated literally in the oracle
    SQL, so the join is exercised on every edit kind."""
    docs = _docs(spark, sf_dir)
    key = F.lower(F.substring("text", 1, FUZZY_KEY_LEN))
    left = docs.select(F.col("doc_id").alias("l_id"), key.alias("l_key"))
    h = F.md5(F.concat(F.col("doc_id").cast("string"),
                       F.lit(":" + FUZZY_SALT)))
    a = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    b = F.conv(F.substring(h, 9, 4), 16, 10).cast("long")
    k = key
    n = F.length(k)
    p = (a % n).cast("int")  # 0-based edit position
    head = F.substring(k, F.lit(1), p)
    sub = F.concat(head, F.lit("q"), F.substring(k, p + 2, n))
    dele = F.concat(head, F.substring(k, p + 2, n))
    ins = F.concat(head, F.lit("x"), F.substring(k, p + 1, n))
    corrupted = (F.when(b % 3 == 0, sub)
                 .when(b % 3 == 1, dele)
                 .otherwise(ins))
    right = docs.select(F.col("doc_id").alias("r_id"),
                        corrupted.alias("r_key"))
    return left, right


def q103_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked edit-distance join (operators/fuzzy.fuzzy_join): all
    (clean-key, corrupted-key) pairs within Levenshtein distance 1 via
    symmetric-delete neighborhood blocking — explode both sides into
    {self + single-char deletions}, equi-join on the variant, verify
    candidates with exact JVM levenshtein. No stage forms a product
    (plan-asserted); recall is exact by the pigeonhole argument in the
    operator docstring. Oracle = the brute-force cross join with the
    same levenshtein predicate, exact at oracle scale."""
    from .operators.fuzzy import fuzzy_join
    left, right = _fuzzy_sides(spark, sf_dir)
    return fuzzy_join(left, right)


_FUZZY_SQL = f"""
    WITH l AS (
        SELECT doc_id AS l_id,
               lower(substr(text, 1, {FUZZY_KEY_LEN})) AS l_key
        FROM documents
    ), seed AS (
        SELECT doc_id AS r_id,
               lower(substr(text, 1, {FUZZY_KEY_LEN})) AS k,
               ('0x' || substr(md5(doc_id::VARCHAR || ':{FUZZY_SALT}'),
                               1, 8))::BIGINT AS a,
               ('0x' || substr(md5(doc_id::VARCHAR || ':{FUZZY_SALT}'),
                               9, 4))::BIGINT AS b
        FROM documents
    ), r AS (
        SELECT r_id,
               CASE
                 WHEN b % 3 = 0 THEN
                   substr(k, 1, (a % length(k))::INT) || 'q'
                   || substr(k, (a % length(k))::INT + 2, length(k))
                 WHEN b % 3 = 1 THEN
                   substr(k, 1, (a % length(k))::INT)
                   || substr(k, (a % length(k))::INT + 2, length(k))
                 ELSE
                   substr(k, 1, (a % length(k))::INT) || 'x'
                   || substr(k, (a % length(k))::INT + 1, length(k))
               END AS r_key
        FROM seed
    )
    SELECT l_id, r_id, levenshtein(l_key, r_key) AS dist
    FROM l CROSS JOIN r
    WHERE levenshtein(l_key, r_key) <= 1
"""


def q51_dup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span statistics (operators/dedup.duplicate_span_stats):
    per doc, the fraction of its distinct word n-grams occurring in >= 2
    documents corpus-wide — the shingle-df reformulation of exact
    substring span dedup (Lee et al. 2021). Two shuffles on uniform
    keys (shingle, doc), no all-pairs product."""
    return dedup.duplicate_span_stats(_docs(spark, sf_dir), n=JACCARD_N,
                                      min_df=DUP_SPAN_MIN_DF)


def q70_remove_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate span removal (operators/dedup.
    remove_duplicate_segments): every 12-word segment occurring in ≥2
    distinct docs is deleted and the doc is rewritten from the
    survivors in original order — the destructive counterpart of q51's
    span statistics (C4 line dedup / Lee et al. span cutting). The
    oracle rebuilds each doc with the identical segmentation and
    frequency rule, so the rewritten text is verified byte-exact."""
    return dedup.remove_duplicate_segments(_docs(spark, sf_dir))


def q52_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing (operators/packing.pack_sequences):
    next-fit packing of docs into fixed token-budget sequences within
    deterministic hash buckets — text pruned to (id, bucket, n_tokens)
    before the one shuffle; sequential fill runs per bucket inside
    applyInPandas. Oracle = recursive-CTE replay of the next-fit
    recurrence per bucket."""
    from .operators.packing import pack_sequences
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    return pack_sequences(docs, budget=PACK_BUDGET, n_buckets=PACK_BUCKETS)


SEG_BUDGET = 40


def q55_context_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length windowing (operators/packing.segment_conversations):
    documents → transcripts derivation, then greedy next-fit slicing of
    each conversation into token-budget windows in turn order (turn
    boundaries never split; an over-budget turn sits alone) — the
    SFT/inference-prep op of fitting long transcripts into a model
    context. One shuffle on conv_id with text pruned to (conv, turn,
    n_tokens) below it. Oracle = recursive-CTE replay of the
    per-conversation next-fit recurrence over the same turns
    derivation."""
    from .ingest import docs_to_transcripts
    from .operators.packing import segment_conversations
    t = docs_to_transcripts(_docs(spark, sf_dir))
    return segment_conversations(t, budget=SEG_BUDGET)


KNN_K = 3
KNN_QUERY_MOD = 25  # vec_id % MOD == 0 → query set; else corpus


def q56_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched KNN join (operators/similarity.knn_join): every query
    vector (vec_id % 25 == 0 — a disjoint split of the embeddings
    table) gets its top-3 cosine neighbors from the corpus remainder —
    the RAG-retrieval / hard-negative-mining primitive. Multi-probe
    sign-bucket equi-join (no M×N product; the Hamming-ball fan-out
    rides the small query side), per-query top-k via a window with a
    total-order tiebreak. Oracle = the same probe expansion and
    row_number ranking in DuckDB over identical fold-order doubles."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") % KNN_QUERY_MOD == 0)
    c = emb.filter(F.col("vec_id") % KNN_QUERY_MOD != 0)
    return similarity.knn_join(q, c, k=KNN_K)


def q53_contamination_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded decontamination (operators/dedup.contamination_stats):
    q47's benchmark split, but scoring each training doc with the
    FRACTION of its shingles shared with the benchmark set (the
    Llama-style contamination ratio) instead of the boolean
    any-overlap flag. Same semi-join scale path."""
    from .operators.sampling import hash_bucket
    docs = _docs(spark, sf_dir)
    is_bench = hash_bucket("doc_id", "bench-v1") < BENCH_BUCKETS
    return dedup.contamination_stats(docs.filter(~is_bench),
                                     docs.filter(is_bench), n=JACCARD_N)


MIX_FRACTIONS = {"en": 0.5, "zh": 0.25}
MIX_DEFAULT = 1.0
BENCH_BUCKETS = 1000  # 10% of documents act as the benchmark set


def q46_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining mixture / domain reweighting (operators/sampling
    .mixture_sample): downsample English to 50%, Chinese to 25%, keep
    everything else — per-language deterministic hash draws, one narrow
    map, zero shuffle. Emits the kept (doc_id, lang) rows so the value
    hash pins the exact draw."""
    from .operators.sampling import mixture_sample
    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    return mixture_sample(docs, "lang", "doc_id",
                          MIX_FRACTIONS, default=MIX_DEFAULT)


def q47_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/dedup.decontaminate): a
    deterministic 10% hash slice of `documents` plays the benchmark
    set; every training doc is flagged iff it shares a word n-gram with
    any benchmark doc (n=3 here for the short synthetic docs; 13 is the
    production default). Shingle semi-join — no train×bench product."""
    from pyspark.sql import functions as F

    from .operators.sampling import hash_bucket
    docs = _docs(spark, sf_dir)
    is_bench = hash_bucket("doc_id", "bench-v1") < BENCH_BUCKETS
    bench = docs.filter(is_bench)
    train = docs.filter(~is_bench)
    return dedup.decontaminate(train, bench, n=JACCARD_N)


def q48_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 embedding quantization (operators/similarity.quantize_int8)
    surfaced flat for the driver gate: the exact integer code sequence
    is fingerprinted (md5 over comma-joined codes), so the oracle
    checks every code of every vector, not a summary statistic."""
    from pyspark.sql import functions as F

    q = similarity.quantize_int8(_emb(spark, sf_dir))
    return q.select(
        "vec_id",
        F.size("codes").alias("n_dims"),
        F.md5(F.concat_ws(",", F.transform(
            "codes", lambda x: x.cast("string")))).alias("codes_fp"),
        F.round("scale", 9).alias("scale"),
    )


def q63_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q47's decontamination through the Bloom-prefilter scale path
    (operators/dedup.decontaminate_bloom): benchmark shingles sketch
    into one broadcast Bloom filter, might_contain prunes the train
    shingles, an exact semi-join removes false positives — so the
    result is identical and the ORACLE IS q47's SQL; what changes is
    the plan, which no longer ships the benchmark shingle set as rows."""
    from pyspark.sql import functions as F

    from .operators.sampling import hash_bucket
    docs = _docs(spark, sf_dir)
    is_bench = hash_bucket("doc_id", "bench-v1") < BENCH_BUCKETS
    return dedup.decontaminate_bloom(docs.filter(~is_bench),
                                     docs.filter(is_bench),
                                     n=JACCARD_N, expected_items=100_000)


KMEANS_K = 8
KMEANS_ITERS = 3
PQ_SUBSPACES = 4
PQ_K = 16
PQ_ITERS = 2


def q65_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (operators/clustering.pq_encode): 64-dim
    int8 codes → 4 subspace codebooks of 16 entries → 4 bytes/vector.
    Every emitted code and the total distortion are exact integers;
    the oracle replays all four subspace Lloyd chains as
    prefix-namespaced CTEs."""
    from .operators.clustering import pq_encode

    return pq_encode(_emb(spark, sf_dir), n_sub=PQ_SUBSPACES, k=PQ_K,
                     iters=PQ_ITERS)


IVFPQ_CELLS = 8
IVFPQ_CELL_ITERS = 2
IVFPQ_NPROBE = 2
IVFPQ_K = 10


def q66_ivfpq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ADC search (operators/clustering.ivfpq_search): coarse
    cells bound the scan to nprobe probe cells, PQ lookup tables rank
    members by integer ADC distance. Serving is one narrow projection
    + TakeOrdered (plan-asserted zero-Exchange); the oracle replays
    the coarse Lloyd chain, all four subspace chains, the probe-cell
    choice and every ADC distance as exact integers."""
    from .operators.clustering import ivfpq_search

    return ivfpq_search(_emb(spark, sf_dir), ANN_QUERY_ID, k=IVFPQ_K,
                        n_cells=IVFPQ_CELLS, cell_iters=IVFPQ_CELL_ITERS,
                        nprobe=IVFPQ_NPROBE, n_sub=PQ_SUBSPACES,
                        pq_k=PQ_K, pq_iters=PQ_ITERS)


def q57_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact k-means over int8-quantized embeddings
    (operators/clustering.kmeans_int8): assignment is a narrow map
    against a literal codebook, updates are floor(sum/count) integer
    means — every value the oracle compares (cluster id, squared code
    distance) is an exact integer, so partitioning/engine cannot
    perturb the result. The oracle replays the identical Lloyd rounds
    as unrolled CTEs."""
    from .operators.clustering import kmeans_int8

    return kmeans_int8(_emb(spark, sf_dir), k=KMEANS_K, iters=KMEANS_ITERS)


def q61_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: cluster-then-prune semantic dedup
    (operators/clustering.semdedup) — k-means bounds the quadratic
    similarity search inside clusters; within a cluster, keep-first by
    id at cosine ≥ 0.4. The oracle replays clustering via the shared
    k-means CTEs and the pair search as the same equi-join."""
    from .operators.clustering import semdedup

    return semdedup(_emb(spark, sf_dir), k=KMEANS_K, iters=KMEANS_ITERS,
                    threshold=NEARDUP_COS)


# ---------------------------------------------------------------------------
# Oracle SQL
# ---------------------------------------------------------------------------

# Parameterized SQL builders: the same dedup fragments instantiate for
# any (relation, id, text) triple — used for `documents` here and for
# reassembled conversations in queries.q31.


def shingles_sql(rel: str, id_col: str, text_col: str) -> str:
    """Distinct word n-gram shingles per row; mirrors dedup.shingles_expr."""
    return f"""
    SELECT {id_col}, unnest(list_distinct(list_transform(
               range(1, greatest(len(toks) - {JACCARD_N - 1}, 0) + 1),
               i -> array_to_string(toks[i:i+{JACCARD_N - 1}], ' ')))) AS shingle
    FROM (SELECT {id_col},
                 list_filter(string_split(lower({text_col}), ' '), t -> t <> '') AS toks
          FROM {rel})
"""


def jaccard_sql(rel: str, id_col: str, text_col: str) -> str:
    return f"""
    WITH sh AS ({shingles_sql(rel, id_col, text_col)}),
    sizes AS (SELECT {id_col}, count(*) AS sz FROM sh GROUP BY {id_col}),
    inter AS (
        SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, count(*) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.{id_col} < b.{id_col}
        GROUP BY a.{id_col}, b.{id_col}
    )
    SELECT id_a, id_b,
           round(n_inter * 1.0 / (sa.sz + sb.sz - n_inter), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.{id_col} = id_a
    JOIN sizes sb ON sb.{id_col} = id_b
    WHERE n_inter * 1.0 / (sa.sz + sb.sz - n_inter) >= {JACCARD_THRESHOLD}
"""


def minhash_sql(rel: str, id_col: str, text_col: str) -> str:
    mh_cols = ",\n               ".join(
        f"min(({a} * x + {b}) % {dedup.MINHASH_P}) AS m{i}"
        for i, (a, b) in enumerate(dedup.MINHASH_COEFFS))
    mh_bands = "\n        UNION ALL\n".join(
        "        SELECT {id_col}, {band} AS band, md5({key}) AS band_key FROM sig".format(
            id_col=id_col, band=band,
            key=" || '-' || ".join(
                f"m{i}::VARCHAR"
                for i in range(band * dedup.ROWS_PER_BAND,
                               (band + 1) * dedup.ROWS_PER_BAND)))
        for band in range(dedup.N_BANDS))
    return f"""
    WITH sh AS ({shingles_sql(rel, id_col, text_col)}),
    hashed AS (
        SELECT {id_col},
               ('0x' || substr(md5(shingle), 1, 12))::BIGINT % {dedup.MINHASH_P} AS x
        FROM sh
    ),
    sig AS (
        SELECT {id_col},
               {mh_cols}
        FROM hashed GROUP BY {id_col}
    ),
    bands AS (
{mh_bands}
    )
    SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_key = b.band_key AND a.{id_col} < b.{id_col}
"""


def dedup_pipeline_sql(rel: str, id_col: str, text_col: str) -> str:
    return f"""
    WITH cands AS ({minhash_sql(rel, id_col, text_col)}),
    jac AS ({jaccard_sql(rel, id_col, text_col)}),
    hashed AS (SELECT {id_col}, md5({text_col}) AS h FROM {rel}),
    canon AS (SELECT h, min({id_col}) AS canonical_id FROM hashed GROUP BY h),
    drops AS (
        SELECT hashed.{id_col} AS drop_id
        FROM hashed JOIN canon ON hashed.h = canon.h
        WHERE hashed.{id_col} <> canon.canonical_id
        UNION
        SELECT jac.id_b AS drop_id
        FROM cands JOIN jac ON cands.id_a = jac.id_a AND cands.id_b = jac.id_b
    )
    SELECT {id_col}, drop_id IS NULL AS keep_dedup
    FROM {rel} LEFT JOIN drops ON {id_col} = drop_id
"""

_JACCARD_SQL = jaccard_sql("documents", "doc_id", "text")

_MINHASH_SQL = minhash_sql("documents", "doc_id", "text")

_HIGH = ", ".join(f"'{c}'" for c in dedup.HIGH_HEX)
_SIM_SUMS = ",\n           ".join(
    f"sum(CASE WHEN substr(h, {p + 1}, 1) IN ({_HIGH}) THEN 1 ELSE -1 END) AS s{p}"
    for p in range(dedup.SIMHASH_BITS))
_SIM_BITS = " || ".join(
    f"CASE WHEN s{p} > 0 THEN '1' ELSE '0' END" for p in range(dedup.SIMHASH_BITS))
_SIMHASH_SQL = f"""
    WITH toks AS (
        SELECT doc_id, md5(unnest(list_filter(string_split(lower(text), ' '),
                                              t -> t <> ''))) AS h
        FROM documents
    ),
    sums AS (
        SELECT doc_id,
           {_SIM_SUMS}
        FROM toks GROUP BY doc_id
    )
    SELECT doc_id, {_SIM_BITS} AS simhash FROM sums
"""

# double-cast vectors + sequential fold == similarity.dot_expr bit-for-bit
_EMB_BASE = """
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
           sqrt(list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
    FROM embeddings
"""

_COSINE_TOPK_SQL = f"""
    WITH base AS ({_EMB_BASE}),
    q AS (SELECT v AS qv, nrm AS qn FROM base WHERE vec_id = {ANN_QUERY_ID})
    SELECT vec_id,
           round(list_sum(list_transform(range(1, 65), i -> v[i] * qv[i]))
                 / (nrm * qn), 6) AS cos_sim
    FROM base, q
    ORDER BY cos_sim DESC, vec_id ASC
    LIMIT 10
"""

_BUCKET_BITS = " || ".join(
    f"CASE WHEN embedding[{i + 1}] >= 0 THEN '1' ELSE '0' END"
    for i in range(similarity.N_SIGN_BITS))
_SIGNBUCKET_SQL = f"""
    WITH base AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
               {_BUCKET_BITS} AS bucket
        FROM embeddings
    ),
    q AS (SELECT v AS qv, nrm AS qn, bucket AS qbucket
          FROM base WHERE vec_id = {ANN_QUERY_ID})
    SELECT vec_id, bucket,
           round(list_sum(list_transform(range(1, 65), i -> v[i] * qv[i]))
                 / (nrm * qn), 6) AS cos_sim
    FROM base, q
    WHERE bucket = qbucket
    ORDER BY cos_sim DESC, vec_id ASC
    LIMIT 5
"""

_NEARDUP_SQL = f"""
    WITH base AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
               {_BUCKET_BITS} AS bucket
        FROM embeddings
    )
    SELECT id_a, id_b, bucket, cos_sim FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.bucket,
               round(list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i]))
                     / (a.nrm * b.nrm), 6) AS cos_sim
        FROM base a JOIN base b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    ) WHERE cos_sim >= {NEARDUP_COS}
"""

# shared CTE fragment: sign buckets → radius-1 probe expansion →
# DISTINCT candidate pairs with exact cosine. Composed into BOTH the
# q49 oracle and q50's clustering oracle so the probe semantics (flip
# rule, id_a < id_b convention, rounding) cannot silently diverge.
_PROBE_PAIRS_CTES = f"""base AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
               {_BUCKET_BITS} AS bucket
        FROM embeddings
    ),
    probes AS (
        SELECT vec_id, v, nrm, bucket AS probe FROM base
        UNION ALL
        SELECT vec_id, v, nrm,
               substr(bucket, 1, CAST(r.i AS INTEGER))
               || (CASE WHEN substr(bucket, CAST(r.i AS INTEGER) + 1, 1) = '1'
                        THEN '0' ELSE '1' END)
               || substr(bucket, CAST(r.i AS INTEGER) + 2) AS probe
        FROM base, range(0, {similarity.N_SIGN_BITS}) AS r(i)
    ),
    pairs AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i]))
                     / (a.nrm * b.nrm), 6) AS cos_sim
        FROM probes a JOIN base b
          ON a.probe = b.bucket AND a.vec_id < b.vec_id
    )"""

_MULTIPROBE_SQL = f"""
    WITH {_PROBE_PAIRS_CTES}
    SELECT id_a, id_b, cos_sim FROM pairs WHERE cos_sim >= {NEARDUP_COS}
"""

# same probe expansion as _PROBE_PAIRS_CTES but asymmetric (queries
# probe, corpus keeps its base bucket) + a per-query row_number over
# the 6-decimal-rounded similarity — mirrors knn_join's window exactly.
_KNN_SQL = f"""
    WITH base AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
               {_BUCKET_BITS} AS bucket
        FROM embeddings
    ),
    q AS (SELECT * FROM base WHERE vec_id % {KNN_QUERY_MOD} = 0),
    c AS (SELECT * FROM base WHERE vec_id % {KNN_QUERY_MOD} <> 0),
    probes AS (
        SELECT vec_id, v, nrm, bucket AS probe FROM q
        UNION ALL
        SELECT vec_id, v, nrm,
               substr(bucket, 1, CAST(r.i AS INTEGER))
               || (CASE WHEN substr(bucket, CAST(r.i AS INTEGER) + 1, 1) = '1'
                        THEN '0' ELSE '1' END)
               || substr(bucket, CAST(r.i AS INTEGER) + 2) AS probe
        FROM q, range(0, {similarity.N_SIGN_BITS}) AS r(i)
    ),
    cand AS (
        SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
               round(list_sum(list_transform(range(1, 65),
                     i -> p.v[i] * c.v[i])) / (p.nrm * c.nrm), 6) AS cos_sim
        FROM probes p JOIN c ON p.probe = c.bucket
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos_sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, neighbor_id ASC) AS rn
        FROM cand
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rn AS INTEGER) AS rnk
    FROM ranked WHERE rn <= {KNN_K}
"""

_SEMANTIC_DEDUP_SQL = f"""
    WITH RECURSIVE {_PROBE_PAIRS_CTES},
    edges AS (SELECT id_a, id_b FROM pairs WHERE cos_sim >= {NEARDUP_COS}),
    und AS (
        SELECT id_a AS a, id_b AS b FROM edges
        UNION
        SELECT id_b AS a, id_a AS b FROM edges
    ),
    reach(id, lbl) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM und)
        UNION
        SELECT u.b, r.lbl FROM reach r JOIN und u ON u.a = r.id
    ),
    comp AS (SELECT id, min(lbl) AS component FROM reach GROUP BY id)
    SELECT e.vec_id,
           coalesce(c.component, e.vec_id) AS component,
           e.vec_id = coalesce(c.component, e.vec_id) AS keep_canonical
    FROM embeddings e LEFT JOIN comp c ON e.vec_id = c.id
"""

_DEDUP_PIPELINE_SQL = dedup_pipeline_sql("documents", "doc_id", "text")


# conversation relation reassembled in SQL (mirrors ingest.docs_to_transcripts
# chunking + dedup.dedup_conversations newline join, ordered by turn_idx)
_CONV_DOCS = """
    SELECT conv_id, string_agg(t, chr(10) ORDER BY turn_idx) AS conv_text
    FROM (
        SELECT 'doc-' || lpad(doc_id::VARCHAR, 10, '0') AS conv_id,
               CAST(i - 1 AS INTEGER) AS turn_idx,
               array_to_string(toks[(i-1)*12+1 : i*12], ' ') AS t
        FROM (SELECT doc_id,
                     list_filter(string_split(text, ' '), x -> x <> '') AS toks
              FROM documents),
             unnest(range(1, greatest(CAST(ceil(len(toks) * 1.0 / 12) AS INT), 1) + 1)) AS u(i)
    )
    GROUP BY conv_id
"""

# merge the outer CTE into the pipeline's own WITH clause
_CONV_DEDUP_SQL = (
    "WITH conv_docs AS (" + _CONV_DOCS + ")"
    + dedup_pipeline_sql("conv_docs", "conv_id", "conv_text")
      .replace("WITH cands AS", ", cands AS", 1)
)


_COMPONENTS_SQL = f"""
    WITH RECURSIVE cands AS ({{minhash}}),
    jac AS ({{jaccard}}),
    hashed AS (SELECT doc_id, md5(text) AS h FROM documents),
    canon AS (SELECT h, min(doc_id) AS canonical_id FROM hashed GROUP BY h),
    edges AS (
        SELECT canonical_id AS id_a, doc_id AS id_b
        FROM hashed JOIN canon USING (h) WHERE doc_id <> canonical_id
        UNION
        SELECT cands.id_a, cands.id_b
        FROM cands JOIN jac ON cands.id_a = jac.id_a AND cands.id_b = jac.id_b
    ),
    und AS (
        SELECT id_a AS a, id_b AS b FROM edges
        UNION
        SELECT id_b AS a, id_a AS b FROM edges
    ),
    reach(id, lbl) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM und)
        UNION
        SELECT u.b, r.lbl FROM reach r JOIN und u ON u.a = r.id
    ),
    comp AS (SELECT id, min(lbl) AS component FROM reach GROUP BY id)
    SELECT d.doc_id,
           coalesce(c.component, d.doc_id) AS component,
           d.doc_id = coalesce(c.component, d.doc_id) AS keep_canonical
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
""".format(minhash=_MINHASH_SQL, jaccard=_JACCARD_SQL)


_IVF_SQL = f"""
    WITH base AS ({_EMB_BASE}),
    cents AS (
        SELECT CAST(vec_id AS INTEGER) AS cell, v AS cv, nrm AS cn
        FROM base WHERE vec_id < {similarity.N_IVF_CELLS}
    ),
    scored AS (
        SELECT b.vec_id, b.v, b.nrm, c.cell,
               row_number() OVER (
                   PARTITION BY b.vec_id
                   ORDER BY round(list_sum(list_transform(range(1, 65),
                             i -> b.v[i] * c.cv[i])) / (b.nrm * c.cn), 9) DESC,
                            c.cell ASC) AS rk
        FROM base b CROSS JOIN cents c
    ),
    assigned AS (SELECT vec_id, cell, v, nrm FROM scored WHERE rk = 1),
    q AS (SELECT v AS qv, nrm AS qn, cell AS qcell
          FROM assigned WHERE vec_id = {ANN_QUERY_ID})
    SELECT vec_id, cell,
           round(list_sum(list_transform(range(1, 65), i -> v[i] * qv[i]))
                 / (nrm * qn), 6) AS cos_sim
    FROM assigned, q
    WHERE cell = qcell
    ORDER BY cos_sim DESC, vec_id ASC
    LIMIT 5
"""

from .operators.sampling import N_BUCKETS as _NB  # noqa: E402

# bounds derived with the SAME int(round(...)) as mixture_sample/
# hash_bucket — int() truncation would diverge at fractions like 0.115
_MIX_SQL = f"""
    SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               ('0x' || substr(md5(doc_id::VARCHAR || ':mix-v1'), 1, 8))::BIGINT
                   % {_NB} AS bucket
        FROM documents
    )
    WHERE bucket < CASE lang
                   WHEN 'en' THEN {int(round(MIX_FRACTIONS['en'] * _NB))}
                   WHEN 'zh' THEN {int(round(MIX_FRACTIONS['zh'] * _NB))}
                   ELSE {int(round(MIX_DEFAULT * _NB))} END
"""

_DECONTAM_SQL = f"""
    WITH bucketed AS (
        SELECT *, ('0x' || substr(md5(doc_id::VARCHAR || ':bench-v1'), 1, 8))::BIGINT
                      % {_NB} AS bucket
        FROM documents
    ),
    train AS (SELECT doc_id, text FROM bucketed WHERE bucket >= {BENCH_BUCKETS}),
    bench AS (SELECT doc_id, text FROM bucketed WHERE bucket < {BENCH_BUCKETS}),
    tr_sh AS ({shingles_sql("train", "doc_id", "text")}),
    bm_sh AS (SELECT DISTINCT shingle
              FROM ({shingles_sql("bench", "doc_id", "text")}))
    SELECT t.doc_id,
           EXISTS (SELECT 1 FROM tr_sh s JOIN bm_sh USING (shingle)
                   WHERE s.doc_id = t.doc_id) AS contaminated
    FROM train t
"""

_QUANT_SQL = """
    WITH base AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    scaled AS (
        SELECT vec_id, v,
               greatest(list_max(list_transform(v, x -> abs(x))), 1e-30) AS s
        FROM base
    )
    SELECT vec_id, len(v) AS n_dims,
           md5(array_to_string(
               list_transform(v, x -> CAST(round(x / s * 127) AS INTEGER)),
               ',')) AS codes_fp,
           round(s, 9) AS scale
    FROM scaled
"""

_QUANT_CTES = """base AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    scaled AS (
        SELECT vec_id, v,
               greatest(list_max(list_transform(v, x -> abs(x))), 1e-30) AS s
        FROM base
    ),
    codes AS (
        SELECT vec_id,
               list_transform(v, x -> CAST(round(x / s * 127) AS BIGINT)) AS codes
        FROM scaled
    )"""


def _lloyd_ctes(prefix: str, src: str, k: int, iters: int) -> tuple[str, str]:
    """Unrolled Lloyd's rounds over a (vec_id, codes) CTE `src` — the
    SQL replay of clustering._kmeans_codes, prefix-namespaced so PQ can
    instantiate one chain per subspace. All-integer arithmetic:
    distances are diff-square integer sums, centroid updates
    floor(sum/count). Dim-agnostic via len(codes). Returns (cte_body,
    final_assignment_cte_name)."""
    ctes = [f"""{prefix}cent0 AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, codes
        FROM {src} ORDER BY vec_id LIMIT {k}
    )"""]
    # rounds 1..iters refine the codebook; round iters+1 is the final
    # assignment against the last codebook (mirrors _kmeans_codes' loop)
    for t in range(1, iters + 2):
        ctes.append(f"""{prefix}d{t} AS (
        SELECT c.vec_id, c.codes, ct.cid,
               CAST(list_sum(list_transform(
                   range(1, len(c.codes) + 1),
                   i -> (c.codes[i] - ct.codes[i]) * (c.codes[i] - ct.codes[i])
               )) AS BIGINT) AS dist
        FROM {src} c CROSS JOIN {prefix}cent{t - 1} ct
    ),
    {prefix}asg{t} AS (
        SELECT vec_id, codes, cid AS cluster, dist FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM {prefix}d{t})
        WHERE rn = 1
    )""")
        if t <= iters:
            ctes.append(f"""{prefix}cent{t} AS (
        SELECT p.cid, coalesce(n.codes, p.codes) AS codes
        FROM {prefix}cent{t - 1} p LEFT JOIN (
            SELECT cluster AS cid, list(mu ORDER BY dim) AS codes FROM (
                SELECT a.cluster, t.dim,
                       CAST(floor(CAST(sum(a.codes[t.dim]) AS DOUBLE)
                                  / count(*)) AS BIGINT) AS mu
                FROM {prefix}asg{t} a,
                     unnest(range(1, len(a.codes) + 1)) AS t(dim)
                GROUP BY a.cluster, t.dim)
            GROUP BY cluster) n USING (cid)
    )""")
    return ",\n    ".join(ctes), f"{prefix}asg{iters + 1}"


def _kmeans_ctes(k: int = KMEANS_K, iters: int = KMEANS_ITERS
                 ) -> tuple[str, str]:
    """Quantization + one Lloyd chain over the full codes — shared by
    the q57 oracle and the q61 SemDeDup oracle (so the two can never
    diverge on clustering)."""
    body, final = _lloyd_ctes("", "codes", k, iters)
    return _QUANT_CTES + ",\n    " + body, final


def _kmeans_sql(k: int = KMEANS_K, iters: int = KMEANS_ITERS) -> str:
    body, final = _kmeans_ctes(k, iters)
    return (f"WITH {body}\n    SELECT vec_id, "
            f"CAST(cluster AS INTEGER) AS cluster, dist FROM {final}")


def _semdedup_sql(k: int = KMEANS_K, iters: int = KMEANS_ITERS,
                  threshold: float = NEARDUP_COS) -> str:
    """SemDeDup oracle: the shared k-means CTEs plus a within-cluster
    pair join (equi-join on cluster, a.vec_id < b.vec_id) with the
    same sequential-fold cosine the similarity oracles use; a row is
    dropped iff any lower-id cluster-mate is ≥ threshold."""
    body, final = _kmeans_ctes(k, iters)
    return f"""WITH {body},
    basev AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings
    ),
    withc AS (
        SELECT a.vec_id, a.cluster, b.v, b.nrm
        FROM {final} a JOIN basev b USING (vec_id)
    ),
    dups AS (
        SELECT DISTINCT b.vec_id FROM withc a JOIN withc b
          ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        WHERE round(list_sum(list_transform(range(1, 65),
                    i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 6)
              >= {threshold}
    )
    SELECT w.vec_id, CAST(w.cluster AS INTEGER) AS cluster,
           d.vec_id IS NULL AS keep
    FROM withc w LEFT JOIN dups d ON w.vec_id = d.vec_id"""


def _pq_sql(n_sub: int, k: int, iters: int, dims: int = 64) -> str:
    """PQ oracle: one prefix-namespaced Lloyd chain per subspace over
    the sliced full-vector codes, joined back on vec_id. `dims` is the
    embeddings table's dimensionality (testdata: 64)."""
    w = dims // n_sub
    parts = [_QUANT_CTES]
    finals = []
    for s in range(n_sub):
        parts.append(f"""s{s}codes AS (
        SELECT vec_id, codes[{s * w + 1}:{(s + 1) * w}] AS codes FROM codes
    )""")
        body, final = _lloyd_ctes(f"s{s}", f"s{s}codes", k, iters)
        parts.append(body)
        finals.append(final)
    sel = ", ".join(f"CAST(s{s}.cluster AS INTEGER) AS c{s}"
                    for s in range(n_sub))
    dist = " + ".join(f"s{s}.dist" for s in range(n_sub))
    joins = " ".join(f"JOIN {finals[s]} s{s} USING (vec_id)"
                     for s in range(n_sub))
    body = ",\n    ".join(parts)
    return (f"WITH {body}\n    "
            f"SELECT c.vec_id, {sel}, CAST({dist} AS BIGINT) AS distortion "
            f"FROM codes c {joins}")


def _ivfpq_sql(query_id: int, k: int, n_cells: int, cell_iters: int,
               nprobe: int, n_sub: int, pq_k: int, pq_iters: int,
               dims: int = 64) -> str:
    """IVF-PQ ADC oracle: the coarse Lloyd chain (prefix g) gives every
    vector its cell and the final coarse codebook picks the query's
    nprobe probe cells; one Lloyd chain per subspace gives the PQ
    codes; per-subspace LUTs are query-to-codebook squared distances;
    ADC = Σ_s lut_s[code_s], top-k by (adc, vec_id)."""
    w = dims // n_sub
    parts = [_QUANT_CTES]
    gbody, gfinal = _lloyd_ctes("g", "codes", n_cells, cell_iters)
    parts.append(gbody)
    finals = []
    for s in range(n_sub):
        parts.append(f"""s{s}codes AS (
        SELECT vec_id, codes[{s * w + 1}:{(s + 1) * w}] AS codes FROM codes
    )""")
        body, final = _lloyd_ctes(f"s{s}", f"s{s}codes", pq_k, pq_iters)
        parts.append(body)
        finals.append(final)
    parts.append(f"""qv AS (
        SELECT codes FROM codes WHERE vec_id = {query_id}
    )""")
    parts.append(f"""probe AS (
        SELECT ct.cid FROM gcent{cell_iters} ct, qv
        ORDER BY list_sum(list_transform(range(1, len(ct.codes) + 1),
                   i -> (qv.codes[i] - ct.codes[i])
                      * (qv.codes[i] - ct.codes[i]))),
                 ct.cid
        LIMIT {nprobe}
    )""")
    for s in range(n_sub):
        parts.append(f"""lut{s} AS (
        SELECT ct.cid,
               CAST(list_sum(list_transform(range(1, len(ct.codes) + 1),
                   i -> (qv.codes[{s * w} + i] - ct.codes[i])
                      * (qv.codes[{s * w} + i] - ct.codes[i]))) AS BIGINT) AS d
        FROM s{s}cent{pq_iters} ct, qv
    )""")
    joins = " ".join(
        f"JOIN {finals[s]} a{s} USING (vec_id) "
        f"JOIN lut{s} l{s} ON l{s}.cid = a{s}.cluster"
        for s in range(n_sub))
    dist = " + ".join(f"l{s}.d" for s in range(n_sub))
    body = ",\n    ".join(parts)
    return (f"WITH {body}\n    "
            f"SELECT g.vec_id, CAST(g.cluster AS INTEGER) AS cell, "
            f"CAST({dist} AS BIGINT) AS adc_dist "
            f"FROM {gfinal} g {joins} "
            f"WHERE g.cluster IN (SELECT cid FROM probe) "
            f"ORDER BY adc_dist, g.vec_id LIMIT {k}")


_KMEANS_SQL = _kmeans_sql()
_SEMDEDUP_SQL = _semdedup_sql()
_PQ_SQL = _pq_sql(PQ_SUBSPACES, PQ_K, PQ_ITERS)
_IVFPQ_SQL = _ivfpq_sql(ANN_QUERY_ID, IVFPQ_K, IVFPQ_CELLS,
                        IVFPQ_CELL_ITERS, IVFPQ_NPROBE,
                        PQ_SUBSPACES, PQ_K, PQ_ITERS)


_DUP_SPAN_SQL = f"""
    WITH sh AS ({shingles_sql("documents", "doc_id", "text")}),
    dfreq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
    tall AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
               CAST(sum(CASE WHEN df >= {DUP_SPAN_MIN_DF} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dup
        FROM sh JOIN dfreq USING (shingle) GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(t.n_shingles, 0) AS n_shingles,
           coalesce(t.n_dup, 0) AS n_dup_shingles,
           round(coalesce(t.n_dup, 0) * 1.0
                 / greatest(coalesce(t.n_shingles, 0), 1), 4) AS dup_frac
    FROM documents d LEFT JOIN tall t USING (doc_id)
"""

# replays pack_sequences' next-fit recurrence: same hash bucket as the
# Spark side (md5 prefix construction shared with _MIX_SQL), docs in
# ascending id order per bucket, fill state threaded through a
# recursive CTE one rank at a time
_PACK_SQL = f"""
    WITH RECURSIVE base AS (
        SELECT doc_id,
               ('0x' || substr(md5(doc_id::VARCHAR || ':pack-v1'), 1, 8))::BIGINT
                   % {PACK_BUCKETS} AS bucket,
               CAST(coalesce(len(list_filter(string_split(text, ' '),
                                             t -> t <> '')), 0)
                    AS INTEGER) AS n_tokens
        FROM documents
    ),
    ordered AS (
        SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
        FROM base
    ),
    pack AS (
        SELECT bucket, rn, doc_id, n_tokens,
               0 AS seq_idx, 0 AS seq_offset, n_tokens AS fill
        FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.bucket, o.rn, o.doc_id, o.n_tokens,
               CASE WHEN p.fill + o.n_tokens > {PACK_BUDGET}
                    THEN p.seq_idx + 1 ELSE p.seq_idx END,
               CASE WHEN p.fill + o.n_tokens > {PACK_BUDGET}
                    THEN 0 ELSE p.fill END,
               CASE WHEN p.fill + o.n_tokens > {PACK_BUDGET}
                    THEN o.n_tokens ELSE p.fill + o.n_tokens END
        FROM ordered o JOIN pack p ON o.bucket = p.bucket AND o.rn = p.rn + 1
    )
    SELECT doc_id, bucket, n_tokens,
           CAST(seq_idx AS INTEGER) AS seq_idx,
           CAST(seq_offset AS INTEGER) AS seq_offset
    FROM pack
"""

_CONTAM_FRAC_SQL = f"""
    WITH bucketed AS (
        SELECT *, ('0x' || substr(md5(doc_id::VARCHAR || ':bench-v1'), 1, 8))::BIGINT
                      % {_NB} AS bucket
        FROM documents
    ),
    train AS (SELECT doc_id, text FROM bucketed WHERE bucket >= {BENCH_BUCKETS}),
    bench AS (SELECT doc_id, text FROM bucketed WHERE bucket < {BENCH_BUCKETS}),
    tr_sh AS ({shingles_sql("train", "doc_id", "text")}),
    bm_sh AS (SELECT DISTINCT shingle
              FROM ({shingles_sql("bench", "doc_id", "text")})),
    tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh
            FROM tr_sh GROUP BY doc_id),
    hit AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit
            FROM tr_sh WHERE shingle IN (SELECT shingle FROM bm_sh)
            GROUP BY doc_id)
    SELECT tr.doc_id,
           coalesce(tot.n_sh, 0) AS n_shingles,
           coalesce(hit.n_hit, 0) AS n_contaminated,
           round(coalesce(hit.n_hit, 0) * 1.0
                 / greatest(coalesce(tot.n_sh, 0), 1), 4) AS contamination_frac
    FROM train tr LEFT JOIN tot USING (doc_id) LEFT JOIN hit USING (doc_id)
"""

_SEG_SQL = f"""
    WITH RECURSIVE toks AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), t -> t <> '') AS toks
        FROM documents
    ),
    turns AS (
        SELECT 'doc-' || lpad(doc_id::VARCHAR, 10, '0') AS conv_id,
               CAST(i - 1 AS INTEGER) AS turn_idx,
               CAST(len(list_filter(toks[(i-1)*12+1 : i*12],
                                    t -> t <> '')) AS INTEGER) AS n_tokens
        FROM toks,
             unnest(range(1, greatest(CAST(ceil(len(toks) * 1.0 / 12) AS INT),
                                      1) + 1)) AS u(i)
    ),
    ordered AS (
        SELECT *, row_number() OVER (PARTITION BY conv_id
                                     ORDER BY turn_idx) AS rn
        FROM turns
    ),
    seg AS (
        SELECT conv_id, rn, turn_idx, n_tokens,
               0 AS win_idx, 0 AS win_offset, n_tokens AS fill
        FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.conv_id, o.rn, o.turn_idx, o.n_tokens,
               CASE WHEN s.fill + o.n_tokens > {SEG_BUDGET}
                    THEN s.win_idx + 1 ELSE s.win_idx END,
               CASE WHEN s.fill + o.n_tokens > {SEG_BUDGET}
                    THEN 0 ELSE s.fill END,
               CASE WHEN s.fill + o.n_tokens > {SEG_BUDGET}
                    THEN o.n_tokens ELSE s.fill + o.n_tokens END
        FROM ordered o JOIN seg s ON o.conv_id = s.conv_id AND o.rn = s.rn + 1
    )
    SELECT conv_id, turn_idx, n_tokens,
           CAST(win_idx AS INTEGER) AS win_idx,
           CAST(win_offset AS INTEGER) AS win_offset
    FROM seg
"""

ORACLES: dict[str, str] = {
    "q55_context_windows": _SEG_SQL,
    "q56_knn_join": _KNN_SQL,
    "q48_quantize_embeddings": _QUANT_SQL,
    "q46_mixture_sample": _MIX_SQL,
    "q47_decontaminate": _DECONTAM_SQL,
    "q18_jaccard_pairs": _JACCARD_SQL,
    "q19_minhash_lsh": _MINHASH_SQL,
    "q20_simhash": _SIMHASH_SQL,
    "q21_cosine_topk": _COSINE_TOPK_SQL,
    "q22_signbucket_ann": _SIGNBUCKET_SQL,
    "q23_embedding_neardup": _NEARDUP_SQL,
    "q24_dedup_pipeline": _DEDUP_PIPELINE_SQL,
    "q31_conv_dedup": _CONV_DEDUP_SQL,
    "q32_ivf_ann": _IVF_SQL,
    "q39_dedup_components": _COMPONENTS_SQL,
    "q49_multiprobe_neardup": _MULTIPROBE_SQL,
    "q50_semantic_dedup": _SEMANTIC_DEDUP_SQL,
    "q51_dup_span_stats": _DUP_SPAN_SQL,
    "q70_remove_boilerplate": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS toks
            FROM documents
        ), segs AS (
            SELECT doc_id, i AS seg_idx,
                   array_to_string(toks[(i-1)*12+1 : i*12], ' ') AS seg
            FROM toks,
                 unnest(range(1, (len(toks) + 11) // 12 + 1)) AS u(i)
        ), dfreq AS (
            SELECT seg, count(DISTINCT doc_id) AS seg_df
            FROM segs GROUP BY seg
        ), kept AS (
            SELECT s.doc_id, s.seg_idx, s.seg
            FROM segs s JOIN dfreq USING (seg) WHERE seg_df < 2
        ), rebuilt AS (
            SELECT doc_id,
                   array_to_string(list(seg ORDER BY seg_idx), ' ')
                       AS clean_text,
                   count(*) AS n_kept
            FROM kept GROUP BY doc_id
        ), totals AS (
            SELECT doc_id, count(*) AS n_segs FROM segs GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(r.clean_text, '') AS clean_text,
               CAST(coalesce(t.n_segs, 0) AS BIGINT) AS n_segs,
               CAST(coalesce(t.n_segs, 0) - coalesce(r.n_kept, 0)
                    AS BIGINT) AS n_removed
        FROM documents d
        LEFT JOIN totals t USING (doc_id)
        LEFT JOIN rebuilt r USING (doc_id)
    """,
    "q88_remove_dup_spans": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS toks
            FROM documents
        ), wins AS (
            SELECT doc_id, i,
                   array_to_string(toks[i : i+4], ' ') AS w
            FROM toks, unnest(range(1, len(toks) - 5 + 2)) AS u(i)
            WHERE len(toks) >= 5
        ), dupw AS (
            SELECT w FROM wins GROUP BY w
            HAVING count(DISTINCT doc_id) >= 2
        ), starts AS (
            SELECT DISTINCT doc_id, i FROM wins JOIN dupw USING (w)
        ), pos AS (
            SELECT doc_id, j, toks[j] AS tok
            FROM toks, unnest(range(1, len(toks) + 1)) AS u(j)
        ), removed AS (
            SELECT DISTINCT p.doc_id, p.j
            FROM pos p JOIN starts s
              ON s.doc_id = p.doc_id AND p.j BETWEEN s.i AND s.i + 4
        ), kept AS (
            SELECT p.doc_id, p.j, p.tok
            FROM pos p ANTI JOIN removed r
              ON r.doc_id = p.doc_id AND r.j = p.j
        ), rebuilt AS (
            SELECT doc_id,
                   array_to_string(list(tok ORDER BY j), ' ')
                       AS clean_text,
                   count(*) AS n_kept
            FROM kept GROUP BY doc_id
        ), totals AS (
            SELECT doc_id, len(toks) AS n_tokens FROM toks
        )
        SELECT t.doc_id,
               coalesce(r.clean_text, '') AS clean_text,
               CAST(t.n_tokens AS BIGINT) AS n_tokens,
               CAST(t.n_tokens - coalesce(r.n_kept, 0) AS BIGINT)
                   AS n_removed
        FROM totals t
        LEFT JOIN rebuilt r USING (doc_id)
    """,
    "q52_sequence_pack": _PACK_SQL,
    "q53_contamination_frac": _CONTAM_FRAC_SQL,
    "q57_kmeans_clusters": _KMEANS_SQL,
    "q61_semdedup": _SEMDEDUP_SQL,
    # q63 is q47 with a Bloom prefilter whose false positives are
    # removed by an exact confirm — same result, same oracle
    "q63_bloom_decontaminate": _DECONTAM_SQL,
    "q65_pq_encode": _PQ_SQL,
    "q66_ivfpq_search": _IVFPQ_SQL,
    "q103_fuzzy_join": _FUZZY_SQL,
    "q105_winnow_pairs": _WINNOW_SQL,
    "q106_sorted_batches": _SORTED_BATCH_SQL,
    "q107_priority_dedup": _PRIORITY_DEDUP_SQL,
}

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q18_jaccard_pairs": q18_jaccard_pairs,
    "q19_minhash_lsh": q19_minhash_lsh,
    "q20_simhash": q20_simhash,
    "q21_cosine_topk": q21_cosine_topk,
    "q22_signbucket_ann": q22_signbucket_ann,
    "q23_embedding_neardup": q23_embedding_neardup,
    "q24_dedup_pipeline": q24_dedup_pipeline,
    "q31_conv_dedup": q31_conv_dedup,
    "q32_ivf_ann": q32_ivf_ann,
    "q39_dedup_components": q39_dedup_components,
    "q49_multiprobe_neardup": q49_multiprobe_neardup,
    "q50_semantic_dedup": q50_semantic_dedup,
    "q46_mixture_sample": q46_mixture_sample,
    "q47_decontaminate": q47_decontaminate,
    "q48_quantize_embeddings": q48_quantize_embeddings,
    "q51_dup_span_stats": q51_dup_span_stats,
    "q52_sequence_pack": q52_sequence_pack,
    "q53_contamination_frac": q53_contamination_frac,
    "q55_context_windows": q55_context_windows,
    "q56_knn_join": q56_knn_join,
    "q57_kmeans_clusters": q57_kmeans_clusters,
    "q61_semdedup": q61_semdedup,
    "q63_bloom_decontaminate": q63_bloom_decontaminate,
    "q65_pq_encode": q65_pq_encode,
    "q66_ivfpq_search": q66_ivfpq_search,
    "q70_remove_boilerplate": q70_remove_boilerplate,
    "q88_remove_dup_spans": q88_remove_dup_spans,
    "q103_fuzzy_join": q103_fuzzy_join,
    "q105_winnow_pairs": q105_winnow_pairs,
    "q106_sorted_batches": q106_sorted_batches,
    "q107_priority_dedup": q107_priority_dedup,
}


BITEXT_K = 4
BITEXT_THRESHOLD = 1.05
BITEXT_BITS = 4


def q113_bitext_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining (operators/similarity.
    bitext_margin_pairs): LASER/CCMatrix-style ratio-margin pair
    mining between the even-id and odd-id halves of the embedding
    corpus — cos(x,y) normalized by both sides' top-k neighborhood
    mean, forward-best election per source. Candidates are sign-bucket
    equi-joined (4 bits here so sf0.01's 500 vectors produce dense
    buckets); at 10^10 vectors the bucket is the partition column and
    each window is bucket-bounded. Oracle = the identical candidate
    generation + window algebra in SQL."""
    return similarity.bitext_margin_pairs(
        _emb(spark, sf_dir), k=BITEXT_K, threshold=BITEXT_THRESHOLD,
        n_bits=BITEXT_BITS)


_BITEXT_BUCKET_BITS = " || ".join(
    f"CASE WHEN embedding[{i + 1}] >= 0 THEN '1' ELSE '0' END"
    for i in range(BITEXT_BITS))
_BITEXT_SQL = f"""
    WITH base AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
               {_BITEXT_BUCKET_BITS} AS bucket
        FROM embeddings
    ),
    cand AS (
        SELECT s.vec_id AS src_id, t.vec_id AS tgt_id,
               round(list_sum(list_transform(range(1, 65),
                         i -> s.v[i] * t.v[i])) / (s.nrm * t.nrm), 6) AS cos6
        FROM base s JOIN base t ON s.bucket = t.bucket
        WHERE s.vec_id % 2 = 0 AND t.vec_id % 2 = 1
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY src_id
                                  ORDER BY cos6 DESC, tgt_id) AS r_s,
               row_number() OVER (PARTITION BY tgt_id
                                  ORDER BY cos6 DESC, src_id) AS r_t
        FROM cand
    ),
    pen AS (
        SELECT *,
               avg(CASE WHEN r_s <= {BITEXT_K} THEN cos6 END)
                   OVER (PARTITION BY src_id) AS p_src,
               avg(CASE WHEN r_t <= {BITEXT_K} THEN cos6 END)
                   OVER (PARTITION BY tgt_id) AS p_tgt
        FROM ranked
    ),
    scored AS (
        SELECT src_id, tgt_id, cos6,
               round(cos6 / ((p_src + p_tgt) / 2), 6) AS margin
        FROM pen
    ),
    best AS (
        SELECT *, row_number() OVER (PARTITION BY src_id
                                     ORDER BY margin DESC, tgt_id) AS rb
        FROM scored
    )
    SELECT src_id, tgt_id, cos6 AS cos_sim, margin
    FROM best
    WHERE rb = 1 AND margin >= {BITEXT_THRESHOLD}
    ORDER BY src_id
"""

QUERIES["q113_bitext_margin"] = q113_bitext_margin
ORACLES["q113_bitext_margin"] = _BITEXT_SQL


PR_K = 3
PR_BITS = 4
PR_ITERS = 5
PR_DAMPING = 0.85


def q115_knn_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representativeness PageRank over the sign-bucketed k-NN graph
    (operators/graph.knn_pagerank) — the coreset/data-pruning density
    score; identical loop ranks crawl domains. The oracle unrolls the
    same fixed power iteration (teleport + dangling redistribution) as
    a CTE chain, so the distributed join+groupBy rounds are verified
    value-exact against the naive formulation."""
    from .operators.graph import knn_pagerank
    return knn_pagerank(_emb(spark, sf_dir), k=PR_K, n_bits=PR_BITS,
                        iters=PR_ITERS, damping=PR_DAMPING)


def _pagerank_sql() -> str:
    bits = " || ".join(
        f"CASE WHEN embedding[{i + 1}] >= 0 THEN '1' ELSE '0' END"
        for i in range(PR_BITS))
    head = f"""
    WITH base AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
               {bits} AS bucket
        FROM embeddings
    ),
    cand AS (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               round(list_sum(list_transform(range(1, 65),
                         i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 6) AS cos6
        FROM base a JOIN base b
          ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    ),
    knn AS (
        SELECT src, dst FROM (
            SELECT *, row_number() OVER (PARTITION BY src
                                         ORDER BY cos6 DESC, dst) AS rn
            FROM cand) WHERE rn <= {PR_K}
    ),
    outdeg AS (SELECT src, count(*) AS deg FROM knn GROUP BY src),
    nodes AS (SELECT vec_id FROM base),
    nn AS (SELECT count(*) AS c FROM nodes),
    r0 AS (SELECT vec_id, 1.0 / (SELECT c FROM nn) AS r FROM nodes)"""
    its = []
    for t in range(1, PR_ITERS + 1):
        p = t - 1
        its.append(f""",
    d{t} AS (
        SELECT coalesce(sum(r), 0) AS dang FROM r{p}
        WHERE vec_id NOT IN (SELECT src FROM outdeg)
    ),
    r{t} AS (
        SELECT nd.vec_id,
               {1.0 - PR_DAMPING} / (SELECT c FROM nn)
               + {PR_DAMPING} * (coalesce(ct.s, 0)
                                 + (SELECT dang FROM d{t})
                                   / (SELECT c FROM nn)) AS r
        FROM nodes nd LEFT JOIN (
            SELECT k.dst AS vec_id, sum(p.r / o.deg) AS s
            FROM knn k JOIN r{p} p ON k.src = p.vec_id
                       JOIN outdeg o ON k.src = o.src
            GROUP BY k.dst) ct ON nd.vec_id = ct.vec_id
    )""")
    tail = f"""
    SELECT vec_id, round(r * 1e6, 4) AS pagerank_ppm
    FROM r{PR_ITERS}
    ORDER BY pagerank_ppm DESC, vec_id
"""
    return head + "".join(its) + tail


QUERIES["q115_knn_pagerank"] = q115_knn_pagerank
ORACLES["q115_knn_pagerank"] = _pagerank_sql()


HARDNEG_K = 5
HARDNEG_BITS = 4


def q117_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (operators/similarity.hard_negative_mining)
    over the labeled embeddings table: per anchor, the 5 most-similar
    DIFFERENT-label vectors from its sign bucket — the contrastive-
    training negative curriculum. Oracle = identical candidate algebra
    in SQL."""
    return similarity.hard_negative_mining(
        _emb(spark, sf_dir), k=HARDNEG_K, n_bits=HARDNEG_BITS)


_HARDNEG_BUCKET_BITS = " || ".join(
    f"CASE WHEN embedding[{i + 1}] >= 0 THEN '1' ELSE '0' END"
    for i in range(HARDNEG_BITS))
_HARDNEG_SQL = f"""
    WITH base AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
               {_HARDNEG_BUCKET_BITS} AS bucket
        FROM embeddings
    ),
    cand AS (
        SELECT a.vec_id AS anchor_id, a.label AS anchor_label,
               b.vec_id AS negative_id, b.label AS neg_label,
               round(list_sum(list_transform(range(1, 65),
                         i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 6)
                   AS cos_sim
        FROM base a JOIN base b
          ON a.bucket = b.bucket AND a.label <> b.label
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY anchor_id
                                     ORDER BY cos_sim DESC, negative_id)
                      AS rnk
        FROM cand
    )
    SELECT anchor_id, anchor_label, negative_id, neg_label, cos_sim,
           CAST(rnk AS INTEGER) AS rnk
    FROM ranked WHERE rnk <= {HARDNEG_K}
    ORDER BY anchor_id, rnk
"""

QUERIES["q117_hard_negatives"] = q117_hard_negatives
ORACLES["q117_hard_negatives"] = _HARDNEG_SQL


def q123_bitext_mutual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-best bitext election (CCMatrix's stricter rule): q113's
    forward-best pairs additionally filtered to targets that elect the
    same source back — unique on BOTH sides. One extra per-tgt window
    over the already-thinned forward set."""
    return similarity.bitext_margin_pairs(
        _emb(spark, sf_dir), k=BITEXT_K, threshold=BITEXT_THRESHOLD,
        n_bits=BITEXT_BITS, mutual=True)


_BITEXT_MUTUAL_SQL = _BITEXT_SQL.replace(
    """    SELECT src_id, tgt_id, cos6 AS cos_sim, margin
    FROM best
    WHERE rb = 1 AND margin >= {thr}
    ORDER BY src_id
""".format(thr=BITEXT_THRESHOLD),
    """    , fwd AS (
        SELECT src_id, tgt_id, cos6, margin FROM best
        WHERE rb = 1 AND margin >= {thr}
    ),
    back AS (
        SELECT *, row_number() OVER (PARTITION BY tgt_id
                                     ORDER BY margin DESC, src_id) AS rt
        FROM fwd
    )
    SELECT src_id, tgt_id, cos6 AS cos_sim, margin
    FROM back WHERE rt = 1
    ORDER BY src_id
""".format(thr=BITEXT_THRESHOLD))

QUERIES["q123_bitext_mutual"] = q123_bitext_mutual
ORACLES["q123_bitext_mutual"] = _BITEXT_MUTUAL_SQL
