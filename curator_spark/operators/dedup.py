"""Deduplication operators for web-scale corpora: exact hash dedup,
word-shingle n-gram Jaccard, MinHash+LSH banding, and SimHash.

All hashing is md5-based so the DuckDB oracle can replicate it exactly
(builtin `hash()` differs between engines; md5 hex strings compare
identically everywhere). Minimum-of-md5-hex IS a valid MinHash: md5 is
uniform over hex strings, so argmin over shingles is a uniform random
permutation draw per seed.

Scale shape (100 TB corpus):
* exact_dedup — one shuffle on a 128-bit uniform key; no skew possible.
* MinHash/LSH — per-doc signature is a narrow map + one groupBy(doc);
  candidate generation joins on (band, band_key) buckets, never on raw
  shingles, so the join fan-out is bounded by bucket collision rates.
* jaccard_pairs (exact) is the VERIFY stage for LSH candidates at scale;
  run standalone only on bounded inputs (it self-joins on shingles).
* SimHash — narrow map + 16 conditional sums per doc; dedup = equality
  on the signature (or Hamming-ball probing over signature rotations).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

N_HASHES = 16
# 8 bands × 2 rows: candidate threshold ≈ (1/b)^(1/r) ≈ 0.35 — tuned for
# recall (candidates are verified by exact Jaccard downstream, so false
# positives cost a check, false negatives cost a missed duplicate)
N_BANDS = 8
ROWS_PER_BAND = N_HASHES // N_BANDS
SIMHASH_BITS = 16
HIGH_HEX = ("8", "9", "a", "b", "c", "d", "e", "f")

# MinHash family: h_i(s) = (A_i·x + B_i) mod P with x = md5_48(s) mod P.
# One md5 per shingle; the 16 permutations are integer arithmetic that
# both Spark and DuckDB evaluate identically (all values < 2^62, no
# overflow). P = 2^31 - 1 (Mersenne prime). Coefficients are fixed
# literals (random.Random(20240614) draws) — part of the operator's
# definition, mirrored into the oracle SQL from these constants.
MINHASH_P = 2_147_483_647
MINHASH_COEFFS: list[tuple[int, int]] = [
    (966054304, 908929092), (1422436999, 1497291263), (524581873, 653160994),
    (185178803, 2075590218), (182605160, 1813232178), (1993014393, 174311505),
    (2101706648, 1657525197), (1702305435, 1430015699), (612551836, 1228398721),
    (1797913061, 366283388), (1972218843, 1991121551), (1478414515, 797174017),
    (238230001, 1637454209), (159996282, 2042650189), (163579317, 236680677),
    (628748253, 1757167496),
]


def tokens_expr(text_col: str = "text") -> Column:
    """Lowercased whitespace tokens, empties removed (JVM-side)."""
    return F.filter(F.split(F.lower(F.col(text_col)), " "), lambda t: t != "")


def shingles_expr(text_col: str = "text", n: int = 5) -> Column:
    """Distinct word n-gram shingles as array<string>.

    Guarded sequence: Spark's `sequence(1, k)` DESCENDS when k<1, so a
    doc shorter than n shingles to an empty array, not garbage."""
    toks = tokens_expr(text_col)
    m = F.size(toks) - F.lit(n - 1)
    idx = F.when(m >= 1, F.sequence(F.lit(1), m)).otherwise(
        F.array().cast("array<int>"))
    sh = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.array_distinct(sh)


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Group by content hash; min id is canonical. The reference's
    run-level fingerprint memoization (SURVEY.md §2 A14) applied per-row."""
    return (
        docs.select(id_col, F.md5(F.col(text_col)).alias("h"))
        .groupBy("h")
        .agg(F.min(id_col).alias("canonical_id"),
             F.count(F.lit(1)).alias("n_dups"))
    )


def doc_shingles(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", n: int = 5) -> DataFrame:
    """(id, shingle) exploded distinct shingle table."""
    return (
        docs.select(F.col(id_col), F.explode(shingles_expr(text_col, n)).alias("shingle"))
    )


def minhash_bands(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", n: int = 5,
                  n_hashes: int = N_HASHES, n_bands: int = N_BANDS) -> DataFrame:
    """Per-(doc, band) LSH key.

    One md5 per shingle; the n_hashes permutations are affine maps
    (MINHASH_COEFFS) of the 48-bit hash mod P — computed as plain
    columns, so the whole signature is ONE groupBy with n_hashes min()
    aggregates (map-side combined; no seed explode, no collect_list).
    Band key = md5 over the band's minhashes in seed order. Uniform
    keys — no skew at any corpus size."""
    sh = doc_shingles(docs, text_col, id_col, n)
    x = (F.conv(F.substring(F.md5(F.col("shingle")), 1, 12), 16, 10)
         .cast("long") % MINHASH_P)
    hashed = sh.select(
        id_col,
        *[((F.lit(a) * x + F.lit(b)) % MINHASH_P).alias(f"h{i}")
          for i, (a, b) in enumerate(MINHASH_COEFFS[:n_hashes])],
    )
    sig = hashed.groupBy(id_col).agg(
        *[F.min(f"h{i}").alias(f"m{i}") for i in range(n_hashes)])
    rows_per_band = n_hashes // n_bands
    bands = [
        F.struct(
            F.lit(band).alias("band"),
            F.md5(F.concat_ws("-", *[
                F.col(f"m{i}").cast("string")
                for i in range(band * rows_per_band, (band + 1) * rows_per_band)
            ])).alias("band_key"),
        )
        for band in range(n_bands)
    ]
    return (
        sig.select(id_col, F.explode(F.array(*bands)).alias("bk"))
        .select(id_col, F.col("bk.band").alias("band"),
                F.col("bk.band_key").alias("band_key"))
    )


def lsh_candidate_pairs(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 5,
                        max_bucket: int | None = None) -> DataFrame:
    """Near-dup candidate pairs (id_a < id_b) sharing ≥1 LSH band.

    The scale path for near-dedup: candidates come from equi-joining
    compact band buckets; verify with jaccard_pairs on candidates only.

    max_bucket: candidate generation is quadratic WITHIN a bucket, so
    one degenerate bucket (100 TB of shared boilerplate hashing to one
    band key) can dominate the whole job. The standard defense is to
    drop buckets larger than a cap — a bucket that big is
    non-discriminative anyway (its members are caught by exact dedup or
    by their other 7 bands). None (default) keeps every bucket: exact
    candidate semantics, required by the q19 oracle."""
    bands = minhash_bands(docs, text_col, id_col, n)
    if max_bucket is not None:
        sizes = (bands.groupBy("band", "band_key")
                 .agg(F.count(F.lit(1)).alias("bsz")))
        bands = (bands.join(sizes, ["band", "band_key"])
                 .filter(F.col("bsz") <= max_bucket)
                 .drop("bsz"))
    a = bands.select(F.col(id_col).alias("id_a"), "band", "band_key")
    b = bands.select(F.col(id_col).alias("id_b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b").distinct()
    )


def jaccard_pairs(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", n: int = 3,
                  threshold: float = 0.5,
                  broadcast_sizes: bool = False,
                  max_shingle_df: int | None = None) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs (id_a < id_b, sim ≥ threshold).

    Self-join on shingles → intersection counts; |A∪B| from per-doc
    distinct-shingle sizes. O(collisions) not O(n²): only docs sharing a
    shingle ever pair. At 100 TB run this on LSH candidates, not raw.

    broadcast_sizes: the per-doc size table has one row per input doc —
    corpus-sized, NOT broadcastable at scale. Default False lets
    Catalyst/AQE pick the join strategy from actual sizes; pass True
    only when the input is a bounded candidate set.

    max_shingle_df: the shingle self-join fans out quadratically per
    shingle — one stop-shingle present in 10^6 docs generates 10^12
    pairs. Standard defense: drop shingles whose document frequency
    exceeds the cap BEFORE the join (per-doc sizes keep counting them,
    so the Jaccard denominators are unchanged; only the numerator loses
    the non-discriminative shingles → similarity is underestimated for
    pairs that shared ONLY stop-shingles — pairs that were not
    near-dups). None (default) = exact semantics (the oracle's)."""
    sh = doc_shingles(docs, text_col, id_col, n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    if max_shingle_df is not None:
        df_counts = (sh.groupBy("shingle")
                     .agg(F.count(F.lit(1)).alias("sdf")))
        sh = (sh.join(df_counts, "shingle")
              .filter(F.col("sdf") <= max_shingle_df)
              .drop("sdf"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    if broadcast_sizes:
        sz_a, sz_b = F.broadcast(sz_a), F.broadcast(sz_b)
    return (
        inter.join(sz_a, "id_a").join(sz_b, "id_b")
        .withColumn("jaccard", F.round(
            F.col("n_inter")
            / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")), 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def dedup_decisions(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", n: int = 3,
                    threshold: float = 0.5) -> DataFrame:
    """End-to-end dedup decision per document: exact → LSH candidates →
    exact-Jaccard verify → keep.

    A document is dropped when (a) it is a non-canonical exact duplicate
    (same md5, higher id), or (b) it has a verified near-duplicate with
    a smaller id among the LSH candidate pairs ("keep first" — the
    standard linear-time approximation of clustering; transitive-closure
    dedup would need iterative connected components).

    Scale shape: every stage is a bounded equi-join on uniform keys —
    content hash, band key, shingle — never an n² comparison; the
    Jaccard verify runs only on LSH candidates.
    """
    hashed = docs.select(id_col, F.md5(F.col(text_col)).alias("h"))
    canon = hashed.groupBy("h").agg(F.min(id_col).alias("canonical_id"))
    exact_drop = (hashed.join(canon, "h")
                  .filter(F.col(id_col) != F.col("canonical_id"))
                  .select(F.col(id_col).alias("drop_id")))

    cands = lsh_candidate_pairs(docs, text_col, id_col, n)
    verified = jaccard_pairs(docs, text_col, id_col, n, threshold)
    near_drop = (cands.join(verified, ["id_a", "id_b"])
                 .select(F.col("id_b").alias("drop_id")))

    drops = exact_drop.unionByName(near_drop).distinct()
    return (
        docs.select(id_col)
        .join(drops, F.col(id_col) == F.col("drop_id"), "left")
        .select(id_col, F.col("drop_id").isNull().alias("keep_dedup"))
    )


def dedup_conversations(turns: DataFrame, text_col: str = "text",
                        n: int = 3, threshold: float = 0.5) -> DataFrame:
    """Conversation-level dedup: reassemble each conversation's turns in
    (turn_idx) order into one document, then run the full dedup decision
    (exact → LSH → Jaccard verify) over conversations.

    Composes the quality pipeline with the dedup stack — run it on the
    pipeline's `scrubbed_text` so PII differences don't mask duplicates.
    Returns (conv_id, keep_dedup). The reassembly is one groupBy with a
    deterministic sorted collect_list; conversation documents are
    ~avg_turns× smaller in row count than the turn table."""
    conv_docs = (
        turns.groupBy("conv_id")
        .agg(F.concat_ws("\n", F.transform(
            F.array_sort(F.collect_list(
                F.struct(F.col("turn_idx").alias("i"),
                         F.col(text_col).alias("t")))),
            lambda x: x["t"])).alias("conv_text"))
    )
    return dedup_decisions(conv_docs, text_col="conv_text",
                           id_col="conv_id", n=n, threshold=threshold)


def simhash(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id", bits: int = SIMHASH_BITS) -> DataFrame:
    """SimHash signature as a `bits`-char bitstring.

    Bit p of the signature is the sign of Σ_tokens w(token)·(±1), where
    the ±1 is hex digit p of md5(token) ≥ 8 and w is the token's count in
    the doc. Exactly replicable in SQL (see queries_dedup.ORACLES)."""
    toks = (
        docs.select(id_col, F.explode(tokens_expr(text_col)).alias("token"))
        .withColumn("h", F.md5(F.col("token")))
    )
    bit_sums = [
        F.sum(F.when(F.substring("h", p + 1, 1).isin(*HIGH_HEX), 1)
              .otherwise(-1)).alias(f"s{p}")
        for p in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*bit_sums)
    bit_chars = [
        F.when(F.col(f"s{p}") > 0, F.lit("1")).otherwise(F.lit("0"))
        for p in range(bits)
    ]
    return agg.select(id_col, F.concat(*bit_chars).alias("simhash"))


def decontaminate(train: DataFrame, benchmark: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  n: int = 13) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing ANY word
    n-gram with a benchmark/eval document (the GPT-3-style 13-gram
    overlap rule every serious pretraining pipeline runs before
    training). Plan shape: both sides explode to distinct shingles,
    LEFT SEMI join on the shingle — the train side is flagged without
    materializing the (train × benchmark) product, and the benchmark
    shingle set is typically small enough to broadcast. Returns
    (id, contaminated:boolean) for every training doc."""
    tr_sh = doc_shingles(train, text_col, id_col, n)
    bm_sh = (doc_shingles(benchmark, text_col, id_col, n)
             .select("shingle").distinct())
    dirty = (tr_sh.join(bm_sh, "shingle", "left_semi")
             .select(id_col).distinct()
             .withColumn("contaminated", F.lit(True)))
    return (train.select(id_col)
            .join(dirty, id_col, "left")
            .select(id_col, F.coalesce("contaminated", F.lit(False))
                    .alias("contaminated")))


# fixed Bloom hash family: k=4 seeded xxhash64 draws (with m = 16·n
# bits, fpp = (1 - e^{-k·n/m})^k ≈ 0.24%)
_BLOOM_SEEDS = (0x9E3779B9, 0x85EBCA6B, 0xC2B2AE35, 0x27D4EB2F)
_BLOOM_BITS_PER_ITEM = 16


def _bloom_positions(shingle_col, m_bits: int):
    return [F.pmod(F.xxhash64(shingle_col, F.lit(int(s))), F.lit(m_bits))
            for s in _BLOOM_SEEDS]


def decontaminate_bloom(train: DataFrame, benchmark: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 13,
                        expected_items: int = 1_000_000) -> DataFrame:
    """Bloom-prefiltered decontamination — RESULT-IDENTICAL to
    `decontaminate`, with a different physical plan for the 100 TB
    regime where even the deduplicated benchmark shingle set is too
    big to broadcast as rows: the benchmark shingles collapse into one
    bitmap (k seeded JVM xxhash64 positions per shingle, OR-folded
    into 64-bit words by a map-side-combined `bit_or` aggregate — the
    driver collects at most m/64 words, i.e. exactly the sketch's own
    size), the bitmap broadcasts once, and an Arrow-vectorized numpy
    probe prunes the exploded train-shingle table to candidate hits.
    Only the survivors — the true hits plus an fpp-fraction of clean
    shingles — enter the exact semi-join that removes Bloom false
    positives. The exact confirm keeps the output equal to the plain
    semi-join (the oracle is literally q47's SQL): the sketch is pure
    pruning, never a correctness knob.

    Reference analogue for the shape: the reference prunes
    resubmission by a completed-ids set lookup before doing real work
    (base_online_request_processor.py:276-277); here the set is
    sketched because it no longer fits as rows."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    m_bits = max(64, int(expected_items) * _BLOOM_BITS_PER_ITEM)
    tr_sh = doc_shingles(train, text_col, id_col, n)
    bm_sh = (doc_shingles(benchmark, text_col, id_col, n)
             .select("shingle").distinct())

    # build: positions → per-word bit_or (shuffle ≤ m/64 uniform keys)
    pos = bm_sh.select(F.explode(F.array(
        *_bloom_positions(F.col("shingle"), m_bits))).alias("p"))
    words = (pos.select((F.col("p") / 64).cast("long").alias("w"),
                        F.expr("shiftleft(CAST(1 AS BIGINT), "
                               "CAST(p % 64 AS INT))").alias("b"))
             .groupBy("w").agg(F.bit_or("b").alias("bits")).collect())
    bitmap = np.zeros((m_bits + 63) // 64, dtype=np.uint64)
    for r in words:
        bitmap[int(r["w"])] = np.uint64(int(r["bits"]) & 0xFFFFFFFFFFFFFFFF)
    bc = train.sparkSession.sparkContext.broadcast(bitmap)

    def _probe(p1, p2, p3, p4):
        bm = bc.value
        res = np.ones(len(p1), dtype=bool)
        for p in (p1, p2, p3, p4):
            a = p.to_numpy(dtype=np.int64).astype(np.uint64)
            res &= ((bm[a >> np.uint64(6)] >> (a & np.uint64(63)))
                    & np.uint64(1)).astype(bool)
        return pd.Series(res)

    _might_contain = pandas_udf(_probe, "boolean")

    candidates = (tr_sh
                  .filter(_might_contain(
                      *_bloom_positions(F.col("shingle"), m_bits)))
                  .select(id_col, "shingle"))
    dirty = (candidates.join(bm_sh, "shingle", "left_semi")
             .select(id_col).distinct()
             .withColumn("contaminated", F.lit(True)))
    return (train.select(id_col)
            .join(dirty, id_col, "left")
            .select(id_col, F.coalesce("contaminated", F.lit(False))
                    .alias("contaminated")))


SEG_WORDS = 12
SEG_MIN_DF = 2


def remove_duplicate_segments(docs: DataFrame, text_col: str = "text",
                              id_col: str = "doc_id",
                              seg_words: int = SEG_WORDS,
                              min_df: int = SEG_MIN_DF) -> DataFrame:
    """Boilerplate removal: REWRITE each doc with its corpus-duplicated
    segments deleted — the destructive counterpart of
    duplicate_span_stats (C4 removes repeated lines; RefinedWeb and
    Lee et al. 2021 cut exact duplicate spans; here the span unit is a
    fixed window of `seg_words` whitespace tokens, since the synthetic
    corpus has no newlines).

    A segment is removed when its exact text occurs in >= min_df
    DISTINCT documents (cross-doc boilerplate; within-doc repetition
    is textstats.repetition_stats' job). Survivors are reassembled in
    original order via the sorted-struct collect (q25's deterministic
    collect_list convention).

    Plan shape: segment explode (narrow, text dropped immediately) →
    ONE map-side-combined groupBy(seg) for distinct-doc frequency →
    anti-join survivors on the same seg key (exchange reuse) →
    groupBy(doc) reassembly. Two data-proportional shuffles on uniform
    keys, no all-pairs product.

    Returns (id, clean_text, n_segs:bigint, n_removed:bigint); a doc
    whose every segment is boilerplate comes back with clean_text ''."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    n_segs = (F.size(toks) + F.lit(seg_words - 1)).cast("long") / seg_words
    n_segs = F.floor(n_segs).cast("int")
    idx = F.when(n_segs >= 1, F.sequence(F.lit(1), n_segs)).otherwise(
        F.array().cast("array<int>"))
    seg = docs.select(
        F.col(id_col),
        F.explode(F.transform(idx, lambda i: F.struct(
            i.alias("seg_idx"),
            F.array_join(F.slice(toks, (i - 1) * seg_words + 1, seg_words),
                         " ").alias("seg")))).alias("s")
    ).select(id_col, F.col("s.seg_idx").alias("seg_idx"),
             F.col("s.seg").alias("seg"))
    dfreq = seg.groupBy("seg").agg(
        F.countDistinct(id_col).alias("seg_df"))
    kept = (seg.join(dfreq.filter(F.col("seg_df") >= min_df),
                     "seg", "left_anti"))
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                lambda s: s["seg"]),
            " ").alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"))
    totals = seg.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_segs"))
    base = docs.select(id_col)
    out = (base.join(totals, id_col, "left").join(rebuilt, id_col, "left")
           .na.fill(0, ["n_segs", "n_kept"]).na.fill({"clean_text": ""}))
    return out.select(
        id_col, "clean_text", F.col("n_segs").cast("long").alias("n_segs"),
        (F.col("n_segs") - F.col("n_kept")).cast("long").alias("n_removed"))


def dedup_paragraphs(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     seg_words: int = SEG_WORDS) -> DataFrame:
    """Paragraph-level exact dedup, FIRST occurrence kept (the
    Dolma/RedPajama paragraph-dedup rule): every later occurrence of a
    paragraph already seen anywhere in the corpus is deleted, but —
    unlike remove_duplicate_segments, which deletes ALL copies of a
    duplicated segment — the globally earliest occurrence survives, so
    no content is lost, only repeats. The canonical occurrence of a
    paragraph is the lexicographic minimum of (id, seg_idx), the same
    deterministic min-wins convention the exact-dedup and
    connected-components operators use. The paragraph unit is a fixed
    window of `seg_words` whitespace tokens (the synthetic corpus has
    no newlines).

    Plan shape: segment explode (narrow; full text dropped at the
    explode) → ONE map-side-combined groupBy(seg) taking
    min(struct(id, seg_idx)) → join back on the same seg key (exchange
    reuse) keeping only the argmin occurrence → groupBy(id)
    reassembly in original order. Two data-proportional shuffles on
    uniform keys; no all-pairs product, no window over an unbounded
    key. A viral paragraph with 10^9 copies is ONE reduced row in the
    argmin aggregate — map-side combine absorbs the skew.

    Returns (id, clean_text, n_segs:bigint, n_dropped:bigint); a doc
    made entirely of already-seen paragraphs comes back with
    clean_text ''."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    n_segs = (F.size(toks) + F.lit(seg_words - 1)).cast("long") / seg_words
    n_segs = F.floor(n_segs).cast("int")
    idx = F.when(n_segs >= 1, F.sequence(F.lit(1), n_segs)).otherwise(
        F.array().cast("array<int>"))
    seg = docs.select(
        F.col(id_col),
        F.explode(F.transform(idx, lambda i: F.struct(
            i.alias("seg_idx"),
            F.array_join(F.slice(toks, (i - 1) * seg_words + 1, seg_words),
                         " ").alias("seg")))).alias("s")
    ).select(id_col, F.col("s.seg_idx").alias("seg_idx"),
             F.col("s.seg").alias("seg"))
    first = seg.groupBy("seg").agg(
        F.min(F.struct(F.col(id_col).alias("fid"),
                       F.col("seg_idx").alias("fidx"))).alias("f"))
    kept = (seg.join(first, "seg")
            .filter((F.col(id_col) == F.col("f.fid"))
                    & (F.col("seg_idx") == F.col("f.fidx")))
            .select(id_col, "seg_idx", "seg"))
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                lambda s: s["seg"]),
            " ").alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"))
    totals = seg.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_segs"))
    base = docs.select(id_col)
    out = (base.join(totals, id_col, "left").join(rebuilt, id_col, "left")
           .na.fill(0, ["n_segs", "n_kept"]).na.fill({"clean_text": ""}))
    return out.select(
        id_col, "clean_text", F.col("n_segs").cast("long").alias("n_segs"),
        (F.col("n_segs") - F.col("n_kept")).cast("long").alias("n_dropped"))


def remove_duplicate_spans(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", n: int = 5,
                           min_df: int = 2) -> DataFrame:
    """MAXIMAL-span exact-substring dedup (Lee et al. 2021
    "Deduplicating Training Data Makes Language Models Better", the
    suffix-array span semantics re-expressed over sliding word
    n-grams): a token is removed iff ANY corpus-duplicated n-gram
    window covers it, so overlapping duplicated windows merge into one
    maximal removed span — a 50-token boilerplate block is cut whole,
    not in `seg_words` quanta (contrast remove_duplicate_segments,
    whose disjoint fixed segments miss duplicates that straddle a
    segment boundary).

    A window is duplicated when its exact text occurs in >= min_df
    DISTINCT documents. Survivor tokens reassemble in original order;
    a doc shorter than n tokens has no windows and is untouched.

    Plan shape at 100 TB: sliding-window explode (narrow; text is
    dropped immediately) → ONE map-side-combined groupBy(window) for
    distinct-doc frequency → left-semi back on the same window key
    (exchange reuse) → groupBy(doc) collects the doc's duplicated
    START POSITIONS (bounded by doc length, never corpus-sized) →
    one doc-keyed join back, then the coverage mask is pure array
    math inside codegen: position j is covered iff a start s exists
    with s <= j < s+n. Two data-proportional shuffles (window key,
    doc key), no window functions, no all-pairs anything. Per-row
    cost is O(n_toks × n_dup_starts) in the mask fold — bounded in
    practice by the quality pipeline's doc-length caps; a pathological
    fully-duplicated long doc degrades that one ROW, not the stage.

    Returns (id, clean_text, n_tokens:bigint, n_removed:bigint)."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    staged = docs.select(F.col(id_col), toks.alias("toks"),
                         F.size(toks).alias("n_toks"))
    nw = F.col("n_toks") - F.lit(n - 1)
    wins = (staged.filter(F.col("n_toks") >= n)
            .select(id_col, F.explode(F.transform(
                F.sequence(F.lit(1), nw),
                lambda i: F.struct(
                    i.alias("i"),
                    F.array_join(F.slice("toks", i, n), " ")
                    .alias("w")))).alias("s"))
            .select(id_col, F.col("s.i").alias("i"),
                    F.col("s.w").alias("w")))
    dupw = (wins.groupBy("w")
            .agg(F.countDistinct(id_col).alias("wdf"))
            .filter(F.col("wdf") >= min_df).select("w"))
    starts = (wins.join(dupw, "w", "left_semi")
              .groupBy(id_col)
              .agg(F.array_sort(F.collect_list("i")).alias("starts")))
    out = staged.join(starts, id_col, "left")
    sarr = F.coalesce(F.col("starts"), F.array().cast("array<int>"))
    pos = F.when(F.col("n_toks") >= 1,
                 F.sequence(F.lit(1), F.col("n_toks"))).otherwise(
        F.array().cast("array<int>"))
    kept = F.filter(pos, lambda j: ~F.exists(
        sarr, lambda s: (s <= j) & (j < s + F.lit(n))))
    clean = F.array_join(
        F.transform(kept, lambda j: F.element_at(F.col("toks"), j)), " ")
    return out.select(
        F.col(id_col), clean.alias("clean_text"),
        F.col("n_toks").cast("long").alias("n_tokens"),
        (F.col("n_toks") - F.size(kept)).cast("long").alias("n_removed"))


def duplicate_span_stats(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", n: int = 5,
                         min_df: int = 2,
                         max_shingle_df: int | None = None) -> DataFrame:
    """Per-document duplicated-span statistics: the fraction of a doc's
    distinct word n-grams that occur in >= min_df documents corpus-wide
    (the Spark-shaped analogue of suffix-array span dedup, Lee et al.
    2021 "Deduplicating Training Data Makes Language Models Better" --
    exact-substring spans become shingle document frequencies).

    Plan shape at 100 TB: explode to distinct shingles per doc, ONE
    map-side-combined groupBy(shingle) for document frequency, shuffle
    join back on the same shingle key (co-partitioned -- Catalyst reuses
    the exchange), groupBy(doc) for the per-doc tallies. No all-pairs
    product at any stage.

    max_shingle_df: hot-shingle skew defense for the df join -- a
    boilerplate shingle present in 10^8 docs would land 10^8 rows on
    one reduce partition. Shingles with df > max_shingle_df are pulled
    into a small broadcast set and counted per doc with narrow
    broadcast semi/anti joins instead of the shuffle join; since
    df > max_shingle_df >= min_df they are duplicated BY DEFINITION,
    so unlike jaccard_pairs' cap this is EXACT, not an approximation
    (requires max_shingle_df >= min_df; assumes the over-cap shingle
    set is driver-small -- bounded by corpus_shingles / cap).

    Returns (id, n_shingles, n_dup_shingles, dup_frac) for every doc;
    docs shorter than n words have zero shingles and dup_frac 0.0."""
    sh = doc_shingles(docs, text_col, id_col, n)
    df_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    if max_shingle_df is None:
        tallies = (
            sh.join(df_counts, "shingle")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_shingles"),
                 F.sum((F.col("df") >= min_df).cast("long"))
                 .alias("n_dup_shingles"))
        )
    else:
        if max_shingle_df < min_df:
            raise ValueError(
                f"max_shingle_df ({max_shingle_df}) must be >= min_df "
                f"({min_df}) for the hot-shingle shortcut to stay exact")
        hot = F.broadcast(df_counts.filter(F.col("df") > max_shingle_df)
                          .select("shingle"))
        cold_tallies = (
            sh.join(hot, "shingle", "left_anti")
            .join(df_counts, "shingle")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_cold"),
                 F.sum((F.col("df") >= min_df).cast("long"))
                 .alias("n_cold_dup"))
        )
        hot_tallies = (
            sh.join(hot, "shingle", "left_semi")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_hot"))
        )
        tallies = (
            cold_tallies.join(hot_tallies, id_col, "full_outer")
            .select(
                id_col,
                (F.coalesce("n_cold", F.lit(0))
                 + F.coalesce("n_hot", F.lit(0))).alias("n_shingles"),
                (F.coalesce("n_cold_dup", F.lit(0))
                 + F.coalesce("n_hot", F.lit(0))).alias("n_dup_shingles"),
            )
        )
    return (
        docs.select(id_col)
        .join(tallies, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shingles", F.lit(0).cast("long"))
            .alias("n_shingles"),
            F.coalesce("n_dup_shingles", F.lit(0).cast("long"))
            .alias("n_dup_shingles"),
        )
        .withColumn(
            "dup_frac",
            F.round(F.col("n_dup_shingles")
                    / F.greatest("n_shingles", F.lit(1)), 4))
    )


def contamination_stats(train: DataFrame, benchmark: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 13) -> DataFrame:
    """Graded decontamination: per training doc, the FRACTION of its
    distinct word n-grams shared with the benchmark set (decontaminate
    is the boolean any-overlap rule; production pipelines also want the
    Llama-style contamination ratio to threshold, e.g. drop > 0.8).

    Same scale path as decontaminate: benchmark shingles deduplicate to
    a compact set (broadcastable in practice), joined LEFT onto the
    train shingles with a hit flag so ONE aggregation pass over the
    exploded train-shingle table (the largest relation in the plan)
    computes both the total and the contaminated count -- never a
    train x benchmark product. bm_sh is distinct, so the left join
    cannot fan rows out. Returns (id, n_shingles, n_contaminated,
    contamination_frac) for every training doc."""
    tr_sh = doc_shingles(train, text_col, id_col, n)
    bm_sh = (doc_shingles(benchmark, text_col, id_col, n)
             .select("shingle").distinct()
             .withColumn("hit", F.lit(1)))
    tallies = (
        tr_sh.join(bm_sh, "shingle", "left")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shingles"),
             F.sum(F.coalesce("hit", F.lit(0))).cast("long")
             .alias("n_contaminated"))
    )
    return (
        train.select(id_col)
        .join(tallies, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shingles", F.lit(0).cast("long"))
            .alias("n_shingles"),
            F.coalesce("n_contaminated", F.lit(0).cast("long"))
            .alias("n_contaminated"),
        )
        .withColumn(
            "contamination_frac",
            F.round(F.col("n_contaminated")
                    / F.greatest("n_shingles", F.lit(1)), 4))
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003 — the
# MOSS algorithm).
# ---------------------------------------------------------------------------

WINNOW_POS_BASE = 1_000_000  # docs are chunked well below 10^6 grams


def winnow_fingerprints(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        k: int = 4, w: int = 8) -> DataFrame:
    """Per-document winnowing fingerprints: hash every word k-gram,
    slide a window of w consecutive gram hashes, select each window's
    minimum (rightmost on ties — the classic rule), emit the DISTINCT
    selected (hash, gram position) pairs.

    Guarantees (the paper's): any shared substring of at least
    w + k - 1 words produces at least one SHARED fingerprint, and the
    expected density is 2/(w+1) — so fingerprints are a ~4x-reduced
    (at w=8), position-robust sketch that LOCALIZES matches (MinHash
    answers "how similar are these documents"; winnowing answers
    "WHERE do they overlap", which is why MOSS uses it).

    Plan shape: everything through selection is per-row array
    expressions in codegen — gram hashing, windowed min, dedup all
    happen inside one narrow map; ZERO shuffle until the caller joins
    fingerprints. The tie rule is encoded arithmetically: each gram's
    key is md5-prefix || zero-padded (BASE - position), so the
    lexicographic array_min picks the smallest hash and, among equal
    hashes, the largest position (rightmost). Both halves decode back
    out of the selected key.

    Documents shorter than k words have no grams and no fingerprints;
    with 0 < m < w grams the single window is the whole gram list
    (both guards matter: sequence(1, 0) DESCENDS and would fabricate
    windows).
    """
    toks = tokens_expr(text_col)
    m = F.greatest(F.size(toks) - (k - 1), F.lit(0))
    grams = F.when(m > 0, F.transform(
        F.sequence(F.lit(1), m),
        lambda i: F.concat(
            F.substring(F.md5(F.array_join(F.slice(toks, i, k), " ")),
                        1, 8),
            F.format_string("%07d", F.lit(WINNOW_POS_BASE) - i)),
    )).otherwise(F.array().cast("array<string>"))
    n_win = F.when(m == 0, F.lit(0)) \
        .when(m < w, F.lit(1)).otherwise(m - (w - 1))
    sel = F.when(n_win > 0, F.transform(
        F.sequence(F.lit(1), F.greatest(n_win, F.lit(1))),
        lambda j: F.array_min(F.slice(grams, j, w)),
    )).otherwise(F.array().cast("array<string>"))
    return (docs
            .select(F.col(id_col), F.explode(sel).alias("_s"))
            .select(
                id_col,
                F.substring("_s", 1, 8).alias("fp"),
                (F.lit(WINNOW_POS_BASE)
                 - F.substring("_s", 9, 7).cast("int")).alias("pos"))
            .distinct())


def winnow_pairs(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", k: int = 4, w: int = 8,
                 min_shared: int = 2,
                 max_df: int | None = None) -> DataFrame:
    """Near-dup candidate pairs by shared winnowing fingerprints:
    equi-join the fingerprint table with itself on the hash, count
    shared fingerprints per (lower id, higher id) pair, keep pairs
    with >= min_shared. One map-side-combined groupBy feeds one
    equi-join — the LSH-band plan shape with a localizable sketch.

    Skew: a boilerplate gram selected in millions of documents makes
    its hash a quadratic bucket; max_df drops fingerprints whose
    document frequency exceeds it BEFORE the self-join (same contract
    as lsh_candidate_pairs(max_bucket): bounded recall loss on
    boilerplate only, never false pairs).
    """
    fps = winnow_fingerprints(docs, text_col, id_col, k, w) \
        .select(id_col, "fp").distinct()
    if max_df is not None:
        ok = (fps.groupBy("fp").count()
              .filter(F.col("count") <= max_df).select("fp"))
        fps = fps.join(ok, "fp")
    a = fps.select(F.col(id_col).alias("a"), "fp")
    b = fps.select(F.col(id_col).alias("b"), "fp")
    return (a.join(b, "fp")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("shared"))
            .filter(F.col("shared") >= min_shared))


def dedup_by_priority(docs: DataFrame, key_col: str,
                      priority_col: str, id_col: str = "doc_id") -> DataFrame:
    """Priority-aware cross-source dedup: among rows sharing `key_col`
    (a content fingerprint), the canonical copy is the one with the
    SMALLEST (priority, id) — i.e. duplicates keep the copy from the
    most-trusted source, not the lowest id (The Pile / RedPajama rule:
    when a page appears in both a curated dump and a raw crawl, keep
    the curated copy and drop the crawl's).

    Scale shape: election is ONE map-side-combined
    groupBy(key).agg(min(struct(priority, id)), count, n_sources)
    joined back on the same key — NEVER a window over the fingerprint
    (a boilerplate fingerprint shared by 10^7 pages would single-task
    its window partition; the agg reduces it to one row). The
    n_distinct-source count is a two-stage partial aggregate, also
    skew-safe. Same election pattern as dedup_response_openers
    (operators/sft.py) — the generic, priority-ordered form.

    Returns the input rows annotated with group_size, n_sources,
    canon_id and is_canonical (keep = is_canonical).
    """
    best = F.min(F.struct(F.col(priority_col).alias("p"),
                          F.col(id_col).alias("i"))).alias("best")
    groups = (docs.groupBy(key_col)
              .agg(best,
                   F.count(F.lit(1)).alias("group_size"),
                   F.countDistinct(priority_col).alias("n_priorities"))
              .select(key_col, F.col("best.i").alias("canon_id"),
                      "group_size", "n_priorities"))
    return (docs.join(groups, key_col)
            .withColumn("is_canonical", F.col(id_col) == F.col("canon_id")))
