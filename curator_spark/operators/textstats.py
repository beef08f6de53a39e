"""Within-document repetition statistics — the Gopher repetition rules.

Gopher (Rae et al. 2021, §A1.1) drops documents whose content is
dominated by repeated n-grams: "fraction of characters contained in
duplicate n-grams" over several n, plus the share of the single most
frequent n-gram. rules.heuristic_flags covers the line-level variant
(dup_line_frac) inside the Python-parity flagship; this module is the
JVM-side gram-level variant for corpus-wide sweeps.

All metrics are exact integers (occurrence counts and character sums),
so the DuckDB oracle reproduces them bit-for-bit and the keep flag is
an integer comparison (dup_chars·5 < doc_chars ⇔ <20% duplicated-gram
characters) — no float ratios to drift across engines.

Scale shape: explode grams → groupBy(doc_id, gram) → groupBy(doc_id).
Both shuffles are map-side combined on near-uniform keys ((doc, gram)
pairs; doc ids) — no corpus-wide hot key is possible because every key
embeds the doc id. Text is dropped at the explode, so the shuffled
bytes are gram strings, not documents.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .dedup import tokens_expr

REP_N = 2                # word n-gram order for the repetition rule
REP_MAX_DUP_PCT = 20     # keep iff dup-gram chars < 20% of doc chars


def gram_occurrences_expr(text_col: str = "text", n: int = REP_N):
    """ALL word n-gram occurrences (with multiplicity — contrast
    dedup.shingles_expr, which deduplicates for set semantics)."""
    toks = tokens_expr(text_col)
    m = F.size(toks) - F.lit(n - 1)
    idx = F.when(m >= 1, F.sequence(F.lit(1), m)).otherwise(
        F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))


def repetition_stats(docs: DataFrame, n: int = REP_N,
                     max_dup_pct: int = REP_MAX_DUP_PCT,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-doc duplicate-n-gram statistics, Gopher-style.

    Returns (id, n_chars, n_grams, dup_occurrences, dup_chars,
    max_gram_count, rep_ok) where dup_* cover occurrences of grams
    appearing ≥2 times IN THE SAME DOC, dup_chars weights each by the
    gram's character length (spaces included), max_gram_count is the
    highest single-gram occurrence count, and rep_ok is the integer
    keep rule: no duplicated grams at all, OR dup_chars·100 <
    max_dup_pct·n_chars. Docs too short to form a gram (including
    empty docs, where the strict inequality would read 0 < 0) have
    dup_chars 0 and pass — repetition never rejects what the length
    rules should judge."""
    grams = docs.select(
        id_col, F.explode(gram_occurrences_expr(text_col, n)).alias("gram"))
    counts = grams.groupBy(id_col, "gram").agg(
        F.count(F.lit(1)).alias("c"))
    dup = F.when(F.col("c") >= 2, F.col("c")).otherwise(F.lit(0))
    agg = counts.groupBy(id_col).agg(
        F.sum("c").alias("n_grams"),
        F.sum(dup).alias("dup_occurrences"),
        F.sum(dup * F.length("gram")).alias("dup_chars"),
        F.max("c").alias("max_gram_count"))
    base = docs.select(id_col, F.length(text_col).cast("long")
                       .alias("n_chars"))
    out = base.join(agg, id_col, "left").na.fill(
        0, ["n_grams", "dup_occurrences", "dup_chars", "max_gram_count"])
    return out.withColumn(
        "rep_ok",
        (F.col("dup_chars") == 0)
        | (F.col("dup_chars") * 100
           < F.lit(int(max_dup_pct)) * F.col("n_chars")))


def rule_attribution(df: DataFrame,
                     rules: list[tuple[str, "F.Column"]]) -> DataFrame:
    """Per-rule ablation report for a quality filter: for each named
    boolean fail-condition, how many rows it fails (n_failed), how many
    it ALONE fails (n_exclusive — the rows a rule-removal would rescue),
    and the integer permille rates — the report quality-filter owners
    read before loosening a rule (C4/Gopher ablation tables; the
    diagnostic face of q14's keep flag).

    Scale shape: ONE narrow projection casting each rule to int, ONE
    global aggregate of 2·k+2 sums (map-side combined; a single row
    crosses the exchange whatever the corpus size), then a k-row
    explode of that row. No UDF, no second pass over the text.

    Output: one row per rule — rule, n_docs, n_dropped, n_failed,
    n_exclusive, fail_permille (of all docs), rescue_permille (of
    dropped docs). All integers, engine-exact.
    """
    names = [n for n, _ in rules]
    flags = df.select(*[c.cast("int").alias(n) for n, c in rules])
    nf = None
    for n in names:
        nf = F.col(n) if nf is None else nf + F.col(n)
    flags = flags.withColumn("_nf", nf)
    aggs = [F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("_nf") > 0).cast("long")).alias("n_dropped")]
    for n in names:
        aggs.append(F.sum(n).cast("long").alias(f"__f_{n}"))
        aggs.append(F.sum(((F.col(n) == 1) & (F.col("_nf") == 1))
                          .cast("long")).alias(f"__x_{n}"))
    row = flags.agg(*aggs)
    entries = F.array(*[
        F.struct(F.lit(n).alias("rule"),
                 F.col(f"__f_{n}").alias("n_failed"),
                 F.col(f"__x_{n}").alias("n_exclusive"))
        for n in names])
    return (row.select("n_docs", "n_dropped",
                       F.explode(entries).alias("e"))
            .select(F.col("e.rule").alias("rule"), "n_docs", "n_dropped",
                    F.col("e.n_failed").alias("n_failed"),
                    F.col("e.n_exclusive").alias("n_exclusive"))
            .withColumn("fail_permille",
                        F.expr("(1000 * n_failed) div n_docs"))
            .withColumn("rescue_permille",
                        F.expr("(1000 * n_exclusive) div "
                               "greatest(n_dropped, 1)")))


# ---------------------------------------------------------------------
# Compression-ratio quality signal (RefinedWeb/MassiveText-style): how
# well a document's bytes DEFLATE is a cheap, language-agnostic proxy
# for boilerplate and machine-generated repetition — natural prose
# compresses to ~35-60% of its size, templated/repeated content far
# lower, random/encrypted content barely at all. zlib has no JVM
# column-expression equivalent, so this is the sanctioned Python lane:
# an Arrow-batched pandas UDF (level 6, the zlib default, pinned for
# reproducibility — DEFLATE output is deterministic for a fixed level
# and library, and CPython vendors zlib). Integer permille, no floats.

def compressed_permille(docs: DataFrame, text_col: str = "text",
                        out_col: str = "compress_pm",
                        level: int = 6) -> DataFrame:
    """Append `out_col` = ⌊1000 · len(zlib(text)) / len(text)⌋ (int;
    1000 for empty text — incompressible by convention). Narrow
    Arrow-batched map, no shuffle."""
    import zlib

    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def _ratio(texts: pd.Series) -> pd.Series:
        def one(t):
            if not t:
                return 1000
            raw = t.encode("utf-8")
            return len(zlib.compress(raw, level)) * 1000 // len(raw)
        return texts.map(one)

    return docs.withColumn(out_col, _ratio(F.col(text_col)))


def compression_flags(docs: DataFrame, text_col: str = "text",
                      min_pm: int = 250, max_pm: int = 900) -> DataFrame:
    """The keep rule over the signal: too-compressible (< min_pm ⇒
    templated/repeated) or too-incompressible (> max_pm ⇒ base64
    blobs, minified code, binary-in-text) both flag. Bounds follow the
    RefinedWeb practice of cutting both tails."""
    out = compressed_permille(docs, text_col)
    return (out.withColumn("too_compressible",
                           F.col("compress_pm") < min_pm)
            .withColumn("too_random", F.col("compress_pm") > max_pm)
            .withColumn("compression_ok",
                        ~F.col("too_compressible") & ~F.col("too_random")))
