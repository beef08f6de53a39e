"""Persistent MinHash-LSH index — near-dup dedup as incremental state.

At 10^12-turn scale you cannot re-minhash the whole corpus every time
a new crawl batch lands: the signatures ARE the dedup state and must
persist. This module stores the (band, band_key, doc_id) rows that
dedup.minhash_bands computes as an on-disk index table, so deduping a
new batch costs work proportional to the BATCH, never the corpus:

  1. minhash the batch (narrow map + one groupBy over batch shingles);
  2. probe: equi-join the batch's band keys against the index — any
     collision marks the doc a near-duplicate of indexed content
     (LSH-only decision, the scale path; exact verification needs the
     original text, which an index deliberately does not store);
  3. keep-first WITHIN the batch (two new near-dups of each other are
     also resolved, lowest id wins, dedup_decisions' convention);
  4. append ONLY the surviving docs' signatures to the index.

Because an indexed doc collides with itself on every band, re-running
the same batch flags everything and appends nothing — content-level
idempotence under replay, the same property incremental.
append_new_conversations provides for exact dedup (and the analogue of
the reference's cache-hit short-circuit, SURVEY.md §2 A14).

Scale notes: the index is partitioned by `band` and the probe joins on
(band, band_key) — uniform md5 keys, no skew. The index side of the
probe shuffles unless co-located: at cluster scale write the index
`bucketBy(N, "band_key")` into a table (operators/bucketing.py shows
the zero-Exchange join this buys) — the layout is a config, not a code
change. The append itself is a plain parquet append: a crash can leave
a PARTIALLY indexed batch (reduced recall for those docs, never false
flags); for transactional appends route the same rows through the
commitlog ledger as incremental.append_new_conversations does.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .dedup import minhash_bands, N_BANDS, N_HASHES

INDEX_SCHEMA = "band INT, band_key STRING, doc_id LONG"


def write_minhash_index(docs: DataFrame, path: str, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 5) -> int:
    """Create the index from an initial corpus. Returns the number of
    docs that produced signatures (a doc shorter than the shingle
    width n has none and cannot be indexed) — so the return value
    always agrees with index_stats()['n_docs']."""
    bands = minhash_bands(docs, text_col, id_col, n).persist()
    try:
        (bands.select("band", "band_key", F.col(id_col).alias("doc_id"))
         .write.partitionBy("band").mode("errorifexists").parquet(path))
        return bands.select(id_col).distinct().count()
    finally:
        bands.unpersist()


def _read_index(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).select("band", "band_key", "doc_id")


def flag_against_index(spark: SparkSession, docs: DataFrame, path: str,
                       text_col: str = "text", id_col: str = "doc_id",
                       n: int = 5) -> DataFrame:
    """(id, known_neardup:boolean) — True iff the doc shares ≥1 LSH
    band key with any indexed doc. Pure probe; index unchanged."""
    bands = minhash_bands(docs, text_col, id_col, n)
    hits = (bands.join(_read_index(spark, path), ["band", "band_key"],
                       "left_semi")
            .select(F.col(id_col)).distinct()
            .withColumn("known_neardup", F.lit(True)))
    return (docs.select(id_col).join(hits, id_col, "left")
            .na.fill(False, ["known_neardup"]))


def probe_neardup(spark: SparkSession, docs: DataFrame, path: str,
                  text_col: str = "text", id_col: str = "doc_id",
                  n: int = 5) -> tuple[DataFrame, DataFrame]:
    """The probe half of incremental_neardup, WITHOUT the index
    mutation: returns (verdicts, novel_bands), both eagerly
    materialized with lineage severed from the index path, so the
    caller can sequence durable writes BEFORE the index append (the
    streaming sink does: survivors → commit marker → index; see
    streaming/neardup_stream.py for why that order bounds every crash
    window to recall loss). Appending `novel_bands` to the index is
    the caller's second step — or use incremental_neardup for the
    one-call batch shape."""
    bands = minhash_bands(docs, text_col, id_col, n).persist()
    try:
        idx = _read_index(spark, path)
        known = (bands.join(idx, ["band", "band_key"], "left_semi")
                 .select(F.col(id_col)).distinct()
                 .withColumn("known_neardup", F.lit(True)))
        # keep-first within the batch: drop a doc when a LOWER id
        # shares any (band, band_key) bucket with it
        a = bands.select(F.col(id_col).alias("__a"), "band", "band_key")
        dup = (bands.join(a, ["band", "band_key"])
               .filter(F.col("__a") < F.col(id_col))
               .select(F.col(id_col)).distinct()
               .withColumn("batch_dup", F.lit(True)))
        signed = (bands.select(F.col(id_col)).distinct()
                  .withColumn("__signed", F.lit(True)))
        out = (docs.select(id_col)
               .join(known, id_col, "left").join(dup, id_col, "left")
               .join(signed, id_col, "left")
               .na.fill(False, ["known_neardup", "batch_dup", "__signed"])
               .withColumn("no_signature", ~F.col("__signed"))
               .withColumn("novel", ~F.col("known_neardup")
                           & ~F.col("batch_dup") & F.col("__signed"))
               .drop("__signed"))
        # MATERIALIZE the verdicts BEFORE mutating the index, with
        # lineage SEVERED (localCheckpoint, eager): the plan reads the
        # index path, and Spark's cache manager re-caches any cached
        # plan reading a path that gets written (recacheByPath) — a
        # persist() here would be silently recomputed against the
        # post-append index and every novel doc would flag itself.
        # The checkpointed frame is the immutable pre-append snapshot.
        out = out.localCheckpoint(eager=True)
        novel_bands = (bands.join(
            out.filter("novel").select(id_col), id_col, "left_semi")
            .select("band", "band_key", F.col(id_col).alias("doc_id"))
            .localCheckpoint(eager=True))
        return out, novel_bands
    finally:
        bands.unpersist()


def append_to_index(novel_bands: DataFrame, path: str) -> None:
    """Append a probe's novel signatures so the next batch sees them.
    Plain parquet append — replaying the same novel docs after a
    successful append is harmless (they probe as known and produce an
    empty novel set), but a crash BEFORE this call leaves them
    unindexed: reduced recall for those docs only, never false flags
    (module docstring; route through the commitlog for transactional
    appends)."""
    novel_bands.write.partitionBy("band").mode("append").parquet(path)


def incremental_neardup(spark: SparkSession, docs: DataFrame, path: str,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 5) -> DataFrame:
    """Dedup a new batch against the index AND within itself, then
    append the survivors' signatures so the next batch sees them.

    Returns (id, known_neardup, batch_dup, no_signature, novel):
    `known_neardup` = collides with indexed content, `batch_dup` = a
    lower-id batch doc shares a band with it, `no_signature` = the doc
    is shorter than the shingle width and produced no signature (it
    can never be indexed, so it is excluded from `novel` — otherwise
    every replay would re-flag it as new content and the idempotence
    contract below would break), `novel` = none of the above (exactly
    these were appended). Work is proportional to the batch; the index
    is only ever probed and appended, never rewritten."""
    out, novel_bands = probe_neardup(spark, docs, path, text_col,
                                     id_col, n)
    append_to_index(novel_bands, path)
    return out


def index_stats(spark: SparkSession, path: str) -> dict:
    """Index health: indexed docs, band-key buckets, largest bucket
    (the degenerate-boilerplate skew signal minhash_bands documents)."""
    idx = _read_index(spark, path)
    row = idx.agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.countDistinct("band", "band_key").alias("n_buckets")).collect()[0]
    top = (idx.groupBy("band", "band_key")
           .agg(F.count(F.lit(1)).alias("sz"))
           .agg(F.max("sz").alias("max_bucket")).collect()[0])
    return {"n_docs": row["n_docs"], "n_buckets": row["n_buckets"],
            "max_bucket": top["max_bucket"],
            "n_bands": N_BANDS, "n_hashes": N_HASHES,
            "path": os.path.abspath(path)}
