"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship quality-filter pipeline over sf0.001 documents
               re-shaped into the transcripts table.
queries()    — the full operator battery (relational surface, text
               analysis, dedup, similarity, plus the flagship pipeline).
oracle_sql() — DuckDB oracles for every SQL-expressible query. The
               flagship (q00) and multimodal (q30) payloads are
               Python-side, so their oracles are committed GOLDEN
               PARQUETS produced by the independent pandas oracle
               (tools/make_golden.py; regenerate with
               `python tools/make_golden.py`) served to DuckDB via
               read_parquet — the driver hash-compares the distributed
               Spark plan against them like any SQL oracle (mirrors the
               reference's golden-hash gate,
               tests/integrations/test_all.py:55-58). The q00 golden is
               per-scale-factor; the committed SQL targets the driver's
               sf0.01 (tools/selfcheck.py swaps the tag when checking
               other SFs).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from curator_spark import queries as _q
from curator_spark import queries_dedup as _qd
from curator_spark.ingest import docs_to_transcripts
from curator_spark.pipeline import run_pipeline_df


def _quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: documents → transcripts shape → full quality-filter
    pipeline (langid + perplexity + heuristic rules + PII scrub +
    conversation aggregates → keep)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    transcripts = docs_to_transcripts(docs)
    out = run_pipeline_df(transcripts, broadcast_conv_aggs=True)
    return out.select(
        "conv_id", "turn_idx", "role", "lang", F.round("ppl", 4).alias("ppl"),
        "scrubbed_text", "turn_pass", "conv_lang", "conv_pass", "keep",
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _quality_filter(spark, "/root/testdata/sf0.001")


def _multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing (rows-only check: binary media has no SQL
    oracle): deterministic synthetic media table → Arrow-batched decode/
    feature UDF → fixed-width features. sf_dir is unused (the media
    fixture is generated, not part of the testdata), but the signature
    matches the driver contract."""
    from curator_spark.operators import multimodal as mm
    media = mm.media_fixture(spark, n=96)
    feats = mm.image_features(media.filter(F.col("modality") == "image"))
    # Driver boundary: the rich array<float> feature stays in the
    # operator API, but the driver canonicalizer sorts every column and
    # cannot sort lists — surface a deterministic fingerprint instead.
    feature_fp = F.md5(F.concat_ws(
        ",", F.transform("feature", lambda x: F.format_string("%.6f", x))))
    return feats.select(
        "media_id", "n_bytes", "sha256", "entropy_proxy",
        "thumb_w", "thumb_h",
        F.when(F.col("feature").isNull(), F.lit(None).cast("string"))
        .otherwise(feature_fp).alias("feature_fp"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "q00_quality_filter": _quality_filter,
        "q30_multimodal_features": _multimodal_features,
    }
    out.update(_q.QUERIES)
    out.update(_qd.QUERIES)
    return out


GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "curator_spark", "oracle", "golden")


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(_q.ORACLES)
    out.update(_qd.ORACLES)
    out["q00_quality_filter"] = (
        "SELECT conv_id, turn_idx, role, lang, ppl, scrubbed_text, "
        "turn_pass, conv_lang, conv_pass, keep "
        f"FROM read_parquet('{GOLDEN_DIR}/q00_sf0.01.parquet')")
    out["q30_multimodal_features"] = (
        "SELECT media_id, n_bytes, sha256, entropy_proxy, thumb_w, "
        f"thumb_h, feature_fp FROM read_parquet('{GOLDEN_DIR}/q30.parquet')")
    return out
