"""Streaming quality filter: drain-a-directory test with
Trigger.AvailableNow; streamed scores must equal batch scores exactly
(the scorer is stateless per turn), and resume must not re-emit."""

from __future__ import annotations

import os

import pytest

from curator_spark import fixtures, schema
from curator_spark.pipeline import score_turns
from curator_spark.streaming.quality_stream import run_quality_stream


@pytest.fixture(scope="module")
def stream_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    src = root / "src"
    src.mkdir()
    pdf = fixtures.generate_transcripts(1200, seed=21, n_parts=4)
    half = len(pdf) // 2
    fixtures.to_spark_parquet(pdf.iloc[:half], str(src / "batch1.parquet"))
    fixtures.to_spark_parquet(pdf.iloc[half:], str(src / "batch2.parquet"))
    return {"src": str(src), "out": str(root / "out"),
            "ckpt": str(root / "ckpt"), "pdf": pdf}


def test_stream_matches_batch(spark, stream_dirs):
    q = run_quality_stream(spark, stream_dirs["src"], stream_dirs["out"],
                           stream_dirs["ckpt"], available_now=True)
    q.awaitTermination(120)

    got = (spark.read.parquet(stream_dirs["out"])
           .orderBy("conv_id", "turn_idx").toPandas())
    batch_df = spark.read.schema(schema.TRANSCRIPTS_SCHEMA).parquet(
        stream_dirs["src"])
    want = (score_turns(batch_df)
            .orderBy("conv_id", "turn_idx").toPandas())
    assert len(got) == len(want) == len(stream_dirs["pdf"])
    for col in ("conv_id", "turn_idx", "lang", "ppl", "scrubbed_text",
                "turn_pass"):
        assert (got[col].to_numpy() == want[col].to_numpy()).all(), col


def test_stream_resume_no_reemit(spark, stream_dirs):
    n_before = spark.read.parquet(stream_dirs["out"]).count()
    # restart against the same checkpoint: nothing new → nothing re-emitted
    q = run_quality_stream(spark, stream_dirs["src"], stream_dirs["out"],
                           stream_dirs["ckpt"], available_now=True)
    q.awaitTermination(120)
    assert spark.read.parquet(stream_dirs["out"]).count() == n_before
    # new file arrives → exactly its rows are appended
    extra = fixtures.generate_transcripts(300, seed=22, n_parts=4)
    fixtures.to_spark_parquet(extra, os.path.join(stream_dirs["src"],
                                                  "batch3.parquet"))
    q = run_quality_stream(spark, stream_dirs["src"], stream_dirs["out"],
                           stream_dirs["ckpt"], available_now=True)
    q.awaitTermination(120)
    assert spark.read.parquet(stream_dirs["out"]).count() == n_before + len(extra)


def test_stateful_conv_aggregates_across_batches(spark, tmp_path):
    """A conversation split across two micro-batches must accumulate
    into one state row; the final update equals the batch aggregate."""
    import pandas as pd

    from curator_spark.streaming.stateful import conv_aggregates_stateful
    src = tmp_path / "src"
    src.mkdir()
    pdf = fixtures.generate_transcripts(600, seed=33, n_parts=4)
    big_conv = pdf["conv_id"].value_counts().idxmax()
    conv_rows = pdf[pdf.conv_id == big_conv]
    assert len(conv_rows) >= 4
    half = len(conv_rows) // 2
    fixtures.to_spark_parquet(
        pd.concat([conv_rows.iloc[:half], pdf[pdf.conv_id != big_conv]]),
        str(src / "b1.parquet"))
    fixtures.to_spark_parquet(conv_rows.iloc[half:], str(src / "b2.parquet"))

    stream = (spark.readStream.schema(schema.TRANSCRIPTS_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    q = (conv_aggregates_stateful(stream)
         .writeStream.format("memory").queryName("conv_state")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)

    out = spark.sql("select * from conv_state").toPandas()
    # the split conversation appears in ≥2 updates; keep the last
    updates = out[out.conv_id == big_conv]
    assert len(updates) >= 2, "conversation should span micro-batches"
    final = updates.iloc[-1]
    assert final.conv_n_turns == len(conv_rows)
    # compare against the batch pipeline's aggregate
    batch = score_turns(
        spark.read.schema(schema.TRANSCRIPTS_SCHEMA).parquet(str(src))
    ).filter(f"conv_id = '{big_conv}'").toPandas()
    assert final.conv_n_turns == len(batch)
    assert abs(final.conv_mean_ppl - round(batch["ppl"].mean(), 6)) < 1e-5
    assert final.n_pass == int(batch["turn_pass"].sum())


def test_windowed_conv_aggregates_with_watermark(spark, tmp_path):
    """Watermarked tumbling-window conversation aggregates (append
    mode): counts per (window, conv) must match a batch groupBy over
    the same window buckets."""
    from pyspark.sql import functions as F

    from curator_spark.streaming.quality_stream import conv_window_aggregates
    src = tmp_path / "wsrc"
    src.mkdir()
    pdf = fixtures.generate_transcripts(800, seed=44, n_parts=4)
    fixtures.to_spark_parquet(pdf, str(src / "b1.parquet"))

    stream = (spark.readStream.schema(schema.TRANSCRIPTS_SCHEMA)
              .parquet(str(src)))
    q = (conv_window_aggregates(stream, window="10 minutes",
                                watermark="30 minutes")
         .writeStream.format("memory").queryName("conv_windows")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select * from conv_windows").toPandas()

    batch = (score_turns(spark.read.schema(schema.TRANSCRIPTS_SCHEMA)
                         .parquet(str(src)))
             .groupBy(F.window("ts", "10 minutes").alias("w"), "conv_id")
             .agg(F.count(F.lit(1)).alias("n"))
             .select(F.col("w.start").alias("window_start"), "conv_id", "n")
             .toPandas())
    # append mode emits only windows closed by the watermark; every
    # emitted row must match the batch count for its bucket exactly
    assert len(got) > 0
    want = {(r.window_start, r.conv_id): r.n for r in batch.itertuples()}
    for r in got.itertuples():
        assert want[(r.window_start, r.conv_id)] == r.conv_n_turns


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Re-delivered turns (same conv_id, turn_idx) across micro-batches
    collapse to one row via dropDuplicatesWithinWatermark."""
    from curator_spark.streaming.quality_stream import dedup_stream
    src = tmp_path / "dsrc"
    src.mkdir()
    pdf = fixtures.generate_transcripts(400, seed=55, n_parts=4)
    fixtures.to_spark_parquet(pdf, str(src / "b1.parquet"))
    # redeliver the first 100 rows in a second batch (at-least-once source)
    fixtures.to_spark_parquet(pdf.iloc[:100], str(src / "b2.parquet"))

    stream = (spark.readStream.schema(schema.TRANSCRIPTS_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    q = (dedup_stream(stream)
         .writeStream.format("memory").queryName("dedup_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    out = spark.sql("select conv_id, turn_idx from dedup_out").toPandas()
    assert len(out) == len(pdf)  # duplicates dropped
    assert not out.duplicated(["conv_id", "turn_idx"]).any()


def test_stream_static_enrichment(spark, stream_dirs, tmp_path):
    """Stream-static join results must equal the batch join."""
    from pyspark.sql import functions as F

    from curator_spark.streaming.quality_stream import (enrich_stream,
                                                        read_transcript_stream)
    batch = spark.read.schema(schema.TRANSCRIPTS_SCHEMA).parquet(
        stream_dirs["src"])
    dim = (batch.select("conv_id").distinct()
           .withColumn("tier", F.pmod(F.crc32(F.col("conv_id")), F.lit(3))))
    out, ckpt = str(tmp_path / "enr_out"), str(tmp_path / "enr_ckpt")
    q = (enrich_stream(read_transcript_stream(spark, stream_dirs["src"]),
                       dim, "conv_id")
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = (spark.read.parquet(out)
           .orderBy("conv_id", "turn_idx").toPandas())
    want = (batch.join(F.broadcast(dim), "conv_id")
            .orderBy("conv_id", "turn_idx").toPandas())
    assert len(got) == len(want)
    assert got["tier"].tolist() == want["tier"].tolist()
