"""Stream-stream event-time joins (streaming/joins.py): inner matches
equal the batch join; left-outer emits unmatched turns after the
watermark passes the horizon (driven by later files, as in the
sessionization eviction test)."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import types as T

from curator_spark.streaming.joins import join_tool_results

T0 = datetime.datetime(2025, 6, 1, 0, 0, 0)

TURNS_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("text", T.StringType()),
    T.StructField("ts", T.TimestampType())])
RESULTS_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("tool", T.StringType()),
    T.StructField("status", T.StringType()),
    T.StructField("ts", T.TimestampType())])


def _ts(sec):
    return T0 + datetime.timedelta(seconds=sec)


def _write_turns(path, rows):
    pq.write_table(pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "text": pa.array([r[2] for r in rows], pa.string()),
        "ts": pa.array([_ts(r[3]) for r in rows], pa.timestamp("us")),
    }), path)


def _write_results(path, rows):
    pq.write_table(pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "tool": pa.array([r[2] for r in rows], pa.string()),
        "status": pa.array([r[3] for r in rows], pa.string()),
        "ts": pa.array([_ts(r[4]) for r in rows], pa.timestamp("us")),
    }), path)


def _drain(spark, tdir, rdir, out, ckpt, how):
    turns = (spark.readStream.schema(TURNS_SCHEMA)
             .option("maxFilesPerTrigger", 1).parquet(tdir))
    results = (spark.readStream.schema(RESULTS_SCHEMA)
               .option("maxFilesPerTrigger", 1).parquet(rdir))
    j = join_tool_results(turns, results, horizon="10 minutes",
                          watermark="10 minutes", how=how)
    q = (j.writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt).outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    return spark.read.parquet(out)


def _mkdirs(tmp_path):
    tdir, rdir = tmp_path / "turns", tmp_path / "results"
    tdir.mkdir(), rdir.mkdir()
    return tdir, rdir


def test_inner_join_matches_batch(spark, tmp_path):
    tdir, rdir = _mkdirs(tmp_path)
    _write_turns(str(tdir / "b1.parquet"), [
        ("c1", 0, "call search", 0),
        ("c1", 2, "call fetch", 100),
        ("c2", 0, "call search", 50),
    ])
    _write_results(str(rdir / "b1.parquet"), [
        ("c1", 0, "search", "ok", 30),        # in horizon -> match
        ("c1", 2, "fetch", "err", 100 + 660), # 11 min later -> no match
        ("c2", 0, "search", "ok", 40),        # BEFORE the turn -> no match
        ("c9", 5, "x", "ok", 10),             # no such turn
    ])
    got = _drain(spark, str(tdir), str(rdir), str(tmp_path / "o1"),
                 str(tmp_path / "k1"), "inner")
    rows = sorted((r["conv_id"], r["turn_idx"], r["tool_status"])
                  for r in got.collect())
    assert rows == [("c1", 0, "ok")]

    # identical predicate on the batch tables gives the same rows
    bt = spark.read.schema(TURNS_SCHEMA).parquet(str(tdir))
    br = spark.read.schema(RESULTS_SCHEMA).parquet(str(rdir))
    want = sorted((r["conv_id"], r["turn_idx"], r["tool_status"])
                  for r in join_tool_results(bt, br, horizon="10 minutes",
                                             how="inner").collect())
    assert rows == want


def test_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    tdir, rdir = _mkdirs(tmp_path)
    _write_turns(str(tdir / "b1.parquet"), [
        ("c1", 0, "call search", 0),     # will match
        ("c1", 1, "call fetch", 10),     # never matches
    ])
    _write_results(str(rdir / "b1.parquet"), [
        ("c1", 0, "search", "ok", 30),
    ])
    # later files on BOTH sides advance the global (min) watermark far
    # past turn@10s + 10min horizon; one more pair gives the
    # post-advance batch in which the outer row is emitted
    _write_turns(str(tdir / "b2.parquet"), [("zz", 0, "x", 7200)])
    _write_results(str(rdir / "b2.parquet"), [("zz", 0, "x", "ok", 7201)])
    _write_turns(str(tdir / "b3.parquet"), [("zz", 1, "x", 7300)])
    _write_results(str(rdir / "b3.parquet"), [("zz", 1, "x", "ok", 7301)])
    got = _drain(spark, str(tdir), str(rdir), str(tmp_path / "o2"),
                 str(tmp_path / "k2"), "left_outer")
    by_key = {(r["conv_id"], r["turn_idx"]): r for r in got.collect()}
    assert by_key[("c1", 0)]["tool_status"] == "ok"
    assert ("c1", 1) in by_key, "outer row not emitted"
    assert by_key[("c1", 1)]["tool_status"] is None
