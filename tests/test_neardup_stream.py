"""Streaming near-dup dedup vs the persistent MinHash index
(streaming/neardup_stream.py): cross-trigger near-dup detection,
restart/replay idempotence, and the epoch commit protocol's crash
windows (marker short-circuit; data-then-marker-then-index ordering)."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from curator_spark import fixtures
from curator_spark.operators.minhash_index import (
    index_stats, probe_neardup, write_minhash_index)
from curator_spark.streaming.neardup_stream import (
    process_neardup_batch, read_survivors, read_verdicts,
    run_neardup_stream)

BASE = ("the quick brown fox jumps over the lazy dog near the river "
        "bank every single morning before the sun rises over the hills")


def _doc(i: int, text: str) -> dict:
    return {"doc_id": i, "text": text}


def _write(pdf: pd.DataFrame, path: str) -> None:
    fixtures.to_spark_parquet(pdf, path)


@pytest.fixture()
def dirs(tmp_path, spark):
    src = tmp_path / "src"
    src.mkdir()
    # seed corpus -> index; doc 0 is the original content
    seed = spark.createDataFrame([_doc(0, BASE)])
    write_minhash_index(seed, str(tmp_path / "index"))
    # batch1 (file 0): one novel doc + one near-dup of the SEED
    _write(pd.DataFrame([
        _doc(10, BASE.replace("fox", "wolf")),         # near-dup of seed
        _doc(11, "completely different text about spark shuffle "
                 "partitions and adaptive query execution plans "
                 "running on a large cluster of many executors"),
    ]), str(src / "b0.parquet"))
    # batch2 (file 1): a near-dup of batch1's NOVEL doc (crosses the
    # trigger boundary), plus one more novel doc
    _write(pd.DataFrame([
        _doc(20, "completely different text about spark shuffle "
                 "partitions and adaptive query execution plans "
                 "running on a large cluster of many workers"),
        _doc(21, "unrelated corpus of words speaking of tokenizers "
                 "and byte pair encodings trained on massive text "
                 "collections with careful vocabulary construction"),
    ]), str(src / "b1.parquet"))
    return {"src": str(src), "out": str(tmp_path / "out"),
            "index": str(tmp_path / "index"),
            "ckpt": str(tmp_path / "ckpt")}


def test_cross_trigger_neardup_and_restart(spark, dirs):
    q = run_neardup_stream(spark, dirs["src"], dirs["out"], dirs["index"],
                           dirs["ckpt"], max_files_per_trigger=1)
    q.awaitTermination(180)

    verdicts = read_verdicts(spark, dirs["out"]).toPandas() \
        .set_index("doc_id")
    # 10 collides with the seed index; 20 with 11 which was only
    # indexed by the PREVIOUS trigger — the cross-boundary case
    assert bool(verdicts.loc[10, "known_neardup"])
    assert bool(verdicts.loc[20, "known_neardup"])
    assert bool(verdicts.loc[11, "novel"]) and bool(verdicts.loc[21, "novel"])

    surv = read_survivors(spark, dirs["out"]).toPandas()
    assert sorted(surv.doc_id.tolist()) == [11, 21]

    # restart on the same checkpoint: no new files -> nothing changes
    n_docs = index_stats(spark, dirs["index"])["n_docs"]
    q = run_neardup_stream(spark, dirs["src"], dirs["out"], dirs["index"],
                           dirs["ckpt"], max_files_per_trigger=1)
    q.awaitTermination(180)
    assert sorted(read_survivors(spark, dirs["out"]).toPandas()
                  .doc_id.tolist()) == [11, 21]
    assert index_stats(spark, dirs["index"])["n_docs"] == n_docs

    # a near-dup of a STREAMED survivor arriving after restart is
    # caught too (the index is the cross-run memory)
    _write(pd.DataFrame([
        _doc(30, "unrelated corpus of words speaking of tokenizers "
                 "and byte pair encodings trained on massive text "
                 "collections with careful vocabulary curation"),
    ]), os.path.join(dirs["src"], "b2.parquet"))
    q = run_neardup_stream(spark, dirs["src"], dirs["out"], dirs["index"],
                           dirs["ckpt"], max_files_per_trigger=1)
    q.awaitTermination(180)
    v = read_verdicts(spark, dirs["out"]).toPandas().set_index("doc_id")
    assert bool(v.loc[30, "known_neardup"])
    assert sorted(read_survivors(spark, dirs["out"]).toPandas()
                  .doc_id.tolist()) == [11, 21]


def test_epoch_replay_short_circuits_on_marker(spark, dirs):
    batch = spark.read.parquet(os.path.join(dirs["src"], "b0.parquet"))
    process_neardup_batch(spark, batch, dirs["out"], dirs["index"], 0)
    n_docs = index_stats(spark, dirs["index"])["n_docs"]
    rows0 = read_survivors(spark, dirs["out"]).toPandas()
    # foreachBatch retry delivers the same epoch again: the marker
    # short-circuits — no duplicate rows, no index growth
    process_neardup_batch(spark, batch, dirs["out"], dirs["index"], 0)
    assert index_stats(spark, dirs["index"])["n_docs"] == n_docs
    pd.testing.assert_frame_equal(
        read_survivors(spark, dirs["out"]).toPandas()
        .sort_values("doc_id").reset_index(drop=True),
        rows0.sort_values("doc_id").reset_index(drop=True))


def test_crash_before_marker_replays_cleanly(spark, dirs):
    batch = spark.read.parquet(os.path.join(dirs["src"], "b0.parquet"))
    # simulate a crash AFTER the data write but BEFORE the marker:
    # run only the probe + writes by hand
    verdicts, novel = probe_neardup(spark, batch, dirs["index"])
    epoch_dir = os.path.join(dirs["out"], "epoch=0")
    (batch.join(verdicts.filter("novel").select("doc_id"),
                "doc_id", "left_semi")
     .write.mode("overwrite").parquet(os.path.join(epoch_dir, "rows")))
    # no marker -> the epoch is invisible crash debris
    with pytest.raises(FileNotFoundError):
        read_survivors(spark, dirs["out"])
    n_docs = index_stats(spark, dirs["index"])["n_docs"]
    # replay of the epoch runs the full protocol against the
    # unchanged index: same verdicts, overwrite replaces the debris
    process_neardup_batch(spark, batch, dirs["out"], dirs["index"], 0)
    assert sorted(read_survivors(spark, dirs["out"]).toPandas()
                  .doc_id.tolist()) == [11]
    assert index_stats(spark, dirs["index"])["n_docs"] == n_docs + 1
