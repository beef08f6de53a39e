"""Incremental MinHash-LSH index (operators/minhash_index.py):
cross-batch near-dup flagging, in-batch keep-first, append-only index
growth, replay idempotence, and the no-cartesian probe plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from curator_spark.operators.minhash_index import (
    flag_against_index, incremental_neardup, index_stats,
    write_minhash_index)

DOC = ("the quick brown fox jumps over the lazy dog while the "
       "curious cat watches from the warm stone wall near the garden")
OTHER = ("completely different subject matter entirely about spark "
         "physical plans exchanges partitions codegen stages and tasks")


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_incremental_flow(spark, tmp_path):
    idx = str(tmp_path / "mh_idx")
    n0 = write_minhash_index(_df(spark, [(1, DOC), (2, OTHER)]), idx)
    assert n0 == 2

    batch = _df(spark, [
        (10, DOC),                    # exact copy of indexed -> known
        (11, "unrelated novel text about benchmarking duckdb oracles "
             "hash equality and schema comparison rules for queries"),
        (12, "unrelated novel text about benchmarking duckdb oracles "
             "hash equality and schema comparison rules for queries"),
        #  ^ exact copy of 11 within the batch -> batch_dup
    ])
    out = {r["doc_id"]: r for r in
           incremental_neardup(spark, batch, idx).collect()}
    assert out[10]["known_neardup"] and not out[10]["novel"]
    assert out[11]["novel"] and not out[11]["batch_dup"]
    assert out[12]["batch_dup"] and not out[12]["novel"]

    # only 11 was appended; the index now knows its content
    st = index_stats(spark, idx)
    assert st["n_docs"] == 3
    flags = {r["doc_id"]: r["known_neardup"] for r in flag_against_index(
        spark, _df(spark, [(20, batch.collect()[1]["text"])]), idx).collect()}
    assert flags[20] is True


def test_replay_appends_nothing(spark, tmp_path):
    idx = str(tmp_path / "mh_idx")
    write_minhash_index(_df(spark, [(1, DOC)]), idx)
    batch = _df(spark, [(5, OTHER)])
    incremental_neardup(spark, batch, idx)
    n_after_first = index_stats(spark, idx)["n_docs"]
    out = {r["doc_id"]: r for r in
           incremental_neardup(spark, batch, idx).collect()}
    assert out[5]["known_neardup"] and not out[5]["novel"]
    assert index_stats(spark, idx)["n_docs"] == n_after_first


def test_near_duplicate_single_word_change_flagged(spark, tmp_path):
    idx = str(tmp_path / "mh_idx")
    write_minhash_index(_df(spark, [(1, DOC)]), idx)
    near = DOC.replace("lazy", "sleepy")  # high-jaccard edit
    flags = {r["doc_id"]: r["known_neardup"] for r in flag_against_index(
        spark, _df(spark, [(7, near), (8, OTHER)]), idx).collect()}
    assert flags[7] is True   # deterministic: hashes have no RNG
    assert flags[8] is False


def test_probe_plan_is_equijoin(spark, tmp_path):
    idx = str(tmp_path / "mh_idx")
    write_minhash_index(_df(spark, [(1, DOC)]), idx)
    df = flag_against_index(spark, _df(spark, [(2, OTHER)]), idx)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_short_docs_are_surfaced_not_relooped(spark, tmp_path):
    """A doc too short to shingle can never be indexed: it must come
    back no_signature=True and novel=False on EVERY delivery (not
    novel=True forever, which would break replay idempotence)."""
    idx = str(tmp_path / "mh_idx")
    assert write_minhash_index(_df(spark, [(1, DOC), (2, "tiny doc")]),
                               idx) == 1  # only the signable doc
    batch = _df(spark, [(5, "too short"), (6, OTHER)])
    for _ in range(2):
        out = {r["doc_id"]: r for r in
               incremental_neardup(spark, batch, idx).collect()}
        assert out[5]["no_signature"] and not out[5]["novel"]
        assert not out[6]["no_signature"]
    assert out[6]["known_neardup"]  # appended on pass 1, known on pass 2
    assert index_stats(spark, idx)["n_docs"] == 2
