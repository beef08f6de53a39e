"""Checkpoint/resume/memoization tests — the curator crown jewels
(SURVEY.md §2 A13/A14/A23): kill-after-k-partitions resume must yield a
table identical to a clean single run, and a completed run must
short-circuit (mirrors reference cache-hit semantics,
tests/unittests/test_caching.py:12-26 and resume test
tests/integrations/test_all.py:180-192).
"""

from __future__ import annotations

import os

import pytest

from curator_spark import fixtures
from curator_spark.checkpoint import committed_parts, run_checkpointed


@pytest.fixture(scope="module")
def small_input(tmp_path_factory):
    p = tmp_path_factory.mktemp("ckpt") / "t.parquet"
    fixtures.write_transcripts_parquet(str(p), 2500, seed=11, n_parts=4)
    return str(p)


def _read_sorted(spark, out_dir):
    return (
        spark.read.parquet(os.path.join(out_dir, "data"))
        .orderBy("conv_id", "turn_idx")
        .drop("part")  # partition column ordering differs; value-compared via sort
        .toPandas()
    )


def test_kill_and_resume_identical(spark, small_input, tmp_path):
    crashed = str(tmp_path / "crashed")
    clean = str(tmp_path / "clean")

    # simulated crash: only partitions 0,1 commit
    r1 = run_checkpointed(spark, small_input, crashed, only_parts=[0, 1])
    assert r1["parts_committed"] == 2
    assert committed_parts(crashed) == {0, 1}
    assert not os.path.exists(os.path.join(crashed, "_SUCCESS_RUN"))

    # resume: skips committed, finishes the rest
    r2 = run_checkpointed(spark, small_input, crashed)
    assert r2["parts_skipped"] == 2 and r2["parts_committed"] == 2
    assert os.path.exists(os.path.join(crashed, "_SUCCESS_RUN"))

    # clean single run for comparison
    run_checkpointed(spark, small_input, clean)
    a, b = _read_sorted(spark, crashed), _read_sorted(spark, clean)
    assert a.equals(b), "resumed output != clean-run output"


def test_memoization_short_circuit(spark, small_input, tmp_path):
    out = str(tmp_path / "memo")
    r1 = run_checkpointed(spark, small_input, out)
    assert not r1["memoized"]
    r2 = run_checkpointed(spark, small_input, out)
    assert r2["memoized"] and r2["parts_committed"] == 0


def test_param_change_invalidates_memo(spark, small_input, tmp_path):
    out = str(tmp_path / "memo2")
    r1 = run_checkpointed(spark, small_input, out, params={"v": 1})
    r2 = run_checkpointed(spark, small_input, out, params={"v": 2})
    # different fingerprint → not memoized (parts ARE committed though,
    # so nothing recomputes — the ledger is per-partition)
    assert r1["run_id"] != r2["run_id"]
    assert not r2["memoized"]


def test_corrupted_partition_recomputed(spark, small_input, tmp_path):
    """Resume must not trust a commit marker whose partition data no
    longer reconciles (reference cache-integrity verifier,
    base_request_processor.py:120-167): the marker is dropped and the
    partition recomputes, yielding a table identical to a clean run."""
    import glob

    crashed = str(tmp_path / "corrupt")
    clean = str(tmp_path / "clean_for_corrupt")
    run_checkpointed(spark, small_input, crashed, only_parts=[0, 1, 2])
    assert committed_parts(crashed) == {0, 1, 2}

    # corrupt committed part 1: remove one of its data files
    files = glob.glob(os.path.join(crashed, "data", "part=1", "*.parquet"))
    assert files
    os.remove(files[0])

    r = run_checkpointed(spark, small_input, crashed)
    assert r["parts_invalidated"] == 1
    assert r["parts_committed"] == 2  # part 3 (pending) + part 1 (recomputed)
    assert r["parts_skipped"] == 2

    run_checkpointed(spark, small_input, clean)
    a, b = _read_sorted(spark, crashed), _read_sorted(spark, clean)
    assert a.equals(b), "recomputed output != clean-run output"


def test_sharded_completion_writes_success_marker(spark, small_input, tmp_path):
    """A run completed entirely via only_parts shards still gets the
    whole-run marker, so run-level memoization engages for the
    production sharding path."""
    out = str(tmp_path / "sharded")
    run_checkpointed(spark, small_input, out, only_parts=[0, 1])
    assert not os.path.exists(os.path.join(out, "_SUCCESS_RUN"))
    run_checkpointed(spark, small_input, out, only_parts=[2, 3])
    assert os.path.exists(os.path.join(out, "_SUCCESS_RUN"))
    r3 = run_checkpointed(spark, small_input, out)
    assert r3["memoized"]


def test_staged_scratch_removed_after_commit(spark, small_input, tmp_path):
    out = str(tmp_path / "scratch")
    run_checkpointed(spark, small_input, out, only_parts=[0, 1])
    run_checkpointed(spark, small_input, out)
    leftovers = [d for d in os.listdir(out) if d.startswith("_scored")]
    assert leftovers == []


def test_strict_mode_fails_all_on_error_rows(spark, small_input, tmp_path):
    """require_all_responses analogue (reference
    base_request_processor.py:398-426): with error rows present, strict
    mode raises and commits NOTHING, so a rerun reprocesses; default
    mode soft-fails to error rows and completes."""
    out = str(tmp_path / "strict")
    with pytest.raises(RuntimeError, match="strict mode"):
        run_checkpointed(spark, small_input, out, strict=True)
    assert committed_parts(out) == set()
    assert not os.path.exists(os.path.join(out, "_SUCCESS_RUN"))
    # nothing published, no metrics appended (rerun must not double-count);
    # the staged output is deliberately kept for inspection
    assert not os.path.exists(os.path.join(out, "data"))
    assert not os.path.exists(os.path.join(out, "_metrics"))
    assert any(d.startswith("_scored-") for d in os.listdir(out))
    # same out_dir, default mode: completes (error rows carried as data)
    r = run_checkpointed(spark, small_input, out)
    assert r["parts_committed"] == 4
    m = spark.read.parquet(os.path.join(out, "_metrics")).toPandas()
    assert len(m) == 4  # exactly one metrics row per (run, part)


def test_concurrent_shards_do_not_clobber(spark, small_input, tmp_path):
    """Two only_parts shards of one run executing CONCURRENTLY (the
    documented production sharding) must not corrupt each other: each
    stages under its own scratch root and publishes disjoint partition
    directories with atomic renames — no shared Hadoop committer
    staging, no shared scratch."""
    from concurrent.futures import ThreadPoolExecutor

    crashed = str(tmp_path / "conc")
    clean = str(tmp_path / "conc_clean")
    with ThreadPoolExecutor(2) as ex:
        f1 = ex.submit(run_checkpointed, spark, small_input, crashed,
                       None, [0, 1])
        f2 = ex.submit(run_checkpointed, spark, small_input, crashed,
                       None, [2, 3])
        r1, r2 = f1.result(timeout=300), f2.result(timeout=300)
    assert r1["parts_committed"] == 2 and r2["parts_committed"] == 2
    assert committed_parts(crashed) == {0, 1, 2, 3}
    assert os.path.exists(os.path.join(crashed, "_SUCCESS_RUN"))
    run_checkpointed(spark, small_input, clean)
    a, b = _read_sorted(spark, crashed), _read_sorted(spark, clean)
    assert a.equals(b), "concurrent-shard output != clean-run output"


def test_metrics_and_lineage_written(spark, small_input, tmp_path):
    out = str(tmp_path / "metrics")
    run_checkpointed(spark, small_input, out)
    m = spark.read.parquet(os.path.join(out, "_metrics")).toPandas()
    assert set(m["part"]) == {0, 1, 2, 3}
    data = spark.read.parquet(os.path.join(out, "data"))
    n_in = data.count()
    assert m["n_in"].sum() == n_in
    assert m["n_kept"].sum() == data.filter("keep").count()
    metas = os.listdir(os.path.join(out, "_meta"))
    assert any(f.startswith("run_") for f in metas)


def test_stale_scratch_swept_on_next_invocation(spark, small_input, tmp_path):
    """A scratch dir whose owning process is dead (crash/strict debris)
    is garbage-collected by the next invocation; a live owner's is not."""
    out = str(tmp_path / "gc")
    dead = os.path.join(out, "_scored-deadrun-deadbeef")
    live = os.path.join(out, "_scored-liverun-cafebabe")
    os.makedirs(dead)
    os.makedirs(live)
    with open(os.path.join(dead, "OWNER"), "w") as f:
        f.write("999999999")           # no such pid
    with open(os.path.join(live, "OWNER"), "w") as f:
        f.write(str(os.getpid()))      # this very process
    run_checkpointed(spark, small_input, out)
    assert not os.path.exists(dead)
    assert os.path.exists(live)


def test_renamed_file_detected_by_manifest(spark, small_input, tmp_path):
    """File-level manifests catch integrity drift that row-count totals
    miss: renaming a data file keeps the partition total identical but
    changes the committed file set → marker dropped, part recomputed."""
    import glob

    out = str(tmp_path / "manifest")
    run_checkpointed(spark, small_input, out, only_parts=[0, 1])
    f = glob.glob(os.path.join(out, "data", "part=0", "*.parquet"))[0]
    os.rename(f, os.path.join(os.path.dirname(f), "renamed-file.parquet"))
    r = run_checkpointed(spark, small_input, out)
    assert r["parts_invalidated"] == 1
    assert committed_parts(out) == {0, 1, 2, 3}


def test_run_cost_prices_token_volume(spark, small_input, tmp_path):
    from curator_spark.checkpoint import run_cost
    out = str(tmp_path / "cost")
    run_checkpointed(spark, small_input, out)
    c = run_cost(spark, out, usd_per_1k_tokens=0.5).collect()
    assert len(c) == 1
    m = spark.read.parquet(os.path.join(out, "_metrics")).toPandas()
    assert c[0].n_tokens == m["n_tokens"].sum()
    assert abs(c[0].cost_usd - round(c[0].n_tokens / 1000 * 0.5, 6)) < 1e-9
