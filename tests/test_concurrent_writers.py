"""Optimistic concurrency with REAL concurrent writers: separate
processes (each its own JVM/SparkSession) race appends into one
commitlog table. The put-if-absent version protocol must serialize
them with no lost updates, no duplicated rows, and a gap-free history
— the multi-writer story the thread-level protocol test
(test_checkpoint.py) cannot fully claim, because threads share one
process's view of the filesystem."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from curator_spark import fixtures
from curator_spark.checkpoint import (
    make_ledger, read_committed, run_checkpointed, table_row_count)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WRITER = """
import sys
from curator_spark.session import get_spark
from curator_spark.incremental import append_new_conversations
inp, out = sys.argv[1], sys.argv[2]
spark = get_spark("writer-" + inp[-12:], parallelism=4,
                  shuffle_partitions=8)
s = append_new_conversations(spark, inp, out)
print("APPENDED", s["rows_appended"])
spark.stop()
"""


def test_processes_race_appends_without_lost_updates(spark, tmp_path):
    p0 = str(tmp_path / "base.parquet")
    fixtures.write_transcripts_parquet(p0, 400, seed=91, n_parts=4)
    out = str(tmp_path / "out")
    run_checkpointed(spark, p0, out, ledger_backend="commitlog")
    n_base = table_row_count(out)

    batches = []
    for i, seed in enumerate((92, 93, 94)):
        p = str(tmp_path / f"b{i}.parquet")
        pdf = fixtures.write_transcripts_parquet(p, 300, seed=seed,
                                                 n_parts=4)
        batches.append((p, pdf))

    env = dict(os.environ, PYTHONPATH=REPO)
    procs = [subprocess.Popen(
        [sys.executable, "-c", WRITER, p, out],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, cwd=str(tmp_path)) for p, _ in batches]
    outs = [pr.communicate(timeout=420)[0] for pr in procs]
    for pr, o in zip(procs, outs):
        assert pr.returncode == 0, o[-2000:]
        assert "APPENDED" in o

    # no lost updates: every writer's batch landed exactly once
    expected = n_base + sum(len(pdf) for _, pdf in batches)
    assert table_row_count(out) == expected
    head = read_committed(spark, out)
    assert head.count() == expected
    assert head.select("conv_id", "turn_idx").distinct().count() == expected

    # the racing commits serialized into a gap-free, strictly-increasing
    # version sequence (os.link losers retried at the next number)
    led = make_ledger(out, "commitlog")
    versions = [h["version"] for h in led.history()]
    assert versions == list(range(1, len(versions) + 1))
    # at least one add_files commit per writer
    n_appends = sum(1 for h in led.history()
                    if "add_files" in h["operations"])
    assert n_appends >= len(batches)
