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


# both put-if-absent stores must serialize real multi-process races:
# os.link natively, the conditional-put emulation via its server-side-
# style lock — the same contract an S3 If-None-Match adapter provides
@pytest.mark.parametrize("store_name", ["oslink", "condput"])
def test_processes_race_appends_without_lost_updates(spark, tmp_path,
                                                     store_name,
                                                     monkeypatch):
    monkeypatch.setenv("CURATOR_SPARK_ATOMIC_STORE", store_name)
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

    env = dict(os.environ, PYTHONPATH=REPO,
               CURATOR_SPARK_ATOMIC_STORE=store_name)
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


@pytest.mark.parametrize("store_name", ["oslink", "condput"])
def test_atomic_store_contract_under_thread_races(tmp_path, store_name):
    """The put_if_absent contract both stores must honor: for one name,
    exactly ONE writer wins, the loser learns it (False — never an
    exception), and the published content is one writer's payload IN
    FULL (complete content or nothing, never an interleaving)."""
    import threading

    from curator_spark.checkpoint import ATOMIC_STORES
    store = ATOMIC_STORES[store_name]()
    for round_ in range(8):
        path = str(tmp_path / f"v{round_:03d}.json")
        results: dict[int, bool] = {}
        payloads = {i: (f'{{"writer": {i}, "round": {round_}}}'
                        * 200).encode() for i in range(6)}
        barrier = threading.Barrier(6)

        def attempt(i):
            barrier.wait()
            results[i] = store.put_if_absent(path, payloads[i])

        ts = [threading.Thread(target=attempt, args=(i,)) for i in range(6)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        winners = [i for i, ok in results.items() if ok]
        assert len(winners) == 1, results
        with open(path, "rb") as f:
            assert f.read() == payloads[winners[0]]  # full content
        # and a later put against the existing name just loses
        assert store.put_if_absent(path, b"late") is False
