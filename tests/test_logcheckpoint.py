"""Commit-log checkpointing (CommitLogLedger.CKPT_INTERVAL): every Nth
commit persists the full replayed state so reads replay O(interval)
commits instead of the whole history — Delta's log-checkpoint design,
the piece that keeps a years-old continuous-ingestion table's planning
cost flat. Version files are retained: time travel to any version and
history() still work, and a corrupt checkpoint degrades to full replay.
"""

from __future__ import annotations

import json
import os

import pytest

from curator_spark.checkpoint import CommitLogLedger


def _marker(part: int, run: str, n: int) -> dict:
    return {"run_id": run, "part": part, "status": "COMMITTED",
            "n_rows": n, "files": {f"f{part}-{run}.parquet":
                                   {"n_rows": n, "n_bytes": 10 * n}}}


@pytest.fixture()
def busy_ledger(tmp_path):
    """A ledger with 40 commits mixing every action type — enough to
    cross two checkpoint intervals (16, 32)."""
    led = CommitLogLedger(str(tmp_path))
    led.set_table_meta({"bucket": {"col": "conv_id", "n_parts": 8,
                                   "fn": "md5full"}})
    for i in range(12):
        led.commit_part(_marker(i % 6, f"r{i}", 100 + i))
    for i in range(10):
        led.append_part(i % 6, {f"app{i}.parquet":
                                {"n_rows": 5, "n_bytes": 50}}, 5, f"a{i}")
    led.drop_part(5)
    for i in range(12):
        led.commit_part(_marker(6 + i % 2, f"s{i}", 10))
    led.mark_run_success("final", 8)
    for i in range(4):
        led.commit_part(_marker(i, f"t{i}", 7))
    return led


def test_checkpoints_written_and_state_identical(busy_ledger, tmp_path):
    led = busy_ledger
    cks = led._checkpoints()
    assert cks == [16, 32]
    # ground truth: replay every version file with checkpoints hidden
    import shutil
    bare = CommitLogLedger(str(tmp_path))
    shadow = str(tmp_path / "_shadow")
    os.makedirs(shadow)
    for v in cks:
        shutil.move(os.path.join(led.dir, f"ckpt-{v:012d}.json"), shadow)
    truth = bare._replay()
    for v in cks:
        shutil.move(os.path.join(shadow, f"ckpt-{v:012d}.json"), led.dir)
    fast = led._replay()
    assert fast == truth
    # time travel below, at, and above a checkpoint version all agree
    for version in (3, 16, 17, 31, 32, 41):
        assert led.committed(version=version) == \
            bare._replay(upto=version)[0]


def test_reads_replay_only_the_tail(busy_ledger, monkeypatch):
    """After the v32 checkpoint, a head read must parse only the
    commits after v32 — not the whole 39-version history."""
    led = busy_ledger
    opened = []
    real_open = open

    def spy(path, *a, **k):
        if "_commitlog" in str(path):
            opened.append(os.path.basename(str(path)))
        return real_open(path, *a, **k)

    monkeypatch.setattr("builtins.open", spy)
    led.committed()
    versions_read = [f for f in opened if f.startswith("v")]
    assert versions_read and all(int(f[1:-5]) > 32 for f in versions_read)
    assert any(f.startswith("ckpt-") for f in opened)


def test_corrupt_checkpoint_degrades_to_full_replay(busy_ledger):
    led = busy_ledger
    truth = led.committed()
    for v in led._checkpoints():
        with open(os.path.join(led.dir, f"ckpt-{v:012d}.json"), "w") as f:
            f.write("{ not json")
    assert led.committed() == truth


def test_checkpoint_does_not_break_versioning(busy_ledger):
    led = busy_ledger
    assert led.latest_version() == 41  # 1 meta + 12 + 10 + 1 drop + 12
    #                                    + 1 success + 4
    # history still lists every commit (version files retained)
    assert [h["version"] for h in led.history()] == list(range(1, 42))
    with pytest.raises(ValueError, match="does not exist"):
        led.committed(version=99)


def test_checkpoint_state_roundtrips_int_parts(busy_ledger):
    """JSON stringifies dict keys — the loader must restore int part
    ids or every committed-part lookup silently misses."""
    led = busy_ledger
    ck = led._load_checkpoint(None)
    assert ck is not None
    _v, parts, success, meta, _txns = ck
    assert all(isinstance(k, int) for k in parts)
    assert meta.get("bucket", {}).get("n_parts") == 8
