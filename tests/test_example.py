"""The runnable end-to-end tour must stay runnable: one subprocess
run of examples/end_to_end.py, asserting the printed JSON summary's
invariants (publish landed, feed drained, shards verified)."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_end_to_end_example(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "examples", "end_to_end.py"),
         str(tmp_path / "e2e")],
        capture_output=True, text=True, timeout=540, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    start = r.stdout.index("{")
    summary = json.loads(r.stdout[start:])
    assert summary["publish"]["published_version"] is not None
    assert summary["export"]["verified"] is True
    assert summary["feed_rows"] >= summary["table_rows"] > 0
    assert summary["initial_run"]["parts_committed"] == 4
