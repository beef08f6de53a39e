"""Round-close hygiene: commit the round's measurement artifacts.

Rounds 3 and 4 both ended with BENCH.md / BENCH_r{N}.json /
CORRECTNESS_r{N}.json sitting uncommitted (the driver writes the
r{N} files AFTER the builder's last commit, and BENCH.md is rewritten
by every `python bench.py` run). This verb makes closing a round one
command: it stages exactly the known artifact names that are modified
or untracked and commits them with a uniform message — nothing else
is ever staged, so it is safe to run with unrelated work in the tree.

Usage: python tools/round_close.py [--dry-run]
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARTIFACTS = ["BENCH.md", "PLANS.md", "COVERAGE.md",
             "VERDICT.md", "ADVICE.md", "BASELINE.md"]
ARTIFACT_GLOBS = ["BENCH_r*.json", "CORRECTNESS_r*.json",
                  "COPYCHECK.json", "LEAKCHECK.json"]


def _git(*args: str) -> str:
    return subprocess.run(["git", *args], cwd=REPO, check=True,
                          stdout=subprocess.PIPE, text=True).stdout


def main() -> int:
    dry = "--dry-run" in sys.argv
    names = list(ARTIFACTS)
    for g in ARTIFACT_GLOBS:
        names += [os.path.basename(p)
                  for p in glob.glob(os.path.join(REPO, g))]
    dirty = set()
    status = _git("status", "--porcelain")
    for line in status.splitlines():
        path = line[3:].strip()
        if path in names:
            dirty.add(path)
    if not dirty:
        print("round-close: no artifact changes to commit")
        return 0
    staged = sorted(dirty)
    print("round-close: committing", ", ".join(staged))
    if dry:
        return 0
    _git("add", "--", *staged)
    nums = [p.split("_r")[1].split(".")[0] for p in staged
            if "_r" in p and p.endswith(".json")]
    tag = f" r{max(nums)}" if nums else ""
    _git("commit", "-m",
         f"Record round{tag} measurement artifacts\n\n"
         f"Bench/correctness/judge outputs for the closed round: "
         f"{', '.join(staged)}.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
