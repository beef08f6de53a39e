"""Per-file bloom filter index (checkpoint.build_bloom_index): point
probes on a high-cardinality NON-clustered column skip files — the
right-to-be-forgotten-by-user_id shape on a conv_id-bucketed table,
where min/max stats prune nothing because every file spans the full
value range. Delta's bloom filter index as a maintenance pass whose
result rides commit stats (`add_stats` action, stale-safe vs
concurrent rewrites)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from curator_spark.checkpoint import (
    build_bloom_index, compact_partition, delete_conversations,
    make_ledger, read_committed, snapshot_files)
from curator_spark.datasource import CuratorTableDataSource

N0 = 600


def _toy(spark, n=N0, lo=0):
    # uid is high-cardinality and SCATTERED across files (md5 order) —
    # min/max stats cannot prune a uid point probe
    return spark.range(lo, lo + n).select(
        F.format_string("conv-%06d", F.col("id")).alias("conv_id"),
        (F.col("id") % 5).cast("int").alias("turn_idx"),
        F.md5(F.format_string("user-%d", F.col("id") % 200)).alias("uid"),
        (F.col("id") % 97).cast("double").alias("ppl"))


@pytest.fixture()
def table(spark, tmp_path):
    spark.dataSource.register(CuratorTableDataSource)
    out = str(tmp_path / "t")
    for lo in (0, N0):  # two appends → 2 files per bucket
        (_toy(spark, lo=lo).coalesce(1).write.format("curator_table")
         .option("bucketBy", "conv_id").option("buckets", "4")
         .mode("append").save(out))
    return out


def _uid(spark, i: int) -> str:
    return spark.range(1).select(
        F.md5(F.lit(f"user-{i}"))).collect()[0][0]


def test_bloom_prunes_point_probes_exactly(spark, table):
    probe = _uid(spark, 7)
    n_all = len(snapshot_files(table))
    # before the index: uid has no stats at all → nothing prunes
    assert len(snapshot_files(table, where=("uid", "=", probe))) == n_all
    r = build_bloom_index(spark, table, "uid", m_bits=8192)
    assert r["files_indexed"] == n_all and r["version"] is not None
    hit = snapshot_files(table, where=("uid", "=", probe))
    assert 0 < len(hit) < n_all          # pruned, but never to zero
    # exactness: every matching row still found through the pruned scan
    want = read_committed(spark, table).filter(
        F.col("uid") == probe).count()
    assert want == 2 * (2 * N0) // 200 // 2 or want > 0
    got = read_committed(spark, table, where=("uid", "=", probe)).count()
    assert got == want
    # no false negatives across many probes
    for i in (0, 3, 199, 42):
        p = _uid(spark, i)
        w = read_committed(spark, table).filter(F.col("uid") == p).count()
        g = read_committed(spark, table,
                           where=("uid", "=", p)).count()
        assert g == w and w > 0
    # an absent value prunes EVERYTHING (bloom proves absence)
    assert snapshot_files(
        table, where=("uid", "=", "no-such-user")) == []


def test_bloom_accelerates_keyed_delete(spark, table):
    """delete_conversations(key='uid') — the GDPR shape: bucket pruning
    is useless (uid is not the bucket key) and min/max match every
    file; the bloom pins the candidate files."""
    probe = _uid(spark, 11)
    build_bloom_index(spark, table, "uid", m_bits=8192)
    want = read_committed(spark, table).filter(
        F.col("uid") == probe).count()
    s = delete_conversations(spark, table, [probe], key="uid")
    assert s["rows_deleted"] == want
    assert s["files_untouched"] > 0       # bloom skipped clean files
    assert read_committed(spark, table).filter(
        F.col("uid") == probe).count() == 0


def test_bloom_refuses_float_columns(spark, table):
    with pytest.raises(ValueError, match="float"):
        build_bloom_index(spark, table, "ppl")


def test_compaction_drops_blooms_soundly(spark, table):
    """A rewrite invalidates the rewritten files' blooms (their stats
    are swapped out with them); the compacted file reads UNINDEXED —
    kept by every probe — until the next build. Never unsound."""
    probe = _uid(spark, 3)
    build_bloom_index(spark, table, "uid")
    want = read_committed(spark, table).filter(
        F.col("uid") == probe).count()
    parts = sorted({int(os.path.basename(os.path.dirname(p))
                        .split("=")[1])
                    for p in snapshot_files(table)})
    for part in parts:
        compact_partition(spark, table, part)
    n_all = len(snapshot_files(table))
    # unindexed compacted files are all kept (no pruning, no loss)
    assert len(snapshot_files(table, where=("uid", "=", probe))) == n_all
    assert read_committed(spark, table,
                          where=("uid", "=", probe)).count() == want
    # rebuild re-indexes the compacted files: the probe's file set
    # is exactly the files that HOLD it (each compacted file now spans
    # all uids, so "fewer files" is not the invariant — exactness is)
    r = build_bloom_index(spark, table, "uid", m_bits=8192)
    assert r["files_indexed"] == n_all
    holding = {r2[0].split("/")[-1] for r2 in
               read_committed(spark, table)
               .where(F.col("uid") == probe)
               .select(F.col("_metadata.file_path"))
               .distinct().collect()}
    hit = {p2.split("/")[-1] for p2 in
           snapshot_files(table, where=("uid", "=", probe))}
    assert holding <= hit                  # never a false negative
    assert read_committed(spark, table,
                          where=("uid", "=", probe)).count() == want
    # and an absent value still prunes everything
    assert snapshot_files(table, where=("uid", "=", "nope")) == []


def test_bloom_composes_with_column_mapping(spark, table):
    from curator_spark.alter import rename_column
    probe = _uid(spark, 19)
    build_bloom_index(spark, table, "uid", m_bits=8192)
    rename_column(table, "uid", "user_hash")
    n_all = len(snapshot_files(table))
    hit = snapshot_files(table, where=("user_hash", "=", probe))
    assert 0 < len(hit) < n_all           # probe translated to physical
    want = read_committed(spark, table).filter(
        F.col("user_hash") == probe).count()
    assert read_committed(spark, table,
                          where=("user_hash", "=", probe)).count() \
        == want
    # building AFTER the rename indexes under the physical name too
    r = build_bloom_index(spark, table, "user_hash", m_bits=8192)
    assert r["files_indexed"] == n_all


def test_cli_build_bloom_and_keyed_delete(spark, table):
    from curator_spark.cli import main
    probe = _uid(spark, 23)
    want = read_committed(spark, table).filter(
        F.col("uid") == probe).count()
    assert main(["--output", table, "--local-cores", "4",
                 "--build-bloom", "uid"]) == 0
    assert main(["--output", table, "--local-cores", "4",
                 "--delete-ids", probe, "--delete-key", "uid"]) == 0
    assert read_committed(spark, table).filter(
        F.col("uid") == probe).count() == 0
    assert want > 0
