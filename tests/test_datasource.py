"""`curator_table` Python Data Source: the commitlog table consumed
through plain `spark.read` / `spark.readStream` (Spark 4 DataSource
API). Batch = pinned snapshot; streaming = versions-as-offsets insert
feed with Delta streaming-source semantics (rewrites/restores never
fed), exactly-once across restarts via Spark's own offset checkpoint.
"""

from __future__ import annotations

import pytest

from curator_spark import fixtures
from curator_spark.checkpoint import (
    compact_partition, delete_conversations, make_ledger, read_committed,
    run_checkpointed)
from curator_spark.datasource import CuratorTableDataSource
from curator_spark.incremental import append_new_conversations


def _ms(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols)
                  for r in df.select(*cols).collect())


@pytest.fixture()
def table(spark, tmp_path):
    spark.dataSource.register(CuratorTableDataSource)
    p1 = str(tmp_path / "b1.parquet")
    fixtures.write_transcripts_parquet(p1, 600, seed=81, n_parts=4)
    out = str(tmp_path / "out")
    run_checkpointed(spark, p1, out, ledger_backend="commitlog")
    return out


def test_batch_read_is_the_snapshot(spark, table):
    df = spark.read.format("curator_table").load(table)
    assert _ms(df) == _ms(read_committed(spark, table))
    # orphaned / uncommitted files stay invisible: manifests govern
    assert df.schema == read_committed(spark, table).schema


def test_stream_is_exactly_once_across_restarts(spark, table, tmp_path):
    sink = str(tmp_path / "sink")
    ck = str(tmp_path / "ck")

    def drain():
        q = (spark.readStream.format("curator_table").load(table)
             .writeStream.format("parquet")
             .option("path", sink).option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    drain()  # bootstrap: the whole table arrives once
    assert _ms(spark.read.parquet(sink)) == \
        _ms(read_committed(spark, table))
    drain()  # no new commits: nothing re-delivered
    assert spark.read.parquet(sink).count() == \
        read_committed(spark, table).count()
    # append a batch; restart delivers exactly the new rows
    p2 = str(tmp_path / "b2.parquet")
    fixtures.to_spark_parquet(
        fixtures.generate_transcripts(250, seed=82, n_parts=4), p2)
    app = append_new_conversations(spark, p2, table)
    assert app["rows_appended"] > 0
    drain()
    assert _ms(spark.read.parquet(sink)) == \
        _ms(read_committed(spark, table))


def test_stream_skips_rewrites_like_delta_skipchangecommits(spark, table,
                                                            tmp_path):
    sink, ck = str(tmp_path / "sink"), str(tmp_path / "ck")

    def drain():
        q = (spark.readStream.format("curator_table").load(table)
             .writeStream.format("parquet")
             .option("path", sink).option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    drain()
    n0 = spark.read.parquet(sink).count()
    # delete + compact: non-append commits must feed NOTHING (no
    # duplicates from the rewrites' output files)
    ids = [r.conv_id for r in read_committed(spark, table)
           .select("conv_id").distinct().limit(3).collect()]
    delete_conversations(spark, table, ids)
    led = make_ledger(table, "commitlog")
    part = max(led.committed(), key=lambda p: len(led.committed()[p]["files"]))
    compact_partition(spark, table, part)
    drain()
    assert spark.read.parquet(sink).count() == n0
