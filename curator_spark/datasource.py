"""`curator_table` — a PySpark Python Data Source (Spark 4 DataSource
API) exposing the commitlog table to plain `spark.read` /
`spark.readStream`, no library calls needed at the consumption site:

    spark.dataSource.register(CuratorTableDataSource)
    df = spark.read.format("curator_table").load(table_dir)
    s  = (spark.readStream.format("curator_table").load(table_dir)
          .writeStream.foreachBatch(train_on).trigger(availableNow=True)
          .option("checkpointLocation", ckpt).start())

Batch read = the pinned snapshot (the manifests' exact file set, like
`read_committed`). Streaming read = Delta's streaming-source
semantics re-expressed on this log: OFFSETS ARE TABLE VERSIONS, each
micro-batch is the rows INSERTED in (start, end] as `table_changes`
defines them (compaction/delete rewrites and restores are never fed —
`skipChangeCommits` behavior), so Spark's own offset checkpoint makes
consumption exactly-once end to end across restarts. Planning is
driver-side log metadata; executors read ONLY their assigned parquet
files (one input partition per committed file — cluster-parallel by
construction, and at 100 TB each micro-batch plans O(window) metadata,
never a table scan).

The reader yields Arrow record batches (not Python tuples), so rows
never pass through per-row Python; files written before an additive
schema evolution surface the later columns as nulls, exactly like the
snapshot reader.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource, DataSourceReader, DataSourceStreamReader, InputPartition)
from pyspark.sql.types import StructType


@dataclass
class _FilePartition(InputPartition):
    part: int
    path: str


def _declared_schema(table_dir: str) -> StructType:
    from .checkpoint import detect_backend, make_ledger
    from . import schema as _schema
    ledger = make_ledger(table_dir, detect_backend(table_dir))
    meta = ledger.table_meta() if getattr(
        ledger, "log_defined_visibility", False) else {}
    st = StructType.fromJson(meta["schema"]) if meta.get("schema") \
        else _schema.OUTPUT_SCHEMA
    # partition column LAST, matching Spark's partitioned-parquet read
    # order (so this source is schema-identical to read_committed)
    fields = [f for f in st.fields if f.name != "part"] \
        + [f for f in st.fields if f.name == "part"]
    return StructType(fields)


def _read_file_as_arrow(partition: _FilePartition, schema: StructType):
    """Executor-side: one committed parquet file → arrow batches cast
    to the table schema (partition column materialized from the
    assignment; evolution-missing columns filled with nulls)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema
    target = to_arrow_schema(schema)
    table = pq.read_table(partition.path)
    n = table.num_rows
    arrays = []
    for field in target:
        if field.name == "part" and "part" not in table.column_names:
            arrays.append(pa.array([partition.part] * n,
                                   type=pa.int32()).cast(field.type))
        elif field.name in table.column_names:
            arrays.append(table.column(field.name).cast(field.type))
        else:  # pre-evolution file: later-added column reads as null
            arrays.append(pa.nulls(n, type=field.type))
    yield from pa.Table.from_arrays(arrays, schema=target).to_batches()


class _SnapshotReader(DataSourceReader):
    def __init__(self, schema: StructType, table_dir: str) -> None:
        import os
        from .checkpoint import detect_backend, make_ledger
        self._schema = schema
        # pin the snapshot at PLAN time (driver): the scan stays
        # consistent even if writers commit mid-job
        ledger = make_ledger(table_dir, detect_backend(table_dir))
        data = os.path.join(table_dir, "data")
        self._parts = [
            _FilePartition(int(p), os.path.join(data, f"part={int(p)}", fn))
            for p, m in sorted(ledger.committed().items())
            for fn in sorted(((m or {}).get("files") or {}))]

    def partitions(self):
        return self._parts

    def read(self, partition: _FilePartition):
        return _read_file_as_arrow(partition, self._schema)


class _ChangeStreamReader(DataSourceStreamReader):
    """Micro-batch source: offset = {'version': N}. partitions(start,
    end) plans the window's inserted files from the log (pure
    metadata); immutable files + deterministic planning make every
    batch replayable, which is what Spark's offset checkpoint needs
    for exactly-once."""

    def __init__(self, schema: StructType, table_dir: str) -> None:
        self._schema = schema
        self._dir = table_dir

    def _ledger(self):
        from .checkpoint import detect_backend, make_ledger
        ledger = make_ledger(self._dir, detect_backend(self._dir))
        if not getattr(ledger, "log_defined_visibility", False):
            raise ValueError(
                "the curator_table stream source requires a "
                "commitlog-governed table")
        return ledger

    def initialOffset(self) -> dict:
        return {"version": 0}

    def latestOffset(self) -> dict:
        return {"version": int(self._ledger().latest_version() or 0)}

    def partitions(self, start: dict, end: dict):
        import os
        from .checkpoint import table_changes
        lo, hi = int(start["version"]), int(end["version"])
        if hi <= lo:
            return []
        ch = table_changes(self._dir, lo, hi)
        data = os.path.join(self._dir, "data")
        return [
            _FilePartition(int(p), os.path.join(data, f"part={int(p)}", fn))
            for p, fs in sorted(ch["inserts"].items())
            for fn in sorted(fs)]

    def read(self, partition: _FilePartition):
        return _read_file_as_arrow(partition, self._schema)

    def commit(self, end: dict) -> None:
        pass  # Spark's checkpoint owns progress; the log is immutable


class CuratorTableDataSource(DataSource):
    """USING curator_table — batch snapshot + streaming change source
    over a commitlog table directory (`load(path)` or `path` option)."""

    @classmethod
    def name(cls) -> str:
        return "curator_table"

    def _path(self) -> str:
        p = self.options.get("path")
        if not p:
            raise ValueError("curator_table requires a table path: "
                             ".load(dir) or .option('path', dir)")
        return p

    def schema(self) -> StructType:
        return _declared_schema(self._path())

    def reader(self, schema: StructType) -> DataSourceReader:
        return _SnapshotReader(schema, self._path())

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _ChangeStreamReader(schema, self._path())
