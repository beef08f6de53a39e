"""Predicate DML over commitlog tables: UPDATE ... SET ... WHERE and
DELETE ... WHERE — the two standard verbs the table surface still
lacked next to append (INSERT), key-based deletes, and MERGE.

Both share one engine (`_rewrite_where`), the same two-pass shape as
MERGE (merge.py):

* prune (metadata-only): when the predicate is a (col, op, value)
  triple — or an ANDed list of them, read_committed's `where=`
  convention — files whose manifest [min, max] cannot match are
  skipped without opening them; bucket pruning applies when the
  predicate pins the bucketed column by equality. An arbitrary SQL
  string predicate skips this pass (nothing to prune on) but still
  gets pass 2.
* findTouchedFiles (one probe job): candidate rows are filtered by
  the predicate and counted per `_metadata.file_path` — only files
  actually HOLDING a matching row are rewritten.
* rewrite + ONE atomic commit: UPDATE rewrites each touched file with
  CASE WHEN pred THEN expr ELSE col END per SET column (row counts
  verified unchanged); DELETE keeps rows failing the predicate
  (verified against the probe's count). All swaps land in one log
  version; the post-commit stale-swap verification raises
  ConcurrentDMLError rather than silently dropping a mutation that
  lost to a concurrent OPTIMIZE (Delta's conflict rule).

NULL predicate semantics are SQL's: a NULL predicate row is NOT
matched — kept by DELETE, untouched by UPDATE.

Reference parity: the reference revises response rows in place when a
retry supersedes an error row (base_request_processor.py:438-481 keyed
replace) — UPDATE/DELETE WHERE is that idiom as declarative verbs.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from .checkpoint import (
    _apply_dv, _file_may_match, _normalize_where, detect_backend,
    file_column_stats, make_ledger, physical_name, physical_struct,
    stats_columns, to_logical, to_physical)

__all__ = ["ConcurrentDMLError", "delete_where",
           "insert_overwrite_where", "update_where"]


class ConcurrentDMLError(RuntimeError):
    """A concurrent rewrite replaced a touched file between the DML
    snapshot and its commit; the stale swap was ignored by replay.
    Retry: the verb recomputes from the new snapshot and converges."""


def _pred_column(where) -> Column:
    """Predicate from either read_committed's (col, op, value) triples
    (ANDed) or a raw Spark SQL boolean string."""
    if isinstance(where, str):
        return F.expr(where)
    cond = None
    for col, op, val in _normalize_where(where):
        c = {"=": F.col(col) == F.lit(val),
             "<": F.col(col) < F.lit(val),
             "<=": F.col(col) <= F.lit(val),
             ">": F.col(col) > F.lit(val),
             ">=": F.col(col) >= F.lit(val)}[op]
        cond = c if cond is None else (cond & c)
    if cond is None:
        raise ValueError("empty predicate: refusing a whole-table "
                         "mutation without an explicit WHERE — pass "
                         "e.g. ('conv_id', '>=', '') to mean ALL")
    return cond


def _stats_candidates(committed: dict, where,
                      meta: dict | None = None) -> dict[int, tuple]:
    """Pass 1: {part: (candidate files, marker)} via manifest stats.
    String predicates keep every file (no structure to prune on).
    Predicate columns arrive logical; footer stats are keyed by the
    physical names files hold (identity until an ALTER renames)."""
    triples = _normalize_where(where) if not isinstance(where, str) \
        else []
    if meta:
        triples = [(physical_name(meta, c), op, v)
                   for c, op, v in triples]
    out: dict[int, tuple] = {}
    skipped = 0
    for part, marker in sorted(committed.items()):
        files = (marker or {}).get("files") or {}
        stats = (marker or {}).get("stats") or {}
        cand = [fn for fn in sorted(files)
                if all(_file_may_match(stats.get(fn), c, op, v)
                       for c, op, v in triples)]
        skipped += len(files) - len(cand)
        if cand:
            out[int(part)] = (cand, marker or {})
    return out, skipped


def _rewrite_where(spark: SparkSession, out_dir: str, where,
                   transform, verify, op_name: str,
                   backend: str | None = None,
                   extra_actions: list | None = None) -> dict:
    """Common engine: prune → probe → rewrite touched files →
    one atomic commit → stale-swap verification.

    transform(df, pred) -> rewritten df; verify(before, matched,
    after) -> None or error message.

    extra_actions: pre-built log actions (e.g. replaceWhere's insert
    leg add_files) committed in the SAME atomic version as the
    rewrites — and committed even when the predicate touches no file
    (an overwrite of an empty region is a plain insert)."""
    import pyarrow.parquet as pq
    from pyspark.sql.types import StructType

    backend = backend or detect_backend(out_dir)
    ledger = make_ledger(out_dir, backend)
    if not getattr(ledger, "log_defined_visibility", False):
        raise ValueError(
            f"{op_name} requires a log-defined-visibility ledger, "
            f"not '{backend}'")
    committed, _s, meta, _t = ledger.snapshot()
    if not meta.get("schema"):
        raise ValueError(f"{op_name} requires the table schema in "
                         "table_meta")
    declared = StructType([f for f in physical_struct(meta).fields
                           if f.name != "part"])  # files: physical names
    reader = spark.read.schema(declared)
    pred = _pred_column(where)
    hit = F.coalesce(pred, F.lit(False))   # SQL WHERE: NULL = no match

    summary = {"version": None, "rows_matched": 0, "files_rewritten": 0,
               "files_untouched": 0, "parts_touched": []}
    extra_actions = list(extra_actions or [])
    cand_by_part, skipped = _stats_candidates(committed, where, meta)
    summary["files_untouched"] += skipped
    if not cand_by_part and not extra_actions:
        return summary

    data_dir = os.path.join(out_dir, "data")
    touched: dict[int, dict[str, int]] = {}
    if cand_by_part:
        all_paths, dv_all = [], {}
        for part, (cand, marker) in cand_by_part.items():
            pdir = os.path.join(data_dir, f"part={part}")
            all_paths += [os.path.join(pdir, f) for f in cand]
            for fn, rows_ in (marker.get("dv") or {}).items():
                if fn in cand:
                    dv_all[os.path.join(pdir, fn)] = rows_
        # findTouchedFiles: one probe job, bounded collect (≤ n files).
        # The predicate is LOGICAL; the scan is physical — materialize
        # the file path BEFORE the logical aliasing (the `_metadata`
        # pseudo-column resolves only against the scan, not through a
        # projection)
        t_all = _apply_dv(spark, reader.parquet(*all_paths), dv_all)
        t_all = to_logical(
            t_all.withColumn("__fp", F.col("_metadata.file_path")), meta)
        fparts = F.split(F.col("__fp"), "/")
        for r in (t_all.filter(hit)
                  .groupBy(F.concat_ws(
                      "/", F.element_at(fparts, -2),
                      F.element_at(fparts, -1)).alias("__path"))
                  .agg(F.count(F.lit(1)).alias("m")).collect()):
            pstr, fn = r["__path"].split("/", 1)
            touched.setdefault(int(pstr.split("=", 1)[1]),
                               {})[fn] = int(r["m"])
        for part, (cand, _m) in cand_by_part.items():
            summary["files_untouched"] += len(cand) - len(
                touched.get(part, {}))
    if not touched and not extra_actions:
        return summary

    tag = uuid.uuid4().hex[:12]
    actions, verify_swaps = [], []

    def _one(part: int) -> dict:
        cand, marker = cand_by_part[part]
        tfiles = sorted(touched[part])
        matched = sum(touched[part].values())
        files = marker.get("files") or {}
        pdir = os.path.join(data_dir, f"part={part}")
        dv = {f: r for f, r in (marker.get("dv") or {}).items()
              if f in tfiles}
        before = sum(int(files[f].get("n_rows", 0)) for f in tfiles) \
            - sum(len(v) for v in dv.values())
        t = _apply_dv(
            spark, reader.parquet(*[os.path.join(pdir, f)
                                    for f in tfiles]),
            {os.path.join(pdir, f): r for f, r in dv.items()})
        # transform speaks logical names; files are written physical
        out = to_physical(transform(to_logical(t, meta), hit), meta)
        staging = os.path.join(out_dir, f"_compact-{tag}-p{part}")
        out.coalesce(max(1, len(tfiles))).write.parquet(staging)
        man, new_stats, after, i = {}, {}, 0, 0
        for f in sorted(os.listdir(staging)):
            if not f.endswith(".parquet"):
                continue
            fsrc = os.path.join(staging, f)
            rows = pq.ParquetFile(fsrc).metadata.num_rows
            if rows == 0:
                continue
            newname = f"{op_name}-{tag}-{part}-{i:05d}.parquet"
            man[newname] = {"n_rows": int(rows),
                            "n_bytes": os.path.getsize(fsrc)}
            new_stats[newname] = file_column_stats(
                fsrc, stats_columns(meta))
            after += int(rows)
            os.replace(fsrc, os.path.join(pdir, newname))
            i += 1
        shutil.rmtree(staging, ignore_errors=True)
        err = verify(before, matched, after)
        if err:
            raise RuntimeError(
                f"{op_name} rewrite of part {part}: {err}; aborted, "
                "table unchanged")
        return {"part": part, "tfiles": tfiles, "man": man,
                "stats": new_stats, "matched": matched}

    results = []
    if touched:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=min(8, len(touched))) as pool:
            results = list(pool.map(_one, sorted(touched)))
    from datetime import datetime, timezone
    now = datetime.now(timezone.utc).isoformat()
    for r in results:
        actions.append({"type": "delete", "part": r["part"],
                        "remove_files": r["tfiles"],
                        "add_files": r["man"], "stats": r["stats"],
                        "updated_at": now})
        verify_swaps.append((r["part"], r["tfiles"]))
        summary["rows_matched"] += r["matched"]
        summary["files_rewritten"] += len(r["tfiles"])
        summary["parts_touched"].append(r["part"])
    actions += extra_actions  # e.g. replaceWhere's insert leg — one
    # atomic version carries the delete rewrites AND the new files
    cons = dict(meta.get("constraints") or {})
    if cons:
        # CHECK enforcement: staged outputs validate before the
        # commit publishes (UPDATE could write a violating value).
        # Constraint expressions speak logical names; mapped tables
        # validate through the logical aliasing of the physical files.
        from .constraints import check_df, check_files
        paths_ = [os.path.join(data_dir, f"part={a['part']}", fn)
                  for a in actions
                  for fn in (a.get("add_files") or a.get("files") or {})]
        if meta.get("column_mapping") and paths_:
            check_df(to_logical(spark.read.parquet(*paths_), meta),
                     cons, where=f" by {op_name.upper()}")
        else:
            check_files(spark, paths_, cons,
                        where=f" by {op_name.upper()}")
    ver = ledger.merge_commit(actions)
    summary["version"] = int(ver)
    summary["parts_touched"].sort()
    for part, tfiles in verify_swaps:
        prev = set(((ledger.committed(version=ver - 1)
                     .get(int(part)) or {}).get("files") or {}))
        if not set(tfiles) <= prev:
            raise ConcurrentDMLError(
                f"{op_name} v{ver} conflicted on part {part}: files "
                f"{sorted(set(tfiles) - prev)} were replaced by a "
                "concurrent rewrite and the swap was ignored — retry")
    return summary


def insert_overwrite_where(spark: SparkSession, out_dir: str,
                           df: DataFrame, where,
                           backend: str | None = None) -> dict:
    """INSERT OVERWRITE ... WHERE (Delta's replaceWhere): atomically
    replace EXACTLY the rows matching `where` with `df`'s rows — the
    standard backfill idiom at corpus scale (reprocess one day / one
    source, swap the region in). ONE log version carries both legs:
    the predicate's stats-pruned, probe-exact delete rewrites AND the
    new files, so readers see the old region or the new one, never a
    mix, and a crash at any point leaves only vacuum-able orphans.

    Delta's replaceWhere contract is enforced: every `df` row must
    itself satisfy `where` — a violating backfill would silently land
    rows OUTSIDE the replaced region (raises before staging anything).
    The schema must match the table's (widening belongs to MERGE's
    evolve_schema); routing uses an explicit `part` column or the
    table's recorded bucket spec, exactly like the other writers.
    CHECK constraints validate both legs; column mapping projects the
    new files to physical names. Concurrent-rewrite conflicts raise
    ConcurrentDMLError like any DML (retry converges).

    Returns {version, rows_deleted, rows_inserted, files_rewritten,
    files_added, files_untouched, parts_touched}."""
    import uuid as _uuid

    import pyarrow.parquet as pq
    from pyspark.sql.types import StructType

    from .checkpoint import BUCKET_FNS

    backend = backend or detect_backend(out_dir)
    ledger = make_ledger(out_dir, backend)
    if not getattr(ledger, "log_defined_visibility", False):
        raise ValueError("insert_overwrite_where requires the "
                         "commitlog ledger")
    _c, _s, meta, _t = ledger.snapshot()
    if not meta.get("schema"):
        raise ValueError("replaceWhere requires the table schema in "
                         "table_meta")
    declared = StructType(
        [f for f in StructType.fromJson(meta["schema"]).fields
         if f.name != "part"])
    cols = [f.name for f in declared.fields]
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"df lacks table columns {missing}")
    extra = [c for c in df.columns if c not in cols and c != "part"]
    if extra:
        raise ValueError(
            f"df carries columns the table lacks {extra}; replaceWhere "
            "never evolves the schema (use merge_into evolve_schema)")
    pred = _pred_column(where)
    if df.filter(~F.coalesce(pred, F.lit(False))).limit(1).count():
        raise ValueError(
            "replaceWhere: df holds row(s) NOT matching the predicate "
            "— they would land outside the replaced region (Delta "
            "raises identically)")

    bucket = meta.get("bucket") or {}
    dtypes = {f.name: f.dataType for f in declared.fields}
    staged = df.select(
        [F.col(c).cast(dtypes[c]).alias(c) for c in cols]
        + ([F.col("part").cast("int").alias("part")]
           if "part" in df.columns else []))
    if "part" not in staged.columns:
        if bucket.get("col") in cols and bucket.get("fn") in BUCKET_FNS \
                and bucket.get("n_parts"):
            from pyspark.sql.functions import pandas_udf
            fn_name, n_parts = bucket["fn"], int(bucket["n_parts"])

            def _bucket_series(s):
                f = BUCKET_FNS[fn_name]
                return s.map(lambda v: f(v, n_parts)).astype("int32")

            staged = staged.withColumn(
                "part", pandas_udf(_bucket_series, "int")(
                    F.col(bucket["col"])).cast("int"))
        else:
            raise ValueError("cannot route rows to partitions: give "
                             "df a `part` column or record a bucket "
                             "spec on the table")

    tag = _uuid.uuid4().hex[:12]
    data_dir = os.path.join(out_dir, "data")
    staging = os.path.join(out_dir, f"_compact-{tag}-ow")
    (to_physical(staged, meta).repartition("part")
     .write.partitionBy("part").parquet(staging))
    from datetime import datetime, timezone
    adds, rows_inserted = [], 0
    for d in sorted(os.listdir(staging)):
        if not d.startswith("part="):
            continue
        part = int(d.split("=", 1)[1])
        pdir = os.path.join(data_dir, f"part={part}")
        os.makedirs(pdir, exist_ok=True)
        man, new_stats, n_rows, i = {}, {}, 0, 0
        for f in sorted(os.listdir(os.path.join(staging, d))):
            if not f.endswith(".parquet"):
                continue
            fsrc = os.path.join(staging, d, f)
            rows = pq.ParquetFile(fsrc).metadata.num_rows
            if rows == 0:
                continue
            newname = f"ow-{tag}-{part}-{i:05d}.parquet"
            man[newname] = {"n_rows": int(rows),
                            "n_bytes": os.path.getsize(fsrc)}
            new_stats[newname] = file_column_stats(
                fsrc, stats_columns(meta))
            n_rows += int(rows)
            os.replace(fsrc, os.path.join(pdir, newname))
            i += 1
        if man:
            adds.append({"type": "add_files", "part": part,
                         "files": man, "n_rows": n_rows,
                         "run_id": f"ow-{tag}", "stats": new_stats,
                         "updated_at": datetime.now(
                             timezone.utc).isoformat()})
            rows_inserted += n_rows
    shutil.rmtree(staging, ignore_errors=True)

    def transform(d_, hit):
        return d_.filter(~hit)

    def verify(before, matched, after):
        if after != before - matched:
            return (f"kept {after} rows where the probe predicted "
                    f"{before - matched} ({matched} matches)")
        return None

    s = _rewrite_where(spark, out_dir, where, transform, verify,
                       "overwrite", backend, extra_actions=adds)
    s["rows_deleted"] = s.pop("rows_matched")
    s["rows_inserted"] = rows_inserted
    s["files_added"] = sum(len(a["files"]) for a in adds)
    for a in adds:
        if a["part"] not in s["parts_touched"]:
            s["parts_touched"].append(a["part"])
    s["parts_touched"].sort()
    return s


def update_where(spark: SparkSession, out_dir: str, set_exprs: dict,
                 where, backend: str | None = None) -> dict:
    """UPDATE table SET col = expr, ... WHERE pred. `set_exprs` maps
    existing column names to Spark SQL expression strings (or Columns)
    evaluated over the row; values are cast back to the column's
    declared type (UPDATE never changes the schema). Row counts are
    verified unchanged per rewritten file set.

    Returns {version, rows_matched, files_rewritten, files_untouched,
    parts_touched}; version is None when nothing matched."""
    from pyspark.sql.types import StructType

    ledger = make_ledger(out_dir, backend or detect_backend(out_dir))
    meta_schema = ledger.table_meta().get("schema") if getattr(
        ledger, "log_defined_visibility", False) else None
    declared = {f.name: f.dataType for f in
                StructType.fromJson(meta_schema).fields} \
        if meta_schema else {}
    unknown = [c for c in set_exprs if declared and c not in declared]
    if unknown:
        raise ValueError(f"UPDATE SET on unknown columns {unknown}")

    def transform(df, hit):
        out = df
        for c, e in set_exprs.items():
            expr = F.expr(e) if isinstance(e, str) else e
            if declared:
                expr = expr.cast(declared[c])
            out = out.withColumn(c, F.when(hit, expr)
                                 .otherwise(F.col(c)))
        return out

    def verify(before, _matched, after):
        if after != before:
            return f"row count changed {before} → {after}"
        return None

    s = _rewrite_where(spark, out_dir, where, transform, verify,
                       "update", backend)
    s["rows_updated"] = s.pop("rows_matched")
    return s


def delete_where(spark: SparkSession, out_dir: str, where,
                 backend: str | None = None) -> dict:
    """DELETE FROM table WHERE pred. NULL-predicate rows survive (SQL
    semantics). The surviving row count is verified against the
    probe's match count per file set.

    Returns {version, rows_deleted, files_rewritten, files_untouched,
    parts_touched}; version is None when nothing matched."""
    def transform(df, hit):
        return df.filter(~hit)

    def verify(before, matched, after):
        if after != before - matched:
            return (f"kept {after} rows where the probe predicted "
                    f"{before - matched} ({matched} matches)")
        return None

    s = _rewrite_where(spark, out_dir, where, transform, verify,
                       "deletew", backend)
    s["rows_deleted"] = s.pop("rows_matched")
    return s
