"""Delta-style MERGE INTO for commitlog tables, plus the pure
DataFrame-level merge expression it (and the oracle-gated q83 query)
are built from.

MERGE is the one mutation verb the table surface was missing next to
append (INSERT-if-absent), delete_conversations / delete_matching
(DELETE) and upsert_conversations (the transcripts-specific
replace-by-fingerprint): a schema-generic conditional upsert —

    MERGE INTO target t USING source s ON t.key = s.key
    WHEN MATCHED [AND <condition>] THEN UPDATE SET * | DELETE
    WHEN NOT MATCHED THEN INSERT *

Reference parity: the reference's batch resubmission loop re-delivers
completed request rows into the run's response file keyed by request
id, replacing failed rows and appending new ones
(/root/reference/src/bespokelabs/curator/request_processor/batch/
base_batch_request_processor.py:300-309 drives the state swap;
base_request_processor.py:438-481 is the id-keyed skip). MERGE is that
idiom generalized to a declarative table verb.

Scale shape (the Delta MERGE plan, re-expressed on the commitlog):
* the source is staged ONCE to scratch parquet (lineage cut — the
  possibly-expensive producing plan runs once, not once per partition);
* touched-file discovery is two-pass, exactly like Delta's: a
  metadata-only prune (per-bucket source-key [min, max] intervals vs
  each file's manifest stats) bounds the read set, then ONE
  findTouchedFiles probe job (candidate rows inner-joined to source
  keys, clause hits counted per `_metadata.file_path`) makes the
  rewrite set FILE-EXACT — a stats false positive costs a probe read,
  never a rewrite (bench-evidenced: a 1%-key merge over 2048 files
  rewrites only the 32 holding matches);
* the matched leg rewrites only those files via a key equi-join (AQE
  broadcasts a small source side), partitions rewritten as CONCURRENT
  Spark jobs from a driver pool; the not-matched leg is one LEFT ANTI
  join against the table's key column (scanned with column pruning —
  ReadSchema is the key alone);
* everything lands in ONE log version (swaps + add_files together),
  so readers see the merge atomically — never the deletes without the
  inserts;
* concurrency is optimistic, Delta-style: if a concurrent compaction /
  recompute replaced a candidate file between snapshot and commit, the
  swap is a no-op in replay and merge_into raises ConcurrentMergeError
  instead of reporting success. A retry converges: committed inserts
  re-match as updates (same values), un-applied swaps re-apply.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from .checkpoint import (
    BUCKET_FNS, _apply_dv, _file_may_match, detect_backend,
    file_column_stats, make_ledger, physical_name, stats_columns,
    to_logical, to_physical)

__all__ = ["ConcurrentMergeError", "merge_dataframes", "merge_into"]


class ConcurrentMergeError(RuntimeError):
    """A concurrent rewrite replaced a candidate file between the merge
    snapshot and its commit; the stale swap was ignored by replay.
    Retry the merge: it recomputes from the new snapshot and converges
    (already-inserted rows become same-value updates)."""


def _validate_clauses(when_matched, when_not_matched,
                      matched_delete_condition=None):
    if when_matched not in ("update", "delete", None):
        raise ValueError(
            f"when_matched must be 'update', 'delete' or None, got "
            f"{when_matched!r}")
    if when_not_matched not in ("insert", None):
        raise ValueError(
            f"when_not_matched must be 'insert' or None, got "
            f"{when_not_matched!r}")
    if when_matched is None and when_not_matched is None:
        raise ValueError("MERGE with no clauses is a no-op; give at "
                         "least one of when_matched / when_not_matched")
    if matched_delete_condition is not None and when_matched != "update":
        raise ValueError(
            "matched_delete_condition is the prioritized WHEN MATCHED "
            "AND <cond> THEN DELETE clause of a 3-clause merge — it "
            "requires when_matched='update' (for a pure delete use "
            "when_matched='delete')")


def merge_dataframes(target: DataFrame, source: DataFrame, key: str,
                     when_matched: str | None = "update",
                     when_not_matched: str | None = "insert",
                     matched_condition: str | None = None,
                     matched_delete_condition: str | None = None,
                     not_matched_condition: str | None = None
                     ) -> DataFrame:
    """MERGE semantics as one declarative DataFrame plan (no table, no
    commit): target rows matched by source key are updated to the
    source row (or deleted), unmatched source rows are inserted.

    Conditions are Spark SQL booleans over aliases `s` (source) and
    `t` (target) — extra source-only columns (e.g. CDC metadata) are
    in scope for conditions but never land in the output:
    * `matched_condition` — a matched row failing it keeps its target
      version (update) / survives (delete);
    * `matched_delete_condition` — Delta's 3-clause form: WHEN MATCHED
      AND <this> THEN DELETE, evaluated BEFORE the update clause (a
      row satisfying both is deleted), requires when_matched='update';
    * `not_matched_condition` — WHEN NOT MATCHED AND <this> THEN
      INSERT (source columns in scope; e.g. ``"NOT __is_delete"`` so
      CDC delete events for absent keys are no-ops).

    One left join + one anti join, both key equi-joins Catalyst can
    broadcast or shuffle-hash as sizes dictate — no window, no
    collect. NULL keys follow SQL equality: a NULL target key never
    matches (row kept), NULL-key source rows are dropped.
    """
    _validate_clauses(when_matched, when_not_matched,
                      matched_delete_condition)
    cols = target.columns
    missing = [c for c in cols if c not in source.columns]
    if missing and (when_matched == "update" or when_not_matched):
        raise ValueError(f"source lacks target columns {missing}")
    src = source.filter(F.col(key).isNotNull())

    cond = F.expr(matched_condition) if matched_condition else F.lit(True)
    mdel = F.expr(matched_delete_condition) if matched_delete_condition \
        else F.lit(False)
    mkey = F.col(f"s.{key}").isNotNull()
    del_hit = F.coalesce(mkey & mdel, F.lit(False))
    upd_hit = F.coalesce(mkey & cond, F.lit(False)) & ~del_hit
    j = target.alias("t").join(
        src.alias("s"), F.col(f"t.{key}") == F.col(f"s.{key}"), "left")
    if when_matched == "update":
        upd = j.filter(~del_hit).select(*[
            F.when(upd_hit, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}"))
            .alias(c) for c in cols])
    elif when_matched == "delete":
        upd = j.filter(~upd_hit) \
            .select(*[F.col(f"t.{c}").alias(c) for c in cols])
    else:
        upd = target
    if when_not_matched == "insert":
        ins = src.alias("s")
        if not_matched_condition:
            ins = ins.filter(F.expr(not_matched_condition))
        ins = ins.join(
            target.select(key).filter(F.col(key).isNotNull()),
            [key], "left_anti").select(*cols)
        upd = upd.unionByName(ins)
    return upd


def merge_into(spark: SparkSession, out_dir: str, source: DataFrame,
               key: str = "conv_id",
               when_matched: str | None = "update",
               when_not_matched: str | None = "insert",
               matched_condition: str | None = None,
               matched_delete_condition: str | None = None,
               not_matched_condition: str | None = None,
               txn: tuple[str, int] | None = None,
               evolve_schema: bool = False,
               backend: str | None = None) -> dict:
    """MERGE `source` into the committed commitlog table at `out_dir`
    on key equality, atomically (one log version carrying every file
    swap and every new file — see module docstring for the plan shape
    and the concurrency contract). The three condition parameters form
    Delta's full clause set (see merge_dataframes): WHEN MATCHED AND
    matched_delete_condition THEN DELETE / WHEN MATCHED [AND
    matched_condition] THEN UPDATE / WHEN NOT MATCHED [AND
    not_matched_condition] THEN INSERT — extra source-only columns
    (CDC metadata) are in scope for conditions, never in the output.

    evolve_schema=True (Delta's schema autoMerge): extra source
    columns instead BECOME table columns — appended nullable to the
    logged schema via the additive-evolution rule, recorded as a
    table_meta action IN THE SAME commit as the merge. Untouched files
    read NULL for the new columns (the evolution contract); only
    matched/inserted rows carry values. Leave False for CDC apply,
    where sequence/tombstone metadata must never land in the table.

    Duplicate source keys are refused (Delta's multiple-source-match
    error: the result would be nondeterministic). NULL-key source rows
    are dropped (SQL equality); NULL-key target rows always survive.

    txn=(app_id, version): idempotent-writer mark (Delta's txn action)
    committed IN THE SAME log version as the merge — if the table has
    already recorded `version` (or later) for `app_id`, the merge
    returns immediately with txn_skipped=True and NO Spark work. This
    is the exactly-once handle for streaming CDC apply (a replayed
    foreachBatch epoch is a cheap no-op).

    Returns {version, rows_updated, rows_deleted, rows_inserted,
    files_rewritten, files_added, files_untouched, parts_touched,
    n_source_rows, txn_skipped}. A merge that changes nothing commits
    no version (version is None).
    """
    import pyarrow.parquet as pq
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StructType

    _validate_clauses(when_matched, when_not_matched,
                      matched_delete_condition)
    backend = backend or detect_backend(out_dir)
    ledger = make_ledger(out_dir, backend)
    if not getattr(ledger, "log_defined_visibility", False):
        raise ValueError(
            f"MERGE requires a log-defined-visibility ledger, not "
            f"'{backend}': swaps + inserts must land in one atomic "
            "log version")
    committed, _success, meta, _txns = ledger.snapshot()
    bucket = meta.get("bucket") or {}
    if not meta.get("schema"):
        raise ValueError("MERGE requires the table schema in table_meta "
                         "(tables written by run_checkpointed/append "
                         "record it)")
    declared = StructType([f for f in
                           StructType.fromJson(meta["schema"]).fields
                           if f.name != "part"])
    cols = [f.name for f in declared.fields]
    if key not in cols:
        raise ValueError(f"key {key!r} not in table schema {cols}")
    need_full_row = when_matched == "update" or when_not_matched
    missing = [c for c in cols if c not in source.columns]
    if need_full_row and missing:
        raise ValueError(f"source lacks target columns {missing}")

    schema_action = None
    eff_meta = meta  # meta whose mapping covers this merge's columns
    if evolve_schema:
        from pyspark.sql.types import StructField
        add = [StructField(f.name, f.dataType, True)
               for f in source.schema.fields if f.name not in cols]
        if add:
            from .checkpoint import (
                _merge_schema_json, _mint_physical, column_mapping)
            merged_json = _merge_schema_json(
                meta["schema"],
                StructType(declared.fields + add).jsonValue())
            patch = {"schema": merged_json}
            cm = column_mapping(meta)
            if cm:
                # mapped table: the evolved columns need physical
                # names minted in the SAME commit as the schema
                taken = set(cm.values()) | set(
                    meta.get("retired_physical") or [])
                for f_ in add:
                    cm[f_.name] = _mint_physical(f_.name, taken)
                    taken.add(cm[f_.name])
                patch["column_mapping"] = cm
                eff_meta = {**meta, "column_mapping": cm}
            schema_action = {"type": "table_meta", "meta": patch}
            declared = StructType(declared.fields + add)
            cols = cols + [f.name for f in add]

    summary = {"version": None, "rows_updated": 0, "rows_deleted": 0,
               "rows_inserted": 0, "files_rewritten": 0, "files_added": 0,
               "files_untouched": 0, "parts_touched": [],
               "n_source_rows": 0, "txn_skipped": False}
    if txn is not None:
        last = ledger.last_txn(str(txn[0]))
        if last is not None and int(txn[1]) <= last:
            # replayed work unit (Delta's txn fast path): the epoch's
            # merge already landed — no Spark job, no new version
            summary["txn_skipped"] = True
            return summary
    tag = uuid.uuid4().hex[:12]
    scratch = os.path.join(out_dir, f"_compact-{tag}-src")
    data_dir = os.path.join(out_dir, "data")
    try:
        # Stage the source once: lineage cut + exactly-one evaluation.
        # Target columns are cast to the declared schema; extra
        # source-only columns (CDC metadata) ride along untouched for
        # the condition expressions.
        dtypes = {f.name: f.dataType for f in declared.fields}
        proj = cols if need_full_row else [key]
        staged_cols = ([F.col(c).cast(dtypes[c]).alias(c) for c in proj]
                       + [F.col(c) for c in source.columns
                          if c not in cols])
        (source.select(*staged_cols)
         .filter(F.col(key).isNotNull())
         .write.parquet(scratch))
        src = spark.read.parquet(scratch)
        n_src = src.count()
        summary["n_source_rows"] = int(n_src)
        dups = (src.groupBy(key).count().filter(F.col("count") > 1)
                .limit(1).collect())
        if dups:
            raise ValueError(
                f"MERGE source has duplicate keys (e.g. "
                f"{dups[0][key]!r}): the matched result would be "
                "nondeterministic — dedup the source first")
        if n_src == 0:
            summary["files_untouched"] = sum(
                len((m or {}).get("files") or {})
                for m in committed.values())
            return summary

        # ---- touched-partition / touched-file pruning (delete shape)
        bucketed = (bucket.get("col") == key
                    and bucket.get("fn") in BUCKET_FNS
                    and bucket.get("n_parts"))
        if bucketed:
            fn_name, n_parts = bucket["fn"], int(bucket["n_parts"])

            def _bucket_series(s):
                f = BUCKET_FNS[fn_name]
                return s.map(lambda v: f(v, n_parts)).astype("int32")

            _bucket_of = pandas_udf(_bucket_series, "int")
            ranges = {int(r["part"]): (r["kmin"], r["kmax"]) for r in
                      (src.groupBy(_bucket_of(F.col(key)).alias("part"))
                       .agg(F.min(key).alias("kmin"),
                            F.max(key).alias("kmax")).collect())}
        else:
            r = src.agg(F.min(key).alias("kmin"),
                        F.max(key).alias("kmax")).collect()[0]
            ranges = {int(p): (r["kmin"], r["kmax"]) for p in committed}

        actions: list[dict] = []
        verify_swaps: list[tuple[int, list[str]]] = []
        # scan with PHYSICAL names (what files hold; identity until an
        # ALTER), alias to logical right after each read — the whole
        # merge dataflow below speaks logical names
        from pyspark.sql.types import StructField
        _cm_eff = eff_meta.get("column_mapping") or {}
        pdeclared = StructType([
            StructField(_cm_eff.get(f.name, f.name), f.dataType,
                        f.nullable, f.metadata)
            for f in declared.fields])
        reader = spark.read.schema(pdeclared)
        pkey = physical_name(eff_meta, key)
        cond = F.expr(matched_condition) if matched_condition \
            else F.lit(True)
        mdel = F.expr(matched_delete_condition) \
            if matched_delete_condition else F.lit(False)

        mkey = F.col(f"s.{key}").isNotNull()
        del_hit = F.coalesce(mkey & mdel, F.lit(False))
        upd_hit = F.coalesce(mkey & cond, F.lit(False)) & ~del_hit

        if when_matched is not None:
            # ---- pass 1a: coarse manifest prune (metadata-only).
            # Deliberately loose: the per-bucket [kmin, kmax] interval
            # covers EVERY source key in the bucket (insert keys
            # included), so it only bounds the probe read, never the
            # rewrite set.
            cand_by_part: dict[int, tuple[list[str], dict]] = {}
            for part, marker in sorted(committed.items()):
                files = (marker or {}).get("files") or {}
                if int(part) not in ranges:
                    summary["files_untouched"] += len(files)
                    continue
                kmin, kmax = ranges[int(part)]
                stats = (marker or {}).get("stats") or {}
                cand = [fn for fn in sorted(files)
                        if _file_may_match(stats.get(fn), pkey, "<=", kmax)
                        and _file_may_match(stats.get(fn), pkey, ">=", kmin)]
                summary["files_untouched"] += len(files) - len(cand)
                if cand:
                    cand_by_part[int(part)] = (cand, marker or {})

            # ---- pass 1b: findTouchedFiles — ONE probe job over all
            # coarse candidates (Delta's first MERGE pass): inner-join
            # candidate rows to the source on the key and count clause
            # hits per file via _metadata.file_path. Only files that
            # actually HOLD a matched row get rewritten — a stats
            # false positive (or an interval blown open by unrelated
            # keys) costs a probe read, never a rewrite. The collect
            # is bounded by the candidate-file count.
            touched: dict[int, dict[str, tuple[int, int]]] = {}
            if cand_by_part:
                all_paths, dv_all = [], {}
                for part, (cand, marker) in cand_by_part.items():
                    pdir = os.path.join(data_dir, f"part={part}")
                    all_paths += [os.path.join(pdir, f) for f in cand]
                    for fn, rows_ in (marker.get("dv") or {}).items():
                        if fn in cand:
                            dv_all[os.path.join(pdir, fn)] = rows_
                t_all = _apply_dv(spark, reader.parquet(*all_paths),
                                  dv_all)
                fparts = F.split(F.col("_metadata.file_path"), "/")
                t_all = to_logical(t_all.withColumn(
                    "__path", F.concat_ws(
                        "/", F.element_at(fparts, -2),
                        F.element_at(fparts, -1))), eff_meta)
                for r in (t_all.alias("t")
                          .join(src.alias("s"),
                                F.col(f"t.{key}") == F.col(f"s.{key}"),
                                "inner")
                          .groupBy("__path")
                          .agg(F.sum(F.when(del_hit, 1).otherwise(0))
                               .alias("d"),
                               F.sum(F.when(upd_hit, 1).otherwise(0))
                               .alias("u"))
                          .filter((F.col("d") + F.col("u")) > 0)
                          .collect()):
                    pstr, fn = r["__path"].split("/", 1)
                    touched.setdefault(int(pstr.split("=", 1)[1]),
                                       {})[fn] = (int(r["d"]),
                                                  int(r["u"]))
            for part, (cand, _m) in cand_by_part.items():
                hit = touched.get(part, {})
                summary["files_untouched"] += len(cand) - len(hit)

            # ---- pass 2: rewrite EXACTLY the touched files, per
            # partition (the swap unit of the log protocol). Rewrites
            # are independent per partition, so they run as CONCURRENT
            # Spark jobs from a driver thread pool — staged files are
            # invisible until the single commit below, so concurrency
            # never weakens atomicity.
            def _rewrite_part(part: int) -> dict:
                _cand, marker = cand_by_part[part]
                tfiles = sorted(touched[part])
                n_del = sum(d for d, _ in touched[part].values())
                n_upd = sum(u for _, u in touched[part].values())
                files = marker.get("files") or {}
                pdir = os.path.join(data_dir, f"part={part}")
                paths = [os.path.join(pdir, f) for f in tfiles]
                dv = {f: rows_ for f, rows_ in
                      (marker.get("dv") or {}).items() if f in tfiles}
                before = sum(int(files[f].get("n_rows", 0))
                             for f in tfiles) \
                    - sum(len(v) for v in dv.values())
                t = to_logical(_apply_dv(
                    spark, reader.parquet(*paths),
                    {os.path.join(pdir, f): r for f, r in dv.items()}),
                    eff_meta)
                j = t.alias("t").join(
                    src.alias("s"),
                    F.col(f"t.{key}") == F.col(f"s.{key}"), "left")
                if when_matched == "update":
                    out = j.filter(~del_hit).select(*[
                        F.when(upd_hit, F.col(f"s.{c}"))
                        .otherwise(F.col(f"t.{c}")).alias(c)
                        for c in cols])
                    expect = before - n_del
                else:  # delete: upd_hit marks the rows to remove
                    out = j.filter(~upd_hit) \
                        .select(*[F.col(f"t.{c}").alias(c) for c in cols])
                    expect = before - n_upd
                staging = os.path.join(out_dir,
                                       f"_compact-{tag}-p{part}")
                (to_physical(out, eff_meta)
                 .coalesce(max(1, len(tfiles))).write.parquet(staging))
                man, new_stats, after, i = {}, {}, 0, 0
                for f in sorted(os.listdir(staging)):
                    if not f.endswith(".parquet"):
                        continue
                    fsrc = os.path.join(staging, f)
                    rows = pq.ParquetFile(fsrc).metadata.num_rows
                    if rows == 0:
                        continue
                    newname = f"merge-{tag}-{part}-{i:05d}.parquet"
                    man[newname] = {"n_rows": int(rows),
                                    "n_bytes": os.path.getsize(fsrc)}
                    new_stats[newname] = file_column_stats(
                        fsrc, stats_columns(eff_meta))
                    after += int(rows)
                    os.replace(fsrc, os.path.join(pdir, newname))
                    i += 1
                shutil.rmtree(staging, ignore_errors=True)
                if after != expect:
                    raise RuntimeError(
                        f"merge rewrite of part {part} produced {after} "
                        f"rows where the probe predicted {expect} "
                        f"({before} before, {n_del} clause deletes, "
                        f"{n_upd} updates); aborted, table unchanged")
                return {"part": part, "tfiles": tfiles, "man": man,
                        "stats": new_stats, "n_del": n_del,
                        "n_upd": n_upd}

            if touched:
                from concurrent.futures import ThreadPoolExecutor
                with ThreadPoolExecutor(
                        max_workers=min(8, len(touched))) as pool:
                    results = list(pool.map(_rewrite_part,
                                            sorted(touched)))
                from datetime import datetime, timezone
                now = datetime.now(timezone.utc).isoformat()
                for r in results:   # deterministic action order
                    if when_matched == "update":
                        summary["rows_updated"] += r["n_upd"]
                        summary["rows_deleted"] += r["n_del"]
                    else:
                        summary["rows_deleted"] += r["n_upd"]
                    actions.append({"type": "delete", "part": r["part"],
                                    "remove_files": r["tfiles"],
                                    "add_files": r["man"],
                                    "stats": r["stats"],
                                    "updated_at": now})
                    verify_swaps.append((r["part"], r["tfiles"]))
                    summary["files_rewritten"] += len(r["tfiles"])
                    summary["parts_touched"].append(r["part"])

        if when_not_matched == "insert":
            # one anti join against the key column only (column-pruned
            # scan of the whole table — the unavoidable full-key pass)
            from .checkpoint import read_committed
            tkeys = read_committed(spark, out_dir, backend) \
                .select(key).filter(F.col(key).isNotNull())
            ins = src.alias("s")
            if not_matched_condition:
                ins = ins.filter(F.expr(not_matched_condition))
            ins = ins.join(tkeys, [key], "left_anti").select(*cols)
            if bucketed:
                ins = ins.withColumn(
                    "part", _bucket_of(F.col(key)).cast("int"))
            else:
                home = max((int(p) for p in committed), default=0)
                ins = ins.withColumn("part", F.lit(int(home)))
            staging = os.path.join(out_dir, f"_compact-{tag}-ins")
            (to_physical(ins, eff_meta)
             .repartition("part").write.partitionBy("part")
             .parquet(staging))
            from datetime import datetime, timezone
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
                    newname = f"merge-{tag}-ins-{part}-{i:05d}.parquet"
                    man[newname] = {"n_rows": int(rows),
                                    "n_bytes": os.path.getsize(fsrc)}
                    new_stats[newname] = file_column_stats(
                        fsrc, stats_columns(eff_meta))
                    n_rows += int(rows)
                    os.replace(fsrc, os.path.join(pdir, newname))
                    i += 1
                if not man:
                    continue
                actions.append({"type": "add_files", "part": part,
                                "files": man, "n_rows": n_rows,
                                "run_id": f"merge-{tag}",
                                "stats": new_stats,
                                "updated_at": datetime.now(
                                    timezone.utc).isoformat()})
                summary["rows_inserted"] += n_rows
                summary["files_added"] += len(man)
                if part not in summary["parts_touched"]:
                    summary["parts_touched"].append(part)
            shutil.rmtree(staging, ignore_errors=True)

        if not actions:
            return summary
        cons = dict(meta.get("constraints") or {})
        if cons:
            # CHECK enforcement: validate every staged/placed output
            # file BEFORE the commit publishes (violation → abort, the
            # placed files are vacuum-able orphans). Rewritten
            # survivors re-validate for free — the table is fully
            # valid by induction (add_constraint scanned existing
            # rows), so only genuinely new values can fail.
            from .constraints import check_df, check_files
            new_paths = [
                os.path.join(data_dir, f"part={a['part']}", fn)
                for a in actions if a["type"] in ("delete", "add_files")
                for fn in (a.get("add_files") or a.get("files") or {})]
            if eff_meta.get("column_mapping") and new_paths:
                # constraint expressions speak logical names; placed
                # files hold physical — validate through the aliasing
                check_df(to_logical(spark.read.parquet(*new_paths),
                                    eff_meta),
                         cons, where=" by MERGE")
            else:
                check_files(spark, new_paths, cons, where=" by MERGE")
        if schema_action is not None:
            # the widened schema and the data that needs it land in
            # ONE version (Delta commits metaData + adds together); a
            # no-op merge never evolves the schema
            actions.insert(0, schema_action)
        if txn is not None:
            # the idempotence mark rides the SAME atomic version as the
            # merge: a crash can never record the txn without the data
            # or the data without the txn
            actions.append({"type": "txn", "app_id": str(txn[0]),
                            "txn_version": int(txn[1])})
        ver = ledger.merge_commit(actions)
        summary["version"] = int(ver)
        summary["parts_touched"].sort()
        # Optimistic-concurrency check (Delta raises on MERGE-vs-
        # OPTIMIZE): every swap must have applied — each removed file
        # still referenced at ver-1 — else replay silently ignored it.
        for part, cand in verify_swaps:
            prev_files = set(((ledger.committed(version=ver - 1)
                               .get(int(part)) or {}).get("files") or {}))
            if not set(cand) <= prev_files:
                raise ConcurrentMergeError(
                    f"MERGE v{ver} conflicted on part {part}: files "
                    f"{sorted(set(cand) - prev_files)} were replaced by "
                    "a concurrent rewrite and the swap was ignored — "
                    "retry the merge (inserts that landed re-match as "
                    "same-value updates)")
        return summary
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
