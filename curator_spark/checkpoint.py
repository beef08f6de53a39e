"""Per-partition checkpointing, resume, lineage, and metrics — the
curator crown jewels re-expressed for Spark (SURVEY.md §7 step 6).

Reference parity:
* run-level memoization via fingerprint (reference: src/bespokelabs/
  curator/llm/llm.py:138-163, base_request_processor.py:282-303) →
  deterministic run_id + short-circuit when the run marker exists;
* resume by skipping completed work (reference:
  base_request_processor.py:438-481 validate_existing_response_file) →
  skip partitions that have a ledger commit marker;
* batch lifecycle state machine persisted after every transition
  (reference: batch_status_tracker.py:308-360, batch_objects.jsonl) →
  one JSON marker file per committed partition, written AFTER the data
  (write-data-then-marker ordering makes a crash between the two safe:
  the partition is rewritten by dynamic partition overwrite on resume);
* counter metrics (reference: online_status_tracker.py:40-78) → a
  per-(run, part) metrics parquet table;
* lineage rows in SQLite (reference: db.py:78-131) → _meta/run_*.json.

Output layout (an Iceberg-commit stand-in; swap for a real catalog by
replacing _write_partitions + marker files with table.append snapshots):

  out_dir/
    data/part=K/*.parquet     scored+filtered turns
    _ledger/part-K.json       commit marker: {run_id, part, status, n_rows}
    _metrics/*.parquet        METRICS_SCHEMA rows
    _meta/run_<id>.json       lineage
    _scored-<run>-<shard>/    transient staged scoring scratch (scoped
                              per invocation so concurrent only_parts
                              shards never clobber each other; removed
                              after the shard's commits land)
    _SUCCESS_RUN              whole-run completion marker (memoization)

Resume re-validates every committed partition (footer row counts vs
ledger n_rows) before trusting its marker; mismatches recompute that
partition (reference: base_request_processor.py:120-167).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import rules, schema
from .pipeline import run_pipeline_df, run_pipeline_staged

WRITE_SALTS = 8  # max output files per `part` from one run


def run_fingerprint(input_path: str, params: dict | None = None) -> str:
    """Deterministic run id from (input, rule constants, code params) —
    the analogue of the reference's xxh64 fingerprint chain."""
    basis = {
        "input": input_path,
        "rules": {
            "scrub": rules.SCRUB_PATTERNS,
            "max_ppl": rules.MAX_PPL,
            "conv_max_mean_ppl": rules.CONV_MAX_MEAN_PPL,
            "allowed_langs": sorted(rules.ALLOWED_LANGS),
        },
        "params": params or {},
    }
    return hashlib.md5(json.dumps(basis, sort_keys=True, default=str).encode()).hexdigest()[:16]


def _ledger_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_ledger")


def committed_parts(out_dir: str) -> set[int]:
    d = _ledger_dir(out_dir)
    if not os.path.isdir(d):
        return set()
    parts = set()
    for fn in os.listdir(d):
        if fn.startswith("part-") and fn.endswith(".json"):
            parts.add(int(fn[len("part-"):-len(".json")]))
    return parts


def part_manifest(out_dir: str, part: int) -> dict | None:
    """{file name: {n_rows, n_bytes}} for a committed partition, read
    from parquet footers + stat — no data I/O. None if the partition
    dir is missing or any file is unreadable/truncated."""
    import pyarrow.parquet as pq
    d = os.path.join(out_dir, "data", f"part={part}")
    if not os.path.isdir(d):
        return None
    out: dict = {}
    for fn in sorted(os.listdir(d)):
        if fn.endswith(".parquet"):
            fp = os.path.join(d, fn)
            try:
                out[fn] = {"n_rows": pq.ParquetFile(fp).metadata.num_rows,
                           "n_bytes": os.path.getsize(fp)}
            except Exception:  # truncated/corrupt file → fail validation
                return None
    return out


def revalidate_committed(out_dir: str) -> tuple[set[int], set[int]]:
    """Cache-integrity verification on resume (reference:
    base_request_processor.py:120-167 — per chunk: files exist, counts
    reconcile, else regenerate THAT chunk). For each ledger marker,
    compare its recorded n_rows against the partition's on-disk footer
    row count; on mismatch/corruption delete the marker so the part is
    recomputed. Returns (valid, invalidated)."""
    ld = _ledger_dir(out_dir)
    valid: set[int] = set()
    invalid: set[int] = set()
    for part in sorted(committed_parts(out_dir)):
        marker = None
        try:
            with open(os.path.join(ld, f"part-{part}.json")) as f:
                marker = json.load(f)
        except Exception:
            pass  # unreadable marker → recompute
        on_disk = part_manifest(out_dir, part)
        ok = False
        if marker is not None and on_disk is not None:
            if "files" in marker:
                # file-level check: exact file set + per-file row counts
                # and sizes — catches a same-rowcount file swap that a
                # bare partition total would miss
                ok = marker["files"] == on_disk
            else:  # marker from an older layout: row-count reconcile
                ok = (int(marker.get("n_rows", -1))
                      == sum(f["n_rows"] for f in on_disk.values()))
        if ok:
            valid.add(part)
        else:
            os.remove(os.path.join(ld, f"part-{part}.json"))
            invalid.add(part)
    return valid, invalid


def _commit_part(out_dir: str, run_id: str, part: int, n_rows: int) -> None:
    marker = {
        "run_id": run_id, "part": int(part), "status": "COMMITTED",
        "n_rows": int(n_rows),
        # file-level manifest (name → rows/bytes from footers): the
        # commit records exactly which files constitute the partition,
        # so resume validation detects swapped/extra/missing files even
        # when totals happen to agree
        "files": part_manifest(out_dir, part),
        "updated_at": datetime.now(timezone.utc).isoformat(),
    }
    d = _ledger_dir(out_dir)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".part-{part}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(marker, f)
    os.replace(tmp, os.path.join(d, f"part-{part}.json"))  # atomic commit


def _gc_stale_scratch(out_dir: str) -> None:
    """Remove _scored-* scratch dirs whose owning process is gone.

    Scratch kept by a strict stop or a mid-publish failure would
    otherwise accumulate forever (shard names carry a per-call nonce, so
    no later invocation reuses them). Each scratch root records its
    owner PID; a dir stays inspectable while its owner lives and is
    swept by the first invocation that runs after the owner exits.
    (PID checks are host-local: in cluster deployments the driver owns
    all scratch under its out_dir, so this holds.)"""
    import shutil
    for name in os.listdir(out_dir) if os.path.isdir(out_dir) else []:
        if not name.startswith("_scored-"):
            continue
        d = os.path.join(out_dir, name)
        try:
            with open(os.path.join(d, "OWNER")) as f:
                pid = int(f.read().strip())
            os.kill(pid, 0)          # raises if the process is gone
            alive = True
        except PermissionError:
            alive = True             # exists, owned by another user
        except (OSError, ValueError):
            alive = False
        if not alive:
            shutil.rmtree(d, ignore_errors=True)


def _append_metrics(out_dir: str, run_id: str, shard: str,
                    mrows, wall_ms: int) -> None:
    """Append the per-part counter rows as ONE uniquely-named parquet
    file written driver-side (pyarrow, tmp+rename): metrics are a
    handful of rows per invocation — a Spark write job would be pure
    overhead AND its shared committer staging dir (_temporary/0) is
    what concurrent shards would collide on. Schema matches
    METRICS_SCHEMA so spark.read.parquet unions all shards' files."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    mdir = os.path.join(out_dir, "_metrics")
    os.makedirs(mdir, exist_ok=True)
    tbl = pa.table({
        "run_id": pa.array([run_id] * len(mrows), pa.string()),
        "part": pa.array([int(r.part) for r in mrows], pa.int32()),
        "n_in": pa.array([int(r.n_in) for r in mrows], pa.int64()),
        "n_kept": pa.array([int(r.n_kept) for r in mrows], pa.int64()),
        "n_scrubbed": pa.array([int(r.n_scrubbed) for r in mrows], pa.int64()),
        "n_errors": pa.array([int(r.n_errors) for r in mrows], pa.int64()),
        "n_tokens": pa.array([int(r.n_tokens) for r in mrows], pa.int64()),
        "wall_ms": pa.array([wall_ms] * len(mrows), pa.int64()),
    })
    final = os.path.join(mdir, f"metrics-{run_id}-{shard}.parquet")
    # dot-prefixed tmp: hidden from Spark's file listing, so a crash
    # mid-write can never poison subsequent _metrics reads
    tmp = os.path.join(mdir, f".metrics-{run_id}-{shard}.parquet.tmp")
    pq.write_table(tbl, tmp)
    os.replace(tmp, final)


def run_checkpointed(spark: SparkSession, input_path: str, out_dir: str,
                     params: dict | None = None,
                     only_parts: list[int] | None = None,
                     broadcast_conv_aggs: bool | None = None,
                     staged: bool = True,
                     strict: bool = False) -> dict:
    """Execute the pipeline with per-partition commit + resume.

    only_parts limits this invocation to a subset of partitions — used
    by tests to simulate a crash after k commits (and in production to
    shard a run across jobs).

    strict: fail-all policy (reference require_all_responses,
    base_request_processor.py:398-426 — a run with missing/failed
    responses raises instead of shipping a partial dataset). Here:
    raise BEFORE publishing to data/, appending metrics, or committing
    any marker when a processed row is an error row (invalid role), so
    a rerun reprocesses cleanly with nothing double-counted; the staged
    output is kept in the invocation's scratch dir for inspection
    (path in the error message), like the reference's response files.

    Returns a summary dict {run_id, parts_committed, parts_skipped,
    parts_invalidated, wall_ms, memoized}.
    """
    t0 = time.monotonic()
    run_id = run_fingerprint(input_path, params)
    os.makedirs(out_dir, exist_ok=True)
    success_marker = os.path.join(out_dir, "_SUCCESS_RUN")

    # Whole-run memoization: same fingerprint + completed marker → no-op.
    if os.path.exists(success_marker):
        with open(success_marker) as f:
            prev = json.load(f)
        if prev.get("run_id") == run_id:
            return {"run_id": run_id, "parts_committed": 0,
                    "parts_skipped": prev.get("n_parts", 0),
                    "parts_invalidated": 0,
                    "wall_ms": 0, "memoized": True}

    transcripts = spark.read.schema(schema.TRANSCRIPTS_SCHEMA).parquet(input_path)

    all_parts = sorted(
        r.part for r in transcripts.select("part").distinct().collect()
    )
    # Resume trusts no marker blindly: each committed partition's footer
    # row count must reconcile with its ledger n_rows, else its marker
    # is dropped and the partition recomputes (reference cache-integrity
    # verifier, base_request_processor.py:120-167).
    done, invalidated = revalidate_committed(out_dir)
    todo = [p for p in all_parts if p not in done]
    if only_parts is not None:
        todo = [p for p in todo if p in set(only_parts)]

    if todo:
        import shutil

        # Resume anti-join, expressed as partition pruning: the filter on
        # the `part` bucket column reaches the parquet scan (PushedFilters)
        # so committed partitions are never read, let alone recomputed.
        pending = transcripts.filter(F.col("part").isin([int(p) for p in todo]))
        # Invocation-scoped scratch root: run id + todo set + a per-call
        # nonce, so concurrent shards of one run — even two launched
        # with the SAME only_parts from the same process — never share
        # staging paths.
        import uuid
        _gc_stale_scratch(out_dir)  # sweep debris of dead invocations
        shard = hashlib.md5(
            f"{','.join(map(str, todo))}|{uuid.uuid4().hex}".encode()
        ).hexdigest()[:8]
        scratch_root = os.path.join(out_dir, f"_scored-{run_id}-{shard}")
        os.makedirs(scratch_root, exist_ok=True)
        with open(os.path.join(scratch_root, "OWNER"), "w") as f:
            f.write(str(os.getpid()))
        stage_out = os.path.join(scratch_root, "out")
        keep_scratch = False
        try:
            if staged:
                # production shape: durably materialize the scored stage
                # once (the expensive Python pass), feed the aggregation and
                # the final join from column-pruned re-scans — ~2× the
                # throughput of the in-memory persist shape at 32 cores.
                result = run_pipeline_staged(
                    spark, pending, os.path.join(scratch_root, "scored"),
                    broadcast_conv_aggs=broadcast_conv_aggs)
            else:
                result = run_pipeline_df(pending,
                                         broadcast_conv_aggs=broadcast_conv_aggs)

            # Stage THIS shard's output under its own scratch root (no two
            # concurrent jobs ever share a Hadoop committer staging dir),
            # then publish each finished partition into data/ with an
            # atomic directory swap. Disjoint todo sets → disjoint swaps,
            # so concurrent shards are safe; a crash mid-publish leaves
            # each partition either fully old or fully new (and an
            # unpublished partition has no marker → recomputes).
            #
            # Salted repartition before the partitioned write: without it,
            # every upstream task can hold rows of every part, producing
            # n_tasks × n_parts tiny files (10^7 at cluster scale). Hashing
            # on (part, salt) lands each part in ≤ WRITE_SALTS partitions —
            # bounded file count AND no single-task serialization of a huge
            # part.
            n_out = max(len(todo) * WRITE_SALTS, 8)
            (result.repartition(n_out, F.col("part"),
                                F.pmod(F.col("turn_idx"), F.lit(WRITE_SALTS)))
             .write.mode("overwrite").partitionBy("part")
             .parquet(stage_out))

            # Per-part metrics from the staged output (column-pruned scan).
            mrows = (
                spark.read.parquet(stage_out).groupBy("part").agg(
                    F.count(F.lit(1)).alias("n_in"),
                    F.sum(F.col("keep").cast("long")).alias("n_kept"),
                    F.sum((F.col("scrubbed_text") != F.col("text")).cast("long"))
                    .alias("n_scrubbed"),
                    F.sum((~F.col("role_valid")).cast("long")).alias("n_errors"),
                    F.sum("n_tokens").alias("n_tokens"),
                ).collect()
            )

            # Fail-all policy: raise BEFORE metrics append and marker
            # commit, so a strict failure leaves no trace to double-count
            # on the rerun; the staged output stays on disk (in scratch)
            # for inspection like the reference's response files.
            if strict:
                n_err = sum(int(r.n_errors) for r in mrows)
                if n_err:
                    keep_scratch = True
                    raise RuntimeError(
                        f"strict mode: {n_err} error rows across parts "
                        f"{sorted(int(r.part) for r in mrows if r.n_errors)}; "
                        "no partitions committed this invocation "
                        f"(staged output kept at {stage_out})")

            # Publish: atomic per-partition swap into data/, then metrics,
            # then markers — any prefix of this sequence is recoverable
            # (an unpublished/half-published partition has no marker, so
            # a rerun recomputes it; scratch is preserved once publish
            # begins so new rows are never the casualty of a failed
            # rename). The displaced old dir is parked under a
            # dot-prefixed name, which Spark's partition discovery
            # ignores — readers never see a bogus 'part=N.old' value.
            data_dir = os.path.join(out_dir, "data")
            os.makedirs(data_dir, exist_ok=True)
            keep_scratch = True  # publish started: scratch holds new data
            for p in todo:
                src = os.path.join(stage_out, f"part={int(p)}")
                if not os.path.isdir(src):
                    continue  # partition had zero rows this run
                dst = os.path.join(data_dir, f"part={int(p)}")
                tmp_old = os.path.join(data_dir, f".old-part={int(p)}")
                shutil.rmtree(tmp_old, ignore_errors=True)  # stale crash debris
                if os.path.isdir(dst):
                    os.replace(dst, tmp_old)
                os.replace(src, dst)
                shutil.rmtree(tmp_old, ignore_errors=True)

            wall_ms = int((time.monotonic() - t0) * 1000)
            _append_metrics(out_dir, run_id, shard, mrows, wall_ms)

            for r in mrows:
                _commit_part(out_dir, run_id, int(r.part), int(r.n_in))
            keep_scratch = False  # fully published + committed
        finally:
            # scratch is removed on full success and on pre-publish
            # failure; it is KEPT when (a) strict mode stopped the run
            # (inspectable analogue of the reference's retained response
            # files — the error names the path) or (b) a failure hit
            # mid-publish, where scratch holds the only copy of rows not
            # yet swapped in (the rerun recomputes those markerless
            # partitions either way)
            if not keep_scratch:
                shutil.rmtree(scratch_root, ignore_errors=True)

    # Lineage row (reference: db.py store_metadata upsert).
    meta_dir = os.path.join(out_dir, "_meta")
    os.makedirs(meta_dir, exist_ok=True)
    with open(os.path.join(meta_dir, f"run_{run_id}.json"), "w") as f:
        json.dump({
            "run_id": run_id, "input": input_path, "params": params or {},
            "created_at": datetime.now(timezone.utc).isoformat(),
            "parts_committed_now": todo, "parts_skipped": sorted(done),
        }, f, indent=2)

    # Whole-run marker whenever ALL parts are committed — including when
    # the final commit arrived via a sharded only_parts invocation, so
    # the production sharding path still gets run-level memoization.
    if set(all_parts) <= committed_parts(out_dir):
        with open(success_marker, "w") as f:
            json.dump({"run_id": run_id, "n_parts": len(all_parts)}, f)

    return {"run_id": run_id, "parts_committed": len(todo),
            "parts_skipped": len(done),
            "parts_invalidated": len(invalidated),
            "wall_ms": int((time.monotonic() - t0) * 1000), "memoized": False}


def run_cost(spark: SparkSession, out_dir: str,
             usd_per_1k_tokens: float = 0.002) -> DataFrame:
    """Cost accounting over the run's usage counters (reference: per-row
    litellm.completion_cost summed by the status tracker,
    base_online_request_processor.py:182-201 /
    online_status_tracker.py:124-126). The deterministic local analogue
    prices the recorded token volume: one row per run_id with token
    totals and derived USD cost — computed at read time from the
    metrics table, so historical runs get priced retroactively under
    any rate."""
    m = spark.read.parquet(os.path.join(out_dir, "_metrics"))
    return (
        m.groupBy("run_id")
        .agg(F.sum("n_in").alias("n_rows"),
             F.sum("n_tokens").alias("n_tokens"))
        .withColumn("cost_usd",
                    F.round(F.col("n_tokens") / 1000.0
                            * F.lit(float(usd_per_1k_tokens)), 6))
    )
