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


def _part_rows_on_disk(out_dir: str, part: int) -> int | None:
    """Row count of a committed partition from parquet FOOTERS only —
    no data read, driver-side metadata I/O (the reference's cheap
    line-count reconciliation, base_request_processor.py:413-426).
    With a real table catalog this comes from snapshot manifests."""
    import pyarrow.parquet as pq
    d = os.path.join(out_dir, "data", f"part={part}")
    if not os.path.isdir(d):
        return None
    n = 0
    for fn in os.listdir(d):
        if fn.endswith(".parquet"):
            try:
                n += pq.ParquetFile(os.path.join(d, fn)).metadata.num_rows
            except Exception:  # truncated/corrupt file → fail validation
                return None
    return n


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
        try:
            with open(os.path.join(ld, f"part-{part}.json")) as f:
                marker = json.load(f)
            expected = int(marker["n_rows"])
        except Exception:
            expected = -1  # unreadable marker → recompute
        if _part_rows_on_disk(out_dir, part) == expected:
            valid.add(part)
        else:
            os.remove(os.path.join(ld, f"part-{part}.json"))
            invalid.add(part)
    return valid, invalid


def _commit_part(out_dir: str, run_id: str, part: int, n_rows: int) -> None:
    d = _ledger_dir(out_dir)
    os.makedirs(d, exist_ok=True)
    marker = {
        "run_id": run_id, "part": int(part), "status": "COMMITTED",
        "n_rows": int(n_rows),
        "updated_at": datetime.now(timezone.utc).isoformat(),
    }
    tmp = os.path.join(d, f".part-{part}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(marker, f)
    os.replace(tmp, os.path.join(d, f"part-{part}.json"))  # atomic commit


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
    raise BEFORE committing this invocation's partition markers when
    any processed row is an error row (invalid role), leaving the run
    incomplete so a rerun reprocesses those partitions; the written
    data files remain on disk for inspection exactly like the
    reference's response files.

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
        # Resume anti-join, expressed as partition pruning: the filter on
        # the `part` bucket column reaches the parquet scan (PushedFilters)
        # so committed partitions are never read, let alone recomputed.
        pending = transcripts.filter(F.col("part").isin([int(p) for p in todo]))
        scratch = None
        if staged:
            # production shape: durably materialize the scored stage
            # once (the expensive Python pass), feed the aggregation and
            # the final join from column-pruned re-scans — ~2× the
            # throughput of the in-memory persist shape at 32 cores.
            # Scratch path is scoped per (run, shard): concurrent
            # only_parts shards of one run must not overwrite each
            # other's scored stage mid-scan.
            shard = hashlib.md5(",".join(map(str, todo)).encode()).hexdigest()[:8]
            scratch = os.path.join(out_dir, f"_scored-{run_id}-{shard}")
            result = run_pipeline_staged(
                spark, pending, scratch,
                broadcast_conv_aggs=broadcast_conv_aggs)
        else:
            result = run_pipeline_df(pending,
                                     broadcast_conv_aggs=broadcast_conv_aggs)

        # Dynamic partition overwrite → idempotent re-runs: a partition
        # half-written by a crashed attempt is replaced wholesale. Safe
        # because conversations never span parts (part = bucket(conv_id)),
        # so per-part recompute sees whole conversations.
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
         .option("partitionOverwriteMode", "dynamic")
         .parquet(os.path.join(out_dir, "data")))

        # Per-part metrics from the materialized output (column-pruned scan).
        written = spark.read.parquet(os.path.join(out_dir, "data")).filter(
            F.col("part").isin([int(p) for p in todo]))
        mrows = (
            written.groupBy("part").agg(
                F.count(F.lit(1)).alias("n_in"),
                F.sum(F.col("keep").cast("long")).alias("n_kept"),
                F.sum((F.col("scrubbed_text") != F.col("text")).cast("long"))
                .alias("n_scrubbed"),
                F.sum((~F.col("role_valid")).cast("long")).alias("n_errors"),
                F.sum("n_tokens").alias("n_tokens"),
            ).collect()
        )
        wall_ms = int((time.monotonic() - t0) * 1000)
        metrics_rows = [
            (run_id, int(r.part), int(r.n_in), int(r.n_kept), int(r.n_scrubbed),
             int(r.n_errors), int(r.n_tokens), wall_ms)
            for r in mrows
        ]
        spark.createDataFrame(metrics_rows, schema.METRICS_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(os.path.join(out_dir, "_metrics"))

        if strict:
            n_err = sum(int(r.n_errors) for r in mrows)
            if n_err:
                raise RuntimeError(
                    f"strict mode: {n_err} error rows across parts "
                    f"{sorted(int(r.part) for r in mrows if r.n_errors)}; "
                    "no partitions committed this invocation")

        for r in mrows:
            _commit_part(out_dir, run_id, int(r.part), int(r.n_in))

        if scratch is not None:
            import shutil
            shutil.rmtree(scratch, ignore_errors=True)

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
