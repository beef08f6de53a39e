"""Continuous crawl ingestion: WARC archives land in a directory (the
shape a fetch fleet produces), each micro-batch parses the NEW
archives, extracts documents, shapes them as transcripts, scores them
through the full quality pipeline, and appends only never-seen
conversations to the committed table — the end-to-end crawl→curate
stream built from pieces that are each individually proven:

* source: Structured Streaming `binaryFile` file source — archives as
  the delivery unit, admission-controlled via maxFilesPerTrigger (the
  A17 rate-limiter analogue);
* parse: `warc.parse_files_df` + `records_to_documents` — the same
  Arrow lane as the batch scan; corrupt archives yield quarantine
  rows, never task failures (collected per epoch in `summaries`);
* shape: `ingest.docs_to_transcripts` — one document = one
  conversation, narrow posexplode;
* sink: `incremental.append_batch_df` — scored, content-deduped,
  txn-marked append (exactly-once layered as in append_stream.py);
* resilience: optional `CooldownPolicy` wraps the epoch sink (A20).

Delivery-unit contract: an archive must be fully written before it
appears in the watched directory (write-then-rename, the standard
crawler handoff) — the file source snapshots a file once.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from ..checkpoint import create_table, run_fingerprint
from ..incremental import append_batch_df
from ..ingest import docs_to_transcripts
from ..warc import parse_files_df, records_to_documents

BINARY_FILE_SCHEMA = ("path string, modificationTime timestamp, "
                      "length long, content binary")


def run_warc_stream(spark: SparkSession, input_dir: str, out_dir: str,
                    checkpoint_dir: str, available_now: bool = True,
                    max_files_per_trigger: int | None = None,
                    trigger_interval: str | None = None,
                    cooldown=None, min_chars: int = 1,
                    params: dict | None = None,
                    expectations=None, expect_mode: str = "quarantine"):
    """Drain (available_now) or follow a WARC landing directory into
    the committed transcripts table. Returns (query, summaries);
    each epoch summary carries the append counters plus
    `archives_in` / `archive_errors` (the quarantine count).

    expectations: optional [(name, pass_condition), ...] evaluated on
    the transcripts-shaped batch BEFORE the scored append (the
    DLT-style streaming gate): `drop` discards violators, `warn`
    annotates nothing stream-side (counts only), `quarantine` writes
    violators (with the rules each broke) to
    `<out_dir>_quarantine/epoch=N/` and the summary carries
    `rows_quarantined` per epoch. `fail` stops the stream — the
    strict-ingest policy."""
    create_table(out_dir)  # CREATE TABLE IF NOT EXISTS (commitlog)
    r = spark.readStream.format("binaryFile").schema(BINARY_FILE_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = r.load(input_dir)

    summaries: list[dict] = []

    def _sink(batch_df, epoch_id: int) -> None:
        recs = parse_files_df(batch_df).cache()
        try:
            n_archives = batch_df.count()
            errors = (recs.filter(F.col("warc_error").isNotNull())
                      .select("archive", "warc_error").collect())
            docs = records_to_documents(recs, min_chars=min_chars)
            turns = docs_to_transcripts(docs)
            n_quarantined, n_flagged = 0, 0
            if expectations:
                from ..expectations import FAILED_COL, apply_expectations
                r = apply_expectations(turns, expectations,
                                       mode=expect_mode)
                turns = r["passed"]
                if expect_mode == "warn":
                    # stream-side warn: count violators, append clean
                    # schema (the annotation column must not land in
                    # the committed table)
                    n_flagged = turns.filter(
                        F.size(F.col(FAILED_COL)) > 0).count()
                    turns = turns.drop(FAILED_COL)
                if r["quarantined"] is not None:
                    held = r["quarantined"].cache()
                    try:
                        n_quarantined = held.count()
                        if n_quarantined:
                            qdir = (out_dir.rstrip("/") + "_quarantine/"
                                    f"epoch={int(epoch_id)}")
                            held.write.mode("overwrite").parquet(qdir)
                    finally:
                        held.unpersist()
            run_id = run_fingerprint(input_dir, {"kind": "warc-stream",
                                                 "epoch": int(epoch_id),
                                                 **(params or {})})
            s = append_batch_df(batch_df.sparkSession, turns, out_dir,
                                run_id=run_id,
                                input_desc=f"{input_dir}#epoch={epoch_id}",
                                params={"epoch": int(epoch_id),
                                        **(params or {})},
                                txn=(f"warc-stream:{checkpoint_dir}",
                                     int(epoch_id)))
            s["epoch"] = int(epoch_id)
            s["rows_quarantined"] = int(n_quarantined)
            s["rows_flagged"] = int(n_flagged)
            s["archives_in"] = int(n_archives)
            s["archive_errors"] = [
                {"archive": e["archive"], "error": e["warc_error"]}
                for e in errors]
            summaries.append(s)
        finally:
            recs.unpersist()

    sink = _sink
    if cooldown is not None:
        from .cooldown import with_cooldown
        sink = with_cooldown(_sink, cooldown)

    w = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", checkpoint_dir))
    if available_now:
        w = w.trigger(availableNow=True)
    elif trigger_interval:
        w = w.trigger(processingTime=trigger_interval)
    q = w.start()
    if available_now:
        q.awaitTermination()
    return q, summaries
