"""Deterministic sharded export: the last-mile sink that turns a
curated table into fixed training shards.

Trainer-facing requirements, each designed for 100 TB:

* **Stable shard membership.** shard = xxhash64(key) mod n_shards — a
  pure column expression, so the SAME row lands in the SAME shard
  regardless of input partitioning, cluster size, or re-runs (unlike
  anything derived from partition ids or monotonically_increasing_id).
  Re-exporting an unchanged table is byte-stable; re-exporting after
  appends only changes the shards whose keys changed.
* **Deterministic bytes within a shard.** Rows sort by (order_cols)
  inside each shard (sortWithinPartitions — a per-task sort over
  ~1/n_shards of the data, never a global sort) and serialize with
  `to_json(struct(...))` — JVM-side, fixed field order, no Python in
  the write path.
* **One pass, no driver data.** The plan is: project → shard column →
  repartition(n_shards, shard) → in-task sort → partitioned write.
  The only shuffle is the one that builds the shards; the manifest's
  per-shard counts and content fingerprints come from ONE map-side-
  combined aggregate over the same shard key, not from re-reading the
  output.
* **Honest verification hook.** The manifest fingerprint is the sum of
  per-row xxhash64 of the serialized JSON line (order-independent,
  overflow-wrapping int64) — a consumer can re-derive it from the
  shard files alone; `verify_export` does exactly that re-derivation
  with Spark and compares.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def _lines(df: DataFrame, cols: list[str]) -> F.Column:
    # fixed field order = deterministic bytes
    return F.to_json(F.struct(*[F.col(c) for c in cols]))


def export_jsonl_shards(df: DataFrame, out_dir: str, n_shards: int,
                        key_col: str, order_cols: list[str] | None = None,
                        columns: list[str] | None = None,
                        incremental: bool = False) -> dict:
    """Write df as n_shards JSONL shard directories
    (`out_dir/shard=K/...`) plus `out_dir/_manifest.json` with
    per-shard row counts and content fingerprints. Returns the
    manifest as a dict (plus `shards_written` — how many were
    physically rewritten).

    incremental=True: diff the freshly-computed per-shard
    fingerprints against the existing manifest and rewrite ONLY the
    shards whose content changed (dynamic partition overwrite —
    untouched shard directories keep their exact files). Because
    membership is a pure function of the key, appends/edits confined
    to few keys touch few shards; the manifest always describes the
    WHOLE table either way, so verify_export stays a full check."""
    cols = columns or df.columns
    order = order_cols or [key_col]
    shard = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards)).cast("int")
    sel = list(dict.fromkeys([*cols, *order, key_col]))
    body = (df.select(*sel)
            .withColumn("__shard", shard)
            .withColumn("__line", _lines(df, cols)))

    # manifest aggregate: one map-side-combined pass, k rows out.
    # Fingerprint = Σ xxhash64(line) as decimal(38,0) (ANSI-safe — a
    # long sum of random 64-bit values overflows), reduced mod 2^64
    # driver-side so the stored value is a stable 64-bit integer.
    man = (body.groupBy("__shard")
           .agg(F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.xxhash64(F.col("__line")).cast("decimal(38,0)"))
                .alias("fp"))
           .collect())
    stats = {int(r["__shard"]): {"n_rows": int(r["n_rows"]),
                                 "fingerprint": int(int(r["fp"]) % (1 << 64))}
             for r in man}

    prev = None
    man_path = os.path.join(out_dir, "_manifest.json")
    if incremental and os.path.exists(man_path):
        with open(man_path) as fh:
            prev = json.load(fh)
        if (prev.get("n_shards") != n_shards
                or prev.get("key_col") != key_col
                or prev.get("columns") != cols):
            prev = None  # spec changed → full rewrite

    if prev is not None:
        changed = [k for k in range(n_shards)
                   if prev["shards"].get(str(k), {})
                   != stats.get(k, {"n_rows": 0, "fingerprint": 0})]
        write = body.filter(F.col("__shard").isin(changed)) \
            if changed else None
        mode_conf = ("spark.sql.sources.partitionOverwriteMode", "dynamic")
        spark = df.sparkSession
        old_mode = spark.conf.get(mode_conf[0], "static")
        if write is not None:
            # a shard that became EMPTY leaves a stale dir under dynamic
            # overwrite (no rows → no partition touched): drop it here
            import shutil
            for k in changed:
                if stats.get(k, {"n_rows": 0})["n_rows"] == 0:
                    shutil.rmtree(os.path.join(out_dir, f"shard={k}"),
                                  ignore_errors=True)
            spark.conf.set(*mode_conf)
            try:
                (write.select(F.col("__shard").alias("shard"), *order,
                              "__line")
                 .repartition(max(1, len(changed)), "shard")
                 .sortWithinPartitions("shard", *order)
                 .select("shard", F.col("__line").alias("value"))
                 .write.partitionBy("shard").mode("overwrite")
                 .text(out_dir))
            finally:
                spark.conf.set(mode_conf[0], old_mode)
        n_written = len(changed)
    else:
        (body.select(F.col("__shard").alias("shard"), *order, "__line")
         .repartition(n_shards, "shard")
         .sortWithinPartitions("shard", *order)
         .select("shard", F.col("__line").alias("value"))
         .write.partitionBy("shard").mode("overwrite").text(out_dir))
        n_written = n_shards

    manifest = {
        "n_shards": n_shards, "key_col": key_col, "columns": cols,
        "total_rows": sum(s["n_rows"] for s in stats.values()),
        "shards": {str(k): stats.get(k, {"n_rows": 0, "fingerprint": 0})
                   for k in range(n_shards)},
    }
    with open(man_path, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    manifest["shards_written"] = n_written
    return manifest


def verify_export(spark: SparkSession, out_dir: str) -> dict:
    """Re-derive every shard's count + fingerprint FROM THE FILES and
    compare to the manifest. Returns {shard: ok} plus 'all_ok'."""
    with open(os.path.join(out_dir, "_manifest.json")) as fh:
        manifest = json.load(fh)
    got = (spark.read.text(os.path.join(out_dir, "shard=*"))
           .withColumn("shard",
                       F.regexp_extract(F.input_file_name(),
                                        r"shard=(\d+)", 1).cast("int"))
           .groupBy("shard")
           .agg(F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.xxhash64(F.col("value")).cast("decimal(38,0)"))
                .alias("fp"))
           .collect())
    derived = {int(r["shard"]): (int(r["n_rows"]),
                                 int(int(r["fp"]) % (1 << 64)))
               for r in got}
    report = {}
    for k, want in manifest["shards"].items():
        if want["n_rows"] == 0:
            report[k] = int(k) not in derived
            continue
        have = derived.get(int(k))
        report[k] = (have is not None and have[0] == want["n_rows"]
                     and have[1] == want["fingerprint"])
    report["all_ok"] = all(report.values())
    return report


WEBDATASET_MANIFEST_SCHEMA = ("shard int, n_samples long, n_bytes long, "
                              "tar_sha256 string, path string")


def export_webdataset(df: DataFrame, out_dir: str, n_shards: int,
                      key_col: str,
                      text_cols: list[str] | None = None,
                      binary_cols: list[str] | None = None,
                      order_cols: list[str] | None = None) -> dict:
    """WebDataset-style tar shard export — the multimodal counterpart
    of `export_jsonl_shards` (trainers stream .tar shards of
    per-sample member files: `{key}.{field}.txt` for text fields,
    `{key}.{field}.bin` for binary payloads, one contiguous group per
    sample — the img2dataset/WebDataset convention).

    Spark-first shape: shard = xxhash64(key) mod n (stable membership,
    exactly as the JSONL exporter), repartition so ONE task owns each
    shard, in-task sort by order_cols, then the task streams its
    samples into `out_dir/shard-%05d.tar` directly from the executor —
    the tar never materializes in memory (tarfile writes member by
    member) and the driver sees only the k-row manifest. tar mtimes
    are pinned to 0 and members stream in sorted order, so shard bytes
    are DETERMINISTIC — the manifest's tar_sha256 is reproducible and
    `_webdataset_manifest.json` verifies a delivered corpus offline
    (sha256sum, no Spark needed).

    On an object store the same kernel writes through the local scratch
    then uploads (or a fsspec file handle); the parallelism and memory
    story is unchanged — one open tar per task, O(1) sample buffering.
    """
    import hashlib
    import io as _io
    import tarfile

    text_cols = text_cols or []
    binary_cols = binary_cols or []
    order = order_cols or [key_col]
    cols = list(dict.fromkeys([key_col, *order, *text_cols, *binary_cols]))
    os.makedirs(out_dir, exist_ok=True)

    shard = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards)).cast("int")
    body = (df.select(*cols).withColumn("__shard", shard)
            .repartition(n_shards, "__shard")
            .sortWithinPartitions("__shard", *order))

    def _write(batches):
        import pandas as pd
        tars: dict[int, tuple] = {}  # shard -> (tarfile, sha, counts)

        def tar_for(k: int):
            if k not in tars:
                path = os.path.join(out_dir, f"shard-{k:05d}.tar")
                sha = hashlib.sha256()

                class _Tee(_io.RawIOBase):
                    def __init__(self, fh):
                        self.fh = fh

                    def write(self, b):  # noqa: A003
                        sha.update(b)
                        return self.fh.write(b)

                    def tell(self):  # tarfile tracks member offsets
                        return self.fh.tell()

                fh = open(path, "wb")
                t = tarfile.open(fileobj=_Tee(fh), mode="w")
                tars[k] = [t, fh, sha, 0, path]
            return tars[k]

        def add(t, name: str, data: bytes):
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            info.mtime = 0  # deterministic bytes
            t.addfile(info, _io.BytesIO(data))

        for b in batches:
            for _, row in b.iterrows():
                ent = tar_for(int(row["__shard"]))
                key = str(row[key_col])
                for c in text_cols:
                    v = row[c]
                    add(ent[0], f"{key}.{c}.txt",
                        ("" if v is None or (isinstance(v, float)
                                             and pd.isna(v))
                         else str(v)).encode("utf-8"))
                for c in binary_cols:
                    v = row[c]
                    add(ent[0], f"{key}.{c}.bin",
                        b"" if v is None else bytes(v))
                ent[3] += 1
        rows = []
        for k, (t, fh, sha, n, path) in sorted(tars.items()):
            t.close()
            fh.close()
            rows.append({"shard": k, "n_samples": n,
                         "n_bytes": os.path.getsize(path),
                         "tar_sha256": sha.hexdigest(), "path": path})
        yield pd.DataFrame(rows, columns=["shard", "n_samples", "n_bytes",
                                          "tar_sha256", "path"])

    man_rows = [r.asDict() for r in
                body.mapInPandas(_write, WEBDATASET_MANIFEST_SCHEMA)
                .collect()]
    manifest = {
        "n_shards": n_shards, "key_col": key_col,
        "text_cols": text_cols, "binary_cols": binary_cols,
        "total_samples": sum(r["n_samples"] for r in man_rows),
        "shards": {str(r["shard"]): {k: r[k] for k in
                                     ("n_samples", "n_bytes", "tar_sha256")}
                   for r in man_rows},
    }
    with open(os.path.join(out_dir, "_webdataset_manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest
