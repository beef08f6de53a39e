"""WARC ingestion: CommonCrawl-style web archives → the documents table.

The reference ingests datasets already shaped as rows (HF datasets,
JSONL — SURVEY §2.b `Dataset.from_*`); a 100 TB web-scale curation run
starts one step earlier, at crawl archives. This module is that step,
Spark-first:

* **Parallelism unit = the archive file.** WARC members are
  back-to-back gzip streams (or plain concatenated records); a single
  archive is NOT byte-splittable without an index, so the standard
  layout — many ~1 GB warc.gz files — is read one-file-per-task via
  `spark.read.format("binaryFile")`. 100 TB of crawl ≈ 10^5 archives
  → ample parallelism for any executor count; set
  `spark.sql.files.maxPartitionBytes` ≥ the archive size so one task
  owns one file (binaryFile never splits a file anyway).
* **Parsing is Arrow-batched Python** (`mapInPandas`), not a JVM
  format: the per-record work (header scan, gzip, HTML strip) is
  string-bound Python either way, and mapInPandas streams one file's
  records out per batch without materializing the archive twice.
* **Deterministic text extraction.** `html_to_text` is a small
  regex/`html.unescape` pipeline (drop script/style/head, strip tags,
  collapse whitespace) — deliberately dependency-free and exact-
  reproducible; production extractors (trafilatura/justext) slot in at
  the same seam (`extract=`) when available.

Format notes (ISO 28500): a record is
    WARC/1.0\r\n
    <headers: Name: value\r\n ...>\r\n
    \r\n
    <Content-Length bytes of block>\r\n\r\n
Headers of interest: WARC-Type (warcinfo/request/response/metadata...),
WARC-Target-URI, WARC-Record-ID, WARC-Date, Content-Length. Response
records carry an embedded HTTP response (status line + headers + body)
— the body is the HTML we want.

Malformed input policy mirrors ingest.read_transcripts_jsonl: a
corrupt record (bad framing, short block) stops that FILE's scan at
the corruption point and reports rows parsed up to it plus an error
row in the `warc_error` channel — never a task failure (one bad
archive must not kill a 10^5-file job).
"""

from __future__ import annotations

import gzip
import html as html_mod
import io
import re
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (BinaryType, LongType, StringType, StructField,
                               StructType)

WARC_RECORDS_SCHEMA = StructType([
    StructField("archive", StringType()),        # source file path
    StructField("record_id", StringType()),      # WARC-Record-ID
    StructField("warc_type", StringType()),
    StructField("target_uri", StringType()),
    StructField("warc_date", StringType()),
    StructField("http_status", LongType()),      # null for non-response
    StructField("content_type", StringType()),   # payload type (HTTP hdr)
    StructField("payload", BinaryType()),        # HTTP body / raw block
    StructField("warc_error", StringType()),     # null = clean record
])

_CRLF2 = b"\r\n\r\n"
_STATUS_RE = re.compile(rb"^HTTP/\d\.\d\s+(\d{3})")


def _maybe_gunzip(data: bytes) -> bytes:
    """Decompress all gzip members (warc.gz = one member per record);
    pass plain bytes through."""
    if data[:2] != b"\x1f\x8b":
        return data
    out = io.BytesIO()
    with gzip.GzipFile(fileobj=io.BytesIO(data)) as g:
        # GzipFile reads concatenated members transparently
        while True:
            chunk = g.read(1 << 20)
            if not chunk:
                break
            out.write(chunk)
    return out.getvalue()


def parse_warc_bytes(data: bytes, archive: str = "") -> Iterator[dict]:
    """Yield one dict per WARC record (schema above). On a framing
    error, yield a single error row and stop — the documented
    corrupt-archive policy."""
    try:
        data = _maybe_gunzip(data)
    except OSError as exc:
        yield {"archive": archive, "record_id": None, "warc_type": None,
               "target_uri": None, "warc_date": None, "http_status": None,
               "content_type": None, "payload": None,
               "warc_error": f"gzip: {exc}"}
        return
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record CRLFs
        while data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        if not data.startswith(b"WARC/", pos):
            yield {"archive": archive, "record_id": None, "warc_type": None,
                   "target_uri": None, "warc_date": None,
                   "http_status": None, "content_type": None,
                   "payload": None,
                   "warc_error": f"bad magic at byte {pos}"}
            return
        hdr_end = data.find(_CRLF2, pos)
        if hdr_end < 0:
            yield {"archive": archive, "record_id": None, "warc_type": None,
                   "target_uri": None, "warc_date": None,
                   "http_status": None, "content_type": None,
                   "payload": None,
                   "warc_error": "unterminated header block"}
            return
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].decode("utf-8", "replace").split("\r\n")[1:]:
            k, sep, v = line.partition(":")
            if sep:
                headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            yield {"archive": archive,
                   "record_id": headers.get("warc-record-id"),
                   "warc_type": headers.get("warc-type"),
                   "target_uri": headers.get("warc-target-uri"),
                   "warc_date": headers.get("warc-date"),
                   "http_status": None, "content_type": None,
                   "payload": None, "warc_error": "missing Content-Length"}
            return
        block_start = hdr_end + 4
        block_end = block_start + clen
        if block_end > n:
            yield {"archive": archive,
                   "record_id": headers.get("warc-record-id"),
                   "warc_type": headers.get("warc-type"),
                   "target_uri": headers.get("warc-target-uri"),
                   "warc_date": headers.get("warc-date"),
                   "http_status": None, "content_type": None,
                   "payload": None,
                   "warc_error": f"truncated block: need {clen} bytes, "
                                 f"have {n - block_start}"}
            return
        block = data[block_start:block_end]
        status, ctype, payload = None, headers.get("content-type"), block
        if headers.get("warc-type") == "response" and block[:5] == b"HTTP/":
            # peel the embedded HTTP response
            m = _STATUS_RE.match(block)
            status = int(m.group(1)) if m else None
            he = block.find(_CRLF2)
            if he >= 0:
                for line in block[:he].decode("latin-1").split("\r\n")[1:]:
                    k, sep, v = line.partition(":")
                    if sep and k.strip().lower() == "content-type":
                        ctype = v.strip()
                payload = block[he + 4:]
        yield {"archive": archive,
               "record_id": headers.get("warc-record-id"),
               "warc_type": headers.get("warc-type"),
               "target_uri": headers.get("warc-target-uri"),
               "warc_date": headers.get("warc-date"),
               "http_status": status, "content_type": ctype,
               "payload": payload, "warc_error": None}
        pos = block_end


_TAG_DROP = re.compile(
    r"<(script|style|head|noscript|template)\b.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL)
_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_BLOCK_TAG = re.compile(
    r"</?(p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|section|article|header|"
    r"footer|blockquote|pre)\b[^>]*>", re.IGNORECASE)
_ANY_TAG = re.compile(r"<[^>]+>")
_WS = re.compile(r"[ \t\r\f\v]+")
_NL = re.compile(r"\n{3,}")


def html_to_text(html: str) -> str:
    """Deterministic, dependency-free HTML→text: drop non-content
    subtrees, map block tags to newlines, strip the rest, unescape
    entities, normalize whitespace."""
    t = _COMMENT.sub(" ", html)
    t = _TAG_DROP.sub(" ", t)
    # source newlines are insignificant whitespace in HTML; only block
    # tags introduce line structure
    t = re.sub(r"[\r\n\t]+", " ", t)
    t = _BLOCK_TAG.sub("\n", t)
    t = _ANY_TAG.sub(" ", t)
    t = html_mod.unescape(t)
    t = _WS.sub(" ", t)
    t = "\n".join(ln.strip() for ln in t.split("\n"))
    return _NL.sub("\n\n", t).strip()


_CHARSET_RE = re.compile(r"charset=[\"']?([A-Za-z0-9_.:-]+)", re.IGNORECASE)


def _charset_of(content_type: str | None) -> str:
    """Encoding label from an HTTP Content-Type header; utf-8 when
    absent (the HTML5 default for the modern web)."""
    if content_type:
        m = _CHARSET_RE.search(content_type)
        if m:
            return m.group(1)
    return "utf-8"


def parse_files_df(files: DataFrame) -> DataFrame:
    """(path, content) rows → WARC records via the Arrow-batched
    parser. Works on batch AND foreachBatch micro-batch frames."""
    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_RECORDS_SCHEMA.fields]
        for b in batches:
            for _, row in b.iterrows():
                recs = list(parse_warc_bytes(bytes(row["content"]),
                                             archive=row["path"]))
                if recs:
                    yield pd.DataFrame(recs, columns=cols)

    return files.select("path", "content").mapInPandas(
        _parse, schema=WARC_RECORDS_SCHEMA)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC record scan: one task per archive file."""
    return parse_files_df(spark.read.format("binaryFile").load(path))


def records_to_documents(recs: DataFrame,
                         extract: Callable[[str], str] = html_to_text,
                         min_chars: int = 1) -> DataFrame:
    """WARC-records DataFrame → the documents shape (doc_id, text,
    lang, source, n_chars): keep HTTP-200 HTML responses, extract text
    (honoring the response's declared charset), drop empties. doc_id
    is a deterministic 63-bit hash of (archive, record_id) — no global
    counter, no shuffle; `lang` is left null for the downstream langid
    operator (q15/q77) to fill. Shared by the batch scan below and the
    streaming ingestion (streaming/warc_stream.py)."""
    html_ok = (
        recs.filter(F.col("warc_error").isNull())
        .filter(F.col("warc_type") == "response")
        .filter(F.col("http_status") == 200)
        .filter(F.lower(F.coalesce(F.col("content_type"), F.lit("")))
                .contains("html")))

    @F.pandas_udf(StringType())
    def _extract(payload: pd.Series, ctype: pd.Series) -> pd.Series:
        def one(b, ct):
            enc = _charset_of(ct)
            try:
                text = bytes(b).decode(enc, "replace")
            except LookupError:  # unknown label in the header
                text = bytes(b).decode("utf-8", "replace")
            return extract(text)
        return pd.Series([one(b, ct) for b, ct in zip(payload, ctype)])

    docs = (
        html_ok.withColumn("text", _extract("payload", "content_type"))
        .withColumn(
            "doc_id",
            F.pmod(F.xxhash64(F.col("archive"), F.col("record_id")),
                   F.lit(1 << 62).cast("long")))
        .withColumn("source",
                    F.regexp_extract("target_uri", r"^[a-z]+://([^/]+)", 1))
        .withColumn("n_chars", F.length("text").cast("long"))
        .filter(F.col("n_chars") >= min_chars)
        .select("doc_id", "text", F.lit(None).cast("string").alias("lang"),
                "source", "n_chars"))
    return docs


def warc_to_documents(spark: SparkSession, path: str,
                      extract: Callable[[str], str] = html_to_text,
                      min_chars: int = 1) -> DataFrame:
    """Batch entry: distributed WARC scan → documents shape."""
    return records_to_documents(read_warc(spark, path),
                                extract=extract, min_chars=min_chars)


def warc_errors(spark: SparkSession, path: str) -> DataFrame:
    """The quarantine channel: one row per corrupt archive with the
    framing error and how far the scan got."""
    recs = read_warc(spark, path)
    return (recs.filter(F.col("warc_error").isNotNull())
            .select("archive", "warc_error"))
