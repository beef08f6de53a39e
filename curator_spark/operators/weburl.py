"""URL / domain-level corpus curation (RefinedWeb / CCNet / C4 style).

At web scale the crawl's unit of trust is the DOMAIN, not the page:
production pretraining pipelines canonicalize every URL (case, default
ports, tracking parameters, fragments, trailing slashes), aggregate
pages to the registered domain, drop blocklisted domains wholesale,
and CAP how many pages any single domain may contribute so that one
mirror farm cannot dominate the mixture (RefinedWeb's per-domain
limits; C4's blocklist pass). The reference's curation loop has no
crawl face — its closest analogue is per-source request routing
(`base_online_request_processor.py`) — so this module is part of the
beyond-parity training-data surface, like operators/dedup.py.

Everything here is a narrow JVM-side column expression (regexp +
array functions inside whole-stage codegen — zero Python, zero
shuffle) except the per-domain cap, which needs one exact grouped
rank; see cap_per_domain for why it is NOT a bare
`Window.partitionBy(domain)` (the hot-domain skew killer) but the
range-bucketed grouped variant of operators/ranking.global_rank.

Cross-engine notes (the DuckDB oracles replicate each step):
host/param handling is ASCII here, so Spark's `array_sort` and
DuckDB's `list_sort` agree on the canonical parameter order, and
`lower` agrees byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "canonicalize_url", "host_of", "registered_domain",
    "filter_blocked_domains", "cap_per_domain", "TRACKING_PARAM_RE",
]

# utm_* plus the big click-id trackers; anchored at the param name.
TRACKING_PARAM_RE = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid)="

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def _split_url(url: Column) -> tuple[Column, Column, Column, Column]:
    """(scheme_lower, hostport_lower, path, query) — fragment dropped."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    rest = F.regexp_replace(url, _SCHEME_RE, "")
    rest = F.regexp_replace(rest, "#.*$", "")          # fragment
    hostport = F.lower(F.regexp_extract(rest, "^([^/?]*)", 1))
    pathq = rest.substr(F.length(hostport) + 1, F.length(rest))
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    return scheme, hostport, path, query


def host_of(url: Column) -> Column:
    """Canonical host: lowercased, default port and leading www.
    stripped (same rules canonicalize_url applies)."""
    scheme, hostport, _, _ = _split_url(url)
    hp = (F.when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
          .when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
          .otherwise(hostport))
    return F.regexp_replace(hp, r"^www\.", "")


def registered_domain(host: Column) -> Column:
    """Last two dot-labels (the public-suffix-list approximation that
    needs no external data: example.co.uk-style suffixes would take
    the PSL as a broadcast lookup — same plan shape, bigger literal)."""
    parts = F.split(host, r"\.")
    return F.when(F.size(parts) <= 2, host).otherwise(
        F.concat_ws(".", F.slice(parts, -2, 2)))


def canonicalize_url(url: Column) -> Column:
    """Canonical form: lowercase scheme+host, default port stripped,
    leading `www.` stripped, fragment dropped, tracking parameters
    (utm_*, fbclid, gclid, msclkid) removed, surviving query params
    sorted bytewise, trailing path slashes stripped. Pure regexp /
    array expressions — whole-stage codegen, no UDF."""
    scheme, hostport, path, query = _split_url(url)
    host = (F.when(scheme == "https",
                   F.regexp_replace(hostport, ":443$", ""))
            .when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
            .otherwise(hostport))
    host = F.regexp_replace(host, r"^www\.", "")
    cpath = F.regexp_replace(path, "/+$", "")
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE))
    q2 = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme, F.lit("://"), host, cpath,
        F.when(q2 != "", F.concat(F.lit("?"), q2)).otherwise(F.lit("")))


def filter_blocked_domains(df: DataFrame, domain_col: str,
                           blocked: tuple[str, ...]) -> DataFrame:
    """Domain blocklist: drop every page of a blocked registered
    domain. The blocklist is a literal IN-set (codegen, no shuffle);
    a million-entry production list becomes a broadcast anti-join —
    same result, still no corpus shuffle."""
    return df.filter(~F.col(domain_col).isin(*blocked))


def cap_per_domain(df: DataFrame, domain_col: str, id_col: str,
                   cap: int, salt: str = "cap-v1",
                   n_ranges: int = 32,
                   rank_col: str = "domain_rank") -> DataFrame:
    """Exact per-domain page cap: keep the `cap` pages of each domain
    with the smallest salted content hash — a deterministic,
    partitioning-independent draw (re-runs, resumes, and the DuckDB
    oracle agree bit-for-bit), so the cap is a reproducible sample,
    not \"whatever arrived first\".

    Why not `row_number() over (partition by domain)`: one hot domain
    (a mirror farm with 10^9 pages) would land in ONE task. Instead
    the md5 rank value is range-bucketed by its own high bits into
    `n_ranges` ORDERED sub-buckets per domain — md5 is uniform, so
    the buckets are balanced by construction with no sampling pass
    (contrast ranking.global_rank, which must sketch quantiles because
    its rank key is arbitrary data). Local rank within (domain,
    bucket), then bucket counts (|domains|·n_ranges small rows) carry
    a per-domain prefix sum back via an equi-join on the SAME
    (domain, bucket) key — Catalyst reuses the window's exchange. Max
    task ≈ hottest domain / n_ranges; raise n_ranges for hotter tails.

    Returns df's rows with rank_col appended, filtered to
    rank_col <= cap."""
    h = (F.conv(F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))),
        1, 12), 16, 10).cast("long"))
    chunk = (16 ** 12) // n_ranges
    d = df.withColumn("__h", h).withColumn(
        "__hb", F.floor(F.col("__h") / F.lit(chunk)).cast("int"))
    w_local = Window.partitionBy(domain_col, "__hb").orderBy("__h", id_col)
    d = d.withColumn("__local", F.row_number().over(w_local))
    counts = d.groupBy(domain_col, "__hb").agg(
        F.count(F.lit(1)).alias("__n"))
    w_off = (Window.partitionBy(domain_col).orderBy("__hb")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = counts.withColumn(
        "__offset", F.coalesce(F.sum("__n").over(w_off), F.lit(0)))
    out = (d.join(offsets.select(domain_col, "__hb", "__offset"),
                  [domain_col, "__hb"])
           .withColumn(rank_col,
                       (F.col("__offset") + F.col("__local")).cast("long"))
           .filter(F.col(rank_col) <= cap))
    return out.select(*df.columns, rank_col)
