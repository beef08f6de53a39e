"""Web/domain curation query battery with DuckDB oracles.

The crawl-facing corpus ops (operators/weburl.py + the paragraph-level
first-occurrence dedup in operators/dedup.py) over the driver's
`documents` table. The documents fixture has no URL column, so q89/q90
first SYNTHESIZE a deterministic messy URL per doc from (doc_id,
source) — same md5-derived choices in Spark and in the oracle SQL, so
the canonicalizer is exercised on every rule (mixed-case scheme/host,
www prefix, default port, tracking params, unsorted params, trailing
slash, fragment) and the result is hash-verified byte-exact.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from .operators import weburl
from .operators.dedup import dedup_paragraphs

URL_SALT = "url-v1"
BLOCKED_DOMAINS = ("src3.com", "src7.org")
DOMAIN_CAP = 5
CAP_SALT = "cap-v1"

# q92 classifier hyperparameters (shared with tools/make_golden.py's
# independent pure-Python replay)
LR_DIM = 256
LR_EPOCHS = 24
LR_DEN = 4
LR_SALT = "lr-v1"
SPAM_WORD = "slow"  # the learnable quality label: doc mentions it


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _messy_url() -> Column:
    """Deterministic messy URL from (doc_id, source): every
    canonicalization rule gets exercised by some md5-selected subset
    of rows. Replicated literally by _URL_PARTS_SQL."""
    key = F.md5(F.concat(F.col("doc_id").cast("string"),
                         F.lit(":" + URL_SALT)))
    a = F.conv(F.substring(key, 1, 8), 16, 10).cast("long")
    b = F.conv(F.substring(key, 9, 4), 16, 10).cast("long")
    scheme = F.when(a % 2 == 0, "https").otherwise("HTTPS")
    sub = (F.when(a % 3 == 0, "www.").when(a % 3 == 1, "WWW.")
           .otherwise(""))
    tld = (F.when(b % 3 == 0, ".com").when(b % 3 == 1, ".org")
           .otherwise(".net"))
    port = F.when(a % 5 == 0, ":443").otherwise("")
    path = F.concat(F.lit("/p/"), (F.col("doc_id") % 997).cast("string"))
    slash = F.when(b % 4 == 0, "/").otherwise("")
    track = F.when(b % 2 == 0, "utm_source=feed&").otherwise("")
    qid = F.concat(F.lit("id="), (F.col("doc_id") % 50).cast("string"))
    gclid = F.when(b % 5 == 0, "&gclid=x1").otherwise("")
    frag = F.when(a % 7 == 0, "#frag").otherwise("")
    return F.concat(scheme, F.lit("://"), sub, F.col("source"), tld, port,
                    path, slash, F.lit("?"), track, qid, gclid, frag)


def q89_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + registered-domain blocklist
    (operators/weburl): messy URL → canonical form (lowercase
    scheme/host, www + default port stripped, tracking params dropped,
    params sorted, trailing slash cut, fragment gone) → host →
    registered domain → blocklist keep flag. One narrow codegen'd
    projection, zero shuffle — the per-page half of crawl curation.
    Oracle rebuilds the same messy URL and replays every rule in
    DuckDB string/list functions."""
    d = _docs(spark, sf_dir).select("doc_id", _messy_url().alias("url"))
    url = F.col("url")
    host = weburl.host_of(url)
    dom = weburl.registered_domain(host)
    return d.select(
        "doc_id", "url",
        weburl.canonicalize_url(url).alias("canonical_url"),
        host.alias("host"), dom.alias("domain"),
        (~dom.isin(*BLOCKED_DOMAINS)).alias("keep"))


def q90_domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain page caps (operators/weburl.cap_per_domain): the
    q89 chain feeds the exact grouped rank — each registered domain
    keeps its DOMAIN_CAP pages with the smallest salted hash, a
    deterministic partitioning-independent draw. See the operator
    docstring for why this is range-bucketed local ranks + a
    per-domain prefix sum, not one window per domain (hot-domain
    skew). Oracle = the plain row_number formulation, which is exact
    at oracle scale and proves the bucketed plan computes the
    identical ranks."""
    d = _docs(spark, sf_dir).select("doc_id", _messy_url().alias("url"))
    dom = weburl.registered_domain(weburl.host_of(F.col("url")))
    pages = d.select("doc_id", dom.alias("domain"))
    return weburl.cap_per_domain(pages, "domain", "doc_id",
                                 cap=DOMAIN_CAP, salt=CAP_SALT)


def q92_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-apply quality classifier (operators/logreg.py): a
    fastText-style hashed bag-of-words logistic regression, trained by
    full-batch gradient descent entirely in int64 fixed point (hard
    sigmoid, exact integer gradient sums, best-iterate selection) and
    applied back to every doc — the trainable counterpart of q14's
    static heuristics and the classifier face of the q78 CCNet filter.
    The label is a deterministic quality marker (doc mentions
    SPAM_WORD), so accuracy is measurable in-fixture; training reaches
    ~0.95 vs a ~0.78 base rate (tests/test_logreg.py asserts the
    floor). Every epoch is one narrow pass + a ≤dim+2-integer
    aggregate; scoring is one codegen'd projection. Oracle = committed
    golden parquet from the independent pure-Python integer replay
    (tools/make_golden.py) — the recurrence is deterministic by
    construction, so Spark must match it bit-for-bit."""
    from .operators import logreg
    docs = _docs(spark, sf_dir)
    label = F.array_contains(F.split(F.lower(F.col("text")), " "),
                             SPAM_WORD)
    feats = logreg.hashed_sparse_features(docs, LR_DIM, label,
                                          salt=LR_SALT).cache()
    try:
        w, b, _ = logreg.train_logreg(feats, LR_DIM, epochs=LR_EPOCHS,
                                      lr_den=LR_DEN)
    finally:
        # scoring below recomputes the (cheap) feature plan lazily;
        # holding the cache across the caller's lifetime isn't worth it
        feats.unpersist()
    return logreg.score_logreg(feats, w, b)


def q91_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level exact dedup, first occurrence kept
    (operators/dedup.dedup_paragraphs — the Dolma/RedPajama rule):
    later copies of any 12-word paragraph are deleted corpus-wide,
    the globally earliest (min (doc_id, seg_idx)) survives; docs are
    rewritten from their surviving paragraphs in order. Contrast q70,
    which deletes ALL copies of duplicated boilerplate. Oracle =
    row_number-over-paragraph replay with the identical segmentation."""
    return dedup_paragraphs(_docs(spark, sf_dir))


MIN_CLEAN_TOKENS = 8
MIX_MIN_TOKENS = 20


def q94_attribute_mixer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dolma-style attribute store + mixer (operators/attributes.py):
    two independent tagger passes write per-doc attribute tables
    (quality counts; language/spam flags), `combine_attribute_tables`
    outer-joins them on doc_id, and `mix` evaluates the curation rule
    on the ATTRIBUTE table only — the corpus text is touched by the
    taggers once and by the final semi-join, never by the rule. At
    100 TB this is the architecture that turns every rule iteration
    into a metadata-sized job: re-mixing reads the few-column
    attribute table, not the corpus. Oracle = the rule inlined over
    documents (proving tag→combine→mix ≡ the direct filter)."""
    from .operators.attributes import (combine_attribute_tables, mix,
                                       tag)
    docs = _docs(spark, sf_dir)
    toks = F.filter(F.split(F.lower(F.col("text")), " "),
                    lambda t: t != "")
    quality = tag(docs, {
        "quality__n_tokens": F.size(toks).cast("long"),
        "quality__n_chars": F.length("text").cast("long"),
    })
    flags = tag(docs, {
        "lang__is_en": F.col("lang") == "en",
        "spam__has_marker": F.array_contains(toks, SPAM_WORD),
    })
    attrs = combine_attribute_tables([quality, flags])
    rule = ((F.col("quality__n_tokens") >= MIX_MIN_TOKENS)
            & ~F.col("spam__has_marker"))
    return mix(docs.select("doc_id", "source", "lang"), attrs, rule)


def q93_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END corpus curation — the composite a production crawl
    pipeline actually runs, chaining this module's operators in their
    real order: registered-domain blocklist → per-domain page caps →
    paragraph-level first-occurrence dedup → heuristic quality rules
    on the REWRITTEN text (min token count; at least half the
    paragraphs survived) → corpus-wide exact dedup of the clean text
    (min-doc_id canonical). Every stage is the already-verified
    operator (q89/q90/q91/q14/q17 shapes); this query verifies their
    COMPOSITION byte-exactly: the oracle replays the same five stages
    as one CTE chain, so stage-ordering effects (caps drawn before
    dedup, quality on post-dedup text, canonicals chosen among quality
    survivors only) are pinned. Plan: one narrow URL/domain
    projection, the cap's bounded grouped rank, two paragraph-key
    shuffles, one clean-text argmin — no product, no unbounded window
    anywhere."""
    from .operators.dedup import dedup_paragraphs
    d = _docs(spark, sf_dir).select("doc_id", "text",
                                    _messy_url().alias("url"))
    dom = weburl.registered_domain(weburl.host_of(F.col("url")))
    pages = d.select("doc_id", "text", dom.alias("domain"))
    pages = weburl.filter_blocked_domains(pages, "domain",
                                          BLOCKED_DOMAINS)
    capped = weburl.cap_per_domain(pages, "domain", "doc_id",
                                   cap=DOMAIN_CAP, salt=CAP_SALT)
    deduped = dedup_paragraphs(capped.select("doc_id", "text"))
    j = capped.select("doc_id", "domain").join(deduped, "doc_id")
    n_clean = F.size(F.filter(F.split(F.col("clean_text"), " "),
                              lambda t: t != ""))
    n_kept = F.col("n_segs") - F.col("n_dropped")
    j = j.withColumn(
        "qual_keep",
        (n_clean >= MIN_CLEAN_TOKENS) & (n_kept * 2 >= F.col("n_segs")))
    canon = (j.filter(F.col("qual_keep"))
             .groupBy("clean_text")
             .agg(F.min("doc_id").alias("canon_id")))
    out = (j.join(canon, "clean_text", "left")
           .withColumn("final_keep",
                       F.col("qual_keep")
                       & (F.col("doc_id") == F.col("canon_id"))))
    return out.select("doc_id", "domain", "clean_text", "n_segs",
                      "n_dropped", "qual_keep",
                      F.coalesce("final_keep", F.lit(False))
                      .alias("final_keep"))


# --- oracles -----------------------------------------------------------

# DuckDB rendering of _messy_url(); '0x'||hex ::BIGINT == Spark conv(,16,10).
_URL_PARTS_SQL = f"""
        SELECT doc_id,
               (CASE WHEN a % 2 = 0 THEN 'https' ELSE 'HTTPS' END)
               || '://'
               || (CASE WHEN a % 3 = 0 THEN 'www.'
                        WHEN a % 3 = 1 THEN 'WWW.' ELSE '' END)
               || source
               || (CASE WHEN b % 3 = 0 THEN '.com'
                        WHEN b % 3 = 1 THEN '.org' ELSE '.net' END)
               || (CASE WHEN a % 5 = 0 THEN ':443' ELSE '' END)
               || '/p/' || (doc_id % 997)::VARCHAR
               || (CASE WHEN b % 4 = 0 THEN '/' ELSE '' END)
               || '?'
               || (CASE WHEN b % 2 = 0 THEN 'utm_source=feed&' ELSE '' END)
               || 'id=' || (doc_id % 50)::VARCHAR
               || (CASE WHEN b % 5 = 0 THEN '&gclid=x1' ELSE '' END)
               || (CASE WHEN a % 7 = 0 THEN '#frag' ELSE '' END) AS url
        FROM (
            SELECT doc_id, source,
                   ('0x' || substr(md5(doc_id::VARCHAR || ':{URL_SALT}'),
                                   1, 8))::BIGINT AS a,
                   ('0x' || substr(md5(doc_id::VARCHAR || ':{URL_SALT}'),
                                   9, 4))::BIGINT AS b
            FROM documents)
"""

_BLOCKED_SQL = ",".join(f"'{d}'" for d in BLOCKED_DOMAINS)

_Q89_SQL = f"""
    WITH urls AS ({_URL_PARTS_SQL}),
    parts AS (
        SELECT doc_id, url,
               lower(regexp_extract(url,
                     '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
               regexp_replace(regexp_replace(url,
                     '^[A-Za-z][A-Za-z0-9+.-]*://', ''), '#.*$', '') AS rest
        FROM urls
    ), hp AS (
        SELECT *, lower(regexp_extract(rest, '^([^/?]*)', 1)) AS hostport
        FROM parts
    ), split2 AS (
        SELECT *, substr(rest, length(hostport) + 1) AS pathq FROM hp
    ), fields AS (
        SELECT doc_id, url, scheme,
               regexp_replace(
                   CASE WHEN scheme = 'https'
                        THEN regexp_replace(hostport, ':443$', '')
                        WHEN scheme = 'http'
                        THEN regexp_replace(hostport, ':80$', '')
                        ELSE hostport END,
                   '^www\\.', '') AS host,
               regexp_extract(pathq, '^([^?]*)', 1) AS path,
               regexp_extract(pathq, '\\?(.*)$', 1) AS query
        FROM split2
    ), canon AS (
        SELECT doc_id, url, scheme, host,
               regexp_replace(path, '/+$', '') AS cpath,
               array_to_string(list_sort(list_filter(
                   string_split(query, '&'),
                   p -> p <> '' AND NOT regexp_matches(p,
                        '^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid)='))),
                   '&') AS q2
        FROM fields
    )
    SELECT doc_id, url,
           scheme || '://' || host || cpath
               || (CASE WHEN q2 <> '' THEN '?' || q2 ELSE '' END)
               AS canonical_url,
           host,
           CASE WHEN len(string_split(host, '.')) <= 2 THEN host
                ELSE array_to_string(string_split(host, '.')[-2:], '.')
           END AS domain,
           CASE WHEN len(string_split(host, '.')) <= 2 THEN host
                ELSE array_to_string(string_split(host, '.')[-2:], '.')
           END NOT IN ({_BLOCKED_SQL}) AS keep
    FROM canon
"""

# q90: the oracle derives the registered domain directly (source is
# already lowercase; the tld choice replays _messy_url's b % 3) — an
# INDEPENDENT, simpler derivation than Spark's full URL round-trip —
# then ranks with a plain per-domain row_number.
_Q90_SQL = f"""
    WITH d AS (
        SELECT doc_id,
               source || (CASE WHEN b % 3 = 0 THEN '.com'
                               WHEN b % 3 = 1 THEN '.org'
                               ELSE '.net' END) AS domain,
               ('0x' || substr(md5(doc_id::VARCHAR || ':{CAP_SALT}'),
                               1, 12))::BIGINT AS h
        FROM (
            SELECT doc_id, source,
                   ('0x' || substr(md5(doc_id::VARCHAR || ':{URL_SALT}'),
                                   9, 4))::BIGINT AS b
            FROM documents)
    )
    SELECT doc_id, domain, rnk AS domain_rank FROM (
        SELECT doc_id, domain,
               row_number() OVER (PARTITION BY domain
                                  ORDER BY h, doc_id) AS rnk
        FROM d)
    WHERE rnk <= {DOMAIN_CAP}
"""

_Q91_SQL = """
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), t -> t <> '') AS toks
        FROM documents
    ), segs AS (
        SELECT doc_id, i AS seg_idx,
               array_to_string(toks[(i-1)*12+1 : i*12], ' ') AS seg
        FROM toks,
             unnest(range(1, (len(toks) + 11) // 12 + 1)) AS u(i)
    ), firsts AS (
        SELECT doc_id, seg_idx, seg,
               row_number() OVER (PARTITION BY seg
                                  ORDER BY doc_id, seg_idx) AS rn
        FROM segs
    ), kept AS (
        SELECT doc_id, seg_idx, seg FROM firsts WHERE rn = 1
    ), rebuilt AS (
        SELECT doc_id,
               array_to_string(list(seg ORDER BY seg_idx), ' ')
                   AS clean_text,
               count(*) AS n_kept
        FROM kept GROUP BY doc_id
    ), totals AS (
        SELECT doc_id, count(*) AS n_segs FROM segs GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(r.clean_text, '') AS clean_text,
           coalesce(t.n_segs, 0) AS n_segs,
           coalesce(t.n_segs, 0) - coalesce(r.n_kept, 0) AS n_dropped
    FROM documents d
    LEFT JOIN totals t USING (doc_id)
    LEFT JOIN rebuilt r USING (doc_id)
"""

_Q94_SQL = f"""
    SELECT doc_id, source, lang FROM documents
    WHERE len(list_filter(string_split(lower(text), ' '),
                          t -> t <> '')) >= {MIX_MIN_TOKENS}
      AND NOT list_contains(list_filter(string_split(lower(text), ' '),
                                        t -> t <> ''), '{SPAM_WORD}')
"""

# q93: the five stages as one CTE chain — domains derived the simple
# independent way (as in _Q90_SQL), then cap → paragraph dedup →
# quality → canonical, each replaying the operator semantics in SQL.
_Q93_SQL = f"""
    WITH pages AS (
        SELECT doc_id, text,
               source || (CASE WHEN b % 3 = 0 THEN '.com'
                               WHEN b % 3 = 1 THEN '.org'
                               ELSE '.net' END) AS domain,
               ('0x' || substr(md5(doc_id::VARCHAR || ':{CAP_SALT}'),
                               1, 12))::BIGINT AS h
        FROM (
            SELECT doc_id, text, source,
                   ('0x' || substr(md5(doc_id::VARCHAR || ':{URL_SALT}'),
                                   9, 4))::BIGINT AS b
            FROM documents)
    ), allowed AS (
        SELECT * FROM pages WHERE domain NOT IN ({_BLOCKED_SQL})
    ), capped AS (
        SELECT doc_id, text, domain FROM (
            SELECT *, row_number() OVER (PARTITION BY domain
                                         ORDER BY h, doc_id) AS rnk
            FROM allowed)
        WHERE rnk <= {DOMAIN_CAP}
    ), toks AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), t -> t <> '') AS toks
        FROM capped
    ), segs AS (
        SELECT doc_id, i AS seg_idx,
               array_to_string(toks[(i-1)*12+1 : i*12], ' ') AS seg
        FROM toks,
             unnest(range(1, (len(toks) + 11) // 12 + 1)) AS u(i)
    ), firsts AS (
        SELECT doc_id, seg_idx, seg,
               row_number() OVER (PARTITION BY seg
                                  ORDER BY doc_id, seg_idx) AS rn
        FROM segs
    ), kept AS (
        SELECT doc_id, seg_idx, seg FROM firsts WHERE rn = 1
    ), rebuilt AS (
        SELECT doc_id,
               array_to_string(list(seg ORDER BY seg_idx), ' ')
                   AS clean_text,
               count(*) AS n_kept
        FROM kept GROUP BY doc_id
    ), totals AS (
        SELECT doc_id, count(*) AS n_segs FROM segs GROUP BY doc_id
    ), dd AS (
        SELECT c.doc_id, c.domain,
               coalesce(r.clean_text, '') AS clean_text,
               coalesce(t.n_segs, 0) AS n_segs,
               coalesce(t.n_segs, 0) - coalesce(r.n_kept, 0) AS n_dropped
        FROM capped c
        LEFT JOIN totals t USING (doc_id)
        LEFT JOIN rebuilt r USING (doc_id)
    ), q AS (
        SELECT *,
               (len(list_filter(string_split(clean_text, ' '),
                                t -> t <> '')) >= {MIN_CLEAN_TOKENS}
                AND 2 * (n_segs - n_dropped) >= n_segs) AS qual_keep
        FROM dd
    ), canon AS (
        SELECT clean_text, min(doc_id) AS canon_id
        FROM q WHERE qual_keep GROUP BY clean_text
    )
    SELECT q.doc_id, q.domain, q.clean_text, q.n_segs, q.n_dropped,
           q.qual_keep,
           coalesce(q.qual_keep AND q.doc_id = c.canon_id, FALSE)
               AS final_keep
    FROM q LEFT JOIN canon c USING (clean_text)
"""

PII_SALT = "pii-v1"
# RE2-safe subset of rules.SCRUB_PATTERNS (no lookaround), evaluated
# JVM-side here (regexp_count) and replayed by DuckDB's RE2 — the
# corpus-REPORTING face of the flagship's Python-parity scrub (which
# stays `re`-based for byte-exact replacement, rules.py docstring).
PII_REPORT_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
    ("apikey", r"\b(?:sk-[A-Za-z0-9]{16,}|AKIA[0-9A-Z]{16})\b"),
)


def _pii_seeded_text() -> Column:
    """Deterministic PII injection from (doc_id): md5-selected subsets
    of rows get an email / SSN / IPv4 / API key appended (some rows
    several, most none) — same construction as q89's messy URL, so
    every detector fires on a known population. Replicated literally
    in the oracle SQL."""
    key = F.md5(F.concat(F.col("doc_id").cast("string"),
                         F.lit(":" + PII_SALT)))
    a = F.conv(F.substring(key, 1, 8), 16, 10).cast("long")
    did = F.col("doc_id")
    email = F.when(a % 5 == 0, F.concat(
        F.lit(" contact user"), did.cast("string"),
        F.lit("@example.com"))).otherwise("")
    ssn = F.when(a % 7 == 0, F.concat(
        F.lit(" ssn "), F.lpad((did % 1000).cast("string"), 3, "0"),
        F.lit("-"), F.lpad((did % 100).cast("string"), 2, "0"),
        F.lit("-"), F.lpad((did % 10000).cast("string"), 4, "0"))
    ).otherwise("")
    ip = F.when(a % 3 == 0, F.concat(
        F.lit(" host 10."), (did % 256).cast("string"),
        F.lit(".0."), ((did * 7) % 256).cast("string"))).otherwise("")
    akey = F.when(a % 11 == 0, F.concat(
        F.lit(" token AKIA"),
        F.upper(F.substring(key, 9, 16)))).otherwise("")
    return F.concat(F.col("text"), email, ssn, ip, akey)


def q109_pii_incidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII incident matrix: for every (source, pii_type),
    how many documents leak it and how many raw hits — the report a
    privacy owner reads to decide which ingest feeds need scrubbing
    upstream (the corpus-reporting complement of the flagship's
    per-turn scrub and q67's Luhn masking). Detection is JVM-side
    regexp_count over the RE2-safe pattern subset; ONE narrow map +
    ONE groupBy(source) with 2·k conditional sums → k rows per source
    via explode (≈ n_sources·k rows total at any corpus size)."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", "source", _pii_seeded_text().alias("text"))
    cols = [F.count(F.lit(1)).alias("n_docs")]
    for name, pat in PII_REPORT_PATTERNS:
        hits = F.regexp_count(F.col("text"), F.lit(pat))
        cols.append(F.sum((hits > 0).cast("long")).alias(f"__d_{name}"))
        cols.append(F.sum(hits.cast("long")).alias(f"__h_{name}"))
    agg = docs.groupBy("source").agg(*cols)
    entries = F.array(*[
        F.struct(F.lit(name).alias("pii_type"),
                 F.col(f"__d_{name}").alias("n_flagged"),
                 F.col(f"__h_{name}").alias("n_hits"))
        for name, _ in PII_REPORT_PATTERNS])
    return (agg.select("source", "n_docs",
                       F.explode(entries).alias("e"))
            .select("source", "n_docs",
                    F.col("e.pii_type").alias("pii_type"),
                    F.col("e.n_flagged").alias("n_flagged"),
                    F.col("e.n_hits").alias("n_hits"))
            .withColumn("flag_permille",
                        F.expr("(1000 * n_flagged) div n_docs")))


_PII_TEXT_SQL = f"""
        SELECT doc_id, source,
               text
               || CASE WHEN a % 5 = 0 THEN ' contact user'
                       || doc_id::VARCHAR || '@example.com'
                  ELSE '' END
               || CASE WHEN a % 7 = 0 THEN ' ssn '
                       || lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-'
                       || lpad((doc_id % 100)::VARCHAR, 2, '0') || '-'
                       || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                  ELSE '' END
               || CASE WHEN a % 3 = 0 THEN ' host 10.'
                       || (doc_id % 256)::VARCHAR || '.0.'
                       || ((doc_id * 7) % 256)::VARCHAR
                  ELSE '' END
               || CASE WHEN a % 11 = 0 THEN ' token AKIA'
                       || upper(substr(k, 9, 16))
                  ELSE '' END AS text
        FROM (
            SELECT doc_id, source, text,
                   md5(doc_id::VARCHAR || ':{PII_SALT}') AS k,
                   ('0x' || substr(md5(doc_id::VARCHAR || ':{PII_SALT}'),
                                   1, 8))::BIGINT AS a
            FROM documents)
"""

_Q109_SQL = f"""
    WITH seeded AS ({_PII_TEXT_SQL}
    ), agg AS (
        SELECT source, count(*)::BIGINT AS n_docs,
               {",".join(
                   f"sum((regexp_matches(text, '{pat}'))::INT)::BIGINT"
                   f" AS d_{name},"
                   f" sum(len(regexp_extract_all(text, '{pat}')))::BIGINT"
                   f" AS h_{name}" for name, pat in PII_REPORT_PATTERNS)}
        FROM seeded GROUP BY source
    )
    SELECT source, n_docs, pii_type, n_flagged, n_hits,
           (1000 * n_flagged) // n_docs AS flag_permille
    FROM (
        {" UNION ALL ".join(
            f"SELECT source, n_docs, '{name}' AS pii_type, "
            f"d_{name} AS n_flagged, h_{name} AS n_hits FROM agg"
            for name, _ in PII_REPORT_PATTERNS)}
    )
"""

ORACLES: dict[str, str] = {
    "q109_pii_incidence": _Q109_SQL,
    "q89_url_canonicalize": _Q89_SQL,
    "q90_domain_caps": _Q90_SQL,
    "q91_paragraph_dedup": _Q91_SQL,
    "q93_curation_pipeline": _Q93_SQL,
    "q94_attribute_mixer": _Q94_SQL,
    # q92's oracle is a committed golden parquet (integer-exact
    # pure-Python replay) — registered by __spark_entry__.oracle_sql
    # next to the other golden-backed entries (q00/q30/q85/q86).
}

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q89_url_canonicalize": q89_url_canonicalize,
    "q90_domain_caps": q90_domain_caps,
    "q91_paragraph_dedup": q91_paragraph_dedup,
    "q92_quality_classifier": q92_quality_classifier,
    "q93_curation_pipeline": q93_curation_pipeline,
    "q94_attribute_mixer": q94_attribute_mixer,
    "q109_pii_incidence": q109_pii_incidence,
}
