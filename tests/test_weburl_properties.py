"""Property tests for the URL canonicalizer and the per-domain cap.

Canonicalization must be IDEMPOTENT (the canonical form is a fixed
point — re-canonicalizing a canonical URL changes nothing) and
case/tracking/fragment-INSENSITIVE (two messy spellings of the same
resource canonicalize identically). The cap must agree with the naive
per-domain row_number for arbitrary domain/id multisets and any
bucket count.

Hypothesis drives the URL grammar; each case batch evaluates in ONE
Spark job (rows, not per-example sessions)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import Window, functions as F

from curator_spark.operators import weburl

_label = st.text(alphabet="abcz09", min_size=1, max_size=4)
_param = st.tuples(
    st.sampled_from(["a", "b", "id", "q", "utm_source", "utm_x",
                     "gclid", "fbclid"]),
    st.text(alphabet="xy12", min_size=0, max_size=3),
)


@st.composite
def messy_url(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "HTTPS",
                                   "HttPs"]))
    www = draw(st.sampled_from(["", "www.", "WWW.", "wWw."]))
    host_labels = draw(st.lists(_label, min_size=1, max_size=3))
    host = ".".join(host_labels)
    case_host = draw(st.booleans())
    if case_host:
        host = host.upper()
    port = draw(st.sampled_from(["", ":443", ":80", ":8080"]))
    path = draw(st.sampled_from(["", "/", "/p", "/p/q", "/p//", "/p/q/"]))
    params = draw(st.lists(_param, max_size=4))
    query = "&".join(f"{k}={v}" for k, v in params)
    frag = draw(st.sampled_from(["", "#f", "#frag/x?y=1"]))
    url = f"{scheme}://{www}{host}{port}{path}"
    if query:
        url += "?" + query
    return url + frag


def _canon_batch(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "id long, url string")
    rows = (df.select("id", weburl.canonicalize_url(F.col("url"))
                      .alias("c")).orderBy("id").collect())
    return [r["c"] for r in rows]


_EXAMPLES = 10


@settings(max_examples=_EXAMPLES, deadline=None)
@given(st.lists(messy_url(), min_size=30, max_size=60, unique=True))
def test_canonicalize_is_idempotent(spark, urls):
    once = _canon_batch(spark, urls)
    twice = _canon_batch(spark, once)
    assert once == twice


@settings(max_examples=_EXAMPLES, deadline=None)
@given(st.lists(messy_url(), min_size=20, max_size=40, unique=True))
def test_canonicalize_quotients_out_noise(spark, base_urls):
    """Re-dirtying a canonical URL — uppercased scheme+host, a www
    prefix, the scheme's own default port, tracking params, a fragment
    — never changes the canonical form."""
    canon = _canon_batch(spark, base_urls)
    noisy = []
    for u in canon:
        scheme, body = u.split("://", 1)
        host_end = min((body + "/?").index("/"), (body + "?/").index("?"))
        default_port = ":443" if scheme == "https" else ":80"
        noisy.append(scheme.upper() + "://WWW." + body[:host_end].upper()
                     + default_port + body[host_end:]
                     + ("&utm_source=z" if "?" in body else "?gclid=1")
                     + "#frag")
    renoised = _canon_batch(spark, noisy)
    assert renoised == canon


@settings(max_examples=_EXAMPLES, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 10_000),
                          st.sampled_from(["a", "b", "c", "hot"])),
                min_size=1, max_size=200, unique_by=lambda t: t[0]),
       st.integers(1, 9),
       st.sampled_from([1, 3, 32]))
def test_cap_matches_naive_for_random_multisets(spark, rows, cap,
                                                n_ranges):
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    h = (F.conv(F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":cap-v1"))),
        1, 12), 16, 10).cast("long"))
    naive = (df.withColumn("__h", h)
             .withColumn("r", F.row_number().over(
                 Window.partitionBy("domain").orderBy("__h", "doc_id")))
             .filter(F.col("r") <= cap)
             .select("doc_id", "domain",
                     F.col("r").cast("long").alias("domain_rank")))
    got = weburl.cap_per_domain(df, "domain", "doc_id", cap=cap,
                                n_ranges=n_ranges)
    assert (sorted(tuple(r) for r in got.collect())
            == sorted(tuple(r) for r in naive.collect()))
