"""operators/weburl: URL canonicalization rules, registered domain,
blocklist, and the exact per-domain cap (bucketed grouped rank vs the
naive single-window formulation)."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from curator_spark.operators import weburl


def _canon(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "id int, url string")
    rows = (df.select("id",
                      weburl.canonicalize_url(F.col("url")).alias("c"),
                      weburl.host_of(F.col("url")).alias("h"))
            .orderBy("id").collect())
    return [(r["c"], r["h"]) for r in rows]


def test_canonicalize_rules(spark):
    got = _canon(spark, [
        # case, www, default port, fragment, trailing slash
        "HTTPS://WWW.Example.COM:443/a/b/#frag",
        # tracking params stripped, survivors sorted
        "https://example.com/p?utm_source=x&b=2&a=1&gclid=z",
        # http default port; non-default port kept
        "HTTP://example.com:80/x",
        "https://example.com:8443/x",
        # query that is ONLY tracking params → no '?'
        "https://example.com/x?utm_campaign=spring",
        # empty path, params preserved
        "https://Example.com?id=3",
    ])
    assert got[0] == ("https://example.com/a/b", "example.com")
    assert got[1] == ("https://example.com/p?a=1&b=2", "example.com")
    assert got[2] == ("http://example.com/x", "example.com")
    assert got[3] == ("https://example.com:8443/x", "example.com:8443")
    assert got[4] == ("https://example.com/x", "example.com")
    assert got[5] == ("https://example.com?id=3", "example.com")


def test_registered_domain(spark):
    df = spark.createDataFrame(
        [("deep.sub.example.com",), ("example.com",), ("localhost",)],
        "h string")
    got = [r[0] for r in
           df.select(weburl.registered_domain(F.col("h"))).collect()]
    assert got == ["example.com", "example.com", "localhost"]


def test_blocklist(spark):
    df = spark.createDataFrame([("a.com",), ("b.org",), ("c.net",)],
                               "domain string")
    kept = weburl.filter_blocked_domains(df, "domain", ("b.org",))
    assert sorted(r[0] for r in kept.collect()) == ["a.com", "c.net"]


def test_cap_per_domain_matches_naive_window(spark):
    """The range-bucketed grouped rank must compute EXACTLY the ranks
    of the naive row_number-per-domain formulation, for every
    n_ranges (bucket boundaries never change which rows survive)."""
    rows = [(i, f"d{i % 7}") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    h = (F.conv(F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":cap-v1"))),
        1, 12), 16, 10).cast("long"))
    naive = (df.withColumn("__h", h)
             .withColumn("r", F.row_number().over(
                 Window.partitionBy("domain").orderBy("__h", "doc_id")))
             .filter(F.col("r") <= 10)
             .select("doc_id", "domain", F.col("r").cast("long")
                     .alias("domain_rank")))
    expect = sorted(tuple(r) for r in naive.collect())
    for n_ranges in (1, 4, 32):
        got = weburl.cap_per_domain(df, "domain", "doc_id", cap=10,
                                    n_ranges=n_ranges)
        assert sorted(tuple(r) for r in got.collect()) == expect


def test_cap_is_partitioning_invariant(spark):
    rows = [(i, f"d{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    a = weburl.cap_per_domain(df.repartition(1), "domain", "doc_id", cap=7)
    b = weburl.cap_per_domain(df.repartition(16), "domain", "doc_id",
                              cap=7)
    assert (sorted(tuple(r) for r in a.collect())
            == sorted(tuple(r) for r in b.collect()))
    # exactly 7 per domain
    counts = {r["domain"]: r["n"] for r in
              b.groupBy("domain").agg(F.count("*").alias("n")).collect()}
    assert counts == {"d0": 7, "d1": 7, "d2": 7}
