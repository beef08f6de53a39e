"""operators/dedup.winnow_fingerprints / winnow_pairs (MOSS winnowing,
Schleimer et al. 2003): the shared-substring guarantee, density bound,
short-document edges, the hot-fingerprint cap, and plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from curator_spark.operators.dedup import winnow_fingerprints, winnow_pairs

K, W = 4, 8
# any shared run of >= W + K - 1 = 11 words must share a fingerprint
SHARED = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"


def test_shared_substring_guarantee(spark):
    docs = spark.createDataFrame([
        (1, "completely unrelated preamble before " + SHARED),
        (2, SHARED + " followed by a different ending entirely here"),
        (3, "no overlap with anything else whatsoever in this row of "
            "plain filler words stretching far enough to fingerprint"),
    ], ["doc_id", "text"])
    pairs = winnow_pairs(docs, k=K, w=W, min_shared=1)
    got = {(r.a, r.b) for r in pairs.collect()}
    assert (1, 2) in got
    assert not any(3 in p for p in got)


def test_density_and_positions(spark):
    words = " ".join(f"w{i % 97}x{i % 89}" for i in range(400))
    docs = spark.createDataFrame([(1, words)], ["doc_id", "text"])
    fps = winnow_fingerprints(docs, k=K, w=W).collect()
    m = 400 - (K - 1)  # grams
    # paper's expected density is 2/(w+1); allow generous slack but
    # require a real reduction and full coverage window count
    assert 0 < len(fps) <= m
    assert len(fps) < 0.6 * m
    assert all(1 <= r.pos <= m for r in fps)
    # distinct (fp, pos) pairs only
    assert len({(r.fp, r.pos) for r in fps}) == len(fps)


def test_short_docs(spark):
    docs = spark.createDataFrame([
        (1, "only three words"),            # < k -> no grams
        (2, "five words is not enough no"), # m < w -> exactly 1 window
        (3, ""),
    ], ["doc_id", "text"])
    fps = winnow_fingerprints(docs, k=K, w=W).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 1 not in by_doc and 3 not in by_doc
    assert len(by_doc[2]) == 1  # the single whole-list window min


def test_max_df_drops_boilerplate_fp(spark):
    # 20 docs all containing the same run -> its fingerprints have
    # df=20; the cap removes them and the quadratic 190-pair blowup
    docs = spark.createDataFrame(
        [(i, "doc %d distinct prefix words here %d then %s" % (i, i, SHARED))
         for i in range(20)], ["doc_id", "text"])
    full = winnow_pairs(docs, k=K, w=W, min_shared=1).count()
    assert full == 190  # all pairs share the boilerplate run
    capped = winnow_pairs(docs, k=K, w=W, min_shared=1, max_df=5).count()
    assert capped == 0


def test_plan_no_product_no_python(spark):
    docs = spark.createDataFrame([(1, SHARED)], ["doc_id", "text"])
    plan = winnow_pairs(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
