"""Semantic gates for the corpus-statistics queries (q58/q59/q60)
beyond the oracle hash: quota exactness, signal invariants, and PMI
ranking sanity. The cross-engine value equality itself is covered by
the driver gate / tools/selfcheck.py."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from curator_spark.queries import (
    PMI_MIN_COUNT, STRAT_DENOM, q58_quality_signals, q59_stratified_split,
    q60_bigram_pmi, q62_inverted_index)

SF = "/root/testdata/sf0.001"


def test_stratified_quota_exact(spark):
    """Every stratum takes EXACTLY ceil(n/STRAT_DENOM) rows — the
    property q40's probabilistic split cannot give."""
    out = q59_stratified_split(spark, SF).toPandas()
    for lang, grp in out.groupby("lang"):
        quota = math.ceil(len(grp) / STRAT_DENOM)
        assert grp["in_sample"].sum() == quota
        assert (grp["n_stratum"] == len(grp)).all()
        # the chosen rows are precisely ranks 1..quota
        assert set(grp.loc[grp["in_sample"], "sample_rank"]) == set(
            range(1, quota + 1))


def test_stratified_rank_deterministic(spark):
    a = sorted(q59_stratified_split(spark, SF).collect())
    b = sorted(q59_stratified_split(spark, SF).collect())
    assert a == b


def test_quality_signals_invariants(spark):
    out = q58_quality_signals(spark, SF).toPandas()
    assert (out["n_unique"] <= out["n_toks"]).all()
    assert ((out["frac_unique"] > 0) & (out["frac_unique"] <= 1)).all()
    assert ((out["top_frac"] > 0) & (out["top_frac"] <= 1)).all()
    # Simpson diversity in fixed point: 0 ≤ 1e6·(1 − Σc²/N²) < 1e6
    assert ((out["simpson_e6"] >= 0) & (out["simpson_e6"] < 1_000_000)).all()
    assert (out["n_hapax"] <= out["n_unique"]).all()
    # all-distinct doc: simpson_e6 == 1e6 - 1e6·N/N² floor — spot-check
    row = out.iloc[0]
    assert row["simpson_e6"] == 1_000_000 - (
        _sum_c2(spark, int(row["doc_id"])) * 1_000_000
    ) // (int(row["n_toks"]) ** 2)


def _sum_c2(spark, doc_id: int) -> int:
    doc = (spark.read.parquet(f"{SF}/documents.parquet")
           .filter(F.col("doc_id") == doc_id).collect()[0])
    toks = [t for t in doc["text"].lower().split(" ") if t]
    counts: dict[str, int] = {}
    for t in toks:
        counts[t] = counts.get(t, 0) + 1
    return sum(c * c for c in counts.values())


def test_inverted_index_matches_python(spark):
    """Postings fingerprint, df, cf vs a direct python build."""
    import hashlib

    out = {r["tok"]: r for r in q62_inverted_index(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    postings: dict[str, set] = {}
    cf: dict[str, int] = {}
    for d in docs:
        for t in d["text"].lower().split(" "):
            if t:
                postings.setdefault(t, set()).add(d["doc_id"])
                cf[t] = cf.get(t, 0) + 1
    assert set(out) == set(postings)
    for t, ids in postings.items():
        fp = hashlib.md5(
            ",".join(str(i) for i in sorted(ids)).encode()).hexdigest()
        assert (out[t]["df"], out[t]["cf"], out[t]["postings_fp"]) == (
            len(ids), cf[t], fp)


def test_bigram_pmi_ranking(spark):
    out = q60_bigram_pmi(spark, SF).toPandas()
    assert (out["c_ab"] >= PMI_MIN_COUNT).all()
    assert (out["c_ab"] <= out[["c_a", "c_b"]].min(axis=1)).all()
    ratios = list(out["pmi_ratio_x1000"])
    assert ratios == sorted(ratios, reverse=True)
    # within one fixed-point bucket the order falls back to the bigram
    # string — the declared total order
    for i in range(len(out) - 1):
        if out["pmi_ratio_x1000"][i] > out["pmi_ratio_x1000"][i + 1]:
            continue
        assert out["bg"][i] < out["bg"][i + 1]


def test_ccnet_approx_cuts_agree_with_exact(spark):
    """q78's two cut strategies on the same scored corpus: the exact
    ntile baseline vs the percentile_approx threshold path (CCNet's
    method, the 100 TB shape). They may differ only at quantile-
    boundary ties — require the same doc universe, identical 'unscored'
    handling, identical scores, and >=90% bucket agreement."""
    from curator_spark.queries import q78_ccnet_lm_filter
    exact = q78_ccnet_lm_filter(spark, SF).toPandas().set_index("doc_id")
    approx = q78_ccnet_lm_filter(spark, SF, approx=True) \
        .toPandas().set_index("doc_id")
    assert set(exact.index) == set(approx.index)
    approx = approx.reindex(exact.index)
    # scores are computed by the shared dataflow — identical
    assert (exact["ppl_milli"].fillna(-1)
            == approx["ppl_milli"].fillna(-1)).all()
    assert ((exact["bucket"] == "unscored")
            == (approx["bucket"] == "unscored")).all()
    agree = (exact["bucket"] == approx["bucket"]).mean()
    assert agree >= 0.90, f"bucket agreement {agree:.3f}"
    # both paths keep exactly the head bucket
    assert (approx["keep"] == (approx["bucket"] == "head")).all()


def test_quality_buckets_approx_agrees_with_exact(spark):
    """q69's two cut strategies on the same scored corpus: exact
    per-lang ntile vs the percentile_approx threshold path. Same doc
    universe, identical scores, >=90% bucket agreement (they may
    differ only at quantile-boundary ties)."""
    from curator_spark.queries import q69_quality_buckets
    exact = q69_quality_buckets(spark, SF).toPandas().set_index("doc_id")
    approx = q69_quality_buckets(spark, SF, approx=True) \
        .toPandas().set_index("doc_id")
    assert set(exact.index) == set(approx.index)
    approx = approx.reindex(exact.index)
    assert (exact["stop_score"] == approx["stop_score"]).all()
    agree = (exact["bucket"] == approx["bucket"]).mean()
    assert agree >= 0.90, f"bucket agreement {agree:.3f}"
