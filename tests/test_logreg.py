"""operators/logreg: fixed-point distributed logistic regression —
learns (accuracy floor over the base rate), deterministic under
repartitioning, and exactly replayable in pure-Python ints."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from curator_spark.operators import logreg

DIM = 64
SPAM = "slow"


def _docs(spark, n=400, parts=8):
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta", "iota", "kappa"]
    rows = []
    for i in range(n):
        h = int(hashlib.md5(f"doc{i}".encode()).hexdigest()[:8], 16)
        toks = [vocab[(h >> (j * 3)) % len(vocab)] for j in range(8)]
        if h % 5 < 2:  # ~40% positives
            toks.insert(h % len(toks), SPAM)
        rows.append((i, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string") \
        .repartition(parts)


def _label():
    return F.array_contains(F.split(F.lower(F.col("text")), " "), SPAM)


def test_learns_above_base_rate(spark):
    docs = _docs(spark)
    feats = logreg.hashed_sparse_features(docs, DIM, _label()).cache()
    w, b, _ = logreg.train_logreg(feats, DIM, epochs=24, lr_den=4)
    scored = logreg.score_logreg(feats, w, b)
    agg = scored.agg(
        F.sum(F.when(F.col("pred") == (F.col("y") == 1), 1).otherwise(0))
        .alias("ok"),
        F.sum("y").alias("pos"), F.count("*").alias("n")).collect()[0]
    feats.unpersist()
    base = max(agg["pos"], agg["n"] - agg["pos"]) / agg["n"]
    acc = agg["ok"] / agg["n"]
    # the label is a single-token marker with its own hash bucket at
    # DIM=64 — near-separable; demand a real margin over the base rate
    assert acc >= 0.9, (acc, base)
    assert acc > base


def test_training_is_partitioning_invariant(spark):
    docs = _docs(spark, n=200)
    out = []
    for parts in (1, 13):
        feats = logreg.hashed_sparse_features(
            docs.repartition(parts), DIM, _label()).cache()
        out.append(logreg.train_logreg(feats, DIM, epochs=6, lr_den=4))
        feats.unpersist()
    assert out[0] == out[1]


def test_matches_pure_python_replay(spark):
    """The integer recurrence is the spec: Spark must reproduce the
    pure-Python replay bit-for-bit (weights, bias, epoch, scores)."""
    docs = _docs(spark, n=150)
    feats = logreg.hashed_sparse_features(docs, DIM, _label()).cache()
    w, b, ep = logreg.train_logreg(feats, DIM, epochs=8, lr_den=4)
    scored = {r["doc_id"]: (r["z_micro"], r["p_micro"], r["pred"])
              for r in logreg.score_logreg(feats, w, b).collect()}
    feats.unpersist()

    MICRO = logreg.MICRO
    rows = docs.orderBy("doc_id").collect()

    def bk(tok):
        return int(hashlib.md5((tok + ":lr-v1").encode())
                   .hexdigest()[:12], 16) % DIM

    X = []
    for r in rows:
        toks = [t for t in r["text"].lower().split(" ") if t]
        fx = {}
        for t in toks:
            fx[bk(t)] = fx.get(bk(t), 0) + 1
        X.append((r["doc_id"], fx, 1 if SPAM in toks else 0))
    w2 = [0] * DIM
    b2 = 0
    best = None
    for e in range(8):
        g = [0] * DIM
        gb = 0
        nc = 0
        n = len(X)
        for _, fx, y in X:
            z = b2 + sum(w2[d] * c for d, c in fx.items())
            p = min(max((z >> 2) + MICRO // 2, 0), MICRO)
            er = p - y * MICRO
            nc += int((p >= MICRO // 2) == (y == 1))
            gb += er
            for d, c in fx.items():
                g[d] += er * c
        if best is None or nc > best[0]:
            best = (nc, list(w2), b2, e)
        w2 = [w2[d] - g[d] // (n * 4) for d in range(DIM)]
        b2 = b2 - gb // (n * 4)
    assert (w, b, ep) == (best[1], best[2], best[3])
    for doc_id, fx, y in X:
        z = best[2] + sum(best[1][d] * c for d, c in fx.items())
        p = min(max((z >> 2) + MICRO // 2, 0), MICRO)
        assert scored[doc_id] == (z, p, p >= MICRO // 2)


def test_join_path_matches_literal_path(spark):
    """The broadcast-join formulation (the >LITERAL_DIM_MAX hash-space
    shape) must reproduce the literal-array path bit-for-bit: same
    weights, bias, best epoch, and per-doc scores."""
    docs = _docs(spark, n=150)
    feats = logreg.hashed_sparse_features(docs, DIM, _label()).cache()
    lit = logreg.train_logreg(feats, DIM, epochs=6, lr_den=4,
                              use_join=False)
    jn = logreg.train_logreg(feats, DIM, epochs=6, lr_den=4,
                             use_join=True)
    assert lit == jn
    w, b, _ = lit
    s_lit = sorted(tuple(r) for r in
                   logreg.score_logreg(feats, w, b,
                                       use_join=False).collect())
    s_jn = sorted(tuple(r) for r in
                  logreg.score_logreg(feats, w, b,
                                      use_join=True).collect())
    feats.unpersist()
    assert s_lit == s_jn


def test_empty_docs_get_zero_features(spark):
    docs = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "slow word")],
        "doc_id long, text string")
    feats = logreg.hashed_sparse_features(docs, DIM, _label())
    got = {r["doc_id"]: (len(r["fs"]), r["y"]) for r in feats.collect()}
    assert got[0] == (0, 0) and got[1] == (0, 0)
    assert got[2][0] == 2 and got[2][1] == 1
