"""Integer-exact k-means (operators/clustering.py): equivalence with an
independent numpy replica, partitioning invariance (the point of the
all-integer formulation), empty-cluster retention, and plan shape
(assignment must be a narrow map — no Exchange, no window)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from curator_spark.operators.clustering import (
    cluster_sizes, kmeans_int8, KMEANS_ITERS, KMEANS_K)


def _fixture_emb(spark, n=160, d=12, n_parts=1, seed=7):
    rng = np.random.default_rng(seed)
    # three planted blobs so clustering has structure to find
    centers = rng.normal(size=(3, d)) * 3
    vecs = (centers[np.arange(n) % 3]
            + rng.normal(size=(n, d)) * 0.4).astype(np.float32)
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(n)]
    return (spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
            .repartition(n_parts)), vecs


def _numpy_kmeans_int8(vecs: np.ndarray, k: int, iters: int) -> np.ndarray:
    """Independent replica: quantize, then integer Lloyd rounds."""
    v = vecs.astype(np.float64)
    s = np.maximum(np.abs(v).max(axis=1), 1e-30)
    # numpy rint is half-even; Spark/DuckDB round() is half-away — use
    # the same half-away rounding the engines use
    x = v / s[:, None] * 127
    codes = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
    cents = codes[:k].copy()

    def assign(cs):
        d2 = ((codes[:, None, :] - cs[None, :, :]) ** 2).sum(axis=2)
        return d2.argmin(axis=1), d2.min(axis=1)

    for _ in range(iters):
        a, _ = assign(cents)
        for c in range(k):
            m = a == c
            if m.any():
                cents[c] = np.floor(codes[m].sum(axis=0) / m.sum())
    a, d = assign(cents)
    return a, d


def test_kmeans_matches_numpy(spark):
    emb, vecs = _fixture_emb(spark)
    got = {r["vec_id"]: (r["cluster"], r["dist"])
           for r in kmeans_int8(emb, k=4, iters=2).collect()}
    a, d = _numpy_kmeans_int8(vecs, 4, 2)
    want = {i: (int(a[i]), int(d[i])) for i in range(len(vecs))}
    assert got == want


def test_kmeans_partitioning_invariant(spark):
    """The all-integer formulation's contract: the result cannot depend
    on how the data is split (float-mean k-means would)."""
    emb1, _ = _fixture_emb(spark, n_parts=1)
    emb8, _ = _fixture_emb(spark, n_parts=8)
    r1 = sorted(kmeans_int8(emb1, k=4, iters=2).collect())
    r8 = sorted(kmeans_int8(emb8, k=4, iters=2).collect())
    assert r1 == r8


def test_kmeans_finds_planted_blobs(spark):
    """With k = the planted blob count, clustering should recover the
    blob structure (every blob lands in one cluster)."""
    emb, vecs = _fixture_emb(spark, n=90)
    out = kmeans_int8(emb, k=3, iters=4).collect()
    by_blob = {}
    for r in out:
        by_blob.setdefault(r["vec_id"] % 3, set()).add(r["cluster"])
    # each planted blob maps to exactly one cluster, all distinct
    assert all(len(s) == 1 for s in by_blob.values())
    assert len({next(iter(s)) for s in by_blob.values()}) == 3


def test_kmeans_empty_cluster_keeps_centroid(spark):
    """k > distinct points: surplus clusters keep their init centroid
    and end up empty, never crash or steal members."""
    rows = [(i, [1.0, 1.0]) for i in range(3)] + [(3, [5.0, 5.0])]
    emb = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    out = kmeans_int8(emb, k=3, iters=2).collect()
    assert len(out) == 4
    sizes = {r["cluster"]: r["n_members"]
             for r in cluster_sizes(kmeans_int8(emb, k=3, iters=2)).collect()}
    assert sum(sizes.values()) == 4


def test_kmeans_assignment_plan_is_narrow(spark):
    """The final assignment stage must be a narrow map over the codes:
    zero Exchange and zero Window in the plan (the codebook is literal
    columns, argmin is array_min over structs)."""
    from curator_spark.operators.clustering import _assign, _codes_long
    rows = [(i, [float(i), float(-i)] * 6) for i in range(8)]
    emb = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    codes = _codes_long(emb, "vec_id", "embedding")
    plan = _assign(codes, [(0, [1] * 12), (1, [-1] * 12)], "vec_id") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Window" not in plan


def test_pq_encode_matches_numpy(spark):
    """Product quantization vs an independent numpy replica: per
    subspace, the same integer Lloyd rounds over the code slice."""
    from curator_spark.operators.clustering import pq_encode
    emb, vecs = _fixture_emb(spark, n=120, d=12)
    got = {r["vec_id"]: (r["c0"], r["c1"], r["c2"], r["distortion"])
           for r in pq_encode(emb, n_sub=3, k=4, iters=2).collect()}

    v = vecs.astype(np.float64)
    s = np.maximum(np.abs(v).max(axis=1), 1e-30)
    x = v / s[:, None] * 127
    codes = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
    want = {}
    per_sub = []
    for sub in range(3):
        sl = codes[:, sub * 4:(sub + 1) * 4]
        cents = sl[:4].copy()

        def assign(cs):
            d2 = ((sl[:, None, :] - cs[None, :, :]) ** 2).sum(axis=2)
            return d2.argmin(axis=1), d2.min(axis=1)

        for _ in range(2):
            a, _d = assign(cents)
            for c in range(4):
                m = a == c
                if m.any():
                    cents[c] = np.floor(sl[m].sum(axis=0) / m.sum())
        per_sub.append(assign(cents))
    for i in range(len(vecs)):
        want[i] = (int(per_sub[0][0][i]), int(per_sub[1][0][i]),
                   int(per_sub[2][0][i]),
                   int(per_sub[0][1][i] + per_sub[1][1][i]
                       + per_sub[2][1][i]))
    assert got == want


def test_pq_rejects_indivisible_dims(spark):
    from curator_spark.operators.clustering import pq_encode
    emb, _ = _fixture_emb(spark, n=10, d=10)
    with pytest.raises(ValueError, match="divisible"):
        pq_encode(emb, n_sub=4)


def test_semdedup_keep_first_within_cluster(spark):
    """Planted near-dup pairs: within a cluster, the LOWEST id of a
    similar group survives and every later similar row drops; rows
    similar across DIFFERENT clusters are untouched (the SemDeDup
    contract — the quadratic search never leaves a cluster)."""
    from curator_spark.operators.clustering import kmeans_int8, semdedup
    rng = np.random.default_rng(3)
    base = rng.normal(size=(4, 16))
    rows = []
    for i in range(4):          # 4 well-separated anchors
        v = base[i] * 5
        rows.append((i * 10, [float(x) for x in v]))
        rows.append((i * 10 + 1, [float(x) for x in v * 1.001]))  # near-dup
    emb = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    out = {r["vec_id"]: r for r in
           semdedup(emb, k=4, iters=2, threshold=0.95).collect()}
    clusters = {r["vec_id"]: r["cluster"] for r in
                kmeans_int8(emb, k=4, iters=2).collect()}
    for i in range(4):
        a, b = i * 10, i * 10 + 1
        if clusters[a] == clusters[b]:
            assert out[a]["keep"] and not out[b]["keep"]
        else:  # split across clusters: both survive (documented recall cost)
            assert out[a]["keep"] and out[b]["keep"]
    # at least one planted pair must actually co-cluster for the test
    # to exercise the drop path
    assert any(clusters[i * 10] == clusters[i * 10 + 1] for i in range(4))


def test_semdedup_pair_join_is_equi_join(spark):
    """The within-cluster pair search must be an equi-join on the
    cluster key — a cartesian here is the O(n²) SemDeDup exists to
    avoid."""
    from curator_spark.operators.clustering import semdedup
    rows = [(i, [float(i % 5), float(i % 7)] + [0.0] * 6)
            for i in range(20)]
    emb = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    plan = semdedup(emb, k=2, iters=1)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Cartesian" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_defaults_match_query_constants():
    from curator_spark import queries_dedup as qd
    from curator_spark.operators import clustering as cl
    assert (qd.KMEANS_K, qd.KMEANS_ITERS) == (KMEANS_K, KMEANS_ITERS)
    assert (qd.PQ_SUBSPACES, qd.PQ_K, qd.PQ_ITERS) == (
        cl.PQ_SUBSPACES, cl.PQ_K, cl.PQ_ITERS)
    assert (qd.IVFPQ_CELLS, qd.IVFPQ_CELL_ITERS, qd.IVFPQ_NPROBE) == (
        cl.IVFPQ_CELLS, cl.IVFPQ_CELL_ITERS, cl.IVFPQ_NPROBE)


def _numpy_codes(vecs: np.ndarray) -> np.ndarray:
    v = vecs.astype(np.float64)
    s = np.maximum(np.abs(v).max(axis=1), 1e-30)
    x = v / s[:, None] * 127
    return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)


def _numpy_lloyd(sl: np.ndarray, k: int, iters: int):
    """Integer Lloyd over a code (sub)matrix; returns (assign, dist,
    final centroids) — the replica of clustering._kmeans_train."""
    cents = sl[:k].copy()

    def assign(cs):
        d2 = ((sl[:, None, :] - cs[None, :, :]) ** 2).sum(axis=2)
        return d2.argmin(axis=1), d2.min(axis=1)

    for _ in range(iters):
        a, _d = assign(cents)
        for c in range(k):
            m = a == c
            if m.any():
                cents[c] = np.floor(sl[m].sum(axis=0) / m.sum())
    a, d = assign(cents)
    return a, d, cents


def test_ivfpq_search_matches_numpy(spark):
    """IVF-PQ ADC search vs an independent numpy replica: coarse Lloyd
    for cells + probe choice, per-subspace Lloyd for codes, integer
    LUTs, top-k by (adc, id)."""
    from curator_spark.operators.clustering import ivfpq_search
    n_cells, cell_iters, nprobe, n_sub, pq_k, pq_iters, k = 4, 2, 2, 3, 4, 2, 8
    emb, vecs = _fixture_emb(spark, n=150, d=12, n_parts=5)
    got = [(r["vec_id"], r["cell"], r["adc_dist"]) for r in ivfpq_search(
        emb, query_vec_id=0, k=k, n_cells=n_cells, cell_iters=cell_iters,
        nprobe=nprobe, n_sub=n_sub, pq_k=pq_k, pq_iters=pq_iters).collect()]

    codes = _numpy_codes(vecs)
    w = codes.shape[1] // n_sub
    cell_a, _, ccents = _numpy_lloyd(codes, n_cells, cell_iters)
    qc = codes[0]
    probe = sorted(
        (int(((qc - ccents[c]) ** 2).sum()), c) for c in range(n_cells)
    )[:nprobe]
    probe_cells = {c for _, c in probe}
    sub = [_numpy_lloyd(codes[:, s * w:(s + 1) * w], pq_k, pq_iters)
           for s in range(n_sub)]
    luts = [[int(((qc[s * w:(s + 1) * w] - sub[s][2][j]) ** 2).sum())
             for j in range(pq_k)] for s in range(n_sub)]
    cand = []
    for i in range(len(vecs)):
        if int(cell_a[i]) not in probe_cells:
            continue
        adc = sum(luts[s][int(sub[s][0][i])] for s in range(n_sub))
        cand.append((adc, i))
    cand.sort()
    want = [(i, int(cell_a[i]), adc) for adc, i in cand[:k]]
    assert got == want


def test_ivfpq_serving_plan_is_narrow(spark):
    """The ADC serving scan is one narrow projection into TakeOrdered —
    no Exchange anywhere in the physical plan."""
    from curator_spark.operators.clustering import ivfpq_search
    emb, _ = _fixture_emb(spark, n=60, d=8, n_parts=4)
    df = ivfpq_search(emb, query_vec_id=0, k=5, n_cells=2, cell_iters=1,
                      nprobe=1, n_sub=2, pq_k=2, pq_iters=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the fixture's repartition() is a RoundRobin Exchange at the source;
    # the operator itself must add none (no hash/range repartitioning)
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert "TakeOrderedAndProject" in plan
