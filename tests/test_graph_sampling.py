"""Connected-components transitive dedup + deterministic hash splits."""

from __future__ import annotations

from pyspark.sql import functions as F

from curator_spark.operators.graph import connected_components, dedup_components
from curator_spark.operators.sampling import hash_sample, hash_split


def test_components_transitive_chain(spark):
    # 1-2, 2-3 (chain: 1 and 3 never directly linked), 10-11, isolated 99
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
    comp = {r.id: r.component for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_components_long_chain_and_cycle(spark):
    # a 12-node path (needs multiple propagation rounds) plus a cycle
    path = [(i, i + 1) for i in range(12)]
    cycle = [(100, 101), (101, 102), (102, 100)]
    edges = spark.createDataFrame(path + cycle, "id_a long, id_b long")
    comp = {r.id: r.component for r in connected_components(edges).collect()}
    assert all(comp[i] == 0 for i in range(13))
    assert all(comp[i] == 100 for i in (100, 101, 102))


def test_dedup_components_vs_pairwise_keep_first(spark):
    """The transitive semantics q24's keep-first approximates: with
    A~B and B~C but A!~C, components keep exactly one doc."""
    docs = spark.createDataFrame([(i,) for i in range(1, 6)], "doc_id long")
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    out = {r.doc_id: r for r in dedup_components(docs, pairs).collect()}
    assert [out[i].component for i in range(1, 6)] == [1, 1, 1, 4, 5]
    assert [out[i].keep_canonical for i in range(1, 6)] == \
        [True, False, False, True, True]


def test_hash_split_deterministic_and_partition_invariant(spark):
    docs = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = hash_split(docs, "doc_id").orderBy("doc_id").collect()
    b = hash_split(docs.repartition(7), "doc_id").orderBy("doc_id").collect()
    assert a == b  # pure function of (id, salt): partitioning-invariant
    counts = {r["split"]: r["n"] for r in
              hash_split(docs, "doc_id").groupBy("split")
              .agg(F.count("*").alias("n")).collect()}
    assert abs(counts["train"] / 2000 - 0.8) < 0.05
    assert abs(counts["val"] / 2000 - 0.1) < 0.03
    assert abs(counts["test"] / 2000 - 0.1) < 0.03


def test_hash_split_salt_redraws(spark):
    docs = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.split for r in hash_split(docs, "doc_id", salt="v1").collect()}
    b = {r.doc_id: r.split for r in hash_split(docs, "doc_id", salt="v2").collect()}
    assert a != b


def test_hash_sample_nested(spark):
    docs = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    s20 = {r.doc_id for r in hash_sample(docs, "doc_id", 0.2).collect()}
    s05 = {r.doc_id for r in hash_sample(docs, "doc_id", 0.05).collect()}
    assert s05 <= s20                      # nested: shrinking keeps subset
    assert abs(len(s20) / 2000 - 0.2) < 0.05


def test_components_match_union_find_reference(spark):
    """Seeded random graph vs an independent pure-python union-find."""
    import random
    rng = random.Random(20260817)
    nodes = list(range(200))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(160)]
    edges = [(a, b) for a, b in edges if a != b]

    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    touched = {n for e in edges for n in e}
    want = {n: find(n) for n in touched}

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.id: r.component for r in connected_components(df).collect()}
    assert got == want


def test_components_convergence_edge_cases(spark):
    # a 5-node path needs exactly max_iter=4 label rounds + the
    # confirmation round — must succeed within propagation alone
    path5 = spark.createDataFrame(
        [(i, i + 1) for i in range(4)], "id_a long, id_b long")
    comp = {r.id: r.component
            for r in connected_components(path5, max_iter=4).collect()}
    assert all(comp[i] == 0 for i in range(5))
    # an insufficient propagation budget must never return silently
    # split components — it falls back to star contraction and still
    # produces the correct labels
    comp2 = {r.id: r.component
             for r in connected_components(path5, max_iter=2).collect()}
    assert comp2 == comp


def test_mixture_sample_rates_and_nesting(spark):
    from curator_spark.operators.sampling import mixture_sample
    rows = [(i, "web" if i % 2 == 0 else "code") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    out = mixture_sample(df, "domain", "doc_id",
                         {"web": 0.25, "code": 1.0}).toPandas()
    by = out.groupby("domain").size()
    assert by["code"] == 2000                        # fraction 1.0 keeps all
    assert abs(by["web"] / 2000 - 0.25) < 0.05
    # default=0.0 drops unlisted groups entirely
    none = mixture_sample(df, "domain", "doc_id", {"code": 1.0}).toPandas()
    assert set(none["domain"]) == {"code"}
    # partitioning-invariant (pure function of id+salt)
    again = mixture_sample(df.repartition(7), "domain", "doc_id",
                           {"web": 0.25, "code": 1.0}).toPandas()
    assert sorted(out["doc_id"]) == sorted(again["doc_id"])


def test_decontaminate_flags_ngram_overlap(spark):
    from curator_spark.operators.dedup import decontaminate
    train = spark.createDataFrame(
        [(1, "the secret benchmark answer is forty two exactly"),
         (2, "a completely unrelated training document about ducks"),
         (3, "short doc")],                      # too short for any 3-gram? no: 2 words -> none
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "we ask whether the secret benchmark answer is known")],
        "doc_id long, text string")
    out = {r.doc_id: r.contaminated
           for r in decontaminate(train, bench, n=3).collect()}
    assert out == {1: True, 2: False, 3: False}


def test_high_diameter_falls_back_to_star_contraction(spark):
    """A 120-node path (diameter 119 ≫ the 25-round propagation budget)
    previously raised; connected_components now hands the graph to
    large-star/small-star contraction and returns correct labels."""
    from curator_spark.operators.graph import connected_components_star

    edges = spark.createDataFrame([(i, i + 1) for i in range(119)],
                                  "id_a long, id_b long")
    comp = {r.id: r.component
            for r in connected_components(edges, max_iter=5).collect()}
    assert comp == {i: 0 for i in range(120)}

    # and the contraction used directly agrees
    comp2 = {r.id: r.component
             for r in connected_components_star(edges).collect()}
    assert comp2 == comp


def test_star_contraction_matches_union_find(spark):
    """Seeded random graph: star contraction vs pure-python union-find
    (and vs min-label propagation)."""
    import random

    from curator_spark.operators.graph import connected_components_star

    rng = random.Random(99)
    edges = [(rng.randrange(150), rng.randrange(150)) for _ in range(120)]
    edges = [(a, b) for a, b in edges if a != b]

    parent = {}
    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    # canonicalize union-find labels to component minima
    mins = {}
    for n, r in want.items():
        mins[r] = min(mins.get(r, n), n)
    want = {n: mins[r] for n, r in want.items()}

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got_star = {r.id: r.component
                for r in connected_components_star(df).collect()}
    got_prop = {r.id: r.component for r in connected_components(df).collect()}
    assert got_star == want
    assert got_prop == want
