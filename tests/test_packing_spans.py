"""Sequence packing + duplicated-span / contamination-fraction operators.

Property-style gates for the three round-3 training-pipeline additions
(operators/packing.py, operators/dedup.duplicate_span_stats,
operators/dedup.contamination_stats). Their value-level exactness is
covered by the q51/q52/q53 DuckDB oracles (tools/selfcheck.py); these
tests pin the SEMANTIC invariants the oracles can't state: budget
respected, assignment partition-invariant, fractions consistent with
the boolean decontaminate rule.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from curator_spark.operators import dedup
from curator_spark.operators.packing import pack_sequences

BUDGET = 50


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


@pytest.fixture(scope="module")
def packed(spark):
    texts = [" ".join(f"w{j}" for j in range(3 + (i * 7) % 40))
             for i in range(200)]
    texts[13] = " ".join(f"big{j}" for j in range(BUDGET + 25))  # oversize
    docs = _docs(spark, texts)
    out = pack_sequences(docs, budget=BUDGET, n_buckets=4).toPandas()
    return docs, out


def test_pack_assigns_every_doc_once(packed):
    docs, out = packed
    assert sorted(out["doc_id"]) == list(range(200))


def test_pack_respects_budget_except_oversize_alone(packed):
    _, out = packed
    for (_, _), grp in out.groupby(["bucket", "seq_idx"]):
        total = grp["n_tokens"].sum()
        if total > BUDGET:  # only a single oversize doc may overflow
            assert len(grp) == 1 and grp["seq_offset"].iloc[0] == 0
    big = out[out["doc_id"] == 13]
    assert big["n_tokens"].iloc[0] == BUDGET + 25
    assert big["seq_offset"].iloc[0] == 0


def test_pack_offsets_are_cumulative_in_id_order(packed):
    _, out = packed
    for (_, _), grp in out.groupby(["bucket", "seq_idx"]):
        grp = grp.sort_values("doc_id")
        fill = 0
        for _, r in grp.iterrows():
            assert r["seq_offset"] == fill
            fill += r["n_tokens"]


def test_pack_partition_invariant(packed):
    docs, out = packed
    again = (pack_sequences(docs.repartition(7), budget=BUDGET, n_buckets=4)
             .toPandas())
    key = ["doc_id", "bucket", "n_tokens", "seq_idx", "seq_offset"]
    pd.testing.assert_frame_equal(
        out[key].sort_values("doc_id").reset_index(drop=True),
        again[key].sort_values("doc_id").reset_index(drop=True))


def test_pack_tolerates_null_text(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, "d e")], "doc_id long, text string")
    out = pack_sequences(docs, budget=BUDGET, n_buckets=2).toPandas()
    assert sorted(out["doc_id"]) == [1, 2, 3]
    assert out.set_index("doc_id")["n_tokens"][2] == 0


def test_dup_span_cap_is_exact(spark):
    """max_shingle_df reroutes hot shingles through the broadcast
    shortcut without changing ANY output value (hot ⇒ duplicated by
    definition), unlike jaccard_pairs' approximating cap."""
    hot = "common words repeated here"
    docs = _docs(spark, [f"{hot} tail{i} tx{i} ty{i}" for i in range(30)]
                 + ["lonely unique phrase entirely"])
    key = ["doc_id", "n_shingles", "n_dup_shingles", "dup_frac"]
    exact = (dedup.duplicate_span_stats(docs, n=3).toPandas()[key]
             .sort_values("doc_id").reset_index(drop=True))
    capped = (dedup.duplicate_span_stats(docs, n=3, max_shingle_df=5)
              .toPandas()[key].sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(exact, capped, check_dtype=False)
    assert exact["n_dup_shingles"].sum() > 0
    with pytest.raises(ValueError):
        dedup.duplicate_span_stats(docs, n=3, min_df=4, max_shingle_df=3)


def test_dup_span_stats_counts_cross_doc_spans(spark):
    docs = _docs(spark, [
        "alpha beta gamma delta",   # shares 'alpha beta gamma' with doc 1
        "alpha beta gamma omega",
        "zeta eta theta iota",      # unique
        "wd",                       # shorter than n=3 → zero shingles
    ])
    out = {r["doc_id"]: r.asDict()
           for r in dedup.duplicate_span_stats(docs, n=3).collect()}
    assert out[0]["n_shingles"] == 2 and out[0]["n_dup_shingles"] == 1
    assert out[0]["dup_frac"] == 0.5
    assert out[2]["n_dup_shingles"] == 0 and out[2]["dup_frac"] == 0.0
    assert out[3]["n_shingles"] == 0 and out[3]["dup_frac"] == 0.0


def test_contamination_frac_consistent_with_boolean_rule(spark):
    train = _docs(spark, [
        "a b c d e",          # fully covered by bench doc
        "a b c x y z",        # partially covered
        "p q r s t",          # disjoint
    ])
    bench = _docs(spark, ["a b c d e f"])
    frac = {r["doc_id"]: r.asDict()
            for r in dedup.contamination_stats(train, bench, n=3).collect()}
    assert frac[0]["contamination_frac"] == 1.0
    assert 0.0 < frac[1]["contamination_frac"] < 1.0
    assert frac[2]["contamination_frac"] == 0.0
    flag = {r["doc_id"]: r["contaminated"]
            for r in dedup.decontaminate(train, bench, n=3).collect()}
    for i in (0, 1, 2):
        assert flag[i] == (frac[i]["n_contaminated"] > 0)


def _turns(spark, convs):
    """convs: {conv_id: [turn texts in order]} → transcripts-shaped DF."""
    rows = [(c, i, t) for c, ts in convs.items() for i, t in enumerate(ts)]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string")


def test_segment_respects_budget_and_turn_order(spark):
    from curator_spark.operators.packing import segment_conversations
    turns = _turns(spark, {
        "c1": ["a b c", "d e", "f g h i", "j", "k l m n o p"],
        "c2": ["one two three four five six seven eight nine ten eleven"],
    })
    out = (segment_conversations(turns, budget=6).toPandas()
           .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    c1 = out[out["conv_id"] == "c1"]
    # windows fill greedily in turn order: 3+2 | 4+1 | 6
    assert list(c1["win_idx"]) == [0, 0, 1, 1, 2]
    assert list(c1["win_offset"]) == [0, 3, 0, 4, 0]
    # window index never decreases in turn order (turns are not reordered)
    assert (c1["win_idx"].diff().dropna() >= 0).all()
    # an over-budget turn (11 tokens > 6) sits alone at offset 0
    c2 = out[out["conv_id"] == "c2"]
    assert list(c2["win_idx"]) == [0] and list(c2["win_offset"]) == [0]
    assert c2["n_tokens"].iloc[0] == 11


def test_segment_windows_respect_budget_property(spark):
    from curator_spark.operators.packing import segment_conversations
    convs = {f"c{i}": [" ".join(f"w{j}" for j in range(1 + (i * 5 + k) % 9))
                       for k in range(1 + i % 13)] for i in range(40)}
    out = segment_conversations(_turns(spark, convs), budget=12).toPandas()
    assert len(out) == sum(len(v) for v in convs.values())
    for (_, _), grp in out.groupby(["conv_id", "win_idx"]):
        total = grp["n_tokens"].sum()
        if total > 12:  # only a lone over-budget turn may overflow
            assert len(grp) == 1 and grp["win_offset"].iloc[0] == 0
        grp = grp.sort_values("turn_idx")
        fill = 0
        for _, r in grp.iterrows():
            assert r["win_offset"] == fill
            fill += r["n_tokens"]


def test_segment_partition_invariant(spark):
    from curator_spark.operators.packing import segment_conversations
    turns = _turns(spark, {f"c{i}": ["x y", "z w v", "u"] for i in range(20)})
    key = ["conv_id", "turn_idx", "n_tokens", "win_idx", "win_offset"]
    a = (segment_conversations(turns, budget=4).toPandas()[key]
         .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    b = (segment_conversations(turns.repartition(7), budget=4).toPandas()[key]
         .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
