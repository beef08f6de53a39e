"""operators/dedup.dedup_paragraphs: first occurrence kept, later
copies dropped, original order preserved (contrast
remove_duplicate_segments, which deletes ALL copies)."""

from __future__ import annotations

from curator_spark.operators.dedup import (dedup_paragraphs,
                                           remove_duplicate_segments)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _seg(words, n=4):
    return " ".join(words)


def test_first_occurrence_survives(spark):
    para = "a b c d"          # 4-word paragraph duplicated across docs
    uniq0 = "u v w x"
    uniq2 = "p q r s"
    docs = _mk(spark, [
        (0, f"{para} {uniq0}"),
        (1, f"{para}"),                 # whole doc is a later copy
        (2, f"{uniq2} {para}"),
    ])
    got = {r["doc_id"]: (r["clean_text"], r["n_segs"], r["n_dropped"])
           for r in dedup_paragraphs(docs, seg_words=4).collect()}
    assert got[0] == (f"{para} {uniq0}", 2, 0)   # earliest copy kept
    assert got[1] == ("", 1, 1)                  # later copy dropped
    assert got[2] == (uniq2, 2, 1)               # order preserved
    # contrast: min_df=2 segment removal deletes EVERY copy
    seg = {r["doc_id"]: r["clean_text"] for r in
           remove_duplicate_segments(docs, seg_words=4).collect()}
    assert seg[0] == uniq0


def test_within_doc_repeat_dedups(spark):
    docs = _mk(spark, [(7, "a b c d a b c d e f g h")])
    got = dedup_paragraphs(docs, seg_words=4).collect()[0]
    assert got["clean_text"] == "a b c d e f g h"
    assert (got["n_segs"], got["n_dropped"]) == (3, 1)


def test_partitioning_invariant(spark):
    rows = [(i, f"w{i % 5} x{i % 5} y z tail{i}") for i in range(60)]
    a = dedup_paragraphs(_mk(spark, rows).repartition(1), seg_words=4)
    b = dedup_paragraphs(_mk(spark, rows).repartition(16), seg_words=4)
    assert (sorted(tuple(r) for r in a.collect())
            == sorted(tuple(r) for r in b.collect()))
