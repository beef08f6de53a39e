"""models/unigram: Viterbi segmentation properties (pure Python) and
the distributed Viterbi-EM trainer (determinism + coverage +
golden-replay agreement on a tiny corpus)."""

from __future__ import annotations

import math

from curator_spark.models.unigram import (seed_pieces, train_unigram,
                                          viterbi_segment)


def test_viterbi_prefers_likelier_pieces():
    scores = {"ab": math.log(0.4), "a": math.log(0.1),
              "b": math.log(0.1), "c": math.log(0.4)}
    assert viterbi_segment("abc", scores, 4) == ["ab", "c"]
    # log(0.4)+log(0.4) > log(.1)*2+log(.4): two pieces win


def test_viterbi_tie_prefers_fewer_then_lex():
    # equal piece scores → fewer pieces wins
    s = {p: math.log(0.25) for p in ("a", "b", "ab", "ba")}
    assert viterbi_segment("ab", s, 4) == ["ab"]
    # forced tie between equal-length segmentations → lex-smaller
    # final piece: "aab" as a|ab vs aa|b (add "aa" at same score)
    s2 = {p: math.log(0.2) for p in ("a", "b", "aa", "ab")}
    got = viterbi_segment("aab", s2, 4)
    assert got == ["a", "ab"]  # 'ab' < 'b' at the last split


def test_viterbi_unseen_char_penalized_not_fatal():
    s = {"a": math.log(0.5)}
    assert viterbi_segment("axa", s, 4) == ["a", "x", "a"]


def test_seed_includes_all_singles(spark):
    words = spark.createDataFrame([("abc", 3), ("bcd", 1)],
                                  "word string, cnt long")
    got = {r["piece"]: r["count"] for r in
           seed_pieces(words, max_piece_len=3, seed_size=2).collect()}
    # singles always present regardless of the seed_size cut
    for ch in "abcd":
        assert ch in got
    assert got["b"] == 4 and got["c"] == 4
    # only the top-2 multi-char pieces survive
    assert sum(1 for p in got if len(p) > 1) == 2
    assert got["bc"] == 4  # the most frequent bigram made the cut


def test_train_is_partitioning_invariant_and_covers(spark):
    rows = [(f"w{i}", "alpha beta gamma alphabet betagamma "
                      f"alpha{i % 3}") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    from curator_spark.models.bpe import word_counts
    outs = []
    for parts in (1, 8):
        wc = word_counts(docs.repartition(parts))
        outs.append(train_unigram(wc, vocab_size=24, max_piece_len=3,
                                  seed_size=40, em_rounds=2))
    assert outs[0] == outs[1]
    vocab = {p for p, _, _ in outs[0]}
    # coverage: every char of every tokenized word ([A-Za-z]+ per
    # word_counts) is a piece → any word stays segmentable
    import re
    corpus_chars = {ch for r in rows
                    for w in re.findall("[A-Za-z]+", r[1])
                    for ch in w.lower()}
    assert corpus_chars <= vocab
    scores = {p: lp / 1e6 for p, _, lp in outs[0]}
    for w in ("alphabet", "betagamma", "alpha"):
        segs = viterbi_segment(w, scores, 3)
        assert "".join(segs) == w


def test_train_matches_pure_python_replay(spark):
    """Inline independent replay (the make_golden spec) must equal the
    distributed trainer exactly — counts, log-prob micros, order."""
    import collections
    import re
    rows = [(i, "spark table merge row scan spark merge "
                f"tail{i % 5}") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from curator_spark.models.bpe import word_counts
    got = train_unigram(word_counts(docs), vocab_size=32,
                        max_piece_len=3, seed_size=64, em_rounds=2)

    words: collections.Counter = collections.Counter()
    for _, text in rows:
        for w in re.findall("[A-Za-z]+", text):
            words[w.lower()] += 1
    sub: collections.Counter = collections.Counter()
    for w, c in words.items():
        for i in range(len(w)):
            for j in range(i + 1, min(len(w), i + 3) + 1):
                sub[w[i:j]] += c
    counts = dict(sorted(((p, c) for p, c in sub.items() if len(p) > 1),
                         key=lambda pc: (-pc[1], pc[0]))[:64])
    counts.update({p: c for p, c in sub.items() if len(p) == 1})

    def logprobs(cnts):
        total = sum(cnts[p] for p in sorted(cnts))
        return {p: (math.log(cnts[p] / total) if cnts[p] > 0 else -100.0)
                for p in sorted(cnts)}

    for _ in range(2):
        scores = logprobs(counts)
        est: collections.Counter = collections.Counter()
        for w, c in words.items():
            for piece in viterbi_segment(w, scores, 3):
                est[piece] += c
        singles_prev = {p: counts[p] for p in counts if len(p) == 1}
        merged = dict(est)
        for p in singles_prev:
            merged.setdefault(p, 0)
        n_singles = sum(1 for p in merged if len(p) == 1)
        n_multi = sum(1 for p in merged if len(p) > 1)
        target = max(32 - n_singles, int(n_multi * 0.75))
        keep = sorted(((p, c) for p, c in merged.items() if len(p) > 1),
                      key=lambda pc: (-pc[1], pc[0]))[:target]
        counts = dict(keep)
        counts.update({p: merged[p] for p in merged if len(p) == 1})
    singles = {p: c for p, c in counts.items() if len(p) == 1}
    multi = sorted(((p, c) for p, c in counts.items() if len(p) > 1),
                   key=lambda pc: (-pc[1], pc[0]))
    final = dict(multi[:max(32 - len(singles), 0)])
    final.update(singles)
    scores = logprobs(final)
    expect = [(p, final[p], round(scores[p] * 1e6)) for p in final]
    expect.sort(key=lambda t: (-t[1], t[0]))
    assert got == expect
