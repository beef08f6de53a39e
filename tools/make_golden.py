#!/usr/bin/env python
"""Generate the committed golden-parquet oracles for the two queries
whose payloads are Python-side (no SQL re-expression): q00 (flagship
quality filter) and q30 (multimodal features).

This is the rebuild's analogue of the reference's golden-hash gate
(reference: tests/integrations/test_all.py:55-58 — pipeline output
hashed against a committed fixture hash): the INDEPENDENT
single-threaded pandas oracle (curator_spark/oracle/pipeline_pandas.py)
is materialized as a parquet fixture, and `oracle_sql()` points DuckDB
at it with read_parquet, so the driver's side-by-side gate
hash-compares the distributed Spark plan against the committed golden —
q00/q30 get the same rows+schema+hash verdict as every SQL query.

Everything here is computed WITHOUT Spark:
* docs→transcripts chunking is re-implemented in pure pandas (checked
  against ingest.docs_to_transcripts only through the final hash);
* conversation orchestration is the pandas oracle (groupby/transform —
  independent of Spark's salted two-phase aggregation);
* q30 features reuse only the leaf decode/entropy helpers (shared by
  design, like the scorer models) with row assembly + fingerprinting
  re-done in plain Python.

Usage: python tools/make_golden.py   (rewrites curator_spark/oracle/golden/)
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from curator_spark.ingest import TURN_TOKENS  # noqa: E402
from curator_spark.oracle.pipeline_pandas import run_oracle  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "curator_spark", "oracle", "golden")
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]


def _round_half_away(x: float, nd: int) -> float:
    """Spark-identical double rounding: F.round goes through
    BigDecimal.valueOf(x) = new BigDecimal(Double.toString(x)) — the
    SHORTEST round-trip decimal repr — then setScale(nd, HALF_UP).
    Python's repr() is the same shortest-round-trip string, so
    Decimal(repr(x)) + ROUND_HALF_UP reproduces it bit-for-bit.
    (Formatting with '%.4f' instead rounds the exact binary expansion,
    which disagrees whenever the shortest repr sits exactly on a tie —
    ~0.6% of ppl values.)"""
    from decimal import ROUND_HALF_UP, Decimal
    q = Decimal(1).scaleb(-nd)
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))


def docs_to_transcripts_pandas(docs: pd.DataFrame) -> pd.DataFrame:
    """Pure-pandas re-implementation of ingest.docs_to_transcripts:
    whitespace-token stream chunked into TURN_TOKENS-token turns
    alternating user/assistant, one conversation per document."""
    rows = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = [t for t in (text or "").split(" ") if t != ""]
        n_turns = max(-(-len(toks) // TURN_TOKENS), 1)
        conv_id = f"doc-{int(doc_id):010d}"
        for pos in range(n_turns):
            chunk = " ".join(toks[pos * TURN_TOKENS:(pos + 1) * TURN_TOKENS])
            rows.append((conv_id, pos,
                         "user" if pos % 2 == 0 else "assistant", chunk))
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"])


def golden_q00(sf_dir: str) -> pa.Table:
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    out = run_oracle(docs_to_transcripts_pandas(docs))
    ppl = out["ppl"].map(lambda x: _round_half_away(x, 4))
    return pa.table({
        "conv_id": pa.array(out["conv_id"], pa.string()),
        "turn_idx": pa.array(out["turn_idx"], pa.int32()),
        "role": pa.array(out["role"], pa.string()),
        "lang": pa.array(out["lang"], pa.string()),
        "ppl": pa.array(ppl, pa.float64()),
        "scrubbed_text": pa.array(out["scrubbed_text"], pa.string()),
        "turn_pass": pa.array(out["turn_pass"], pa.bool_()),
        "conv_lang": pa.array(out["conv_lang"], pa.string()),
        "conv_pass": pa.array(out["conv_pass"], pa.bool_()),
        "keep": pa.array(out["keep"], pa.bool_()),
    })


def golden_q30(n: int = 96, seed: int = 5) -> pa.Table:
    """q30's expected output, assembled row-by-row in plain Python over
    the same deterministic fixture parameters __spark_entry__ uses."""
    from curator_spark.operators.multimodal import (FEATURE_DIM, THUMB_MAX,
                                                    _decode_image,
                                                    _entropy_proxy)
    rows = []
    for i in range(n):
        if i % 3 != 0:          # media_fixture modality cycle: image @ i%3==0
            continue
        h = hashlib.sha256(f"media-{seed}-{i}".encode()).digest()
        blob = bytes(h * (1 + i % 7))
        w, hh = 32 + i % 64, 32 + (i * 7) % 64
        px = _decode_image(blob)
        flat = px.astype(np.float32).ravel()
        pads = -len(flat) % FEATURE_DIM
        feat = np.pad(flat, (0, pads)).reshape(FEATURE_DIM, -1).mean(axis=1)
        feat = (feat / 255.0).astype(np.float32)
        fp = hashlib.md5(
            ",".join(f"{float(x):.6f}" for x in feat).encode()).hexdigest()
        rows.append({
            "media_id": f"m-{i:05d}", "n_bytes": len(blob),
            "sha256": hashlib.sha256(blob).hexdigest(),
            "entropy_proxy": _entropy_proxy(blob),
            "thumb_w": min(w, THUMB_MAX), "thumb_h": min(hh, THUMB_MAX),
            "feature_fp": fp,
        })
    pdf = pd.DataFrame(rows)
    return pa.table({
        "media_id": pa.array(pdf["media_id"], pa.string()),
        "n_bytes": pa.array(pdf["n_bytes"], pa.int64()),
        "sha256": pa.array(pdf["sha256"], pa.string()),
        "entropy_proxy": pa.array(pdf["entropy_proxy"], pa.float64()),
        "thumb_w": pa.array(pdf["thumb_w"], pa.int32()),
        "thumb_h": pa.array(pdf["thumb_h"], pa.int32()),
        "feature_fp": pa.array(pdf["feature_fp"], pa.string()),
    })


def golden_q85(sf_dir: str, n_merges: int = 24) -> pa.Table:
    """Independent pure-Python BPE trainer (no Spark code paths beyond
    the shared merge-fold SPEC, re-written here): Counter-based word
    counts from the same regex pre-tokenizer, pair counting per
    adjacent position weighted by word frequency, argmax with the
    (count desc, left, right) tiebreak, greedy left-to-right merge."""
    import collections
    import re

    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["text"])
    words: collections.Counter = collections.Counter()
    for text in docs["text"]:
        for w in re.findall("[A-Za-z]+", text or ""):
            words[w.lower()] += 1
    syms = {w: tuple(w) for w in words}

    def merge_word(s, a, b, ab):
        out = []
        for x in s:
            if out and out[-1] == a and x == b:
                out[-1] = ab
            else:
                out.append(x)
        return tuple(out)

    merges = []
    for step in range(n_merges):
        pc: collections.Counter = collections.Counter()
        for w, c in words.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        (left, right), cnt = min(pc.items(),
                                 key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((step, left, right, cnt))
        ab = left + right
        for w in list(syms):
            syms[w] = merge_word(syms[w], left, right, ab)
    return pa.table({
        "step": pa.array([m[0] for m in merges], pa.int32()),
        "left": pa.array([m[1] for m in merges], pa.string()),
        "right": pa.array([m[2] for m in merges], pa.string()),
        "pair_count": pa.array([m[3] for m in merges], pa.int64()),
    })


def golden_q86(sf_dir: str, n_merges: int = 24) -> pa.Table:
    """Independent Python tokenizer for q86: per-document subword
    count + order-sensitive fingerprint of the full subword sequence,
    encoding with the SAME merges golden_q85 derives (re-derived here
    so this oracle shares no state with the Spark path)."""
    import collections
    import hashlib
    import re

    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    words: collections.Counter = collections.Counter()
    doc_tokens = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = [w.lower() for w in re.findall("[A-Za-z]+", text or "")]
        doc_tokens[int(doc_id)] = toks
        words.update(toks)
    syms = {w: tuple(w) for w in words}

    def merge_word(s, a, b, ab):
        out = []
        for x in s:
            if out and out[-1] == a and x == b:
                out[-1] = ab
            else:
                out.append(x)
        return tuple(out)

    for step in range(n_merges):
        pc: collections.Counter = collections.Counter()
        for w, c in words.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        (left, right), cnt = min(pc.items(),
                                 key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        ab = left + right
        for w in list(syms):
            syms[w] = merge_word(syms[w], left, right, ab)

    rows = []
    for doc_id, toks in sorted(doc_tokens.items()):
        if not toks:
            continue  # no words → no row (join semantics)
        seq = ["\x1f".join(syms[t]) for t in toks]
        fp = hashlib.md5("\x1e".join(seq).encode()).hexdigest()
        rows.append((doc_id, len(toks),
                     sum(len(syms[t]) for t in toks), fp))
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "n_words": pa.array([r[1] for r in rows], pa.int64()),
        "n_subwords": pa.array([r[2] for r in rows], pa.int64()),
        "subword_fp": pa.array([r[3] for r in rows], pa.string()),
    })


def golden_q92(sf_dir: str) -> pa.Table:
    """Independent pure-Python integer replay of the q92 fixed-point
    logistic-regression train + score (operators/logreg.py). Every
    quantity is a Python int — exact by construction — so the Spark
    plan must match bit-for-bit. Hyperparameters imported from
    queries_web (shared constants, not shared code)."""
    from curator_spark.queries_web import (  # noqa: E402
        LR_DEN, LR_DIM, LR_EPOCHS, LR_SALT, SPAM_WORD)
    MICRO = 1_000_000
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    docs = docs.sort_values("doc_id").reset_index(drop=True)

    def bucket(tok: str) -> int:
        h = hashlib.md5((tok + ":" + LR_SALT).encode()).hexdigest()[:12]
        return int(h, 16) % LR_DIM

    X = []
    for _, r in docs.iterrows():
        toks = [t for t in str(r["text"]).lower().split(" ") if t]
        fx: dict[int, int] = {}
        for t in toks:
            fx[bucket(t)] = fx.get(bucket(t), 0) + 1
        X.append((int(r["doc_id"]), fx, 1 if SPAM_WORD in toks else 0))

    w = [0] * LR_DIM
    b = 0
    best = None  # (n_correct, w, b)
    for _ in range(LR_EPOCHS):
        g = [0] * LR_DIM
        gb = 0
        nc = 0
        n = len(X)
        for _, fx, y in X:
            z = b + sum(w[d] * c for d, c in fx.items())
            p = min(max((z >> 2) + MICRO // 2, 0), MICRO)
            e = p - y * MICRO
            nc += int((p >= MICRO // 2) == (y == 1))
            gb += e
            for d, c in fx.items():
                g[d] += e * c
        if best is None or nc > best[0]:
            best = (nc, list(w), b)
        w = [w[d] - g[d] // (n * LR_DEN) for d in range(LR_DIM)]
        b = b - gb // (n * LR_DEN)
    assert best is not None
    w, b = best[1], best[2]

    out = []
    for doc_id, fx, y in X:
        z = b + sum(w[d] * c for d, c in fx.items())
        p = min(max((z >> 2) + MICRO // 2, 0), MICRO)
        out.append((doc_id, y, z, p, p >= MICRO // 2))
    return pa.table({
        "doc_id": pa.array([r[0] for r in out], pa.int64()),
        "y": pa.array([r[1] for r in out], pa.int32()),
        "z_micro": pa.array([r[2] for r in out], pa.int64()),
        "p_micro": pa.array([r[3] for r in out], pa.int64()),
        "pred": pa.array([r[4] for r in out], pa.bool_()),
    })


def golden_q95(sf_dir: str) -> pa.Table:
    """Independent pure-Python unigram-LM trainer (re-coded from the
    models/unigram.py SPEC: substring seed with all-singles coverage,
    left-to-right Viterbi with the (score, fewer-pieces, lex-smaller
    piece) tie order, integer expected counts, driver-float log-probs
    over sorted pieces, (count desc, piece asc) pruning with immune
    single chars)."""
    import collections
    import math
    import re

    from curator_spark.queries import (  # noqa: E402
        UNI_MAX_PIECE, UNI_ROUNDS, UNI_SEED, UNI_VOCAB)
    MICRO = 1_000_000
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["text"])
    words: collections.Counter = collections.Counter()
    for text in docs["text"]:
        for w in re.findall("[A-Za-z]+", text or ""):
            words[w.lower()] += 1

    # seed: substrings up to UNI_MAX_PIECE weighted by word count
    sub: collections.Counter = collections.Counter()
    for w, c in words.items():
        for i in range(len(w)):
            for j in range(i + 1, min(len(w), i + UNI_MAX_PIECE) + 1):
                sub[w[i:j]] += c
    singles = {p: c for p, c in sub.items() if len(p) == 1}
    multi = sorted(((p, c) for p, c in sub.items() if len(p) > 1),
                   key=lambda pc: (-pc[1], pc[0]))[:UNI_SEED]
    counts = dict(multi)
    counts.update(singles)

    def logprobs(cnts):
        total = sum(cnts[p] for p in sorted(cnts))
        return {p: (math.log(cnts[p] / total) if cnts[p] > 0 else -100.0)
                for p in sorted(cnts)}

    def viterbi(word, scores):
        n = len(word)
        NEG = float("-inf")
        best = [(NEG, 0, "")] * (n + 1)
        best[0] = (0.0, 0, "")
        back = [0] * (n + 1)
        for i in range(1, n + 1):
            cand = None
            cand_j = 0
            for j in range(max(0, i - UNI_MAX_PIECE), i):
                if best[j][0] == NEG:
                    continue
                piece = word[j:i]
                sc = scores.get(piece)
                if sc is None:
                    if i - j > 1:
                        continue
                    sc = -100.0
                key = (best[j][0] + sc, best[j][1] - 1, piece)
                if cand is None or (key[0], key[1]) > (cand[0], cand[1]) \
                        or ((key[0], key[1]) == (cand[0], cand[1])
                            and key[2] < cand[2]):
                    cand = key
                    cand_j = j
            if cand is not None:
                best[i] = cand
                back[i] = cand_j
        out = []
        i = n
        while i > 0:
            out.append(word[back[i]:i])
            i = back[i]
        out.reverse()
        return out

    for _ in range(UNI_ROUNDS):
        scores = logprobs(counts)
        est: collections.Counter = collections.Counter()
        for w, c in words.items():
            for piece in viterbi(w, scores):
                est[piece] += c
        singles_prev = {p: counts[p] for p in counts if len(p) == 1}
        merged = dict(est)
        for p in singles_prev:
            merged.setdefault(p, 0)
        n_singles = sum(1 for p in merged if len(p) == 1)
        n_multi = sum(1 for p in merged if len(p) > 1)
        target = max(UNI_VOCAB - n_singles, int(n_multi * 0.75))
        keep = sorted(((p, c) for p, c in merged.items() if len(p) > 1),
                      key=lambda pc: (-pc[1], pc[0]))[:target]
        counts = dict(keep)
        counts.update({p: merged[p] for p in merged if len(p) == 1})

    singles = {p: c for p, c in counts.items() if len(p) == 1}
    multi = sorted(((p, c) for p, c in counts.items() if len(p) > 1),
                   key=lambda pc: (-pc[1], pc[0]))
    room = max(UNI_VOCAB - len(singles), 0)
    final = dict(multi[:room])
    final.update(singles)
    scores = logprobs(final)
    out = [(p, final[p], round(scores[p] * MICRO)) for p in final]
    out.sort(key=lambda t: (-t[1], t[0]))
    return pa.table({
        "piece": pa.array([r[0] for r in out], pa.string()),
        "count": pa.array([r[1] for r in out], pa.int64()),
        "logp_micro": pa.array([r[2] for r in out], pa.int64()),
        "rank": pa.array(list(range(1, len(out) + 1)), pa.int32()),
    })


def main() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for sf_dir in SF_DIRS:
        tag = os.path.basename(sf_dir.rstrip("/"))
        tbl = golden_q00(sf_dir)
        out = os.path.join(GOLDEN_DIR, f"q00_{tag}.parquet")
        pq.write_table(tbl, out, compression="zstd")
        print(f"{out}: {tbl.num_rows} rows")
    tbl = golden_q30()
    out = os.path.join(GOLDEN_DIR, "q30.parquet")
    pq.write_table(tbl, out, compression="zstd")
    print(f"{out}: {tbl.num_rows} rows")
    for sf_dir in SF_DIRS:
        tag = os.path.basename(sf_dir.rstrip("/"))
        tbl = golden_q85(sf_dir)
        out = os.path.join(GOLDEN_DIR, f"q85_{tag}.parquet")
        pq.write_table(tbl, out, compression="zstd")
        print(f"{out}: {tbl.num_rows} rows")
        tbl = golden_q86(sf_dir)
        out = os.path.join(GOLDEN_DIR, f"q86_{tag}.parquet")
        pq.write_table(tbl, out, compression="zstd")
        print(f"{out}: {tbl.num_rows} rows")
        tbl = golden_q92(sf_dir)
        out = os.path.join(GOLDEN_DIR, f"q92_{tag}.parquet")
        pq.write_table(tbl, out, compression="zstd")
        print(f"{out}: {tbl.num_rows} rows")
        tbl = golden_q95(sf_dir)
        out = os.path.join(GOLDEN_DIR, f"q95_{tag}.parquet")
        pq.write_table(tbl, out, compression="zstd")
        print(f"{out}: {tbl.num_rows} rows")


if __name__ == "__main__":
    main()
