"""Deterministic synthetic transcripts fixture generator (FIXTURES.md §1).

Mirrors the reference's fixture style — tiny deterministic parquet
inputs (reference: tests/conftest.py:51-64) — scaled up with the skew /
junk / PII mixture the quality-filter pipeline must exercise:

* skewed conversation sizes (~95% 2–12 turns, ~4% 30–120, ~1% 400–1500)
  to exercise the salted groupBy;
* ~10% non-English turns for langid;
* junk turns (repeated lines, symbol soup, ultra-short, digit soup) for
  the Gopher/C4 rules;
* embedded PII (emails, phones, SSNs, API keys, fake slurs) for the
  scrub exact-match tests;
* ~1% invalid roles for structure validation.

Pure function of (seed, n_turns_target, n_parts) → identical bytes for
the pandas oracle and the Spark pipeline.
"""

from __future__ import annotations

import hashlib
import random
from datetime import datetime, timedelta

import pandas as pd

from .models.corpus import LANGS, make_text

BASE_TS = datetime(2025, 6, 1, 0, 0, 0)


def part_of(conv_id: str, n_parts: int) -> int:
    """Stable Iceberg-style bucket: md5(conv_id) % n_parts (builtin hash()
    is salted per-process — never use it for partitioning)."""
    return int(hashlib.md5(conv_id.encode()).hexdigest(), 16) % n_parts


def _pii_snippet(rng: random.Random) -> str:
    kind = rng.randrange(6)
    if kind == 0:
        return f"contact me at user{rng.randrange(999)}@example{rng.randrange(9)}.com"
    if kind == 1:
        return f"my ssn is {rng.randrange(100,999)}-{rng.randrange(10,99)}-{rng.randrange(1000,9999)}"
    if kind == 2:
        return f"call {rng.randrange(200,999)}-{rng.randrange(200,999)}-{rng.randrange(1000,9999)}"
    if kind == 3:
        key = "".join(rng.choice("abcdefABCDEF0123456789") for _ in range(24))
        return f"use key sk-{key} for auth"
    if kind == 4:
        return f"server at {rng.randrange(1,255)}.{rng.randrange(255)}.{rng.randrange(255)}.{rng.randrange(1,255)} port 8080"
    return f"card {rng.randrange(4000,4999)} {rng.randrange(1000,9999)} {rng.randrange(1000,9999)} {rng.randrange(1000,9999)}"


def _junk_text(rng: random.Random) -> str:
    kind = rng.randrange(4)
    if kind == 0:  # repeated lines
        line = make_text(rng, "en", 1)
        return "\n".join([line] * rng.randint(4, 10))
    if kind == 1:  # symbol soup
        return "".join(rng.choice("!@#$%^&*()[]{}<>~|\\/+=_-") for _ in range(rng.randint(40, 160)))
    if kind == 2:  # ultra short
        return rng.choice(["ok", "k", "yes", "??", "...", "hm"])
    # digit soup
    return " ".join(str(rng.randrange(10**6)) for _ in range(rng.randint(10, 40)))


def _turn_text(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.08:
        return _junk_text(rng)
    if r < 0.18:
        lang = rng.choice([l for l in LANGS if l != "en"])
        return make_text(rng, lang, rng.randint(1, 4))
    text = make_text(rng, "en", rng.randint(1, 5))
    r2 = rng.random()
    if r2 < 0.10:
        text = text + " " + _pii_snippet(rng)
    elif r2 < 0.13:
        words = text.split()
        words.insert(rng.randrange(len(words)),
                     rng.choice(["frakkit", "glorbax", "smeghead", "zarking"]))
        text = " ".join(words)
    return text


def _conv_len(rng: random.Random) -> int:
    r = rng.random()
    if r < 0.95:
        return rng.randint(2, 12)
    if r < 0.99:
        return rng.randint(30, 120)
    return rng.randint(400, 1500)


def generate_transcripts(n_turns_target: int, seed: int = 42,
                         n_parts: int = 8) -> pd.DataFrame:
    """Generate ~n_turns_target transcript rows (stops after the
    conversation that crosses the target)."""
    rng = random.Random(f"transcripts-{seed}")
    rows: list[tuple] = []
    conv_i = 0
    while len(rows) < n_turns_target:
        conv_id = f"conv-{seed:04d}-{conv_i:08d}"
        conv_i += 1
        n = _conv_len(rng)
        conv_base = BASE_TS + timedelta(minutes=conv_i * 7)
        has_system = rng.random() < 0.10
        for t in range(n):
            if t == 0 and has_system:
                role = "system"
            elif rng.random() < 0.05 and t > 0:
                role = "tool"
            elif rng.random() < 0.01:
                role = rng.choice(["bot", "agent", "USER", ""])
            else:
                role = "user" if (t - int(has_system)) % 2 == 0 else "assistant"
            tool = f"tool_{rng.randrange(8)}" if role == "tool" else None
            text = _turn_text(rng)
            ts = conv_base + timedelta(seconds=t * rng.randint(5, 90))
            rows.append((conv_id, t, role, text, tool, ts))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["part"] = pdf["conv_id"].map(lambda c: part_of(c, n_parts)).astype("int32")
    return pdf


def to_spark_parquet(pdf: pd.DataFrame, path: str) -> None:
    """Write a pandas frame as Spark-readable parquet (µs timestamps —
    Spark's vectorized reader rejects pandas' default ns INT64)."""
    pdf.to_parquet(path, index=False, coerce_timestamps="us",
                   allow_truncated_timestamps=True)


def write_transcripts_parquet(path: str, n_turns_target: int, seed: int = 42,
                              n_parts: int = 8) -> pd.DataFrame:
    """Materialize the fixture as a single parquet file (the `part` column
    carries the Iceberg-style bucket; directory partitioning is applied by
    the pipeline's writer, not here)."""
    pdf = generate_transcripts(n_turns_target, seed=seed, n_parts=n_parts)
    to_spark_parquet(pdf, path)
    return pdf
