"""Deliberately skewed fixture (SURVEY.md §7 'Hard parts'): one
conversation with 30k turns next to hundreds of tiny ones. The salted
multi-phase aggregation must stay exactly correct — and the giant
conversation's phase-1 work must actually fan out across salt buckets.
"""

from __future__ import annotations

import random

import pandas as pd
import pytest

from curator_spark import schema
from curator_spark.fixtures import part_of
from curator_spark.models.corpus import make_text
from curator_spark.oracle.pipeline_pandas import run_oracle
from curator_spark.pipeline import SALT_BUCKETS, run_pipeline_df


@pytest.fixture(scope="module")
def skewed_pdf():
    rng = random.Random("skew-fixture")
    rows = []
    for t in range(30_000):  # the monster conversation
        role = "user" if t % 2 == 0 else "assistant"
        rows.append(("conv-giant", t, role, make_text(rng, "en", 1)))
    for c in range(300):     # the long tail
        for t in range(rng.randint(2, 6)):
            role = "user" if t % 2 == 0 else "assistant"
            rows.append((f"conv-{c:04d}", t, role, make_text(rng, "en", 1)))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["tool"] = pd.Series([None] * len(pdf), dtype="string")
    pdf["ts"] = pd.Timestamp("2025-06-01")
    pdf["part"] = pdf["conv_id"].map(lambda c: part_of(c, 8)).astype("int32")
    return pdf[[f.name for f in schema.TRANSCRIPTS_SCHEMA.fields]]


def test_skewed_pipeline_exact(spark, skewed_pdf, tmp_path):
    from curator_spark.fixtures import to_spark_parquet
    p = str(tmp_path / "skew.parquet")
    to_spark_parquet(skewed_pdf, p)
    df = spark.read.schema(schema.TRANSCRIPTS_SCHEMA).parquet(p)
    got = (run_pipeline_df(df).orderBy("conv_id", "turn_idx")
           .toPandas().reset_index(drop=True))
    want = run_oracle(skewed_pdf)
    assert len(got) == len(want)
    assert (got["keep"].to_numpy() == want["keep"].to_numpy()).all()
    assert (got["conv_n_turns"].to_numpy() == want["conv_n_turns"].to_numpy()).all()
    assert (abs(got["conv_mean_ppl"] - want["conv_mean_ppl"]) < 1e-5).all()
    assert (got["conv_lang"].to_numpy() == want["conv_lang"].to_numpy()).all()
    # the giant conversation's aggregate is right
    g = got[got.conv_id == "conv-giant"].iloc[0]
    assert g.conv_n_turns == 30_000 and abs(g.role_balance - 0.5) < 1e-9


def test_salt_fans_out_giant_conversation(spark, skewed_pdf, tmp_path):
    """Phase-1 groups for the giant conv == SALT_BUCKETS distinct keys
    (per lang) — i.e. no single reducer sees all 30k turns."""
    from pyspark.sql import functions as F
    df = spark.createDataFrame(skewed_pdf)
    salted = df.filter(F.col("conv_id") == "conv-giant").select(
        F.pmod(F.col("turn_idx"), F.lit(SALT_BUCKETS)).alias("salt"))
    per_salt = salted.groupBy("salt").count().collect()
    assert len(per_salt) == SALT_BUCKETS
    counts = [r["count"] for r in per_salt]
    assert max(counts) <= 2 * min(counts)  # even fan-out
