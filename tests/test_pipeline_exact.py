"""Correctness gate: Spark pipeline vs pandas oracle.

Mirrors the reference's golden-output integration style (reference:
tests/integrations/test_all.py:22-23,55-58 — sha256 over the
concatenated output column) plus the BASELINE.json targets:
keep/drop F1 >= 0.99 and exact per-turn scrubbed-text equality under
stable (conv_id, turn_idx) order.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from curator_spark import schema
from curator_spark.oracle.pipeline_pandas import run_oracle
from curator_spark.pipeline import run_pipeline_df


@pytest.fixture(scope="module")
def spark_out(spark, transcripts_path) -> pd.DataFrame:
    df = spark.read.schema(schema.TRANSCRIPTS_SCHEMA).parquet(transcripts_path)
    out = run_pipeline_df(df, broadcast_conv_aggs=True)
    pdf = out.toPandas()
    return pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def oracle_out(transcripts_pdf) -> pd.DataFrame:
    return run_oracle(transcripts_pdf)


def test_row_alignment(spark_out, oracle_out):
    assert len(spark_out) == len(oracle_out) > 0
    assert (spark_out["conv_id"].to_numpy() == oracle_out["conv_id"].to_numpy()).all()
    assert (spark_out["turn_idx"].to_numpy() == oracle_out["turn_idx"].to_numpy()).all()


def test_keep_f1(spark_out, oracle_out):
    y_true = oracle_out["keep"].to_numpy(dtype=bool)
    y_pred = spark_out["keep"].to_numpy(dtype=bool)
    tp = (y_true & y_pred).sum()
    fp = (~y_true & y_pred).sum()
    fn = (y_true & ~y_pred).sum()
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.99, f"keep/drop F1 {f1:.5f} < 0.99 (fp={fp}, fn={fn})"
    # we actually target exact agreement; surface any drift loudly
    assert (y_true == y_pred).all(), (
        f"keep mismatches: {(y_true != y_pred).sum()} rows"
    )


def test_scrubbed_text_exact(spark_out, oracle_out):
    a = spark_out["scrubbed_text"].fillna("").to_numpy()
    b = oracle_out["scrubbed_text"].fillna("").to_numpy()
    mism = (a != b)
    assert not mism.any(), f"{mism.sum()} scrubbed-text mismatches; first: " \
        f"{a[mism.argmax()]!r} vs {b[mism.argmax()]!r}"


def test_golden_hash_matches_oracle(spark_out, oracle_out):
    def h(pdf):
        return hashlib.sha256(
            "\x1e".join(pdf["scrubbed_text"].fillna("")).encode()
        ).hexdigest()
    assert h(spark_out) == h(oracle_out)


def test_score_columns_match(spark_out, oracle_out):
    assert (spark_out["lang"].to_numpy() == oracle_out["lang"].to_numpy()).all()
    pd.testing.assert_series_equal(
        spark_out["ppl"], oracle_out["ppl"], check_exact=False, rtol=1e-9,
        check_names=False)
    pd.testing.assert_series_equal(
        spark_out["conv_mean_ppl"], oracle_out["conv_mean_ppl"],
        check_exact=False, rtol=1e-6, check_names=False)
    assert (spark_out["conv_lang"].to_numpy() == oracle_out["conv_lang"].to_numpy()).all()
    assert (spark_out["role_balance"].to_numpy() == oracle_out["role_balance"].to_numpy()).all()
    assert (spark_out["structure_ok"].to_numpy() == oracle_out["structure_ok"].to_numpy()).all()
    assert (spark_out["conv_pass"].to_numpy() == oracle_out["conv_pass"].to_numpy()).all()
    assert (spark_out["turn_pass"].to_numpy() == oracle_out["turn_pass"].to_numpy()).all()


def test_rule_flags_match(spark_out, oracle_out):
    a = spark_out["rule_flags"].map(lambda x: tuple(x) if x is not None else ())
    b = oracle_out["rule_flags"].map(lambda x: tuple(x) if x is not None else ())
    assert (a.to_numpy() == b.to_numpy()).all()


def test_keep_rate_sane(oracle_out):
    rate = oracle_out["keep"].mean()
    assert 0.3 < rate < 0.97, f"degenerate keep rate {rate}"


def test_staged_shape_matches_inmemory(spark, transcripts_path, tmp_path,
                                       spark_out):
    """run_pipeline_staged (the production/checkpoint shape: scored
    stage materialized to parquet, aggregates from re-scan) must produce
    exactly the same table as the in-memory run_pipeline_df plan."""
    from curator_spark.pipeline import run_pipeline_staged
    df = spark.read.schema(schema.TRANSCRIPTS_SCHEMA).parquet(transcripts_path)
    staged = run_pipeline_staged(spark, df, str(tmp_path / "scored"))
    got = (staged.toPandas()
           .sort_values(["conv_id", "turn_idx"], kind="mergesort")
           .reset_index(drop=True))
    assert list(got.columns) == list(spark_out.columns)
    for col in ("conv_id", "turn_idx", "keep", "scrubbed_text", "lang",
                "conv_lang", "conv_pass", "turn_pass", "role_balance"):
        assert (got[col].fillna("") .to_numpy()
                == spark_out[col].fillna("").to_numpy()).all(), col
