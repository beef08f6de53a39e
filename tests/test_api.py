"""QualityFilter API: curator's call-shape on Spark (construct → call →
curated dataset; caching underneath). Mirrors the reference's cache
tests (tests/unittests/test_caching.py:12-26: same input ⇒ cache hit,
different params ⇒ miss)."""

from __future__ import annotations

import pytest

from curator_spark import fixtures, schema
from curator_spark.api import QualityFilter


def test_ephemeral_dataframe_call(spark, transcripts_path):
    df = spark.read.schema(schema.TRANSCRIPTS_SCHEMA).parquet(transcripts_path)
    out = QualityFilter()(df)
    assert "keep" in out.columns and "scrubbed_text" in out.columns
    n = out.count()
    assert 0 < out.filter("keep").count() < n


def test_durable_run_memoizes(spark, tmp_path):
    inp = str(tmp_path / "t.parquet")
    fixtures.write_transcripts_parquet(inp, 1200, seed=19, n_parts=4)
    qf = QualityFilter(cache_dir=str(tmp_path / "cache"))
    out1 = qf(input_path=inp, spark=spark)
    run1 = dict(qf.last_run)
    assert not run1["memoized"] and out1.count() > 0

    out2 = qf(input_path=inp, spark=spark)
    assert qf.last_run["memoized"]
    assert out2.count() == out1.count()

    m = qf.metrics(spark)
    assert m is not None and m.count() == 4  # one row per part

    # param change → different fingerprint → fresh run dir
    qf2 = QualityFilter(cache_dir=str(tmp_path / "cache"), params={"v": 2})
    qf2(input_path=inp, spark=spark)
    assert qf2.last_run["run_id"] != run1["run_id"]
    assert not qf2.last_run["memoized"]


def test_call_contract():
    qf = QualityFilter()
    with pytest.raises(ValueError):
        qf()
    with pytest.raises(ValueError):
        qf(input_path="/x")  # no cache_dir
