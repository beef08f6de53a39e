"""Shared pytest fixtures: one local SparkSession + deterministic
transcripts fixtures (FIXTURES.md §1), mirroring the reference's
conftest-provided parquet fixtures (reference: tests/conftest.py:51-64).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from curator_spark import fixtures  # noqa: E402
from curator_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("curator-spark-tests", parallelism=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts_pdf():
    """~5k-turn deterministic transcripts frame (seed=42)."""
    return fixtures.generate_transcripts(5000, seed=42, n_parts=8)


@pytest.fixture(scope="session")
def transcripts_path(tmp_path_factory, transcripts_pdf):
    p = tmp_path_factory.mktemp("fixture") / "transcripts.parquet"
    fixtures.to_spark_parquet(transcripts_pdf, str(p))
    return str(p)
