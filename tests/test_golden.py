"""Golden-oracle drift guard: the committed golden parquets must equal
what tools/make_golden.py would regenerate today. A change to the
scorer models, scrub rules, chunking, or multimodal kernels that
forgets `python tools/make_golden.py` fails HERE instead of surfacing
as a hash-mismatch in the driver's correctness gate."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from tools.make_golden import GOLDEN_DIR, golden_q00, golden_q30

SF0001 = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF0001), reason="testdata absent")
def test_q00_golden_in_sync():
    committed = pq.read_table(os.path.join(GOLDEN_DIR, "q00_sf0.001.parquet"))
    assert golden_q00(SF0001).equals(committed)


def test_q30_golden_in_sync():
    committed = pq.read_table(os.path.join(GOLDEN_DIR, "q30.parquet"))
    assert golden_q30().equals(committed)
