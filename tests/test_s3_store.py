"""S3 conditional-put adapter (checkpoint.S3Store): response
classification against an injected client — 412 is an honest loss,
409 ConditionalRequestConflict and 5xx retry with backoff, anything
else raises. The cross-store protocol proofs live in
test_concurrent_writers.py / test_ledger_properties.py, which run the
full ledger suites over this adapter (store name "s3")."""

from __future__ import annotations

import pytest

from curator_spark.checkpoint import ATOMIC_STORES, S3Store
from curator_spark.testing import FakeClientError, FakeS3Client


def _store(client, **kw):
    kw.setdefault("sleep", lambda s: None)  # no real backoff in units
    return S3Store(client, bucket="b", **kw)


def test_winner_then_412_loser(tmp_path):
    c = FakeS3Client()
    s = _store(c)
    p = str(tmp_path / "v1.json")
    assert s.put_if_absent(p, b"first") is True
    assert s.put_if_absent(p, b"second") is False  # 412 → False
    with open(p, "rb") as f:
        assert f.read() == b"first"  # the winner's full content


def test_409_conflict_retries_to_win(tmp_path):
    c = FakeS3Client(inject_conflicts=3)
    s = _store(c)
    p = str(tmp_path / "v1.json")
    assert s.put_if_absent(p, b"data") is True
    assert c.put_calls == 4  # 3 × 409, then 200


def test_5xx_retries_then_succeeds(tmp_path):
    c = FakeS3Client(inject_5xx=2)
    s = _store(c)
    p = str(tmp_path / "v1.json")
    assert s.put_if_absent(p, b"data") is True
    assert c.put_calls == 3


def test_retries_exhausted_raises(tmp_path):
    c = FakeS3Client(inject_conflicts=100)
    s = _store(c, max_retries=3)
    with pytest.raises(FakeClientError, match="Conflict"):
        s.put_if_absent(str(tmp_path / "v1.json"), b"data")
    assert c.put_calls == 4  # initial + 3 retries


def test_non_retryable_raises_immediately():
    class Denied:
        def put_object(self, **_kw):
            raise FakeClientError("AccessDenied", 403, "no")

    s = _store(Denied())
    with pytest.raises(FakeClientError, match="AccessDenied"):
        s.put_if_absent("/x/v1.json", b"data")


def test_non_s3_exception_propagates():
    class Broken:
        def put_object(self, **_kw):
            raise ConnectionResetError("socket died")

    s = _store(Broken())
    with pytest.raises(ConnectionResetError):
        s.put_if_absent("/x/v1.json", b"data")


def test_backoff_schedule_is_capped_exponential(tmp_path):
    sleeps: list[float] = []
    c = FakeS3Client(inject_conflicts=7)
    s = S3Store(c, bucket="b", backoff_base=0.05,
                sleep=sleeps.append)
    assert s.put_if_absent(str(tmp_path / "v.json"), b"d") is True
    assert sleeps == [0.05, 0.1, 0.2, 0.4, 0.8, 1.6, 2.0]  # capped


def test_key_mapping_injectable():
    seen = {}

    class Capture:
        def put_object(self, Bucket, Key, Body, **_kw):
            seen.update(bucket=Bucket, key=Key, body=bytes(Body))

    s = S3Store(Capture(), bucket="curated",
                key_for=lambda p: "tables/run1/" + p.split("/")[-1])
    assert s.put_if_absent("/local/out/_commitlog/v000000000001.json",
                           b"{}") is True
    assert seen == {"bucket": "curated",
                    "key": "tables/run1/v000000000001.json",
                    "body": b"{}"}


def test_registry_builds_adapter_from_env(monkeypatch, tmp_path):
    """CURATOR_SPARK_ATOMIC_STORE=s3 resolves through the factory env
    seam; the default factory is the local contract double."""
    monkeypatch.delenv("CURATOR_SPARK_S3_FACTORY", raising=False)
    store = ATOMIC_STORES["s3"]()
    assert isinstance(store, S3Store)
    p = str(tmp_path / "v1.json")
    assert store.put_if_absent(p, b"x") is True
    assert store.put_if_absent(p, b"y") is False
