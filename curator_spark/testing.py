"""Contract doubles for object-store adapter development.

`FakeS3Client` is an in-process stand-in for the slice of the boto3 S3
client surface `checkpoint.S3Store` drives — `put_object` with
`IfNoneMatch="*"` — answering with S3's documented status codes (200 /
412 PreconditionFailed / 409 ConditionalRequestConflict / 5xx) raised
in botocore's ClientError response shape. Objects land at their key as
LOCAL FILES (key = the ledger path minus its leading slash), so
everything else in the package — plain `open()` reads of commit files,
parquet scans — works unchanged while every PUBLISH goes through the
S3 adapter's conditional-put handling. The conditional check itself is
made atomic with the same create-exclusive primitive (`os.link` from a
fsynced temp) a real store serializes server-side, so REAL
multi-process races through this fake exercise exactly the 412-loser
path a real bucket would produce.

Failure injection (deterministic, per key):
* `inject_conflicts=N` — the first N conditional PUTs of each key
  raise 409 ConditionalRequestConflict, the answer S3 gives EVERY
  in-flight writer when conditional PUTs race; the adapter must retry,
  not give up (a non-retrying adapter would leave no winner at all).
* `inject_5xx=N` — the first N PUTs of each key raise 500
  InternalError (standard transient-retry guidance).
Both knobs also read from env (CURATOR_SPARK_FAKE_S3_409 /
CURATOR_SPARK_FAKE_S3_500) so subprocess writers — the real-race
suites — inject without plumbing arguments.
"""

from __future__ import annotations

import os
import threading


class FakeClientError(Exception):
    """botocore.exceptions.ClientError's duck type: carries the
    `.response` dict (Error.Code + ResponseMetadata.HTTPStatusCode)
    that S3Store classifies on."""

    def __init__(self, code: str, status: int, message: str = "") -> None:
        super().__init__(f"{code} ({status}): {message}")
        self.response = {
            "Error": {"Code": code, "Message": message},
            "ResponseMetadata": {"HTTPStatusCode": status},
        }


class FakeS3Client:
    def __init__(self, inject_conflicts: int = 0,
                 inject_5xx: int = 0) -> None:
        self.inject_conflicts = int(
            inject_conflicts
            or os.environ.get("CURATOR_SPARK_FAKE_S3_409", 0))
        self.inject_5xx = int(
            inject_5xx or os.environ.get("CURATOR_SPARK_FAKE_S3_500", 0))
        self._attempts: dict[str, int] = {}
        self._lock = threading.Lock()
        self.put_calls = 0

    def put_object(self, Bucket: str, Key: str, Body: bytes,
                   IfNoneMatch: str | None = None, **_kw) -> dict:
        with self._lock:
            self.put_calls += 1
            n = self._attempts[Key] = self._attempts.get(Key, 0) + 1
        if n <= self.inject_5xx:
            raise FakeClientError("InternalError", 500,
                                  "We encountered an internal error.")
        if IfNoneMatch == "*" and \
                self.inject_5xx < n <= self.inject_5xx \
                + self.inject_conflicts:
            raise FakeClientError(
                "ConditionalRequestConflict", 409,
                "A conflicting conditional operation is in progress "
                "against this resource.")

        path = "/" + Key.lstrip("/")
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        if IfNoneMatch == "*":
            # atomic create-exclusive: full content or nothing, one
            # winner per name — the server-side guarantee under test
            import uuid
            tmp = os.path.join(d, f".s3put-{uuid.uuid4().hex}.tmp")
            with open(tmp, "wb") as f:
                f.write(bytes(Body))
                f.flush()
                os.fsync(f.fileno())
            try:
                os.link(tmp, path)
            except FileExistsError:
                raise FakeClientError(
                    "PreconditionFailed", 412,
                    "At least one of the pre-conditions you specified "
                    "did not hold.") from None
            finally:
                os.unlink(tmp)
            return {"ResponseMetadata": {"HTTPStatusCode": 200}}
        # unconditional PUT: last writer wins, atomically
        import uuid
        tmp = os.path.join(d, f".s3put-{uuid.uuid4().hex}.tmp")
        with open(tmp, "wb") as f:
            f.write(bytes(Body))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        return {"ResponseMetadata": {"HTTPStatusCode": 200}}


def local_fake_s3_store():
    """Default factory for CURATOR_SPARK_ATOMIC_STORE=s3 (see
    checkpoint._s3_store_from_env): the S3 adapter over the local
    fake, fast backoff so injected-conflict retries don't slow
    suites."""
    from .checkpoint import S3Store
    return S3Store(FakeS3Client(), bucket="local",
                   backoff_base=0.002)
