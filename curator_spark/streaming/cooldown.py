"""Rate-limit cooldown for micro-batch sinks (SURVEY §2.a A20).

The reference pauses its dispatch loop when the upstream service
rate-limits it: on a 429 the whole request pump sleeps
`seconds_to_pause_on_rate_limit`, then resumes where it left off
(reference: base_online_request_processor.py back-off handling and the
status tracker's rate-limit pause accounting,
online_status_tracker.py:290-388). In a Spark Structured Streaming
job the equivalent pressure point is the SINK: an external store
(object store, warehouse, feature store) throttles the micro-batch
write. Spark's own answer — task retry — is wrong for rate limits:
retries hammer the throttled service harder and burn task attempts.

`with_cooldown` wraps a foreachBatch body with driver-side cooldown
semantics instead:

* a TRANSIENT failure (classified by `is_transient`, default:
  `RateLimitedError` or an exception whose message mentions a
  throttling signature — 429 / "rate limit" / "throttl" / 503 /
  "slow down") pauses the WHOLE stream (foreachBatch runs on the
  driver; while it sleeps no new trigger fires — admission stops, like
  the reference's paused pump) for `seconds * backoff**attempt`,
  capped at `max_sleep`, then re-runs the SAME epoch body;
* exactly-once is preserved by construction, not by luck: the retry
  re-invokes the body with the same (batch_df, epoch_id), and every
  committed sink in this repo is idempotent per epoch (txn marker +
  content-keyed dedup, see append_stream.py) — a half-applied attempt
  followed by a retry converges to the same table as one clean run;
* a NON-transient failure propagates immediately (fail fast — data
  bugs must not be retried into an infinite pause loop);
* after `max_retries` transient failures the last error propagates and
  the stream fails — at-least-once delivery means a later restart
  replays the epoch; nothing is lost or skipped.

Pauses are recorded in `CooldownPolicy.pauses` (driver-local, one dict
per sleep: epoch, attempt, slept seconds, error class) — the
observability face the reference exposes via its status tracker.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable


class RateLimitedError(Exception):
    """Raise from a sink body to signal 'the store throttled us'."""


_TRANSIENT_MARKERS = ("429", "rate limit", "rate-limit", "ratelimit",
                      "throttl", "503", "slow down", "slowdown",
                      "too many requests")


def default_is_transient(exc: BaseException) -> bool:
    if isinstance(exc, RateLimitedError):
        return True
    msg = str(exc).lower()
    return any(m in msg for m in _TRANSIENT_MARKERS)


@dataclass
class CooldownPolicy:
    """seconds * backoff**attempt, capped at max_sleep, at most
    max_retries sleeps per epoch. Defaults mirror the reference's
    10 s pause with gentle exponential growth."""
    seconds: float = 10.0
    backoff: float = 2.0
    max_sleep: float = 120.0
    max_retries: int = 5
    pauses: list = field(default_factory=list)

    def sleep_for(self, attempt: int) -> float:
        return min(self.seconds * (self.backoff ** attempt), self.max_sleep)


def with_cooldown(sink: Callable, policy: CooldownPolicy | None = None,
                  is_transient: Callable[[BaseException], bool] = default_is_transient,
                  sleep: Callable[[float], None] = time.sleep) -> Callable:
    """Wrap a foreachBatch body `sink(batch_df, epoch_id)` with
    rate-limit cooldown-and-retry. Returns a new body with the same
    signature; pass the POLICY object to read `policy.pauses` after
    the run. `sleep` is injectable so tests never wall-block."""
    pol = policy if policy is not None else CooldownPolicy()

    def _wrapped(batch_df, epoch_id):
        attempt = 0
        while True:
            try:
                return sink(batch_df, epoch_id)
            except BaseException as exc:  # noqa: BLE001 — classified below
                if not is_transient(exc) or attempt >= pol.max_retries:
                    raise
                pause = pol.sleep_for(attempt)
                pol.pauses.append({
                    "epoch": int(epoch_id), "attempt": attempt,
                    "slept_s": pause, "error": type(exc).__name__,
                })
                sleep(pause)
                attempt += 1

    _wrapped.policy = pol
    return _wrapped
