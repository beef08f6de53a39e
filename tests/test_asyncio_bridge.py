"""Event-loop bridge (A30) + fd-limit raise (A32): the reference's
asyncio dispatch lifecycle — concurrency gate, rate admission,
retry-then-error-row — running inside executor workers over Arrow
batches."""

from __future__ import annotations

import pytest

from curator_spark.asyncio_bridge import TokenBucket, run_async_payload


def test_token_bucket_schedule_deterministic():
    """Pure-logic check with a fake clock: burst capacity drains, then
    acquisitions are spaced at 1/rate."""
    now = [0.0]
    b = TokenBucket(rate=10.0, capacity=2.0, clock=lambda: now[0])
    assert b.try_acquire() == 0.0 and b.try_acquire() == 0.0  # burst
    w = b.try_acquire()
    assert w == pytest.approx(0.1)          # empty: next token in 1/rate
    now[0] += 0.1
    assert b.try_acquire() == 0.0           # refilled exactly one
    now[0] += 1.0                            # long idle
    assert b.try_acquire() == 0.0 and b.try_acquire() == 0.0
    assert b.try_acquire() > 0.0            # capacity caps the burst at 2


def test_async_payload_rows_and_errors(spark):
    """Happy rows get responses in input order; a poison row becomes an
    error row after retries; concurrency stays under the gate."""

    async def payload(row: dict) -> dict:
        import asyncio
        global _inflight, _peak
        try:
            _inflight += 1
        except NameError:
            _inflight, _peak = 1, 0
        _peak = max(_peak, _inflight)
        await asyncio.sleep(0.001)
        try:
            if row["text"] == "POISON":
                raise RuntimeError("remote refused")
            return {"reply": row["text"][::-1], "n": len(row["text"]),
                    "peak": _peak}
        finally:
            _inflight -= 1

    df = spark.createDataFrame(
        [(i, "POISON" if i == 7 else f"msg-{i:02d}") for i in range(20)],
        ["rid", "text"]).coalesce(1)
    out = run_async_payload(
        df, payload, [("reply", "string"), ("n", "long"),
                      ("peak", "long")],
        max_concurrency=3, max_retries=1).collect()
    rows = {r["rid"]: r for r in out}
    assert len(rows) == 20
    for i in range(20):
        r = rows[i]
        if i == 7:
            assert r["reply"] is None and "remote refused" in r["errors"]
        else:
            assert r["errors"] is None
            assert r["reply"] == f"msg-{i:02d}"[::-1] and r["n"] == 6
    # the semaphore bounded in-flight payloads inside the worker
    assert max(r["peak"] for r in out if r["peak"] is not None) <= 3


def test_async_payload_rate_limited_still_completes(spark):
    """With a tiny rate the batch still drains fully (admission slows,
    never starves) and order is preserved."""

    async def payload(row: dict) -> dict:
        return {"echo": row["text"]}

    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(6)], ["rid", "text"]).coalesce(1)
    out = run_async_payload(df, payload, [("echo", "string")],
                            max_concurrency=2,
                            requests_per_second=200.0).collect()
    assert [r["echo"] for r in sorted(out, key=lambda r: r["rid"])] \
        == [f"t{i}" for i in range(6)]
    assert all(r["errors"] is None for r in out)


def test_fd_limit_raised():
    import resource

    from curator_spark.session import raise_fd_limit
    old, new = raise_fd_limit(4096)
    soft, hard = resource.getrlimit(resource.RLIMIT_NOFILE)
    cap = 4096 if hard == resource.RLIM_INFINITY else min(4096, hard)
    assert soft >= min(cap, new)
    assert new >= old


def test_capacity_blocking_bounds_inflight_tokens(spark):
    """A18 semantics: dispatch reserves the MVA estimate and blocks at
    the token cap — with 600-token responses and a 1000-token cap the
    admitted concurrency collapses to 1 once the estimator warms, even
    though the semaphore would allow 8."""

    async def payload(row: dict) -> dict:
        import asyncio
        global _cap_inflight, _cap_peak
        try:
            _cap_inflight += 1
        except NameError:
            _cap_inflight, _cap_peak = 1, 0
        _cap_peak = max(_cap_peak, _cap_inflight)
        await asyncio.sleep(0.002)
        _cap_inflight -= 1
        return {"tokens": 600, "peak": _cap_peak}

    df = spark.createDataFrame(
        [(i,) for i in range(12)], ["rid"]).coalesce(1)
    out = run_async_payload(
        df, payload, [("tokens", "long"), ("peak", "long")],
        max_concurrency=8, capacity_tokens=1000.0,
        tokens_field="tokens", default_estimate=500.0).collect()
    assert len(out) == 12 and all(r["errors"] is None for r in out)
    # seed estimate 500 admits 2 at once; after the first completions
    # the 600-token MVA forces 1000//600 = 1 — never the semaphore's 8
    assert max(r["peak"] for r in out) <= 2
    # rows completed under capacity pressure in order
    assert [r["rid"] for r in out] == list(range(12))


def test_capacity_gate_no_residue_deadlock(spark):
    """Regression (round-4 advice): interleaved float add/sub of
    estimates leaves state['inflight'] with a ~1e-17 positive residue
    after all tasks finish; a later dispatch whose MVA estimate alone
    exceeds capacity_tokens must still be admitted (no-starvation),
    which a sum-only gate (`inflight > 0.0`) denies forever.

    Repro shape: seed estimate 0.1 admits several tasks concurrently
    (their add/sub order leaves the residue); every completion reports
    50 tokens, so the warmed MVA (50.0) exceeds capacity (1.0) and all
    later dispatches depend on the count-keyed gate. On the buggy gate
    this hangs; the watchdog thread turns that into a test failure."""
    import threading

    async def payload(row: dict) -> dict:
        import asyncio
        await asyncio.sleep(0.002)
        return {"tokens": 50.0}

    df = spark.createDataFrame([(i,) for i in range(30)],
                               ["rid"]).coalesce(1)
    res: dict = {}

    def _run():
        res["rows"] = run_async_payload(
            df, payload, [("tokens", "double")],
            max_concurrency=8, capacity_tokens=1.0,
            tokens_field="tokens", default_estimate=0.1).collect()

    t = threading.Thread(target=_run, daemon=True)
    t.start()
    t.join(timeout=180)
    assert not t.is_alive(), \
        "capacity gate deadlocked on float residue (regression)"
    assert len(res["rows"]) == 30
    assert all(r["errors"] is None for r in res["rows"])


def test_response_column_collision_rejected(spark):
    """Regression (round-4 advice): response names or the reserved
    `errors` column colliding with input columns must fail fast with a
    clear ValueError, not produce a duplicate-field struct inside
    mapInPandas."""

    async def payload(row: dict) -> dict:
        return {"text": "x"}

    df = spark.createDataFrame([(1, "a")], ["rid", "text"])
    with pytest.raises(ValueError, match="collide"):
        run_async_payload(df, payload, [("text", "string")])
    with pytest.raises(ValueError, match="collide"):
        run_async_payload(df.withColumnRenamed("text", "errors"),
                          payload, [("reply", "string")])
    with pytest.raises(ValueError, match="duplicate"):
        run_async_payload(df.select("rid"), payload,
                          [("reply", "string"), ("reply", "string")])


def test_token_bucket_rate_never_exceeded_property():
    """Property (fake clock, no sleeps): over ANY schedule of attempts,
    admissions by time t never exceed capacity + rate·t, and a told
    wait is never a lie (retrying after the told wait succeeds)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.floats(min_value=0.0, max_value=0.5),
                    min_size=1, max_size=60),
           st.floats(min_value=0.5, max_value=50.0),
           st.floats(min_value=1.0, max_value=8.0))
    def run(gaps, rate, capacity):
        now = [0.0]
        b = TokenBucket(rate, capacity, clock=lambda: now[0])
        admitted = 0
        for g in gaps:
            now[0] += g
            w = b.try_acquire()
            if w == 0.0:
                admitted += 1
            else:
                now[0] += w  # the told wait must be sufficient
                assert b.try_acquire() == 0.0
                admitted += 1
            assert admitted <= capacity + rate * now[0] + 1e-6

    run()
