"""Streaming sessionization: in-batch gap closing + event-time timeout
eviction across restarts (state persists in the stream checkpoint)."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from curator_spark.streaming.stateful import sessionize_stateful


T0 = datetime.datetime(2025, 6, 1, 0, 0, 0)
BASE_US = 1_748_736_000 * 1_000_000  # T0 as epoch microseconds


def _write_events(path, rows):
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.string()),
        "ts": pa.array([T0 + datetime.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
    })
    pq.write_table(tbl, path)


def _drain(spark, src, out, ckpt):
    from pyspark.sql import types as T
    stream = (spark.readStream
              .schema(T.StructType([
                  T.StructField("user_id", T.StringType()),
                  T.StructField("ts", T.TimestampType())]))
              .option("maxFilesPerTrigger", 1)
              .parquet(src))
    q = (sessionize_stateful(stream).writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)


def test_streaming_sessions(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    # batch 1: u1 has two sessions — the first closes IN batch
    # (gap 7200s > 1800s); the second (single event at 7200s) stays open
    _write_events(str(src / "b1.parquet"),
                  [("u1", 0), ("u1", 10), ("u1", 7200)])
    _drain(spark, str(src), out, ckpt)
    got = spark.read.parquet(out).toPandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (r.user_id, r.start_us, r.end_us, r.n_events) == \
        ("u1", BASE_US, BASE_US + int(10e6), 2)

    # batch 2: a much later event from u2 advances the watermark far past
    # u1's open-session timeout (7200s + 1800s); batch 3 gives the
    # timeout a trigger to fire in (timeouts are evaluated against the
    # PREVIOUS trigger's watermark)
    _write_events(str(src / "b2.parquet"), [("u2", 40000)])
    _drain(spark, str(src), out, ckpt)
    _write_events(str(src / "b3.parquet"), [("u2", 40060)])
    _drain(spark, str(src), out, ckpt)

    got = (spark.read.parquet(out).toPandas()
           .sort_values(["user_id", "start_us"]).reset_index(drop=True))
    u1 = got[got.user_id == "u1"]
    assert len(u1) == 2, got
    assert u1.iloc[1].start_us == BASE_US + int(7200e6)
    assert u1.iloc[1].end_us == BASE_US + int(7200e6)
    assert u1.iloc[1].n_events == 1
    # u2's session is still open — not emitted
    assert (got.user_id == "u2").sum() == 0


class _FakeState:
    """Minimal GroupState stand-in for unit-testing _session_update."""

    def __init__(self, tup=None):
        self._t = tup
        self.hasTimedOut = False
        self.timeout = None

    @property
    def exists(self):
        return self._t is not None

    @property
    def get(self):
        return self._t

    def update(self, t):
        self._t = t

    def setTimeoutTimestamp(self, ms):
        self.timeout = ms

    def remove(self):
        self._t = None


def _apply(state, ts_list_s):
    import pandas as pd

    from curator_spark.streaming.stateful import _session_update
    pdf = pd.DataFrame({"ts_us": [BASE_US + int(s * 1e6) for s in ts_list_s]})
    out = list(_session_update(("u1",), iter([pdf]), state))
    import itertools
    rows = list(itertools.chain.from_iterable(
        o.to_dict("records") for o in out))
    return rows, state


def test_late_event_merges_and_lowers_start():
    """A cross-batch late event within SESSION_GAP_US of the open
    session's start MERGES and extends start downward — previously
    start was never min'd down (sessions diverged from batch q11)."""
    st = _FakeState((BASE_US + int(1000e6), BASE_US + int(2000e6), 5))
    rows, st = _apply(st, [500])  # 500s: older than start, gap 500s < 1800s
    assert rows == []
    start, last, n = st.get
    assert (start, last, n) == (BASE_US + int(500e6), BASE_US + int(2000e6), 6)


def test_intra_session_late_event_merges_without_boundary_change():
    st = _FakeState((BASE_US + int(1000e6), BASE_US + int(2000e6), 5))
    rows, st = _apply(st, [1500])
    assert rows == []
    assert st.get == (BASE_US + int(1000e6), BASE_US + int(2000e6), 6)


def test_too_old_late_event_emits_singleton_not_merge():
    """An event more than a gap older than the open session's start
    cannot belong to it: it emits as a best-effort singleton (documented
    divergence) instead of being glued onto the wrong session."""
    st = _FakeState((BASE_US + int(10000e6), BASE_US + int(11000e6), 3))
    rows, st = _apply(st, [100])  # 9900s older than start ≫ 1800s gap
    assert len(rows) == 1
    assert (rows[0]["start_us"], rows[0]["end_us"], rows[0]["n_events"]) == \
        (BASE_US + int(100e6), BASE_US + int(100e6), 1)
    # the open session is untouched
    assert st.get == (BASE_US + int(10000e6), BASE_US + int(11000e6), 3)


def test_consecutive_late_events_form_one_session():
    """Two too-late events within a gap of EACH OTHER merge into one
    emitted session (as batch would), not two singletons."""
    st = _FakeState((BASE_US + int(10000e6), BASE_US + int(11000e6), 3))
    rows, st = _apply(st, [100, 150])
    assert len(rows) == 1
    assert (rows[0]["start_us"], rows[0]["end_us"], rows[0]["n_events"]) == \
        (BASE_US + int(100e6), BASE_US + int(150e6), 2)
    assert st.get == (BASE_US + int(10000e6), BASE_US + int(11000e6), 3)


def test_late_event_reachable_only_via_later_event_merges():
    """Order-dependence fix: an event too old relative to the CURRENT
    start must still merge when a later event in the same batch chains
    it to the open session (batch q11 computes one session here)."""
    GAP_S = 1800
    st = _FakeState((BASE_US + int(10000e6), BASE_US + int(11000e6), 3))
    # 8150 is > GAP below start=10000, but 8250 bridges: |8250-8150|<GAP
    # and |10000-8250| < GAP → ALL of it is one session
    rows, st = _apply(st, [8150, 8250])
    assert rows == []
    assert st.get == (BASE_US + int(8150e6), BASE_US + int(11000e6), 5)
    assert GAP_S * 1e6 < (10000 - 8150) * 1e6  # sanity: 8150 was "too old"


def test_sessionize_property_chronological_batches_match_batch():
    """Property: for ANY sorted event sequence cut into chronological
    micro-batches at ANY points, the closed sessions plus the final
    open session equal batch q11's gaps-and-islands over the full
    sequence (exactness of the island-merge update)."""
    import random

    from curator_spark.streaming.stateful import SESSION_GAP_US

    rng = random.Random(20260817)
    for trial in range(25):
        n = rng.randint(1, 60)
        ts, t = [], 0
        for _ in range(n):
            # mix of intra-session steps and > gap jumps
            # 1800 == SESSION_GAP: exercises the <= merge boundary both
            # in the stream and in the expected-island comparator
            t += rng.choice([1, 10, 600, 1700, 1800, 1801, 4000]) * 1_000_000
            ts.append(t)
        # expected islands (batch semantics)
        want = []
        for x in ts:
            if want and x - want[-1][1] <= SESSION_GAP_US:
                s, _e, k = want[-1]
                want[-1] = (s, x, k + 1)
            else:
                want.append((x, x, 1))

        # stream: random chronological cuts
        cuts = sorted(rng.sample(range(1, n), min(rng.randint(0, 5), n - 1))) \
            if n > 1 else []
        batches, prev = [], 0
        for c in cuts + [n]:
            batches.append(ts[prev:c])
            prev = c
        st = _FakeState()
        got = []
        for b in batches:
            rows, st = _apply(st, [x / 1e6 for x in b])
            got += [(r["start_us"], r["end_us"], r["n_events"])
                    for r in rows]
        got.append((st.get[0], st.get[1], st.get[2]))
        # _apply adds BASE_US; normalize got back
        got = [(s - BASE_US, e - BASE_US, k) for s, e, k in got]
        assert got == want, (trial, got, want)
