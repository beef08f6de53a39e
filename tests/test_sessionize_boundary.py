"""q11 sessionize gap semantics at the threshold boundary.

The inactivity gap must be compared in MICROSECONDS on both engines:
whole-second truncation (ts.cast("long")) turns a 1800.5 s gap into
exactly 1800 s, silently merging two sessions that the oracle's
fractional epoch would split. These fixtures place gaps within 1 s of
the 1800 s threshold on both sides and assert Spark == DuckDB == the
hand-computed session counts.
"""

from __future__ import annotations

import datetime

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from curator_spark import queries


T0 = datetime.datetime(2025, 6, 1, 0, 0, 0)


def _ev(user, eid, offset_us):
    return {
        "event_id": eid,
        "user_id": user,
        "ts": T0 + datetime.timedelta(microseconds=offset_us),
    }


@pytest.fixture(scope="module")
def boundary_dir(tmp_path_factory):
    s = 1_000_000  # µs per second
    rows = [
        # u1: gap 1800.5 s → NEW session (truncation would say 1800 → same)
        _ev("u1", 1, 0), _ev("u1", 2, 1800 * s + 500_000),
        # u2: gap 1799.5 s → same session both ways
        _ev("u2", 3, 0), _ev("u2", 4, 1799 * s + 500_000),
        # u3: gap 1800.000001 s → NEW session only with µs precision
        _ev("u3", 5, 0), _ev("u3", 6, 1800 * s + 1),
        # u4: gap exactly 1800 s → same session (threshold is strict >)
        _ev("u4", 7, 0), _ev("u4", 8, 1800 * s),
    ]
    tbl = pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "user_id": pa.array([r["user_id"] for r in rows], pa.string()),
        "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
    })
    d = tmp_path_factory.mktemp("sess_boundary")
    pq.write_table(tbl, str(d / "events.parquet"))
    return str(d)


def test_boundary_session_counts(spark, boundary_dir):
    out = queries.q11_sessionize(spark, boundary_dir).toPandas()
    got = dict(zip(out["user_id"], out["n_sessions"]))
    assert got == {"u1": 2, "u2": 1, "u3": 2, "u4": 1}


def test_boundary_matches_oracle(spark, boundary_dir):
    spark_pdf = (queries.q11_sessionize(spark, boundary_dir)
                 .toPandas().sort_values("user_id").reset_index(drop=True))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"'{boundary_dir}/events.parquet'")
    duck_pdf = (con.sql(queries.ORACLES["q11_sessionize"]).df()
                .sort_values("user_id").reset_index(drop=True))
    assert spark_pdf["n_sessions"].tolist() == duck_pdf["n_sessions"].tolist()
    assert str(spark_pdf["n_sessions"].dtype) == str(duck_pdf["n_sessions"].dtype)
