"""Local replica of the driver's correctness gate: run every
__spark_entry__ query on Spark AND its DuckDB oracle at sf0.01,
compare row count + column names + order-insensitive values.

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from curator_spark.session import get_spark  # noqa: E402

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """Mirror the driver's canonicalization: sort columns by name, widen
    int→int64 / float→float64 / bool→bool WITHOUT crossing kinds (so a
    DuckDB HUGEINT arriving as float64 stays float64 and hash-mismatches
    Spark's int64 exactly like the driver's gate), then sort rows by all
    columns. NO rounding, NO tolerance — exactness is the contract."""
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            # unify tz and unit (Spark→ns, DuckDB→us) — a resolution-only
            # difference is not a value difference and the driver's gate
            # does not flag it (q10 was hash-green in round 1)
            pdf[c] = pdf[c].dt.tz_localize(None).astype("datetime64[ns]")
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("float64")
        elif pd.api.types.is_bool_dtype(pdf[c]):
            pdf[c] = pdf[c].astype(bool)
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


def value_hash(pdf: pd.DataFrame) -> str:
    """Dtype-sensitive exact hash of the canonicalized frame."""
    import hashlib
    payload = pdf.to_csv(index=False, float_format="%.17g")
    payload += "|" + ",".join(str(t) for t in pdf.dtypes)
    return hashlib.sha256(payload.encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("selfcheck", parallelism=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # golden-parquet oracles are per-scale-factor: the committed SQL
    # targets the driver's sf0.01; retarget when checking another SF
    tag = os.path.basename(sf_dir.rstrip("/"))
    if tag != "sf0.01":
        # every per-SF golden follows the q{NN}_{tag}.parquet convention
        oracles = {k: v.replace("_sf0.01.parquet", f"_{tag}.parquet")
                   for k, v in oracles.items()}
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            print(f"ROWS {name}: {len(spark_pdf)} rows (no oracle) [{dt:.1f}s]")
            continue
        try:
            duck_pdf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        a, b = canon(spark_pdf), canon(duck_pdf)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            failures += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            failures += 1
            continue
        if value_hash(a) == value_hash(b):
            print(f"OK   {name}: {len(a)} rows [{dt:.1f}s]")
        else:
            msg = "hash mismatch"
            try:  # best-effort diagnosis of WHERE they differ
                pd.testing.assert_frame_equal(a, b, check_exact=True)
            except AssertionError as e:
                msg = str(e)[:400]
            print(f"FAIL {name}: {msg}")
            failures += 1
    spark.stop()
    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
