"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at sf0.01 (or $CHECK_SF_DIR), then compares
row count, column names, and exact sorted values. Exit code 0 iff everything
matches.

Usage: python tools/check_oracle.py [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from scala_timeseries_lib_spark.plans.session import get_spark

    sf_dir = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])

    spark = get_spark(master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        t1 = time.time()
        if name not in oracles:
            print(f"  {name:28s} rows={len(sdf):7d} (no oracle, rows-only) "
                  f"[spark {t1 - t0:5.1f}s]")
            if len(sdf) == 0:
                failures.append((name, "query produced 0 rows"))
            continue
        odf = con.execute(oracles[name]).fetchdf()
        status, detail = compare(sdf, odf)
        print(f"  {name:28s} rows={len(sdf):7d} oracle={len(odf):7d} "
              f"{'OK' if status else 'MISMATCH ' + detail} "
              f"[spark {t1 - t0:5.1f}s duckdb {time.time() - t1:5.1f}s]")
        if not status:
            failures.append((name, detail))
    spark.stop()
    if failures:
        print("FAILURES:")
        for name, detail in failures:
            print(f"  {name}: {detail}")
        return 1
    print("ALL OK")
    return 0


def compare(sdf, odf):
    import numpy as np
    import pandas as pd

    if len(sdf) != len(odf):
        return False, f"row count {len(sdf)} != {len(odf)}"
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        return False, f"columns {scols} != {ocols}"
    s = sdf[scols].sort_values(scols, kind="mergesort").reset_index(drop=True)
    o = odf[scols].sort_values(scols, kind="mergesort").reset_index(drop=True)
    for c in scols:
        sv, ov = s[c], o[c]
        # the driver's value hash is representation-sensitive: a BIGINT on
        # one side and a DOUBLE on the other hash differently even when
        # numerically equal (54000000 vs 54000000.0). Flag the divergence
        # instead of coercing it away (this masked the round-1
        # ts_series_stats failure).
        if pd.api.types.is_float_dtype(sv) != pd.api.types.is_float_dtype(ov):
            return False, (
                f"col {c} dtype divergence: spark={sv.dtype} vs "
                f"oracle={ov.dtype} (driver hash is representation-sensitive)"
            )
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            a = sv.astype(float).to_numpy()
            b = ov.astype(float).to_numpy()
            both_nan = np.isnan(a) & np.isnan(b)
            if not np.all((a == b) | both_nan):
                bad = np.where(~((a == b) | both_nan))[0][:3]
                return False, (
                    f"col {c} differs at rows {bad.tolist()}: "
                    f"{a[bad].tolist()} vs {b[bad].tolist()}"
                )
        else:
            try:
                eq = (sv.astype("int64").to_numpy() == ov.astype("int64").to_numpy())
            except (ValueError, TypeError):
                eq = sv.astype(str).to_numpy() == ov.astype(str).to_numpy()
            if not eq.all():
                bad = np.where(~eq)[0][:3]
                return False, (
                    f"col {c} differs at rows {bad.tolist()}: "
                    f"{sv.iloc[bad].tolist()} vs {ov.iloc[bad].tolist()}"
                )
    return True, ""


if __name__ == "__main__":
    raise SystemExit(main())
