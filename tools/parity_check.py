"""Local replica of the driver's correctness gate.

Runs each ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then compares
row count, column names, and order-insensitive stringified values.

Usage: python tools/parity_check.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entrymod
from text_extract_api_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(val) -> str:
    # Full-precision float repr: the driver's hash gate compares exact
    # values, so any canonicalization looser than that (r1 rounded to 9 dp)
    # makes local green fail to predict driver green.
    if val is None:
        return "<NULL>"
    if isinstance(val, float):
        # Covers np.float64 too (it subclasses float). A DuckDB HUGEINT or
        # DECIMAL aggregate that reaches pandas as float64 renders as e.g.
        # '662.0' here and mismatches Spark's '662' — exactly what the
        # driver's hash gate sees (r2 verdict item 1).
        if isinstance(val, np.floating) and np.isnan(val):
            return "<NULL>"
        return repr(float(val))
    if isinstance(val, bytes):
        return val.hex()
    if isinstance(val, np.ndarray):
        return str(val.tolist())
    return str(val)


def rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    spark = get_spark("parity", master="local[8]")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only: {len(s_rows)} rows)")
            continue
        try:
            res = con.execute(oracles[name])
            # Fetch via pandas (Arrow path), NOT .fetchall(): fetchall maps
            # DuckDB HUGEINT/DECIMAL to native Python ints, masking the
            # float64 coercion the driver's pandas-based hash gate applies.
            ddf = res.fetchdf()
            d_cols = list(ddf.columns)
            d_rows = [
                tuple(None if v is pd.NaT else v for v in row)
                for row in ddf.itertuples(index=False, name=None)
            ]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            continue
        ok = True
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}")
            ok = False
        elif len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rowcount spark={len(s_rows)} duck={len(d_rows)}")
            ok = False
        else:
            ss = rows_to_set(s_cols, s_rows)
            dd = rows_to_set(d_cols, d_rows)
            if ss != dd:
                diffs = [(a, b) for a, b in zip(ss, dd) if a != b][:3]
                print(f"FAIL {name}: value mismatch ({sum(1 for a,b in zip(ss,dd) if a!=b)} rows)")
                for a, b in diffs:
                    print(f"   spark: {a[:220]}")
                    print(f"   duck : {b[:220]}")
                ok = False
        if ok:
            print(f"PASS {name} ({len(s_rows)} rows)")
        else:
            failures.append(name)
    spark.stop()
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL PASS")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
