#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only; the Scala
library has no python dependency).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same parquet tables, and
compares: column names (sorted), row count, and exact values (after sorting
columns by name). Reports per-query PASS/FAIL with the first differing cell.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    import datetime
    for c in df.columns:
        if df[c].dtype == object and df[c].map(
                lambda v: isinstance(v, datetime.date) or v is None).all():
            df[c] = pd.to_datetime(df[c])
    return df.reset_index(drop=True)


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) != pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        return list(a) == list(b)
    return a == b


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.is_dir():
            # ScaleFixtures writes Spark-style parquet DIRECTORIES
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_path = Path(out_dir) / name
        if not spark_path.exists():
            print(f"FAIL {name}: spark result missing")
            n_fail += 1
            continue
        try:
            got = normalize(pd.read_parquet(spark_path))
            want = normalize(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        ok = True
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns spark={list(got.columns)} duckdb={list(want.columns)}")
            ok = False
        elif len(got) != len(want):
            print(f"FAIL {name}: rows spark={len(got)} duckdb={len(want)}")
            ok = False
        else:
            for col in got.columns:
                if not ok:
                    break
                # The driver hashes raw values, so 0 (int64) vs 0.0 (float64
                # from a DuckDB HUGEINT sum) is a driver-side mismatch even
                # though == passes. Flag integer-vs-float dtype drift hard.
                gi = pd.api.types.is_integer_dtype(got[col].dtype)
                wi = pd.api.types.is_integer_dtype(want[col].dtype)
                gf = pd.api.types.is_float_dtype(got[col].dtype)
                wf = pd.api.types.is_float_dtype(want[col].dtype)
                if (gi and wf) or (gf and wi):
                    print(f"FAIL {name}: col={col} dtype spark={got[col].dtype} "
                          f"duckdb={want[col].dtype} (int/float drift hashes differently)")
                    ok = False
                    break
                ga, wa = got[col].tolist(), want[col].tolist()
                for i, (a, b) in enumerate(zip(ga, wa)):
                    if not cells_equal(a, b):
                        print(f"FAIL {name}: col={col} row={i} spark={a!r} duckdb={b!r}")
                        ok = False
                        break
        if ok:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail / {len(oracle)} oracle queries")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
