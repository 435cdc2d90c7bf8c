"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, then compares row count, column names, and
order-insensitive values. Run:

    python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import struct
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def values_match(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if len(a) != len(b):
        return False, f"row count {len(a)} vs {len(b)}"
    if sorted(a.columns) != sorted(b.columns):
        return False, f"columns {sorted(a.columns)} vs {sorted(b.columns)}"
    a, b = canon(a.copy()), canon(b.copy())
    for c in a.columns:
        av, bv = a[c], b[c]
        for i in range(len(av)):
            x, y = av.iloc[i], bv.iloc[i]
            if pd.isna(x) and pd.isna(y):
                continue
            if isinstance(x, float) or isinstance(y, float):
                # Exact, bitwise — the driver compares value hashes with no
                # tolerance, so the local gate must too (VERDICT r1 item 1).
                try:
                    fx, fy = float(x), float(y)
                    if math.isnan(fx) and math.isnan(fy):
                        continue
                    if struct.pack("<d", fx) != struct.pack("<d", fy):
                        return False, f"col {c} row {i}: {x!r} != {y!r}"
                except (TypeError, ValueError):
                    return False, f"col {c} row {i}: {x!r} != {y!r}"
            elif x != y:
                return False, f"col {c} row {i}: {x!r} != {y!r}"
    return True, "ok"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from opengemini_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duck_con(sf_dir)
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()

    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"WEAK {name}: rows={len(sdf)} (no oracle) [{time.time()-t0:.1f}s]")
            n_weak += 1
            continue
        try:
            ddf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        ok, msg = values_match(sdf, ddf)
        status = "PASS" if ok else "FAIL"
        if ok:
            n_pass += 1
        else:
            n_fail += 1
        print(f"{status} {name}: rows={len(sdf)} {msg if not ok else ''} [{time.time()-t0:.1f}s]")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
