#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each <verifyOutDir>/<name>/ parquet dump, runs the matching SQL from
oracle_sql.json in DuckDB (with one view per testdata table), sorts columns
by name and rows by all columns, and compares values.

Driver-side tooling only (duckdb/pyarrow/pandas are not engine deps).
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def cell_eq(a, b) -> bool:
    """STRICT equality, emulating the driver's hash compare: values
    hash by their string rendering, so int64 0 vs float64 0.0 MUST
    differ (that exact laxity hid 4 driver-red typing bugs in round
    1), while int32 1 vs int64 1 both render "1" and match."""
    return str(a) == str(b)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        qdir = Path(out_dir) / name
        if not qdir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = norm(pd.read_parquet(qdir))
        want = norm(con.execute(sql).df())
        ok = True
        msgs = []
        if list(got.columns) != list(want.columns):
            ok = False
            msgs.append(f"cols spark={list(got.columns)} oracle={list(want.columns)}")
        elif len(got) != len(want):
            ok = False
            msgs.append(f"rows spark={len(got)} oracle={len(want)}")
        else:
            for c in got.columns:
                for i, (a, b) in enumerate(zip(got[c], want[c])):
                    if not cell_eq(a, b):
                        ok = False
                        msgs.append(f"col {c} row {i}: spark={a!r} oracle={b!r}")
                        break
                if not ok:
                    break
        if ok:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {'; '.join(msgs)}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
