#!/usr/bin/env python3
"""Replica of the DRIVER's correctness comparator (pandas-based), as
distinct from tools/compare.py (which stringifies values before sorting
and therefore tolerates array columns the driver cannot sort).

The driver loads both result sets into pandas and calls
DataFrame.sort_values over all columns — array-typed cells raise
`TypeError: unhashable type: 'numpy.ndarray'` there, which is exactly
how round 6 shipped 9 ERR queries while tools/compare.py passed them.
Run BOTH comparators before declaring an oracle green.

Usage: driver_compare.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # The driver's sort: pandas sort_values over every column. This is
    # the step that must not see array cells.
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def cells_equal(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) and isinstance(b, float):
        return repr(a) == repr(b)
    return str(a) == str(b)


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).df()
            exp = con.execute(sql).df()
            g, e = canon(got), canon(exp)
        except Exception as exc:  # noqa: BLE001 — mirror the driver's err capture
            results[name] = f"ERR {type(exc).__name__}: {exc}"
            continue
        if list(g.columns) != list(e.columns):
            results[name] = (f"SCHEMA mismatch: got {list(g.columns)} "
                             f"want {list(e.columns)}")
        elif len(g) != len(e):
            results[name] = f"ROWS mismatch: got {len(g)} want {len(e)}"
        else:
            bad = 0
            first = None
            for i in range(len(g)):
                for c in g.columns:
                    if not cells_equal(g.at[i, c], e.at[i, c]):
                        bad += 1
                        if first is None:
                            first = (i, c, g.at[i, c], e.at[i, c])
                        break
            if bad:
                results[name] = (f"HASH mismatch: {bad}/{len(g)} rows differ; "
                                 f"first row {first[0]} col {first[1]}: "
                                 f"got={first[2]!r} want={first[3]!r}")
            else:
                results[name] = f"OK ({len(g)} rows)"
    npass = sum(1 for v in results.values() if v.startswith("OK"))
    for name, v in sorted(results.items()):
        print(("PASS " if v.startswith("OK") else "FAIL ") + name + ": " + v)
    print(f"== {npass}/{len(results)} pass")
    if npass != len(results):
        sys.exit(1)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
