#!/usr/bin/env python3
"""Local pre-check of SparkEntry oracles: replicate the driver's
verify/compare loop (Spark parquet output vs DuckDB oracle SQL on the same
sf tables). Usage: compare.py <sfDir> <verifyOutDir>."""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    """Sort columns by name, then rows; render values canonically."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])

    def render(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(v)
        return str(v)

    out = [tuple(render(r[i]) for i in idx) for r in rows]
    out.sort()
    return [cols[i] for i in idx], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            grows, gcols = got.fetchall(), [d[0] for d in got.description]
            exp = con.execute(sql)
            erows, ecols = exp.fetchall(), [d[0] for d in exp.description]
        except Exception as e:  # noqa: BLE001
            results[name] = f"ERROR {type(e).__name__}: {e}"
            continue
        gc, gr = canon(grows, gcols)
        ec, er = canon(erows, ecols)
        if gc != ec:
            results[name] = f"SCHEMA mismatch: got {gc} want {ec}"
        elif len(gr) != len(er):
            results[name] = f"ROWS mismatch: got {len(gr)} want {len(er)}"
        elif gr != er:
            bad = sum(1 for a, b in zip(gr, er) if a != b)
            first = next((a, b) for a, b in zip(gr, er) if a != b)
            results[name] = f"HASH mismatch: {bad}/{len(gr)} rows differ; first: got={first[0]} want={first[1]}"
        else:
            results[name] = f"OK ({len(gr)} rows)"
    npass = sum(1 for v in results.values() if v.startswith("OK"))
    for name, v in sorted(results.items()):
        print(("PASS " if v.startswith("OK") else "FAIL ") + name + ": " + v)
    print(f"== {npass}/{len(results)} pass")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
