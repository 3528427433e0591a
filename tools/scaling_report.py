#!/usr/bin/env python3
"""Build SCALING.md from three full-suite Bench runs (sf0.001/0.01/0.1).

Usage:
  python3 tools/scaling_report.py <bench_sf0001.json> <bench_sf001.json> \
      <bench_sf01.json> [out.md]

Each input is the one-line JSON graft.Bench emits (possibly prefixed by an
sbt "[info] " tag). The report lists per-query min-of-3 wall times at the
three scale factors and the growth ratio across each 10x data step; a query
whose time grows FASTER than the data between the two largest SFs is flagged
as superlinear — the signal that would kill a 100 TB run.
"""
import json
import sys

import duckdb


def load(path):
    s = open(path).read()
    return json.loads(s[s.index("{"):])


def main():
    b1, b2, b3 = (load(p) for p in sys.argv[1:4])
    out = sys.argv[4] if len(sys.argv) > 4 else "SCALING.md"

    rows = {}
    for sf in ("0.001", "0.01", "0.1"):
        r = {}
        for t in ("lineitem", "orders", "events", "documents", "embeddings"):
            r[t] = duckdb.sql(
                f"SELECT count(*) FROM read_parquet('/root/testdata/sf{sf}/{t}.parquet')"
            ).fetchone()[0]
        rows[sf] = r

    qs = sorted(set(b1["queries"]) & set(b2["queries"]) & set(b3["queries"]))
    lines = []
    flagged = []
    for q in qs:
        t1, t2, t3 = b1["queries"][q], b2["queries"][q], b3["queries"][q]
        if None in (t1, t2, t3):
            continue
        r12 = t2 / t1 if t1 else float("nan")
        r23 = t3 / t2 if t2 else float("nan")
        # Superlinear flag on the LARGEST step (sf0.01 -> sf0.1, 10x data):
        # the smaller SFs sit on the per-query fixed-overhead floor
        # (session/planning/task dispatch ~0.1-0.3 s), where ratios are
        # meaningless. Threshold 12 = 10x data + 20% noise allowance. A
        # second guard on the COMBINED 100x step (threshold 120) catches a
        # blowup that a noise-inflated middle measurement would hide from
        # the single-step ratio.
        flag = r23 > 12.0 or (t3 / t1 if t1 else 0) > 120.0
        if flag:
            flagged.append(q)
        lines.append((q, t1, t2, t3, r12, r23, flag))

    doc = []
    doc.append("# SCALING — full-suite wall time vs data size\n")
    doc.append(
        "One `graft.Bench` run per scale factor on the same local[32] box\n"
        "(min of 3 passes per query, caches cleared at query boundaries —\n"
        "the per-round driver methodology). Data grows 10x per step:\n")
    doc.append("| table | sf0.001 | sf0.01 | sf0.1 |")
    doc.append("|---|---|---|---|")
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        doc.append(
            f"| {t} | {rows['0.001'][t]:,} | {rows['0.01'][t]:,} | {rows['0.1'][t]:,} |")
    doc.append("")
    tot1 = sum(l[1] for l in lines)
    tot2 = sum(l[2] for l in lines)
    tot3 = sum(l[3] for l in lines)
    doc.append(
        "documents/embeddings are CONSTANT between sf0.001 and sf0.01 and\n"
        "grow 10x/4x on the final step — so for document-bound queries only\n"
        "the `x 0.01→0.1` column reflects data growth at all.\n")
    doc.append(
        f"Suite totals over the {len(lines)} shared queries: "
        f"{tot1:.1f} s → {tot2:.1f} s → {tot3:.1f} s — total work grows "
        f"{tot3/tot2:.1f}x across the final 10x data step.\n")
    doc.append(
        "`x 0.01→0.1` is the wall-time growth over that 10x step. Queries at\n"
        "small SF sit on a ~0.1-0.3 s fixed floor (session, planning, task\n"
        "dispatch), so sub-10x growth there is overhead amortization, not\n"
        "sublinear compute; the scale signal is the flag column — time\n"
        "growing faster than data (>12x, allowing 20% noise) on the largest\n"
        "step, the shape that would not survive 100 TB.\n")
    doc.append("| query | sf0.001 s | sf0.01 s | sf0.1 s | x 0.001→0.01 | x 0.01→0.1 | superlinear? |")
    doc.append("|---|---|---|---|---|---|---|")
    for q, t1, t2, t3, r12, r23, flag in sorted(lines, key=lambda l: -l[5]):
        doc.append(
            f"| {q} | {t1:.2f} | {t2:.2f} | {t3:.2f} | {r12:.1f}x | {r23:.1f}x |"
            f" {'**YES**' if flag else ''} |")
    doc.append("")
    if flagged:
        doc.append(f"Flagged superlinear: {', '.join(flagged)}.")
    else:
        doc.append(
            "No query grows superlinearly on the 10x step: every operator's\n"
            "measured cost is bounded by data growth in the harness range.")
    doc.append("")
    with open(out, "w") as f:
        f.write("\n".join(doc))
    print(f"wrote {out}: {len(lines)} queries, {len(flagged)} flagged")


if __name__ == "__main__":
    main()
