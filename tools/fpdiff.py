#!/usr/bin/env python3
"""Diff per-query plan fingerprints between two bench_results.json files.

Usage: python3 tools/fpdiff.py OLD.json NEW.json

A timing delta with an UNCHANGED fingerprint is runtime/box noise; a
CHANGED fingerprint means the physical plan itself moved and the delta
is attributable. Prints one line per query whose fingerprint or >2x
timing changed, then a summary.
"""
import json
import sys


def load(path):
    line = open(path).read()
    return json.loads(line[line.index("{"):])


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    op, np_ = old.get("plans", {}), new.get("plans", {})
    ot, nt = old.get("queries", {}), new.get("queries", {})
    changed, added, removed, noisy = [], [], [], []
    for q in sorted(set(op) | set(np_)):
        if q not in op:
            added.append(q)
        elif q not in np_:
            removed.append(q)
        elif op[q] != np_[q]:
            changed.append(q)
            print(f"PLAN CHANGED {q}: {op[q]} -> {np_[q]} "
                  f"({ot.get(q, 0):.2f}s -> {nt.get(q, 0):.2f}s)")
        else:
            a, b = ot.get(q, 0), nt.get(q, 0)
            if a > 0 and (b / a > 2 or (b > 0 and a / b > 2)):
                noisy.append(q)
                print(f"NOISE (same plan) {q}: {a:.2f}s -> {b:.2f}s")
    for q in added:
        print(f"NEW {q}: {nt.get(q, 0):.2f}s")
    for q in removed:
        print(f"REMOVED {q}")
    print(f"== {len(changed)} plan changes, {len(noisy)} same-plan 2x "
          f"timing swings, {len(added)} new, {len(removed)} removed")


if __name__ == "__main__":
    main()
