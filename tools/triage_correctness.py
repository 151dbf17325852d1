"""Triage a driver CORRECTNESS_r{N}.json against the current registry:
which queries failed which check, and which registry entries the driver
never evaluated (time/count budget cut-off).

Usage: python tools/triage_correctness.py CORRECTNESS_r02.json
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "CORRECTNESS_r01.json"
    with open(path) as f:
        results = json.load(f)
    registry = list(entry.queries())
    oracles = entry.oracle_sql()

    fails, errs = [], []
    for name, r in results.items():
        if r.get("err"):
            errs.append((name, r["err"]))
        elif not (r.get("rows_match") and r.get("schema_match")):
            fails.append((name, "rows/schema"))
        elif name in oracles and not r.get("hash_match"):
            fails.append((name, "hash"))
    unchecked = [n for n in registry if n not in results]
    stale = [n for n in results if n not in registry]

    print(f"{path}: {len(results)} evaluated / {len(registry)} registered")
    for name, why in fails:
        print(f"  FAIL {why}: {name} (registry pos {registry.index(name)})")
    for name, err in errs:
        print(f"  ERR : {name}: {err[:120]}")
    if unchecked:
        print(f"  UNCHECKED ({len(unchecked)}): {', '.join(unchecked)}")
    if stale:
        print(f"  STALE (in file, not in registry): {', '.join(stale)}")
    if not (fails or errs or unchecked):
        print("  all green, full coverage")
    return 1 if (fails or errs) else 0


if __name__ == "__main__":
    sys.exit(main())
