"""Regenerate the ``_PRIOR_DRIVER_GREEN`` set in plans/catalog.py.

Scans every committed CORRECTNESS_r*.json artifact at the repo root and
prints the union of query names with a recorded ``hash_match: true`` —
the queries that have already been proven green by an external oracle
run.  The registry sorts these AFTER queries that still lack any external
green signal, so cumulative externally-verified coverage grows every
round (see the "Registry ordering" section of plans/catalog.py).

Usage: python tools/regen_prior_green.py   # paste output into catalog.py
"""

from __future__ import annotations

import glob
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def prior_green() -> set[str]:
    green: set[str] = set()
    for f in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        data = json.load(open(f))
        for name, row in data.items():
            if isinstance(row, dict) and row.get("hash_match"):
                green.add(name)
    return green


if __name__ == "__main__":
    names = sorted(prior_green())
    print(f"# {len(names)} prior-green queries")
    print("_PRIOR_DRIVER_GREEN = frozenset({")
    for n in names:
        print(f'    "{n}",')
    print("})")
