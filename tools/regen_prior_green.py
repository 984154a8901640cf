"""Regenerate the ``_PRIOR_GREEN_ROUND`` map in plans/catalog.py.

Scans every committed CORRECTNESS_r*.json artifact at the repo root and
prints, for each query with a recorded ``hash_match: true``, the LATEST
round that proved it — the registry sorts oracled queries by
(never-proven first, then least-recently-proven), so an external checker
sampling a fixed window keeps re-proving the STALEST green rows against
freshly regenerated testdata instead of the same recent ones (see the
"Registry ordering" section of plans/catalog.py).

Usage: python tools/regen_prior_green.py   # paste output into catalog.py
"""

from __future__ import annotations

import glob
import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def prior_green_rounds() -> dict[str, int]:
    last: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        rnd = int(m.group(1))
        data = json.load(open(f))
        for name, row in data.items():
            if isinstance(row, dict) and row.get("hash_match"):
                last[name] = max(last.get(name, 0), rnd)
    return last


if __name__ == "__main__":
    rounds = prior_green_rounds()
    print(f"# {len(rounds)} prior-green queries (latest proving round each)")
    print("_PRIOR_GREEN_ROUND = {")
    for n in sorted(rounds):
        print(f'    "{n}": {rounds[n]},')
    print("}")
