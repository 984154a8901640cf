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


def _proof_commit(rnd: int) -> str | None:
    """Commit that ADDED the round's CORRECTNESS artifact — the moment the
    proof was recorded; code changes after it postdate the proof."""
    import subprocess

    out = subprocess.run(
        [
            "git", "log", "--diff-filter=A", "--format=%H", "--",
            f"CORRECTNESS_r{rnd:02d}.json",
        ],
        cwd=ROOT, capture_output=True, text=True,
    ).stdout.split()
    return out[-1] if out else None


def _catalog_callees() -> dict[str, set[str]]:
    """query name -> {query name} | {operator functions its catalog entry
    calls as module.attr(...)} — the identifiers whose definition region a
    semantic change would touch.  ``F.*`` / ``spark.*`` are excluded (too
    common to be a signal)."""
    import ast

    path = os.path.join(
        ROOT, "reddit_sse_stream_spark", "plans", "catalog.py"
    )
    tree = ast.parse(open(path).read())
    out: dict[str, set[str]] = {}
    for node in ast.walk(tree):
        if not isinstance(node, ast.FunctionDef):
            continue
        ids = {node.name}
        for n in ast.walk(node):
            if (
                isinstance(n, ast.Call)
                and isinstance(n.func, ast.Attribute)
                and isinstance(n.func.value, ast.Name)
                and n.func.value.id not in ("F", "spark", "W", "Window")
            ):
                ids.add(n.func.attr)
        out[node.name] = ids
    return out


def changed_since_proof(last: dict[str, int]) -> list[str]:
    """Queries whose defining identifiers appear in the git diff between
    the commit that recorded their LATEST proof and HEAD.  A changed query
    outranks proof age in the registry (_CHANGED_SINCE_PROOF): its green
    row validated older semantics (VERDICT r06 next #1).  "Defining
    region changed" means a diff hunk lands INSIDE the query's catalog
    function or inside an operator function it calls: git's @@ hunk
    headers name the enclosing ``def``, so the match is on
    ``@@ ... def <identifier>(`` plus added/removed ``def <identifier>(``
    signature lines — NOT on arbitrary +/- lines mentioning the name
    (call sites, registration lists and docstrings churn every round and
    flagged ~85% of the catalog when tried).  Residual false positives
    (a hunk inserted right after a function picks up its name as context)
    only cost an extra re-proof."""
    import re as _re
    import subprocess

    callees = _catalog_callees()
    touched: dict[int, set[str]] = {}
    for rnd in sorted(set(last.values())):
        commit = _proof_commit(rnd)
        if not commit:
            continue
        d = subprocess.run(
            ["git", "diff", commit, "HEAD", "--", "reddit_sse_stream_spark"],
            cwd=ROOT, capture_output=True, text=True,
        ).stdout
        names: set[str] = set()
        for line in d.splitlines():
            m = _re.match(r"@@ .* @@.*?\bdef (\w+)\(", line)
            if not m:
                m = _re.match(r"[+-]\s*def (\w+)\(", line)
            if m:
                names.add(m.group(1))
        touched[rnd] = names
    flagged = []
    for q, rnd in sorted(last.items()):
        names = touched.get(rnd)
        if names and (callees.get(q, set()) | {q}) & names:
            flagged.append(q)
    return flagged


def stamp_survey() -> str:
    """Rewrite SURVEY.md §2.9's proof-round stamps (VERDICT r12 next #8):
    every backticked catalog-query name in the section's "Catalog entry"
    column gets ``·rNN`` (latest driver-green round, from the committed
    CORRECTNESS artifacts — the same source _PRIOR_GREEN_ROUND folds),
    ``·pending`` (oracled but never driver-sampled), or ``·rows-only``
    (registered without a value oracle BY DESIGN — xxhash fast paths
    with oracled twin invariants; the driver records a weaker
    rows-only check).  Idempotent: existing stamps are replaced, so
    re-running after each round keeps SURVEY auditable without hand
    edits."""
    import ast as _ast

    last = prior_green_rounds()
    cat_path = os.path.join(
        ROOT, "reddit_sse_stream_spark", "plans", "catalog.py"
    )
    registered: dict[str, bool] = {}  # name -> has value oracle
    for node in _ast.walk(_ast.parse(open(cat_path).read())):
        if (
            isinstance(node, _ast.Call)
            and isinstance(node.func, _ast.Name)
            and node.func.id == "_register"
            and node.args
            and isinstance(node.args[0], _ast.Constant)
        ):
            oracled = len(node.args) > 1 and not (
                isinstance(node.args[1], _ast.Constant)
                and node.args[1].value is None
            )
            registered[node.args[0].value] = oracled
    path = os.path.join(ROOT, "SURVEY.md")
    survey = open(path).read()
    start = survey.index("### 2.9")
    end = survey.index("\n## ", start)
    sec = survey[start:end]

    def stamp_cell(cell: str) -> str:
        def repl(m):
            name = m.group(1)
            if name not in registered:
                return m.group(0)
            if name in last:
                tag = f"r{last[name]:02d}"
            elif registered[name]:
                tag = "pending"
            else:
                tag = "rows-only"
            return f"`{name}`·{tag}"

        return re.sub(r"`(\w+)`(?:·(?:r\d+|pending|rows-only))?", repl, cell)

    out_lines = []
    for line in sec.splitlines():
        if line.startswith("|") and line.count("|") >= 4:
            cells = line.split("|")
            cells[2] = stamp_cell(cells[2])
            line = "|".join(cells)
        out_lines.append(line)
    new_sec = "\n".join(out_lines)
    open(path, "w").write(survey[:start] + new_sec + survey[end:])
    n = len(re.findall(r"·r\d+", new_sec))
    p = len(re.findall(r"·pending", new_sec))
    ro = len(re.findall(r"·rows-only", new_sec))
    return f"stamped SURVEY §2.9: {n} proven, {p} pending, {ro} rows-only"


if __name__ == "__main__":
    import sys as _sys

    if "--stamp-survey" in _sys.argv[1:]:
        print(stamp_survey())
        raise SystemExit(0)
    rounds = prior_green_rounds()
    print(f"# {len(rounds)} prior-green queries (latest proving round each)")
    print("_PRIOR_GREEN_ROUND = {")
    for n in sorted(rounds):
        print(f'    "{n}": {rounds[n]},')
    print("}")
    flagged = changed_since_proof(rounds)
    print(f"# {len(flagged)} CANDIDATES changed since their latest proof "
          "(git-diff of defining identifiers vs the proof-recording "
          "commit).  Review before pasting: the hunk-header match cannot "
          "tell a semantic change from a docstring/plan-shape refactor "
          "inside the same def — _CHANGED_SINCE_PROOF in catalog.py is "
          "the CURATED semantic subset (a too-large tier 0 would starve "
          "the never-proven and stalest-green tiers out of the driver's "
          "sampling window).  Queries left here un-pinned still cycle "
          "through via the age rotation.")
    print("# candidates = {")
    for n in flagged:
        print(f'#     "{n}",')
    print("# }")
