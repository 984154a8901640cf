"""P2 — the reference's ``filter`` URL param: per emitted row, parse the
opaque ``json`` payload, keep only the requested keys, re-serialize
(/root/reference/sse.py:234-237). Unknown keys silently dropped; zero
matches -> ``{}``.

Spark-first: ``from_json`` to ``map<string,string>`` (schema-on-read keeps
values string-typed exactly as the reference does — a typed struct would
re-type them), ``map_filter`` for the key subset, ``to_json`` back. All
JVM-side, whole-stage-codegen'd; the reference does this per row per client
in CPython after the sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from reddit_sse_stream_spark.operators.sqlrender import sql_string_array


def json_key_subset(json_col: Column | str, keys: Sequence[str]) -> Column:
    """``{k: v for k, v in json.items() if k in keys}`` re-serialized (sse.py:237)."""
    col = F.col(json_col) if isinstance(json_col, str) else json_col
    parsed = F.from_json(col, "map<string,string>")
    if not keys:
        # zero requested keys -> ``{}`` for every row (the reference's
        # zero-match result); callers guard this, kept for the contract
        return F.to_json(F.map_filter(parsed, lambda k, _: F.lit(False)))
    # rendered SQL constant, not element-wise F.lit (r15 — sqlrender.py);
    # keys are caller/spec-supplied strings, so the renderer escapes them
    keys_arr = F.expr(sql_string_array(list(keys)))
    return F.to_json(F.map_filter(parsed, lambda k, _: F.array_contains(keys_arr, k)))


def json_get(json_col: Column | str, key: str) -> Column:
    """Single-key extraction (X4) — ``get_json_object`` pushes straight to
    codegen and avoids materializing the whole map."""
    col = F.col(json_col) if isinstance(json_col, str) else json_col
    return F.get_json_object(col, f"$.{key}")
