"""Exact SQL rendering of driver-held constant arrays.

PySpark's ``F.lit`` on a Python list expands into ``array(lit, lit, ...)``
— one py4j roundtrip PER ELEMENT before the JVM ever sees the constant.
For the plan-literal model states this engine bakes into queries
(centroid tables, codebooks, ADC tables, sign matrices, hash
coefficients: hundreds to a thousand scalars each), that expansion
measured ~0.5 s of pure driver time per expression build (r15,
OPTIMIZATION_r15.md).  Rendering the constant as ONE SQL string and
parsing it server-side via ``F.expr`` is one py4j call and one parse
(~0.08 s warm) and yields the same Catalyst literal tree.

Exactness contract: integers render losslessly by construction (``123L``
BIGINT literals); doubles render via ``repr`` — the shortest decimal
that round-trips to the same IEEE-754 binary64 — wrapped in
``CAST('...' AS DOUBLE)``, which Spark folds through Java's correctly
rounded ``Double.parseDouble``, so the parsed constant is bit-identical
to the Python float.  This is the same shortest-roundtrip contract the
DuckDB oracle renderers in plans/catalog.py already rely on, and every
converted site is covered by a value-level oracle row.
"""

from __future__ import annotations


def sql_double(v: float) -> str:
    """One double as an exactly-round-tripping SQL expression."""
    return f"CAST('{float(v)!r}' AS DOUBLE)"


def sql_double_array(vals) -> str:
    """array<double> literal from Python floats, bit-exact."""
    return "array(" + ", ".join(sql_double(v) for v in vals) + ")"


def sql_long_array(vals) -> str:
    """array<bigint> literal from Python ints."""
    return "array(" + ", ".join(str(int(v)) + "L" for v in vals) + ")"
