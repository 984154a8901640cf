"""Data-layout operators: Z-order (Morton) clustering keys.

At 100 TB the dominant cost of most queries is the scan, and the scan's
cost is set by how many files/row-groups min-max statistics can prune.
Sorting by ONE column gives perfect pruning on that column and none on any
other; interleaving the bits of two columns into a single Morton key and
range-partitioning/sorting by it gives every file a small rectangle in
(c1, c2) space, so predicates on EITHER dimension prune — the standard
Z-order layout trick (Delta/Iceberg OPTIMIZE ZORDER does exactly this).

Everything here is pure codegen bit algebra (shift/and/or chains — no
Python, no shuffle for the key itself); the only exchange is the
``repartitionByRange`` that the clustered write needs anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(c1: Column, c2: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns: bit i of c1 lands at position 2i, bit i of c2 at 2i+1.
    A pure shift/and/or chain — whole-stage codegen, zero Python — and the
    same expression is trivially writable in any ANSI engine, so catalog
    queries over it carry full value-level oracles.

    Callers must mask/scale inputs into [0, 2^bits) themselves (the key of
    a value outside that range would silently collide); the catalog query
    and tests use ``% 2^bits``."""
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key.bitwiseOR(
            F.shiftleft(F.shiftright(c1.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(
                F.shiftright(c2.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return key


def morton_key_sql(c1: str, c2: str, bits: int = 16) -> str:
    """The identical interleave as ANSI SQL (DuckDB bitwise operators) —
    generated from the same loop so the two engines cannot drift."""
    terms = []
    for i in range(bits):
        terms.append(f"((({c1} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({c2} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_layout(
    df: DataFrame,
    c1: str,
    c2: str,
    bits: int = 16,
    n_files: int = 32,
    key_col: str = "zkey",
) -> DataFrame:
    """Cluster a frame for a Z-ordered write: attach the Morton key of
    (c1 % 2^bits, c2 % 2^bits) and range-partition by it so each output
    file covers a compact rectangle of (c1, c2) space.  ``n_files`` is the
    write parallelism — at real scale, pick it from target file size
    (bytes / ~512 MB), not from cluster cores.

    One exchange total (the range partitioning IS the write layout);
    sortWithinPartitions keeps row-group level min-max tight inside each
    file at zero extra shuffle."""
    m = F.lit(1 << bits)
    keyed = df.withColumn(
        key_col, morton_key(F.pmod(F.col(c1), m), F.pmod(F.col(c2), m), bits)
    )
    return keyed.repartitionByRange(n_files, key_col).sortWithinPartitions(key_col)
