"""Z-order (Morton) clustering for multi-dimensional data skipping.

The 100 TB problem: parquet/ORC scans skip files and row groups via
column min/max statistics, but sorting by one column destroys locality
in every other column — a two-predicate query then reads everything.
Interleaving the bits of two (or more) key columns into one Morton
code and sorting by THAT gives every written file a tight bounding box
in all interleaved dimensions at once, so a small query rectangle
intersects only a few files (the technique behind Delta/Iceberg
Z-ORDER clustering, from Morton 1966 / Orenstein-Merrett 1984).

`zvalue` is a pure Catalyst bit-arithmetic expression (shift/and/or) —
whole-stage-codegen'd, no UDF — and `zvalue_sql` emits the identical
arithmetic as ANSI SQL so the oracle reproduces the codes exactly.
The write path is just `df.orderBy(zvalue(...))` + any file-size knob
(`maxRecordsPerFile`); the skipping effect is asserted from parquet
footer statistics in tests/test_zorder.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: bits interleaved per dimension (mirrored in the oracle SQL).
Z_BITS = 16


def zvalue(x: Column, y: Column, bits: int = Z_BITS) -> Column:
    """Morton code of two non-negative integer columns: bit i of x
    lands at position 2i, bit i of y at 2i+1. Columns must fit in
    ``bits`` bits (callers bucket/clamp first)."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        xb = F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1))
        yb = F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1))
        z = z + F.shiftleft(xb, 2 * i) + F.shiftleft(yb, 2 * i + 1)
    return z


def zvalue_sql(x_expr: str, y_expr: str, bits: int = Z_BITS) -> str:
    """The same Morton code as an ANSI-SQL expression string (for the
    DuckDB oracle): generated from the same loop so Spark and SQL can
    never drift."""
    terms = []
    for i in range(bits):
        terms.append(f"(((CAST({x_expr} AS BIGINT) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((CAST({y_expr} AS BIGINT) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"
