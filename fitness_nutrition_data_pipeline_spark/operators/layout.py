"""Data-layout operators: space-filling-curve (Z-order) clustering keys.

Multi-dimensional min/max pruning is a LAYOUT property: a file skips a
scan only if the queried column's values inside it span a narrow range.
Sorting by one column gives perfect pruning on that column and none on
any other; interleaving the bits of several columns (the Z-order /
Morton curve) gives good-not-perfect pruning on ALL of them at once —
which is why lakehouse table formats expose it as their clustering
primitive. This module provides the curve key as a pure Column
expression so it composes with ``repartitionByRange`` / sorted writes,
plus the quantizer that maps arbitrary numeric columns onto the curve's
fixed-width grid.

Everything is exact integer math (shifts, masks, adds) — identical in
any engine, whole-stage-codegen'd in Spark, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def quantize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map a numeric column onto the integer grid [0, 2^bits) given its
    min/max (pass as broadcast scalar columns). The top cell is closed so
    ``hi`` itself stays in range. A degenerate range (constant column,
    hi == lo) maps everything to cell 0 — without the guard Spark yields
    NULL bins while a SQL oracle raises/infs on the zero divide, i.e.
    the engines diverge exactly when they can't be compared."""
    cells = 1 << bits
    scaled = F.floor((col - lo) / (hi - lo) * cells).cast("long")
    return F.when(hi == lo, F.lit(0)).otherwise(
        F.least(scaled, F.lit(cells - 1))
    )


def zvalue(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton/Z-order key: interleave the low ``bits`` bits of two
    already-quantized non-negative integer columns — x in the even bit
    positions, y in the odd. 2×bits output bits; an unrolled sum of
    shift/mask terms that codegen folds into straight-line long math."""
    terms = []
    for b in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b))
        terms.append(
            F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zvalue_sql(x: str, y: str, bits: int = 8) -> str:
    """The identical interleave as ANSI SQL text (for oracle parity)."""
    terms = []
    for b in range(bits):
        terms.append(f"((({x} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({y} >> {b}) & 1) << {2 * b + 1})")
    return " + ".join(terms)
