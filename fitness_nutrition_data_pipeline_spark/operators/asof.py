"""As-of (point-in-time) join — a temporal operator Spark lacks natively.

For each left row, find the latest right row of the same key with
``right_ts <= left_ts``. Implemented WITHOUT a non-equi join: tag both
sides, union, sort within key by (ts, side), and carry the last-seen right
row forward with ``last(..., ignorenulls)`` over a rows frame. One shuffle
on the key, one partition-local sort — linear at any scale, where the
naive range-join formulation explodes quadratically per key.

This is the standard big-data as-of plan (same shape Flink/kdb use for
temporal joins); ties (right_ts == left_ts) match, like DuckDB ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    *,
    right_value_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left rows + the latest right row at-or-before each left timestamp.

    Returns all left columns plus ``prefix + c`` for each requested right
    value column (NULL when no right row precedes the left row).
    """
    lt = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
    # Carry ALL right value columns as ONE struct under a single
    # last(ignorenulls) — per-column last would mix values from different
    # right rows whenever the latest match has a NULL field, which is not
    # ASOF semantics (the whole latest row wins, NULL fields included).
    rt = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in right_value_cols]).alias("_rrow"),
    )
    prefixed = [f"{prefix}{c}" for c in right_value_cols]
    # align schemas for the union
    for c in left.columns:
        if c not in rt.columns and c != key:
            rt = rt.withColumn(c, F.lit(None))
    lt = lt.withColumn(
        "_rrow", F.lit(None).cast(rt.schema["_rrow"].dataType)
    )
    unioned = lt.select(rt.columns).unionByName(rt.select(rt.columns))

    # right rows (side=0) sort before left rows at equal ts → ties match
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*", F.last("_rrow", ignorenulls=True).over(w).alias("_carr")
    )
    out_cols = [c for c in left.columns] + [
        F.col(f"_carr.{c}").alias(p) for c, p in zip(right_value_cols, prefixed)
    ]
    return carried.where(F.col("_side") == 1).select(*out_cols)
