"""Stream-stream join: time-bounded attribution between two live feeds.

The batch funnel query (queries: funnel_view_purchase) answers "which
views converted" after the fact; this is the same semantics computed
online. Spark buffers both sides in state, and the two bounds make that
state finite: the watermark discards rows older than `late_threshold`,
and the range condition lets the engine evict a buffered view as soon as
the purchase-side watermark passes its attribution window. State ≈
(arrival rate × window), independent of stream history — the property
that keeps the join runnable forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_attribution(
    views: DataFrame,
    purchases: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    attribution_window: str = "1 hour",
    late_threshold: str = "2 hours",
) -> DataFrame:
    """Join each purchase to the views by the same user in the preceding
    `attribution_window`. Inner equi-join on user + event-time range
    condition — both required for bounded-state stream-stream joins.

    Returns (user_id, view_ts, purchase_ts, view_id, purchase_id,
    lag_seconds).
    """
    v = views.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("view_ts"),
        F.col("event_id").alias("view_id"),
    ).withWatermark("view_ts", late_threshold)
    p = purchases.select(
        F.col(user_col).alias("p_user_id"),
        F.col(ts_col).alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    ).withWatermark("purchase_ts", late_threshold)
    return v.join(
        p,
        F.expr(
            f"""
            user_id = p_user_id AND
            purchase_ts >= view_ts AND
            purchase_ts <= view_ts + INTERVAL {attribution_window}
            """
        ),
        "inner",
    ).select(
        "user_id",
        "view_ts",
        "purchase_ts",
        "view_id",
        "purchase_id",
        (
            F.unix_timestamp("purchase_ts") - F.unix_timestamp("view_ts")
        ).alias("lag_seconds"),
    )
