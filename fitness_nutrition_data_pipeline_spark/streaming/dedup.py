"""Streaming dedup: the streaming twin of the batch exact-dedup pass.

Device uploads and event buses redeliver (at-least-once sources, retried
uploads), so the ingest edge needs idempotence before anything downstream
aggregates. ``dropDuplicatesWithinWatermark`` keeps one state entry per
key only until the watermark passes the key's event time — state is
bounded by (arrival rate × lateness window), not by stream history,
which is what makes it runnable forever at ingest scale.

Two dedup keys are provided:
- record identity (an upstream id column) — transport-level redelivery;
- content hash (md5 of the payload columns) — re-uploaded identical
  readings with fresh ids, the streaming analogue of
  ``operators/dedup.exact_dedup_summary``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_by_key(
    stream: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    *,
    late_threshold: str = "1 hour",
) -> DataFrame:
    """Drop redelivered records by key, holding per-key state only inside
    the watermark window. Append-mode safe."""
    return stream.withWatermark(ts_col, late_threshold).dropDuplicatesWithinWatermark(
        list(keys)
    )


def dedup_by_content(
    stream: DataFrame,
    ts_col: str,
    payload_cols: Sequence[str],
    *,
    late_threshold: str = "1 hour",
) -> DataFrame:
    """Drop records whose payload content repeats within the watermark
    window, regardless of their ids: md5 over the \x01-delimited payload
    becomes the dedup key. The unit separator means adjacent fields can't
    collide (("ab","c") ≠ ("a","bc")); NULL gets a multi-byte \x00-framed
    sentinel so it can't collide with any plausible real field value."""
    fp = F.md5(
        F.concat_ws(
            "",
            *[
                F.coalesce(F.col(c).cast("string"), F.lit("\x00<NULL>\x00"))
                for c in payload_cols
            ],
        )
    )
    tagged = stream.withColumn("_content_fp", fp)
    return (
        tagged.withWatermark(ts_col, late_threshold)
        .dropDuplicatesWithinWatermark(["_content_fp"])
        .drop("_content_fp")
    )
