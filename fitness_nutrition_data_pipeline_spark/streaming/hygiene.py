"""Streaming data-hygiene: the ingest-edge twins of the batch
training-data passes (operators/text.py) — PII redaction and
benchmark-contamination alerting applied to a live document feed.

Both operators are STATELESS (pure projection / broadcast stream-static
join), so they run forever with zero state-store growth — the property
that matters at ingest scale. Stateful follow-ups (windowed dedup of
alerts, rate rollups) compose downstream via the existing
streaming/dedup.py and streaming/rollups.py operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fitness_nutrition_data_pipeline_spark.operators.text import (
    benchmark_gram_set,
    pii_scan,
    word_shingles,
)


def redact_pii_stream(
    stream: DataFrame, text_col: str, patterns: dict[str, str]
) -> DataFrame:
    """PII scan + redaction on a streaming text column. Reuses the batch
    ``pii_scan`` expression tree verbatim — it is a pure per-row
    projection (regexp count + replace), so the SAME Column expressions
    are streaming-safe with no watermark or state."""
    return pii_scan(stream, text_col, patterns)


def contamination_alerts(
    stream: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 5,
) -> DataFrame:
    """Stream of (doc, matched benchmark gram) hits: each incoming doc's
    distinct n-grams are probed against a STATIC benchmark gram set via a
    broadcast stream-static inner join.

    Explode + broadcast join are both stateless, so the query runs in
    append mode with no watermark and no state store; every emitted row
    is a contamination hit the moment the doc arrives. Dedup/rollup of
    alerts (e.g. one alert per doc per hour) composes downstream with
    ``streaming/dedup.dedup_by_key`` / ``streaming/rollups``.

    The static side is the benchmark (tiny, broadcast); Spark re-plans it
    per micro-batch, so a refreshed benchmark table is picked up without
    restarting the query.
    """
    bench_grams = benchmark_gram_set(benchmark, text_col, n=n)
    hits = stream.select(
        "*", F.explode(word_shingles(text_col, n)).alias("gram")
    ).drop(text_col)
    return hits.join(F.broadcast(bench_grams), "gram")
