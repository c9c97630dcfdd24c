"""Approximate-aggregation (sketch) queries with oracle-checkable
contracts.

A sketch's raw output is engine-specific (Spark HLL++ and DuckDB's HLL
give different estimates), so it can never hash-match an oracle. What
IS portable is the sketch's error contract: each engine compares its own
estimate against its own exact value and emits (exact, within-tolerance
flag). Both engines must produce the same exact values and all-true
flags — which verifies the sketch machinery end-to-end without demanding
bit-equal estimates.

At 100 TB the sketches are the queryable path (one pass, O(1) state per
group, mergeable across partitions); the exact side of the contract is
what validation continues to use (SURVEY A5: exact, never approx).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fitness_nutrition_data_pipeline_spark.queries import register
from fitness_nutrition_data_pipeline_spark.sources.testdata import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "approx_distinct_contract",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS n_exact,
           CASE WHEN abs(CAST(approx_count_distinct(user_id) AS DOUBLE)
                         - count(DISTINCT user_id))
                     <= 0.05 * count(DISTINCT user_id)
                THEN 1 ELSE 0 END AS approx_within_5pct
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    sort=("event_type",),
    doc="HyperLogLog++ distinct-count contract: per group, the sketch "
    "estimate must land within 5% of the exact count (rsd=0.02 → ~2.5σ). "
    "The estimate itself is engine-specific; the exact count and the "
    "contract flag are what hash-match. One pass, mergeable sketch state.",
)
def approx_distinct_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    exact = F.count_distinct("user_id")
    approx = F.approx_count_distinct("user_id", 0.02)
    return ev.groupBy("event_type").agg(
        exact.alias("n_exact"),
        F.when(
            F.abs(approx.cast("double") - exact) <= 0.05 * exact, 1
        ).otherwise(0).alias("approx_within_5pct"),
    )


@register(
    "approx_quantile_contract",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS exact_median,
           CASE WHEN abs(approx_quantile(value, 0.5) - quantile_cont(value, 0.5))
                     <= 0.05 * (quantile_cont(value, 0.99) - quantile_cont(value, 0.01))
                THEN 1 ELSE 0 END AS approx_within_tolerance
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    sort=("event_type",),
    doc="Quantile-sketch contract: the one-pass approximate median must "
    "land within 5% of the (p99−p1) spread of the exact interpolated "
    "median. Exact median + flag hash-match; the sketch value is "
    "engine-specific by design.",
)
def approx_quantile_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    exact_med = F.expr("percentile(value, 0.5)")
    spread = F.expr("percentile(value, 0.99)") - F.expr("percentile(value, 0.01)")
    approx_med = F.percentile_approx("value", F.lit(0.5), F.lit(10000))
    return ev.groupBy("event_type").agg(
        F.round(exact_med, 4).alias("exact_median"),
        F.when(F.abs(approx_med - exact_med) <= 0.05 * spread, 1)
        .otherwise(0)
        .alias("approx_within_tolerance"),
    )


@register(
    "heavy_hitters_verified",
    """
    WITH per_key AS (
      SELECT user_id, count(*) AS n_rows FROM events GROUP BY user_id
    ),
    tot AS (SELECT sum(n_rows) AS total FROM per_key)
    SELECT p.user_id, p.n_rows,
           round(CAST(p.n_rows AS DOUBLE) / t.total, 6) AS row_share
    FROM per_key p CROSS JOIN tot t
    WHERE p.n_rows * 128 > t.total
    ORDER BY p.n_rows DESC, p.user_id
    """,
    doc="Sketch-then-verify heavy hitters (phi = 1/128): a per-partition "
    "Misra-Gries pass (capacity 256, <= 256 candidate rows per partition "
    "cross the shuffle) yields a guaranteed SUPERSET of the true heavy "
    "keys; exact counting then runs only on the candidate set via a "
    "broadcast semi-join, and the phi filter discards false candidates. "
    "The emitted set is exactly {key : freq * 128 > N} — deterministic "
    "and partition-order independent even though the intermediate "
    "candidate set is not. This is the 100 TB shape: the full-cardinality "
    "groupBy is replaced by O(partitions * capacity) sketch state plus an "
    "exact pass over a vanishingly small filtered subset.",
)
def heavy_hitters_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fitness_nutrition_data_pipeline_spark.operators.sketches import (
        misra_gries_candidates,
    )

    ev = _t(spark, sf_dir, "events")
    cand = misra_gries_candidates(ev, "user_id", capacity=256)
    total = ev.agg(F.count(F.lit(1)).alias("total"))
    return (
        ev.join(F.broadcast(cand), "user_id")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .crossJoin(F.broadcast(total))
        .where(F.col("n_rows") * 128 > F.col("total"))
        .select(
            "user_id",
            "n_rows",
            F.round(F.col("n_rows").cast("double") / F.col("total"), 6).alias(
                "row_share"
            ),
        )
        .orderBy(F.desc("n_rows"), "user_id")
    )
