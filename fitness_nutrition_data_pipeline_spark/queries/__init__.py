"""Query registry: every operator the engine claims, as a (Spark builder,
DuckDB oracle SQL) pair runnable on the synthetic testdata tables.

Each spec's builder takes ``(spark, sf_dir)`` and returns a DataFrame; the
oracle is ANSI SQL DuckDB can run over the same parquet (views
pre-registered by the driver). Column names/aliases are kept identical on
both sides because the correctness compare sorts columns by name before
hashing. Specs without an oracle (non-SQL-expressible ops) set
``oracle=None`` and get a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    sort: tuple[str, ...] | None = None


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    sort: tuple[str, ...] | None = None,
):
    """Decorator: add a query builder to the global registry.

    ``sort``: output-order contract — columns appended as a final total
    sort so every registered query returns deterministically ordered
    rows (enforced by tests/test_plans.py::test_deterministic_output_order).
    Declare it here when the builder body doesn't already end in a sort;
    the oracle SQL must carry the matching final ORDER BY.

    The contract is implemented as ``repartition(1).sortWithinPartitions``
    rather than ``orderBy``: a distributed ``orderBy`` inserts a
    RangePartitioning exchange whose boundary-sampling pass RE-EXECUTES the
    unmaterialized child subplan — measured +57% on ngram_jaccard_pairs at
    sf0.1, where the child is a join projecting array_intersect per row.
    The round-robin repartition materializes the (answer-sized) result
    once, and a single reduce task sorts it with no sampling job — total
    order at zero marginal cost. The contract runs on the RESULT relation,
    which is driver-collectable by construction; at 100 TB a caller that
    needs a distributed total order of a huge relation should ``orderBy``
    explicitly — this is an output contract, not a computation step.
    """

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        builder = fn
        if sort:
            import functools

            @functools.wraps(fn)
            def sorted_builder(spark: SparkSession, sf_dir: str) -> DataFrame:
                return fn(spark, sf_dir).repartition(1).sortWithinPartitions(*sort)

            builder = sorted_builder
        _REGISTRY[name] = QuerySpec(
            name=name, builder=builder, oracle=oracle, doc=doc,
            sort=tuple(sort) if sort else None,
        )
        return fn

    return wrap


# The driver's correctness harness samples the FIRST 50 registrations, so
# ordering is signal allocation. Round-12 window, per VERDICT r11 asks
# #1-#3: lead with ALL 46 r6-stale queries (the oldest cohort registry-
# wide; the rotation guard says they fail the age-6 invariant at r13 if
# not re-signalled now), then the 2 queries whose implementation changed
# after their last driver signal (funnel_time_to_convert's prefix-sum
# rewrite landed r11 over an r7 signal; rfm_segmentation carries an r9
# signal), then the round's ≤2 new registrations — net registry growth
# frozen at +2 this round per the capacity decision (VERDICT r11 ask #2;
# rationale recorded in SCALE.md r12). Planned against
# tools/rotation_report.py: after this window the oldest signal
# registry-wide becomes r7.
_CHECK_PRIORITY = (
    # --- round-12 window (driver checks the FIRST 50) ---
    # (1) the full r6-stale cohort: 46 queries whose green signal
    # predates five rounds of shared-infra churn; all HEAD-green in the
    # r11 closing strict sweeps
    "cep_batch_replay",
    "csv_roundtrip_scan",
    "dedup_clusters_exact",
    "deletion_propagation_audit",
    "distribution_stats",
    "domain_inventory_concat",
    "embedding_ann_ivf_probe",
    "embedding_centroid_assign",
    "embedding_knn_bruteforce",
    "embedding_near_dup_pairs",
    "fact_dim_key_resolution",
    "fk_coverage_pct",
    "grouping_sets_revenue",
    "heavy_hitters_batch_replay",
    "histogram_equi_width_prices",
    "incremental_agg_merge",
    "ingestion_lag_audit",
    "interval_range_join",
    "keyword_categorization",
    "ks_binned_click_view",
    "l_diversity_audit",
    "metric_unpivot",
    "minhash_dedup_flags",
    "near_dup_pipeline",
    "ngram_jaccard_pairs",
    "orphan_fk_check",
    "percentile_stats",
    "pit_join_scd2",
    "pivot_status_counts",
    "pk_uniqueness_check",
    "price_histogram",
    "psi_value_drift",
    "ratelimit_batch_replay",
    "recent_window_topk",
    "rollup_qty",
    "scan_filter_project",
    "semi_join_active_customers",
    "set_ops_customers",
    "simhash_hamming_pairs",
    "simhash_signatures",
    "split_contamination_matrix",
    "table_counts_union",
    "token_length_percentiles",
    "topn_per_group",
    "unigram_lm_crossentropy",
    "zorder_locality_stats",
    # (2) the 2 rewritten-but-stale queries (VERDICT r11 ask #3): the
    # driver must bless the code that actually ships
    "funnel_time_to_convert",
    "rfm_segmentation",
    # (3) the 2 r12 registrations (capacity freeze: never-checked queries
    # outside the window would trip the rotation guard, so net growth is
    # bounded by the window slack — exactly 2 this round)
    "stratified_train_eval_split",
    "quantile_sketch_merge",
)


_QUERY_MODULES = (
    "analytics_ops",
    "analytics_ops2",
    "analytics_ops3",
    "behavior_ops",
    "corpus_ops",
    "corpus_ops2",
    "curation",
    "eval_ops",
    "graph_ops",
    "llm_ops",
    "multimodal_ops",
    "profiling",
    "relational",
    "relational2",
    "relational3",
    "retrieval_ops",
    "sampling",
    "scale_ops",
    "serving_ops",
    "sketch_ops",
    "stats_ops",
    "text_ops",
    "text_ops2",
    "text_ops3",
    "tpch_like",
    "tpch_like2",
    "tpch_like3",
    "tpch_like4",
    "warehouse_ops",
)

# module name → import error message; populated by all_specs (empty when
# every module registered cleanly). Inspected by tools/verify_queries.py.
IMPORT_FAILURES: dict[str, str] = {}


def all_specs() -> dict[str, QuerySpec]:
    """Registry snapshot in driver-check-priority order.

    Module imports are ISOLATED: one module failing to import (e.g. a
    Spark API that moved between environment versions — it has happened
    between rounds) must cost its own queries only, never the other 100+.
    Failures are recorded in IMPORT_FAILURES, not swallowed silently;
    set SPARK_GRAFT_STRICT_IMPORTS=1 to re-raise (local dev / CI).
    """
    import importlib
    import logging
    import os

    strict = bool(os.environ.get("SPARK_GRAFT_STRICT_IMPORTS"))
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(f"fitness_nutrition_data_pipeline_spark.queries.{mod}")
        except Exception as e:  # noqa: BLE001
            if strict:
                raise
            IMPORT_FAILURES[mod] = f"{type(e).__name__}: {e}"
            logging.getLogger(__name__).warning(
                "query module %s failed to import (its queries are "
                "unavailable this run): %s", mod, e
            )

    ordered = {n: _REGISTRY[n] for n in _CHECK_PRIORITY if n in _REGISTRY}
    ordered.update(_REGISTRY)
    return ordered
