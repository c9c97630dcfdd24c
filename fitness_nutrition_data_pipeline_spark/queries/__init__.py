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
# ordering is signal allocation. Round-13 window, per VERDICT r12 ask #1:
# lead with ALL 39 r7-stale queries (the oldest cohort registry-wide —
# they fail the age-6 invariant at r14 if not re-signalled now), then the
# round's 8 new registrations (never-checked queries outside the window
# would trip the rotation guard), then 3 pre-drains from the 50-query
# r8 cohort so the r14 window (which must drain the remaining 47 r8s)
# gains slack. Queries frozen under tools/registry_freeze.json are
# excluded from the age invariant (their staleness witness is the
# committed plan digest — see rotation_report --help); everything here
# stays in the hot rotation. Planned against tools/rotation_report.py:
# after this window the oldest HOT signal registry-wide becomes r8.
_CHECK_PRIORITY = (
    # --- round-13 window (driver checks the FIRST 50) ---
    # (1) the full r7-stale cohort: 39 queries; all HEAD-green in the
    # r12 closing strict sweeps and digest-witnessed unchanged
    "range_validity_nullout",
    "daily_rollup_sum",
    "daily_rollup_mean",
    "conditional_range_check",
    "window_dedup_first_seen",
    "regex_extract_cast",
    "json_props_parse",
    "running_revenue",
    "monthly_customer_spend",
    "salted_event_counts",
    "asof_join_last_view",
    "funnel_view_purchase",
    "violations_materialization",
    "date_spine_gap_fill",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_volume",
    "tpch_q14_promo_share",
    "tpch_q16_supplier_cnt",
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_volume",
    "dsir_importance_weights",
    "scd2_priority_history",
    "tpch_q15_top_supplier",
    "winsorized_price_stats",
    "drift_monitor_batch_replay",
    "multimodal_meta_profile",
    "training_shard_assignment",
    "copurchase_pairs_topk",
    "triangle_count_cooccurrence",
    "snapshot_diff_cdc",
    "weighted_sample_es",
    "jsonl_roundtrip_scan",
    "orc_roundtrip_scan",
    "record_linkage_scores",
    "linkage_em_step",
    "hierarchy_rollup",
    "embedding_dot_arrow",
    "hygiene_batch_replay",
    # (2) the 8 r13 registrations (strict-verified at sf0.001/0.01/0.1
    # before registration; see SCALE.md r13)
    "skipgram_cooccurrence_topk",
    "log_odds_ratio_terms",
    "ngram_novelty_curve",
    "quantile_normalization_map",
    "burstiness_fano_factor",
    "js_divergence_sources",
    "association_rules_lift",
    "label_propagation_step",
    # (3) 3 pre-drains from the r8 cohort (oldest-next; alphabetical
    # head) — reduces the r14 mandatory drain from 50 to 47
    "ams_f2_contract",
    "approx_distinct_contract",
    "approx_quantile_contract",
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
