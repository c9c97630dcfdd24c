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
# ordering is signal allocation. Round-14 window, per VERDICT r13 ask #1:
# the full 47-query r8-stale mandatory drain (oldest hot cohort — they
# fail the age-6 invariant at r15 if not re-signalled now; exact set and
# order from `rotation_report --plan-next` at r14 open, oldest-first with
# name tie-break), then the 3 slack slots spent per VERDICT r13 ask #2 and
# ADVICE r13 item 2: a reserved re-signal slot for unigram_lm_crossentropy
# (its r13 localCheckpoint plan fix landed OUTSIDE the r13 window, so its
# last driver signal r12 blessed the superseded plan — this slot closes
# that gap instead of reverting a real 6-to-2-scan win), plus the two
# largest plan-recompute-queue fixes (tools/audit_reuse.py):
# rfm_segmentation_histogram (+13 redundant scans) and
# capped_waterfill_allocation (+8), both rewritten THIS round while inside
# this window, strict-re-blessed at 3 SFs + bare, digests regenerated.
# t_closeness_audit (+5) is deliberately deferred to the r15 slack (its
# r10 signal is not yet age-critical and the window has no fourth slot).
# Queries frozen under tools/registry_freeze.json are excluded from the
# age invariant (their staleness witness is the committed plan digest —
# see rotation_report --help). Planned against tools/rotation_report.py:
# after this window the oldest HOT signal registry-wide becomes r9.
_CHECK_PRIORITY = (
    # --- round-14 window (driver checks the FIRST 50) ---
    # (1) the full r8-stale cohort: 47 mandatory drains
    "bloom_membership_contract",
    "cluster_balanced_sample",
    "compaction_plan",
    "corpus_curation_pipeline",
    "correlated_subquery_big_spenders",
    "countmin_contract",
    "cube_revenue",
    "cuped_adjusted_lift",
    "dedup_keep_best",
    "doc_fingerprint",
    "doc_quality_score",
    "domain_mixing_budget",
    "dp_noised_histogram",
    "edit_distance_pairs",
    "hard_negative_mining",
    "hash_stratified_sample",
    "incremental_ingest_dedup",
    "khop_reach_parts",
    "kmeans_lloyd_update",
    "kmv_distinct_contract",
    "lang_id_scores",
    "length_filter_survivorship",
    "lsh_dedup_clusters",
    "multitouch_attribution",
    "oov_rate_curve",
    "order_gap_analysis",
    "prefix_filter_simjoin",
    "range_frame_trailing_avg",
    "reciprocal_rank_fusion",
    "retention_cohorts",
    "seasonal_naive_backtest",
    "shard_manifest_checksums",
    "source_temperature_mix",
    "stats_correlation",
    "tfidf_top_terms",
    "token_budget_plan",
    "token_count",
    "tpch_q13_custdist",
    "tpch_q22_dormant_capital",
    "tpch_q4_priority_exists",
    "tpch_q6_forecast_revenue",
    "train_val_test_split",
    "variant_props_profile",
    "vocab_inventory",
    "window_rank_suite",
    "winnowing_fingerprints",
    "zorder_write_band_spans",
    # (2) 3 slack slots: reserved re-signal + the two largest
    # recompute-queue fixes (see comment above)
    "unigram_lm_crossentropy",
    "rfm_segmentation_histogram",
    "capped_waterfill_allocation",
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
