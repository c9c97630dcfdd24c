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
# ordering is signal allocation. Round-9 window (exactly 50), per VERDICT
# r8 asks #1/#2: the staged never-checked set first — user_ltv_deciles
# (the sixth latent-DECIMAL fix, green signal predates the fix) plus all
# 19 r8 registrations (r8 went 50/50 green, so these are the only
# never-driver-checked queries) — then this round's 14 new
# registrations (serving cascade + NDCG, IVM streaming/batch bridge,
# RAG + pretraining-mix compositions, layout/salting/pruning/schema/
# tiering/late-dim/restatement/k-core audits), then 16 of the 37
# r4-stale queries (the oldest signal cohort; r8 cleared r3). Below
# the fold: the remaining 21 r4-stale, queued for r10.
# Window = 1 + 19 + 14 + 16 = 50.
_CHECK_PRIORITY = (
    # --- round-9 window (driver checks the FIRST 50) ---
    # the sixth latent-DECIMAL member: fixed to DOUBLE in r8, but its
    # green signal predates the fix (r4) — prove the fix, not the luck
    "user_ltv_deciles",
    # r8 corpus operators (corpus_ops2): strict-verified 3 SFs locally,
    # never driver-checked
    "rag_chunk_plan",
    "filter_funnel_attribution",
    "tokenizer_fertility_by_source",
    "char_class_profile",
    "cdc_merge_apply",
    "target_encoding_smoothed",
    "changepoint_cusum",
    # r8 model-eval wave (eval_ops): exact rank AUC, calibration bins,
    # Bradley-Terry MM scores
    "auc_exact_rank",
    "calibration_reliability_bins",
    "bradley_terry_scores",
    # S5's bucketed writer under the hard oracle (was pytest-only)
    "bucketed_join_audit",
    "feature_hashing_collisions",
    "halflife_decay_scores",
    "incremental_agg_maintenance",
    "rfm_segmentation",
    # completes the S5 layout trio under the oracle
    "partitioned_write_prune_audit",
    # exact binary-payload CAS dedup, sniffed format under the hash
    "multimodal_payload_dedup",
    # sequence-model eval: temporal-split Markov top-1 accuracy
    "markov_next_event_accuracy",
    # the executable chunker hash-proven equal to its closed-form plan
    "rag_chunk_emit_audit",
    # --- new r9 registrations (strict-verified at 3 SFs) ---
    # serving-side retrieval: hybrid retrieve->fuse->evaluate and the
    # retrieve->rerank->evaluate cascade (VERDICT r8 ask #3)
    "hybrid_retrieval_eval",
    "rerank_eval_lift",
    # streaming/batch IVM bridge: foreachBatch maintainer algebra
    # hash-proven equal to recompute (ask #4)
    "ivm_batch_replay",
    # chunker + dedup + quality composed into the RAG ingestion flow
    # (ask #6)
    "rag_corpus_pipeline",
    # DESCRIBE FORMATTED layout introspection under the oracle (ask #7)
    "storage_layout_inventory_audit",
    # NDCG@10 on the same fused ranking as hybrid_retrieval_eval
    # (shared CTEs; integer log2 weights precomputed once in Python)
    "ndcg_fused_eval",
    # routing-only salt spread of a hot join key, hash-proven
    # semantics-preserving against the plain-join oracle
    "skew_salted_join_audit",
    # runtime sibling of the static prune audit: dim-filter-driven
    # dynamicpruning PartitionFilter on the fact scan (plan-tested)
    "dynamic_partition_prune_audit",
    # train-side composition: curation survivors -> temperature mix ->
    # budget -> packing -> sharding, integer math after one doc pass
    "pretraining_mix_plan",
    # additive-column evolution: gen-1 files without the column, gen-2
    # with it, mergeSchema read audited against source recompute
    "schema_evolution_read_audit",
    # inline/packed/external placement plan for binary payloads —
    # payload bytes never shuffle, only (format, n_bytes) pairs
    "multimodal_storage_tiering",
    # two-phase late-dim resolve-then-backfill, hash-proven equal to
    # the one-shot join; never-arriving keys hit the placeholder row
    "late_dim_backfill_audit",
    # day-grain restatement: recompute ONLY late-touched partitions,
    # hash-proven equal to full recompute (lambda-architecture backfill)
    "partition_restatement_audit",
    # bounded-round k-core peel on the capped co-purchase graph
    "kcore_peel_audit",
    # --- r4-stale rotation (oldest driver signal registry-wide) ---
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    "tpch_q19_discounted_revenue",
    "supplier_authority_rank",
    "gini_customer_spend",
    "chi_square_priority_status",
    "equi_depth_price_deciles",
    "benford_first_digit",
    "daily_anomaly_zscore",
    "mad_outlier_counts",
    "entropy_event_type_buckets",
    "interarrival_gap_stats",
    "retention_matrix",
    "signup_conversion_cohorts",
    "sessionize_events",
    # --- below the 50-line: the remaining r4-stale, queued for r10 ---
    "user_value_trend",
    "sequence_packing_windows",
    "column_fill_rates",
    "fixed_size_stratum_sample",
    "ann_recall_contract",
    "embedding_dedup_clusters",
    "embedding_lsh_buckets",
    "embedding_quantization_params",
    "bm25_query_scores",
    "boilerplate_chunks",
    "cdc_chunk_dedup",
    "cluster_survivor_selection",
    "contamination_check",
    "hapax_ratio_by_source",
    "lang_confusion_matrix",
    "pca_power_iteration",
    "pii_scan_redact",
    "repetition_profile",
    "type_token_ratio",
    "unigram_logprob_docs",
    "zipf_slope_top_terms",
)


_QUERY_MODULES = (
    "analytics_ops",
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
