"""Hierarchy-rollup parity: the driver-loop ancestor expansion and the
engine-native WITH RECURSIVE form (SPARK-24497, queries/graph_ops.py)
must produce identical relations — the guarantee the registered docs
claim. Both are separately oracle-checked; this pins them to EACH OTHER
so a divergence is caught even if only one side's oracle runs."""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_subtree_rollup_loop_equals_native(spark):
    from fitness_nutrition_data_pipeline_spark.queries import all_specs

    specs = all_specs()
    loop = _rows(specs["tree_subtree_cost_rollup"].builder(spark, SF_DIR))
    native = _rows(
        specs["tree_subtree_cost_rollup_native"].builder(spark, SF_DIR)
    )
    assert loop == native
    assert len(loop) == 50  # nodes below the a < 50 readout cut


def test_native_recursion_plan_is_union_loop(spark):
    """The native form must actually run the recursion INSIDE the engine
    (a UnionLoop / recursive-CTE node), not fall back to a unrolled
    union — otherwise it is the driver loop with extra steps."""
    import contextlib
    import io

    from fitness_nutrition_data_pipeline_spark.queries import all_specs

    df = all_specs()["tree_subtree_cost_rollup_native"].builder(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="extended")
    plan = buf.getvalue()
    assert "UnionLoop" in plan or "CTERelationDef" in plan, plan[:2000]
