"""Runtime bloom-filter join pruning (Spark's row-level sibling of
dynamic partition pruning): when a shuffled join's build side carries a
selective filter, the optimizer can inject a bloom_filter_agg subquery
over the build keys and prefilter the probe side with might_contain —
so at 100 TB only probe rows that can possibly match pay the shuffle.

This lives in pytest rather than the query registry on purpose: the
feature needs session confs (applicationSideScanSizeThreshold is 10 GB
by default — correct for production, unreachable at test SFs), and a
registered query must never mutate the shared driver session's confs
mid-harness (it would silently change every later query's planning).
The try/finally restore keeps this test's blast radius at zero.
"""

import pytest


BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # production default is 10 GB — the local parquet is ~MBs, so the
    # filter would never fire without lowering the application-side bar
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    # force the shuffled-join path: with a broadcast join Spark prefers
    # the broadcast itself as the runtime filter and skips the bloom
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def bloom_confs(spark):
    saved = {}
    for k, v in BLOOM_CONFS.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _joined(spark, sf_dir):
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        "o_orderpriority = '1-URGENT'"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
        )
    )


def _plan_text(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_bloom_filter_injected_on_probe_side(spark, sf_dir, bloom_confs):
    plan = _plan_text(_joined(spark, sf_dir))
    # build side: a bloom over the filtered orders keys
    assert "bloom_filter_agg" in plan
    # probe side: lineitem prefiltered by might_contain BEFORE the join
    assert "might_contain" in plan


def test_bloom_filter_preserves_join_semantics(spark, sf_dir, bloom_confs):
    with_bloom = _joined(spark, sf_dir).collect()
    # same query with the feature off — bloom false positives must be
    # removed by the real join, so results are identical
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    try:
        plain = _joined(spark, sf_dir).collect()
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        )
    assert sorted(map(tuple, with_bloom)) == sorted(map(tuple, plain))
    assert len(plain) == 1 and plain[0]["n_items"] > 0


def test_bloom_confs_restored(spark):
    # the fixture must leave no trace: the production thresholds are
    # back after the bloom tests ran (order-independent — this test
    # asserts the steady-state value, which any prior test must restore)
    thr = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    assert thr != "0"
