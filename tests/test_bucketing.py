"""Bucketed co-located joins: writing both join sides bucketed on the key
removes the shuffle from the join entirely — the disk-layout investment
that pays at every subsequent join at 100 TB (SURVEY §4 'indexing'
equivalent, with db_schema.sql:211-218's B-trees replaced by bucket
layout)."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from fitness_nutrition_data_pipeline_spark.load import write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    write_bucketed(orders, "orders_b", "o_custkey", 8)
    write_bucketed(customer, "customer_b", "c_custkey", 8)
    return spark.table("orders_b"), spark.table("customer_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    orders_b, customer_b = bucketed_tables
    # disable auto-broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = orders_b.join(
            customer_b, orders_b.o_custkey == customer_b.c_custkey
        ).groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain(mode="formatted")
        plan = buf.getvalue()
        # the join reads bucketed data directly: SortMergeJoin with no
        # Exchange between the scans and the join
        join_section = plan.split("HashAggregate")[0]
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(o_custkey" not in join_section
        assert "Exchange hashpartitioning(c_custkey" not in join_section
        # correctness unchanged
        n = joined.agg(F.sum("n")).first()[0]
        assert n == spark.table("orders_b").count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_zordered_write_gives_two_dim_locality(spark, sf_dir, tmp_path):
    """write_zordered must produce files whose per-file min/max spans
    are narrow on BOTH clustered dimensions — the property parquet
    footer pruning needs. A single-column sort would give near-zero
    span on one dim and near-full span on the other; the Morton layout
    bounds both."""
    import glob
    import os

    from fitness_nutrition_data_pipeline_spark.load import write_zordered

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_orderkey", "l_extendedprice", "l_quantity"
    )
    out = str(tmp_path / "li_z")
    write_zordered(li, out, "l_extendedprice", "l_quantity", bits=8, n_files=8)

    files = glob.glob(os.path.join(out, "part-*.parquet"))
    assert len(files) >= 4  # range partitioner may merge near-empty bands

    g = li.agg(
        F.min("l_extendedprice"), F.max("l_extendedprice"),
        F.min("l_quantity"), F.max("l_quantity"),
    ).collect()[0]
    span_x, span_y = g[1] - g[0], g[3] - g[2]

    ratios_x, ratios_y = [], []
    for f in files:
        s = spark.read.parquet(f).agg(
            F.min("l_extendedprice"), F.max("l_extendedprice"),
            F.min("l_quantity"), F.max("l_quantity"),
        ).collect()[0]
        ratios_x.append((s[1] - s[0]) / span_x)
        ratios_y.append((s[3] - s[2]) / span_y)

    avg_x = sum(ratios_x) / len(ratios_x)
    avg_y = sum(ratios_y) / len(ratios_y)
    # both dims must be materially narrower than the global span —
    # a plain sort on x would give avg_y ~= 1.0
    assert avg_x < 0.8, f"x spans not localized: {ratios_x}"
    assert avg_y < 0.8, f"y spans not localized: {ratios_y}"
    # and the data must round-trip intact
    assert spark.read.parquet(out).count() == li.count()


def test_zordered_band_mode_deterministic_disjoint(spark, sf_dir, tmp_path):
    """bands=2^k mode (r8): every row's band is a pure function of its
    values (top k bits of the z-key), so the written directories must
    (a) preserve all rows, (b) be band-disjoint in z, and (c) be
    bit-identical across two independent writes — the property the
    zorder_write_band_spans oracle relies on and sampled
    repartitionByRange cannot give."""
    import os

    from fitness_nutrition_data_pipeline_spark.load import write_zordered

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_orderkey", "l_extendedprice", "l_quantity"
    )
    out1 = str(tmp_path / "z1")
    out2 = str(tmp_path / "z2")
    write_zordered(li, out1, "l_extendedprice", "l_quantity", bits=8, bands=16)
    write_zordered(li, out2, "l_extendedprice", "l_quantity", bits=8, bands=16)

    b1 = spark.read.parquet(out1)
    assert b1.count() == li.count()
    assert "_zband" in b1.columns
    bands = [r[0] for r in b1.select("_zband").distinct().collect()]
    assert all(0 <= b < 16 for b in bands)

    # per-band membership identical across the two writes
    sig = lambda df: sorted(  # noqa: E731
        tuple(r)
        for r in df.groupBy("_zband")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_orderkey").alias("ck"),
        )
        .collect()
    )
    assert sig(b1) == sig(spark.read.parquet(out2))


def test_zordered_band_mode_rejects_non_power_of_two(spark, sf_dir, tmp_path):
    import os

    import pytest as _pytest

    from fitness_nutrition_data_pipeline_spark.load import write_zordered

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_extendedprice", "l_quantity"
    )
    with _pytest.raises(ValueError, match="power of two"):
        write_zordered(
            li, str(tmp_path / "zz"), "l_extendedprice", "l_quantity", bands=12
        )
