"""Property-based equivalence: the Column-expression cleaners must match
the reference's row-at-a-time Python semantics on arbitrary inputs
(main_etl_pipeline.py:129-135, 314-323, 416-427).

Batched: each hypothesis example is a whole list of strings evaluated in
one Spark job, so the suite stays fast.
"""

import re

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fitness_nutrition_data_pipeline_spark.config import FITNESS_GOALS
from fitness_nutrition_data_pipeline_spark.functions.cleaning import (
    clean_text_list,
    standardize_fitness_goal,
    strip_units,
)

# printable-ish text incl. the delimiters under test
# single-char alphabet rich in 'a','n','d',' ' so ' and ' separators (and
# near-misses like 'andx') emerge naturally
TEXT = st.text(alphabet="and bcegilostuw XYZ,\n;:()09.", max_size=60)
UNIT_TEXT = st.one_of(
    st.from_regex(r"\d{0,4}(\.\d{0,3})?\s*(g|mg|mcg|IU|kcal|G|Mg)?", fullmatch=True),
    st.text(max_size=10),
)


def _ref_clean_text_list(text):
    if not isinstance(text, str):
        return []
    items = re.split(r"[,\n]| and ", text.lower())
    return [item.strip() for item in items if item.strip()]


def _ref_standardize_goal(goal_text):
    if not isinstance(goal_text, str):
        return "maintain_health"
    goal_text = goal_text.lower()
    for key, keywords in FITNESS_GOALS.items():
        if any(word in goal_text for word in keywords):
            return key
    return "maintain_health"


def _ref_strip_units(value):
    if value is None:
        return None
    stripped = re.sub(r"\s*(g|mg|mcg|iu|kcal)$", "", str(value), flags=re.IGNORECASE).strip()
    coerced = pd.to_numeric(pd.Series([stripped]), errors="coerce").iloc[0]
    return None if pd.isna(coerced) else float(coerced)


def _run(spark, expr, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r.out for r in df.select(expr.alias("out")).collect()]


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(TEXT, min_size=1, max_size=40))
def test_clean_text_list_matches_reference(spark, texts):
    got = _run(spark, clean_text_list("v"), texts)
    assert got == [_ref_clean_text_list(t) for t in texts]


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(TEXT, min_size=1, max_size=40))
def test_goal_standardization_matches_reference(spark, texts):
    got = _run(spark, standardize_fitness_goal("v", FITNESS_GOALS), texts)
    assert got == [_ref_standardize_goal(t) for t in texts]


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(UNIT_TEXT, min_size=1, max_size=40))
def test_strip_units_matches_reference(spark, values):
    got = _run(spark, strip_units("v"), values)
    expected = [_ref_strip_units(v) for v in values]
    for g, e in zip(got, expected):
        if e is None:
            assert g is None
        else:
            assert g is not None and abs(g - e) < 1e-9


def test_histogram_cdf_percentiles_match_sort_based(spark):
    """Property check for the token_length_percentiles mechanism: the
    value-grain histogram-CDF nearest-rank must agree with a direct
    sort-based nearest-rank on arbitrary integer multisets."""
    import random

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    rng = random.Random(7)
    for trial in range(5):
        vals = [rng.randint(0, 40) for _ in range(rng.randint(1, 300))]
        df = spark.createDataFrame([(v,) for v in vals], "v int")
        hist = df.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
        wc = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
        cdf = hist.select(
            "v",
            F.sum("c").over(wc).alias("cum"),
            F.sum("c").over(W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)).alias("n"),
        )
        got = cdf.agg(
            F.min(F.when(F.col("cum") >= F.expr("(n + 1) div 2"), F.col("v"))).alias("p50"),
            F.min(F.when(F.col("cum") >= F.expr("(9 * n + 9) div 10"), F.col("v"))).alias("p90"),
            F.min(F.when(F.col("cum") >= F.expr("(99 * n + 99) div 100"), F.col("v"))).alias("p99"),
        ).first()
        s = sorted(vals)
        n = len(s)

        def nearest_rank(p_num, p_den):
            k = -((-p_num * n) // p_den)  # ceil(n * p)
            return s[max(k, 1) - 1]

        assert got.p50 == nearest_rank(1, 2), (trial, vals)
        assert got.p90 == nearest_rank(9, 10), (trial, vals)
        assert got.p99 == nearest_rank(99, 100), (trial, vals)
